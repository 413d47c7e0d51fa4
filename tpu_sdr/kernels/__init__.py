from tpu_sdr.kernels import window, biquad, fft, magnitude  # noqa: F401
