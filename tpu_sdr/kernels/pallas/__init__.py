from tpu_sdr.kernels.pallas.spectrum import fft_mag_fused  # noqa: F401
