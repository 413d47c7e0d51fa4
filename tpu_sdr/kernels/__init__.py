from tpu_sdr.kernels import window, biquad, fft, magnitude, pfb  # noqa: F401
from tpu_sdr.kernels.pfb import Channelizer  # noqa: F401
