from tpu_sdr.kernels import window, biquad, fft, magnitude, pfb, ddc  # noqa: F401
from tpu_sdr.kernels.pfb import Channelizer  # noqa: F401
from tpu_sdr.kernels.ddc import DDC, DDCBank  # noqa: F401
