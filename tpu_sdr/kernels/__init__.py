from tpu_sdr.kernels import window, biquad, fft, magnitude, pfb, ddc, resample  # noqa: F401
from tpu_sdr.kernels.pfb import Channelizer  # noqa: F401
from tpu_sdr.kernels.ddc import DDC, DDCBank  # noqa: F401
from tpu_sdr.kernels.resample import Resampler  # noqa: F401
from tpu_sdr.kernels import demod  # noqa: F401
from tpu_sdr.kernels.demod import (  # noqa: F401
    AGC,
    AMDemodulator,
    FMDemodulator,
    Squelch,
    SSBDemodulator,
)
from tpu_sdr.kernels.iqcorr import IQCorrector  # noqa: F401
from tpu_sdr.kernels.stereo import StereoDecoder  # noqa: F401
from tpu_sdr.kernels import digital  # noqa: F401
from tpu_sdr.kernels.fastconv import FastFIR  # noqa: F401
from tpu_sdr.kernels.digital import BurstModem, FSKModem  # noqa: F401
from tpu_sdr.kernels import fec  # noqa: F401
from tpu_sdr.kernels.fec import ConvCode  # noqa: F401
from tpu_sdr.kernels import rds  # noqa: F401
from tpu_sdr.kernels.rds import RDSDecoder, RDSEncoder  # noqa: F401
