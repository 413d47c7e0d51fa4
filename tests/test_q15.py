"""Q15-faithful pipeline: device integers bit-equal to the golden model."""

import numpy as np
import pytest
import scipy.signal as sps

from tpu_sdr import PipelineConfig
from tpu_sdr.control import golden
from tpu_sdr.core import qformat as qf
from tpu_sdr.runtime.q15 import Q15Pipeline


@pytest.fixture(scope="module")
def setup():
    pipe = Q15Pipeline(PipelineConfig(channels=1))
    sos = sps.butter(6, 0.3, output="sos")
    sos_q = qf.quantize_coeff_x64(sos)
    pipe.upload_sos_q(sos_q)
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(2 * 16384) * 6000).astype(np.int16)
    return pipe, sos_q, x


def test_window_stage_bit_exact(setup):
    pipe, sos_q, x = setup
    out, _ = pipe.process(x)
    dev = np.asarray(out["windowed_q15"]).reshape(-1)
    ref = golden.rtl_window_q15(x[:16384])
    ref2 = golden.rtl_window_q15(x[16384:])
    assert np.array_equal(dev, np.concatenate([ref, ref2]))


def test_filter_stage_bit_exact(setup):
    pipe, sos_q, x = setup
    out, zf = pipe.process(x)
    dev = np.asarray(out["filtered_q15"]).reshape(-1)
    xw = np.concatenate(
        [golden.rtl_window_q15(x[:16384]), golden.rtl_window_q15(x[16384:])]
    )
    # golden intended integer filter on the windowed samples (6 sections,
    # padded with identity by upload_sos_q)
    padded = np.zeros((6, 6), dtype=np.int64)
    padded[:3] = sos_q.astype(np.int64)
    padded[3:] = np.array([64, 0, 0, 64, 0, 0])
    ref, _ = golden.sosfilt_q15_intended(padded, xw)
    assert np.array_equal(dev, ref)


def test_q15_magnitude_within_snr_of_float(setup):
    """The integer path tracks the float pipeline within the quantization
    SNR — the contract the fast path is held to, seen from the other side."""
    pipe, sos_q, x = setup
    out, _ = pipe.process(x)
    mag_q = np.asarray(out["magnitude"])[0, 0]
    # float reference with the same dequantized coefficients
    sos_f = qf.dequantize_coeff_x64(sos_q)
    res = golden.golden_pipeline(x.astype(np.float64) / 32768.0, sos=sos_f)
    mag_f = res["magnitude"][0] * 32768.0  # rescale to q15 domain
    snr = qf.q15_snr_db(mag_f, mag_q)
    assert snr > 35.0, f"integer pipeline SNR {snr:.1f} dB"


def test_q15_state_carry_bit_exact(setup):
    pipe, sos_q, x = setup
    out_w, zf_w = pipe.process(x)
    out_a, zf_a = pipe.process(x[:16384])
    out_b, zf_b = pipe.process(x[16384:], zf_a)
    whole = np.asarray(out_w["filtered_q15"]).reshape(-1)
    parts = np.concatenate(
        [
            np.asarray(out_a["filtered_q15"]).reshape(-1),
            np.asarray(out_b["filtered_q15"]).reshape(-1),
        ]
    )
    assert np.array_equal(whole, parts)
    assert np.array_equal(np.asarray(zf_w), np.asarray(zf_b))
