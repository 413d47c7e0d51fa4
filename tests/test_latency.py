"""Latency-mode pipeline: one frame spread across the mesh (intra-FFT TP)."""

import numpy as np
import pytest
import scipy.signal as sps

from tpu_sdr.core.config import FilterMode, PipelineConfig
from tpu_sdr.runtime import SpectrumPipeline
from tpu_sdr.shard.latency import LatencyPipeline

N = 16384


@pytest.fixture(scope="module")
def pipes():
    cfg = PipelineConfig(channels=1)
    return LatencyPipeline(cfg), SpectrumPipeline(cfg)


def test_latency_bypass_matches_throughput(pipes):
    lat, thr = pipes
    rng = np.random.default_rng(40)
    x = rng.standard_normal(N).astype(np.float32)
    mag_l, _ = lat.process_frame(x, lat.initial_state(), FilterMode.BYPASS)
    out, _ = thr.process(x, thr.initial_state(), FilterMode.BYPASS)
    mag_t = np.array(out["magnitude"])[0, 0]
    rel = np.abs(np.array(mag_l) - mag_t).max() / mag_t.max()
    assert rel < 1e-5, f"latency-mode bypass diverged: {rel}"


def test_latency_filtered_stream_matches_throughput(pipes):
    """Three frames with carried state: the per-device chain must reproduce
    the sample-exact stream the throughput engine computes."""
    lat, thr = pipes
    sos = sps.ellip(12, 0.5, 70, 0.3, output="sos")
    lat.upload_sos(sos)
    thr.upload_sos(sos)
    rng = np.random.default_rng(41)
    x = rng.standard_normal(3 * N).astype(np.float32)

    out, _ = thr.process(x, thr.initial_state(), FilterMode.CUSTOM)
    mags_t = np.array(out["magnitude"])[0]

    z = lat.initial_state()
    for f in range(3):
        mag_l, z = lat.process_frame(
            x[f * N : (f + 1) * N], z, FilterMode.CUSTOM
        )
        rel = np.abs(np.array(mag_l) - mags_t[f]).max() / mags_t[f].max()
        assert rel < 1e-5, f"frame {f}: {rel}"


def test_latency_fixed_mode_and_validation(pipes):
    lat, thr = pipes
    x = np.zeros(N, np.float32)
    mag, z = lat.process_frame(x, lat.initial_state(), FilterMode.FIXED)
    assert mag.shape == (N,) and np.all(np.array(mag) == 0.0)
    with pytest.raises(ValueError, match="single-stream"):
        LatencyPipeline(PipelineConfig(channels=2))


def test_latency_rejects_iir_block_fft_n1_mismatch():
    """Review finding: the latency engine's IIR blocks are the (n2, n1)
    view's rows, so iir_block must equal fft_n1 — a legal throughput
    config violating it used to die in a cryptic einsum error at the
    first filtered frame; now the constructor says why."""
    with pytest.raises(ValueError, match="iir_block == fft_n1"):
        LatencyPipeline(
            PipelineConfig(fft_n1=64, fft_n2=256, iir_block=128)
        )
