"""Randomized property sweeps: many designs/modes/chunkings vs the oracle."""

import numpy as np
import pytest
import scipy.signal as sps

from tpu_sdr import FilterMode, PipelineConfig
from tpu_sdr.control import golden
from tpu_sdr.control.commands import Command, CommandDecoder
from tpu_sdr.runtime import SpectrumPipeline


def _random_design(rng):
    kind = rng.choice(["butter", "cheby1", "cheby2", "ellip"])
    btype = rng.choice(["lowpass", "highpass", "bandpass"])
    order = int(rng.integers(2, 7)) * 2  # 4..12
    if btype == "bandpass":
        lo = rng.uniform(0.05, 0.4)
        wn = (lo, lo + rng.uniform(0.1, 0.5 - lo))
        order //= 2
    else:
        wn = rng.uniform(0.05, 0.9)
    if kind == "butter":
        return sps.butter(order, wn, btype=btype, output="sos")
    if kind == "cheby1":
        return sps.cheby1(order, 0.5, wn, btype=btype, output="sos")
    if kind == "cheby2":
        return sps.cheby2(order, 50, wn, btype=btype, output="sos")
    return sps.ellip(order, 0.5, 60, wn, btype=btype, output="sos")


@pytest.mark.parametrize("seed", range(6))
def test_random_design_pipeline_matches_golden(seed):
    rng = np.random.default_rng(seed)
    sos = _random_design(rng)
    if sos.shape[0] > 6:
        sos = sos[:6]
    pipe = SpectrumPipeline(PipelineConfig(channels=1))
    pipe.upload_sos(sos)
    x = rng.standard_normal(2 * 16384).astype(np.float32)
    out, _ = pipe.process(x, pipe.initial_state(), FilterMode.CUSTOM)
    mag = np.asarray(out["magnitude"])[0]
    from tpu_sdr.kernels import biquad

    ref = golden.golden_pipeline(
        x.astype(np.float64), sos=biquad.pad_sos(sos, 6)
    )["magnitude"]
    mask = ref > ref.max() * 1e-3
    db = np.abs(20 * np.log10(mag[mask] / ref[mask])).max()
    assert db < 1.0, f"seed {seed}: {db:.3f} dB"


@pytest.mark.parametrize("seed", range(4))
def test_random_chunking_equals_oneshot(seed):
    """Any frame-aligned chunking pattern reproduces the one-shot stream."""
    rng = np.random.default_rng(100 + seed)
    pipe = SpectrumPipeline(PipelineConfig(channels=1))
    pipe.upload_sos(sps.butter(10, 0.3, output="sos"))
    n_frames = 8
    x = rng.standard_normal(n_frames * 16384).astype(np.float32)
    out_w, _ = pipe.process(x, pipe.initial_state(), FilterMode.CUSTOM)
    mag_w = np.asarray(out_w["magnitude"])[0]

    # random frame-aligned split points
    cuts = sorted(rng.choice(np.arange(1, n_frames), size=3, replace=False))
    st = pipe.initial_state()
    mags = []
    prev = 0
    for c in list(cuts) + [n_frames]:
        o, st = pipe.process(x[prev * 16384 : c * 16384], st, FilterMode.CUSTOM)
        mags.append(np.asarray(o["magnitude"])[0])
        prev = c
    mag_c = np.concatenate(mags, axis=0)
    # per-shape rounding may differ between dispatch shapes; float tolerance
    assert np.abs(mag_c - mag_w).max() / mag_w.max() < 1e-5


def test_decoder_fuzz_never_crashes_and_stays_consistent():
    """Arbitrary byte soup: the decoder must never raise, and every 0xF1 in
    command position must swallow exactly 12 bytes."""
    rng = np.random.default_rng(7)
    d = CommandDecoder()
    total_coeff_events = 0
    for _ in range(200):
        chunk = bytes(rng.integers(0, 256, size=rng.integers(1, 40)))
        events = d.feed(chunk)
        for ev in events:
            assert ev.kind in ("command", "coefficients", "ignored")
            if ev.kind == "coefficients":
                assert len(ev.coefficients) == 12
                total_coeff_events += 1
    # with 0xF1 appearing ~1/256 per byte over ~4000 bytes, some uploads
    # must have fired; sanity that the ACQUIRE path was exercised
    assert total_coeff_events > 0


def test_mode_switching_mid_stream_keeps_state_sane():
    """Random mode flips between chunks: output always finite, counters add."""
    rng = np.random.default_rng(9)
    pipe = SpectrumPipeline(PipelineConfig(channels=1))
    pipe.upload_sos(sps.ellip(8, 1, 60, 0.25, output="sos"))
    st = pipe.initial_state()
    modes = [FilterMode.BYPASS, FilterMode.FIXED, FilterMode.CUSTOM]
    frames = 0
    for i in range(6):
        x = rng.standard_normal(16384).astype(np.float32)
        mode = modes[rng.integers(0, 3)]
        out, st = pipe.process(x, st, mode)
        assert np.isfinite(np.asarray(out["magnitude"])).all()
        frames += 1
    assert int(st.frame_count) == frames


def test_iq_random_designs_match_oracle():
    """Random stable designs on random IQ streams stay within 1 dB of the
    NumPy/SciPy oracle (the complex-input analog of the real-path sweep)."""
    rng = np.random.default_rng(23)
    pipe = SpectrumPipeline(PipelineConfig(channels=1))
    n = 16384
    w = np.hanning(n)
    for trial in range(3):
        order = int(rng.integers(2, 7)) * 2
        wc = float(rng.uniform(0.05, 0.8))
        kind = ["butter", "cheby1", "ellip"][rng.integers(0, 3)]
        if kind == "butter":
            sos = sps.butter(order, wc, output="sos")
        elif kind == "cheby1":
            sos = sps.cheby1(order, 0.5, wc, output="sos")
        else:
            sos = sps.ellip(order, 0.5, 60, wc, output="sos")
        pipe.upload_sos(sos)
        x = (
            rng.standard_normal(n) + 1j * rng.standard_normal(n)
        ).astype(np.complex64)
        out, _ = pipe.process(
            x, pipe.initial_state(batch_shape=(2,)), FilterMode.CUSTOM
        )
        mag = np.asarray(out["magnitude"])[0, 0]
        ref = np.abs(np.fft.fft(sps.sosfilt(sos, x.astype(np.complex128)) * w))
        # top-40 dB mask: below that, 12th-order stopbands push bins to the
        # float32 INPUT noise floor where even the exact-f32 tier departs
        # from the float64 oracle (verified: f32max shows the same error) —
        # a property of f32 data, not of the engine.
        mask = ref > ref.max() * 1e-2
        db = np.abs(20 * np.log10(mag[mask] / ref[mask])).max()
        assert db < 1.0, f"trial {trial} ({kind} {order} @{wc:.2f}): {db} dB"


def test_latency_engine_random_streams_match_throughput():
    """Latency engine == throughput engine on random filters/streams."""
    from tpu_sdr.shard.latency import LatencyPipeline

    rng = np.random.default_rng(24)
    cfg = PipelineConfig(channels=1)
    lat = LatencyPipeline(cfg)
    thr = SpectrumPipeline(cfg)
    for trial in range(2):
        sos = sps.butter(int(rng.integers(2, 7)) * 2,
                         float(rng.uniform(0.1, 0.7)), output="sos")
        lat.upload_sos(sos)
        thr.upload_sos(sos)
        x = rng.standard_normal(2 * 16384).astype(np.float32)
        out, _ = thr.process(x, thr.initial_state(), FilterMode.CUSTOM)
        mags = np.asarray(out["magnitude"])[0]
        z = lat.initial_state()
        for f in range(2):
            m, z = lat.process_frame(
                x[f * 16384 : (f + 1) * 16384], z, FilterMode.CUSTOM
            )
            rel = np.abs(np.asarray(m) - mags[f]).max() / mags[f].max()
            assert rel < 1e-5, f"trial {trial} frame {f}: {rel}"
