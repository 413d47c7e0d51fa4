"""Overlapped (STFT) framing: hop < fft_size with carried history."""

import numpy as np
import pytest
import scipy.signal as sps

from tpu_sdr import PipelineConfig, FilterMode
from tpu_sdr.control import golden
from tpu_sdr.runtime import SpectrumPipeline


@pytest.fixture(scope="module")
def pipe():
    p = SpectrumPipeline(PipelineConfig(hop=8192))
    p.upload_sos(sps.butter(12, 0.3, output="sos"))
    return p


def test_hop_matches_golden_stft(pipe):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(4 * 16384).astype(np.float32)
    out, st = pipe.process(x, pipe.initial_state(), FilterMode.CUSTOM)
    mag = np.array(out["magnitude"])[0]
    assert mag.shape == (8, 16384)  # T/hop frames
    assert int(st.frame_count) == 8
    yf, _ = sps.sosfilt(
        sps.butter(12, 0.3, output="sos"), x.astype(np.float64),
        zi=np.zeros((6, 2)),
    )
    ext = np.concatenate([np.zeros(8192), yf])
    w = golden.hann_true(16384)
    for k in (0, 3, 7):
        ref = np.abs(np.fft.fft(ext[k * 8192 : k * 8192 + 16384] * w))
        assert np.abs(mag[k] - ref).max() / ref.max() < 1e-5


def test_hop_chunked_bit_exact(pipe):
    rng = np.random.default_rng(1)
    x = rng.standard_normal(4 * 16384).astype(np.float32)
    out_w, st_w = pipe.process(x, pipe.initial_state(), FilterMode.CUSTOM)
    st = pipe.initial_state()
    mags = []
    for c in np.split(x, 2):
        o, st = pipe.process(c, st, FilterMode.CUSTOM)
        mags.append(np.array(o["magnitude"])[0])
    assert np.array_equal(
        np.concatenate(mags, 0), np.array(out_w["magnitude"])[0]
    )
    assert np.array_equal(np.array(st.history), np.array(st_w.history))


def test_hop_bypass_mode(pipe):
    x = golden.synth_tone(100e3, 2 * 16384).astype(np.float32)
    out, _ = pipe.process(x, pipe.initial_state(), FilterMode.BYPASS)
    mag = np.array(out["magnitude"])[0]
    assert mag.shape == (4, 16384)
    # steady-state frames (past the zero-history transient) show the tone
    assert abs(int(np.argmax(mag[3][:8192])) - 1638) <= 1


def test_hop_validation():
    with pytest.raises(ValueError, match="divide"):
        PipelineConfig(hop=10000)
    # hop + time sharding works (halo exchange): bypass smoke on a time mesh;
    # bit-identity vs single device is covered in tests/test_sharding.py.
    from tpu_sdr.shard import ShardedSpectrumPipeline, make_sdr_mesh

    mesh = make_sdr_mesh(channel=1, time=8)
    sp = ShardedSpectrumPipeline(PipelineConfig(hop=8192, channels=1), mesh)
    x = np.zeros((1, 8 * 16384), np.float32)
    out, st = sp.process(x, sp.initial_state(), FilterMode.BYPASS)
    assert np.array(out["magnitude"]).shape == (1, 16, 16384)
    assert int(st.frame_count) == 16


def test_hop_sharded_channel_only_mesh():
    """Hop mode works on a channel-only mesh with carried history (was a
    crash: sharded initial_state allocated no history)."""
    from tpu_sdr.shard import ShardedSpectrumPipeline, make_sdr_mesh
    from tpu_sdr.runtime import SpectrumPipeline

    C = 4
    mesh = make_sdr_mesh(channel=4, time=1)
    sh = ShardedSpectrumPipeline(PipelineConfig(channels=C, hop=8192), mesh)
    sg = SpectrumPipeline(PipelineConfig(channels=C, hop=8192))
    sos = sps.butter(8, 0.25, output="sos")
    sh.upload_sos(sos)
    sg.upload_sos(sos)
    rng = np.random.default_rng(11)
    x = rng.standard_normal((C, 2 * 16384)).astype(np.float32)
    out_s, st_s = sh.process(x, sh.initial_state(), FilterMode.CUSTOM)
    out_1, st_1 = sg.process(x, sg.initial_state(), FilterMode.CUSTOM)
    assert np.array_equal(
        np.asarray(out_s["magnitude"]), np.asarray(out_1["magnitude"])
    )
    assert np.asarray(st_s.history).shape == (C, 8192)


def test_hop_nonstandard_iir_block_falls_back():
    """hop + iir_block != 128: the Pallas gate must decline (was a None
    dereference) and the XLA path must produce correct spectra."""
    cfg = PipelineConfig(hop=8192, iir_block=64)
    pipe = SpectrumPipeline(cfg)
    sos = sps.butter(8, 0.25, output="sos")
    pipe.upload_sos(sos)
    x = golden.synth_tone(100e3, 2 * 16384).astype(np.float32)
    out, _ = pipe.process(x, pipe.initial_state(), FilterMode.CUSTOM)
    mag = np.array(out["magnitude"])[0]
    assert mag.shape == (4, 16384)
    assert np.isfinite(mag).all()


def test_analyzer_hop_frame_count():
    """frames_produced counts hop frames, not fft_size frames."""
    from tpu_sdr.control import SpectrumAnalyzer

    idxs = []
    sa = SpectrumAnalyzer(
        PipelineConfig(channels=1, hop=8192),
        on_spectrum=lambda mag, i: idxs.append(i),
    )
    sa.start()
    x = np.zeros((1, 2 * 16384), np.float32)
    sa.process(x)
    sa.process(x)
    assert sa.stats.frames_produced == 8
    assert idxs == list(range(8))
