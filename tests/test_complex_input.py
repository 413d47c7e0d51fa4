"""Complex (IQ) input: the SDR-natural extension of the real-only reference.

The reference feeds a real ADC with imag zero-padded
(``src/command_control.vhd:123``); IQ streams are combined by DFT linearity
(X = FFT(re) + i*FFT(im)) from two real-pipeline runs — see
``runtime/stream.process_stream_complex``.
"""

import numpy as np
import pytest
import scipy.signal as sps

from tpu_sdr.core.config import FilterMode, PipelineConfig
from tpu_sdr.runtime import SpectrumPipeline

N = 16384
FS = 1e6


@pytest.fixture(scope="module")
def pipe():
    return SpectrumPipeline(PipelineConfig())


def _cstate(pipe):
    return pipe.initial_state(batch_shape=(2,))


def test_iq_tone_is_single_sided(pipe):
    """exp(+i*2*pi*f*t) peaks at +f only — the defining IQ property (a real
    tone would mirror at N-k)."""
    f = 250_000.0
    t = np.arange(2 * N) / FS
    x = np.exp(2j * np.pi * f * t).astype(np.complex64)
    out, st = pipe.process(x, _cstate(pipe), FilterMode.BYPASS)
    mag = np.array(out["magnitude"])[0, -1]
    k = int(f * N / FS)
    assert np.argmax(mag) == k
    assert mag[N - k] < 1e-3 * mag[k], "negative-frequency image not suppressed"
    assert int(st.frame_count) == 2


def test_iq_matches_numpy_oracle(pipe):
    rng = np.random.default_rng(21)
    x = (rng.standard_normal(N) + 1j * rng.standard_normal(N)).astype(
        np.complex64
    )
    sos = sps.butter(12, 0.3, output="sos")
    pipe.upload_sos(sos)
    out, _ = pipe.process(x, _cstate(pipe), FilterMode.CUSTOM)
    mag = np.array(out["magnitude"])[0, 0]

    w = np.hanning(N)  # true Hann (the engine default)
    y = sps.sosfilt(sos, x.astype(np.complex128) * w)
    ref = np.abs(np.fft.fft(y))
    mask = ref > ref.max() * 1e-3
    db = np.abs(20 * np.log10(mag[mask] / ref[mask]))
    assert db.max() < 1.0


def test_iq_chunked_equals_oneshot(pipe):
    rng = np.random.default_rng(22)
    x = (rng.standard_normal(4 * N) + 1j * rng.standard_normal(4 * N)).astype(
        np.complex64
    )
    sos = sps.ellip(12, 0.5, 70, 0.25, output="sos")
    pipe.upload_sos(sos)
    whole, st_w = pipe.process(x, _cstate(pipe), FilterMode.CUSTOM)
    mw = np.array(whole["magnitude"])[0]
    st = _cstate(pipe)
    mags = []
    for c in np.split(x, 2):
        o, st = pipe.process(c, st, FilterMode.CUSTOM)
        mags.append(np.array(o["magnitude"])[0])
    assert np.array_equal(np.concatenate(mags, axis=0), mw)
    assert np.array_equal(np.array(st.sos_state), np.array(st_w.sos_state))


def test_iq_complex_outputs_and_state_validation(pipe):
    x = np.zeros(N, np.complex64)
    with pytest.raises(ValueError, match="initial_state"):
        pipe.process(x, pipe.initial_state(), FilterMode.BYPASS)
    out, _ = pipe.process(x, _cstate(pipe), FilterMode.BYPASS, outputs="all")
    assert set(out) == {"magnitude", "re", "im", "phase", "power"}


def test_iq_sharded_config4_shape():
    """BASELINE config 4 at test scale: IQ input, channels sharded over the
    mesh, per-channel bank, waterfall decimation — bit-identical to the
    single-device run."""
    from tpu_sdr.shard import ShardedSpectrumPipeline, make_sdr_mesh
    from tpu_sdr.runtime.waterfall import Waterfall, decimate_db

    C = 4
    cfg = PipelineConfig(channels=C)
    mesh = make_sdr_mesh(channel=4, time=2)
    sh = ShardedSpectrumPipeline(cfg, mesh)
    single = SpectrumPipeline(cfg)
    bank = np.stack(
        [sps.butter(12, 0.1 * (c + 1), output="sos") for c in range(C)]
    )
    sh.upload_sos_bank(bank)
    single.upload_sos_bank(bank)

    rng = np.random.default_rng(30)
    x = (
        rng.standard_normal((C, 4 * N)) + 1j * rng.standard_normal((C, 4 * N))
    ).astype(np.complex64)

    out_s, st_s = sh.process(x, sh.initial_state(batch_shape=(2,)), FilterMode.CUSTOM)
    out_1, st_1 = single.process(
        x, single.initial_state(batch_shape=(2,)), FilterMode.CUSTOM
    )
    mag_s = np.array(out_s["magnitude"])
    assert np.array_equal(mag_s, np.array(out_1["magnitude"]))
    assert np.array_equal(np.array(st_s.sos_state), np.array(st_1.sos_state))

    # waterfall output per channel (config 4's display product)
    wf = Waterfall(points=512, depth=16)
    wf.push(np.asarray(decimate_db(out_s["magnitude"][0], points=512)))
    assert wf.row_count == 4 and np.isfinite(wf.image()).all()


def test_iq_through_analyzer_facade():
    """SpectrumAnalyzer accepts IQ streams: state auto-shapes on first use,
    kind switches require a reset (like any datapath change)."""
    from tpu_sdr.control import SpectrumAnalyzer
    from tpu_sdr.control.commands import Command

    sa = SpectrumAnalyzer(PipelineConfig(channels=1))
    sa.handle_bytes(bytes([Command.START]))
    t = np.arange(N) / FS
    iq = np.exp(2j * np.pi * 250e3 * t).astype(np.complex64)
    out = sa.process(iq)
    mag = np.asarray(out["magnitude"])[0, 0]
    k = int(250e3 * N / FS)
    assert np.argmax(mag) == k and mag[N - k] < 1e-3 * mag[k]
    # mid-stream kind switch is rejected...
    with pytest.raises(ValueError, match="reset"):
        sa.process(np.zeros(N, np.float32))
    # ...until a reset (0xFF)
    sa.handle_bytes(bytes([Command.RESET, Command.START]))
    out = sa.process(np.zeros(N, np.float32))
    assert out is not None
    # checkpoint/restore pins the stream kind from the state shape
    sa.handle_bytes(bytes([Command.RESET, Command.START]))
    sa.process(iq)
    ck = sa.checkpoint()
    sa2 = SpectrumAnalyzer(PipelineConfig(channels=1))
    sa2.restore(ck)
    assert sa2.process(iq) is not None
    with pytest.raises(ValueError, match="reset"):
        sa2.process(np.zeros(N, np.float32))


def test_iq_with_hop_and_time_sharding():
    """IQ + overlapped framing + time sharding compose: bit-identical to the
    single-device IQ hop run, including carried history."""
    from tpu_sdr.shard import ShardedSpectrumPipeline, make_sdr_mesh

    cfg = PipelineConfig(channels=1, hop=8192)
    sh = ShardedSpectrumPipeline(cfg, make_sdr_mesh(channel=1, time=4))
    single = SpectrumPipeline(cfg)
    sos = sps.butter(12, 0.3, output="sos")
    sh.upload_sos(sos)
    single.upload_sos(sos)
    rng = np.random.default_rng(50)
    x = (
        rng.standard_normal((1, 8 * N)) + 1j * rng.standard_normal((1, 8 * N))
    ).astype(np.complex64)
    st_s = sh.initial_state(batch_shape=(2,))
    st_1 = single.initial_state(batch_shape=(2,))
    for chunk in np.split(x, 2, axis=-1):
        out_s, st_s = sh.process(chunk, st_s, FilterMode.CUSTOM)
        out_1, st_1 = single.process(chunk, st_1, FilterMode.CUSTOM)
        assert np.array_equal(
            np.array(out_s["magnitude"]), np.array(out_1["magnitude"])
        )
    assert np.array_equal(np.array(st_s.history), np.array(st_1.history))
    assert int(st_s.frame_count) == int(st_1.frame_count) == 16


def test_process_planes_rejects_misaligned_chunk():
    """Review finding: process_planes used to skip the frame-alignment
    validation process() performs and died in an opaque reshape error
    inside jit."""
    import jax.numpy as jnp

    pipe = SpectrumPipeline(PipelineConfig(channels=1))
    st = pipe.initial_state(batch_shape=(2,))
    with pytest.raises(ValueError, match="multiple of"):
        pipe.process_planes(jnp.zeros((2, 1, 100), jnp.float32), st)
