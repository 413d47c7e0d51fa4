"""End-to-end streaming pipeline vs the golden CPU chain (BASELINE configs 1-2)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal as sps

from tpu_sdr.control import golden
from tpu_sdr.core.config import FilterMode, PipelineConfig
from tpu_sdr.runtime import SpectrumPipeline


@pytest.fixture(scope="module")
def pipe():
    return SpectrumPipeline(PipelineConfig())


def _db(x):
    return 20.0 * np.log10(np.maximum(np.asarray(x, np.float64), 1e-12))


def test_config1_tone_bypass_within_1db(pipe):
    """Config 1: 100 kHz tone, Hann + FFT + magnitude vs golden, <=1 dB."""
    x = golden.synth_tone(100_000.0, 16384, 1_000_000.0)
    ref = golden.golden_pipeline(x, sos=None, window="hann")["magnitude"][0]
    out, st = pipe.process(x.astype(np.float32), pipe.initial_state(), FilterMode.BYPASS)
    mag = np.array(out["magnitude"])[0, 0]
    # compare on bins with meaningful energy (top 60 dB)
    mask = ref > ref.max() * 1e-3
    diff_db = np.abs(_db(mag[mask]) - _db(ref[mask]))
    assert diff_db.max() < 1.0
    assert int(st.frame_count) == 1


def test_config1_custom_filter_within_1db(pipe):
    sos = sps.butter(12, 0.25, output="sos")
    pipe.upload_sos(sos)
    x = golden.synth_tone(100_000.0, 16384, 1_000_000.0, noise=0.01)
    ref = golden.golden_pipeline(x, sos=sos, window="hann")["magnitude"][0]
    out, _ = pipe.process(x.astype(np.float32), pipe.initial_state(), FilterMode.CUSTOM)
    mag = np.array(out["magnitude"])[0, 0]
    mask = ref > ref.max() * 1e-3
    diff_db = np.abs(_db(mag[mask]) - _db(ref[mask]))
    assert diff_db.max() < 1.0


def test_config2_stream_chunks_equal_oneshot(pipe):
    """Config 2: sequential blocks with carried IIR state == one long run."""
    rng = np.random.default_rng(5)
    sos = sps.ellip(12, 0.5, 70, 0.3, output="sos")
    pipe.upload_sos(sos)
    x = rng.standard_normal(8 * 16384).astype(np.float32)

    out_whole, st_whole = pipe.process(x, pipe.initial_state(), FilterMode.CUSTOM)
    mags_whole = np.array(out_whole["magnitude"])[0]

    st = pipe.initial_state()
    mags = []
    for chunk in np.split(x, 4):
        out, st = pipe.process(chunk, st, FilterMode.CUSTOM)
        mags.append(np.array(out["magnitude"])[0])
    mags_chunked = np.concatenate(mags, axis=0)

    assert np.array_equal(mags_chunked, mags_whole), "chunking changed bits"
    assert int(st.frame_count) == 8
    assert np.array_equal(np.array(st.sos_state), np.array(st_whole.sos_state))


def test_single_frame_chunks_equal_oneshot(pipe):
    """1-frame dispatches must also be bit-identical to a batched run.

    Regression: a single-frame single-channel dispatch used to flatten the
    composite IIR's zhat contraction to an M=1 GEMV whose accumulation order
    differed from the batched GEMM (bitwise state divergence on CPU); the
    canonical-math guard in `_composite_frame_terms` pads the frame axis.
    """
    rng = np.random.default_rng(17)
    pipe.upload_sos(sps.butter(12, 0.2, output="sos"))
    x = rng.standard_normal(4 * 16384).astype(np.float32)
    out_whole, st_whole = pipe.process(x, pipe.initial_state(), FilterMode.CUSTOM)
    mags_whole = np.array(out_whole["magnitude"])[0]
    st = pipe.initial_state()
    mags = []
    for chunk in np.split(x, 4):
        out, st = pipe.process(chunk, st, FilterMode.CUSTOM)
        mags.append(np.array(out["magnitude"])[0])
    assert np.array_equal(np.concatenate(mags, axis=0), mags_whole)
    assert np.array_equal(np.array(st.sos_state), np.array(st_whole.sos_state))


@pytest.mark.parametrize(
    "cfg_kw",
    [
        dict(dtype="f32"),
        dict(dtype="f32", fused_two_pass=True),
        dict(dtype="f32max"),
        dict(dtype="f32max", fused_two_pass=True),
        dict(dtype="bf16"),
        dict(dtype="bf16", bf16_io=True),
    ],
    ids=["f32", "f32-fused", "f32max-hybrid", "f32max-fused", "bf16",
         "bf16-io"],
)
def test_quality_tiers_meet_contract_and_chunk_identity(cfg_kw):
    """Every quality tier (and both f32max structures, and the bf16_io
    reduced-HBM variant) meets the 1 dB contract and keeps chunked ==
    one-shot bit-identity."""
    p = SpectrumPipeline(PipelineConfig(**cfg_kw))
    sos = sps.butter(12, 0.25, output="sos")
    p.upload_sos(sos)
    x = golden.synth_tone(100_000.0, 2 * 16384, 1_000_000.0, noise=0.01)
    ref = golden.golden_pipeline(x, sos=sos, window="hann")["magnitude"]
    out, st = p.process(x.astype(np.float32), p.initial_state(), FilterMode.CUSTOM)
    if cfg_kw.get("bf16_io"):
        # the opt-in mode stores magnitudes as bfloat16 (dtype contract)
        assert out["magnitude"].dtype == jnp.bfloat16
    mag = np.array(out["magnitude"], dtype=np.float32)[0]
    mask = ref > ref.max() * 1e-3
    assert np.abs(_db(mag[mask]) - _db(ref[mask])).max() < 1.0
    # chunked == one-shot (frame-granular)
    stc = p.initial_state()
    mags = []
    for chunk in np.split(x.astype(np.float32), 2):
        o, stc = p.process(chunk, stc, FilterMode.CUSTOM)
        mags.append(np.array(o["magnitude"])[0])
    assert np.array_equal(np.concatenate(mags, axis=0), mag)
    assert np.array_equal(np.array(stc.sos_state), np.array(st.sos_state))


def test_fixed_mode_matches_golden_fixed_sos(pipe):
    x = golden.synth_tone(50_000.0, 16384, 1_000_000.0, noise=0.05, seed=9)
    ref = golden.golden_pipeline(x, sos=golden.fixed_filter_sos())["magnitude"][0]
    out, _ = pipe.process(x.astype(np.float32), pipe.initial_state(), FilterMode.FIXED)
    mag = np.array(out["magnitude"])[0, 0]
    mask = ref > ref.max() * 1e-3
    diff_db = np.abs(_db(mag[mask]) - _db(ref[mask]))
    assert diff_db.max() < 1.0


def test_multichannel_independent(pipe):
    rng = np.random.default_rng(11)
    x = rng.standard_normal((3, 16384)).astype(np.float32)
    st = pipe.initial_state()
    # state shape is (channels,...) from cfg; build explicit 3-channel state
    from tpu_sdr.runtime.state import StreamState

    st3 = StreamState(
        sos_state=jnp.zeros((3, 6, 2), jnp.float32),
        window_phase=st.window_phase,
        frame_count=st.frame_count,
    )
    out, _ = pipe.process(x, st3, FilterMode.FIXED)
    mags = np.array(out["magnitude"])
    for c in range(3):
        st1 = StreamState(
            sos_state=jnp.zeros((1, 6, 2), jnp.float32),
            window_phase=st.window_phase,
            frame_count=st.frame_count,
        )
        out1, _ = pipe.process(x[c : c + 1], st1, FilterMode.FIXED)
        m1 = np.array(out1["magnitude"])[0]
        # Channels are mathematically independent; different batch shapes may
        # round differently (per-shape XLA matmul strategies), so compare
        # within float tolerance.
        assert np.abs(m1 - mags[c]).max() / (mags[c].max() + 1e-30) < 1e-5


def test_rtl_faithful_window_mode():
    pipe_rtl = SpectrumPipeline(PipelineConfig(rtl_faithful_window=True))
    x = golden.synth_tone(100_000.0, 16384, 1_000_000.0)
    ref = golden.golden_pipeline(x, sos=None, window="rtl")["magnitude"][0]
    out, _ = pipe_rtl.process(
        x.astype(np.float32), pipe_rtl.initial_state(), FilterMode.BYPASS
    )
    mag = np.array(out["magnitude"])[0, 0]
    mask = ref > ref.max() * 1e-3
    assert np.abs(_db(mag[mask]) - _db(ref[mask])).max() < 1.0


def test_phase_output_matches_numpy(pipe):
    """BASELINE metric names 'FFT magnitude/phase output': outputs='phase'."""
    rng = np.random.default_rng(33)
    x = rng.standard_normal(16384).astype(np.float32)
    out, _ = pipe.process(x, pipe.initial_state(), FilterMode.BYPASS,
                          outputs="all")
    assert set(out) == {"magnitude", "re", "im", "phase", "power"}
    ref = np.fft.fft(x.astype(np.float64) * np.hanning(16384))
    got = np.asarray(out["phase"])[0, 0]
    # compare where the magnitude is meaningful (phase of ~0 bins is noise)
    mask = np.abs(ref) > np.abs(ref).max() * 1e-3
    dphi = np.angle(np.exp(1j * (got[mask] - np.angle(ref)[mask])))
    assert np.abs(dphi).max() < 1e-2

    out2, _ = pipe.process(x, pipe.initial_state(), FilterMode.BYPASS,
                           outputs="phase")
    assert set(out2) == {"phase"}
    assert np.array_equal(np.asarray(out2["phase"]), np.asarray(out["phase"]))


def test_bf16_io_complex_bypass_rounding_contract():
    """Review finding: complex BYPASS must NOT cast the raw IQ input to
    bf16 before the in-kernel window — bf16_io magnitudes are the plain
    bf16 tier's f32 results rounded once on store, in every mode."""
    rng = np.random.default_rng(3)
    x = (rng.standard_normal(2 * 16384)
         + 1j * rng.standard_normal(2 * 16384)).astype(np.complex64)
    p_ref = SpectrumPipeline(PipelineConfig(dtype="bf16"))
    p_io = SpectrumPipeline(PipelineConfig(dtype="bf16", bf16_io=True))
    o_ref, _ = p_ref.process(
        x, p_ref.initial_state(batch_shape=(2,)), FilterMode.BYPASS
    )
    o_io, _ = p_io.process(
        x, p_io.initial_state(batch_shape=(2,)), FilterMode.BYPASS
    )
    assert o_io["magnitude"].dtype == jnp.bfloat16
    ref_rounded = np.asarray(
        jnp.asarray(np.asarray(o_ref["magnitude"])).astype(jnp.bfloat16)
    )
    assert np.array_equal(np.asarray(o_io["magnitude"]), ref_rounded)


def test_bf16_io_fallback_path_dtype_contract():
    """Review finding: the XLA fallback paths (outputs='all' etc.) must
    honor the bf16_io magnitude dtype, not silently return f32 from one
    execution path and bf16 from another."""
    p = SpectrumPipeline(PipelineConfig(dtype="bf16", bf16_io=True))
    x = np.random.default_rng(4).standard_normal(16384).astype(np.float32)
    out, _ = p.process(x, p.initial_state(), FilterMode.BYPASS, outputs="all")
    assert out["magnitude"].dtype == jnp.bfloat16
    assert out["re"].dtype == jnp.float32  # other outputs stay f32
    assert np.isfinite(np.asarray(out["magnitude"], np.float32)).all()


def test_bf16_io_hop_mode_contract():
    """bf16_io in overlapped (hop < N) framing: bf16 magnitudes, and
    chunked == one-shot stays bitwise with the carried history."""
    p = SpectrumPipeline(
        PipelineConfig(dtype="bf16", bf16_io=True, hop=8192)
    )
    p.upload_sos(sps.butter(12, 0.3, output="sos"))
    x = np.random.default_rng(6).standard_normal(4 * 16384).astype(np.float32)
    out, st = p.process(x, p.initial_state(), FilterMode.CUSTOM)
    assert out["magnitude"].dtype == jnp.bfloat16
    stc = p.initial_state()
    mags = []
    for chunk in np.split(x, 4):
        o, stc = p.process(chunk, stc, FilterMode.CUSTOM)
        mags.append(np.array(o["magnitude"])[0])
    assert np.array_equal(
        np.concatenate(mags, axis=0), np.array(out["magnitude"])[0]
    )
    assert np.array_equal(np.array(stc.history), np.array(st.history))
