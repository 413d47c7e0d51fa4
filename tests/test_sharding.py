"""Sharding invariance: any (channel, time) mesh == single device, bit-exact.

Runs on a virtual 8-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8) — the same mechanism the driver's
multi-chip dryrun uses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal as sps

from tpu_sdr.core.config import FilterMode, PipelineConfig
from tpu_sdr.runtime import SpectrumPipeline
from tpu_sdr.runtime.state import StreamState
from tpu_sdr.shard import ShardedSpectrumPipeline, make_sdr_mesh


N = 16384


def _mk_input(channels, frames, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((channels, frames * N)).astype(np.float32)


def _state(channels):
    return StreamState(
        sos_state=jnp.zeros((channels, 6, 2), jnp.float32),
        window_phase=jnp.zeros((), jnp.int32),
        frame_count=jnp.zeros((), jnp.int32),
    )


@pytest.fixture(scope="module")
def single():
    return SpectrumPipeline(PipelineConfig())


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4), (8, 1)])
def test_sharded_equals_single_device(single, mesh_shape):
    channels, time = mesh_shape
    cfg = PipelineConfig(channels=max(channels, 2))
    mesh = make_sdr_mesh(channel=channels, time=time)
    sharded = ShardedSpectrumPipeline(cfg, mesh)
    sos = sps.butter(12, 0.22, output="sos")
    sharded.upload_sos(sos)
    single.upload_sos(sos)

    C = max(channels, 2)
    x = _mk_input(C, 8, seed=3)

    out_s, st_s = sharded.process(x, _state(C), FilterMode.CUSTOM)
    out_1, st_1 = single.process(x, _state(C), FilterMode.CUSTOM)

    mag_s = np.array(out_s["magnitude"])
    mag_1 = np.array(out_1["magnitude"])
    assert mag_s.shape == mag_1.shape
    assert np.array_equal(mag_s, mag_1), (
        f"mesh {mesh_shape}: sharded spectra differ from single-device "
        f"(max abs diff {np.abs(mag_s - mag_1).max()})"
    )
    assert np.array_equal(np.array(st_s.sos_state), np.array(st_1.sos_state))
    assert int(st_s.frame_count) == int(st_1.frame_count) == 8


def test_sharded_stream_chunks_carry_state():
    mesh = make_sdr_mesh(channel=1, time=8)
    cfg = PipelineConfig(channels=1)
    sharded = ShardedSpectrumPipeline(cfg, mesh)
    sos = sps.cheby1(12, 0.5, 0.3, output="sos")
    sharded.upload_sos(sos)
    x = _mk_input(1, 16, seed=4)

    out_w, st_w = sharded.process(x, _state(1), FilterMode.CUSTOM)
    st = _state(1)
    mags = []
    for chunk in np.split(x, 2, axis=-1):
        out, st = sharded.process(chunk, st, FilterMode.CUSTOM)
        mags.append(np.array(out["magnitude"]))
    mag_c = np.concatenate(mags, axis=1)
    mag_w = np.array(out_w["magnitude"])
    # Different dispatch shapes may round differently (XLA picks per-shape
    # matmul strategies); the contract across *different* chunkings is float
    # tolerance. Bit-exactness holds for equal dispatch shapes / mesh shapes.
    assert np.abs(mag_c - mag_w).max() / mag_w.max() < 1e-5
    assert np.abs(
        np.array(st.sos_state) - np.array(st_w.sos_state)
    ).max() < 1e-5
    # Equal-shape dispatches ARE bit-deterministic: re-run the chunked stream.
    st2 = _state(1)
    mags2 = []
    for chunk in np.split(x, 2, axis=-1):
        out, st2 = sharded.process(chunk, st2, FilterMode.CUSTOM)
        mags2.append(np.array(out["magnitude"]))
    assert np.array_equal(np.concatenate(mags2, axis=1), mag_c)
    assert np.array_equal(np.array(st2.sos_state), np.array(st.sos_state))


def test_bypass_mode_sharded(single):
    mesh = make_sdr_mesh(channel=2, time=4)
    cfg = PipelineConfig(channels=2)
    sharded = ShardedSpectrumPipeline(cfg, mesh)
    x = _mk_input(2, 4, seed=6)
    out_s, _ = sharded.process(x, _state(2), FilterMode.BYPASS)
    out_1, _ = single.process(x, _state(2), FilterMode.BYPASS)
    assert np.array_equal(
        np.array(out_s["magnitude"]), np.array(out_1["magnitude"])
    )


def test_mesh_validation():
    with pytest.raises(ValueError):
        make_sdr_mesh(channel=3, time=3)


def test_intra_fft_sharding():
    """TP-like single-frame FFT sharding == unsharded four-step (SURVEY §2.7)."""
    import jax
    from jax.sharding import PartitionSpec as P
    from tpu_sdr.kernels import fft

    plan = fft.plan_constants(128, 128)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((128, 128)).astype(np.float32)  # one 16K frame

    mesh = jax.make_mesh((8,), ("fft",))
    fn = jax.jit(
        jax.shard_map(
            lambda xl: fft.fft_4step_sharded(xl, None, plan, "fft"),
            mesh=mesh,
            in_specs=P(None, "fft"),
            out_specs=(P("fft"), P("fft")),
            check_vma=False,
        )
    )
    sr, si = fn(jnp.asarray(x))
    fr, fi = fft.fft_4step(jnp.asarray(x.reshape(-1)), None, plan)
    ref = np.asarray(fr) + 1j * np.asarray(fi)
    got = np.asarray(sr).reshape(-1) + 1j * np.asarray(si).reshape(-1)
    assert np.max(np.abs(got - ref)) / np.abs(ref).max() < 1e-5

    # complex input too
    xi = rng.standard_normal((128, 128)).astype(np.float32)
    fn2 = jax.jit(
        jax.shard_map(
            lambda xl, xil: fft.fft_4step_sharded(xl, xil, plan, "fft"),
            mesh=mesh,
            in_specs=(P(None, "fft"), P(None, "fft")),
            out_specs=(P("fft"), P("fft")),
            check_vma=False,
        )
    )
    sr2, si2 = fn2(jnp.asarray(x), jnp.asarray(xi))
    fr2, fi2 = fft.fft_4step(
        jnp.asarray(x.reshape(-1)), jnp.asarray(xi.reshape(-1)), plan
    )
    ref2 = np.asarray(fr2) + 1j * np.asarray(fi2)
    got2 = np.asarray(sr2).reshape(-1) + 1j * np.asarray(si2).reshape(-1)
    assert np.max(np.abs(got2 - ref2)) / np.abs(ref2).max() < 1e-5


def test_banked_time_sharded_equals_single():
    """Per-channel filter banks on a (channel, time) mesh == single device."""
    C = 2
    cfg = PipelineConfig(channels=C)
    mesh = make_sdr_mesh(channel=2, time=4)
    sharded = ShardedSpectrumPipeline(cfg, mesh)
    single_p = SpectrumPipeline(cfg)
    bank = np.stack(
        [sps.butter(12, 0.1 * (c + 1), output="sos") for c in range(C)]
    )
    sharded.upload_sos_bank(bank)
    single_p.upload_sos_bank(bank)
    x = _mk_input(C, 8, seed=12)
    out_s, st_s = sharded.process(x, _state(C), FilterMode.CUSTOM)
    out_1, st_1 = single_p.process(x, _state(C), FilterMode.CUSTOM)
    assert np.array_equal(
        np.array(out_s["magnitude"]), np.array(out_1["magnitude"])
    )
    assert np.array_equal(np.array(st_s.sos_state), np.array(st_1.sos_state))


def test_hop_time_sharded_equals_single():
    """Overlapped (STFT) framing with time sharding: the halo exchange.

    The (N - hop) IIR tail rides ppermute to the right-hand neighbor; shard 0
    splices the carried history. Spectra, final state, and the replicated
    history must be bit-identical to the single-device run, including across
    carried-state chunk boundaries.
    """
    cfg = PipelineConfig(channels=2, hop=8192)
    mesh = make_sdr_mesh(channel=2, time=4)
    sharded = ShardedSpectrumPipeline(cfg, mesh)
    single_p = SpectrumPipeline(cfg)
    sos = sps.ellip(12, 0.5, 70, 0.3, output="sos")
    sharded.upload_sos(sos)
    single_p.upload_sos(sos)
    x = _mk_input(2, 16, seed=13)

    st_s = sharded.initial_state()
    st_1 = single_p.initial_state(batch_shape=())
    mags_s, mags_1 = [], []
    for chunk in np.split(x, 2, axis=-1):
        out_s, st_s = sharded.process(chunk, st_s, FilterMode.CUSTOM)
        out_1, st_1 = single_p.process(chunk, st_1, FilterMode.CUSTOM)
        mags_s.append(np.array(out_s["magnitude"]))
        mags_1.append(np.array(out_1["magnitude"]))
    assert np.array_equal(np.concatenate(mags_s, 1), np.concatenate(mags_1, 1))
    assert np.array_equal(np.array(st_s.sos_state), np.array(st_1.sos_state))
    assert np.array_equal(np.array(st_s.history), np.array(st_1.history))
    assert int(st_s.frame_count) == int(st_1.frame_count)


def test_phase_output_sharded():
    mesh = make_sdr_mesh(channel=2, time=4)
    sh = ShardedSpectrumPipeline(PipelineConfig(channels=2), mesh)
    single = SpectrumPipeline(PipelineConfig(channels=2))
    x = _mk_input(2, 8, seed=44)
    out_s, _ = sh.process(x, _state(2), FilterMode.BYPASS, outputs="phase")
    out_1, _ = single.process(x, _state(2), FilterMode.BYPASS, outputs="phase")
    assert np.array_equal(np.array(out_s["phase"]), np.array(out_1["phase"]))


@pytest.mark.parametrize("mesh_shape", [(2, 4), (1, 8)])
def test_sharded_equals_single_device_bf16_io(mesh_shape):
    """The bf16_io reduced-HBM mode keeps the sharded == single-device
    bitwise contract (the y->bf16 cast and bf16 magnitude store are
    elementwise, applied identically per shard)."""
    channels, time = mesh_shape
    cfg = PipelineConfig(channels=max(channels, 2), dtype="bf16",
                         bf16_io=True)
    mesh = make_sdr_mesh(channel=channels, time=time)
    sharded = ShardedSpectrumPipeline(cfg, mesh)
    single_io = SpectrumPipeline(cfg)
    sos = sps.butter(12, 0.22, output="sos")
    sharded.upload_sos(sos)
    single_io.upload_sos(sos)

    C = max(channels, 2)
    x = _mk_input(C, 8, seed=5)
    out_s, st_s = sharded.process(x, _state(C), FilterMode.CUSTOM)
    out_1, st_1 = single_io.process(x, _state(C), FilterMode.CUSTOM)
    assert out_s["magnitude"].dtype == out_1["magnitude"].dtype == jnp.bfloat16
    assert np.array_equal(
        np.asarray(out_s["magnitude"], dtype=np.float32),
        np.asarray(out_1["magnitude"], dtype=np.float32),
    )
    assert np.array_equal(
        np.array(st_s.sos_state), np.array(st_1.sos_state)
    )


def test_friendly_channel_divisibility_error():
    """Review finding: a channels count that doesn't divide the mesh's
    channel axis used to pay the full mesh transfer and die as a cryptic
    GSPMD error; now it's a friendly ValueError BEFORE the put."""
    mesh = make_sdr_mesh(channel=4, time=2)
    pipe = ShardedSpectrumPipeline(PipelineConfig(channels=6), mesh)
    x = np.zeros((6, 2 * 16384), np.float32)
    with pytest.raises(ValueError, match="channel axis"):
        pipe.process(x, pipe.initial_state())

    from tpu_sdr.kernels.fastconv import FastFIR
    from tpu_sdr.shard import ShardedFastFIR

    sff = ShardedFastFIR(
        FastFIR(sps.firwin(65, 0.3), nfft=1024, block=512), mesh
    )
    with pytest.raises(ValueError, match="channel axis"):
        sff.process(
            np.zeros((6, 2 * 512), np.float32), sff.initial_state((6,))
        )
    # and the per-shard block message names both quantities coherently
    with pytest.raises(ValueError, match="chunk_granularity=1024"):
        sff.process(
            np.zeros((4, 2 * 256), np.float32), sff.initial_state((4,))
        )
