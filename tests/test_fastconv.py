"""FastFIR overlap-save engine: lfilter golden model, bitwise chunk
invariance, complex taps, batching, auto-sizing, validation."""

import numpy as np
import pytest
import scipy.signal as sps

from tpu_sdr.kernels.fastconv import FastFIR, _auto_nfft


@pytest.fixture
def rng():
    return np.random.default_rng(0xFC01)


def _rel_err(got, want):
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    scale = np.max(np.abs(want)) or 1.0
    return np.max(np.abs(got - want)) / scale


# ------------------------------------------------------------------ golden


@pytest.mark.parametrize("n_taps", [33, 129, 1025])
def test_matches_lfilter(n_taps, rng):
    h = sps.firwin(n_taps, 0.21)
    f = FastFIR(h)
    t = 4 * f.chunk_granularity
    x = rng.standard_normal(t).astype(np.float32)
    out, st = f.process(x, f.initial_state())
    want = sps.lfilter(h, 1.0, x.astype(np.float64))
    assert _rel_err(out, want) < 2e-6
    assert st.offset == t


def test_long_filter_draws_bigger_fft(rng):
    h = sps.firwin(8191, 0.01)  # brick-wall-class mask
    f = FastFIR(h)
    assert f.nfft == 32768 and f.chunk_granularity == 32768 - 8191 + 1
    x = rng.standard_normal(f.chunk_granularity).astype(np.float32)
    out, _ = f.process(x, f.initial_state())
    want = sps.lfilter(h, 1.0, x.astype(np.float64))
    assert _rel_err(out, want) < 2e-5


def test_streaming_continuity_matches_lfilter(rng):
    """State carried across chunks = one long causal lfilter."""
    h = sps.firwin(257, 0.3)
    f = FastFIR(h)
    g = f.chunk_granularity
    x = rng.standard_normal(6 * g).astype(np.float32)
    st = f.initial_state()
    outs = []
    for i in range(6):
        o, st = f.process(x[i * g : (i + 1) * g], st)
        outs.append(np.asarray(o))
    want = sps.lfilter(h, 1.0, x.astype(np.float64))
    assert _rel_err(np.concatenate(outs), want) < 2e-6


# -------------------------------------------------------- chunk invariance


def test_chunked_equals_oneshot_bitwise(rng):
    h = sps.firwin(129, 0.4)
    f = FastFIR(h)
    g = f.chunk_granularity
    x = rng.standard_normal(8 * g).astype(np.float32)
    one, _ = f.process(x, f.initial_state())
    one = np.asarray(one)
    for split in [(8,), (4, 4), (1, 2, 5), (2, 1, 1, 4)]:
        st = f.initial_state()
        outs, pos = [], 0
        for nblk in split:
            o, st = f.process(x[pos : pos + nblk * g], st)
            outs.append(np.asarray(o))
            pos += nblk * g
        np.testing.assert_array_equal(np.concatenate(outs), one, str(split))


def test_checkpoint_roundtrip_bitwise(rng):
    h = sps.firwin(65, 0.25)
    f = FastFIR(h)
    g = f.chunk_granularity
    x = rng.standard_normal(2 * g).astype(np.float32)
    _, st = f.process(x[:g], f.initial_state())
    o_direct, _ = f.process(x[g:], st)
    st2 = st.to_numpy()
    from tpu_sdr.kernels.fastconv import FastFIRState

    o_restored, _ = f.process(x[g:], FastFIRState.from_numpy(st2))
    np.testing.assert_array_equal(np.asarray(o_direct), np.asarray(o_restored))


# ------------------------------------------------------------ complex taps


def test_complex_taps_match_complex_lfilter(rng):
    # frequency-offset lowpass: h * exp(j 2 pi f0 n) — a one-sided
    # (analytic) band selector
    base = sps.firwin(201, 0.15)
    h = base * np.exp(2j * np.pi * 0.22 * np.arange(base.size))
    f = FastFIR(h)
    assert f.complex_taps
    g = f.chunk_granularity
    z = (rng.standard_normal(3 * g) + 1j * rng.standard_normal(3 * g))
    planes = np.stack([z.real, z.imag]).astype(np.float32)
    out, _ = f.process_planes(planes, f.initial_state())
    got = np.asarray(out[0]) + 1j * np.asarray(out[1])
    want = sps.lfilter(h, 1.0, z)
    assert _rel_err(got.real, want.real) < 3e-6
    assert _rel_err(got.imag, want.imag) < 3e-6


def test_complex_taps_reject_real_process(rng):
    h = sps.firwin(65, 0.3) * np.exp(1j * np.arange(65))
    f = FastFIR(h)
    with pytest.raises(ValueError, match="process_planes"):
        f.process(np.zeros(f.chunk_granularity, np.float32),
                  f.initial_state())


def test_real_taps_on_planes_filter_each_plane(rng):
    h = sps.firwin(129, 0.35)
    f = FastFIR(h)
    g = f.chunk_granularity
    z = rng.standard_normal((2, 2 * g)).astype(np.float32)
    out, _ = f.process_planes(z, f.initial_state(iq=True))
    for p in range(2):
        want = sps.lfilter(h, 1.0, z[p].astype(np.float64))
        assert _rel_err(np.asarray(out[p]), want) < 2e-6


def test_complex_chunked_bitwise(rng):
    h = sps.firwin(101, 0.2) * np.exp(2j * np.pi * 0.1 * np.arange(101))
    f = FastFIR(h)
    g = f.chunk_granularity
    planes = rng.standard_normal((2, 4 * g)).astype(np.float32)
    one, _ = f.process_planes(planes, f.initial_state())
    st = f.initial_state()
    parts = []
    for i in range(4):
        o, st = f.process_planes(planes[..., i * g : (i + 1) * g], st)
        parts.append(np.asarray(o))
    np.testing.assert_array_equal(np.concatenate(parts, axis=-1),
                                  np.asarray(one))


# ---------------------------------------------------------------- batching


def test_leading_batch_axes(rng):
    h = sps.firwin(65, 0.3)
    f = FastFIR(h)
    g = f.chunk_granularity
    x = rng.standard_normal((3, 2, g)).astype(np.float32)
    out, _ = f.process(x, f.initial_state(batch_shape=(3, 2)))
    for i in range(3):
        for j in range(2):
            o1, _ = f.process(x[i, j], f.initial_state())
            np.testing.assert_array_equal(np.asarray(out[i, j]),
                                          np.asarray(o1))


# ------------------------------------------------------------- validation


def test_auto_nfft_policy():
    assert _auto_nfft(33) == 1024
    assert _auto_nfft(256) == 1024  # 769-sample block >= 3*256
    assert _auto_nfft(300) == 2048
    assert _auto_nfft(8191) == 32768
    assert _auto_nfft(40000) == 65536  # fallback: fits, under 3/4 target
    with pytest.raises(ValueError, match="cascade"):
        _auto_nfft(70000)


def test_validation_errors(rng):
    h = sps.firwin(65, 0.3)
    with pytest.raises(ValueError, match="at least 2"):
        FastFIR([1.0])
    with pytest.raises(ValueError, match="nfft must be one of"):
        FastFIR(h, nfft=1000)
    with pytest.raises(ValueError, match="block must be in"):
        FastFIR(h, nfft=1024, block=1024)
    with pytest.raises(ValueError, match="do not fit"):
        FastFIR(sps.firwin(2049, 0.1), nfft=1024)
    f = FastFIR(h)
    with pytest.raises(ValueError, match="granularity"):
        f.process(np.zeros(7, np.float32), f.initial_state())
    with pytest.raises(ValueError, match="state shape"):
        f.process(np.zeros(f.chunk_granularity, np.float32),
                  f.initial_state(batch_shape=(3,)))
    with pytest.raises(ValueError, match=r"\(2, \.\.\., T\)"):
        f.process_planes(np.zeros((3, f.chunk_granularity), np.float32),
                         f.initial_state(iq=True))


# ----------------------------------------------------------------- sharded


@pytest.mark.parametrize("mesh_shape", [(1, 2), (2, 1), (2, 4), (1, 8)])
def test_sharded_equals_single_bitwise(rng, mesh_shape):
    import jax

    from tpu_sdr.shard import ShardedFastFIR, make_sdr_mesh

    c_ax, t_ax = mesh_shape
    if c_ax * t_ax > len(jax.devices()):
        pytest.skip("not enough devices")
    h = sps.firwin(129, 0.3)
    f = FastFIR(h, nfft=1024, block=512)  # history 512 = per-shard min
    mesh = make_sdr_mesh(channel=c_ax, time=t_ax)
    sh = ShardedFastFIR(f, mesh)
    C = 2 * c_ax
    x = rng.standard_normal((C, t_ax * 2 * 512)).astype(np.float32)
    single, st1 = f.process(x, f.initial_state((C,)))
    shard, st2 = sh.process(x, sh.initial_state((C,)))
    np.testing.assert_array_equal(np.asarray(shard), np.asarray(single))
    np.testing.assert_array_equal(np.asarray(st1.tail), np.asarray(st2.tail))


def test_sharded_iq_complex_taps_bitwise(rng):
    import jax

    from tpu_sdr.shard import ShardedFastFIR, make_sdr_mesh

    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    h = sps.firwin(201, 0.2) * np.exp(2j * np.pi * 0.15 * np.arange(201))
    f = FastFIR(h, nfft=2048, block=1024)
    mesh = make_sdr_mesh(channel=2, time=4)
    sh = ShardedFastFIR(f, mesh)
    planes = rng.standard_normal((2, 2, 4 * 1024)).astype(np.float32)
    single, st1 = f.process_planes(planes, f.initial_state((2,)))
    shard, st2 = sh.process_planes(planes, sh.initial_state((2,)))
    np.testing.assert_array_equal(np.asarray(shard), np.asarray(single))
    np.testing.assert_array_equal(np.asarray(st1.tail), np.asarray(st2.tail))


def test_sharded_streaming_chunks_bitwise(rng):
    import jax

    from tpu_sdr.shard import ShardedFastFIR, make_sdr_mesh

    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    h = sps.firwin(129, 0.4)
    f = FastFIR(h, nfft=1024, block=512)
    mesh = make_sdr_mesh(channel=1, time=8)
    sh = ShardedFastFIR(f, mesh)
    x = rng.standard_normal((2, 2 * sh.chunk_granularity)).astype(np.float32)
    one, _ = f.process(x, f.initial_state((2,)))
    st = sh.initial_state((2,))
    parts = []
    for i in range(2):
        o, st = sh.process(
            x[..., i * sh.chunk_granularity : (i + 1) * sh.chunk_granularity],
            st)
        parts.append(np.asarray(o))
    np.testing.assert_array_equal(np.concatenate(parts, -1), np.asarray(one))


def test_sharded_validation(rng):
    import jax

    from tpu_sdr.shard import ShardedFastFIR, make_sdr_mesh

    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    f = FastFIR(sps.firwin(129, 0.3), nfft=1024, block=512)
    sh = ShardedFastFIR(f, make_sdr_mesh(channel=1, time=4))
    with pytest.raises(ValueError, match="divide over"):
        sh.process(np.zeros((2, 514), np.float32), sh.initial_state((2,)))
    with pytest.raises(ValueError, match="not a multiple"):
        sh.process(np.zeros((2, 4 * 256), np.float32),
                   sh.initial_state((2,)))


def test_custom_block_rounds_granularity(rng):
    h = sps.firwin(129, 0.3)
    f = FastFIR(h, nfft=1024, block=768)  # round number, extra overlap
    assert f.chunk_granularity == 768 and f.history == 256
    x = rng.standard_normal(3 * 768).astype(np.float32)
    out, _ = f.process(x, f.initial_state())
    want = sps.lfilter(h, 1.0, x.astype(np.float64))
    assert _rel_err(out, want) < 2e-6
