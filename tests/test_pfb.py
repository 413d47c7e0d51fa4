"""PFB channelizer: golden math, streaming invariance, sharding invariance."""

import numpy as np
import pytest

from tpu_sdr.kernels.pfb import Channelizer, design_prototype, dft_matrices
from tpu_sdr.shard import make_sdr_mesh
from tpu_sdr.shard.channelizer import ShardedChannelizer

M, P, FS = 128, 8, 1e6


def _golden(x, m, taps):
    """Direct NumPy weighted-overlap-fold + DFT (float64)."""
    h = design_prototype(m, taps)
    hist = (taps - 1) * m
    xc = np.concatenate([np.zeros(x.shape[:-1] + (hist,)), x], axis=-1)
    steps = x.shape[-1] // m
    W = np.exp(-2j * np.pi * np.outer(np.arange(m), np.arange(m)) / m)
    Y = np.zeros(x.shape[:-1] + (steps, m), complex)
    for n in range(steps):
        blk = xc[..., n * m : (n + taps) * m] * h
        Y[..., n, :] = blk.reshape(x.shape[:-1] + (taps, m)).sum(axis=-2) @ W
    return Y


@pytest.fixture(scope="module")
def ch():
    return Channelizer(m=M, taps=P, sample_rate=FS)


def test_real_matches_golden(ch, rng):
    x = rng.standard_normal((2, 32 * M)).astype(np.float32)
    out, _ = ch.process(x, ch.initial_state((2,)))
    Y = _golden(x, M, P)
    assert np.abs(np.asarray(out["re"]) - Y.real).max() < 1e-5
    assert np.abs(np.asarray(out["im"]) - Y.imag).max() < 1e-5


def test_iq_matches_golden(ch, rng):
    x = (rng.standard_normal(32 * M) + 1j * rng.standard_normal(32 * M))
    xs = np.stack([x.real, x.imag]).astype(np.float32)
    out, _ = ch.process_planes(xs, ch.initial_state((2,)))
    Y = _golden(x.real, M, P) + 1j * _golden(x.imag, M, P)
    assert np.abs(np.asarray(out["re"]) - Y.real).max() < 1e-5
    assert np.abs(np.asarray(out["im"]) - Y.imag).max() < 1e-5


def test_tone_lands_in_its_channel(ch):
    k = 37
    t = np.arange(64 * M) / FS
    iq = np.exp(2j * np.pi * (k * FS / M) * t)
    xs = np.stack([iq.real, iq.imag]).astype(np.float32)[:, None, :]
    out, _ = ch.process_planes(xs, ch.initial_state((2, 1)), outputs="magnitude")
    mag = np.asarray(out["magnitude"])[0, -1]  # settled step
    assert int(np.argmax(mag)) == k
    assert np.isclose(mag[k], 1.0, atol=1e-3)  # unit gain at channel center
    # prototype stopband: adjacent channel down >= 55 dB
    assert 20 * np.log10(mag[(k + 1) % M] / mag[k]) < -55.0


def test_real_tone_mirror_channels(ch):
    k = 10
    t = np.arange(64 * M) / FS
    x = np.cos(2 * np.pi * (k * FS / M) * t).astype(np.float32)[None, :]
    out, _ = ch.process(x, ch.initial_state((1,)), outputs="magnitude")
    mag = np.asarray(out["magnitude"])[0, -1]
    top2 = set(np.argsort(mag)[-2:].tolist())
    assert top2 == {k, M - k}  # conjugate-symmetric pair


@pytest.mark.parametrize("n_chunks", [2, 4, 8])
def test_chunked_equals_oneshot_bitwise(ch, rng, n_chunks):
    x = rng.standard_normal((3, 32 * M)).astype(np.float32)
    one, _ = ch.process(x, ch.initial_state((3,)))
    st = ch.initial_state((3,))
    parts = []
    step = x.shape[-1] // n_chunks
    for i in range(n_chunks):
        o, st = ch.process(x[:, i * step : (i + 1) * step], st)
        parts.append(np.asarray(o["re"]))
    assert np.array_equal(np.concatenate(parts, axis=1), np.asarray(one["re"]))


def test_state_roundtrip_continues_stream(ch, rng):
    """The carried state is exactly the stream tail: resuming from it is
    indistinguishable from never stopping."""
    x = rng.standard_normal((1, 16 * M)).astype(np.float32)
    _, st = ch.process(x[:, : 8 * M], ch.initial_state((1,)))
    assert np.array_equal(
        np.asarray(st), x[:, 8 * M - ch.history_len : 8 * M]
    )


def test_validation_errors(ch):
    with pytest.raises(ValueError, match="multiple of m"):
        ch.process(np.zeros((1, M + 1), np.float32), ch.initial_state((1,)))
    with pytest.raises(ValueError, match="state shape"):
        ch.process(np.zeros((1, M), np.float32), ch.initial_state((2,)))
    with pytest.raises(ValueError, match="dtype"):
        Channelizer(dtype="f16")
    with pytest.raises(ValueError, match="m >= 2"):
        Channelizer(m=1)


def test_dft_matrix_contract():
    cos, sin = dft_matrices(8)
    W = np.exp(-2j * np.pi * np.outer(np.arange(8), np.arange(8)) / 8)
    assert np.allclose(cos - 1j * sin, W, atol=1e-6)


@pytest.mark.parametrize("mesh_shape", [(1, 2), (2, 1), (2, 4), (1, 8)])
def test_sharded_equals_single_bitwise(ch, rng, mesh_shape):
    import jax

    c_ax, t_ax = mesh_shape
    if c_ax * t_ax > len(jax.devices()):
        pytest.skip("not enough devices")
    mesh = make_sdr_mesh(channel=c_ax, time=t_ax)
    sh = ShardedChannelizer(ch, mesh)
    C = 2 * c_ax
    x = rng.standard_normal((C, 64 * M)).astype(np.float32)
    single, st1 = ch.process(x, ch.initial_state((C,)))
    shard, st2 = sh.process(x, sh.initial_state((C,)))
    assert np.array_equal(np.asarray(shard["re"]), np.asarray(single["re"]))
    assert np.array_equal(np.asarray(shard["im"]), np.asarray(single["im"]))
    assert np.array_equal(np.asarray(st1), np.asarray(st2))


def test_sharded_iq_equals_single_bitwise(ch, rng):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = make_sdr_mesh(channel=2, time=4)
    sh = ShardedChannelizer(ch, mesh)
    xs = rng.standard_normal((2, 2, 32 * M)).astype(np.float32)
    single, _ = ch.process_planes(xs, ch.initial_state((2, 2)))
    shard, _ = sh.process_planes(xs, sh.initial_state((2, 2)))
    assert np.array_equal(np.asarray(shard["re"]), np.asarray(single["re"]))


def test_sharded_streaming_chunks(ch, rng):
    """Sharded + chunked streaming == single-device one-shot, bitwise."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = make_sdr_mesh(channel=1, time=8)
    sh = ShardedChannelizer(ch, mesh)
    x = rng.standard_normal((1, 128 * M)).astype(np.float32)
    one, _ = ch.process(x, ch.initial_state((1,)))
    st = sh.initial_state((1,))
    parts = []
    for i in range(2):
        o, st = sh.process(x[:, i * 64 * M : (i + 1) * 64 * M], st)
        parts.append(np.asarray(o["re"]))
    assert np.array_equal(np.concatenate(parts, axis=1), np.asarray(one["re"]))


def test_sharded_validation(ch):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    sh = ShardedChannelizer(ch, make_sdr_mesh(channel=1, time=8))
    with pytest.raises(ValueError, match="shorter than the halo"):
        sh.process(
            np.zeros((1, 8 * M), np.float32), sh.initial_state((1,))
        )  # 1 step/shard < 7*M halo


def test_zoom_fft_composition():
    """Channelizer -> IQ spectrum pipeline ("zoom FFT"): two tones that the
    direct FFT cannot separate are resolved inside one subchannel."""
    from tpu_sdr.core.config import FilterMode, PipelineConfig
    from tpu_sdr.runtime import SpectrumPipeline

    fs, m, taps, N = 1e6, 32, 4, 1024
    ch = Channelizer(m=m, taps=taps, sample_rate=fs)
    sub_rate = fs / m  # 31.25 kHz
    k = 5
    # offsets at exact zoom-bin centers 40 and 100 (zoom bin = 30.5 Hz);
    # the direct 1024-pt FFT at 1 MSPS has 976 Hz/bin -> both offsets land
    # in the SAME direct bin
    b1, b2 = 40, 55
    f1 = k * sub_rate + b1 * sub_rate / N
    f2 = k * sub_rate + b2 * sub_rate / N
    assert int(f1 / (fs / N)) == int(f2 / (fs / N))  # unresolvable directly

    T = (2 * N + taps) * m  # two zoom frames after channelization + settle
    T -= T % m
    t = np.arange(T) / fs
    iq = 0.5 * np.exp(2j * np.pi * f1 * t) + 0.5 * np.exp(2j * np.pi * f2 * t)
    xs = np.stack([iq.real, iq.imag]).astype(np.float32)

    out, _ = ch.process_planes(xs, ch.initial_state((2,)))
    sub = np.asarray(out["re"])[..., k] + 1j * np.asarray(out["im"])[..., k]
    sub = sub[taps:]  # drop the prototype's settle steps
    sub = sub[: 2 * N]

    cfg = PipelineConfig(
        fft_size=N, fft_n1=32, fft_n2=32, channels=1, sample_rate=sub_rate
    )
    pipe = SpectrumPipeline(cfg)
    st = pipe.initial_state(batch_shape=(2,))
    zout, _ = pipe.process(sub.astype(np.complex64)[None, :], st,
                           FilterMode.BYPASS)
    mag = np.asarray(zout["magnitude"])[0, -1]
    top2 = sorted(np.argsort(mag)[-2:].tolist())
    assert top2 == [b1, b2], f"zoom peaks {top2}, expected [{b1}, {b2}]"


@pytest.mark.parametrize("seed", range(4))
def test_random_geometry_matches_golden(seed):
    """Property sweep: random (m, taps, window, chunking) vs the f64 oracle,
    with streaming chunk boundaries at random step counts."""
    rng = np.random.default_rng(1000 + seed)
    m = int(rng.choice([8, 16, 32, 64, 256]))
    taps = int(rng.integers(1, 13))
    window = str(rng.choice(["hamming", "hann", "blackman"]))
    c = Channelizer(m=m, taps=taps, window=window)
    steps = int(rng.integers(max(4, taps), 24))
    x = rng.standard_normal((2, steps * m)).astype(np.float32)

    one, _ = c.process(x, c.initial_state((2,)))
    Y = _golden_w(x, m, taps, window)
    assert np.abs(np.asarray(one["re"]) - Y.real).max() < 2e-5 * max(
        1.0, np.abs(Y.real).max()
    )

    # random chunking (multiples of m) is bitwise-identical
    cuts = sorted(
        set(int(v) * m for v in rng.integers(1, steps, size=3)) | {steps * m}
    )
    st = c.initial_state((2,))
    parts, prev = [], 0
    for cut in cuts:
        if cut == prev:
            continue
        o, st = c.process(x[:, prev:cut], st)
        parts.append(np.asarray(o["re"]))
        prev = cut
    assert np.array_equal(np.concatenate(parts, axis=1), np.asarray(one["re"]))


def _golden_w(x, m, taps, window):
    h = design_prototype(m, taps, window)
    hist = (taps - 1) * m
    xc = np.concatenate([np.zeros(x.shape[:-1] + (hist,)), x], axis=-1)
    steps = x.shape[-1] // m
    W = np.exp(-2j * np.pi * np.outer(np.arange(m), np.arange(m)) / m)
    Y = np.zeros(x.shape[:-1] + (steps, m), complex)
    for n in range(steps):
        blk = xc[..., n * m : (n + taps) * m] * h
        Y[..., n, :] = blk.reshape(x.shape[:-1] + (taps, m)).sum(axis=-2) @ W
    return Y


def test_pallas_kernel_matches_xla_path(rng):
    """The fused Pallas kernel (m=128) vs the XLA fold+matmul path."""
    a = Channelizer(m=128, taps=8, use_pallas=True)
    b = Channelizer(m=128, taps=8, use_pallas=False)
    x = rng.standard_normal((2, 40 * 128)).astype(np.float32)
    oa, sa = a.process(x, a.initial_state((2,)))
    ob, sb = b.process(x, b.initial_state((2,)))
    scale = np.abs(np.asarray(ob["re"])).max()
    assert np.abs(np.asarray(oa["re"]) - np.asarray(ob["re"])).max() < 1e-5 * scale
    assert np.abs(np.asarray(oa["im"]) - np.asarray(ob["im"])).max() < 1e-5 * scale
    assert np.array_equal(np.asarray(sa), np.asarray(sb))
    # IQ combine path too
    xs = rng.standard_normal((2, 1, 24 * 128)).astype(np.float32)
    oa, _ = a.process_planes(xs, a.initial_state((2, 1)))
    ob, _ = b.process_planes(xs, b.initial_state((2, 1)))
    assert np.abs(np.asarray(oa["re"]) - np.asarray(ob["re"])).max() < 1e-5 * scale
    assert np.abs(np.asarray(oa["im"]) - np.asarray(ob["im"])).max() < 1e-5 * scale


def test_pallas_kernel_odd_sizes(rng):
    """Steps not divisible by the kernel group size (padding path)."""
    a = Channelizer(m=128, taps=8, use_pallas=True)
    b = Channelizer(m=128, taps=8, use_pallas=False)
    for steps in (1, 7, 9):
        x = rng.standard_normal((1, steps * 128)).astype(np.float32)
        oa, _ = a.process(x, a.initial_state((1,)))
        ob, _ = b.process(x, b.initial_state((1,)))
        assert np.allclose(
            np.asarray(oa["re"]), np.asarray(ob["re"]), atol=1e-3
        ), steps


@pytest.mark.parametrize("taps", [2, 9, 20, 33])
def test_pallas_kernel_taps_where_halo_pad_not_dividing_group(rng, taps):
    """Regression: taps whose halo pad (taps-1 rounded to 8) does NOT
    divide the default 256-step group — the halo BlockSpec offset must
    still land on the right rows (steps > group exercises group >1)."""
    a = Channelizer(m=128, taps=taps, use_pallas=True)
    b = Channelizer(m=128, taps=taps, use_pallas=False)
    x = rng.standard_normal((1, 300 * 128)).astype(np.float32)
    oa, _ = a.process(x, a.initial_state((1,)))
    ob, _ = b.process(x, b.initial_state((1,)))
    scale = np.abs(np.asarray(ob["re"])).max()
    err = np.abs(np.asarray(oa["re"]) - np.asarray(ob["re"])).max()
    assert err < 1e-5 * scale, (taps, err / scale)
