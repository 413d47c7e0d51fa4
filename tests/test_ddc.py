"""DDC (NCO mixer + polyphase decimating FIR) vs the float64 golden model."""

import numpy as np
import pytest
import scipy.signal as sps

from tpu_sdr.kernels.ddc import DDC, DDCBank, DDCState, design_decimation_fir


@pytest.fixture
def rng():
    return np.random.default_rng(17)


def _golden(x, fs, fc, h, r):
    """float64 oracle: mix, causal FIR, take the last sample of each R-block."""
    n = np.arange(x.shape[-1], dtype=np.float64)
    # note: no dtype coercion — x may be complex; the product promotes to
    # complex128 either way
    y = np.asarray(x) * np.exp(-2j * np.pi * (fc / fs) * n)
    filt = sps.lfilter(np.asarray(h, np.float64), 1.0, y, axis=-1)
    return filt[..., r - 1 :: r]


def _cplx(out):
    return np.asarray(out["re"], np.float64) + 1j * np.asarray(
        out["im"], np.float64
    )


@pytest.mark.parametrize("r", [1, 4, 8, 10])
def test_matches_golden_real(rng, r):
    fs, fc = 1e6, 123_456.789
    ddc = DDC(fs=fs, center_hz=fc, decimation=r)
    x = rng.standard_normal((2, 64 * max(r, 8))).astype(np.float32)
    out, _ = ddc.process(x, ddc.initial_state((2,)))
    ref = _golden(x, fs, fc, ddc.fir, r)
    assert out["re"].shape == ref.shape
    scale = np.abs(ref).max()
    assert np.abs(_cplx(out) - ref).max() / scale < 1e-5


def test_matches_golden_iq(rng):
    fs, fc, r = 1e6, -200_000.0, 8
    ddc = DDC(fs=fs, center_hz=fc, decimation=r)
    xs = rng.standard_normal((2, 3, 64 * r)).astype(np.float32)
    out, _ = ddc.process_planes(xs, ddc.initial_state((3,)))
    z = np.asarray(xs[0], np.float64) + 1j * np.asarray(xs[1], np.float64)
    ref = _golden(z, fs, fc, ddc.fir, r)
    scale = np.abs(ref).max()
    assert np.abs(_cplx(out) - ref).max() / scale < 1e-5


def test_chunked_equals_oneshot_bitwise(rng):
    ddc = DDC(fs=1e6, center_hz=250e3, decimation=8)
    x = rng.standard_normal((2, 96 * 8)).astype(np.float32)
    o_full, s_full = ddc.process(x, ddc.initial_state((2,)))
    st = ddc.initial_state((2,))
    parts = []
    for lo, hi in ((0, 256), (256, 320), (320, x.shape[-1])):
        o, st = ddc.process(x[:, lo:hi], st)
        parts.append(np.asarray(o["re"]))
    got = np.concatenate(parts, axis=-1)
    assert np.array_equal(got, np.asarray(o_full["re"]))
    assert np.array_equal(np.asarray(st.tail_im), np.asarray(s_full.tail_im))
    assert st.offset == s_full.offset


def test_chunks_shorter_than_history_bitwise(rng):
    """Regression: chunks shorter than the (P-1)*R history must keep the
    older history's remainder in the carried tail (chunked == one-shot)."""
    ddc = DDC(fs=1e6, center_hz=250e3, decimation=8)  # hist = 56
    x = rng.standard_normal(40 * 8).astype(np.float32)
    o_full, s_full = ddc.process(x, ddc.initial_state(()))
    st = ddc.initial_state(())
    parts = []
    for lo, hi in ((0, 32), (32, 48), (48, 64), (64, x.size)):  # 32 < 56
        o, st = ddc.process(x[lo:hi], st)
        parts.append(np.asarray(o["re"]))
    got = np.concatenate(parts, axis=-1)
    assert np.array_equal(got, np.asarray(o_full["re"]))
    assert np.array_equal(np.asarray(st.tail_re), np.asarray(s_full.tail_re))
    assert np.array_equal(np.asarray(st.tail_im), np.asarray(s_full.tail_im))


def test_long_stream_phase_accuracy():
    """The uint32 phase accumulator keeps the NCO exact over millions of
    samples — a tone at fc lands at DC with no phase drift."""
    fs, fc, r = 1e6, 333_333.25, 16
    ddc = DDC(fs=fs, center_hz=fc, decimation=r, taps_per_phase=16)
    st = ddc.initial_state(())
    outs = []
    n0 = 0
    for _ in range(4):  # 4 x 1M-sample chunks
        n = n0 + np.arange(2**20, dtype=np.float64)
        x = np.cos(2 * np.pi * (fc / fs) * n).astype(np.float32)
        o, st = ddc.process(x, st)
        outs.append(_cplx(o))
        n0 += 2**20
    z = np.concatenate(outs)[1024:]  # drop the filter transient
    # mixed tone -> DC with magnitude 1/2; phase must not drift
    assert np.abs(z).mean() == pytest.approx(0.5, rel=1e-3)
    drift = np.abs(np.angle(z[1:] * np.conj(z[:-1]))).max()
    assert drift < 1e-4, f"NCO phase drift {drift} rad/sample at n~4M"


def test_tone_offset_lands_at_baseband_offset(rng):
    fs, fc, r = 1e6, 100e3, 8
    delta = 3e3
    ddc = DDC(fs=fs, center_hz=fc, decimation=r)
    n = np.arange(128 * 1024, dtype=np.float64)
    x = np.cos(2 * np.pi * ((fc + delta) / fs) * n).astype(np.float32)
    out, _ = ddc.process(x, ddc.initial_state(()))
    z = _cplx(out)[256:]
    spec = np.abs(np.fft.fft(z))
    f = np.fft.fftfreq(z.size, r / fs)
    assert f[np.argmax(spec)] == pytest.approx(delta, abs=fs / r / z.size)


def test_alias_rejection(rng):
    """A tone far outside the decimation band is crushed by the FIR."""
    fs, fc, r = 1e6, 100e3, 8
    ddc = DDC(fs=fs, center_hz=fc, decimation=r, taps_per_phase=24,
              window=("kaiser", 10.0))
    n = np.arange(64 * 1024, dtype=np.float64)
    inband = np.cos(2 * np.pi * ((fc + 2e3) / fs) * n)
    outband = np.cos(2 * np.pi * ((fc + 200e3) / fs) * n)  # aliases
    zi = _cplx(ddc.process(inband.astype(np.float32), ddc.initial_state(()))[0])
    zo = _cplx(ddc.process(outband.astype(np.float32), ddc.initial_state(()))[0])
    ratio_db = 20 * np.log10(
        np.abs(zo[256:]).max() / np.abs(zi[256:]).max()
    )
    assert ratio_db < -60, f"alias rejection only {ratio_db:.1f} dB"


def test_retune_and_validation(rng):
    ddc = DDC(fs=1e6, center_hz=100e3, decimation=8)
    ddc.retune(-50e3)
    assert ddc.center_hz == -50e3
    with pytest.raises(ValueError):
        DDC(decimation=0)
    with pytest.raises(ValueError):
        ddc.process(np.zeros(13, np.float32), ddc.initial_state(()))
    with pytest.raises(ValueError):
        ddc.process(np.zeros((2, 64), np.float32), ddc.initial_state(()))


def test_state_checkpoint_roundtrip(rng):
    ddc = DDC(fs=1e6, center_hz=77e3, decimation=4)
    x = rng.standard_normal((1, 64 * 4)).astype(np.float32)
    _, st = ddc.process(x, ddc.initial_state((1,)))
    st2 = DDCState.from_numpy(st.to_numpy())
    o1, _ = ddc.process(x, st)
    o2, _ = ddc.process(x, st2)
    assert np.array_equal(np.asarray(o1["re"]), np.asarray(o2["re"]))


@pytest.mark.parametrize("mesh_shape", [(1, 2), (2, 1), (2, 4), (1, 8)])
def test_sharded_equals_single_bitwise(rng, mesh_shape):
    from tpu_sdr.shard import ShardedDDC, make_sdr_mesh

    ddc = DDC(fs=1e6, center_hz=123_456.789, decimation=8)
    c_ax, t_ax = mesh_shape
    mesh = make_sdr_mesh(channel=c_ax, time=t_ax)
    sh = ShardedDDC(ddc, mesh)
    x = rng.standard_normal((4, 64 * 8)).astype(np.float32)
    got, gst = sh.process(x, sh.initial_state((4,)))
    ref, rst = ddc.process(x, ddc.initial_state((4,)))
    assert np.array_equal(np.asarray(got["re"]), np.asarray(ref["re"]))
    assert np.array_equal(np.asarray(got["im"]), np.asarray(ref["im"]))
    assert np.array_equal(np.asarray(gst.tail_re), np.asarray(rst.tail_re))
    assert gst.offset == rst.offset
    # IQ planes, carried across two chunks
    xs = rng.standard_normal((2, 4, 64 * 8)).astype(np.float32)
    g1, s1 = sh.process_planes(xs, sh.initial_state((4,)))
    g2, s2 = sh.process_planes(xs, s1)
    r1, t1 = ddc.process_planes(xs, ddc.initial_state((4,)))
    r2, t2 = ddc.process_planes(xs, t1)
    assert np.array_equal(np.asarray(g2["re"]), np.asarray(r2["re"]))
    assert np.array_equal(np.asarray(g2["im"]), np.asarray(r2["im"]))


@pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2), (8, 1), (1, 8)])
def test_sharded_bank_equals_single_bitwise(rng, mesh_shape):
    """Carrier-sharded bank == single-device DDCBank, every mesh shape."""
    from tpu_sdr.shard import ShardedDDCBank, make_sdr_mesh

    centers = [77e3, -150e3, 313_131.5, 42e3, 250e3, -321e3, 111e3, 9e3]
    bank = DDCBank(fs=1e6, centers_hz=centers, decimation=8)
    c_ax, t_ax = mesh_shape
    mesh = make_sdr_mesh(channel=c_ax, time=t_ax)
    sh = ShardedDDCBank(bank, mesh)
    x = rng.standard_normal(128 * 8).astype(np.float32)
    got, gst = sh.process(x, sh.initial_state())
    ref, rst = bank.process(x, bank.initial_state())
    assert np.array_equal(np.asarray(got["re"]), np.asarray(ref["re"]))
    assert np.array_equal(np.asarray(got["im"]), np.asarray(ref["im"]))
    assert np.array_equal(np.asarray(gst.tail_re), np.asarray(rst.tail_re))
    # IQ planes, state carried across two chunks + a retune in between
    xs = rng.standard_normal((2, 128 * 8)).astype(np.float32)
    g1, s1 = sh.process_planes(xs, sh.initial_state())
    r1, t1 = bank.process_planes(xs, bank.initial_state())
    new_centers = [c + 1000.0 for c in centers]
    sh.retune(new_centers)
    bank.retune(new_centers)
    g2, _ = sh.process_planes(xs, s1)
    r2, _ = bank.process_planes(xs, t1)
    assert np.array_equal(np.asarray(g2["re"]), np.asarray(r2["re"]))
    assert np.array_equal(np.asarray(g2["im"]), np.asarray(r2["im"]))


def test_sharded_bank_validation(rng):
    from tpu_sdr.shard import ShardedDDCBank, make_sdr_mesh

    bank = DDCBank(fs=1e6, centers_hz=[1e3, 2e3, 3e3], decimation=8)
    sh = ShardedDDCBank(bank, make_sdr_mesh(channel=2, time=4))
    with pytest.raises(ValueError, match="carriers must divide"):
        sh.process(np.zeros(64 * 8, np.float32), sh.initial_state())
    bank4 = DDCBank(fs=1e6, centers_hz=[1e3, 2e3, 3e3, 4e3], decimation=8)
    sh4 = ShardedDDCBank(bank4, make_sdr_mesh(channel=2, time=4))
    with pytest.raises(ValueError, match="ONE stream"):
        sh4.process(np.zeros((2, 64 * 8), np.float32), sh4.initial_state())


def test_sharded_validation(rng):
    from tpu_sdr.shard import ShardedDDC, make_sdr_mesh

    mesh = make_sdr_mesh(channel=1, time=8)
    sh = ShardedDDC(DDC(decimation=8, taps_per_phase=8), mesh)  # hist=56
    with pytest.raises(ValueError, match="halo"):
        sh.process(np.zeros((1, 8 * 48), np.float32), sh.initial_state((1,)))
    with pytest.raises(ValueError, match="divide"):
        sh.process(np.zeros((1, 100), np.float32), sh.initial_state((1,)))


def test_property_sweep_random_designs(rng):
    """Random (R, taps, window, fc, chunking, real/IQ) vs the f64 oracle
    (at the realized 32-bit-tuning-grid frequency) — the same sweep
    discipline as the PFB property tests."""
    windows = ["hamming", "hann", ("kaiser", 6.0), "blackman"]
    for trial in range(8):
        r = int(rng.choice([2, 3, 4, 8, 16]))
        tpp = int(rng.choice([2, 4, 8]))
        fc = float(rng.uniform(-0.5, 0.5)) * 1e6
        win = windows[trial % len(windows)]
        iq = bool(trial % 2)
        ddc = DDC(fs=1e6, center_hz=fc, decimation=r,
                  taps_per_phase=tpp, window=win)
        steps = int(rng.integers(20, 60))
        t = steps * r
        if iq:
            x = (rng.standard_normal((2, 1, t))).astype(np.float32)
            z = x[0].astype(np.float64) + 1j * x[1].astype(np.float64)
            out, _ = ddc.process_planes(x, ddc.initial_state((1,)))
        else:
            x = rng.standard_normal((1, t)).astype(np.float32)
            z = x.astype(np.float64)
            out, _ = ddc.process(x, ddc.initial_state((1,)))
        ref = _golden(z, 1e6, ddc.realized_center_hz, ddc.fir, r)
        scale = max(np.abs(ref).max(), 1e-12)
        err = np.abs(_cplx(out) - ref).max() / scale
        assert err < 2e-5, (trial, r, tpp, fc, win, iq, err)
        # random chunking must be bitwise identical to one-shot
        cuts = np.sort(rng.choice(np.arange(1, steps), size=2, replace=False))
        st = ddc.initial_state((1,))
        parts = []
        bounds = [0] + [int(c) * r for c in cuts] + [t]
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            o, st = (ddc.process_planes(x[..., lo:hi], st) if iq
                     else ddc.process(x[..., lo:hi], st))
            parts.append(np.asarray(o["re"]))
        assert np.array_equal(
            np.concatenate(parts, axis=-1), np.asarray(out["re"])
        ), (trial, bounds)


def test_bank_matches_individual_ddcs_bitwise(rng):
    from tpu_sdr.kernels.ddc import DDCBank

    centers = [77e3, -150e3, 313_131.5]
    bank = DDCBank(fs=1e6, centers_hz=centers, decimation=8)
    x = rng.standard_normal((2, 48 * 8)).astype(np.float32)
    bout, bst = bank.process(x, bank.initial_state((2,)))
    for i, fc in enumerate(centers):
        d = DDC(fs=1e6, center_hz=fc, decimation=8)
        o, s = d.process(x, d.initial_state((2,)))
        assert np.array_equal(np.asarray(bout["re"])[i], np.asarray(o["re"])), i
        assert np.array_equal(np.asarray(bout["im"])[i], np.asarray(o["im"])), i
        assert np.array_equal(
            np.asarray(bst.tail_re)[i], np.asarray(s.tail_re)
        ), i
    # streaming continuity across chunks
    st = bank.initial_state((2,))
    o1, st = bank.process(x[:, : 24 * 8], st)
    o2, st = bank.process(x[:, 24 * 8 :], st)
    joined = np.concatenate([np.asarray(o1["re"]), np.asarray(o2["re"])], -1)
    assert np.array_equal(joined, np.asarray(bout["re"]))
    assert st.offset == bst.offset
    # IQ input gains the carrier axis too
    xs = rng.standard_normal((2, 1, 24 * 8)).astype(np.float32)
    oq, _ = bank.process_planes(xs, bank.initial_state((1,)))
    assert np.asarray(oq["re"]).shape == (3, 1, 24)
    # validation
    with pytest.raises(ValueError):
        DDCBank(centers_hz=[])
    with pytest.raises(ValueError):
        bank.process(x, bank.initial_state((3,)))


def test_fir_design_contract():
    h = design_decimation_fir(8, taps_per_phase=8)
    assert h.size == 64
    assert h.sum() == pytest.approx(1.0)
    # explicit FIR is zero-padded to a phase multiple
    ddc = DDC(decimation=8, fir=np.ones(13) / 13.0)
    assert ddc.fir.size == 16 and ddc.p == 2
