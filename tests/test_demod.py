"""Demodulators: golden math, end-to-end recovery, chunk invariance."""

import numpy as np
import pytest
import scipy.signal as sps

from tpu_sdr.kernels.demod import (
    AGC,
    AGCState,
    AMDemodulator,
    DemodState,
    FMDemodulator,
    SSBDemodulator,
    dc_block_sos,
    deemphasis_sos,
    fm_discriminate,
)

FS = 100_000.0


def _fm_signal(audio, fs, dev):
    """Complex FM baseband planes for a [-1,1] message."""
    phase = 2 * np.pi * dev / fs * np.cumsum(audio)
    return np.cos(phase).astype(np.float32), np.sin(phase).astype(np.float32)


def _tone(f, fs, t_len):
    return np.sin(2 * np.pi * f * np.arange(t_len) / fs)


def _peak_freq(x, fs):
    w = np.hanning(x.size)
    spec = np.abs(np.fft.rfft(x * w))
    return np.argmax(spec) * fs / x.size


# ------------------------------------------------------------------- FM


def test_fm_discriminator_matches_numpy(rng):
    t = 4096
    re = rng.standard_normal(t).astype(np.float32)
    im = rng.standard_normal(t).astype(np.float32)
    prev = np.zeros(1, np.float32)
    out = np.asarray(fm_discriminate(re, im, prev, prev, FS), np.float64)
    z = re.astype(np.float64) + 1j * im.astype(np.float64)
    zp = np.concatenate([[0.0], z[:-1]])
    ref = np.angle(z * np.conj(zp)) * FS / (2 * np.pi)
    np.testing.assert_allclose(out, ref, atol=FS * 3e-7)


def test_fm_demod_recovers_tone():
    dev = 5_000.0
    t_len = 8192
    msg = _tone(1_000.0, FS, t_len)
    re, im = _fm_signal(msg, FS, dev)
    fm = FMDemodulator(FS, deviation_hz=dev, deemphasis_tau=None)
    audio, _ = fm.process(re, im, fm.initial_state())
    a = np.asarray(audio, np.float64)[256:]
    m = msg[256:]
    corr = np.dot(a, m) / np.sqrt(np.dot(a, a) * np.dot(m, m))
    assert corr > 0.999
    assert np.max(np.abs(a)) == pytest.approx(1.0, abs=0.02)


def test_fm_deemphasis_matches_scipy(rng):
    dev = 5_000.0
    t_len = 4096
    msg = _tone(400.0, FS, t_len)
    re, im = _fm_signal(msg, FS, dev)
    fm = FMDemodulator(FS, deviation_hz=dev, deemphasis_tau=75e-6)
    audio, _ = fm.process(re, im, fm.initial_state())
    # float64 oracle: discriminator -> sosfilt(deemphasis)
    z = re.astype(np.float64) + 1j * im.astype(np.float64)
    zp = np.concatenate([[0.0], z[:-1]])
    disc = np.angle(z * np.conj(zp)) * FS / (2 * np.pi) / dev
    ref = sps.sosfilt(deemphasis_sos(FS, 75e-6), disc)
    np.testing.assert_allclose(np.asarray(audio, np.float64), ref, atol=1e-4)


@pytest.mark.parametrize("tau", [None, 75e-6])
def test_fm_chunked_equals_oneshot(rng, tau):
    dev = 5_000.0
    t_len = 4096
    msg = _tone(700.0, FS, t_len)
    re, im = _fm_signal(msg, FS, dev)
    fm = FMDemodulator(FS, deviation_hz=dev, deemphasis_tau=tau)
    one, _ = fm.process(re, im, fm.initial_state())
    st = fm.initial_state()
    outs = []
    for i in range(0, t_len, 512):
        o, st = fm.process(re[i : i + 512], im[i : i + 512], st)
        outs.append(np.asarray(o))
    np.testing.assert_array_equal(np.concatenate(outs), np.asarray(one))


def test_fm_state_roundtrip(rng):
    re = rng.standard_normal(512).astype(np.float32)
    im = rng.standard_normal(512).astype(np.float32)
    fm = FMDemodulator(FS)
    _, st = fm.process(re[:256], im[:256], fm.initial_state())
    st2 = DemodState.from_numpy(st.to_numpy())
    a, _ = fm.process(re[256:], im[256:], st)
    b, _ = fm.process(re[256:], im[256:], st2)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ------------------------------------------------------------------- AM


def test_am_demod_recovers_tone():
    t_len = 8192
    msg = _tone(1_000.0, FS, t_len)
    env = (1.0 + 0.5 * msg).astype(np.float32)
    # Carrier already at DC after the DDC: z = envelope * exp(j*phi0)
    re, im = env * np.float32(0.8), env * np.float32(0.6)
    am = AMDemodulator(FS)
    audio, _ = am.process(re, im, am.initial_state())
    a = np.asarray(audio, np.float64)[1024:]
    m = 0.5 * msg[1024:]
    corr = np.dot(a, m) / np.sqrt(np.dot(a, a) * np.dot(m, m))
    assert corr > 0.99
    assert np.mean(a) == pytest.approx(0.0, abs=0.01)  # DC removed


def test_am_chunked_equals_oneshot(rng):
    t_len = 2048
    re = np.abs(rng.standard_normal(t_len)).astype(np.float32)
    im = np.abs(rng.standard_normal(t_len)).astype(np.float32)
    am = AMDemodulator(FS)
    one, _ = am.process(re, im, am.initial_state())
    st = am.initial_state()
    outs = []
    for i in range(0, t_len, 256):
        o, st = am.process(re[i : i + 256], im[i : i + 256], st)
        outs.append(np.asarray(o))
    np.testing.assert_array_equal(np.concatenate(outs), np.asarray(one))


# ------------------------------------------------------------------- SSB


def test_ssb_product_detector_tone():
    t_len = 8192
    n = np.arange(t_len)
    f = 800.0
    re = np.cos(2 * np.pi * f * n / FS).astype(np.float32)
    im = np.sin(2 * np.pi * f * n / FS).astype(np.float32)
    ssb = SSBDemodulator(FS, bfo_hz=0.0)
    audio, _ = ssb.process(re, im, ssb.initial_state())
    assert _peak_freq(np.asarray(audio, np.float64), FS) == pytest.approx(
        f, abs=2 * FS / t_len
    )
    ssb.retune(300.0)
    audio2, _ = ssb.process(re, im, ssb.initial_state())
    assert _peak_freq(np.asarray(audio2, np.float64), FS) == pytest.approx(
        f - 300.0, abs=2 * FS / t_len
    )


def test_ssb_chunked_equals_oneshot(rng):
    t_len = 4096
    re = rng.standard_normal(t_len).astype(np.float32)
    im = rng.standard_normal(t_len).astype(np.float32)
    ssb = SSBDemodulator(FS, bfo_hz=1500.0)
    one, _ = ssb.process(re, im, ssb.initial_state())
    st = ssb.initial_state()
    outs = []
    for step in (512, 1024, 2048, 512):  # uneven chunking
        i = sum((512, 1024, 2048, 512)[: outs.__len__()])
        o, st = ssb.process(re[i : i + step], im[i : i + step], st)
        outs.append(np.asarray(o))
    np.testing.assert_array_equal(np.concatenate(outs), np.asarray(one))


# ------------------------------------------------------------------- AGC


def _agc_seq_ref(mag, g0, mu, ref):
    """float64 sequential oracle for the AGC recurrence."""
    g = np.empty(mag.size + 1)
    g[0] = g0
    for n in range(mag.size):
        g[n + 1] = g[n] * (1 - mu * mag[n]) + mu * ref
    return g[:-1]  # g_prev per sample


def test_agc_matches_sequential_reference(rng):
    t_len = 1024
    x = (0.1 + np.abs(rng.standard_normal(t_len))).astype(np.float32)
    agc = AGC(mu=5e-3, ref=1.0)
    y, st = agc.process_real(x, agc.initial_state())
    g_ref = _agc_seq_ref(x.astype(np.float64), 1.0, 5e-3, 1.0)
    np.testing.assert_allclose(np.asarray(y, np.float64), g_ref * x, rtol=2e-5)
    assert np.asarray(st.gain) == pytest.approx(
        g_ref[-1] * (1 - 5e-3 * x[-1]) + 5e-3, rel=2e-5
    )


def test_agc_converges_to_ref_level():
    t_len = 65536
    amp = 0.05
    x = (amp * np.sin(2 * np.pi * 1000 * np.arange(t_len) / FS)).astype(np.float32)
    agc = AGC(mu=2e-3, ref=0.5)
    y, _ = agc.process_real(x, agc.initial_state())
    tail = np.asarray(y, np.float64)[-8192:]
    # Mean rectified sine = (2/pi)*A; loop regulates mean |y| toward ref.
    assert np.mean(np.abs(tail)) == pytest.approx(0.5, rel=0.05)


def test_agc_chunked_equals_oneshot(rng):
    t_len = 2048
    re = rng.standard_normal(t_len).astype(np.float32)
    im = rng.standard_normal(t_len).astype(np.float32)
    agc = AGC(mu=1e-2, ref=1.0)
    r1, i1, _ = agc.process(re, im, agc.initial_state())
    st = agc.initial_state()
    outs_r, outs_i = [], []
    for i in range(0, t_len, 256):
        r, im_o, st = agc.process(re[i : i + 256], im[i : i + 256], st)
        outs_r.append(np.asarray(r))
        outs_i.append(np.asarray(im_o))
    np.testing.assert_array_equal(np.concatenate(outs_r), np.asarray(r1))
    np.testing.assert_array_equal(np.concatenate(outs_i), np.asarray(i1))


def test_agc_batched_state_roundtrip(rng):
    x = rng.standard_normal((3, 512)).astype(np.float32)
    agc = AGC(mu=1e-2)
    _, st = agc.process_real(x[:, :256], agc.initial_state((3,)))
    st2 = AGCState.from_numpy(st.to_numpy())
    a, _ = agc.process_real(x[:, 256:], st)
    b, _ = agc.process_real(x[:, 256:], st2)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# --------------------------------------------------------------- squelch


def test_squelch_gates_open_and_close():
    from tpu_sdr.kernels.demod import Squelch

    sq = Squelch(threshold=0.01, leak=0.5)
    t = 1024
    strong = np.full(t, 0.5, np.float32)
    silence = np.full(t, 1e-4, np.float32)
    g1, st = sq.gates(strong, strong, sq.initial_state())
    g1 = np.asarray(g1)
    assert g1[0] == 0.0  # causal: first block gated on zero history
    assert g1[-1] == 1.0  # opened once the EMA crossed
    g2, _ = sq.gates(silence, silence, st)
    assert np.asarray(g2)[-1] == 0.0  # closes again on silence


def test_squelch_chunked_equals_oneshot(rng):
    from tpu_sdr.kernels.demod import Squelch

    sq = Squelch(threshold=0.5, leak=0.9)
    t = 2048
    re = rng.standard_normal(t).astype(np.float32)
    im = rng.standard_normal(t).astype(np.float32)
    one, _ = sq.gates(re, im, sq.initial_state())
    st = sq.initial_state()
    outs = []
    for k in range(0, t, 256):
        g, st = sq.gates(re[k : k + 256], im[k : k + 256], st)
        outs.append(np.asarray(g))
    np.testing.assert_array_equal(np.concatenate(outs), np.asarray(one))


def test_receiver_squelch_mutes_noise():
    from tpu_sdr.runtime.receiver import Receiver

    fs = 1_000_000.0
    rx = Receiver(fs=fs, center_hz=250e3, mode="wbfm", audio_rate=16e3,
                  squelch_db=-30.0)
    t_len = 4 * rx.chunk_granularity
    rng = np.random.default_rng(0)
    noise = (1e-3 * rng.standard_normal(t_len)).astype(np.float32)
    a_noise, _ = rx.process(noise, rx.initial_state())
    assert np.max(np.abs(np.asarray(a_noise)[256:])) == 0.0  # muted
    n = np.arange(t_len)
    msg = np.sin(2 * np.pi * 1000 * n / fs)
    ph = 2 * np.pi * 250e3 * n / fs + 2 * np.pi * 75e3 / fs * np.cumsum(msg)
    x = (0.5 * np.cos(ph)).astype(np.float32)
    a_sig, _ = rx.process(x, rx.initial_state())
    assert np.max(np.abs(np.asarray(a_sig))) > 0.3  # passes


def test_validation_errors():
    agc = AGC(mu=1e-2)
    with pytest.raises(ValueError, match="not a multiple"):
        agc.process_real(np.zeros(100, np.float32), agc.initial_state())
    with pytest.raises(ValueError, match="state shape"):
        agc.process_real(np.zeros((2, 256), np.float32), agc.initial_state())
    with pytest.raises(ValueError, match="mu"):
        AGC(mu=2.0)
    fm = FMDemodulator(FS)
    with pytest.raises(ValueError, match="not a multiple"):
        fm.process(np.zeros(100, np.float32), np.zeros(100, np.float32),
                   fm.initial_state())


def test_filter_designs_are_sane():
    sos = deemphasis_sos(FS, 75e-6)
    w, h = sps.sosfreqz(sos, worN=1024, fs=FS)
    assert abs(h[0]) == pytest.approx(1.0, abs=1e-6)  # unit DC gain
    # -3 dB near 1/(2*pi*tau) ~ 2122 Hz
    f3 = w[np.argmin(np.abs(np.abs(h) - 1 / np.sqrt(2)))]
    assert f3 == pytest.approx(1 / (2 * np.pi * 75e-6), rel=0.05)
    sos_dc = dc_block_sos(0.995)
    w2, h2 = sps.sosfreqz(sos_dc, worN=1024, fs=FS)
    assert abs(h2[0]) < 1e-6  # DC killed
    assert abs(h2[-1]) == pytest.approx(1.0, abs=0.01)


@pytest.mark.parametrize("tau", [None, 75e-6])
def test_fm_pallas_path_matches_xla(rng, tau):
    """The fused Mosaic path (interpret on CPU) vs the XLA path: same
    canonical blocks, different tree mechanics (roll+mask vs pad shifts)
    => tiny float slop, not bitwise."""
    dev = 5_000.0
    msg = _tone(700.0, FS, 4096)
    re, im = _fm_signal(msg, FS, dev)
    xla = FMDemodulator(FS, deviation_hz=dev, deemphasis_tau=tau)
    pal = FMDemodulator(FS, deviation_hz=dev, deemphasis_tau=tau,
                        use_pallas=True)
    a_x, _ = xla.process(re, im, xla.initial_state())
    a_p, _ = pal.process(re, im, pal.initial_state())
    np.testing.assert_allclose(np.asarray(a_p), np.asarray(a_x),
                               atol=2e-6, rtol=0)


def test_fm_pallas_chunked_bitwise_mixed_chunks(rng):
    """Pallas-path chunked == one-shot BITWISE for mixed chunk lengths —
    each length picks a different tile width, so this also pins the
    kernel's tile-width invariance (block-local tree + sequential chain)."""
    dev = 5_000.0
    t_len = 8192
    msg = _tone(700.0, FS, t_len)
    re, im = _fm_signal(msg, FS, dev)
    fm = FMDemodulator(FS, deviation_hz=dev, use_pallas=True)
    one, _ = fm.process(re, im, fm.initial_state())
    st = fm.initial_state()
    outs = []
    pos = 0
    for n in (128, 384, 1536, 2048, 4096):  # sums to 8192
        o, st = fm.process(re[pos:pos + n], im[pos:pos + n], st)
        outs.append(np.asarray(o))
        pos += n
    np.testing.assert_array_equal(np.concatenate(outs), np.asarray(one))


def test_fm_pallas_batch_shapes(rng):
    dev = 5_000.0
    re = rng.standard_normal((3, 2048)).astype(np.float32)
    im = rng.standard_normal((3, 2048)).astype(np.float32)
    fm = FMDemodulator(FS, deviation_hz=dev, use_pallas=True)
    a, st = fm.process(re, im, fm.initial_state((3,)))
    assert a.shape == (3, 2048) and st.filt.shape == (3,)
    # each batch row == the row processed alone
    alone, _ = fm.process(re[1], im[1], fm.initial_state())
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(alone))
