"""Digital burst modem: RRC contract, PSK/QAM/FSK loopback under
channel impairments (delay, CFO, phase, AWGN), BER vs theory, batching."""

import numpy as np
import pytest

from tpu_sdr.kernels.digital import (
    BurstModem,
    FSKModem,
    bit_error_rate,
    rrc_taps,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0xD161)


def _channel(re, im, delay_samples=0.0, cfo_cps=0.0, phase=0.0, snr_db=None,
             rng=None):
    """Apply fractional delay (FFT phase ramp on a zero-padded buffer),
    carrier offset (cycles/sample), phase rotation, and complex AWGN at
    Es/N0 = snr_db given unit-energy symbols/pulses."""
    z = re.astype(np.float64) + 1j * im.astype(np.float64)
    pad = 256
    z = np.concatenate([np.zeros(pad), z, np.zeros(pad)])
    if delay_samples:
        n = len(z)
        f = np.fft.fftfreq(n)
        z = np.fft.ifft(np.fft.fft(z) * np.exp(-2j * np.pi * f * delay_samples))
    if cfo_cps:
        z = z * np.exp(2j * np.pi * cfo_cps * np.arange(len(z)))
    if phase:
        z = z * np.exp(1j * phase)
    if snr_db is not None:
        n0 = 10.0 ** (-snr_db / 10.0)  # Es = 1 (unit-energy pulse+symbol)
        z = z + np.sqrt(n0 / 2.0) * (
            rng.standard_normal(len(z)) + 1j * rng.standard_normal(len(z)))
    z = z[pad:]
    return z.real.astype(np.float32), z.imag.astype(np.float32)


# ------------------------------------------------------------------- RRC


def test_rrc_unit_energy_and_isi_free():
    for sps, beta in [(4, 0.25), (8, 0.35), (8, 1.0)]:
        h = rrc_taps(sps, span=16, beta=beta)
        assert h.sum() > 0
        np.testing.assert_allclose(np.sum(h * h), 1.0, atol=1e-12)
        rc = np.convolve(h, h)  # raised cosine
        c = len(rc) // 2
        assert rc[c] == pytest.approx(1.0, abs=1e-3)
        # near-zero ISI at nonzero symbol multiples (residual = span
        # truncation; worst at small beta)
        for k in range(1, 8):
            assert abs(rc[c + k * sps]) < 2e-3, (sps, beta, k)


def test_rrc_truncation_isi_shrinks_with_span():
    def worst(span):
        h = rrc_taps(4, span=span, beta=0.25)
        rc = np.convolve(h, h)
        c = len(rc) // 2
        return max(abs(rc[c + k * 4]) for k in range(1, 8))

    assert worst(24) < worst(16) < worst(10)


def test_rrc_validation():
    with pytest.raises(ValueError):
        rrc_taps(1)
    with pytest.raises(ValueError):
        rrc_taps(8, beta=0.0)


# --------------------------------------------------------- clean loopback


@pytest.mark.parametrize(
    "scheme,differential",
    [("bpsk", True), ("qpsk", True), ("bpsk", False), ("qpsk", False),
     ("qam16", False)])
def test_clean_loopback(scheme, differential, rng):
    mod = BurstModem(scheme, sps=8, differential=differential)
    n_bits = 256 * mod.bps
    bits = rng.integers(2, size=n_bits).astype(np.uint8)
    re, im = mod.modulate(bits, pad_syms=mod.max_lag_syms + mod.span)
    out = mod.demodulate(re, im, n_bits)
    assert bit_error_rate(bits, out["bits"]) == 0.0
    assert abs(float(out["timing"])) < 0.15
    assert int(out["frame_lag"]) == 0
    assert abs(float(out["cfo"])) < 2e-3


def test_differential_rejects_qam():
    with pytest.raises(ValueError):
        BurstModem("qam16", differential=True)


def test_short_burst_rejected():
    mod = BurstModem("qpsk")
    with pytest.raises(ValueError):
        mod.demodulate(np.zeros(64, np.float32), np.zeros(64, np.float32), 16)
    with pytest.raises(ValueError):  # n_bits not multiple of bps
        mod.demodulate(np.zeros(65536, np.float32),
                       np.zeros(65536, np.float32), 3)


# ---------------------------------------------------- impaired loopback


@pytest.mark.parametrize("scheme,differential,cfo_sym,snr",
                         [("bpsk", True, 3e-3, 20.0),
                          ("qpsk", True, 3e-3, 25.0),
                          ("qpsk", False, 3e-3, 25.0),
                          ("qam16", False, 3e-4, 30.0)])
def test_impaired_loopback(scheme, differential, cfo_sym, snr, rng):
    sps = 8
    mod = BurstModem(scheme, sps=sps, differential=differential)
    n_bits = 512 * mod.bps
    bits = rng.integers(2, size=n_bits).astype(np.uint8)
    re, im = mod.modulate(bits, pad_syms=mod.max_lag_syms + mod.span)
    # 5 whole symbols + 0.37 of a sample of delay, CFO, phase, noise
    delay = 5 * sps + 3.37
    re, im = _channel(re, im, delay_samples=delay, cfo_cps=cfo_sym / sps,
                      phase=1.1, snr_db=snr, rng=rng)
    out = mod.demodulate(re, im, n_bits)
    assert bit_error_rate(bits, out["bits"]) == 0.0, scheme
    assert int(out["frame_lag"]) == 5
    # recovered CFO within 10% (cycles/symbol)
    assert float(out["cfo"]) == pytest.approx(cfo_sym, rel=0.25)
    # fractional timing recovered (0.37 of a sample, mod sps, sign conv)
    assert abs((float(out["timing"]) - 3.37 + sps / 2) % sps - sps / 2) < 0.3


def test_timing_estimate_tracks_fractional_delay(rng):
    mod = BurstModem("qpsk", sps=8)
    bits = rng.integers(2, size=512).astype(np.uint8)
    base_re, base_im = mod.modulate(bits, pad_syms=24)
    for frac in (0.25, 0.5, 0.75):
        re, im = _channel(base_re, base_im, delay_samples=frac)
        out = mod.demodulate(re, im, 512)
        assert bit_error_rate(bits, out["bits"]) == 0.0
        err = (float(out["timing"]) - frac + 4.0) % 8.0 - 4.0
        assert abs(err) < 0.15, frac


# ------------------------------------------------------------ BER theory


def test_dbpsk_ber_matches_theory(rng):
    """DBPSK at Eb/N0 = 7 dB: Pb = 0.5*exp(-Eb/N0) ~ 3.3e-3. With 20k
    bits the observed BER should land within a loose factor."""
    mod = BurstModem("bpsk", sps=4, preamble_len=64, differential=True)
    n_bits = 20000
    bits = rng.integers(2, size=n_bits).astype(np.uint8)
    re, im = mod.modulate(bits, pad_syms=mod.max_lag_syms + mod.span)
    re, im = _channel(re, im, snr_db=7.0, rng=rng)
    out = mod.demodulate(re, im, n_bits)
    ber = bit_error_rate(bits, out["bits"])
    theory = 0.5 * np.exp(-10.0 ** 0.7)
    assert 0.2 * theory < ber < 5.0 * theory, (ber, theory)


# ---------------------------------------------------------------- batching


def test_batched_equals_single(rng):
    mod = BurstModem("qpsk", sps=8)
    n_bits = 256
    bursts = []
    all_bits = []
    for i in range(3):
        bits = rng.integers(2, size=n_bits).astype(np.uint8)
        re, im = mod.modulate(bits, pad_syms=mod.max_lag_syms + mod.span)
        re, im = _channel(re, im, delay_samples=i * 8 + 0.3, phase=0.5 * i,
                          snr_db=30.0, rng=rng)
        bursts.append((re, im))
        all_bits.append(bits)
    t = min(len(r) for r, _ in bursts)
    re_b = np.stack([r[:t] for r, _ in bursts])
    im_b = np.stack([i_[:t] for _, i_ in bursts])
    out_b = mod.demodulate(re_b, im_b, n_bits)
    assert out_b["bits"].shape == (3, n_bits)
    for i in range(3):
        out_1 = mod.demodulate(re_b[i], im_b[i], n_bits)
        np.testing.assert_array_equal(out_b["bits"][i], all_bits[i])
        np.testing.assert_array_equal(out_b["bits"][i], out_1["bits"])
        assert int(out_b["frame_lag"][i]) == i


# -------------------------------------------------------------------- FSK


@pytest.mark.parametrize("levels", [2, 4])
def test_fsk_loopback(levels, rng):
    fsk = FSKModem(fs=48000.0, symbol_rate=1200.0, deviation_hz=3000.0,
                   levels=levels)
    n_bits = 400 * fsk.bps
    bits = rng.integers(2, size=n_bits).astype(np.uint8)
    re, im = fsk.modulate(bits, pad_syms=2)
    # integer delay + mild noise
    z = (re + 1j * im) * 0.5
    z = np.concatenate([np.zeros(17), z])
    z = z + 0.02 * (rng.standard_normal(len(z))
                    + 1j * rng.standard_normal(len(z)))
    out = fsk.demodulate(z.real.astype(np.float32),
                         z.imag.astype(np.float32), n_bits)
    assert bit_error_rate(bits, out["bits"]) == 0.0
    assert int(out["offset"]) == 17  # full onset + sub-symbol delay
    # recovered tone frequencies near the design deviations
    freqs = np.asarray(out["freqs"])[1:]  # skip startup symbol
    tones = fsk.tone_levels * fsk.deviation_hz
    for f in freqs:
        assert np.min(np.abs(tones - f)) < 0.15 * fsk.deviation_hz


def test_fsk_validation():
    with pytest.raises(ValueError):
        FSKModem(48000.0, 1200.0, 3000.0, levels=3)
    with pytest.raises(ValueError):
        FSKModem(48000.0, 7000.0, 3000.0)  # non-integer sps
    fsk = FSKModem(48000.0, 1200.0, 3000.0)
    with pytest.raises(ValueError):
        fsk.demodulate(np.zeros(10, np.float32), np.zeros(10, np.float32), 4)
