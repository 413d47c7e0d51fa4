"""FEC: convolutional encoder parity vs a brute-force reference,
Viterbi decode (soft/hard/punctured), coding gain, batching, and the
modem integration path (LLRs from recovered symbols)."""

import numpy as np
import pytest

from tpu_sdr.kernels.digital import BurstModem, bit_error_rate
from tpu_sdr.kernels.fec import ConvCode, max_log_llrs, modem_soft_bits

from test_digital import _channel  # channel impairment helper


@pytest.fixture
def rng():
    return np.random.default_rng(0xFEC)


def ref_encode(bits, k, polys):
    """Independent bit-serial reference encoder (same octal convention:
    MSB of the K-bit generator = newest-input tap)."""
    s = 0
    n_states = 1 << (k - 1)
    taps = [[(p >> (k - 1 - i)) & 1 for i in range(k)] for p in polys]
    out = []
    for b in list(bits) + [0] * (k - 1):
        r = (s << 1) | int(b)
        window = [(r >> i) & 1 for i in range(k)]  # window[i] = u_{n-i}
        for t in taps:
            out.append(sum(ti * wi for ti, wi in zip(t, window)) % 2)
        s = r & (n_states - 1)
    return np.array(out, np.uint8)


def test_encoder_matches_bit_serial_reference(rng):
    for k, polys in [(3, (0o7, 0o5)), (5, (0o23, 0o35)), (7, (0o133, 0o171))]:
        code = ConvCode(k, polys)
        bits = rng.integers(2, size=64).astype(np.uint8)
        np.testing.assert_array_equal(code.encode(bits),
                                      ref_encode(bits, k, polys))


def test_k3_known_vector():
    # Lin & Costello's (7,5) K=3 example: u = 1011 (terminated).
    code = ConvCode(3, (0o7, 0o5))
    coded = code.encode(np.array([1, 0, 1, 1], np.uint8))
    np.testing.assert_array_equal(
        coded, ref_encode([1, 0, 1, 1], 3, (0o7, 0o5)))
    # first step from the zero state with input 1 emits both parity bits 1
    np.testing.assert_array_equal(coded[:2], [1, 1])


def test_lengths_and_rate():
    code = ConvCode(7, (0o133, 0o171))
    assert code.rate == pytest.approx(0.5)
    assert code.coded_len(100) == 2 * (100 + 6)
    p34 = ConvCode(7, (0o133, 0o171), puncture="3/4")
    assert p34.rate == pytest.approx(0.75)
    # 105 trellis steps == 35 full periods, 4 bits kept of 6 per period
    assert p34.coded_len(99) == 35 * 4
    p23 = ConvCode(7, (0o133, 0o171), puncture="2/3")
    assert p23.rate == pytest.approx(2.0 / 3.0)


def test_clean_roundtrip_all_rates(rng):
    bits = rng.integers(2, size=200).astype(np.uint8)
    for punct in (None, "2/3", "3/4"):
        code = ConvCode(7, (0o133, 0o171), puncture=punct)
        coded = code.encode(bits)
        assert coded.shape[-1] == code.coded_len(200)
        out = code.decode_hard(coded, 200)
        np.testing.assert_array_equal(out, bits, err_msg=f"puncture={punct}")


def test_soft_decode_coding_gain(rng):
    """Soft Viterbi (K=7, r=1/2) at Eb/N0 = 4 dB: the uncoded BPSK BER
    is ~1.25e-2; the coded stream must come back (near-)error-free."""
    code = ConvCode(7, (0o133, 0o171))
    n_bits = 4000
    bits = rng.integers(2, size=n_bits).astype(np.uint8)
    coded = code.encode(bits)
    ebn0 = 10.0 ** (4.0 / 10.0)
    # Es/N0 for coded BPSK symbols = rate * Eb/N0
    sigma = np.sqrt(1.0 / (2.0 * code.rate * ebn0))
    x = (1.0 - 2.0 * coded) + sigma * rng.standard_normal(coded.shape)
    decoded = code.decode(x, n_bits)
    coded_ber = bit_error_rate(bits, decoded)
    # uncoded comparison at the same Eb/N0 (Es = Eb)
    sigma_u = np.sqrt(1.0 / (2.0 * ebn0))
    xu = (1.0 - 2.0 * bits) + sigma_u * rng.standard_normal(bits.shape)
    uncoded_ber = np.mean((xu < 0).astype(np.uint8) != bits)
    assert uncoded_ber > 5e-3  # the channel is genuinely noisy
    assert coded_ber < 1e-3
    assert coded_ber < uncoded_ber / 4


def test_hard_decode_corrects_errors(rng):
    code = ConvCode(7, (0o133, 0o171))
    bits = rng.integers(2, size=1000).astype(np.uint8)
    coded = code.encode(bits)
    # flip 3% of coded bits
    flips = rng.random(coded.shape) < 0.03
    out = code.decode_hard(coded ^ flips.astype(np.uint8), 1000)
    assert bit_error_rate(bits, out) < 2e-3


def test_batched_equals_single(rng):
    code = ConvCode(7, (0o133, 0o171), puncture="2/3")
    n_bits = 120
    bits = rng.integers(2, size=(5, n_bits)).astype(np.uint8)
    coded = code.encode(bits)
    noisy = (1.0 - 2.0 * coded) + 0.4 * rng.standard_normal(coded.shape)
    batched = code.decode(noisy, n_bits)
    singles = np.stack([code.decode(noisy[i], n_bits) for i in range(5)])
    np.testing.assert_array_equal(batched, singles)


def test_validation():
    with pytest.raises(ValueError):
        ConvCode(7, (0o133,))  # rate 1/1
    with pytest.raises(ValueError):
        ConvCode(3, (0o17, 0o5))  # poly wider than K
    with pytest.raises(ValueError):
        ConvCode(7, (0o133, 0o171), puncture="5/6")
    code = ConvCode(7, (0o133, 0o171))
    with pytest.raises(ValueError):
        code.decode(np.zeros(13), 10)  # wrong coded length


def test_max_log_llr_signs():
    pts = np.array([1.0 + 0j, -1.0 + 0j])
    lut = np.array([[0], [1]], np.uint8)
    llr = np.asarray(max_log_llrs(
        np.array([0.9, -1.1]), np.array([0.0, 0.0]), pts, lut))
    assert llr[0] > 0  # near +1 -> bit 0
    assert llr[1] < 0


def test_modem_fec_integration(rng):
    """Coded DQPSK burst through an impaired noisy channel: the raw
    wire bits carry ~2% errors; hard-decision Viterbi returns the
    payload error-free. (Differential operation is the modem's
    low-SNR mode — the blind M-th-power coarse CFO stage that coherent
    demod relies on has too much self-noise below ~10 dB Es/N0, which
    is exactly the regime FEC exists for.)"""
    code = ConvCode(7, (0o133, 0o171))
    modem = BurstModem("qpsk", sps=4, differential=True)
    n_info = 600
    info = rng.integers(2, size=n_info).astype(np.uint8)
    coded = code.encode(info)
    n_coded = coded.shape[-1]
    re, im = modem.modulate(coded, pad_syms=4)
    re, im = _channel(re, im, delay_samples=0.4, cfo_cps=1e-4, phase=0.7,
                      snr_db=9.0, rng=rng)
    out = modem.demodulate(re, im, n_coded)
    raw_ber = bit_error_rate(coded, out["bits"])
    assert 2e-3 < raw_ber < 0.1  # noisy but synchronized
    decoded = code.decode_hard(np.asarray(out["bits"]), n_info)
    assert bit_error_rate(info, decoded) == 0.0


def test_modem_soft_path_coherent(rng):
    """Coherent QPSK: LLRs computed from the recovered payload symbols
    feed the soft decoder and reproduce the payload (plumbing check;
    the soft coding gain itself is measured channel-side in
    test_soft_decode_coding_gain)."""
    code = ConvCode(7, (0o133, 0o171))
    modem = BurstModem("qpsk", sps=4, differential=False)
    n_info = 300
    info = rng.integers(2, size=n_info).astype(np.uint8)
    coded = code.encode(info)
    re, im = modem.modulate(coded, pad_syms=4)
    re, im = _channel(re, im, delay_samples=0.3, phase=0.5, snr_db=14.0,
                      rng=rng)
    out = modem.demodulate(re, im, coded.shape[-1])
    llrs = np.asarray(modem_soft_bits(modem, *out["symbols"]))
    decoded = code.decode(llrs, n_info)
    assert bit_error_rate(info, decoded) == 0.0


def test_modem_soft_bits_rejects_differential():
    modem = BurstModem("qpsk", differential=True)
    with pytest.raises(ValueError):
        modem_soft_bits(modem, np.zeros(4), np.zeros(4))
