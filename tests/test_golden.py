"""Golden-model self-consistency: the CPU oracle must match its own spec."""

import numpy as np
import scipy.signal as sps

from tpu_sdr.control import golden
from tpu_sdr.core import qformat as qf


def test_hann_rom_contract():
    """ROM = clip(round((hann-0.5)*2^16)) per scripts/hann_coeff.py:4-5."""
    rom = golden.hann_q16_rom(16384)
    assert rom.dtype == np.int16
    w = sps.windows.hann(16384, sym=True)
    expected = np.clip(np.floor((w - 0.5) * 65536 + 0.5), -32768, 32767)
    assert np.array_equal(rom.astype(np.int64), expected.astype(np.int64))
    # endpoints: hann(0)=0 -> -0.5*65536 = -32768
    assert rom[0] == -32768
    # center: hann mid = 1 -> 0.5*65536 = 32768 clipped to 32767
    assert rom[8191] == 32767 or rom[8192] == 32767


def test_rtl_effective_window_is_neg_cos():
    w = golden.hann_rtl_effective(16384)
    n = np.arange(16384)
    expected = -np.cos(2 * np.pi * n / 16383)
    assert np.allclose(w, expected, atol=1e-12)


def test_rtl_window_q15_matches_direct_math():
    rng = np.random.default_rng(0)
    x = rng.integers(-2048, 2048, size=16384).astype(np.int16)
    y = golden.rtl_window_q15(x)
    rom = golden.hann_q16_rom(16384).astype(np.int64)
    p = x.astype(np.int64) * rom
    expected = ((p >> 15) + ((p >> 14) & 1)).astype(np.int16)
    assert np.array_equal(y, expected)


def test_adc12_sign_extension():
    # 12-bit code 0x800 sits at the sign boundary: (0x8000 as int16) >> 4
    assert qf.adc12_to_q16(0x800) == -2048
    assert qf.adc12_to_q16(0x7FF) == 2047
    assert qf.adc12_to_q16(0) == 0


def test_coeff_quantize_roundtrip():
    sos = sps.butter(4, 0.25, output="sos")
    q = qf.quantize_coeff_x64(sos)
    assert q.dtype == np.int8
    deq = qf.dequantize_coeff_x64(q)
    # unclipped coefficients round-trip within half an LSB; values beyond
    # +/-127/64 saturate exactly like the reference (fft_analyzer_gui.py:168-175)
    clipped = np.abs(sos * 64) > 127
    assert np.max(np.abs(deq[~clipped] - sos[~clipped])) <= 0.5 / 64 + 1e-12
    assert np.all(np.abs(q[clipped]) == 127)


def test_fixed_filter_sos_is_stable():
    sos = golden.fixed_filter_sos()
    assert sos.shape == (6, 6)
    for sec in sos:
        poles = np.roots([sec[3], sec[4], sec[5]])
        assert np.all(np.abs(poles) < 1.0)


def test_golden_pipeline_tone_peak_bin():
    """Config-1 stimulus: 100 kHz tone at 1 MSPS -> peak at bin 1638/1639."""
    x = golden.synth_tone(100_000.0, 16384, 1_000_000.0)
    res = golden.golden_pipeline(x, sos=None, window="hann")
    mag = res["magnitude"][0]
    peak = int(np.argmax(mag[: 16384 // 2]))
    expected = 100_000.0 * 16384 / 1_000_000.0  # 1638.4
    assert abs(peak - expected) <= 1


def test_golden_pipeline_stream_state_carry():
    rng = np.random.default_rng(7)
    sos = sps.butter(12, 0.2, output="sos")
    x = rng.standard_normal(4 * 16384)
    whole = golden.golden_pipeline(x, sos=sos)
    # process in two chunks carrying zi
    h1 = golden.golden_pipeline(x[: 2 * 16384], sos=sos)
    h2 = golden.golden_pipeline(x[2 * 16384 :], sos=sos, zi=h1["zf"])
    cat = np.concatenate([h1["filtered"], h2["filtered"]])
    assert np.allclose(cat, whole["filtered"], atol=1e-12)


def test_rtl_biquad_quirky_documents_state_zeroing():
    """With the RTL's valid-gated state wipe, the cascade degenerates to a
    pure gain of prod(B2/128) — the documented divergence (SURVEY.md §2.1)."""
    coeffs = np.zeros(12, dtype=np.int64)
    coeffs[2] = 64  # set0 B2
    coeffs[8] = 64  # set1 B2
    x = np.array([1000, -2000, 32767], dtype=np.int16)
    y = golden.rtl_biquad12_quirky(coeffs, x)
    expected = x.astype(np.int64)
    for s in range(6):
        expected = (64 * expected) >> 7  # = x >> 1 per section
    assert np.array_equal(y, expected.astype(np.int16))


def test_q15_intended_sosfilt_tracks_float():
    """Integer path stays within the Q15 quantization SNR envelope."""
    sos = sps.butter(6, 0.3, output="sos")
    sos_q = qf.quantize_coeff_x64(sos).astype(np.int64)
    rng = np.random.default_rng(3)
    x = (rng.standard_normal(4096) * 8000).astype(np.int16)
    y_q, _ = golden.sosfilt_q15_intended(sos_q, x)
    # float oracle with the SAME quantized coefficients
    sos_deq = qf.dequantize_coeff_x64(sos_q.astype(np.int8))
    y_f, _ = golden.sosfilt_golden(sos_deq, x.astype(np.float64))
    snr = qf.q15_snr_db(y_f, y_q.astype(np.float64))
    assert snr > 40.0, f"integer path SNR too low: {snr:.1f} dB"
