"""Blind IQ imbalance correction: image rejection, chunk invariance."""

import numpy as np
import pytest

from tpu_sdr.kernels.iqcorr import (
    IQCorrector,
    IQCorrectorState,
    apply_imbalance,
)

FS = 100_000.0


def _image_ratio_db(z, f, fs):
    """Power ratio (dB) of the image bin (-f) to the signal bin (+f)."""
    n = z.size
    spec = np.abs(np.fft.fft(z * np.hanning(n))) ** 2
    k = int(round(f / fs * n))
    sig = spec[max(k - 1, 0) : k + 2].sum()
    img = spec[n - k - 1 : n - k + 2].sum()
    return 10 * np.log10(img / sig)


def test_image_rejection_improves():
    t_len = 1 << 16
    n = np.arange(t_len)
    f = 12_300.0
    z = np.exp(2j * np.pi * f * n / FS)
    zi = apply_imbalance(z, gain_db=1.0, phase_deg=5.0)
    before = _image_ratio_db(zi[-16384:], f, FS)
    corr = IQCorrector(leak=0.95)
    wre, wim, st = corr.process(
        zi.real.astype(np.float32), zi.imag.astype(np.float32),
        corr.initial_state())
    w = np.asarray(wre, np.float64) + 1j * np.asarray(wim, np.float64)
    after = _image_ratio_db(w[-16384:], f, FS)
    assert before > -30  # imbalance really creates a strong image
    assert after < before - 25  # corrector buys >25 dB rejection
    # the corrector tap approximates beta/conj(alpha) (the exact image zero)
    g = 10 ** (1.0 / 20)
    phi = np.deg2rad(5.0)
    alpha = (g + np.cos(phi)) / 2 + 1j * np.sin(phi) / 2
    beta = (g - np.cos(phi)) / 2 + 1j * np.sin(phi) / 2
    assert st.estimate() == pytest.approx(beta / np.conj(alpha), rel=0.15)


def test_clean_signal_left_nearly_untouched(rng):
    t_len = 8192
    z = (rng.standard_normal(t_len) + 1j * rng.standard_normal(t_len)) / 2
    corr = IQCorrector(leak=0.9)
    wre, wim, _ = corr.process(
        z.real.astype(np.float32), z.imag.astype(np.float32),
        corr.initial_state())
    w = np.asarray(wre, np.float64) + 1j * np.asarray(wim, np.float64)
    # proper noise: c stays near 0, correction is tiny
    rel = np.linalg.norm(w - z.astype(np.complex64)) / np.linalg.norm(z)
    assert rel < 0.05


def test_chunked_equals_oneshot_bitwise(rng):
    t_len = 4096
    re = rng.standard_normal(t_len).astype(np.float32)
    im = rng.standard_normal(t_len).astype(np.float32)
    corr = IQCorrector()
    r1, i1, _ = corr.process(re, im, corr.initial_state())
    st = corr.initial_state()
    outs_r, outs_i = [], []
    for k in range(0, t_len, 512):
        r, i, st = corr.process(re[k : k + 512], im[k : k + 512], st)
        outs_r.append(np.asarray(r))
        outs_i.append(np.asarray(i))
    np.testing.assert_array_equal(np.concatenate(outs_r), np.asarray(r1))
    np.testing.assert_array_equal(np.concatenate(outs_i), np.asarray(i1))


def test_state_roundtrip_and_validation(rng):
    corr = IQCorrector()
    re = rng.standard_normal((2, 512)).astype(np.float32)
    im = rng.standard_normal((2, 512)).astype(np.float32)
    _, _, st = corr.process(re[:, :256], im[:, :256], corr.initial_state((2,)))
    st2 = IQCorrectorState.from_numpy(st.to_numpy())
    a, b, _ = corr.process(re[:, 256:], im[:, 256:], st)
    c, d, _ = corr.process(re[:, 256:], im[:, 256:], st2)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    np.testing.assert_array_equal(np.asarray(b), np.asarray(d))
    with pytest.raises(ValueError, match="not a multiple"):
        corr.process(np.zeros(100, np.float32), np.zeros(100, np.float32),
                     corr.initial_state())
    with pytest.raises(ValueError, match="leak"):
        IQCorrector(leak=1.5)
