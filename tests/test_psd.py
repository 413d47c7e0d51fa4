"""WelchPSD vs the scipy.signal.welch golden model."""

import numpy as np
import pytest
import scipy.signal as sps

from tpu_sdr.runtime.psd import WelchPSD, _median_bias


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def _rel(a, b):
    return np.abs(a - b).max() / np.abs(b).max()


@pytest.mark.parametrize(
    "kw",
    [
        dict(),
        dict(window="hamming"),
        dict(window=("kaiser", 8.0)),
        dict(noverlap=0),
        dict(noverlap=768),
        dict(scaling="spectrum"),
        dict(detrend=False),
        dict(average="median"),
        dict(nperseg=1000),  # non-power-of-two segment
    ],
)
def test_welch_matches_scipy_real(rng, kw):
    fs, nperseg = 1e6, kw.pop("nperseg", 1024)
    est = WelchPSD(fs=fs, nperseg=nperseg, **kw)
    t = np.arange(16 * nperseg) / fs
    x = (
        0.7 * np.sin(2 * np.pi * 123e3 * t)
        + 0.05 * rng.standard_normal(t.size)
        + 0.3  # DC offset exercises detrend
    ).astype(np.float32)
    got = np.asarray(est.compute(x), np.float64)
    f_ref, p_ref = sps.welch(
        np.asarray(x, np.float64), fs=fs, nperseg=nperseg, **kw
    )
    assert got.shape == p_ref.shape
    assert _rel(got, p_ref) < 2e-5
    np.testing.assert_allclose(est.frequencies(), f_ref)


def test_welch_matches_scipy_complex(rng):
    fs, nperseg = 1e6, 1024
    est = WelchPSD(fs=fs, nperseg=nperseg)
    t = np.arange(8 * nperseg) / fs
    z = np.exp(2j * np.pi * (-200e3) * t) + 0.1 * (
        rng.standard_normal(t.size) + 1j * rng.standard_normal(t.size)
    )
    z = z.astype(np.complex64)
    got = np.asarray(
        est.compute_iq(z.real.copy(), z.imag.copy()), np.float64
    )
    f_ref, p_ref = sps.welch(
        np.asarray(z, np.complex128),
        fs=fs,
        nperseg=nperseg,
        return_onesided=False,
    )
    assert got.shape == p_ref.shape
    assert _rel(got, p_ref) < 2e-5
    np.testing.assert_allclose(est.frequencies(onesided=False), f_ref)
    # the tone lands in the negative-frequency half
    assert f_ref[np.argmax(got)] == pytest.approx(-200e3, abs=fs / nperseg)


def test_welch_batched_matches_per_row(rng):
    est = WelchPSD(fs=1e6, nperseg=512)
    x = rng.standard_normal((3, 2, 8 * 512)).astype(np.float32)
    got = np.asarray(est.compute(x))
    for i in range(3):
        for j in range(2):
            row = np.asarray(est.compute(x[i, j]))
            np.testing.assert_array_equal(got[i, j], row)


def test_welch_density_integrates_to_power(rng):
    """Parseval sanity: integral of the PSD ~= signal variance."""
    fs = 1e6
    est = WelchPSD(fs=fs, nperseg=4096, window="hann")
    x = rng.standard_normal(64 * 4096).astype(np.float32)
    p = np.asarray(est.compute(x), np.float64)
    df = fs / 4096
    assert np.sum(p) * df == pytest.approx(np.var(x), rel=0.05)


def test_welch_validation():
    with pytest.raises(ValueError):
        WelchPSD(nperseg=1024, noverlap=1024)
    with pytest.raises(ValueError):
        WelchPSD(scaling="nope")
    with pytest.raises(ValueError):
        WelchPSD(average="mode")
    with pytest.raises(ValueError):
        WelchPSD(detrend="linear")
    est = WelchPSD(nperseg=1024)
    with pytest.raises(ValueError):
        est.compute(np.zeros(512, np.float32))


@pytest.mark.parametrize(
    "kw",
    [
        dict(window="hann", noverlap=512),
        dict(window=("tukey", 0.25), noverlap=128),
        dict(window="hamming", noverlap=0, detrend=False),
    ],
)
def test_spectrogram_matches_scipy(rng, kw):
    fs, nperseg = 1e6, 1024
    est = WelchPSD(fs=fs, nperseg=nperseg, **kw)
    x = rng.standard_normal(10 * nperseg + 333).astype(np.float32)
    got = np.asarray(est.spectrogram(x), np.float64)
    f_ref, t_ref, s_ref = sps.spectrogram(
        np.asarray(x, np.float64), fs=fs, nperseg=nperseg, mode="psd", **kw
    )
    assert got.shape == s_ref.shape
    assert _rel(got, s_ref) < 2e-5
    np.testing.assert_allclose(est.segment_times(x.size), t_ref)
    np.testing.assert_allclose(est.frequencies(), f_ref)


def test_spectrogram_iq_matches_scipy(rng):
    fs, nperseg = 1e6, 512
    est = WelchPSD(fs=fs, nperseg=nperseg, noverlap=nperseg // 2)
    z = (
        rng.standard_normal(8 * nperseg) + 1j * rng.standard_normal(8 * nperseg)
    ).astype(np.complex64)
    got = np.asarray(est.spectrogram(z.real.copy(), z.imag.copy()), np.float64)
    _, _, s_ref = sps.spectrogram(
        np.asarray(z, np.complex128),
        fs=fs,
        nperseg=nperseg,
        noverlap=nperseg // 2,
        window="hann",
        mode="psd",
        return_onesided=False,
    )
    assert got.shape == s_ref.shape
    assert _rel(got, s_ref) < 2e-5


@pytest.mark.parametrize("mesh_shape", [(1, 2), (2, 1), (2, 4), (1, 8)])
@pytest.mark.parametrize("noverlap", [0, 256])
def test_sharded_welch_equals_single(rng, mesh_shape, noverlap):
    from tpu_sdr.shard import ShardedWelchPSD, make_sdr_mesh

    est = WelchPSD(fs=1e6, nperseg=512, noverlap=noverlap)
    c_ax, t_ax = mesh_shape
    mesh = make_sdr_mesh(channel=c_ax, time=t_ax)
    sh = ShardedWelchPSD(est, mesh)
    x = rng.standard_normal((4, 16 * 512)).astype(np.float32)
    got = np.asarray(sh.compute(x), np.float64)
    ref = np.asarray(est.compute(x), np.float64)
    assert got.shape == ref.shape
    assert _rel(got, ref) < 1e-6
    # IQ planes too
    xs = rng.standard_normal((2, 4, 16 * 512)).astype(np.float32)
    got = np.asarray(sh.compute_iq(xs), np.float64)
    ref = np.asarray(est.compute_iq(xs[0], xs[1]), np.float64)
    assert _rel(got, ref) < 1e-6


def test_sharded_welch_validation(rng):
    from tpu_sdr.shard import ShardedWelchPSD, make_sdr_mesh

    mesh = make_sdr_mesh(channel=1, time=8)
    with pytest.raises(ValueError):
        ShardedWelchPSD(WelchPSD(average="median"), mesh)
    sh = ShardedWelchPSD(WelchPSD(nperseg=512), mesh)
    with pytest.raises(ValueError):  # per-shard slice < nperseg
        sh.compute(np.zeros((1, 8 * 256), np.float32))
    with pytest.raises(ValueError):  # T doesn't divide over shards
        sh.compute(np.zeros((1, 7 * 512), np.float32))


def test_property_sweep_random_configs(rng):
    """Random (nperseg, noverlap, window, scaling, detrend, average,
    real/IQ, signal length) vs scipy.signal.welch — sweep discipline."""
    windows = ["hann", "hamming", ("kaiser", 7.0), "blackmanharris", "boxcar"]
    for trial in range(10):
        nperseg = int(rng.choice([256, 500, 513, 1024]))
        noverlap = int(rng.integers(0, nperseg))
        kw = dict(
            nperseg=nperseg,
            noverlap=noverlap,
            window=windows[trial % len(windows)],
            scaling=("density", "spectrum")[trial % 2],
            detrend=("constant", False)[(trial // 2) % 2],
            average=("mean", "median")[(trial // 3) % 2],
        )
        est = WelchPSD(fs=1e6, **kw)
        t_len = int(rng.integers(4 * nperseg, 9 * nperseg))
        iq = bool(trial % 3 == 2)
        if iq:
            z = (
                rng.standard_normal(t_len) + 1j * rng.standard_normal(t_len)
            ).astype(np.complex64)
            got = np.asarray(
                est.compute_iq(z.real.copy(), z.imag.copy()), np.float64
            )
            _, ref = sps.welch(
                np.asarray(z, np.complex128), fs=1e6,
                return_onesided=False, **kw,
            )
        else:
            x = rng.standard_normal(t_len).astype(np.float32)
            got = np.asarray(est.compute(x), np.float64)
            _, ref = sps.welch(np.asarray(x, np.float64), fs=1e6, **kw)
        assert got.shape == ref.shape, (trial, kw)
        assert _rel(got, ref) < 5e-5, (trial, kw, iq, _rel(got, ref))


def test_median_bias_matches_scipy():
    try:
        from scipy.signal._spectral_py import _median_bias as ref
    except ImportError:  # pragma: no cover - scipy layout drift
        pytest.skip("scipy private median bias not importable")
    for n in (1, 2, 3, 5, 16, 31):
        assert _median_bias(n) == pytest.approx(ref(n))


def test_psd_rejects_complex_input():
    """Review finding: complex input was silently cast to float (negative-
    frequency content folded onto positive bins) instead of raising
    toward compute_iq."""
    psd = WelchPSD(fs=1e6, nperseg=512)
    iq = np.zeros(4096, np.complex64)
    with pytest.raises(ValueError, match="compute_iq"):
        psd.compute(iq)
    with pytest.raises(ValueError, match="re/im"):
        psd.spectrogram(iq)
