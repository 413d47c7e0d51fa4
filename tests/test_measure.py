"""Measurement functions vs closed-form synthetic signals."""

import numpy as np
import pytest

from tpu_sdr.runtime.measure import (
    channel_power,
    occupied_bandwidth,
    peak_search,
)
from tpu_sdr.runtime.psd import WelchPSD


@pytest.fixture
def rng():
    return np.random.default_rng(99)


def test_channel_power_recovers_tone_power(rng):
    fs, nperseg = 1e6, 4096
    amp = 0.6
    t = np.arange(64 * nperseg) / fs
    x = (amp * np.sin(2 * np.pi * 200e3 * t)).astype(np.float32)
    est = WelchPSD(fs=fs, nperseg=nperseg)
    pxx = np.asarray(est.compute(x), np.float64)
    f = est.frequencies()
    p = channel_power(pxx, f, 195e3, 205e3)
    assert p == pytest.approx(amp**2 / 2, rel=1e-3)  # mean-square of a sine
    # out-of-band power is negligible
    assert channel_power(pxx, f, 300e3, 400e3) < 1e-6 * p


def test_channel_power_white_noise_density(rng):
    """White noise: power in a band == variance * (band / Nyquist)."""
    fs, nperseg = 1e6, 2048
    x = rng.standard_normal(256 * nperseg).astype(np.float32)
    est = WelchPSD(fs=fs, nperseg=nperseg)
    pxx = np.asarray(est.compute(x), np.float64)
    f = est.frequencies()
    p = channel_power(pxx, f, 100e3, 200e3)
    assert p == pytest.approx(np.var(x) * (100e3 / 500e3), rel=0.05)


def test_occupied_bandwidth_of_filtered_noise(rng):
    import scipy.signal as sps

    fs, nperseg = 1e6, 4096
    x = rng.standard_normal(256 * nperseg)
    sos = sps.butter(8, [150e3 / 5e5, 250e3 / 5e5], "bandpass", output="sos")
    xf = sps.sosfilt(sos, x).astype(np.float32)
    est = WelchPSD(fs=fs, nperseg=nperseg)
    pxx = np.asarray(est.compute(xf), np.float64)
    f = est.frequencies()
    lo, hi, obw = occupied_bandwidth(pxx, f, fraction=0.99)
    # 99% OBW of a steep 100 kHz-wide bandpass: close to, and at least,
    # the passband width; comfortably under 2x
    assert 95e3 < obw < 160e3, obw
    assert 130e3 < lo < 160e3 and 240e3 < hi < 280e3, (lo, hi)


def test_peak_search_subbin_interpolation(rng):
    """Two windowed tones: interpolated frequencies good to << 1 bin."""
    fs, n = 1e6, 16384
    f1, f2 = 123_456.0, 301_234.0
    t = np.arange(n) / fs
    w = np.hanning(n)
    x = 1.0 * np.sin(2 * np.pi * f1 * t) + 0.3 * np.sin(2 * np.pi * f2 * t)
    mag = np.abs(np.fft.rfft(x * w))
    f = np.fft.rfftfreq(n, 1 / fs)
    peaks = peak_search(mag, f, k=2)
    assert len(peaks) == 2
    bin_hz = fs / n
    assert abs(peaks[0]["freq_hz"] - f1) < 0.05 * bin_hz
    assert abs(peaks[1]["freq_hz"] - f2) < 0.05 * bin_hz
    # levels keep the 1 : 0.3 amplitude ratio (within window scalloping)
    ratio = peaks[1]["level"] / peaks[0]["level"]
    assert ratio == pytest.approx(0.3, rel=0.02)


def test_peak_search_min_separation(rng):
    y = np.zeros(100)
    y[40] = 10.0
    y[42] = 9.0  # shoulder of the same feature
    y[70] = 5.0
    f = np.arange(100.0)
    peaks = peak_search(y, f, k=3, min_separation_bins=5, db=False)
    bins = [p["bin"] for p in peaks]
    assert 40 in bins and 70 in bins and 42 not in bins


def test_peak_search_rejects_sloped_edges():
    """Regression: a monotonic slope has ONE peak (its high edge); the low
    edge must not be reported as a marker."""
    y = np.linspace(10.0, 1.0, 50)
    f = np.arange(50.0)
    peaks = peak_search(y, f, k=3, db=False)
    assert [p["bin"] for p in peaks] == [0]
    # and the high edge IS reported (it beats its single neighbor)
    y2 = np.linspace(1.0, 10.0, 50)
    assert [p["bin"] for p in peak_search(y2, f, k=3, db=False)] == [49]


def test_validation():
    f = np.arange(10.0)
    y = np.ones(10)
    with pytest.raises(ValueError):
        channel_power(y, f, 5.0, 2.0)
    with pytest.raises(ValueError):
        channel_power(y, f[:5], 1.0, 2.0)
    with pytest.raises(ValueError):
        occupied_bandwidth(y, f[::-1], 0.99)
    with pytest.raises(ValueError):
        occupied_bandwidth(y, f, 1.5)
    with pytest.raises(ValueError):
        peak_search(y, f, k=0)
    with pytest.raises(ValueError):
        occupied_bandwidth(np.zeros(10), f)
    with pytest.raises(ValueError):  # mismatched shapes
        occupied_bandwidth(np.ones(5), f)
    with pytest.raises(ValueError):  # single bin: no bin width
        channel_power(np.ones(1), np.array([5.0]), 4.0, 6.0)


def test_realized_center_alias():
    from tpu_sdr.kernels.ddc import DDC

    fs = 1e6
    assert DDC(fs=fs, center_hz=123e3, decimation=4).realized_center_hz == (
        pytest.approx(123e3, abs=fs / 2**33)
    )
    assert DDC(fs=fs, center_hz=-200e3, decimation=4).realized_center_hz == (
        pytest.approx(-200e3, abs=fs / 2**33)
    )
    # beyond-Nyquist requests report the principal alias the NCO produces
    assert DDC(fs=fs, center_hz=700e3, decimation=4).realized_center_hz == (
        pytest.approx(-300e3, abs=fs / 2**33)
    )


class TestFrequencyOffset:
    def test_exact_for_noiseless_tone(self):
        from tpu_sdr.runtime.measure import frequency_offset

        fs = 50_000.0
        n = np.arange(4096)
        for f in (1234.5, -777.25, 0.0):
            z = np.exp(2j * np.pi * f * n / fs)
            got = frequency_offset(z.real, z.imag, fs)
            assert got == pytest.approx(f, abs=1e-6)

    def test_unbiased_in_noise(self, rng):
        from tpu_sdr.runtime.measure import frequency_offset

        fs = 50_000.0
        n = np.arange(65536)
        z = np.exp(2j * np.pi * 2000.0 * n / fs) + 0.1 * (
            rng.standard_normal(n.size) + 1j * rng.standard_normal(n.size)
        )
        got = frequency_offset(z.real, z.imag, fs)
        assert got == pytest.approx(2000.0, abs=2.0)

    def test_afc_closes_the_loop(self):
        """DDC mistuned by 300 Hz; the estimator recovers the error and a
        retune lands the carrier at DC."""
        from tpu_sdr.kernels.ddc import DDC
        from tpu_sdr.runtime.measure import frequency_offset

        fs = 1_000_000.0
        truth = 123_300.0
        n = np.arange(262144)
        x = np.cos(2 * np.pi * truth * n / fs).astype(np.float32)
        ddc = DDC(fs=fs, center_hz=123_000.0, decimation=16)
        bb, _ = ddc.process(x, ddc.initial_state())
        err = frequency_offset(
            np.asarray(bb["re"])[200:], np.asarray(bb["im"])[200:],
            ddc.output_rate)
        assert err == pytest.approx(300.0, abs=1.0)
        ddc.retune(ddc.center_hz + err)
        bb2, _ = ddc.process(x, ddc.initial_state())
        resid = frequency_offset(
            np.asarray(bb2["re"])[200:], np.asarray(bb2["im"])[200:],
            ddc.output_rate)
        assert abs(resid) < 1.0

    def test_validation(self):
        from tpu_sdr.runtime.measure import frequency_offset

        with pytest.raises(ValueError, match="2 samples"):
            frequency_offset(np.zeros(1), np.zeros(1), 1e3)


def test_trace_capture_graceful_on_cpu():
    """bench.trace: on a CPU backend the profiler emits host-only planes;
    capture_op_table must report device_trace=False gracefully (the TPU
    path is exercised by scripts/profile_pipe.py on the chip — artifacts
    docs/measurements/trace_*_r4.json)."""
    import jax.numpy as jnp

    from tpu_sdr.bench.trace import capture_op_table

    state = {"x": jnp.ones((64, 64))}

    def step():
        state["x"] = state["x"] @ state["x"] * 1e-3
        return state["x"]

    step()  # compile outside the trace
    res = capture_op_table(step, reps=3)
    assert res["device_trace"] is False
    assert "reason" in res or "planes" in res
