"""Spectrum scanner: occupancy detection, power calibration, PSD cross-check."""

import numpy as np
import pytest

from tpu_sdr.runtime.scanner import SpectrumScanner

FS = 1_000_000.0


def _tones(freqs_amps, t_len, fs=FS, noise=1e-4, seed=0):
    rng = np.random.default_rng(seed)
    n = np.arange(t_len)
    x = noise * rng.standard_normal(t_len)
    for f, a in freqs_amps:
        x = x + a * np.cos(2 * np.pi * f * n / fs + rng.uniform(0, 2 * np.pi))
    return x.astype(np.float32)


def test_scanner_finds_exactly_the_occupied_channels():
    sc = SpectrumScanner(FS, 0.0, 500e3, channel_bw=25e3, threshold_db=10.0)
    assert sc.n_channels == 20
    # Tones in channels 2 (62.5 kHz), 7 (187.5 kHz), 15 (387.5 kHz).
    x = _tones([(62.5e3, 0.5), (187.5e3, 0.2), (387.5e3, 0.05)], 262144)
    res = sc.scan(x)
    assert list(np.flatnonzero(res.occupied)) == [2, 7, 15]
    hits = res.hits
    assert [round(h["center_hz"]) for h in hits] == [62500, 187500, 387500]
    assert hits[0]["snr_db"] > hits[1]["snr_db"] > hits[2]["snr_db"] > 10.0


def test_scanner_power_calibration():
    """A real tone of amplitude A in-channel reads mean|z|^2 = A^2/4."""
    sc = SpectrumScanner(FS, 0.0, 500e3, channel_bw=25e3)
    x = _tones([(112.5e3, 0.8)], 262144, noise=0.0)
    res = sc.scan(x)
    ch = 4  # 112.5 kHz
    assert res.power[ch] == pytest.approx(0.8**2 / 4, rel=0.02)


def test_scanner_matches_welch_psd_band_power():
    """DDC-measured channel power == integrated Welch PSD over the band
    (within a fraction of a dB)."""
    import scipy.signal as sps

    from tpu_sdr.runtime.measure import channel_power

    sc = SpectrumScanner(FS, 0.0, 500e3, channel_bw=25e3)
    x = _tones([(237.5e3, 0.3)], 262144, noise=1e-3)
    res = sc.scan(x)
    freqs, pxx = sps.welch(np.asarray(x, np.float64), fs=FS, nperseg=16384)
    p_band = channel_power(pxx, freqs, 225e3, 250e3)
    # Welch band power counts the full real-tone power A^2/2; the DDC
    # baseband reads A^2/4 (one mixer image) -> factor 2.
    assert 10 * np.log10(2 * res.power[9]) == pytest.approx(
        10 * np.log10(p_band), abs=0.3
    )


def test_scanner_iq_and_batched_input():
    sc = SpectrumScanner(FS, -200e3, 200e3, channel_bw=25e3, k_per_dispatch=8)
    assert sc.n_channels == 16
    rng = np.random.default_rng(7)
    n = np.arange(131072)
    # A noise floor keeps filter-stopband leakage (~112 dB down) below
    # the occupancy threshold, as in any real capture.
    z = 0.4 * np.exp(2j * np.pi * (-112.5e3) * n / FS) + 1e-4 * (
        rng.standard_normal(n.size) + 1j * rng.standard_normal(n.size)
    )
    planes = np.stack([z.real, z.imag]).astype(np.float32)
    res = sc.scan_planes(planes)
    # -112.5 kHz is channel 3 of the grid starting at -200 kHz.
    assert list(np.flatnonzero(res.occupied)) == [3]
    # An IQ tone has no image: mean|z|^2 = A^2.
    assert res.power[3] == pytest.approx(0.16, rel=0.02)
    # Batched input averages captures.
    x2 = np.stack([planes, planes], axis=1)  # (2, batch=2, T)
    res2 = sc.scan_planes(x2)
    assert res2.power[3] == pytest.approx(res.power[3], rel=1e-6)


def test_scanner_validation():
    with pytest.raises(ValueError, match="empty span"):
        SpectrumScanner(FS, 100.0, 100.0)
    with pytest.raises(ValueError, match="channel_bw"):
        SpectrumScanner(FS, 0.0, 1e5, channel_bw=-1)
    sc = SpectrumScanner(FS, 0.0, 500e3, channel_bw=25e3)
    with pytest.raises(ValueError, match="at least"):
        sc.scan(np.zeros(64, np.float32))


@pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2), (8, 1)])
def test_scanner_sharded_equals_single(mesh_shape):
    """Scanner over a (channel, time) mesh == the single-device scan,
    bitwise (the carrier-sharded DDCBank contract)."""
    from tpu_sdr.shard import make_sdr_mesh

    c_ax, t_ax = mesh_shape
    mesh = make_sdr_mesh(channel=c_ax, time=t_ax)
    x = _tones([(137.5e3, 0.4), (362.5e3, 0.02)], 131072)
    kw = dict(channel_bw=25e3, k_per_dispatch=8, taps_per_phase=8)
    single = SpectrumScanner(FS, 0.0, 500e3, **kw).scan(x)
    sharded = SpectrumScanner(FS, 0.0, 500e3, mesh=mesh, **kw).scan(x)
    np.testing.assert_array_equal(sharded.power, single.power)
    np.testing.assert_array_equal(sharded.occupied, single.occupied)


def test_scanner_mesh_k_validation():
    from tpu_sdr.shard import make_sdr_mesh

    mesh = make_sdr_mesh(channel=8, time=1)
    with pytest.raises(ValueError, match="divide over"):
        SpectrumScanner(FS, 0.0, 500e3, channel_bw=25e3, k_per_dispatch=12,
                        mesh=mesh)


def test_scanner_last_batch_padding():
    """n_channels not a multiple of k_per_dispatch still scans every channel."""
    sc = SpectrumScanner(FS, 0.0, 475e3, channel_bw=25e3, k_per_dispatch=8)
    assert sc.n_channels == 19
    x = _tones([(462.5e3, 0.5)], 131072)  # the LAST channel
    res = sc.scan(x)
    assert list(np.flatnonzero(res.occupied)) == [18]


def test_scanner_rejects_complex_and_zero_decimation():
    """Review findings: complex input was silently truncated to its real
    plane (phantom mirror channels, 3 dB-low powers); decimation=0 was
    silently replaced by the default instead of reaching DDCBank's own
    validation."""
    sc = SpectrumScanner(fs=1e6, f_start=0, f_stop=200e3, channel_bw=25e3)
    with pytest.raises(ValueError, match="scan_planes"):
        sc.scan(np.zeros(65536, np.complex64))
    with pytest.raises(ValueError):
        SpectrumScanner(fs=1e6, f_start=0, f_stop=200e3,
                        channel_bw=25e3, decimation=0)
