"""Four-step 16K FFT vs NumPy — the FFT IP replacement's oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_sdr.kernels import fft, magnitude


@pytest.fixture(scope="module")
def plan():
    return fft.plan_constants(128, 128)


def test_real_input_matches_numpy(plan, rng):
    x = rng.standard_normal(16384).astype(np.float32)
    fr, fi = fft.fft_4step(jnp.asarray(x), None, plan)
    ref = np.fft.fft(x.astype(np.float64))
    spec = np.array(fr) + 1j * np.array(fi)
    rel = np.max(np.abs(spec - ref)) / np.max(np.abs(ref))
    assert rel < 1e-5


def test_complex_input_matches_numpy(plan, rng):
    xr = rng.standard_normal(16384).astype(np.float32)
    xi = rng.standard_normal(16384).astype(np.float32)
    fr, fi = fft.fft_4step(jnp.asarray(xr), jnp.asarray(xi), plan)
    ref = np.fft.fft(xr.astype(np.float64) + 1j * xi.astype(np.float64))
    spec = np.array(fr) + 1j * np.array(fi)
    assert np.max(np.abs(spec - ref)) / np.max(np.abs(ref)) < 1e-5


def test_batched_frames(plan, rng):
    x = rng.standard_normal((3, 16384)).astype(np.float32)
    fr, fi = fft.fft_4step(jnp.asarray(x), None, plan)
    ref = np.fft.fft(x.astype(np.float64), axis=-1)
    spec = np.array(fr) + 1j * np.array(fi)
    assert np.max(np.abs(spec - ref)) / np.max(np.abs(ref)) < 1e-5


def test_tone_bin_exact(plan):
    """An exact-bin tone must land all energy in one bin (and its mirror)."""
    k = 1638
    n = np.arange(16384)
    x = np.cos(2 * np.pi * k * n / 16384).astype(np.float32)
    fr, fi = fft.fft_4step(jnp.asarray(x), None, plan)
    mag = np.array(magnitude.magnitude(fr, fi))
    assert int(np.argmax(mag)) in (k, 16384 - k)
    assert mag[k] == pytest.approx(8192.0, rel=1e-4)
    others = np.delete(mag, [k, 16384 - k])
    assert np.max(others) < 1e-2 * mag[k]


def test_ifft_roundtrip(plan, rng):
    xr = rng.standard_normal(16384).astype(np.float32)
    xi = rng.standard_normal(16384).astype(np.float32)
    fr, fi = fft.fft_4step(jnp.asarray(xr), jnp.asarray(xi), plan)
    br, bi = fft.ifft_4step(fr, fi, plan)
    assert np.max(np.abs(np.array(br) - xr)) < 1e-3
    assert np.max(np.abs(np.array(bi) - xi)) < 1e-3


def test_other_factorizations(rng):
    """The four-step works for any n1*n2, e.g. 64*128 = 8192."""
    plan8k = fft.plan_constants(64, 128)
    x = rng.standard_normal(8192).astype(np.float32)
    fr, fi = fft.fft_4step(jnp.asarray(x), None, plan8k)
    ref = np.fft.fft(x.astype(np.float64))
    spec = np.array(fr) + 1j * np.array(fi)
    assert np.max(np.abs(spec - ref)) / np.max(np.abs(ref)) < 1e-5


def test_parseval(plan, rng):
    x = rng.standard_normal(16384).astype(np.float32)
    fr, fi = fft.fft_4step(jnp.asarray(x), None, plan)
    p_time = np.sum(x.astype(np.float64) ** 2)
    p_freq = np.sum(np.array(fr, np.float64) ** 2 + np.array(fi, np.float64) ** 2) / 16384
    assert p_freq == pytest.approx(p_time, rel=1e-5)
