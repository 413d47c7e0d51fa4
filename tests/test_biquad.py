"""Blocked state-space IIR vs SciPy sosfilt — the north-star kernel's oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal as sps

from tpu_sdr.kernels import biquad


def _designs():
    return {
        "butter12_lp": sps.butter(12, 0.2, output="sos"),
        "cheby1_bp": sps.cheby1(6, 1, [0.1, 0.4], btype="bandpass", output="sos"),
        "ellip_hp": sps.ellip(8, 0.5, 60, 0.35, btype="highpass", output="sos"),
    }


@pytest.mark.parametrize("name", list(_designs()))
def test_blocked_matches_scipy(name, rng):
    sos = _designs()[name]
    S = sos.shape[0]
    x = rng.standard_normal(16384).astype(np.float32)
    y_ref, zf_ref = sps.sosfilt(sos, x.astype(np.float64), zi=np.zeros((S, 2)))
    op = biquad.precompute(jnp.asarray(sos, jnp.float32), 128)
    y, zf = biquad.sosfilt_blocked(op, jnp.asarray(x), jnp.zeros((S, 2), jnp.float32))
    scale = np.max(np.abs(y_ref)) + 1e-30
    assert np.max(np.abs(np.array(y) - y_ref)) / scale < 1e-4
    assert np.max(np.abs(np.array(zf) - zf_ref)) < 1e-3


def test_blocked_state_carry_bit_exact(rng):
    """Splitting a stream at any block boundary must be *bit-identical* to the
    unsplit computation — the CDC/FIFO determinism analog (SURVEY.md §5.2)."""
    sos = sps.butter(12, 0.25, output="sos")
    op = biquad.precompute(jnp.asarray(sos, jnp.float32), 128)
    x = rng.standard_normal(8 * 2048).astype(np.float32)
    zi = jnp.zeros((6, 2), jnp.float32)
    y_whole, zf_whole = biquad.sosfilt_blocked(op, jnp.asarray(x), zi)
    pieces = []
    z = zi
    for chunk in np.split(x, 4):
        y_c, z = biquad.sosfilt_blocked(op, jnp.asarray(chunk), z)
        pieces.append(np.array(y_c))
    assert np.array_equal(np.concatenate(pieces), np.array(y_whole))
    assert np.array_equal(np.array(z), np.array(zf_whole))


def test_blocked_with_nonzero_zi(rng):
    sos = sps.butter(12, 0.3, output="sos")
    zi = rng.standard_normal((6, 2)).astype(np.float32)
    x = rng.standard_normal(4096).astype(np.float32)
    y_ref, zf_ref = sps.sosfilt(sos, x.astype(np.float64), zi=zi.astype(np.float64))
    op = biquad.precompute(jnp.asarray(sos, jnp.float32), 128)
    y, zf = biquad.sosfilt_blocked(op, jnp.asarray(x), jnp.asarray(zi))
    scale = np.max(np.abs(y_ref)) + 1e-30
    assert np.max(np.abs(np.array(y) - y_ref)) / scale < 1e-4
    assert np.max(np.abs(np.array(zf) - zf_ref)) / scale < 1e-4


def test_blocked_batched_channels(rng):
    """Channel batching (the filter-bank axis) must equal per-channel runs."""
    sos = sps.butter(12, 0.2, output="sos")
    op = biquad.precompute(jnp.asarray(sos, jnp.float32), 128)
    x = rng.standard_normal((4, 2048)).astype(np.float32)
    zi = jnp.zeros((4, 6, 2), jnp.float32)
    y_b, zf_b = biquad.sosfilt_blocked(op, jnp.asarray(x), zi)
    for c in range(4):
        y_c, zf_c = biquad.sosfilt_blocked(
            op, jnp.asarray(x[c]), jnp.zeros((6, 2), jnp.float32)
        )
        assert np.array_equal(np.array(y_b[c]), np.array(y_c))
        assert np.array_equal(np.array(zf_b[c]), np.array(zf_c))


def test_scan_ref_matches_scipy(rng):
    sos = sps.butter(8, 0.15, output="sos")
    x = rng.standard_normal(2048).astype(np.float32)
    y_ref, _ = sps.sosfilt(sos, x.astype(np.float64), zi=np.zeros((4, 2)))
    y, _ = biquad.sosfilt_scan_ref(
        jnp.asarray(sos, jnp.float32), jnp.asarray(x), jnp.zeros((4, 2), jnp.float32)
    )
    assert np.max(np.abs(np.array(y) - y_ref)) < 1e-4


def test_q15_scan_matches_golden(rng):
    from tpu_sdr.control import golden
    from tpu_sdr.core import qformat as qf

    sos = sps.butter(6, 0.3, output="sos")
    sos_q = qf.quantize_coeff_x64(sos).astype(np.int64)
    x = (rng.standard_normal(1024) * 8000).astype(np.int16)
    y_gold, zf_gold = golden.sosfilt_q15_intended(sos_q, x)
    y_dev, zf_dev = biquad.sosfilt_q15_scan(
        jnp.asarray(sos_q, jnp.int32),
        jnp.asarray(x),
        jnp.zeros((3, 2), jnp.int32),
    )
    assert np.array_equal(np.array(y_dev), y_gold)
    assert np.array_equal(np.array(zf_dev), zf_gold.astype(np.int32))


def test_identity_cascade_is_passthrough(rng):
    op = biquad.precompute(jnp.asarray(biquad.sos_identity(6), jnp.float32), 128)
    x = rng.standard_normal(1024).astype(np.float32)
    y, zf = biquad.sosfilt_blocked(op, jnp.asarray(x), jnp.zeros((6, 2), jnp.float32))
    assert np.allclose(np.array(y), x, atol=1e-6)
    assert np.allclose(np.array(zf), 0.0, atol=1e-6)
