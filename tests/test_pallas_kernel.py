"""Pallas kernel options: half-spectrum mirror and precision emulation.

Interpret-mode parity for the hot-path kernel's static variants
(`tpu_sdr/kernels/pallas/iir_fft.py`): the half-spectrum path must match the
full transform (real input => conjugate symmetry, exact math), and the
"high3" manual 3-pass bf16-split emulation of Precision.HIGH must stay at
f32-class accuracy.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.signal as sps

from tpu_sdr.kernels import fft, window
from tpu_sdr.kernels.pallas import iir_fft


@pytest.fixture(scope="module")
def setup():
    sos = sps.butter(12, 0.25, output="sos")
    win = window.hann_coefficients(16384)
    plan = fft.plan_constants(128, 128)
    pp = iir_fft.build_plan(sos, win, plan, 128, 128)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((4, 16384)), jnp.float32)
    zs = jnp.asarray(rng.standard_normal((4, 12)) * 0.1, jnp.float32)
    return pp, x, zs


@pytest.mark.parametrize(
    "kw",
    [dict(), dict(bypass=True), dict(apply_window=False)],
    ids=["iir", "bypass", "nowindow"],
)
def test_half_spectrum_matches_full(setup, kw):
    pp, x, zs = setup
    full = np.array(
        iir_fft.spectrum_from_state(
            x, zs, pp, interpret=True, half_spectrum=False, **kw
        )
    )
    half = np.array(
        iir_fft.spectrum_from_state(
            x, zs, pp, interpret=True, half_spectrum=True, **kw
        )
    )
    rel = np.abs(full - half).max() / np.abs(full).max()
    assert rel < 1e-5, f"half-spectrum mirror diverged: {rel}"


def test_high3_precision_close_to_highest(setup):
    pp, x, zs = setup
    hi = np.array(
        iir_fft.spectrum_from_state(x, zs, pp, interpret=True, precision="highest")
    ).astype(np.float64)
    h3 = np.array(
        iir_fft.spectrum_from_state(x, zs, pp, interpret=True, precision="high3")
    ).astype(np.float64)
    rel = np.abs(hi - h3).max() / np.abs(hi).max()
    # 3-pass bf16 splits carry ~16+ mantissa bits through the matmuls
    assert rel < 1e-4, f"high3 drifted from exact f32: {rel}"
    snr = 10 * np.log10((hi**2).sum() / ((hi - h3) ** 2).sum())
    assert snr > 90.0, f"high3 SNR too low: {snr:.1f} dB"
