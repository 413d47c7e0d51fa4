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


class TestFMDemodPallas:
    """Fused FM demod kernel (kernels/pallas/affine_scan.py), interpret
    mode. Interpret routes through XLA, whose cross-shape constant folds
    shift results ~1 ULP — so parity here is tolerance-based; exact
    bitwise behavior is checked compiled-on-chip in test_tpu_compiled."""

    def _data(self, c=4, tiles=2, seed=0):
        rng = np.random.default_rng(seed)
        t = tiles * 64 * 128
        re = jnp.asarray(rng.standard_normal((c, t)), jnp.float32)
        im = jnp.asarray(rng.standard_normal((c, t)), jnp.float32)
        pr = jnp.zeros((c, 1), jnp.float32)
        y0 = jnp.zeros((c,), jnp.float32)
        return re, im, pr, y0

    @pytest.mark.parametrize("pole", [None, 0.9997])
    def test_matches_xla_forward(self, pole):
        from tpu_sdr.kernels.demod import _fm_forward
        from tpu_sdr.kernels.pallas.affine_scan import fm_demod_pallas

        re, im, pr, y0 = self._data()
        kw = dict(fs=2e5, dev=75e3, pole=pole)
        a_ref, _, _, f_ref = _fm_forward(re, im, pr, pr, y0, block=128, **kw)
        a_pal, _, _, f_pal = fm_demod_pallas(
            re, im, pr, pr, y0, interpret=True, **kw)
        np.testing.assert_allclose(
            np.asarray(a_pal), np.asarray(a_ref), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(f_pal), np.asarray(f_ref), atol=1e-6)

    def test_carried_state_chunking(self):
        from tpu_sdr.kernels.pallas.affine_scan import fm_demod_pallas

        re, im, pr, y0 = self._data(tiles=4)
        kw = dict(fs=2e5, dev=75e3, pole=0.9997, interpret=True)
        full, *_ = fm_demod_pallas(re, im, pr, pr, y0, **kw)
        h = re.shape[-1] // 2
        a1, r1, i1, f1 = fm_demod_pallas(re[:, :h], im[:, :h], pr, pr, y0, **kw)
        a2, *_ = fm_demod_pallas(re[:, h:], im[:, h:], r1, i1, f1, **kw)
        got = np.concatenate([np.asarray(a1), np.asarray(a2)], axis=1)
        # same per-chunk shapes -> identical graphs -> bitwise; vs the
        # one-shot graph only tolerance holds under interpret (XLA folds)
        np.testing.assert_allclose(got, np.asarray(full), atol=1e-6)

    def test_validation(self):
        from tpu_sdr.kernels.pallas.affine_scan import fm_demod_pallas

        re, im, pr, y0 = self._data(c=2, tiles=1)
        with pytest.raises(ValueError, match="tile width"):
            fm_demod_pallas(re[:, :100], im[:, :100], pr, pr, y0,
                            fs=2e5, dev=75e3, pole=None, interpret=True)


def test_atan2_poly_matches_ieee_atan2():
    """The FM kernel's in-kernel atan2 (Mosaic has no atan2 lowering) vs
    jnp.arctan2: 2.4e-7 worst case on random octants, and exact IEEE
    signed-zero behavior — the discriminator's zero-state first sample
    computes atan2(+-0, -0), which must be +-pi like the XLA forward."""
    import jax.numpy as jnp

    from tpu_sdr.kernels.pallas.affine_scan import _atan2_poly

    rng = np.random.default_rng(3)
    y = jnp.asarray(rng.standard_normal(200_000), jnp.float32)
    x = jnp.asarray(rng.standard_normal(200_000), jnp.float32)
    d = np.abs(np.asarray(_atan2_poly(y, x)) - np.asarray(jnp.arctan2(y, x)))
    assert d.max() < 1e-6
    for yy, xx in [(0.0, 0.0), (-0.0, 0.0), (0.0, -0.0), (-0.0, -0.0),
                   (1.0, 0.0), (-1.0, 0.0), (0.0, 1.0), (-0.0, 1.0),
                   (0.0, -1.0), (-0.0, -1.0)]:
        got = float(_atan2_poly(jnp.float32(yy), jnp.float32(xx)))
        want = float(jnp.arctan2(jnp.float32(yy), jnp.float32(xx)))
        assert got == want or abs(got - want) < 1e-6, (yy, xx, got, want)


@pytest.mark.parametrize("precision", ["high3", "default", "highest"])
def test_flat_emit_and_blocked_output_bitwise(setup, precision):
    """The round-5 layout options are pure placement: flat_emit (kernel
    writes flattened (n,)-lane rows) and blocked_output (kernel-native
    (F, n1, n2)) must reproduce the default path's bits exactly at every
    precision tier."""
    pp, x, zs = setup
    base = np.array(
        iir_fft.spectrum_from_state(
            x, zs, pp, interpret=True, precision=precision
        )
    )
    flat = np.array(
        iir_fft.spectrum_from_state(
            x, zs, pp, interpret=True, precision=precision, flat_emit=True
        )
    )
    blocked = np.array(
        iir_fft.spectrum_from_state(
            x, zs, pp, interpret=True, precision=precision,
            blocked_output=True,
        )
    )
    np.testing.assert_array_equal(flat, base)
    assert blocked.shape == (x.shape[0], 128, 128)
    np.testing.assert_array_equal(blocked.reshape(base.shape), base)
    with pytest.raises(ValueError, match="half_spectrum"):
        iir_fft.spectrum_from_state(
            x, zs, pp, interpret=True, half_spectrum=True, flat_emit=True
        )
    with pytest.raises(ValueError, match="exclusive"):
        iir_fft.spectrum_from_state(
            x, zs, pp, interpret=True, flat_emit=True, blocked_output=True
        )


def test_flat_emit_pipeline_bitwise(setup):
    """pallas_flat_emit=True through the full streaming engine (hybrid +
    fused paths, chunked with carried state) == the default layout,
    bitwise."""
    import scipy.signal as sps

    from tpu_sdr.core.config import FilterMode, PipelineConfig
    from tpu_sdr.runtime import SpectrumPipeline

    rng = np.random.default_rng(11)
    x = rng.standard_normal((2, 3 * 16384)).astype(np.float32)
    sos = sps.ellip(12, 0.5, 70, 0.3, output="sos")
    outs = {}
    for flat in (False, True):
        pipe = SpectrumPipeline(
            PipelineConfig(channels=2, pallas_flat_emit=flat)
        )
        pipe.upload_sos(sos)
        st = pipe.initial_state()
        mags = []
        for c in range(3):  # chunked, carried state
            out, st = pipe.process(
                x[:, c * 16384 : (c + 1) * 16384], st, FilterMode.CUSTOM
            )
            mags.append(np.asarray(out["magnitude"]))
        outs[flat] = np.concatenate(mags, axis=1)
    np.testing.assert_array_equal(outs[True], outs[False])
