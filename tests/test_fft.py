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


def test_non128_factorization_takes_xla_path():
    """Review finding: a legal non-128x128 factorization (fft_n1=64,
    fft_n2=256) used to CRASH at pipeline construction because the bank
    builder's Pallas gate omitted the n1/n2 checks the dispatch gates had
    (negative jnp.pad inside build_plan.half_rows). It must build with no
    Pallas plan, process on the XLA path, and agree with the default
    128x128 factorization (same DFT, different blocking) to float
    tolerance."""
    from tpu_sdr import FilterMode, PipelineConfig
    from tpu_sdr.runtime import SpectrumPipeline

    pipe = SpectrumPipeline(PipelineConfig(fft_n1=64, fft_n2=256))
    assert pipe.bank_fixed["pp"] is None  # geometry gate: no Pallas plan
    rng = np.random.default_rng(0)
    x = rng.standard_normal(16384).astype(np.float32)
    out, _ = pipe.process(x, pipe.initial_state(), FilterMode.FIXED)
    ref_pipe = SpectrumPipeline(PipelineConfig())
    ref, _ = ref_pipe.process(x, ref_pipe.initial_state(), FilterMode.FIXED)
    np.testing.assert_allclose(
        np.asarray(out["magnitude"]), np.asarray(ref["magnitude"]),
        rtol=2e-4, atol=2e-3,
    )
    # and the Pallas plan builder itself rejects the geometry cleanly
    import scipy.signal as sps

    from tpu_sdr.kernels.pallas import iir_fft
    from tpu_sdr.kernels import window

    with pytest.raises(ValueError, match="128x128 four-step"):
        iir_fft.build_plan(
            sps.butter(12, 0.2, output="sos"),
            window.hann_coefficients(16384),
            fft.plan_constants(64, 256),
        )


def test_ifft_4step_real_input_convention():
    """Review finding: ifft_4step(xr, None, ...) used to raise a bare
    TypeError although fft_4step documents None as the real-input
    convention."""
    plan = fft.plan_constants(128, 128)
    rng = np.random.default_rng(3)
    x = rng.standard_normal(16384).astype(np.float32)
    rr, ri = fft.ifft_4step(jnp.asarray(x), None, plan)
    # ifft(real x) == conj-symmetric spectrum scaled: check vs numpy
    ref = np.fft.ifft(x.astype(np.float64))
    np.testing.assert_allclose(np.asarray(rr, np.float64), ref.real, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ri, np.float64), ref.imag, atol=1e-6)
