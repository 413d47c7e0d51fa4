"""Rational resampler: upfirdn golden, chunk invariance, rate semantics."""

import numpy as np
import pytest
import scipy.signal as sps

import jax.numpy as jnp

from tpu_sdr.kernels.resample import (
    Resampler,
    ResamplerState,
    design_resample_fir,
)


def _golden(h, x, up, down, n_out):
    """upfirdn with zero initial conditions, first n_out outputs."""
    y = sps.upfirdn(np.asarray(h, np.float64), np.asarray(x, np.float64), up, down)
    return y[:n_out]


@pytest.mark.parametrize("up,down", [(1, 4), (4, 1), (3, 2), (2, 3), (7, 5), (5, 7)])
def test_oneshot_matches_upfirdn(rng, up, down):
    rs = Resampler(up=up, down=down, taps_per_phase=6)
    t = 40 * down
    x = rng.standard_normal(t).astype(np.float32)
    out, st = rs.process(x, rs.initial_state())
    assert out.shape == (t * rs.up // rs.down,)
    assert st.offset == t
    ref = _golden(rs.fir, x, rs.up, rs.down, out.shape[-1])
    np.testing.assert_allclose(np.asarray(out, np.float64), ref, atol=2e-5)


def test_common_factors_reduced():
    rs = Resampler(up=4, down=6)
    assert (rs.up, rs.down) == (2, 3)
    assert rs.rate_out(48_000.0) == pytest.approx(32_000.0)


@pytest.mark.parametrize("up,down", [(3, 2), (1, 4), (7, 5)])
def test_chunked_equals_oneshot_bitwise(rng, up, down):
    rs = Resampler(up=up, down=down, taps_per_phase=8)
    t = 48 * down
    x = rng.standard_normal(t).astype(np.float32)
    one, _ = rs.process(x, rs.initial_state())
    for n_chunks in (2, 4, 8):
        st = rs.initial_state()
        outs = []
        step = t // n_chunks
        assert step % down == 0
        for i in range(n_chunks):
            o, st = rs.process(x[i * step : (i + 1) * step], st)
            outs.append(np.asarray(o))
        np.testing.assert_array_equal(np.concatenate(outs), np.asarray(one))


def test_batched_and_iq_planes(rng):
    rs = Resampler(up=2, down=3, taps_per_phase=6)
    t = 30 * 3
    x = rng.standard_normal((2, 4, t)).astype(np.float32)  # (planes, ch, T)
    out, _ = rs.process(x, rs.initial_state((2, 4)))
    assert out.shape == (2, 4, t * 2 // 3)
    for p in range(2):
        for c in range(4):
            ref = _golden(rs.fir, x[p, c], 2, 3, out.shape[-1])
            np.testing.assert_allclose(
                np.asarray(out[p, c], np.float64), ref, atol=2e-5
            )


def test_tone_survives_rate_change(rng):
    """A 1 kHz tone at 48 kHz resampled 2/3 -> 32 kHz keeps its frequency
    and amplitude (the gain-L design convention)."""
    fs = 48_000.0
    rs = Resampler(up=2, down=3, taps_per_phase=16)
    t = 3 * 4096
    n = np.arange(t)
    x = np.sin(2 * np.pi * 1000.0 * n / fs).astype(np.float32)
    out, _ = rs.process(x, rs.initial_state())
    y = np.asarray(out, np.float64)
    fs2 = rs.rate_out(fs)
    assert fs2 == pytest.approx(32_000.0)
    # Skip the filter transient, then check amplitude and frequency.
    y = y[200:-200]
    assert np.max(np.abs(y)) == pytest.approx(1.0, abs=0.02)
    spec = np.abs(np.fft.rfft(y * np.hanning(y.size)))
    f_peak = np.argmax(spec) * fs2 / y.size
    assert f_peak == pytest.approx(1000.0, abs=2 * fs2 / y.size)


def test_passthrough_identity(rng):
    rs = Resampler(up=1, down=1)
    x = rng.standard_normal(64).astype(np.float32)
    out, _ = rs.process(x, rs.initial_state())
    np.testing.assert_array_equal(np.asarray(out), x)


def test_validation_errors(rng):
    rs = Resampler(up=3, down=2)
    with pytest.raises(ValueError, match="not a multiple"):
        rs.process(np.zeros(7, np.float32), rs.initial_state())
    with pytest.raises(ValueError, match="state shape"):
        rs.process(np.zeros((2, 8), np.float32), rs.initial_state())
    with pytest.raises(ValueError, match=">= 1"):
        Resampler(up=0, down=2)


def test_state_checkpoint_roundtrip(rng):
    rs = Resampler(up=3, down=2, taps_per_phase=6)
    x = rng.standard_normal(60).astype(np.float32)
    _, st = rs.process(x[:30], rs.initial_state())
    d = st.to_numpy()
    st2 = ResamplerState.from_numpy(d)
    a, _ = rs.process(x[30:], st)
    b, _ = rs.process(x[30:], st2)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_design_fir_dc_gain():
    h = design_resample_fir(3, 2)
    assert h.sum() == pytest.approx(3.0)  # gain L preserves amplitude
    assert design_resample_fir(1, 1).tolist() == [1.0]


def test_property_sweep_random_designs(rng):
    """Random (L, M, taps, window, chunking) vs the upfirdn f64 oracle —
    the same sweep discipline as the PFB/DDC property tests."""
    windows = ["hamming", "hann", ("kaiser", 6.0), "blackman"]
    for trial in range(10):
        up = int(rng.choice([1, 2, 3, 4, 5, 7, 8]))
        down = int(rng.choice([1, 2, 3, 4, 5, 6, 7]))
        if up == down:
            down = down + 1
        tpp = int(rng.choice([4, 6, 8, 12]))
        win = windows[int(rng.integers(len(windows)))]
        rs = Resampler(up=up, down=down, taps_per_phase=tpp, window=win)
        t = int(rng.integers(20, 60)) * rs.down
        x = rng.standard_normal(t).astype(np.float32)
        out, _ = rs.process(x, rs.initial_state())
        ref = _golden(rs.fir, x, rs.up, rs.down, out.shape[-1])
        np.testing.assert_allclose(
            np.asarray(out, np.float64), ref, atol=3e-5,
            err_msg=f"trial {trial}: L={rs.up} M={rs.down} tpp={tpp} {win}")
        # random chunking (multiples of M) stays bitwise
        n_chunks = int(rng.choice([2, 4]))
        step = t // n_chunks
        step -= step % rs.down
        if step:
            st = rs.initial_state()
            outs = []
            pos = 0
            while pos < t:
                take = min(step, t - pos)
                take -= take % rs.down
                if not take:
                    break
                o, st = rs.process(x[pos : pos + take], st)
                outs.append(np.asarray(o))
                pos += take
            got = np.concatenate(outs)
            np.testing.assert_array_equal(
                got, np.asarray(out)[: got.shape[-1]])
