"""Golden CPU reference model (NumPy/SciPy) — the oracle for all kernels.

The reference system's only trustworthy math spec is its own host GUI
(SciPy-designed filters + NumPy FFT/magnitude decode,
``scripts/fft_analyzer_gui.py:108-179,250-260``) — the RTL carries several
quantization/semantics quirks that the GUI does *not* model (SURVEY.md §2.6).
Per the quirks register (SURVEY.md §7), this framework implements the
*intended* math; this module provides:

- ``golden_pipeline``    float64 window -> sosfilt -> FFT -> magnitude chain,
- ``hann_q16_rom``       the RTL's offset-binary Hann ROM, bit-exact,
- ``rtl_window_q15``     the RTL's Q15 window multiply, bit-exact,
- ``rtl_biquad12_quirky`` a faithful simulation of the RTL filter equation
  (reversed-B order, A-index shift, dropped A2, /128 truncation, per-sample
  state zeroing) for A/B documentation tests,
- fixed-point "intended" sosfilt for the integer path's oracle.

Everything here is deliberately slow, simple and NumPy-only.
"""

from __future__ import annotations

import numpy as np
import scipy.signal as sps

from tpu_sdr.core import qformat as qf

N_DEFAULT = 16384


# ---------------------------------------------------------------------------
# Window
# ---------------------------------------------------------------------------

def hann_true(n: int = N_DEFAULT) -> np.ndarray:
    """The intended window: periodic-symmetric Hann as scipy.signal defines it.

    The reference generator uses ``scipy.signal.windows.hann(N)`` (symmetric)
    via ``scripts/hann_coeff.py:4`` — 0.5*(1-cos(2*pi*n/(N-1))).
    """
    return sps.windows.hann(n, sym=True).astype(np.float64)


def hann_rtl_effective(n: int = N_DEFAULT) -> np.ndarray:
    """The window the RTL *actually* applies: 2*hann - 1 = -cos(2*pi*n/(N-1)).

    The ROM stores (hann - 0.5) * 2^16 (``scripts/hann_coeff.py:4-5``) but the
    multiplier treats it as a plain Q15 signed coefficient, so the effective
    gain is 2*(hann - 0.5). Quirks register item (a).
    """
    return 2.0 * hann_true(n) - 1.0


def hann_q16_rom(n: int = N_DEFAULT) -> np.ndarray:
    """Bit-exact RTL Hann ROM: int16 = clip(round((hann - 0.5) * 65536)).

    Reference ``scripts/hann_coeff.py:4-5`` / ``src/hann.vhd:5-6``.
    """
    w = hann_true(n)
    q = np.floor((w - 0.5) * qf.Q16_SCALE + 0.5).astype(np.int64)
    return np.clip(q, qf.INT16_MIN, qf.INT16_MAX).astype(np.int16)


def rtl_window_q15(
    x_q15: np.ndarray,
    phase: int = 0,
    n: int = N_DEFAULT,
    misaligned: bool = False,
) -> np.ndarray:
    """Bit-exact RTL window path: ROM lookup + (x*w)>>15 half-LSB rounding.

    ``phase`` is the window address counter value at the first sample
    (``src/hann8192.vhd:41-44`` wraps it mod 16384).

    ``misaligned=True`` additionally reproduces the RTL's
    coefficient/sample misalignment (SURVEY.md §2.1, quirks register item
    (b)): in ``src/hann8192.vhd:36-43`` all three pipeline registers update
    in one clocked process, so ``product <= sample_in * coef_s`` uses the
    coefficient latched on the PREVIOUS cycle — sample k is multiplied by
    ROM[k-1]. In steady streaming the address counter wraps mod N, so
    sample 0 of a frame meets ROM[N-1] carried over from the previous frame
    (the very first frame after reset sees an undefined ``coef_s``; we model
    the steady state). The further one-cycle output-register delay is pure
    latency: the downstream frame sequencer counts ``valid`` pulses, so it
    does not shift frame contents.

    Default (``misaligned=False``) is the intended alignment: coefficient k
    with sample k.
    """
    rom = hann_q16_rom(n)
    lag = 1 if misaligned else 0
    idx = (phase + np.arange(len(x_q15)) - lag) % n
    return qf.window_multiply_q15(np.asarray(x_q15, np.int16), rom[idx])


# ---------------------------------------------------------------------------
# Filters
# ---------------------------------------------------------------------------

def fixed_filter_sos() -> np.ndarray:
    """The 'fixed' filter bank's intended SOS cascade.

    The RTL's fixed filter hard-codes two Q7 coefficient sets
    (``imp/filter_pkg.vhd:54-68``): ALPHA = {A2:127, A1:21, A0:107, B2:14,
    B1:0, B0:-14} and BETA = {A2:127, A1:-21, A0:107, B2:15, B1:0, B0:-15},
    alternated across 6 sections (``imp/filter_iir12.vhd:38-137``).

    The RTL difference equation (``imp/filter_iir.vhd:83-87``) is

      y[n] = (B0*x[n-2] + B1*x[n-1] + B2*x[n] - A0*y[n-2] - A1*y[n-1]) >> 7

    (A2 unused), so taken at face value — minus the state-zeroing quirk —
    each section realizes, in standard (b, a) notation with /128 scaling:

      ALPHA: b = [14, 0, -14]/128,  a = [1,  21/128, 107/128]
      BETA : b = [15, 0, -15]/128,  a = [1, -21/128, 107/128]

    a narrow bandpass pair. The cascade alternates ALPHA/BETA x3.
    """
    alpha = np.array([14 / 128, 0.0, -14 / 128, 1.0, 21 / 128, 107 / 128])
    beta = np.array([15 / 128, 0.0, -15 / 128, 1.0, -21 / 128, 107 / 128])
    return np.stack([alpha, beta, alpha, beta, alpha, beta]).astype(np.float64)


def sosfilt_golden(sos: np.ndarray, x: np.ndarray, zi: np.ndarray | None = None):
    """SciPy sosfilt — the intended filter semantics (transposed DF-II).

    Matches the preview math of the GUI designer (``sosfreqz`` response,
    ``fft_analyzer_gui.py:190-230``). Returns (y, zf).
    """
    sos = np.asarray(sos, dtype=np.float64)
    if zi is None:
        zi = np.zeros((sos.shape[0], 2), dtype=np.float64)
    y, zf = sps.sosfilt(sos, np.asarray(x, np.float64), zi=zi)
    return y, zf


def rtl_biquad12_quirky(coeffs_x64: np.ndarray, x_q15: np.ndarray) -> np.ndarray:
    """Faithful simulation of the RTL custom filter datapath, for A/B docs.

    Implements the actual difference equation of ``imp/filter_iir.vhd:83-87``
    with its quirks (SURVEY.md §2.1):

      y[n] = (B0*x[n-2] + B1*x[n-1] + B2*x[n] - A0*y[n-2] - A1*y[n-1]) >> 7

    where >> 7 is truncating; A2 is never used; 6 cascaded sections all share
    the same 12-coefficient file alternating set0/set1
    (``src/filter_iir12_cust.vhd:67-240``). The reference's per-sample state
    zeroing (valid-gated reset, ``imp/filter_iir.vhd:130-151``) is modeled by
    the ``zero_state_between_samples`` fast path: with state wiped each
    sample, y[n] = (B2*x[n]) >> 7 per section.
    """
    c = np.asarray(coeffs_x64, dtype=np.int64)
    assert c.shape == (12,)
    # wire order per set: [B0, B1, B2, A0, A1, A2] (fft_analyzer_gui.py:591-613)
    sets = [c[0:6], c[6:12]]
    x = np.asarray(x_q15, dtype=np.int64)
    # With the RTL's valid-gated state zeroing at 1-pulse-per-sample input,
    # only the B2 (current-sample) tap survives in each section:
    y = x
    for s in range(6):
        b = sets[s % 2]
        y = (b[2] * y) >> 7  # truncating shift, int64 arithmetic
        y = np.clip(y, qf.INT16_MIN, qf.INT16_MAX)
    return y.astype(np.int16)


def sosfilt_q15_intended(
    sos_x64: np.ndarray, x_q15: np.ndarray, zi: np.ndarray | None = None
):
    """Integer-path oracle: TDF-II SOS with x64 int coeffs, /64 rounding.

    The 'intended' fixed-point semantics: int8 x64 coefficients, products
    accumulated in int64, each section output and state scaled back by
    >> 6 with round-half-away (engine-side /64,
    ``tpu_sdr.core.qformat.dequantize_coeff_x64``), saturated to int16.
    Returns (y_q15, zf) with zf int64 state (pre-shift accumulators).
    """
    sos = np.asarray(sos_x64, dtype=np.int64)
    if np.any(sos[:, 3] != qf.COEFF_SCALE):
        # The >>6 below IS the /a0 for a0 == 64; any other a0 would need a
        # per-section divide this fixed-point contract does not define.
        raise ValueError(
            "sosfilt_q15_intended is defined for normalized sections "
            f"(a0 == {qf.COEFF_SCALE}); got a0 = {sos[:, 3].tolist()}"
        )
    n_sections = sos.shape[0]
    x = np.asarray(x_q15, dtype=np.int64)
    if zi is None:
        zi = np.zeros((n_sections, 2), dtype=np.int64)
    z = np.array(zi, dtype=np.int64)
    y = np.empty_like(x)
    for n in range(len(x)):
        v = x[n]
        for s in range(n_sections):
            b0, b1, b2, a0, a1, a2 = sos[s]
            out = qf.rshift_round_half_away(b0 * v + z[s, 0], 6)
            out = int(np.clip(out, qf.INT16_MIN, qf.INT16_MAX))
            z[s, 0] = b1 * v - a1 * out + z[s, 1]
            z[s, 1] = b2 * v - a2 * out
            v = out
        y[n] = v
    return y.astype(np.int16), z


# ---------------------------------------------------------------------------
# FFT + magnitude (the GUI decode math)
# ---------------------------------------------------------------------------

def fft_golden(x: np.ndarray) -> np.ndarray:
    """Forward complex DFT, float64 — the spectral oracle."""
    return np.fft.fft(np.asarray(x, dtype=np.complex128))


def magnitude_golden(spec: np.ndarray) -> np.ndarray:
    """sqrt(re^2 + im^2) as the GUI computes it (fft_analyzer_gui.py:256-260)."""
    return np.sqrt(spec.real.astype(np.float64) ** 2 + spec.imag.astype(np.float64) ** 2)


def golden_pipeline(
    x: np.ndarray,
    sos: np.ndarray | None = None,
    zi: np.ndarray | None = None,
    window: str = "hann",
    n: int = N_DEFAULT,
):
    """Full intended-math chain on a stream: window -> IIR -> per-frame FFT.

    Mirrors the reference datapath order (SURVEY.md §3.2): the window phase
    counter runs over the *continuous* stream (mod ``n``), filtering follows
    windowing, and each consecutive n-sample frame is transformed.

    Returns dict with 'windowed', 'filtered', 'spectra' (F, n) complex,
    'magnitude' (F, n), and 'zf'.
    """
    x = np.asarray(x, dtype=np.float64)
    n_frames = len(x) // n
    x = x[: n_frames * n]
    if window == "hann":
        w = hann_true(n)
    elif window == "rtl":
        w = hann_rtl_effective(n)
    elif window in (None, "none", "rect"):
        w = np.ones(n)
    else:
        raise ValueError(f"unknown window {window!r}")
    xw = (x.reshape(n_frames, n) * w[None, :]).reshape(-1)
    if sos is not None:
        y, zf = sosfilt_golden(sos, xw, zi)
    else:
        y, zf = xw, zi
    frames = y.reshape(n_frames, n)
    spectra = np.fft.fft(frames, axis=-1)
    return {
        "windowed": xw,
        "filtered": y,
        "spectra": spectra,
        "magnitude": magnitude_golden(spectra),
        "zf": zf,
    }


def synth_tone(
    freq_hz: float = 100_000.0,
    n_samples: int = N_DEFAULT,
    fs: float = 1_000_000.0,
    amplitude: float = 0.5,
    noise: float = 0.0,
    seed: int = 0,
) -> np.ndarray:
    """The BASELINE config-1 stimulus: a synthetic tone at 1 MSPS."""
    t = np.arange(n_samples, dtype=np.float64) / fs
    x = amplitude * np.sin(2 * np.pi * freq_hz * t)
    if noise > 0:
        rng = np.random.default_rng(seed)
        x = x + noise * rng.standard_normal(n_samples)
    return x
