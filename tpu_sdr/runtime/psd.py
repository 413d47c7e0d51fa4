"""Welch averaged-periodogram PSD estimation (capability extension).

The reference GUI displays raw single-frame magnitudes
(``scripts/fft_analyzer_gui.py:250-260``); a production analyzer needs
calibrated, variance-reduced spectra. ``WelchPSD`` implements
``scipy.signal.welch`` semantics on-device: overlapped segmentation,
per-segment constant detrend, windowing, DFT via the four-step
``fft_4step`` (MXU matmuls), |X|^2 averaging (mean or bias-corrected
median) and density/spectrum scaling with the one-sided fold. The SciPy
function itself is the golden model (tests/test_psd.py, rel err ~1e-6).

Real input returns the one-sided PSD (nperseg//2 + 1 bins); IQ input
(re/im planes — complex dtypes never ship to the device) returns the
two-sided PSD in unshifted FFT bin order, exactly like
``scipy.signal.welch`` on a complex array.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.lax import Precision

from tpu_sdr.kernels import fft

_PRECISION = {
    "bf16": Precision.DEFAULT,
    "f32": Precision.HIGH,
    "f32max": Precision.HIGHEST,
}


def _balanced_factors(n: int) -> tuple[int, int]:
    """n = n1*n2 with n1 <= n2 as square as possible (MXU-friendly tiles)."""
    n1 = int(np.sqrt(n))
    while n1 > 1 and n % n1:
        n1 -= 1
    return n1, n // n1


def _median_bias(n: int) -> float:
    """Bias of the median of n chi^2_2 periodograms (scipy's correction)."""
    ii_2 = 2.0 * np.arange(1.0, (n - 1) // 2 + 1)
    return float(1.0 + np.sum(1.0 / (ii_2 + 1.0) - 1.0 / ii_2))


@functools.partial(
    jax.jit,
    static_argnames=(
        "nperseg", "step", "nseg", "detrend", "onesided", "average",
        "precision",
    ),
)
def _welch(
    xr,
    xi,
    w,
    plan,
    scale,
    nperseg: int,
    step: int,
    nseg: int,
    detrend: bool,
    onesided: bool,
    average: str,
    precision,
):
    """average: 'mean' | 'median' | 'none' (per-segment, (.., nseg, nfreq))."""
    idx = jnp.arange(nseg)[:, None] * step + jnp.arange(nperseg)[None, :]
    planes = (xr,) if xi is None else (xr, xi)
    frames = []
    for p in planes:
        f = p[..., idx]  # (..., nseg, nperseg)
        if detrend:
            f = f - jnp.mean(f, axis=-1, keepdims=True)
        frames.append(f * w)
    fr, fi = frames[0], (frames[1] if xi is not None else None)
    Xr, Xi = fft.fft_4step(fr, fi, plan, precision=precision)
    p2 = Xr * Xr + Xi * Xi
    if onesided:
        half = nperseg // 2 + 1
        p2 = p2[..., :half]
        # fold: double every bin except DC (and Nyquist when nperseg even)
        last = half - 1 if nperseg % 2 == 0 else half
        p2 = p2 * jnp.concatenate(
            [
                jnp.ones((1,), p2.dtype),
                jnp.full((last - 1,), 2.0, p2.dtype),
                jnp.ones((half - last,), p2.dtype),
            ]
        )
    if average == "median":
        est = jnp.median(p2, axis=-2) / _median_bias(nseg)
    elif average == "none":
        est = p2
    else:
        est = jnp.mean(p2, axis=-2)
    return est * scale


class WelchPSD:
    """Welch PSD estimator with ``scipy.signal.welch`` semantics.

    Parameters mirror SciPy: ``window`` is any ``scipy.signal.get_window``
    name/tuple (periodic, like SciPy's default ``fftbins=True``),
    ``noverlap`` defaults to ``nperseg // 2``, ``detrend`` supports
    ``"constant"``/``False``, ``scaling`` is ``"density"`` (V^2/Hz) or
    ``"spectrum"`` (V^2), ``average`` is ``"mean"`` or ``"median"``
    (bias-corrected). ``dtype`` selects the framework quality tier
    (bf16 / f32 / f32max dot precision).
    """

    def __init__(
        self,
        fs: float = 1_000_000.0,
        nperseg: int = 16384,
        noverlap: int | None = None,
        window="hann",
        detrend="constant",
        scaling: str = "density",
        average: str = "mean",
        dtype: str = "f32max",
    ):
        import scipy.signal as sps

        if noverlap is None:
            noverlap = nperseg // 2
        if not 0 <= noverlap < nperseg:
            raise ValueError(f"need 0 <= noverlap < nperseg; got {noverlap}")
        if scaling not in ("density", "spectrum"):
            raise ValueError(f"unknown scaling {scaling!r}")
        if average not in ("mean", "median"):
            raise ValueError(f"unknown average {average!r}")
        if detrend not in ("constant", False, None):
            raise ValueError(
                "detrend supports 'constant' or False (scipy's default and "
                f"the windowed-streaming case); got {detrend!r}"
            )
        self.fs = float(fs)
        self.nperseg = int(nperseg)
        self.noverlap = int(noverlap)
        self.step = self.nperseg - self.noverlap
        self.scaling = scaling
        self.average = average
        self.detrend = detrend == "constant"
        w = sps.get_window(window, nperseg, fftbins=True).astype(np.float64)
        self._w = jnp.asarray(w, jnp.float32)
        if scaling == "density":
            self._scale = 1.0 / (self.fs * float(np.sum(w * w)))
        else:
            self._scale = 1.0 / float(np.sum(w)) ** 2
        n1, n2 = _balanced_factors(nperseg)
        self._plan = fft.plan_constants(n1, n2)
        self._precision = _PRECISION[dtype]

    def segment_count(self, nsamples: int) -> int:
        if nsamples < self.nperseg:
            raise ValueError(
                f"need at least nperseg={self.nperseg} samples; got {nsamples}"
            )
        return (nsamples - self.noverlap) // self.step

    def frequencies(self, onesided: bool = True) -> np.ndarray:
        if onesided:
            return np.fft.rfftfreq(self.nperseg, 1.0 / self.fs)
        return np.fft.fftfreq(self.nperseg, 1.0 / self.fs)

    def _run(self, xr, xi, onesided: bool, average: str | None = None):
        nseg = self.segment_count(xr.shape[-1])
        return _welch(
            xr,
            xi,
            self._w,
            self._plan,
            jnp.float32(self._scale),
            nperseg=self.nperseg,
            step=self.step,
            nseg=nseg,
            detrend=self.detrend,
            onesided=onesided,
            average=self.average if average is None else average,
            precision=self._precision,
        )

    def compute(self, x) -> jnp.ndarray:
        """Real input (..., T) -> one-sided PSD (..., nperseg//2 + 1)."""
        if np.iscomplexobj(x):
            # a silent complex->float cast would fold negative-frequency
            # content onto the positive bins (review finding)
            raise ValueError(
                "complex (IQ) input: split re/im and use compute_iq"
            )
        return self._run(jnp.asarray(x, jnp.float32), None, onesided=True)

    def compute_iq(self, xr, xi) -> jnp.ndarray:
        """IQ planes (..., T) each -> two-sided PSD (..., nperseg),
        unshifted FFT bin order (scipy's complex-input convention)."""
        return self._run(
            jnp.asarray(xr, jnp.float32),
            jnp.asarray(xi, jnp.float32),
            onesided=False,
        )

    def segment_times(self, nsamples: int) -> np.ndarray:
        """Segment-center timestamps (scipy.signal.spectrogram's t)."""
        k = self.segment_count(nsamples)
        return (np.arange(k) * self.step + self.nperseg / 2.0) / self.fs

    def spectrogram(self, x, xi=None) -> jnp.ndarray:
        """Per-segment PSD, ``scipy.signal.spectrogram(mode='psd')``
        semantics: (..., T) -> Sxx (..., nfreq, nseg) — the frequency axis
        before time, like SciPy. Pair with ``frequencies()`` and
        ``segment_times()`` for the axes. ``xi`` switches to IQ planes
        (two-sided, unshifted)."""
        if np.iscomplexobj(x):
            raise ValueError(
                "complex (IQ) input: split re/im and pass them as (x, xi)"
            )
        sxx = self._run(
            jnp.asarray(x, jnp.float32),
            None if xi is None else jnp.asarray(xi, jnp.float32),
            onesided=xi is None,
            average="none",
        )
        return jnp.swapaxes(sxx, -1, -2)
