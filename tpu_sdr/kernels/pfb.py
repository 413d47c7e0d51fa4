"""Polyphase filter-bank (PFB) channelizer — capability extension.

The FPGA reference analyzes the whole band with one monolithic 16K FFT
(``ip/xfft_0``); a PFB channelizer is the standard SDR / radio-astronomy
front-end that splits the band into M critically-decimated subchannels
whose per-channel leakage is set by a P·M-tap prototype FIR instead of a
bare FFT bin (tens of dB better adjacent-channel rejection).

Formulation (weighted overlap-fold, the classic polyphase spectrometer):
for output step n over input x at rate fs,

    block_n = x[nM : nM + P·M]              (slides by M — critically sampled)
    folded_n[p] = sum_t  h[tM + p] * block_n[tM + p]     (p = 0..M-1)
    Y[n, k]   = sum_p  folded_n[p] * exp(-2j*pi*k*p / M)

Channel k is centered at k*fs/M (wrapping to negative frequencies for IQ
input) and decimated to fs/M.

TPU-first mapping:
- the branch filtering is P shifted elementwise multiply-accumulates over
  a (steps, M) layout — VPU work, O(P) per sample;
- the M-point DFT across branches is a dense (steps, M) @ (M, M) matmul —
  MXU work; the default M=128 is exactly one MXU tile;
- streaming state is the last (P−1)·M input samples (the block overlap),
  so chunked processing is bit-identical to one-shot (tested).

Real input costs 2 matmuls (cos/sin), IQ input 4; complex dtypes never
reach the device (re/im planes, like the rest of the framework).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

Precision = jax.lax.Precision

_PRECISION = {
    "f32": Precision.HIGH,
    "f32max": Precision.HIGHEST,
    "bf16": Precision.DEFAULT,
}


def design_prototype(m: int, taps: int, window: str = "hamming") -> np.ndarray:
    """Lowpass prototype FIR, length taps*m, cutoff fs/(2M), unit DC gain.

    The same windowed-sinc design scipy.signal.firwin produces; computed
    directly (f64) so the coefficient contract is explicit.
    """
    import scipy.signal as sps

    n = taps * m
    h = sps.firwin(n, cutoff=1.0 / m, window=window, scale=False)
    return (h / h.sum()).astype(np.float64)


def dft_matrices(m: int) -> tuple[np.ndarray, np.ndarray]:
    """(cos, sin) with W[p, k] = exp(-2j*pi*p*k/m) = cos[p,k] - 1j*sin[p,k].

    Built in float64 then rounded once to float32 (same discipline as the
    FFT kernel's twiddles).
    """
    pk = np.outer(np.arange(m), np.arange(m)) % m
    ang = 2.0 * np.pi * pk / m
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _fold(x, h2, taps: int, m: int):
    """(…, (steps+taps−1)·m) windowed fold -> (…, steps, m)."""
    rows = x.reshape(x.shape[:-1] + (-1, m))
    steps = rows.shape[-2] - (taps - 1)
    acc = rows[..., 0:steps, :] * h2[0]
    for t in range(1, taps):
        acc = acc + rows[..., t : t + steps, :] * h2[t]
    return acc


@functools.partial(
    jax.jit,
    static_argnames=("taps", "m", "precision", "iq", "use_pallas", "kprec"),
)
def _forward(
    cat,
    h2,
    cos,
    sin,
    taps: int,
    m: int,
    precision,
    iq: bool,
    use_pallas: bool = False,
    kprec: str = "highest",
):
    """Windowed fold + M-point DFT; returns (re, im, new_state)."""
    if use_pallas and m == 128:
        # fused Pallas kernel: fold + both DFT matmuls in VMEM
        # (kernels/pallas/pfb_kernel.py); emits A = f@cos, B = f@sin
        from tpu_sdr.kernels.pallas.pfb_kernel import pfb_fold_dft

        rows = cat.reshape(cat.shape[:-1] + (-1, m))
        lead = rows.shape[:-2]
        flat = rows.reshape((-1,) + rows.shape[-2:])
        a, b = pfb_fold_dft(
            flat, h2, cos, sin, taps, m,
            interpret=jax.default_backend() == "cpu",
            precision=kprec,
            neg_b=not iq,  # real input reads (A, -B) straight as (re, im)
        )
        a = a.reshape(lead + a.shape[-2:])
        b = b.reshape(lead + b.shape[-2:])
        if iq:
            re = a[0] + b[1]
            im = a[1] - b[0]
        else:
            re, im = a, b
    else:
        folded = _fold(cat, h2, taps, m)
        if iq:
            fr, fi = folded[0], folded[1]
            # (fr + j fi) @ (cos − j sin)
            re = jnp.matmul(fr, cos, precision=precision) + jnp.matmul(
                fi, sin, precision=precision
            )
            im = jnp.matmul(fi, cos, precision=precision) - jnp.matmul(
                fr, sin, precision=precision
            )
        else:
            re = jnp.matmul(folded, cos, precision=precision)
            im = -jnp.matmul(folded, sin, precision=precision)
    hist = (taps - 1) * m
    new_state = cat[..., cat.shape[-1] - hist :]
    return re, im, new_state


class Channelizer:
    """Streaming M-channel critically-sampled PFB.

    Accepts real ``(…, T)`` arrays or pre-split IQ planes ``(2, …, T)``
    via :meth:`process_planes`; ``T`` must be a multiple of ``m``. Returns
    ``{"re", "im"}`` (and ``"magnitude"`` when requested) of shape
    ``(…, T//m, m)`` plus the carried state.
    """

    def __init__(
        self,
        m: int = 128,
        taps: int = 8,
        window: str = "hamming",
        dtype: str = "f32",
        sample_rate: float = 1_000_000.0,
        use_pallas: bool = False,
    ):
        if m < 2 or taps < 1:
            raise ValueError(f"need m >= 2, taps >= 1; got m={m}, taps={taps}")
        if dtype not in _PRECISION:
            raise ValueError(f"dtype must be one of {list(_PRECISION)}")
        self.m = m
        self.taps = taps
        self.window = window
        self.dtype = dtype
        self.sample_rate = sample_rate
        self.history_len = (taps - 1) * m
        self.prototype = design_prototype(m, taps, window)
        self._h2 = jnp.asarray(self.prototype.reshape(taps, m), jnp.float32)
        cos, sin = dft_matrices(m)
        self._cos, self._sin = jnp.asarray(cos), jnp.asarray(sin)
        self._precision = _PRECISION[dtype]
        # Pallas kernel precision: Mosaic exposes default/highest only; the
        # kernel is HBM-bound so the f32 tier keeps exact-f32 dots for free.
        self.use_pallas = use_pallas
        self._kprec = "default" if dtype == "bf16" else "highest"

    @property
    def channel_hz(self) -> float:
        """Subchannel spacing (and output rate): fs / M."""
        return self.sample_rate / self.m

    def initial_state(self, batch_shape: tuple = ()) -> jnp.ndarray:
        """Zero history: the last (taps−1)·m input samples."""
        return jnp.zeros(tuple(batch_shape) + (self.history_len,), jnp.float32)

    def _check(self, x, state):
        if x.shape[-1] % self.m:
            raise ValueError(
                f"input length {x.shape[-1]} not a multiple of m={self.m}"
            )
        want = x.shape[:-1] + (self.history_len,)
        if tuple(state.shape) != want:
            raise ValueError(f"state shape {tuple(state.shape)} != {want}")

    def process(self, x, state, outputs: str = "complex"):
        """Real-input channelization. Returns (dict, new_state)."""
        x = jnp.asarray(x, jnp.float32)
        self._check(x, state)
        cat = jnp.concatenate([state, x], axis=-1)
        re, im, new_state = _forward(
            cat, self._h2, self._cos, self._sin,
            self.taps, self.m, self._precision, iq=False,
            use_pallas=self.use_pallas, kprec=self._kprec,
        )
        return self._pack(re, im, outputs), new_state

    def process_planes(self, xs, state_planes, outputs: str = "complex"):
        """IQ-input channelization: ``xs`` is (2, …, T) re/im planes (split
        on the host — complex dtypes never reach the device), state is the
        matching (2, …, history) stack."""
        xs = jnp.asarray(xs, jnp.float32)
        self._check(xs[0], state_planes[0])
        cat = jnp.concatenate([state_planes, xs], axis=-1)
        re, im, new_state = _forward(
            cat, self._h2, self._cos, self._sin,
            self.taps, self.m, self._precision, iq=True,
            use_pallas=self.use_pallas, kprec=self._kprec,
        )
        return self._pack(re, im, outputs), new_state

    @staticmethod
    def _pack(re, im, outputs: str) -> dict:
        if outputs not in ("complex", "magnitude", "all"):
            raise ValueError(f"unknown outputs {outputs!r}")
        out = {}
        if outputs in ("complex", "all"):
            out["re"], out["im"] = re, im
        if outputs in ("magnitude", "all"):
            out["magnitude"] = jnp.sqrt(re * re + im * im)
        return out
