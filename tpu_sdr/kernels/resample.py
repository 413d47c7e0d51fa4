"""Streaming polyphase rational resampler (upsample L / downsample M).

Capability extension — the reference has no rate conversion at all: its
chain is pinned to the XADC's 1 MSPS (`ip/xadc_wiz_0/xadc_wiz_0.xci:24`)
and every consumer runs at that rate. A real SDR needs arbitrary rational
rate changes (audio output rates, symbol-rate matching), so this module
provides the classic polyphase L/M resampler as a streaming TPU op.

Math (the ``scipy.signal.upfirdn(h, x, L, M)`` golden model, zero initial
conditions):

    out[m] = sum_k h[k] * xup[m*M - k]        xup = zero-stuffed-by-L x
           = sum_j h[(m*M mod L) + j*L] * x[floor(m*M/L) - j]

TPU-first mapping: with L, M coprime (common factors are reduced) and the
chunk length T a multiple of M, the chunk produces exactly O = T*L/M
outputs and the polyphase phase pattern restarts identically every chunk
(phase of the chunk's first output is (m0*M) mod L = (offset*L) mod L = 0).
Outputs are grouped into L phase classes; each class is P shifted
stride-M slices of the input (VPU multiply-accumulates, no per-sample
loop, no gathers), interleaved back with one reshape. Carried state is
the last P-1 input samples, so chunked processing is bit-identical to
one-shot (tested), and the emit order per output is a fixed j-loop so
the result is also invariant to how the stream was chunked.

The FIR cost is O(taps/L) MACs per OUTPUT sample — the polyphase
decomposition never multiplies by stuffed zeros. Trace size grows with
L*P static slices; for very large L (> ~256 phases) prefer a cascade of
smaller stages.
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp


def design_resample_fir(
    up: int, down: int, taps_per_phase: int = 8, window: str = "hamming"
) -> np.ndarray:
    """Anti-imaging/anti-alias lowpass for an L/M resampler: length
    taps_per_phase * L, cutoff min(1/L, 1/M) (normalized to Nyquist),
    passband gain L so the zero-stuffed signal keeps unit amplitude
    (the ``scipy.signal.resample_poly`` gain convention). float64."""
    import scipy.signal as sps

    g = math.gcd(int(up), int(down))
    up, down = int(up) // g, int(down) // g
    if up == 1 and down == 1:
        return np.ones(1)
    h = sps.firwin(taps_per_phase * up, 1.0 / max(up, down), window=window)
    return (up * h / h.sum()).astype(np.float64)


@functools.partial(jax.jit, static_argnames=("up", "down", "p"))
def _resample_forward(x, tail, h, up: int, down: int, p: int):
    """One chunk: x (..., T) with T % down == 0, tail (..., p-1) input
    history. h: (p*up,) float32 FIR. Returns (out (..., T*up/down),
    new_tail)."""
    t = x.shape[-1]
    hist = p - 1
    cat = jnp.concatenate([tail, x], axis=-1) if hist else x
    k_steps = t // down  # outputs per phase class
    classes = []
    for c in range(up):
        # output m = c + k*up taps x at floor(m*down/up) - j with FIR
        # phase (m*down) mod up — constants below are Python ints, so
        # every slice is static.
        phase = (c * down) % up
        off = (c * down) // up
        acc = None
        for j in range(p):
            start = hist + off - j
            seg = jax.lax.slice_in_dim(
                cat, start, start + (k_steps - 1) * down + 1, stride=down, axis=-1
            )
            term = seg * h[phase + j * up]
            acc = term if acc is None else acc + term
        classes.append(acc)
    # classes[c][..., k] is output index k*up + c -> (..., K, up) -> (..., O)
    out = jnp.stack(classes, axis=-1).reshape(*x.shape[:-1], k_steps * up)
    new_tail = cat[..., cat.shape[-1] - hist :] if hist else tail
    return out, new_tail


class ResamplerState:
    """Streaming state: input-sample tail (device) + absolute input
    offset (host integer)."""

    def __init__(self, tail, offset: int = 0):
        self.tail = tail
        self.offset = int(offset)

    def to_numpy(self) -> dict:
        return {"tail": np.asarray(self.tail), "offset": np.int64(self.offset)}

    @classmethod
    def from_numpy(cls, d: dict) -> "ResamplerState":
        return cls(jnp.asarray(d["tail"]), int(d["offset"]))


class Resampler:
    """Streaming rational L/M resampler (output rate = fs * L/M).

    ``fir=None`` designs a ``design_resample_fir`` lowpass (gain L).
    Common factors of (up, down) are reduced; chunk lengths must be
    multiples of the reduced M. Works on any leading batch shape —
    stack IQ as a leading (2, ...) plane axis to resample complex
    streams (complex dtypes never reach the device)."""

    def __init__(
        self,
        up: int = 1,
        down: int = 1,
        fir: np.ndarray | None = None,
        taps_per_phase: int = 8,
        window: str = "hamming",
    ):
        if up < 1 or down < 1:
            raise ValueError(f"up/down must be >= 1; got {up}/{down}")
        g = math.gcd(int(up), int(down))
        self.up = int(up) // g
        self.down = int(down) // g
        if fir is None:
            fir = design_resample_fir(self.up, self.down, taps_per_phase, window)
        h = np.asarray(fir, np.float64).reshape(-1)
        if h.size % self.up:
            h = np.pad(h, (0, self.up - h.size % self.up))
        self.fir = h
        self.p = h.size // self.up  # taps per phase
        self._h = jnp.asarray(h, jnp.float32)

    @property
    def history_len(self) -> int:
        return self.p - 1

    def rate_out(self, fs: float) -> float:
        return fs * self.up / self.down

    def out_len(self, t: int) -> int:
        if t % self.down:
            raise ValueError(f"chunk length {t} not a multiple of M={self.down}")
        return t * self.up // self.down

    def initial_state(self, batch_shape: tuple = ()) -> ResamplerState:
        z = jnp.zeros(tuple(batch_shape) + (self.history_len,), jnp.float32)
        return ResamplerState(z, 0)

    def process(self, x, state: ResamplerState):
        """x (..., T), T % M == 0 -> (out (..., T*L/M), new state)."""
        t = x.shape[-1]
        self.out_len(t)  # validates T % M
        want = tuple(x.shape[:-1]) + (self.history_len,)
        if tuple(state.tail.shape) != want:
            raise ValueError(f"state shape {tuple(state.tail.shape)} != {want}")
        out, tail = _resample_forward(
            jnp.asarray(x, jnp.float32),
            state.tail,
            self._h,
            up=self.up,
            down=self.down,
            p=self.p,
        )
        return out, ResamplerState(tail, state.offset + t)
