"""Streaming fast convolution (overlap-save) FIR engine.

Capability extension — the reference's only filters are the two 12th-order
IIR cascades (`imp/filter_iir12.vhd`, `src/filter_iir12_cust.vhd`); it has
no FIR datapath at all (the FIR constants in `imp/filter_pkg.vhd:19-27`
are dead code). The framework's other FIR ops are structural specialists:
the PFB fold (M-channel), the DDC (decimating), the Resampler (L/M).
This module is the general case: ONE long FIR at unit rate — brick-wall
channel masks, matched filters, Hilbert transformers, arbitrary
frequency-sampled designs with thousands of taps.

TPU-first mapping: overlap-save through the four-step DFT
(`kernels/fft.fft_4step`), so the whole filter is three MXU matmul pairs
per block regardless of tap count — O(n1+n2) multiplies per sample
instead of O(L). Blocks are gathered with the same static-iota indexing
as the Welch PSD (XLA lowers it to strided loads), the tap spectrum is a
host-precomputed float64 DFT, and the only carried state is the
(nfft - block) input tail.

Streaming contract (the framework invariant): the block grid is absolute
— block i always covers input samples [i*block - history, i*block + block)
regardless of how the stream was chunked — so chunked processing is
**bitwise** identical to one-shot, at `chunk_granularity` = block
granularity. Output matches ``scipy.signal.lfilter(h, 1, x)`` (causal,
zero initial conditions) to FFT-roundtrip precision.

Real taps filter real streams (`process`) or IQ planes (`process_planes`,
each plane independently — a real impulse response commutes with re/im).
Complex taps (analytic / single-sideband / frequency-offset designs) take
the planes path and mix the planes through the full complex multiply.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.lax import Precision

from tpu_sdr.kernels import fft

_PRECISION = {
    "bf16": Precision.DEFAULT,
    "f32": Precision.HIGH,
    "f32max": Precision.HIGHEST,
}

# near-square four-step factorizations (each factor <= 256 keeps the DFT
# matrices at MXU-tile scale)
_NFFT_PLANS = {
    1024: (32, 32),
    2048: (64, 32),
    4096: (64, 64),
    8192: (128, 64),
    16384: (128, 128),
    32768: (256, 128),
    65536: (256, 256),
}


def _auto_nfft(n_taps: int) -> int:
    """Smallest planned size with a valid-block fraction >= 3/4 (block =
    nfft - L + 1 >= 3L keeps redundant overlap work under ~33%)."""
    biggest = max(_NFFT_PLANS)
    for n in sorted(_NFFT_PLANS):
        if n - n_taps + 1 >= 3 * n_taps:
            return n
    if biggest - n_taps + 1 >= 1:
        return biggest
    raise ValueError(
        f"{n_taps} taps exceed the largest planned FFT ({biggest}); "
        f"cascade shorter sections instead")


class FastFIRState:
    """Carried input tail: the ``history`` samples preceding the next
    chunk (per plane for IQ), plus the absolute sample offset."""

    def __init__(self, tail, offset: int = 0):
        self.tail = tail
        self.offset = int(offset)

    def to_numpy(self) -> dict:
        return {"tail": np.asarray(self.tail), "offset": np.int64(self.offset)}

    @classmethod
    def from_numpy(cls, d: dict) -> "FastFIRState":
        return cls(jnp.asarray(d["tail"]), int(d["offset"]))


@functools.partial(jax.jit, static_argnames=("block", "history", "cplx",
                                             "precision"))
def _fastfir_forward(xr, xi, tail_r, tail_i, hr, hi, plan, *, block: int,
                     history: int, cplx: bool, precision):
    lead = xr.shape[:-1]
    t = xr.shape[-1]
    nfft = block + history
    nb = t // block
    idx = (jnp.arange(nb)[:, None] * block + jnp.arange(nfft)[None, :])
    buf_r = jnp.concatenate([tail_r, xr], axis=-1)
    fr = buf_r[..., idx]  # (..., nb, nfft)
    if cplx:
        buf_i = jnp.concatenate([tail_i, xi], axis=-1)
        fi = buf_i[..., idx]
        Xr, Xi = fft.fft_4step(fr, fi, plan, precision=precision)
    else:
        Xr, Xi = fft.fft_4step(fr, None, plan, precision=precision)
    Yr = Xr * hr - Xi * hi
    Yi = Xr * hi + Xi * hr
    yr, yi = fft.ifft_4step(Yr, Yi, plan, precision=precision)
    out_r = yr[..., history:].reshape(*lead, t)
    new_tail_r = buf_r[..., t:]
    if cplx:
        out_i = yi[..., history:].reshape(*lead, t)
        new_tail_i = buf_i[..., t:]
        return out_r, out_i, new_tail_r, new_tail_i
    return out_r, new_tail_r


class FastFIR:
    """Streaming overlap-save FIR (``scipy.signal.lfilter(h, 1, x)``
    semantics, zero initial conditions).

    ``fir``: real or complex taps (any length up to 49152 for the
    largest planned FFT; cascade beyond that). ``nfft``: DFT size from
    {1024, 2048, ..., 65536}; default picks the smallest size whose
    valid-block fraction is >= 3/4. ``block``: samples produced per DFT
    frame — defaults to the maximum ``nfft - len(fir) + 1``; smaller
    values trade efficiency for a rounder `chunk_granularity`. ``dtype``
    selects the quality tier (bf16 / f32 / f32max dot precision).

    Chunk lengths must be multiples of ``chunk_granularity``; chunked
    processing is bitwise identical to one-shot for any chunk mix.
    """

    def __init__(self, fir, nfft: int | None = None,
                 block: int | None = None, dtype: str = "f32max"):
        h = np.asarray(fir).reshape(-1)
        if h.size < 2:
            raise ValueError(f"need at least 2 taps; got {h.size}")
        self.complex_taps = bool(np.iscomplexobj(h))
        h = h.astype(np.complex128 if self.complex_taps else np.float64)
        if nfft is None:
            nfft = _auto_nfft(h.size)
        if nfft not in _NFFT_PLANS:
            raise ValueError(
                f"nfft must be one of {sorted(_NFFT_PLANS)}; got {nfft}")
        max_block = nfft - h.size + 1
        if max_block < 1:
            raise ValueError(
                f"{h.size} taps do not fit an nfft={nfft} overlap-save "
                f"frame (need nfft >= taps)")
        if block is None:
            block = max_block
        if not 1 <= block <= max_block:
            raise ValueError(
                f"block must be in [1, {max_block}] for nfft={nfft} and "
                f"{h.size} taps; got {block}")
        self.fir = h
        self.nfft = int(nfft)
        self.block = int(block)
        self.history = self.nfft - self.block
        n1, n2 = _NFFT_PLANS[self.nfft]
        self._plan = fft.plan_constants(n1, n2)
        self._precision = _PRECISION[dtype]
        H = np.fft.fft(h, self.nfft)
        self._hr = jnp.asarray(H.real, jnp.float32)
        self._hi = jnp.asarray(H.imag, jnp.float32)

    @property
    def chunk_granularity(self) -> int:
        return self.block

    def initial_state(self, batch_shape: tuple = (),
                      iq: bool | None = None) -> FastFIRState:
        """Zero history. ``iq=True`` (implied by complex taps) makes the
        tail (2, *batch_shape, history) for the planes path."""
        if iq is None:
            iq = self.complex_taps
        shape = tuple(batch_shape) + (self.history,)
        if iq:
            shape = (2,) + shape
        return FastFIRState(jnp.zeros(shape, jnp.float32), 0)

    def _check(self, shape, state: FastFIRState, planes: bool):
        t = shape[-1]
        if t % self.block:
            raise ValueError(
                f"chunk length {t} not a multiple of "
                f"chunk_granularity={self.block}")
        want = tuple(shape[:-1]) + (self.history,)
        if tuple(state.tail.shape) != want:
            raise ValueError(
                f"state shape {tuple(state.tail.shape)} != {want}")

    def process(self, x, state: FastFIRState):
        """Real stream (..., T) -> (filtered (..., T), new state).
        Real taps only — complex taps produce complex output; feed
        ``process_planes`` with a zero imaginary plane instead."""
        if self.complex_taps:
            raise ValueError(
                "complex taps produce IQ output; use process_planes")
        x = jnp.asarray(x, jnp.float32)
        self._check(x.shape, state, planes=False)
        out, tail = _fastfir_forward(
            x, None, state.tail, None, self._hr, self._hi, self._plan,
            block=self.block, history=self.history, cplx=False,
            precision=self._precision)
        return out, FastFIRState(tail, state.offset + x.shape[-1])

    def process_planes(self, planes, state: FastFIRState):
        """IQ planes (2, ..., T) -> (planes (2, ..., T), new state).
        Real taps filter each plane independently; complex taps apply
        the full complex response."""
        planes = jnp.asarray(planes, jnp.float32)
        if planes.shape[0] != 2:
            raise ValueError(f"planes must be (2, ..., T); got "
                             f"{tuple(planes.shape)}")
        self._check(planes.shape, state, planes=True)
        out_r, out_i, tail_r, tail_i = _fastfir_forward(
            planes[0], planes[1], state.tail[0], state.tail[1],
            self._hr, self._hi, self._plan,
            block=self.block, history=self.history, cplx=True,
            precision=self._precision)
        return (jnp.stack([out_r, out_i]),
                FastFIRState(jnp.stack([tail_r, tail_i]),
                             state.offset + planes.shape[-1]))
