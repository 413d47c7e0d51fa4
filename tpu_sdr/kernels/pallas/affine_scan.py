"""Pallas TPU kernel: fused FM demodulation (discriminator + de-emphasis).

One streaming pass over HBM: each grid step reads a (C, W) tile of the
re/im baseband planes, computes the quadrature discriminator, the
deviation scale, and the one-pole de-emphasis IN VMEM, and writes the
audio tile — 12 bytes of HBM traffic per sample total. The carried
state (previous complex sample + filter state, 3 floats per channel)
lives in VMEM scratch across the sequential TPU grid.

The recurrence inside a tile uses the SAME canonical structure as the
XLA path (``kernels/demod._affine_prefix_raw``): a Hillis-Steele prefix
over fixed 128-sample blocks (implemented with ``pltpu.roll`` + lane
masks instead of pads) followed by a sequential per-block chain
(``lax.fori_loop`` carrying one float per channel) — so the pallas
path's own chunked == one-shot contract holds at the same 128-sample
granularity.

Motivation: the XLA path measured 0.98 ms per 8.4-Msample dispatch
(~8.5 GSPS) — ~8x above the ~0.12 ms HBM floor, because the prefix's
shifted pads materialize intermediate (G, L) arrays. This kernel is the
floor experiment; see docs/ARCHITECTURE.md for the measured verdict.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_L = 128  # the canonical affine block (matches kernels/demod)

# atan(r) ~= r * P(r^2) on [0, 1]: near-minimax least-squares fit at 4000
# Chebyshev nodes, degree-17 odd polynomial; max |err| 1.3e-7 in f32 Horner
# (validated on a 200k grid). Mosaic has no atan2 lowering on this backend
# ("Unimplemented primitive in Pallas TPU lowering ... atan2", verified via
# cross-platform .lower()), so the kernel carries its own octant-reduced
# implementation.
_ATAN_C = (
    9.999999055e-01, -3.333265785e-01, 1.998653749e-01, -1.416433338e-01,
    1.050731979e-01, -7.247950662e-02, 3.989956004e-02, -1.445869707e-02,
    2.468246625e-03,
)


def _signbit(v):
    """IEEE sign bit via bitcast (jnp.signbit has no Mosaic story; `v < 0`
    misses -0.0, which the discriminator's zero-state first sample hits:
    arctan2(+-0, -0) must be +-pi to match the XLA forward)."""
    return jax.lax.bitcast_convert_type(v, jnp.int32) < 0


def _atan2_poly(y, x):
    """Octant-reduced atan2 for in-kernel use (elementwise VPU ops only).

    Matches IEEE signed-zero semantics (atan2(+-0, -0) = +-pi,
    atan2(+-0, +0) = +-0) so the kernel agrees with the XLA forward's
    jnp.arctan2 on the zero-state first sample."""
    ax, ay = jnp.abs(x), jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    r = lo / jnp.where(hi > 0, hi, jnp.float32(1.0))
    r2 = r * r
    p = jnp.float32(_ATAN_C[-1])
    for c in _ATAN_C[-2::-1]:
        p = p * r2 + jnp.float32(c)
    a = p * r
    a = jnp.where(ay > ax, jnp.float32(np.pi / 2) - a, a)
    a = jnp.where(_signbit(x), jnp.float32(np.pi) - a, a)
    return jnp.where(_signbit(y), -a, a)


def _fm_kernel(re_ref, im_ref, pr_ref, pi_ref, y0_ref, out_ref,
               spr, spi, sy, *, rows, fs, dev, pole):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        spr[:] = pr_ref[:]
        spi[:] = pi_ref[:]
        sy[:] = y0_ref[:]

    re_t = re_ref[:]  # (C, W), W = rows * 128
    im_t = im_ref[:]
    c = re_t.shape[0]
    re1 = jnp.concatenate([spr[:], re_t[:, :-1]], axis=-1)
    im1 = jnp.concatenate([spi[:], im_t[:, :-1]], axis=-1)
    dot = re_t * re1 + im_t * im1
    cross = im_t * re1 - re_t * im1
    audio = _atan2_poly(cross, dot) * jnp.float32(fs / (2.0 * np.pi))
    audio = audio * jnp.float32(1.0 / dev)
    spr[:] = re_t[:, -1:]
    spi[:] = im_t[:, -1:]

    if pole is None:
        out_ref[:] = audio
        return

    a_c = jnp.float32(pole)
    b = (1.0 - a_c) * audio
    # In-block Hillis-Steele over each 128-lane block (canonical tree).
    A = jnp.full(b.shape, a_c, jnp.float32)
    B = b.reshape(c, rows, _L)
    A = A.reshape(c, rows, _L)
    lane = jax.lax.broadcasted_iota(jnp.int32, (c, rows, _L), 2)
    d = 1
    while d < _L:
        A_e = jnp.where(lane >= d, pltpu.roll(A, d, 2), 1.0)
        B_e = jnp.where(lane >= d, pltpu.roll(B, d, 2), 0.0)
        A, B = A * A_e, A * B_e + B
        d *= 2

    # Sequential chain across the tile's blocks, writing each block's
    # audio as soon as its incoming state is known. Statically unrolled
    # with lax.slice_in_dim + reshape: Mosaic lowers neither dynamic_slice
    # on VALUES (fori_loop-carried index) nor jnp integer indexing (which
    # also traces to dynamic_slice); `rows` is a compile-time constant
    # anyway. y stays a (C, 1) column so every step is pure slice/reshape/
    # broadcast.
    y = sy[:]  # (C, 1)
    for r in range(rows):
        a_row = jax.lax.slice_in_dim(A, r, r + 1, axis=1).reshape(c, _L)
        b_row = jax.lax.slice_in_dim(B, r, r + 1, axis=1).reshape(c, _L)
        out_row = a_row * y + b_row  # (C, 128)
        out_ref[:, r * _L : (r + 1) * _L] = out_row
        y = jax.lax.slice_in_dim(out_row, _L - 1, _L, axis=1)
    sy[:] = y


@functools.partial(
    jax.jit,
    static_argnames=("fs", "dev", "pole", "rows_per_tile", "interpret"),
)
def fm_demod_pallas(re, im, prev_re, prev_im, y0, *, fs: float, dev: float,
                    pole, rows_per_tile: int = 64, interpret: bool = False):
    """Fused FM forward: (C, T) planes -> (audio (C, T), prev_re, prev_im,
    filt). T must be a multiple of rows_per_tile*128; semantics match
    ``kernels/demod._fm_forward``."""
    c, t = re.shape
    w = rows_per_tile * _L
    if t % w:
        raise ValueError(f"T={t} not a multiple of tile width {w}")
    grid = t // w
    y0col = y0[:, None]
    kernel = functools.partial(
        _fm_kernel, rows=rows_per_tile, fs=fs, dev=dev, pole=pole)
    audio = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((c, w), lambda i: (0, i)),
            pl.BlockSpec((c, w), lambda i: (0, i)),
            pl.BlockSpec((c, 1), lambda i: (0, 0)),
            pl.BlockSpec((c, 1), lambda i: (0, 0)),
            pl.BlockSpec((c, 1), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((c, w), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((c, t), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((c, 1), jnp.float32),
            pltpu.VMEM((c, 1), jnp.float32),
            pltpu.VMEM((c, 1), jnp.float32),
        ],
        interpret=interpret,
    )(re, im, prev_re, prev_im, y0col)
    # Final carried state: last samples + the filter value at T-1.
    prev_re_f = re[:, -1:]
    prev_im_f = im[:, -1:]
    filt_f = audio[:, -1] if pole is not None else y0
    return audio, prev_re_f, prev_im_f, filt_f
