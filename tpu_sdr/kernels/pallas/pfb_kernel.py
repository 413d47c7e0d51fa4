"""Pallas TPU kernel: fused PFB fold + M-point DFT.

This kernel keeps a group of G output steps resident in VMEM: one read
of the group's rows (+ a (taps−1)-row halo), the weighted overlap-fold,
and both DFT matmuls happen in-core; HBM traffic per sample is one
4-byte read and two 4-byte writes.

**Measured: performance-NEUTRAL vs the XLA fold+matmul path** (see
docs/ARCHITECTURE.md "PFB channelizer"). XLA already keeps the op near
its HBM floor (~0.23 ms per 8.4-Msample dispatch, ≈1.9x floor, ~30+
GSPS); a 5-variant interleaved in-process A/B put every pallas/XLA ×
precision combination inside the ±50% co-tenancy noise band. The
channelizer therefore defaults to ``use_pallas=False``; this kernel
stays available (and tested, CPU-interpret + Mosaic-on-chip) for
HBM-constrained fusion contexts.

Overlap trick: the fold window for group g spans rows
[g·G, g·G + G + taps − 2] — an overlapping slide that plain BlockSpec
indexing cannot express (block offsets are multiples of the block shape).
The SAME rows array is therefore passed twice: once blocked (1, G, m) at
row-block g (the body), once blocked (1, HALO_PAD, m) at row offset
(g+1)·G (the halo — an integral block index because G % HALO_PAD == 0).
Mosaic double-buffers both streams across grid steps; no manual DMA.

The kernel emits A = folded @ cos and B = folded @ sin; the caller
combines them into re/im (real input: re = A, im = −B; IQ planes:
re = Aᵣ + Bᵢ, im = Aᵢ − Bᵣ) — elementwise XLA work that fuses into
consumers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _halo_pad(taps: int) -> int:
    """Halo block rows: taps−1 rounded up to the f32 sublane tile (8)."""
    return max(8, ((taps - 1 + 7) // 8) * 8)


def _pfb_kernel(
    x_ref, halo_ref, h2_ref, cos_ref, sin_ref, a_ref, b_ref,
    *, taps, g, precision, neg_b,
):
    xm = x_ref[0]  # (G, m)
    if taps > 1:
        full = jnp.concatenate([xm, halo_ref[0][: taps - 1]], axis=0)
    else:
        full = xm
    acc = full[0:g] * h2_ref[0]
    for t in range(1, taps):
        acc = acc + full[t : t + g] * h2_ref[t]
    a_ref[0] = jnp.dot(
        acc, cos_ref[:], preferred_element_type=jnp.float32, precision=precision
    )
    bb = jnp.dot(
        acc, sin_ref[:], preferred_element_type=jnp.float32, precision=precision
    )
    # real input consumes (A, -B) directly as (re, im): the sign flip here
    # saves a whole XLA negation pass over the output in HBM
    b_ref[0] = -bb if neg_b else bb


@functools.partial(
    jax.jit,
    static_argnames=("taps", "m", "group", "interpret", "precision", "neg_b"),
)
def pfb_fold_dft(
    rows: jnp.ndarray,
    h2: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    taps: int,
    m: int,
    group: int = 256,
    interpret: bool = False,
    precision: str = "highest",
    neg_b: bool = False,
):
    """rows (B, R, m) with R = steps + taps − 1 (history included) ->
    (A, B) each (B, steps, m) where A = folded @ cos and B = folded @ sin
    (negated in-kernel when ``neg_b``)."""
    b, r, _ = rows.shape
    steps = r - (taps - 1)
    hp = _halo_pad(taps)
    # group size: MUST be a multiple of the halo block (the halo BlockSpec
    # index (j+1)*(g//hp) is only correct when hp | g), no larger than needed
    g = max(hp, min(group, (steps + hp - 1) // hp * hp) // hp * hp)
    steps_pad = ((steps + g - 1) // g) * g
    r_need = steps_pad + hp
    if r_need > r:
        rows = jnp.pad(rows, ((0, 0), (0, r_need - r), (0, 0)))
    grid = (b, steps_pad // g)

    main_spec = pl.BlockSpec(
        (1, g, m), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )
    halo_spec = pl.BlockSpec(
        (1, hp, m),
        lambda i, j, _g=g // hp: (i, (j + 1) * _g, 0),
        memory_space=pltpu.VMEM,
    )
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i, j: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, g, m), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )
    a, bb = pl.pallas_call(
        functools.partial(
            _pfb_kernel, taps=taps, g=g, precision=precision, neg_b=neg_b
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, steps_pad, m), jnp.float32),
            jax.ShapeDtypeStruct((b, steps_pad, m), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            main_spec,
            halo_spec,
            const((taps, m)),
            const((m, m)),
            const((m, m)),
        ],
        out_specs=(out_spec, out_spec),
        interpret=interpret,
    )(rows, rows, h2, cos, sin)
    return a[:, :steps], bb[:, :steps]
