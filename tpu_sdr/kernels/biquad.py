"""12th-order IIR cascade as a blocked state-space system — the centerpiece.

The reference implements the filter as 6 cascaded second-order sections, each
a 1-sample feedback loop at 100 MHz (``imp/filter_iir12.vhd:38-137``,
``imp/filter_iir.vhd:83-105``). A TPU cannot profitably run a per-sample
recurrence; the TPU-native formulation (SURVEY.md §5.7, BASELINE north star)
recasts each section as a 2-state linear system and evaluates it blockwise:

Per section, in transposed direct-form II (matching ``scipy.signal.sosfilt``
state semantics):

    y[n]  = b0*x[n] + z1[n-1]
    z1[n] = b1*x[n] - a1*y[n] + z2[n-1]
    z2[n] = b2*x[n] - a2*y[n]

which is the linear system  z[n] = A z[n-1] + B x[n],  y[n] = C z[n-1] + D x[n]
with

    A = [[-a1, 1], [-a2, 0]],  B = [b1 - a1*b0, b2 - a2*b0],
    C = [1, 0],                D = b0.

For a block of L samples with incoming state z0:

    y    = T @ x  +  M @ z0          (T: LxL lower-triangular Toeplitz of the
                                      impulse response h; M[n] = C A^n)
    z_end = A^L z0 + P @ x           (P[:, k] = A^(L-1-k) B)

With L = 128 the ``T @ x`` term is an MXU-shaped matmul over a whole frame of
blocks at once; the only remaining recurrence is the *inter-block* 2-state
affine chain, evaluated in log depth with ``jax.lax.associative_scan``. The
per-sample feedback loop is gone entirely.

Exactness: in exact arithmetic this is identical to sample-by-sample TDF-II;
in float32 it differs only by reduction order (validated against SciPy in
tests/test_biquad.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Precision = jax.lax.Precision


def sos_to_statespace(sos: jnp.ndarray):
    """(S, 6) SOS rows [b0 b1 b2 a0 a1 a2] -> per-section (A, B, C, D).

    Returns A (S,2,2), B (S,2), C (S,2), D (S,). a0 is normalized away.
    """
    sos = jnp.asarray(sos, dtype=jnp.float32)
    a0 = sos[:, 3:4]
    b0, b1, b2 = (sos[:, i] / a0[:, 0] for i in range(3))
    a1, a2 = sos[:, 4] / a0[:, 0], sos[:, 5] / a0[:, 0]
    zeros = jnp.zeros_like(a1)
    ones = jnp.ones_like(a1)
    A = jnp.stack(
        [jnp.stack([-a1, ones], axis=-1), jnp.stack([-a2, zeros], axis=-1)],
        axis=-2,
    )
    B = jnp.stack([b1 - a1 * b0, b2 - a2 * b0], axis=-1)
    C = jnp.stack([ones, zeros], axis=-1)
    D = b0
    return A, B, C, D


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BlockedSOS:
    """Precomputed blocked operator for one SOS cascade.

    Leaves:
      T  (S, L, L)  lower-triangular Toeplitz impulse-response operators
      M  (S, L, 2)  initial-state injection: row n = C A^n
      P  (S, 2, L)  end-state forcing: column k = A^(L-1-k) B
      AL (S, 2, 2)  per-block state transition A^L
    Recomputed (cheaply, on device) at every coefficient upload — the
    runtime-reconfiguration analog of the reference's coefficient CDC path
    (``src/coeff_cdc.vhd``).
    """

    T: Any
    M: Any
    P: Any
    AL: Any

    @property
    def n_sections(self) -> int:
        return self.T.shape[0]

    @property
    def block(self) -> int:
        return self.T.shape[1]


def precompute(sos: jnp.ndarray, block: int = 128) -> BlockedSOS:
    """Build the blocked operator from SOS coefficients (jittable)."""
    A, B, C, D = sos_to_statespace(sos)
    L = block

    # Powers A^0 .. A^L, stacked: (L+1, S, 2, 2).
    def step(Ak, _):
        nxt = jnp.einsum("sij,sjk->sik", A, Ak)
        return nxt, Ak

    _, Aks = jax.lax.scan(step, jnp.broadcast_to(jnp.eye(2, dtype=A.dtype), A.shape), None, length=L + 1)

    # Impulse response h[0] = D, h[m] = C A^(m-1) B  (m = 1..L-1): (S, L)
    cab = jnp.einsum("sc,kscd,sd->ks", C, Aks[: L - 1], B)  # (L-1, S)
    h = jnp.concatenate([D[None, :], cab], axis=0).T  # (S, L)

    # Toeplitz: T[s, n, k] = h[s, n-k] for n >= k.
    n_idx = jnp.arange(L)[:, None]
    k_idx = jnp.arange(L)[None, :]
    delta = n_idx - k_idx  # (L, L)
    gathered = h[:, jnp.clip(delta, 0, L - 1)]  # (S, L, L)
    T = jnp.where(delta[None] >= 0, gathered, 0.0)

    # M[s, n, :] = C A^n : (S, L, 2)
    M = jnp.einsum("sc,nscd->snd", C, Aks[:L])

    # P[s, :, k] = A^(L-1-k) B : (S, 2, L)
    P = jnp.einsum("kscd,sd->sck", Aks[L - 1 :: -1], B)

    AL = Aks[L]
    return BlockedSOS(T=T, M=M, P=P, AL=AL)


def _affine_combine(left, right):
    """Compose affine maps: right after left. Elements: (mat, vec[...,2,1])."""
    m1, v1 = left
    m2, v2 = right
    return m2 @ m1, m2 @ v1 + v2


def _block_state_chain(AL, f, z0, frame_blocks: int):
    """Solve z_end[g] = AL z_in[g] + f[g] over g = 0..G-1 hierarchically.

    f: (..., G, 2); z0: (..., 2). Returns (z_in (..., G, 2), z_final (..., 2)).

    Two levels: an associative scan over the fixed-size within-frame axis
    (always exactly ``frame_blocks`` elements, so the reduction tree — and
    therefore every rounding — is identical no matter how many frames a
    dispatch carries), then a sequential ``lax.scan`` across frames. This
    makes chunked streaming *bit-identical* to one-shot processing for any
    frame-aligned chunking — the determinism contract the reference's CDC
    discipline approximates (SURVEY.md §5.2).
    """
    G = f.shape[-2]
    if G % frame_blocks:
        raise ValueError(f"G={G} not a multiple of frame_blocks={frame_blocks}")
    F = G // frame_blocks
    lead = f.shape[:-2]
    fF = f.reshape(*lead, F, frame_blocks, 2)
    mats = jnp.broadcast_to(AL, (*fF.shape[:-1], 2, 2))
    vecs = fF[..., :, None]
    # Within-frame inclusive prefix of the affine maps (axis = frame_blocks).
    cmats, cvecs = jax.lax.associative_scan(
        _affine_combine, (mats, vecs), axis=fF.ndim - 2
    )
    # Frame summary: total transition + forcing of each frame.
    m_last = cmats[..., -1, :, :]  # (..., F, 2, 2)
    v_last = cvecs[..., -1, :, :]  # (..., F, 2, 1)

    # Sequential chain across frames (identical op order for any chunking).
    def step(z, mv):
        m, v = mv
        return m @ z + v, z

    mF = jnp.moveaxis(m_last, len(lead), 0)  # (F, ..., 2, 2)
    vF = jnp.moveaxis(v_last, len(lead), 0)
    z_final, z_starts = jax.lax.scan(step, z0[..., :, None], (mF, vF))
    z_starts = jnp.moveaxis(z_starts, 0, len(lead))  # (..., F, 2, 1)

    # z_in of block j in frame f: j=0 -> frame start; else within-frame
    # z_end of block j-1 = cmats[j-1] z_start + cvecs[j-1].
    zs = z_starts[..., :, None, :, :]  # (..., F, 1, 2, 1)
    z_end_within = cmats @ zs + cvecs  # (..., F, B, 2, 1)
    z_in = jnp.concatenate([zs, z_end_within[..., :-1, :, :]], axis=-3)
    return z_in[..., 0].reshape(*lead, G, 2), z_final[..., 0]


def sosfilt_blocked(
    op: BlockedSOS,
    x: jnp.ndarray,
    zi: jnp.ndarray,
    precision=Precision.HIGHEST,
    frame_blocks: int | None = None,
):
    """Filter x (..., T) through the cascade; T must be a multiple of L.

    zi: (..., S, 2) incoming per-section state (scipy sosfilt convention).
    ``frame_blocks`` sets the hierarchical-scan segment (blocks per FFT
    frame); chunked streaming is bit-identical to one-shot processing when
    chunks are multiples of frame_blocks*L samples. Default: one segment per
    dispatch (pure associative scan).
    Returns (y (..., T), zf (..., S, 2)).
    """
    L = op.block
    S = op.n_sections
    lead = x.shape[:-1]
    G = x.shape[-1] // L
    fb = G if frame_blocks is None else frame_blocks
    v = x.reshape(*lead, G, L)
    zf_out = []
    for s in range(S):
        z0 = zi[..., s, :]  # (..., 2)
        # Zero-state response of every block, one big MXU matmul:
        y_zs = jnp.einsum("...gl,nl->...gn", v, op.T[s], precision=precision)
        # Per-block forcing of the end state:
        f = jnp.einsum("...gl,cl->...gc", v, op.P[s], precision=precision)
        z_in, z_final = _block_state_chain(op.AL[s], f, z0, fb)
        y = y_zs + jnp.einsum(
            "nc,...gc->...gn", op.M[s], z_in, precision=precision
        )
        zf_out.append(z_final)
        v = y
    zf = jnp.stack(zf_out, axis=-2)
    return v.reshape(*lead, G * L), zf


def sosfilt_scan_ref(sos: jnp.ndarray, x: jnp.ndarray, zi: jnp.ndarray):
    """Sequential per-sample TDF-II via lax.scan — device-side exactness oracle.

    Same math as scipy.signal.sosfilt; O(T) depth, only for validation.
    x: (..., T), zi: (..., S, 2).
    """
    sos = jnp.asarray(sos, dtype=x.dtype)
    a0 = sos[:, 3]
    b = sos[:, :3] / a0[:, None]
    a = sos[:, 4:6] / a0[:, None]
    S = sos.shape[0]

    def sample_step(z, xn):
        # z: (..., S, 2); xn: (...,)
        v = xn
        z_new = []
        for s in range(S):
            y = b[s, 0] * v + z[..., s, 0]
            z1 = b[s, 1] * v - a[s, 0] * y + z[..., s, 1]
            z2 = b[s, 2] * v - a[s, 1] * y
            z_new.append(jnp.stack([z1, z2], axis=-1))
            v = y
        return jnp.stack(z_new, axis=-2), v

    zf, y = jax.lax.scan(sample_step, zi, jnp.moveaxis(x, -1, 0))
    return jnp.moveaxis(y, 0, -1), zf


def sosfilt_q15_scan(sos_x64: jnp.ndarray, x_q15: jnp.ndarray, zi: jnp.ndarray):
    """Bit-faithful integer path: int8-x64 coeffs, >>6 round-half-away, int16
    saturation — the device twin of golden.sosfilt_q15_intended.

    Inherently sequential (saturation is nonlinear); used for parity
    validation, not throughput. x_q15 (..., T) int16, zi (..., S, 2) int32.
    """
    sos = jnp.asarray(sos_x64, dtype=jnp.int32)
    S = sos.shape[0]

    def rshift6_round(v):
        return jnp.where(v >= 0, (v + 32) >> 6, -((-v + 32) >> 6))

    def sample_step(z, xn):
        v = xn.astype(jnp.int32)
        z_new = []
        for s in range(S):
            b0, b1, b2, _, a1, a2 = (sos[s, i] for i in range(6))
            y = rshift6_round(b0 * v + z[..., s, 0])
            y = jnp.clip(y, -32768, 32767)
            z1 = b1 * v - a1 * y + z[..., s, 1]
            z2 = b2 * v - a2 * y
            z_new.append(jnp.stack([z1, z2], axis=-1))
            v = y
        return jnp.stack(z_new, axis=-2), v.astype(jnp.int16)

    zf, y = jax.lax.scan(sample_step, zi, jnp.moveaxis(x_q15, -1, 0))
    return jnp.moveaxis(y, 0, -1), zf


def sos_identity(n_sections: int = 6) -> np.ndarray:
    """Pass-through cascade (the designer's pad section [64,0,0,64,0,0]/64)."""
    sos = np.zeros((n_sections, 6), dtype=np.float64)
    sos[:, 0] = 1.0
    sos[:, 3] = 1.0
    return sos
