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


def precompute(sos, block: int = 128) -> BlockedSOS:
    """Build the blocked operator from SOS coefficients (host-side f64).

    Matrix powers accumulate error fast in low precision (an earlier
    on-device version silently used bf16 einsums on TPU), so the constants
    are computed in float64 on the host like ``precompute_composite``.
    """
    sos = np.atleast_2d(np.asarray(sos, np.float64))
    S = sos.shape[0]
    L = block
    a0 = sos[:, 3:4]
    b0, b1, b2 = (sos[:, i] / a0[:, 0] for i in range(3))
    a1, a2 = sos[:, 4] / a0[:, 0], sos[:, 5] / a0[:, 0]
    A = np.zeros((S, 2, 2))
    A[:, 0, 0] = -a1
    A[:, 0, 1] = 1.0
    A[:, 1, 0] = -a2
    B = np.stack([b1 - a1 * b0, b2 - a2 * b0], axis=-1)
    C = np.zeros((S, 2))
    C[:, 0] = 1.0
    D = b0

    Aks = np.empty((L + 1, S, 2, 2))
    Aks[0] = np.eye(2)
    for k in range(1, L + 1):
        Aks[k] = np.einsum("sij,sjk->sik", A, Aks[k - 1])

    cab = np.einsum("sc,kscd,sd->ks", C, Aks[: L - 1], B)  # (L-1, S)
    h = np.concatenate([D[None, :], cab], axis=0).T  # (S, L)

    delta = np.arange(L)[:, None] - np.arange(L)[None, :]
    gathered = h[:, np.clip(delta, 0, L - 1)]  # (S, L, L)
    T = np.where(delta[None] >= 0, gathered, 0.0)

    M = np.einsum("sc,nscd->snd", C, Aks[:L])
    P = np.einsum("kscd,sd->sck", Aks[L - 1 :: -1], B)

    as_j = lambda a: jnp.asarray(a, jnp.float32)
    return BlockedSOS(
        T=as_j(T), M=as_j(M), P=as_j(P), AL=as_j(Aks[L])
    )


def _small_mm(a, b):
    """Exact-f32 small matmul via elementwise ops (bare ``@`` lowers to bf16
    MXU passes on TPU; these tiny state products feed long recurrences, so
    they stay on the VPU in full f32)."""
    return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)


def _affine_combine(left, right):
    """Compose affine maps: right after left. Elements: (mat, vec[...,2,1])."""
    m1, v1 = left
    m2, v2 = right
    return _small_mm(m2, m1), _small_mm(m2, v1) + v2


def _within_frame_prefix(AL, f, frame_blocks: int):
    """Inclusive prefix of the affine maps inside each frame.

    f: (..., G, 2) block forcings -> (cmats (..., F, B, 2, 2),
    cvecs (..., F, B, 2, 1)) with B = frame_blocks, F = G // B.
    The scan tree is always over exactly B elements, so the reduction order
    — and therefore every rounding — is identical no matter how many frames
    a dispatch carries or how frames are sharded across devices.
    """
    G = f.shape[-2]
    if G % frame_blocks:
        raise ValueError(f"G={G} not a multiple of frame_blocks={frame_blocks}")
    F = G // frame_blocks
    lead = f.shape[:-2]
    fF = f.reshape(*lead, F, frame_blocks, 2)
    mats = jnp.broadcast_to(AL, (*fF.shape[:-1], 2, 2))
    vecs = fF[..., :, None]
    return jax.lax.associative_scan(
        _affine_combine, (mats, vecs), axis=fF.ndim - 2
    )


def _frame_chain(m_frames, v_frames, z0):
    """Sequential affine chain across frames — the canonical state order.

    m_frames (..., F, 2, 2), v_frames (..., F, 2, 1), z0 (..., 2).
    Returns (z_final (..., 2), z_starts (..., F, 2, 1)): the state at the
    START of each frame. One op order for any chunking/sharding.
    """
    lead = m_frames.shape[:-3]

    def step(z, mv):
        m, v = mv
        return _small_mm(m, z) + v, z

    mF = jnp.moveaxis(m_frames, len(lead), 0)
    vF = jnp.moveaxis(v_frames, len(lead), 0)
    z_final, z_starts = jax.lax.scan(step, z0[..., :, None], (mF, vF))
    return z_final[..., 0], jnp.moveaxis(z_starts, 0, len(lead))


def _z_in_from_prefix(cmats, cvecs, z_starts):
    """Assemble per-block incoming states from within-frame prefixes.

    z_in of block j in frame f: j=0 -> frame start; else within-frame
    z_end of block j-1 = cmats[j-1] z_start + cvecs[j-1].
    Returns (..., G, 2).
    """
    lead = cmats.shape[:-4]
    F, B = cmats.shape[-4], cmats.shape[-3]
    zs = z_starts[..., :, None, :, :]  # (..., F, 1, 2, 1)
    z_end_within = _small_mm(cmats, zs) + cvecs  # (..., F, B, 2, 1)
    z_in = jnp.concatenate([zs, z_end_within[..., :-1, :, :]], axis=-3)
    return z_in[..., 0].reshape(*lead, F * B, 2)


def _block_state_chain(AL, f, z0, frame_blocks: int):
    """Solve z_end[g] = AL z_in[g] + f[g] over g = 0..G-1 hierarchically.

    f: (..., G, 2); z0: (..., 2). Returns (z_in (..., G, 2), z_final (..., 2)).

    Two levels: an associative scan over the fixed-size within-frame axis,
    then a sequential ``lax.scan`` across frames. This makes chunked
    streaming *bit-identical* to one-shot processing for any frame-aligned
    chunking — the determinism contract the reference's CDC discipline
    approximates (SURVEY.md §5.2).
    """
    cmats, cvecs = _within_frame_prefix(AL, f, frame_blocks)
    z_final, z_starts = _frame_chain(
        cmats[..., -1, :, :], cvecs[..., -1, :, :], z0
    )
    return _z_in_from_prefix(cmats, cvecs, z_starts), z_final


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


def sos_to_composite_statespace(sos: np.ndarray):
    """Compose the whole cascade into one m = 2S state linear system (host f64).

    Series interconnection of the per-section TDF-II systems: the composite
    state is the per-section states stacked section-major, so it reshapes
    1:1 to/from the scipy ``zi`` (S, 2) convention. Returns (A (m,m), B (m,),
    C (m,), D ()) float64.
    """
    sos = np.asarray(sos, np.float64)
    S = sos.shape[0]
    m = 2 * S
    A = np.zeros((m, m))
    Bv = np.zeros(m)
    R = np.zeros(m)  # y_{s-1} = R . z[n-1] + g * u[n]
    g = 1.0
    for s in range(S):
        b0, b1, b2, a0, a1, a2 = sos[s]
        b0, b1, b2, a1, a2 = b0 / a0, b1 / a0, b2 / a0, a1 / a0, a2 / a0
        As = np.array([[-a1, 1.0], [-a2, 0.0]])
        Bs = np.array([b1 - a1 * b0, b2 - a2 * b0])
        Cs = np.array([1.0, 0.0])
        sl = slice(2 * s, 2 * s + 2)
        A[sl, :] = np.outer(Bs, R)
        A[sl, sl] += As
        Bv[sl] = Bs * g
        R_new = b0 * R
        R_new[sl] += Cs
        R, g = R_new, b0 * g
    return A, Bv, R, g


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BlockedSOSComposite:
    """Precomputed blocked operator for the composite (single-system) cascade.

    The high-throughput form: per frame of B blocks x L samples,

      y_zs   = x @ T^T                  one (L,L) Toeplitz matmul per block
      zhat   = f_flat @ W^T             one (B*m, B*m) causal block-Toeplitz
                                        matmul per frame (zero-state chain)
      z_end[j] = APow[j] z_start + zhat[j]     (APow[j] = A^(j+1), constant)
      y      = y_zs + z_in @ M^T

    All heavy terms are dense constant matmuls (MXU); the only remaining
    sequential work is the per-frame chain z_{f+1} = A^B z_f + zhat[B-1],
    one 12-dim affine step per frame.

    Leaves: T (L,L), M (L,m), P (m,L), APow (B,m,m), W (B*m,B*m), ALB (m,m).
    """

    T: Any
    M: Any
    P: Any
    APow: Any
    W: Any
    ALB: Any

    @property
    def block(self) -> int:
        return self.T.shape[0]

    @property
    def state_dim(self) -> int:
        return self.M.shape[1]

    @property
    def frame_blocks(self) -> int:
        return self.APow.shape[0]


def _composite_host_parts(sos: np.ndarray, block: int, frame_blocks: int):
    """Host-side float64 math shared by the composite precomputes.

    Returns (T (L,L), M (L,m), P (m,L), alpows (B+1,m,m)) as float64 NumPy.
    alpows[k] = (A^L)^k fully determines the W block-Toeplitz operator, so
    only it needs to cross the host->device link (72 KB vs W's 9.2 MB at the
    default 128x128 shape — a ~100x upload cut that matters both for runtime
    coefficient reload latency and on degraded-tunnel days, measured ~100 s
    per bank at ~100 KB/s effective upload)."""
    A, Bv, C, D = sos_to_composite_statespace(sos)
    m = A.shape[0]
    L, B = block, frame_blocks

    # Sample-level powers A^0..A^L (for h, M, P and the block transition).
    pows = np.empty((L + 1, m, m))
    pows[0] = np.eye(m)
    for k in range(1, L + 1):
        pows[k] = A @ pows[k - 1]

    # Impulse response h[0] = D, h[n] = C A^(n-1) B.
    h = np.empty(L)
    h[0] = D
    h[1:] = np.einsum("i,kij,j->k", C, pows[: L - 1], Bv)
    n_idx = np.arange(L)[:, None]
    k_idx = np.arange(L)[None, :]
    delta = n_idx - k_idx
    T = np.where(delta >= 0, h[np.clip(delta, 0, L - 1)], 0.0)

    # M[n] = C A^n ; P[:, k] = A^(L-1-k) B.
    M = np.einsum("i,nij->nj", C, pows[:L])
    P = np.einsum("kij,j->ik", pows[L - 1 :: -1], Bv)

    # Block-level powers AL^0..AL^B of the per-block transition AL = A^L.
    AL = pows[L]
    alpows = np.empty((B + 1, m, m))
    alpows[0] = np.eye(m)
    for k in range(1, B + 1):
        alpows[k] = AL @ alpows[k - 1]
    return T, M, P, alpows


@jax.jit
def _expand_block_toeplitz(alpows: jnp.ndarray) -> jnp.ndarray:
    """Device-side W construction: W[j*m+a, i*m+b] = alpows[j-i][a,b] for
    i <= j else 0. Pure PLACEMENT of already-rounded alpows entries — no
    arithmetic — so the result is bit-identical to building W on the host
    and shipping it, at 1/128 the transfer."""
    B = alpows.shape[0] - 1
    m = alpows.shape[-1]
    dj = jnp.arange(B)[:, None] - jnp.arange(B)[None, :]
    Wb = jnp.where(
        (dj >= 0)[:, :, None, None], alpows[jnp.clip(dj, 0, B)], 0
    )  # (B, B, m, m)
    return Wb.transpose(0, 2, 1, 3).reshape(B * m, B * m)


def precompute_composite(
    sos: np.ndarray, block: int = 128, frame_blocks: int = 128, dtype=jnp.float32
) -> BlockedSOSComposite:
    """Build the composite blocked operator (host-side float64 internals;
    the large W leaf is expanded on device from the shipped alpows stack)."""
    T, M, P, alpows = _composite_host_parts(sos, block, frame_blocks)
    as_j = lambda a: jnp.asarray(a, dtype=dtype)
    ap = as_j(alpows)  # (B+1, m, m)
    return BlockedSOSComposite(
        T=as_j(T),
        M=as_j(M),
        P=as_j(P),
        APow=ap[1:],
        W=_expand_block_toeplitz(ap),
        ALB=ap[-1],
    )


def _composite_frame_terms(op: BlockedSOSComposite, v, precision, canonical=True):
    """Shared per-frame parallel work for the composite cascade.

    v: (..., F, B, L) windowed input blocks. Returns (y_zs, zhat) with
    y_zs (..., F, B, L) and zhat (..., F, B, m) the within-frame zero-state
    chain values.

    ``canonical=False`` skips the single-frame GEMV guard below (2x compute
    on that shape) for callers that don't carry the bitwise
    chunked==one-shot contract, e.g. the latency engine.
    """
    if canonical and int(np.prod(v.shape[:-2])) == 1:
        # Canonical-math guard: a single-frame single-channel dispatch would
        # flatten the zhat contraction to an M=1 GEMV, whose accumulation
        # order differs from the batched GEMM larger dispatches use (observed
        # bitwise divergence on CPU backends, breaking the chunked==one-shot
        # bit-identity contract). Duplicate the frame so every dispatch shape
        # runs the same reduction, then slice the copy away.
        vv = jnp.concatenate([v, v], axis=-3)
        y_zs, zhat = _composite_frame_terms(op, vv, precision)
        return y_zs[..., :1, :, :], zhat[..., :1, :, :]
    m = op.state_dim
    B = op.frame_blocks
    y_zs = jnp.einsum("...bl,nl->...bn", v, op.T, precision=precision)
    f = jnp.einsum("...bl,cl->...bc", v, op.P, precision=precision)
    lead = f.shape[:-2]
    zhat_flat = jnp.einsum(
        "...i,ji->...j", f.reshape(*lead, B * m), op.W, precision=precision
    )
    return y_zs, zhat_flat.reshape(*lead, B, m)


def alb_step(op, z, w):
    """One frame-chain step: z' = ALB z + w (broadcasts over any leading
    axes, including the per-channel bank's C axis in ALB (C, m, m)).
    ``op`` is anything with an ``ALB`` leaf — ``BlockedSOSComposite`` or
    the Pallas plan (``kernels/pallas/iir_fft.PallasSOSPlan``).

    Deliberately written as elementwise mul + sum on the VPU, NOT as an
    einsum/dot: at DEFAULT precision the (m, m) @ (m,) GEMV lowers to a
    bf16 MXU pass on TPU whose rounding breaks the bitwise
    chunked==one-shot / sharded==single-device contracts; the explicit
    form stays exact f32 on the VPU at every precision (measured). Every
    frame chain — composite, banked, time-sharded, and the hybrid scan in
    ``runtime/stream.py`` — must use THIS helper so the contract cannot be
    broken by one copy being 'cleaned up' into an einsum (review finding:
    the expression used to be copy-pasted at four sites with the rationale
    documented at only one of them)."""
    return jnp.sum(op.ALB * z[..., None, :], axis=-1) + w


def _composite_emit(op, y_zs, zhat, z_starts, precision, ch: str = ""):
    """Assemble outputs given per-frame start states.

    z_starts: (..., F, m) — or (..., C, F, m) with ``ch="c"``, where the
    operator leaves carry a leading per-channel axis (the banked cascade;
    review finding: the bank path used to re-implement this assembly).
    Returns y (..., [C,] F, B, L).
    """
    # z_end[j] = APow[j] z_start + zhat[j]; z_in[0] = z_start, else z_end[j-1].
    z_end = (
        jnp.einsum(
            f"{ch}jab,...{ch}fb->...{ch}fja", op.APow, z_starts,
            precision=precision,
        )
        + zhat
    )
    z_in = jnp.concatenate([z_starts[..., None, :], z_end[..., :-1, :]], axis=-2)
    return y_zs + jnp.einsum(
        f"{ch}nm,...{ch}fbm->...{ch}fbn", op.M, z_in, precision=precision
    )


def sosfilt_blocked_composite(
    op: BlockedSOSComposite,
    x: jnp.ndarray,
    zi: jnp.ndarray,
    precision=Precision.HIGHEST,
):
    """Composite-cascade filter: x (..., T), T a multiple of B*L (frame size).

    zi: (..., S, 2) scipy-convention state. Returns (y, zf) with identical
    interface to ``sosfilt_blocked``. Chunked streaming at frame granularity
    is bit-identical to one-shot processing (canonical per-frame math + a
    sequential frame chain).
    """
    L, B, m = op.block, op.frame_blocks, op.state_dim
    lead = x.shape[:-1]
    F = x.shape[-1] // (B * L)
    v = x.reshape(*lead, F, B, L)
    z0 = zi.reshape(*lead, m)

    y_zs, zhat = _composite_frame_terms(op, v, precision)

    # Sequential chain across frames: z_{f+1} = ALB z_f + zhat[f, -1].
    def step(z, w):
        return alb_step(op, z, w), z

    w_frames = jnp.moveaxis(zhat[..., -1, :], len(lead), 0)  # (F, ..., m)
    z_final, z_starts = jax.lax.scan(step, z0, w_frames)
    z_starts = jnp.moveaxis(z_starts, 0, len(lead))  # (..., F, m)

    y = _composite_emit(op, y_zs, zhat, z_starts, precision)
    return y.reshape(*lead, F * B * L), z_final.reshape(*lead, m // 2, 2)


def precompute_composite_bank(
    sos_bank: np.ndarray, block: int = 128, frame_blocks: int = 128,
    dtype=jnp.float32,
) -> BlockedSOSComposite:
    """Per-channel composite operators: sos_bank (C, S, 6) -> leaves with a
    leading channel axis. The BASELINE config-3 'filter bank' — every channel
    gets its own runtime-reloadable cascade (the reference has one custom
    bank for its single channel; this is the multi-channel generalization).

    Memory: ~(T + W) = (L^2 + (B*m)^2) * 4 bytes per channel (~9.5 MB at the
    default shape), so unique-per-channel banks suit O(100) channels; larger
    channel counts should share filters (``precompute_composite``).
    """
    sos_bank = np.asarray(sos_bank, np.float64)
    if sos_bank.ndim == 2:
        # one (S, 6) design -> a 1-channel bank. NOT np.atleast_3d, which
        # APPENDS the new axis ((S, 6) -> (S, 6, 1)) and mangles the rows
        # into length-1 pseudo-cascades (review finding).
        sos_bank = sos_bank[None]
    parts = [
        _composite_host_parts(sos_bank[c], block, frame_blocks)
        for c in range(sos_bank.shape[0])
    ]
    as_j = lambda a: jnp.asarray(a, dtype=dtype)
    ap = as_j(np.stack([p[3] for p in parts]))  # (C, B+1, m, m)
    return BlockedSOSComposite(
        T=as_j(np.stack([p[0] for p in parts])),
        M=as_j(np.stack([p[1] for p in parts])),
        P=as_j(np.stack([p[2] for p in parts])),
        APow=ap[:, 1:],
        W=jax.vmap(_expand_block_toeplitz)(ap),
        ALB=ap[:, -1],
    )


def _bank_frame_terms(op: BlockedSOSComposite, v, precision):
    """Per-frame parallel work of the banked cascade.

    v: (..., C, F, B, L) -> (y_zs (..., C, F, B, L), zhat (..., C, F, B, m)).
    Applies the same canonical-math guard as ``_composite_frame_terms``:
    a single-frame dispatch flattens each channel's zhat contraction to an
    M=1 GEMV whose accumulation order differs from the batched GEMM
    (bitwise divergence, breaking chunked==one-shot); duplicate the frame
    axis for that shape and slice the copy away.
    """
    lead = v.shape[:-4]
    C, F, B, L = v.shape[-4:]
    m = op.M.shape[-1]
    if int(np.prod(lead, dtype=np.int64)) * F == 1:
        vv = jnp.concatenate([v, v], axis=-3)
        y_zs, zhat = _bank_frame_terms(op, vv, precision)
        return y_zs[..., :1, :, :], zhat[..., :1, :, :]
    y_zs = jnp.einsum("...cfbl,cnl->...cfbn", v, op.T, precision=precision)
    f = jnp.einsum("...cfbl,cml->...cfbm", v, op.P, precision=precision)
    zhat = jnp.einsum(
        "...cfi,cji->...cfj",
        f.reshape(*lead, C, F, B * m),
        op.W,
        precision=precision,
    ).reshape(*lead, C, F, B, m)
    return y_zs, zhat


def sosfilt_blocked_composite_bank(
    op: BlockedSOSComposite,
    x: jnp.ndarray,
    zi: jnp.ndarray,
    precision=Precision.HIGHEST,
    *,
    time_axis: str | None = None,
):
    """Per-channel-coefficients cascade: x (..., C, T), zi (..., C, S, 2).

    Same math as ``sosfilt_blocked_composite`` with every constant batched
    over the channel axis (XLA lowers these to batched MXU matmuls).

    ``time_axis``: when the frame stream is sharded over that mesh axis
    (inside ``shard_map``), only per-frame (C, m) summaries cross the
    interconnect; every device replays the identical global frame chain and
    slices its frames — bit-identical to the unsharded run.
    """
    L = op.T.shape[-1]
    B = op.APow.shape[1]
    m = op.M.shape[-1]
    C = op.T.shape[0]
    lead = x.shape[:-2]
    F = x.shape[-1] // (B * L)
    v = x.reshape(*lead, C, F, B, L)
    z0 = zi.reshape(*lead, C, m)
    frame_ax = len(lead) + 1

    y_zs, zhat = _bank_frame_terms(op, v, precision)

    def step(z, w):
        return alb_step(op, z, w), z

    w_local = zhat[..., -1, :]  # (..., C, F, m)
    if time_axis is not None:
        w_local = jax.lax.all_gather(
            w_local, time_axis, axis=frame_ax, tiled=True
        )
    w_frames = jnp.moveaxis(w_local, frame_ax, 0)  # (F_global, ..., C, m)
    z_final, z_starts = jax.lax.scan(step, z0, w_frames)
    z_starts = jnp.moveaxis(z_starts, 0, frame_ax)  # (..., C, F_global, m)
    if time_axis is not None:
        t_idx = jax.lax.axis_index(time_axis)
        z_starts = jax.lax.dynamic_slice_in_dim(
            z_starts, t_idx * F, F, axis=frame_ax
        )

    y = _composite_emit(op, y_zs, zhat, z_starts, precision, ch="c")
    return (
        y.reshape(*lead, C, F * B * L),
        z_final.reshape(*lead, C, m // 2, 2),
    )


def sosfilt_blocked_composite_timesharded(
    op: BlockedSOSComposite,
    x_local: jnp.ndarray,
    zi: jnp.ndarray,
    *,
    time_axis: str,
    precision=Precision.HIGHEST,
):
    """Time-sharded composite cascade (frames sharded over ``time_axis``).

    Only the per-frame m-vector summaries cross the interconnect; every
    device replays the identical global frame chain and selects its slice,
    so results are bit-identical to the unsharded composite path.
    """
    L, B, m = op.block, op.frame_blocks, op.state_dim
    lead = x_local.shape[:-1]
    F_local = x_local.shape[-1] // (B * L)
    v = x_local.reshape(*lead, F_local, B, L)
    z0 = zi.reshape(*lead, m)
    frame_ax = len(lead)

    y_zs, zhat = _composite_frame_terms(op, v, precision)

    w_local = zhat[..., -1, :]  # (..., F_local, m)
    w_all = jax.lax.all_gather(w_local, time_axis, axis=frame_ax, tiled=True)

    def step(z, w):
        return alb_step(op, z, w), z

    wF = jnp.moveaxis(w_all, frame_ax, 0)
    z_final, z_starts_all = jax.lax.scan(step, z0, wF)
    z_starts_all = jnp.moveaxis(z_starts_all, 0, frame_ax)

    t_idx = jax.lax.axis_index(time_axis)
    z_starts = jax.lax.dynamic_slice_in_dim(
        z_starts_all, t_idx * F_local, F_local, axis=frame_ax
    )
    y = _composite_emit(op, y_zs, zhat, z_starts, precision)
    return (
        y.reshape(*lead, F_local * B * L),
        z_final.reshape(*lead, m // 2, 2),
    )


def sosfilt_blocked_timesharded(
    op: BlockedSOS,
    x_local: jnp.ndarray,
    zi: jnp.ndarray,
    *,
    time_axis: str,
    frame_blocks: int,
    precision=Precision.HIGHEST,
):
    """Time-sharded cascade: each device holds a contiguous slice of frames.

    Runs inside ``shard_map`` with mesh axis ``time_axis``. The TPU-native
    replacement for the reference's single-stream sequencing: local MXU work
    is embarrassingly parallel; only the per-frame 2-state summaries (a few
    hundred bytes) cross the interconnect via ``all_gather``, after which
    every device replays the *identical* global frame chain and selects its
    slice — so the result is bit-identical to the single-device pipeline
    (SURVEY.md §2.7 sequence-parallel row, §5.7).

    x_local: (..., T_local); zi: (..., S, 2) GLOBAL stream-head state
    (replicated). Returns (y_local, zf_global).
    """
    L = op.block
    S = op.n_sections
    lead = x_local.shape[:-1]
    G = x_local.shape[-1] // L
    F_local = G // frame_blocks
    t_idx = jax.lax.axis_index(time_axis)
    v = x_local.reshape(*lead, G, L)
    zf_out = []
    frame_ax = len(lead)  # axis of F in (..., F, 2, 2)
    for s in range(S):
        z0 = zi[..., s, :]
        y_zs = jnp.einsum("...gl,nl->...gn", v, op.T[s], precision=precision)
        f = jnp.einsum("...gl,cl->...gc", v, op.P[s], precision=precision)
        cmats, cvecs = _within_frame_prefix(op.AL[s], f, frame_blocks)
        # Tiny per-frame summaries -> every device, in frame order.
        m_all = jax.lax.all_gather(
            cmats[..., -1, :, :], time_axis, axis=frame_ax, tiled=True
        )
        v_all = jax.lax.all_gather(
            cvecs[..., -1, :, :], time_axis, axis=frame_ax, tiled=True
        )
        # Replicated global chain (identical op order on every device).
        z_final, z_starts_all = _frame_chain(m_all, v_all, z0)
        z_starts = jax.lax.dynamic_slice_in_dim(
            z_starts_all, t_idx * F_local, F_local, axis=frame_ax
        )
        z_in = _z_in_from_prefix(cmats, cvecs, z_starts)
        v = y_zs + jnp.einsum(
            "nc,...gc->...gn", op.M[s], z_in, precision=precision
        )
        zf_out.append(z_final)
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


def pad_sos(sos: np.ndarray, n_sections: int) -> np.ndarray:
    """Pad an SOS cascade to exactly ``n_sections`` with identity sections.

    Mirrors the reference GUI, which pads/truncates designs to its fixed
    2-section wire format with identity sections [64,0,0,64,0,0]
    (``fft_analyzer_gui.py:1185-1192``). Padding keeps the engine's state
    shape static so coefficient reloads never recompile. More sections than
    ``n_sections`` is an error (the design doesn't fit the engine).
    """
    sos = np.atleast_2d(np.asarray(sos, dtype=np.float64))
    if sos.shape[0] > n_sections:
        raise ValueError(
            f"design has {sos.shape[0]} sections; engine supports at most "
            f"{n_sections} (order {2 * n_sections})"
        )
    if sos.shape[0] < n_sections:
        pad = sos_identity(n_sections - sos.shape[0])
        sos = np.concatenate([sos, pad], axis=0)
    return sos


def sos_identity(n_sections: int = 6) -> np.ndarray:
    """Pass-through cascade (the designer's pad section [64,0,0,64,0,0]/64)."""
    sos = np.zeros((n_sections, 6), dtype=np.float64)
    sos[:, 0] = 1.0
    sos[:, 3] = 1.0
    return sos
