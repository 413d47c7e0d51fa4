"""Pallas TPU kernels: the full filtered-spectrum pipeline in two passes.

This is the TPU-native dataflow analog of the FPGA's single-pass pipeline
(``imp/dsp_system_top.vhd``): all heavy math lives in two Pallas kernels that
compile in seconds, with XLA reduced to a 12-dimensional glue chain.

Per frame (B = 128 blocks x L = 128 samples = one 16K FFT frame; m = 12
composite IIR state):

  pass A  ``iir_summaries``      xw = x*win; f = xw @ P^T;
                                 w_frame = prefix(f)[B-1]
  glue    (XLA, tiny)            [all_gather w_frames across time shards];
                                 z_{f+1} = (A^L)^B z_f + w_f  ->  z_starts
  pass B  ``spectrum_from_state`` xw = x*win; y = xw@T^T + z_in@M^T with
                                 z_in from an in-kernel prefix of the
                                 state-injected forcing; then the four-step
                                 FFT + magnitude — y never touches HBM.

MXU utilization: each grid step processes a GROUP of up to 8 frames stacked
along sublanes, so the Toeplitz / DFT contractions run as (1024, 128)-class
matmuls instead of per-frame (128, 128) ones. The inter-block prefix is a
Hillis-Steele doubling scan over the stacked (G*B, m) forcing array — rolls
masked at frame boundaries — and injecting each frame's entry state into its
block-0 forcing (g[f*B] += AL z_start_f) makes the same scan produce exact
end states with no per-block matrix powers in VMEM.

Bit-consistency: sharded and unsharded runs execute identical per-frame
kernels and an identical (replicated) glue chain, so any mesh shape gives
the same bits for a given dispatch shape.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_sdr.kernels import biquad

LOG2B = 7  # B = 128 blocks per frame
MAX_GROUP = 8  # frames per grid step
HALF_K2 = 72  # half-spectrum rows: k2 in [0, 64] padded to a sublane multiple


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PallasSOSPlan:
    """Device constants for the two-pass pipeline (host-precomputed f64).

    T (L, L) Toeplitz impulse response; PT (L, m) forcing; MT (m, L) state
    injection; AL1T (m, m) = AL^T for entry-state injection; ALpowsT
    (LOG2B, m, m) = (AL^(2^k))^T for the doubling scan; ALB (m, m) frame
    transition (glue only); U (G*B, G) frame-start scatter; V (G, G*B)
    frame-end gather; EYE (m, 128) lane projection; win (n2, n1) window;
    DFT planes + G-tiled twiddle planes.
    """

    T: Any
    PT: Any
    MT: Any
    AL1T: Any
    ALpowsT: Any
    ALB: Any
    U: Any
    V: Any
    EYE: Any
    win: Any
    w1r: Any
    w1i: Any
    w2r: Any
    w2i: Any
    twr: Any
    twi: Any
    # Half-spectrum constants (real input): rows k2 in [0, 64] of the step-1
    # DFT and twiddle planes, zero-padded to HALF_K2 sublanes. The FFT input
    # is always real here (the reference zero-pads imag,
    # src/command_control.vhd:123), so X[N-k] = conj(X[k]) and magnitudes for
    # k2 > 64 are mirrors of computed rows — both DFT passes run at ~56%.
    w2r_h: Any
    w2i_h: Any
    twr_h: Any
    twi_h: Any

    @property
    def state_dim(self) -> int:
        return self.MT.shape[0]


def build_plan(
    sos: np.ndarray,
    win: np.ndarray,
    fft_plan: dict,
    block: int = 128,
    frame_blocks: int = 128,
    dtype=jnp.float32,
) -> PallasSOSPlan:
    if block != 128 or frame_blocks != 128:
        # The kernels hard-code the 128x128 geometry (LOG2B doublings, the
        # frame scatter/gather, lane tiling); other factorizations take the
        # XLA path (see PipelineConfig.pallas_geometry_ok, the single gate
        # banks.build_bank and stream.py share).
        raise ValueError(
            f"Pallas plan requires block=frame_blocks=128, got "
            f"{block}x{frame_blocks}"
        )
    n1_plan = fft_plan["w1r"].shape[0]
    n2_plan = fft_plan["w2r"].shape[0]
    if n1_plan != 128 or n2_plan != 128:
        # Same geometry constraint for the FFT factorization: the lane
        # tiling and the HALF_K2 mirror table assume 128x128 (review
        # finding: fft_n1=64/fft_n2=256 used to crash below in half_rows
        # with a negative-pad ValueError instead of this clear message).
        raise ValueError(
            f"Pallas plan requires the 128x128 four-step FFT, got "
            f"fft_n1={n1_plan}, fft_n2={n2_plan}"
        )
    # Host-side f64 IIR constants: ONE implementation, shared with the XLA
    # composite operator (biquad._composite_host_parts) so the two paths
    # can never drift (review finding: ~20 lines of this math used to be
    # duplicated here). The kernel's in-kernel Hillis-Steele doublings
    # need AL^(2^j) and AL^B — rows of the same alpows stack.
    T, M, P, alpows = biquad._composite_host_parts(sos, block, frame_blocks)
    m = M.shape[-1]
    L = block
    B = frame_blocks
    G = MAX_GROUP
    AL = alpows[1]
    alpow = [alpows[2 ** j] for j in range(LOG2B)]
    ALB = alpows[B]

    # Frame-start scatter / frame-end gather for a group of G frames.
    U = np.zeros((G * B, G))
    V = np.zeros((G, G * B))
    for f in range(G):
        U[f * B, f] = 1.0
        V[f, f * B + B - 1] = 1.0

    as_j = lambda a: jnp.asarray(a, dtype=dtype)
    n1 = fft_plan["w1r"].shape[0]
    n2 = fft_plan["w2r"].shape[0]
    # The tiled/half twiddle planes are derived ON DEVICE from the plan
    # constants already resident there (tile/slice/pad = placement only,
    # bit-identical to the former host construction) — pulling the plan back
    # to the host and re-shipping ~1.6 MB per bank is pure tunnel traffic.
    twr = jnp.tile(fft_plan["twr"], (1, G)).astype(dtype)
    twi = jnp.tile(fft_plan["twi"], (1, G)).astype(dtype)

    def half_rows(a2d: jnp.ndarray) -> jnp.ndarray:
        # rows k2 in [0, n2/2] zero-padded to HALF_K2 sublanes
        keep = a2d[: n2 // 2 + 1]
        return jnp.pad(
            keep, ((0, HALF_K2 - keep.shape[0]), (0, 0))
        ).astype(dtype)

    return PallasSOSPlan(
        T=as_j(T),
        PT=as_j(P.T),
        MT=as_j(M.T),
        AL1T=as_j(AL.T),
        ALpowsT=as_j(np.stack([a.T for a in alpow])),
        ALB=as_j(ALB),
        U=as_j(U),
        V=as_j(V),
        EYE=as_j(np.eye(m, 128)),
        win=jnp.asarray(win, dtype).reshape(n2, n1),
        # cast like every other leaf (review finding: these four used to
        # pass through at the fft_plan's dtype, so a non-default ``dtype``
        # produced a mixed-precision plan); a no-op for the default f32.
        w1r=jnp.asarray(fft_plan["w1r"], dtype),
        w1i=jnp.asarray(fft_plan["w1i"], dtype),
        w2r=jnp.asarray(fft_plan["w2r"], dtype),
        w2i=jnp.asarray(fft_plan["w2i"], dtype),
        twr=twr, twi=twi,
        w2r_h=half_rows(fft_plan["w2r"]),
        w2i_h=half_rows(fft_plan["w2i"]),
        twr_h=half_rows(twr),
        twi_h=half_rows(twi),
    )


def _split2(a):
    """f32 -> (hi, lo) bf16 pair with hi + lo ~= a (16 mantissa bits)."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot(a, b, precision):
    if precision == "high3":
        # bf16 emulation of XLA Precision.HIGH (Mosaic only exposes
        # default/highest) as ONE K-concatenated MXU pass:
        #   ah@bh + ah@bl + al@bh == [ah|ah|al] @ [bh;bl;bh]
        # (each bf16*bf16 product is exact in f32; the accumulator runs
        # K-serially over 3K instead of summing three separate dot results,
        # so the rounding ORDER differs from the 3-dot form while the error
        # class is identical). Measured on-chip (scripts/ablate_spectrum.py,
        # interleaved, cat3 < 3-dot in every paired rep): the 3-dot form
        # cost 0.14-0.23 ms/dispatch over 1-pass; the concat form claws
        # most of it back — no inter-dot f32 result adds, one MXU
        # invocation per contraction.
        ah, al = _split2(a)
        bh, bl = _split2(b)
        a3 = jnp.concatenate([ah, ah, al], axis=a.ndim - 1)
        b3 = jnp.concatenate([bh, bl, bh], axis=b.ndim - 2)
        return jnp.dot(
            a3, b3, preferred_element_type=jnp.float32, precision="default"
        )
    return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=precision)


def _dotT(a, b, precision):
    dn = (((1,), (1,)), ((), ()))
    if precision == "high3":
        # same K-concatenated single pass; K is the LAST axis of both
        ah, al = _split2(a)
        bh, bl = _split2(b)
        a3 = jnp.concatenate([ah, ah, al], axis=-1)
        b3 = jnp.concatenate([bh, bl, bh], axis=-1)
        return jax.lax.dot_general(
            a3, b3, dn, preferred_element_type=jnp.float32, precision="default"
        )
    return jax.lax.dot_general(
        a, b, dn, preferred_element_type=jnp.float32, precision=precision,
    )


def _masked_scan(g, alpows_ref, B, m, precision):
    """Per-frame inclusive prefix on frame-stacked forcing g (G*B, m).

    Hillis-Steele doubling; rolls cross frame boundaries but the
    (row mod B) mask kills those contributions, so each frame's prefix is
    independent and exact.

    Runs in TRANSPOSED state space (m, G*B): the doubling dot becomes
    (m, m) @ (m, G*B) — M = 12 pads to 16 sublanes instead of the
    row-major form's M = 1024, an 8x MXU-work saving per doubling
    (M-padding: both forms pad K to 128 lanes). The contraction index
    and its order are IDENTICAL to the row-major form (out[j,i] =
    sum_k A[k,j] * rolled[i,k] either way, K-serial f32 accumulation),
    so the values are bitwise unchanged; only the layout differs, with
    one skinny (G*B, m) transpose at entry and exit.
    """
    GB = g.shape[0]
    zh = g.T  # (m, GB) — skinny relayout
    col = jax.lax.broadcasted_iota(jnp.int32, (m, GB), 1) % B
    for k in range(LOG2B):
        sh = 1 << k
        rolled = pltpu.roll(zh, sh, 1)
        # alpows_ref[k] holds (AL^(2^k))^T; the transposed-space operator
        # is its transpose, i.e. AL^(2^k) itself (a (12,12) flip — free)
        contrib = _dot(alpows_ref[k].T, rolled, precision)
        zh = zh + jnp.where(col >= sh, contrib, 0.0)
    return zh.T


def _stack_to_lanes(y, G, B, L):
    """(G*B, L) frame-stacked rows -> (B, G*L) frame-stacked lanes."""
    return jnp.concatenate(
        [y[f * B : (f + 1) * B, :] for f in range(G)], axis=1
    )


def _stack_to_rows(yl, G, B, L):
    """(B, G*L) frame-stacked lanes -> (G*B, L) frame-stacked rows."""
    return jnp.concatenate(
        [yl[:, f * L : (f + 1) * L] for f in range(G)], axis=0
    )


def _fft_mag(y, plan_refs, G, B, L, precision, karatsuba=False):
    """Four-step FFT + magnitude on frame-stacked y (G*B, L) = (G, n2, n1).

    With half-spectrum plan refs (w2/tw rows = HALF_K2), only k2 in [0, 64]
    is computed — both DFT matmuls and the twiddle shrink to ~56% — and the
    caller mirrors magnitudes for k2 > 64 (real input => |X[N-k]| = |X[k]|).
    """
    w2r, w2i, twr, twi, w1r, w1i = plan_refs
    k2 = w2r.shape[0]  # n2 (full) or HALF_K2 (half-spectrum)
    yl = _stack_to_lanes(y, G, B, L)  # (n2, G*n1)
    if precision == "high3":
        # fused step-1: yl is split ONCE and its [bh;bl;bh] concat is
        # shared by BOTH DFT planes, which ride one (2*k2, 3*n2) MXU dot
        ylh, yll = _split2(yl)
        b3 = jnp.concatenate([ylh, yll, ylh], axis=0)  # (3*n2, G*n1)
        w2rh, w2rl = _split2(w2r[:])
        w2ih, w2il = _split2(w2i[:])
        a3 = jnp.concatenate([
            jnp.concatenate([w2rh, w2rh, w2rl], axis=1),
            jnp.concatenate([w2ih, w2ih, w2il], axis=1),
        ], axis=0)  # (2*k2, 3*n2)
        yri = jnp.dot(
            a3, b3, preferred_element_type=jnp.float32, precision="default"
        )
        yr, yi = yri[:k2], yri[k2:]
    else:
        yr = _dot(w2r[:], yl, precision)  # (k2, G*n1)
        yi = _dot(w2i[:], yl, precision)
    tr = yr * twr[:] - yi * twi[:]
    ti = yr * twi[:] + yi * twr[:]
    trs = _stack_to_rows(tr, G, k2, L)  # (G*k2, n1)
    tis = _stack_to_rows(ti, G, k2, L)
    zr, zi = _cdots(trs, tis, w1r[:], w1i[:],
                    lambda p, w: _dotT(p, w, precision), karatsuba)
    return jnp.sqrt(zr * zr + zi * zi)  # (G*k2, k1)


def _summaries_kernel(x_ref, win_ref, pt_ref, alpows_ref, v_ref, eye_ref,
                      out_ref, *, G, B, m, precision):
    xw = (x_ref[:] * win_ref[:]).reshape(G * B, -1)
    f = _dot(xw, pt_ref[:], precision)  # (G*B, m)
    zh = _masked_scan(f, alpows_ref, B, m, precision)
    w = _dot(v_ref[:], zh, precision)  # (G, m): frame-end rows
    out_ref[:, 0, :] = _dot(w, eye_ref[:], precision)  # (G, 128)


def _spectrum_kernel(
    x_ref, zs_ref, win_ref, t_ref, pt_ref, mt_ref, al1t_ref, alpows_ref,
    u_ref, w2r_ref, w2i_ref, twr_ref, twi_ref, w1r_ref, w1i_ref, out_ref,
    *, G, B, m, precision, bypass, apply_window, half, karatsuba,
    flat=False,
):
    L = x_ref.shape[2]
    if apply_window:
        xw = (x_ref[:] * win_ref[:]).reshape(G * B, L)
    else:
        xw = x_ref[:].reshape(G * B, L)
    if bypass:
        y = xw
    else:
        zs = zs_ref[:, 0, :m]  # (G, m) per-frame entry states
        y_zs = _dotT(xw, t_ref[:], precision)  # (G*B, L)
        f = _dot(xw, pt_ref[:], precision)  # (G*B, m)
        # inject each frame's entry state into its block-0 forcing
        inject = _dot(zs, al1t_ref[:], precision)  # (G, m) rows = (AL z_f)^T
        g = f + _dot(u_ref[:], inject, precision)
        z_end = _masked_scan(g, alpows_ref, B, m, precision)
        # z_in[j] = z_end[j-1] within frame; frame starts get z_start_f
        row = jax.lax.broadcasted_iota(jnp.int32, (G * B, m), 0) % B
        z_in = jnp.where(row == 0, 0.0, pltpu.roll(z_end, 1, 0))
        z_in = z_in + _dot(u_ref[:], zs, precision)
        y = y_zs + _dot(z_in, mt_ref[:], precision)
    mag = _fft_mag(
        y,
        (w2r_ref, w2i_ref, twr_ref, twi_ref, w1r_ref, w1i_ref),
        G, B, L, precision, karatsuba,
    )
    mag = mag.astype(out_ref.dtype)  # optional bf16 output (HBM halving)
    if half:
        # mag (G*HALF_K2, k1): rows k2 in [0, 64] per frame (65..71 are
        # zero padding). IN-KERNEL mirror (round 4): the r3 half-spectrum
        # loss was its XLA mirror epilogue — an extra ~66 MB HBM pass —
        # so the conjugate-symmetry rows are now assembled in VMEM:
        # out[k1, k2] for k2 in [65,127] = |X[127-k1, 128-k2]|, a double
        # flip. Mosaic cannot lower lax.rev, so both flips ride tiny
        # permutation dots at HIGHEST precision — exact f32, so mirrored
        # rows carry the computed rows' bits verbatim at every tier
        # (~1.8 M logical MAC/frame, negligible next to the ~44% DFT
        # saving).
        h = mag.shape[0] // G
        hn = B // 2
        i1 = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
        j1 = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
        jrow = (i1 + j1 == L - 1).astype(mag.dtype)  # k1 flip (L, L)
        ik = jax.lax.broadcasted_iota(jnp.int32, (h, hn - 1), 0)
        jk = jax.lax.broadcasted_iota(jnp.int32, (h, hn - 1), 1)
        kcol = (ik == hn - 1 - jk).astype(mag.dtype)  # col pick (h, 63)
        for fi in range(G):
            m_t = mag[fi * h : fi * h + h, :].T  # (k1 = L, h)
            top = m_t[:, : hn + 1]  # k2 = 0..64
            bot = _dot(_dot(jrow, m_t, "highest"), kcol, "highest")
            # _dot accumulates in f32; the permutation is exact, so the
            # cast back (bf16 out_dtype) reproduces the input bits
            out_ref[fi] = jnp.concatenate(
                [top, bot.astype(out_ref.dtype)], axis=1
            )
    elif flat:
        # flat-row emit (round 5, the layout-tax fix): write each frame's
        # natural-order magnitudes as ONE flattened (B*L,)-lane row, so the
        # kernel's HBM output is ALREADY in the (F, n) consumer layout —
        # the XLA epilogue reshape to (..., F, n) becomes a free
        # leading-dim split instead of a full relayout copy (measured
        # 0.052 ms, ~17% of the bf16 dispatch, trace_bf16_r4.json). The
        # in-kernel relayout (per-frame transpose + minor-pair merge)
        # rides VMEM bandwidth instead of HBM.
        t3 = mag.reshape(G, B, L).transpose(0, 2, 1)  # (G, k1, k2)
        out_ref[:] = t3.reshape(G, B * L)
    else:
        # natural order: out[f, k1, k2] = mag[f*B + k2, k1]
        for fi in range(G):
            out_ref[fi] = mag[fi * B : (fi + 1) * B, :].T


def _cdots(ar, ai, br, bi, dot, karatsuba):
    """Complex product (ar+i*ai)(br+i*bi) via 4 dots, or 3 with Karatsuba."""
    if karatsuba:
        t1 = dot(ar, br)
        t2 = dot(ai, bi)
        t3 = dot(ar + ai, br + bi)
        return t1 - t2, t3 - t1 - t2
    return dot(ar, br) - dot(ai, bi), dot(ar, bi) + dot(ai, br)


def _spectrum_complex_kernel(
    xr_ref, xi_ref, win_ref, w2r_ref, w2i_ref, twr_ref, twi_ref,
    w1r_ref, w1i_ref, out_ref, *, G, B, precision, karatsuba, apply_window,
):
    """Complex-input (IQ) window + four-step FFT + magnitude.

    Same structure as the real-input `_spectrum_kernel` bypass path, with a
    full complex first DFT pass (4 matmuls, 3 with Karatsuba) since the
    input has both planes. Emits natural-order magnitudes.
    """
    L = xr_ref.shape[2]
    if apply_window:
        xwr = (xr_ref[:] * win_ref[:]).reshape(G * B, L)
        xwi = (xi_ref[:] * win_ref[:]).reshape(G * B, L)
    else:
        xwr = xr_ref[:].reshape(G * B, L)
        xwi = xi_ref[:].reshape(G * B, L)
    ylr = _stack_to_lanes(xwr, G, B, L)  # (n2, G*n1)
    yli = _stack_to_lanes(xwi, G, B, L)
    ar, ai_ = _cdots(ylr, yli, w2r_ref[:], w2i_ref[:],
                     lambda p, w: _dot(w, p, precision), karatsuba)
    tr = ar * twr_ref[:] - ai_ * twi_ref[:]
    ti = ar * twi_ref[:] + ai_ * twr_ref[:]
    trs = _stack_to_rows(tr, G, B, L)  # (G*k2, n1)
    tis = _stack_to_rows(ti, G, B, L)
    zr, zi = _cdots(trs, tis, w1r_ref[:], w1i_ref[:],
                    lambda p, w: _dotT(p, w, precision), karatsuba)
    mag = jnp.sqrt(zr * zr + zi * zi).astype(out_ref.dtype)
    for fi in range(G):
        out_ref[fi] = mag[fi * B : (fi + 1) * B, :].T


@functools.partial(
    jax.jit,
    static_argnames=(
        "interpret", "precision", "apply_window", "karatsuba", "out_dtype",
    ),
)
def spectrum_mag_complex(
    xr: jnp.ndarray,
    xi: jnp.ndarray,
    plan: PallasSOSPlan,
    interpret: bool = False,
    precision: str = "highest",
    apply_window: bool = True,
    karatsuba: bool = False,
    out_dtype: str = "float32",
):
    """IQ frames xr/xi (F, N) -> magnitudes (F, N), fused in VMEM."""
    F = xr.shape[0]
    n2, n1 = plan.win.shape
    n = n1 * n2
    G = _pick_group(F)
    B = n2
    fspec = pl.BlockSpec((G, n2, n1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _spectrum_complex_kernel, G=G, B=B, precision=precision,
            karatsuba=karatsuba, apply_window=apply_window,
        ),
        out_shape=jax.ShapeDtypeStruct((F, n1, n2), jnp.dtype(out_dtype)),
        grid=(F // G,),
        in_specs=[
            fspec,
            fspec,
            _vspec(plan.win.shape),
            _vspec(plan.w2r.shape),
            _vspec(plan.w2i.shape),
            _vspec((n2, G * n1)),
            _vspec((n2, G * n1)),
            _vspec(plan.w1r.shape),
            _vspec(plan.w1i.shape),
        ],
        out_specs=pl.BlockSpec(
            (G, n1, n2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(
        xr.reshape(F, n2, n1), xi.reshape(F, n2, n1), plan.win,
        plan.w2r, plan.w2i,
        plan.twr[:, : G * n1], plan.twi[:, : G * n1],
        plan.w1r, plan.w1i,
    )
    return out.reshape(F, n)


def _pick_group(F: int) -> int:
    for g in (MAX_GROUP, 4, 2, 1):
        if F % g == 0:
            return g
    return 1


def _vspec(shape):
    return pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )


@functools.partial(jax.jit, static_argnames=("interpret", "precision"))
def iir_summaries(
    x: jnp.ndarray, plan: PallasSOSPlan, interpret: bool = False,
    precision: str = "highest",
):
    """x (F, N) raw frames -> per-frame zero-state forcing summaries (F, m)."""
    F = x.shape[0]
    n2, n1 = plan.win.shape
    m = plan.state_dim
    G = _pick_group(F)
    B = n2
    out = pl.pallas_call(
        functools.partial(
            _summaries_kernel, G=G, B=B, m=m, precision=precision
        ),
        out_shape=jax.ShapeDtypeStruct((F, 1, 128), jnp.float32),
        grid=(F // G,),
        in_specs=[
            pl.BlockSpec((G, n2, n1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            _vspec(plan.win.shape),
            _vspec(plan.PT.shape),
            _vspec(plan.ALpowsT.shape),
            _vspec((G, G * B)),
            _vspec(plan.EYE.shape),
        ],
        out_specs=pl.BlockSpec(
            (G, 1, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x.reshape(F, n2, n1), plan.win, plan.PT, plan.ALpowsT,
      plan.V[:G, : G * B], plan.EYE)
    return out[:, 0, :m]


@functools.partial(
    jax.jit,
    static_argnames=(
        "interpret", "precision", "bypass", "apply_window", "half_spectrum",
        "karatsuba", "out_dtype", "flat_emit", "blocked_output",
    ),
)
def spectrum_from_state(
    x: jnp.ndarray,
    z_starts: jnp.ndarray,
    plan: PallasSOSPlan,
    interpret: bool = False,
    precision: str = "highest",
    bypass: bool = False,
    apply_window: bool = True,
    half_spectrum: bool = False,
    karatsuba: bool = False,
    out_dtype: str = "float32",
    flat_emit: bool = False,
    blocked_output: bool = False,
):
    """x (F, N) frames + per-frame entry states (F, m) -> magnitudes (F, N).

    ``precision``: "default" | "high3" (manual 3-pass bf16 splits, ~XLA
    Precision.HIGH) | "highest" (exact f32, 6 passes).

    ``out_dtype``: "float32" (default) or "bfloat16" — the latter halves
    the magnitude write-back traffic; values are the f32 kernel results
    rounded once on store (the dispatch stays HBM-heavy at low precisions,
    so the bf16 tier opts in; see the round-4 traffic A/B).

    ``half_spectrum``: exploit the real input (conjugate symmetry) — compute
    k2 in [0, 64] only and mirror magnitudes for the rest (~44% less DFT
    work on paper). Measured slower on v5e in BOTH mirror designs: the r3
    XLA epilogue paid an extra HBM pass, and the round-4 IN-KERNEL mirror
    (two exact permutation dots, natural-order output straight from the
    kernel) still loses 7/7 paired reps at both tiers — the HIGHEST-
    precision mirror dots plus the 72-row tile waste eat the saving
    (docs/measurements/half_spectrum_ab_r4.json). Kept as a measured-
    honest option, off by default.

    ``flat_emit``: the kernel writes each frame's magnitudes as one
    flattened (n,)-lane row (in-kernel relayout), so the HBM output is
    already (F, n) and the consumer's (..., F, n) view is a free bitcast
    instead of a relayout copy (round-5 layout-tax fix; same bits).

    ``blocked_output``: return the kernel-native (F, n1, n2) array with NO
    flatten at all — for consumers that index (k1, k2) directly.
    """
    F = x.shape[0]
    n2, n1 = plan.win.shape
    m = plan.state_dim
    n = n1 * n2
    G = _pick_group(F)
    B = n2
    if half_spectrum:
        w2r, w2i = plan.w2r_h, plan.w2i_h
        twr, twi = plan.twr_h, plan.twi_h
        if flat_emit:
            raise ValueError("flat_emit is not supported with half_spectrum")
    else:
        w2r, w2i = plan.w2r, plan.w2i
        twr, twi = plan.twr, plan.twi
    if flat_emit and blocked_output:
        raise ValueError("flat_emit and blocked_output are exclusive")
    k2 = w2r.shape[0]
    out_rows = n1  # half-spectrum mirrors in-kernel: natural order always
    if flat_emit:
        out_shape = jax.ShapeDtypeStruct((F, n), jnp.dtype(out_dtype))
        out_spec = pl.BlockSpec(
            (G, n), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
    else:
        out_shape = jax.ShapeDtypeStruct(
            (F, out_rows, n2), jnp.dtype(out_dtype)
        )
        out_spec = pl.BlockSpec(
            (G, out_rows, n2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
    zs_pad = jnp.pad(z_starts, ((0, 0), (0, 128 - m)))[:, None, :]
    out = pl.pallas_call(
        functools.partial(
            _spectrum_kernel, G=G, B=B, m=m, precision=precision,
            bypass=bypass, apply_window=apply_window, half=half_spectrum,
            karatsuba=karatsuba, flat=flat_emit,
        ),
        out_shape=out_shape,
        grid=(F // G,),
        in_specs=[
            pl.BlockSpec((G, n2, n1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            _vspec(plan.win.shape),
            _vspec(plan.T.shape),
            _vspec(plan.PT.shape),
            _vspec(plan.MT.shape),
            _vspec(plan.AL1T.shape),
            _vspec(plan.ALpowsT.shape),
            _vspec((G * B, G)),
            _vspec(w2r.shape),
            _vspec(w2i.shape),
            _vspec((k2, G * n1)),
            _vspec((k2, G * n1)),
            _vspec(plan.w1r.shape),
            _vspec(plan.w1i.shape),
        ],
        out_specs=out_spec,
        interpret=interpret,
    )(
        x.reshape(F, n2, n1), zs_pad, plan.win, plan.T, plan.PT, plan.MT,
        plan.AL1T, plan.ALpowsT, plan.U[: G * B, :G],
        w2r, w2i,
        twr[:, : G * n1], twi[:, : G * n1],
        plan.w1r, plan.w1i,
    )
    if blocked_output:
        return out  # (F, n1, n2) kernel-native
    if flat_emit:
        return out  # already (F, n)
    return out.reshape(F, n)


# (The XLA frame-chain glue z_{f+1} = ALB z_f + w_f lives inline in
# runtime/stream.py's fused-two-pass branch, where it handles lead dims and
# the time-sharded gather/slice.)
