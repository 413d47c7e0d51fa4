"""16K-point complex FFT as a four-step 128x128 decomposition — all MXU work.

The reference uses the Xilinx pipelined-streaming xfft IP
(``ip/xfft_0/xfft_0.xci``: 16384-point, 16-bit scaled fixed point, natural
order). The TPU-native replacement (SURVEY.md §2.7 "TP-like intra-FFT
sharding") factors N = N1*N2 = 128*128 and computes, per frame:

    x[n],  n = n1 + N1*n2           (view as matrix X[n2, n1], row-major)
    1. column DFTs:  Y[k2, n1] = sum_n2  W_N2[k2, n2] * X[n2, n1]
    2. twiddle:      Y *= exp(-2*pi*i * n1 * k2 / N)
    3. row DFTs:     Z[k2, k1] = sum_n1  Y[k2, n1] * W_N1[k1, n1]
    4. output:       X_hat[N2*k1 + k2] = Z[k2, k1]   (transpose + reshape)

Steps 1 and 3 are dense 128x128 complex matmuls — with a batch of frames they
become (B*128, 128) @ (128, 128) MXU contractions. This spends ~30x the FLOPs
of a radix-2 FFT but runs on the systolic array at ~100x the FLOP rate of the
VPU, and needs no bit-reversal, no data-dependent control flow, and no
intra-frame communication except one transpose (which becomes the all_to_all
under time-sharding).

Complex arithmetic is carried as separate re/im float32 planes (TPUs have no
native complex units; this keeps Pallas parity trivial and lets us choose
matmul precision explicitly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Precision = jax.lax.Precision


@functools.lru_cache(maxsize=8)
def _dft_mat_np(n: int):
    k = np.arange(n)
    ang = -2.0 * np.pi * np.outer(k, k) / n
    return np.cos(ang), np.sin(ang)


@functools.lru_cache(maxsize=8)
def _twiddle_np(n1: int, n2: int):
    # tw[k2, n1] = exp(-2*pi*i*n1*k2/N)
    ang = -2.0 * np.pi * np.outer(np.arange(n2), np.arange(n1)) / (n1 * n2)
    return np.cos(ang), np.sin(ang)


def plan_constants(n1: int = 128, n2: int = 128, dtype=jnp.float32):
    """Device-resident FFT plan: two DFT matrices + twiddle planes."""
    w1r, w1i = _dft_mat_np(n1)
    w2r, w2i = _dft_mat_np(n2)
    twr, twi = _twiddle_np(n1, n2)
    as_j = lambda a: jnp.asarray(a, dtype=dtype)
    return {
        "w1r": as_j(w1r), "w1i": as_j(w1i),
        "w2r": as_j(w2r), "w2i": as_j(w2i),
        "twr": as_j(twr), "twi": as_j(twi),
    }


def _cmatmul(ar, ai, br, bi, contract, precision):
    """Complex matmul via 4 real einsums (3-mult tricks trade accuracy)."""
    rr = jnp.einsum(contract, ar, br, precision=precision)
    ii = jnp.einsum(contract, ai, bi, precision=precision)
    ri = jnp.einsum(contract, ar, bi, precision=precision)
    ir = jnp.einsum(contract, ai, br, precision=precision)
    return rr - ii, ri + ir


def fft_4step(
    xr: jnp.ndarray,
    xi: jnp.ndarray | None,
    plan: dict,
    precision=Precision.HIGHEST,
):
    """Forward DFT of frames (..., N), N = n1*n2. Returns (re, im) (..., N).

    xi may be None for real input (the reference feeds imag=0,
    ``src/command_control.vhd:123``) — the first matmul pair then skips two
    of its four real products.
    """
    n2, n1 = plan["w2r"].shape[0], plan["w1r"].shape[0]
    lead = xr.shape[:-1]
    Xr = xr.reshape(*lead, n2, n1)
    # Step 1: column DFTs, contract over n2: (k2 n2), (... n2 n1) -> (... k2 n1)
    c1 = "kn,...nj->...kj"
    if xi is None:
        Yr = jnp.einsum(c1, plan["w2r"], Xr, precision=precision)
        Yi = jnp.einsum(c1, plan["w2i"], Xr, precision=precision)
    else:
        Xi = xi.reshape(*lead, n2, n1)
        Yr, Yi = _cmatmul(plan["w2r"], plan["w2i"], Xr, Xi, c1, precision)
    # Step 2: twiddle (elementwise; XLA fuses into the surrounding matmuls).
    Tr = Yr * plan["twr"] - Yi * plan["twi"]
    Ti = Yr * plan["twi"] + Yi * plan["twr"]
    # Step 3: row DFTs, contract over n1: (... k2 n1), (k1 n1) -> (... k2 k1)
    c3 = "...kn,jn->...kj"
    Zr, Zi = _cmatmul(Tr, Ti, plan["w1r"], plan["w1i"], c3, precision)
    # Step 4: output index k = N2*k1 + k2 -> transpose (k2,k1) -> (k1,k2).
    out_r = jnp.swapaxes(Zr, -1, -2).reshape(*lead, n1 * n2)
    out_i = jnp.swapaxes(Zi, -1, -2).reshape(*lead, n1 * n2)
    return out_r, out_i


def ifft_4step(xr, xi, plan, precision=Precision.HIGHEST):
    """Inverse DFT via conjugation: ifft(x) = conj(fft(conj(x))) / N.

    ``xi=None`` means a real input, matching ``fft_4step``'s convention
    (review finding: the unary ``-xi`` used to raise a bare TypeError)."""
    n = xr.shape[-1]
    yr, yi = fft_4step(xr, None if xi is None else -xi, plan, precision)
    return yr / n, -yi / n


def fft_4step_sharded(
    xr_local: jnp.ndarray,
    xi_local: jnp.ndarray | None,
    plan: dict,
    axis_name: str,
    precision=Precision.HIGHEST,
):
    """Single-frame FFT sharded ACROSS devices (TP-like intra-FFT sharding).

    The SURVEY.md §2.7 row: the 16K frame's n1 axis is split over the mesh
    axis, step-1 column DFTs and the twiddle are local, and the step-3
    contraction over n1 becomes partial products combined with a
    ``reduce_scatter`` over k1 — the four-step's transpose/all-to-all in
    collective form. Use for latency-critical single-stream operation; the
    throughput path shards whole frames instead (``tpu_sdr.shard``).

    Runs inside ``shard_map``. xr_local: (..., n2, n1/D) — the local column
    shard (n1 split contiguously by device index). Returns (re, im) each
    (..., (n1/D) * n2): the k1-contiguous shard of the natural-order
    spectrum (concatenating shards over the axis yields the full spectrum).
    """
    n1 = plan["w1r"].shape[0]
    n2 = plan["w2r"].shape[0]
    idx = jax.lax.axis_index(axis_name)
    n1l = xr_local.shape[-1]
    if n1 % n1l:
        raise ValueError(
            f"local shard width {n1l} must divide n1 = {n1}"
        )
    lead = xr_local.shape[:-2]

    # Local slices of the replicated twiddle / W1 planes.
    twr = jax.lax.dynamic_slice_in_dim(plan["twr"], idx * n1l, n1l, axis=1)
    twi = jax.lax.dynamic_slice_in_dim(plan["twi"], idx * n1l, n1l, axis=1)
    w1r_cols = jax.lax.dynamic_slice_in_dim(plan["w1r"], idx * n1l, n1l, axis=1)
    w1i_cols = jax.lax.dynamic_slice_in_dim(plan["w1i"], idx * n1l, n1l, axis=1)

    # Step 1 (local): column DFTs over the full n2 (present locally).
    c1 = "kn,...nj->...kj"
    if xi_local is None:
        yr = jnp.einsum(c1, plan["w2r"], xr_local, precision=precision)
        yi = jnp.einsum(c1, plan["w2i"], xr_local, precision=precision)
    else:
        yr, yi = _cmatmul(
            plan["w2r"], plan["w2i"], xr_local, xi_local, c1, precision
        )
    # Step 2 (local): twiddle on the local columns.
    tr = yr * twr - yi * twi
    ti = yr * twi + yi * twr
    # Step 3: partial contraction over the local n1 columns...
    c3 = "...kn,jn->...kj"
    zr_part, zi_part = _cmatmul(tr, ti, w1r_cols, w1i_cols, c3, precision)
    # ...combined across devices; scatter over k1 so the result stays
    # sharded (this is the four-step transpose as a collective).
    zr = jax.lax.psum_scatter(
        jnp.swapaxes(zr_part, -1, -2), axis_name, scatter_dimension=len(lead),
        tiled=True,
    )  # (..., k1/D, k2)
    zi = jax.lax.psum_scatter(
        jnp.swapaxes(zi_part, -1, -2), axis_name, scatter_dimension=len(lead),
        tiled=True,
    )
    # Natural order k = n2*k1 + k2: flattening (k1_local, k2) is already the
    # contiguous local slice of the spectrum.
    return zr.reshape(*lead, n1l * n2), zi.reshape(*lead, n1l * n2)


def fft_golden_check(xr, xi=None):
    """NumPy oracle with matching signature (host-side, tests only)."""
    x = np.asarray(xr, np.float64)
    if xi is not None:
        x = x + 1j * np.asarray(xi, np.float64)
    s = np.fft.fft(x, axis=-1)
    return s.real, s.imag
