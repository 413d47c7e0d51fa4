"""Fixed-point 16-bit *scaled* FFT modeling the reference xfft core.

The reference drives the Xilinx xfft 9.1 IP with NO config-channel writes —
``imports/new/dsp_system_top.vhd:534-536`` ties ``s_axis_config_tdata`` to
zero and never asserts ``tvalid`` — so the core runs its power-on defaults:
forward transform and the default scaling schedule, which for the
pipelined-streaming architecture is an overall 1/N (two bits of right-shift
per radix-2^2 stage; Xilinx PG109). The IP is configured as 16-bit scaled
fixed point with truncation rounding and 16-bit phase factors
(``ip/xfft_0/xfft_0.xci``: ``scaling_options=scaled``,
``rounding_modes=truncation``, ``input_width/phase_factor_width=16``,
``transform_length=16384``).

This module models that arithmetic so the int16 words the FPGA drains onto
the wire (``imports/new/sequ2.vhd:153``) carry predictable amplitudes:

- radix-2 decimation-in-frequency pipeline, natural-order output;
- a 1-bit truncating (arithmetic) right-shift after every rank — the default
  schedule's 2 bits per radix-2^2 stage, split 1+1 across its two ranks;
- Q15 phase factors ``clip(round(w * 2^15), -32768, 32767)``; exponent-0
  rotations are bypassed exactly, as the radix-2^2 architecture's trivial
  rotations are;
- the complex-multiplier output truncated (>> 15, toward -inf) back to
  16 bits, saturated to int16.

Net gain is FFT/N plus bounded truncation noise. The model is
*schedule-faithful, not gate-exact*: Xilinx's internal rounding points are
proprietary, so the tests pin THIS model as the integer oracle and bound the
float path against it (``tests/test_q15.py``); the overall 1/N level — the
part that determines wire amplitudes — is exact.

``XFFT_WIRE_SCALE`` is the resulting float->wire conversion: the hardware
wire word is (1/N) * FFT(x_int16) = (2^15/N) * FFT(x_float) for Q15-normalized
float samples, i.e. scale 2.0 at N = 16384.
"""

from __future__ import annotations

import functools

import numpy as np

N_DEFAULT = 16384

# Hardware wire LSBs per unit float-spectrum amplitude: wire = (1/N)*FFT(x_q15)
# = (2^15/N)*FFT(x_float). See module docstring. 2.0 for the reference's 16K.
# Canonical definition lives in core/qformat (jax-free, shared with the
# transport layer); re-exported here next to the integer model it describes.
from tpu_sdr.core.qformat import xfft_wire_scale  # noqa: E402

Q15_FULL_SCALE = 1 << 15

XFFT_WIRE_SCALE = xfft_wire_scale(N_DEFAULT)


@functools.lru_cache(maxsize=8)
def bit_reverse_indices(n: int) -> np.ndarray:
    """idx such that natural_order[k] = dif_output[idx[k]]."""
    m = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for _ in range(m):
        rev = (rev << 1) | (idx & 1)
        idx >>= 1
    return rev


@functools.lru_cache(maxsize=8)
def plan_q15(n: int = N_DEFAULT):
    """Per-rank Q15 twiddle tables for the DIF pipeline (NumPy, cached).

    Returns dict with 'ranks': list over t of (w_re, w_im) int64 arrays of
    length n >> (t+1) (entry j is W_n^(j << t), Q15), and 'bitrev'.
    """
    m = n.bit_length() - 1
    if (1 << m) != n:
        raise ValueError(f"n must be a power of two, got {n}")
    ranks = []
    for t in range(m):
        half = n >> (t + 1)
        exp = (np.arange(half, dtype=np.int64) << t) % n
        ang = -2.0 * np.pi * exp / n
        w_re = np.clip(np.floor(np.cos(ang) * 32768.0 + 0.5), -32768, 32767)
        w_im = np.clip(np.floor(np.sin(ang) * 32768.0 + 0.5), -32768, 32767)
        ranks.append((w_re.astype(np.int64), w_im.astype(np.int64)))
    return {"ranks": ranks, "bitrev": bit_reverse_indices(n)}


def _sat16(x):
    return np.clip(x, -32768, 32767)


def fft_q15_np(x_re, x_im=None, schedule=None):
    """NumPy oracle: scaled fixed-point FFT of int16 frames (..., N).

    ``schedule`` is bits-of-shift per radix-2 rank (default all-ones = the
    xfft default 1/N). Returns (re, im) int16 natural order — the exact wire
    words of ``sequ2.vhd:153``.
    """
    re = np.asarray(x_re, dtype=np.int64)
    n = re.shape[-1]
    im = (
        np.zeros_like(re)
        if x_im is None
        else np.asarray(x_im, dtype=np.int64)
    )
    m = n.bit_length() - 1
    if schedule is None:
        schedule = (1,) * m
    plan = plan_q15(n)
    lead = re.shape[:-1]
    for t in range(m):
        half = n >> (t + 1)
        s = schedule[t]
        w_re, w_im = plan["ranks"][t]
        r = re.reshape(*lead, 1 << t, 2, half)
        i = im.reshape(*lead, 1 << t, 2, half)
        a_re, b_re = r[..., 0, :], r[..., 1, :]
        a_im, b_im = i[..., 0, :], i[..., 1, :]
        sum_re = _sat16((a_re + b_re) >> s)
        sum_im = _sat16((a_im + b_im) >> s)
        d_re = _sat16((a_re - b_re) >> s)
        d_im = _sat16((a_im - b_im) >> s)
        # complex multiply, truncate (>> 15 toward -inf), saturate; exponent-0
        # rotations bypassed exactly (j == 0 is the only zero exponent).
        p_re = _sat16((d_re * w_re - d_im * w_im) >> 15)
        p_im = _sat16((d_re * w_im + d_im * w_re) >> 15)
        p_re[..., 0] = d_re[..., 0]
        p_im[..., 0] = d_im[..., 0]
        re = np.stack([sum_re, p_re], axis=-2).reshape(*lead, n)
        im = np.stack([sum_im, p_im], axis=-2).reshape(*lead, n)
    br = plan["bitrev"]
    return re[..., br].astype(np.int16), im[..., br].astype(np.int16)


def _bitrev_transpose(x, n: int):
    """Bit-reversal as an axis transpose: reshape (..., 2^m) to m two-point
    axes, reverse their order, flatten. The SAME permutation ``bitrev``
    indexes (so outputs are bit-identical to the take form) expressed as a
    layout op instead of a gather — gathers are the TPU anti-pattern."""
    m = n.bit_length() - 1
    lead = x.shape[:-1]
    k = len(lead)
    xr = x.reshape(*lead, *((2,) * m))
    perm = tuple(range(k)) + tuple(k + m - 1 - t for t in range(m))
    return xr.transpose(perm).reshape(*lead, n)


def fft_q15(x_re, x_im=None, schedule=None, bitrev: str = "take"):
    """JAX version (jit-safe, int32 datapath) — bit-exact vs ``fft_q15_np``.

    Input int16/int32 (..., N); returns (re, im) int16 natural order. The 14
    ranks unroll statically under jit; every op is elementwise int32 (the
    32768*32767 products and their pairwise sums stay inside int32).

    ``bitrev``: "take" (gather by the precomputed index vector) or
    "transpose" (the same permutation as a 14-axis transpose — bit-identical
    outputs, different lowering; see the round-4 q15 attribution for which
    is faster on the chip).
    """
    import jax.numpy as jnp

    re = jnp.asarray(x_re, jnp.int32)
    n = re.shape[-1]
    im = (
        jnp.zeros_like(re)
        if x_im is None
        else jnp.asarray(x_im, jnp.int32)
    )
    m = n.bit_length() - 1
    if schedule is None:
        schedule = (1,) * m
    plan = plan_q15(n)
    lead = re.shape[:-1]

    def sat16(x):
        return jnp.clip(x, -32768, 32767)

    for t in range(m):
        half = n >> (t + 1)
        s = schedule[t]
        w_re = jnp.asarray(plan["ranks"][t][0], jnp.int32)
        w_im = jnp.asarray(plan["ranks"][t][1], jnp.int32)
        r = re.reshape(*lead, 1 << t, 2, half)
        i = im.reshape(*lead, 1 << t, 2, half)
        a_re, b_re = r[..., 0, :], r[..., 1, :]
        a_im, b_im = i[..., 0, :], i[..., 1, :]
        sum_re = sat16((a_re + b_re) >> s)
        sum_im = sat16((a_im + b_im) >> s)
        d_re = sat16((a_re - b_re) >> s)
        d_im = sat16((a_im - b_im) >> s)
        p_re = sat16((d_re * w_re - d_im * w_im) >> 15)
        p_im = sat16((d_re * w_im + d_im * w_re) >> 15)
        p_re = p_re.at[..., 0].set(d_re[..., 0])
        p_im = p_im.at[..., 0].set(d_im[..., 0])
        re = jnp.stack([sum_re, p_re], axis=-2).reshape(*lead, n)
        im = jnp.stack([sum_im, p_im], axis=-2).reshape(*lead, n)
    if bitrev == "transpose":
        return (
            _bitrev_transpose(re, n).astype(jnp.int16),
            _bitrev_transpose(im, n).astype(jnp.int16),
        )
    br = jnp.asarray(plan["bitrev"], jnp.int32)
    return (
        jnp.take(re, br, axis=-1).astype(jnp.int16),
        jnp.take(im, br, axis=-1).astype(jnp.int16),
    )
