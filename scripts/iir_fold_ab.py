"""On-chip A/B: fold the Hann window into the IIR operators.

The hybrid's XLA half materializes xw = x * hann (33 MB write + reads)
before the Toeplitz/forcing dots. Folding the window into per-block
operators — T_b = T o w_b (B, N, L), P_b = P o w_b (B, m, L), derived
once on device — turns the window into part of the batched dot, so xw
never touches HBM:

    y_zs[..., b, n] = sum_l (T[n,l] * w_b[l]) * x[..., b, l]

Same MACs (batch=128 GEMMs, M=C*F, K=L, N=128); different rounding
association than (window-then-dot), same error class. Chains evolve
their own state; interleaved A/B per rep.

Run (TPU, ONE process): timeout 590 python scripts/iir_fold_ab.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import scipy.signal as sps  # noqa: E402
from jax.lax import Precision  # noqa: E402

C, F = 8, 64
N = 16384
B = L = 128
T0 = time.time()


def log(msg):
    print(f"[{time.time() - T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


class Chain:
    def __init__(self, name, step, x0, carry0):
        self.name, self.step = name, step
        self.x, self.carry = x0, carry0

    def run_k(self, k):
        x, c = self.x, self.carry
        t0 = time.perf_counter()
        for _ in range(k):
            x, c = self.step(x, c)
        float(np.asarray(x.ravel()[0]))
        dt = time.perf_counter() - t0
        self.x, self.carry = x, c
        return dt

    def slope(self, k_long=102):
        ts = min(self.run_k(2) for _ in range(2))
        tl = min(self.run_k(k_long) for _ in range(2))
        return (tl - ts) / (k_long - 2)


def main():
    from tpu_sdr.core.config import PipelineConfig
    from tpu_sdr.kernels import biquad, window

    log(f"devices: {jax.devices()}")
    cfg = PipelineConfig(channels=C)
    sos = sps.butter(12, 0.25, output="sos")
    hann = window.hann_coefficients(N)
    op = biquad.precompute_composite(
        biquad.pad_sos(sos, cfg.n_sections), L, B)
    m = op.state_dim
    win_b = hann.reshape(B, L)
    # folded operators, derived on device (placement + one f32 multiply)
    Tw = op.T[None, :, :] * win_b[:, None, :]  # (B, N, L)
    Pw = op.P[None, :, :] * win_b[:, None, :]  # (B, m, L)

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((C, F * N)), jnp.float32)
    zi0 = jnp.zeros((C, cfg.n_sections, 2), jnp.float32)

    @jax.jit
    def step_iir(x, zi):
        xw = (x.reshape(C, F, N) * hann).reshape(C, F * N)
        y, zf = biquad.sosfilt_blocked_composite(
            op, xw, zi, precision=Precision.HIGH)
        return y * jnp.float32(1e-3), zf

    @jax.jit
    def step_fold(x, zi):
        v = x.reshape(C, F, B, L)
        z0 = zi.reshape(C, m)
        prec = Precision.HIGH
        y_zs = jnp.einsum("cfbl,bnl->cfbn", v, Tw, precision=prec)
        f = jnp.einsum("cfbl,bml->cfbm", v, Pw, precision=prec)
        zhat = jnp.einsum(
            "cfi,ji->cfj", f.reshape(C, F, B * m), op.W, precision=prec
        ).reshape(C, F, B, m)

        def step(z, w):
            return jnp.sum(op.ALB * z[..., None, :], axis=-1) + w, z

        w_frames = jnp.moveaxis(zhat[..., -1, :], 1, 0)
        z_final, z_starts = jax.lax.scan(step, z0, w_frames)
        z_starts = jnp.moveaxis(z_starts, 0, 1)
        z_end = (
            jnp.einsum("jab,cfb->cfja", op.APow, z_starts, precision=prec)
            + zhat
        )
        z_in = jnp.concatenate(
            [z_starts[..., None, :], z_end[..., :-1, :]], axis=-2)
        y = y_zs + jnp.einsum("nm,cfbm->cfbn", op.M, z_in, precision=prec)
        return (y.reshape(C, F * N) * jnp.float32(1e-3),
                z_final.reshape(C, cfg.n_sections, 2))

    @jax.jit
    def step_io(x, c):
        return x * jnp.float32(1.000001) + c * jnp.float32(1e-9), c + 1.0

    chains = [
        Chain("iir", step_iir, x0, zi0),
        Chain("fold", step_fold, x0, zi0),
        Chain("io", step_io, x0, jnp.float32(1.0)),
    ]
    # numeric sanity: same error class (not bitwise: different association)
    y_a, _ = step_iir(x0, zi0)
    y_b, _ = step_fold(x0, zi0)
    rel = float(jnp.max(jnp.abs(y_a - y_b)) / jnp.max(jnp.abs(y_a)))
    log(f"fold vs window-then-dot max rel diff: {rel:.3e}")

    for ch in chains:
        t0 = time.time()
        ch.run_k(1)
        log(f"{ch.name}: compile+first {time.time() - t0:.1f}s")
        ch.run_k(3)

    slopes = {ch.name: [] for ch in chains}
    for rep in range(7):
        for ch in chains:
            slopes[ch.name].append(ch.slope())
        log("rep %d: %s" % (
            rep, {k: f"{v[-1] * 1e3:.3f} ms" for k, v in slopes.items()}))

    med = {k: sorted(v)[len(v) // 2] * 1e3 for k, v in slopes.items()}
    print(json.dumps({
        "medians_ms": med,
        "slopes_ms": {k: [round(x * 1e3, 4) for x in v]
                      for k, v in slopes.items()},
        "max_rel_diff": rel,
    }), flush=True)


if __name__ == "__main__":
    main()
