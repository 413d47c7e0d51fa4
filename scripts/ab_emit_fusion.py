"""Emit-fusion A/B: one concat-K dot for the IIR output vs the shipped
two-dot form (round 4).

Shipped XLA IIR emit (biquad._composite_frame_terms + _composite_emit):

    y_zs = v @ T^T          # (..., B, L): 33 MB dot output materialized
    y    = y_zs + z_in @ M^T  # second dot, epilogue add reads y_zs back

Candidate: y[b] = [v[b] | z_in[b]] @ [T | M]^T — a single dot with
K = L + m = 140 (pads to two 128-K tiles on the MXU, ~2x the Toeplitz
MXU work) that never materializes y_zs: trades ~66 MB of HBM for
~2.1 GMAC x passes of MXU per dispatch. Predicted net: -0.05 ms (f32),
-0.07 ms (bf16) per 8.4-Msample dispatch.

Chains (interleaved, carried-state, output-fed):
  f32        shipped hybrid, f32 tier
  f32_fuse   emit-fused hybrid, f32 tier
  bf16       shipped hybrid, bf16 tier
  bf16_fuse  emit-fused hybrid, bf16 tier
  io         copy floor

Values change within tier tolerance (single-K accumulation order differs
from dot+add); the bitwise streaming contracts are unaffected because the
change would ship in EVERY path (plain/timesharded/bank) identically.

Run (TPU, ONE process): timeout 590 python scripts/ab_emit_fusion.py
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

C, F, N = 8, 64, 16384
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
    from jax.lax import Precision

    from tpu_sdr.core.config import PipelineConfig
    from tpu_sdr.kernels import biquad, window
    from tpu_sdr.kernels import fft as fftmod
    from tpu_sdr.kernels.pallas import iir_fft
    from tpu_sdr.runtime import banks

    log(f"devices: {jax.devices()}")
    cfg = PipelineConfig(channels=C)
    sos = sps.butter(12, 0.25, output="sos")
    hann = window.hann_coefficients(N)
    plan = fftmod.plan_constants(cfg.fft_n1, cfg.fft_n2)
    bank = banks.build_bank(cfg, hann, plan, banks.prepare_sos(sos, cfg.n_sections))
    op, pp = bank["op"], bank["pp"]
    m = pp.state_dim
    L, B = op.block, op.frame_blocks
    # [T | M] along the K axis: (L, L + m)
    TM = jnp.concatenate([op.T, op.M], axis=1)

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((C, F * N)), jnp.float32)
    zi0 = jnp.zeros((C, cfg.n_sections, 2), jnp.float32)

    def iir_fused(x, zi, prec):
        """Hybrid XLA half with the emit fused into one concat-K dot."""
        xw = (x.reshape(C, F, N) * hann).reshape(C, F, B, L)
        f = jnp.einsum("...bl,cl->...bc", xw, op.P, precision=prec)
        lead = f.shape[:-2]
        zhat = jnp.einsum(
            "...i,ji->...j", f.reshape(*lead, B * m), op.W, precision=prec
        ).reshape(*lead, B, m)
        z0 = zi.reshape(C, m)

        def step(z, w):
            return jnp.sum(op.ALB * z[..., None, :], axis=-1) + w, z

        w_frames = jnp.moveaxis(zhat[..., -1, :], 1, 0)
        z_final, z_starts = jax.lax.scan(step, z0, w_frames)
        z_starts = jnp.moveaxis(z_starts, 0, 1)  # (C, F, m)
        z_end = (
            jnp.einsum("jab,...b->...ja", op.APow, z_starts, precision=prec)
            + zhat
        )
        z_in = jnp.concatenate(
            [z_starts[..., None, :], z_end[..., :-1, :]], axis=-2
        )
        vz = jnp.concatenate([xw, z_in], axis=-1)  # (..., B, L+m)
        y = jnp.einsum("...bk,nk->...bn", vz, TM, precision=prec)
        return y.reshape(C, F * N), z_final.reshape(C, cfg.n_sections, 2)

    def iir_ship(x, zi, prec):
        xw = (x.reshape(C, F, N) * hann).reshape(C, F * N)
        return biquad.sosfilt_blocked_composite(op, xw, zi, precision=prec)

    def kern_half(y, kprec, kara):
        zs = jnp.zeros((C * F, m), jnp.float32)
        return iir_fft.spectrum_from_state(
            y.reshape(-1, N), zs, pp, precision=kprec, bypass=True,
            apply_window=False, karatsuba=kara,
        )

    def make_pipe(fused, tier):
        prec = Precision.HIGH if tier == "f32" else Precision.DEFAULT
        kprec = "high3" if tier == "f32" else "default"
        kara = tier == "f32"

        @jax.jit
        def step(x, zi):
            y, zf = (iir_fused if fused else iir_ship)(x, zi, prec)
            mag = kern_half(y, kprec, kara)
            x1 = mag.reshape(C, F * N) * jnp.float32(1e-3) + zf[..., :1, 0]
            return x1, zf

        return step

    @jax.jit
    def step_io(x, c):
        return x * jnp.float32(1.000001) + c * jnp.float32(1e-9), c + 1.0

    chains = [
        Chain("f32", make_pipe(False, "f32"), x0, zi0),
        Chain("f32_fuse", make_pipe(True, "f32"), x0, zi0),
        Chain("bf16", make_pipe(False, "bf16"), x0, zi0),
        Chain("bf16_fuse", make_pipe(True, "bf16"), x0, zi0),
        Chain("io", step_io, x0, jnp.float32(1.0)),
    ]

    # numeric sanity: fused vs shipped y (same tier) stays in-class
    y_s, _ = jax.jit(lambda x, z: iir_ship(x, z, Precision.HIGH))(x0, zi0)
    y_f, _ = jax.jit(lambda x, z: iir_fused(x, z, Precision.HIGH))(x0, zi0)
    d = np.abs(np.asarray(y_s) - np.asarray(y_f))
    rel = float(d.max() / max(np.abs(np.asarray(y_s)).max(), 1e-30))
    checks = {"f32_fused_vs_shipped_rel": rel}
    log(f"checks: {checks}")

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
    out = {
        "checks": checks,
        "medians_ms": med,
        "slopes_ms": {k: [round(x * 1e3, 4) for x in v]
                      for k, v in slopes.items()},
        "samples_per_dispatch": C * F * N,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
