"""On-chip A/B: half-spectrum kernel — round 4: IN-KERNEL mirror.

The r3 loss was the XLA mirror epilogue (an extra ~66 MB HBM pass); the
mirror now rides two tiny permutation dots inside the kernel, so the
~44% DFT saving faces no HBM penalty. Measured at f32 AND bf16 tiers.

Round-2 measured half-spectrum neutral-to-slower "because the kernel is
VPU/layout-bound at low precision". Round 3 overturned that diagnosis —
the kernel was precision-bound, and cat3 cut that cost, raising the MXU
share — so the ~44% MXU saving of computing only k2 in [0, 64] deserves
a re-measure at the PIPELINE level (the bench's hybrid dispatch).

Run (TPU, ONE process): timeout 590 python scripts/half_spectrum_ab.py
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
    from tpu_sdr.kernels import fft as fftmod
    from tpu_sdr.kernels.pallas import iir_fft
    from tpu_sdr.runtime import banks

    log(f"devices: {jax.devices()}")
    cfg = PipelineConfig(channels=C)
    sos = sps.butter(12, 0.25, output="sos")
    hann = window.hann_coefficients(N)
    plan = fftmod.plan_constants(cfg.fft_n1, cfg.fft_n2)
    bank = banks.build_bank(cfg, hann, plan,
                            banks.prepare_sos(sos, cfg.n_sections))
    op, pp = bank["op"], bank["pp"]
    m = pp.state_dim

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((C, F * N)), jnp.float32)
    zi0 = jnp.zeros((C, cfg.n_sections, 2), jnp.float32)

    def make_pipe(half, tier="f32"):
        prec = Precision.HIGH if tier == "f32" else Precision.DEFAULT
        kprec = "high3" if tier == "f32" else "default"
        kara = tier == "f32"

        @jax.jit
        def step(x, zi):
            xw = (x.reshape(C, F, N) * hann).reshape(C, F * N)
            y, zf = biquad.sosfilt_blocked_composite(
                op, xw, zi, precision=prec)
            zs = jnp.zeros((C * F, m), jnp.float32)
            mag = iir_fft.spectrum_from_state(
                y.reshape(-1, N), zs, pp, precision=kprec, bypass=True,
                apply_window=False, half_spectrum=half, karatsuba=kara)
            x1 = mag.reshape(C, F * N) * jnp.float32(1e-3) + zf[..., :1, 0]
            return x1, zf
        return step

    @jax.jit
    def step_io(x, c):
        return x * jnp.float32(1.000001) + c * jnp.float32(1e-9), c + 1.0

    full = Chain("full", make_pipe(False), x0, zi0)
    half = Chain("half", make_pipe(True), x0, zi0)
    full_b = Chain("full_bf16", make_pipe(False, "bf16"), x0, zi0)
    half_b = Chain("half_bf16", make_pipe(True, "bf16"), x0, zi0)
    io = Chain("io", step_io, x0, jnp.float32(1.0))

    # numerics: half mirrors the conjugate-symmetric rows — compare
    x1f, _ = full.step(x0, zi0)
    x1h, _ = half.step(x0, zi0)
    same = bool(jnp.all(x1f == x1h))
    rel = float(jnp.max(jnp.abs(x1f - x1h)) / jnp.max(jnp.abs(x1f)))
    log(f"half == full bitwise: {same}; max rel diff {rel:.3e}")

    chains = (full, half, full_b, half_b, io)
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
        "bitwise": same,
        "max_rel_diff": rel,
        "gsps": {k: C * F * N / (v * 1e-3) / 1e9 for k, v in med.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
