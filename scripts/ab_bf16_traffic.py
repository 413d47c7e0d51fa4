"""bf16-tier HBM-traffic A/B: mag-bf16 out, y-bf16, and the bf16 two-pass.

Round-4 follow-up to scripts/attrib_bf16.py, which established (interleaved,
on-chip) that the frame-chain scan is NOT the bf16 gap (unroll neutral) and
that the Pallas kernel halves when fed bf16 frames standalone — i.e. the
tier is HBM-traffic-bound. Candidates that actually remove HBM bytes:

  pipe     shipped bf16 hybrid (x in 4 + y round-trip 8 + mag out 4 B/sample)
  pipe_mb  hybrid + bf16 magnitudes (saves 2 B/sample of write-back)
  pipe_ymb hybrid + y cast bf16 + bf16 magnitudes (saves 6 B/sample if XLA
           fuses the y convert into the IIR emit epilogue)
  tp       fused two-pass bf16 (never measured: the r3 two-pass losses were
           f32/f32max only): x read twice, NO y round-trip -> 10 B/sample
  tp_mb    two-pass + bf16 magnitudes -> 8 B/sample
  io       33 MB copy floor

Equivalence: mag-bf16 is the f32 kernel result rounded once on store
(verified on-chip below); the two-pass is a different (exact-class)
computation — its values differ from the hybrid's but all streaming
invariance contracts hold within it.

Run (TPU, ONE process): timeout 590 python scripts/ab_bf16_traffic.py
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
    cfg = PipelineConfig(channels=C, dtype="bf16")
    sos = sps.butter(12, 0.25, output="sos")
    hann = window.hann_coefficients(N)
    plan = fftmod.plan_constants(cfg.fft_n1, cfg.fft_n2)
    bank = banks.build_bank(cfg, hann, plan, banks.prepare_sos(sos, cfg.n_sections))
    op, pp = bank["op"], bank["pp"]
    m = pp.state_dim

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((C, F * N)), jnp.float32)
    zi0 = jnp.zeros((C, cfg.n_sections, 2), jnp.float32)

    def iir_half(x, zi):
        xw = (x.reshape(C, F, N) * hann).reshape(C, F * N)
        return biquad.sosfilt_blocked_composite(
            op, xw, zi, precision=Precision.DEFAULT
        )

    def kern_half(y, out_dtype):
        zs = jnp.zeros((C * F, m), jnp.float32)
        return iir_fft.spectrum_from_state(
            y.reshape(-1, N), zs, pp, precision="default", bypass=True,
            apply_window=False, out_dtype=out_dtype,
        )

    def feedback(mag, zf):
        x1 = mag.reshape(C, F * N).astype(jnp.float32) * jnp.float32(1e-3)
        return x1 + zf[..., :1, 0]

    def make_hybrid(y_bf16, out_dtype):
        @jax.jit
        def step(x, zi):
            y, zf = iir_half(x, zi)
            if y_bf16:
                y = y.astype(jnp.bfloat16)
            mag = kern_half(y, out_dtype)
            return feedback(mag, zf), zf

        return step

    def make_twopass(out_dtype):
        @jax.jit
        def step(x, zi):
            flat = x.reshape(-1, N)
            w = iir_fft.iir_summaries(
                flat, pp, precision="default"
            ).reshape(C, F, m)
            z0 = zi.reshape(C, m)

            def chain(z, wf):
                return jnp.sum(pp.ALB * z[..., None, :], axis=-1) + wf, z

            wF = jnp.moveaxis(w, 1, 0)
            z_final, z_starts = jax.lax.scan(chain, z0, wF)
            z_starts = jnp.moveaxis(z_starts, 0, 1)  # (C, F, m)
            mag = iir_fft.spectrum_from_state(
                flat, z_starts.reshape(-1, m), pp, precision="default",
                out_dtype=out_dtype,
            )
            zf = z_final.reshape(C, cfg.n_sections, 2)
            return feedback(mag, zf), zf

        return step

    @jax.jit
    def step_io(x, c):
        return x * jnp.float32(1.000001) + c * jnp.float32(1e-9), c + 1.0

    chains = [
        Chain("pipe", make_hybrid(False, "float32"), x0, zi0),
        Chain("pipe_mb", make_hybrid(False, "bfloat16"), x0, zi0),
        Chain("pipe_ymb", make_hybrid(True, "bfloat16"), x0, zi0),
        Chain("tp", make_twopass("float32"), x0, zi0),
        Chain("tp_mb", make_twopass("bfloat16"), x0, zi0),
        Chain("io", step_io, x0, jnp.float32(1.0)),
    ]

    # --- On-chip equivalence checks BEFORE timing ---------------------------
    y_ref, _zf = jax.jit(iir_half)(x0, zi0)
    m_ref = np.asarray(kern_half(y_ref, "float32"))
    m_mb = np.asarray(kern_half(y_ref, "bfloat16"))
    eq_round = bool(
        np.array_equal(
            np.asarray(jnp.asarray(m_ref).astype(jnp.bfloat16)), m_mb
        )
    )
    checks = {"mag_bf16_is_rounded_f32": eq_round}
    # two-pass vs hybrid: different computation, report closeness only
    tp_mag_step = make_twopass("float32")
    x1_tp, _ = tp_mag_step(x0, zi0)
    x1_h, _ = make_hybrid(False, "float32")(x0, zi0)
    d = np.abs(np.asarray(x1_tp) - np.asarray(x1_h))
    checks["twopass_vs_hybrid_max_abs"] = float(d.max())
    checks["twopass_vs_hybrid_rel"] = float(
        d.max() / max(np.abs(np.asarray(x1_h)).max(), 1e-30)
    )
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
    best = min((v, k) for k, v in med.items() if k != "io")
    out = {
        "checks": checks,
        "medians_ms": med,
        "slopes_ms": {k: [round(x * 1e3, 4) for x in v]
                      for k, v in slopes.items()},
        "samples_per_dispatch": C * F * N,
        "gsps_pipe": C * F * N / (med["pipe"] * 1e-3) / 1e9,
        "best": best[1],
        "gsps_best": C * F * N / (best[0] * 1e-3) / 1e9,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
