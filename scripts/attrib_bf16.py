"""bf16-tier pipeline attribution + glue-gap candidates (paired, interleaved).

Round-4 follow-up to scripts/attrib_pipeline.py (VERDICT r3 item 1): the bf16
tier ran at 0.21 of its roofline and ABOVE the f32-derived serial floor, so
the serial glue — hypothesis: the F=64-iteration ``lax.scan`` frame chain
between the IIR's two matmul phases, ~64 tiny sequential fusions — is the
binding constraint. Chains (each a full jitted program, bf16 tier settings:
XLA DEFAULT precision, Pallas "default"):

  pipe       the shipped bf16 hybrid: XLA window+IIR -> Pallas FFT kernel
  pipe_u     same, frame-chain lax.scan fully unrolled (BITWISE-identical
             semantics — unrolling changes scheduling, not arithmetic;
             asserted on-chip before timing)
  pipe_uy    pipe_u + y cast to bf16 between the halves (halves the y HBM
             round-trip; DEFAULT-precision MXU rounds dot inputs to bf16
             in hardware, so the kernel's magnitudes are expected bitwise
             equal — verified, not assumed)
  iir        the XLA half alone (window + sosfilt_blocked_composite DEFAULT)
  iir_u      the XLA half, scan unrolled
  kern       the Pallas half alone (spectrum_from_state bypass, default)
  kern_y     the Pallas half fed bf16 frames
  io         device copy of the same 33 MB (transfer/launch floor)

Every chain evolves its own carried state (relay memoization hazard:
inputs must derive from the previous dispatch's real output).

Run (TPU, ONE process): timeout 590 python scripts/attrib_bf16.py
Optional argv[1]: f32 — rerun the f32 tier with the unroll variant only
(the y-bf16 cast is NOT neutral under high3's hi/lo splits).
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
TIER = sys.argv[1] if len(sys.argv) > 1 else "bf16"


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

    log(f"devices: {jax.devices()}  tier={TIER}")
    cfg = PipelineConfig(channels=C, dtype=TIER)
    sos = sps.butter(12, 0.25, output="sos")
    hann = window.hann_coefficients(N)
    plan = fftmod.plan_constants(cfg.fft_n1, cfg.fft_n2)
    bank = banks.build_bank(cfg, hann, plan, banks.prepare_sos(sos, cfg.n_sections))
    op, pp = bank["op"], bank["pp"]
    m = pp.state_dim

    if TIER == "bf16":
        xla_prec, kprec, kara = Precision.DEFAULT, "default", False
    else:
        xla_prec, kprec, kara = Precision.HIGH, "high3", True

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((C, F * N)), jnp.float32)
    zi0 = jnp.zeros((C, cfg.n_sections, 2), jnp.float32)

    def iir_half(x, zi, unroll):
        """window + composite IIR, with a controllable frame-chain unroll.

        Mirrors biquad.sosfilt_blocked_composite exactly (same einsums, same
        scan step); ``unroll`` only changes lax.scan scheduling.
        """
        xw = (x.reshape(C, F, N) * hann).reshape(C, F, 128, 128)
        y_zs, zhat = biquad._composite_frame_terms(op, xw, xla_prec)
        z0 = zi.reshape(C, m)

        def step(z, w):
            return jnp.sum(op.ALB * z[..., None, :], axis=-1) + w, z

        w_frames = jnp.moveaxis(zhat[..., -1, :], 1, 0)
        z_final, z_starts = jax.lax.scan(step, z0, w_frames, unroll=unroll)
        z_starts = jnp.moveaxis(z_starts, 0, 1)
        y = biquad._composite_emit(op, y_zs, zhat, z_starts, xla_prec)
        return y.reshape(C, F * N), z_final.reshape(C, cfg.n_sections, 2)

    def kern_half(y):
        zs = jnp.zeros((C * F, m), jnp.float32)
        return iir_fft.spectrum_from_state(
            y.reshape(-1, N), zs, pp, precision=kprec, bypass=True,
            apply_window=False, karatsuba=kara,
        )

    def make_pipe(unroll, y_bf16):
        @jax.jit
        def step_pipe(x, zi):
            y, zf = iir_half(x, zi, unroll)
            if y_bf16:
                y = y.astype(jnp.bfloat16)
            mag = kern_half(y)
            x1 = mag.reshape(C, F * N) * jnp.float32(1e-3) + zf[..., :1, 0]
            return x1, zf

        return step_pipe

    def make_iir(unroll):
        @jax.jit
        def step_iir(x, zi):
            y, zf = iir_half(x, zi, unroll)
            return y * jnp.float32(1e-3), zf

        return step_iir

    def make_kern(y_bf16):
        @jax.jit
        def step_kern(x, c):
            y = x.astype(jnp.bfloat16) if y_bf16 else x
            mag = kern_half(y)
            x1 = mag.reshape(C, F * N) * jnp.float32(1e-3) + c * jnp.float32(1e-7)
            return x1, c + 1.0

        return step_kern

    @jax.jit
    def step_io(x, c):
        return x * jnp.float32(1.000001) + c * jnp.float32(1e-9), c + 1.0

    chains = [
        Chain("pipe", make_pipe(1, False), x0, zi0),
        Chain("pipe_u", make_pipe(F, False), x0, zi0),
        Chain("iir", make_iir(1), x0, zi0),
        Chain("iir_u", make_iir(F), x0, zi0),
        Chain("kern", make_kern(False), x0, jnp.float32(1.0)),
        Chain("io", step_io, x0, jnp.float32(1.0)),
    ]
    if TIER == "bf16":
        chains.insert(2, Chain("pipe_uy", make_pipe(F, True), x0, zi0))
        chains.insert(6, Chain("kern_y", make_kern(True), x0, jnp.float32(1.0)))

    # --- On-chip equivalence checks BEFORE timing ---------------------------
    # unroll must be bitwise-identical; y-bf16 expected bitwise (DEFAULT MXU
    # rounds inputs to bf16 in hardware) but verified, not assumed.
    t0 = time.time()
    y_ref, zf_ref = jax.jit(lambda x, z: iir_half(x, z, 1))(x0, zi0)
    y_u, zf_u = jax.jit(lambda x, z: iir_half(x, z, F))(x0, zi0)
    eq_unroll = bool(
        np.array_equal(np.asarray(y_ref), np.asarray(y_u))
        and np.array_equal(np.asarray(zf_ref), np.asarray(zf_u))
    )
    log(f"unroll bitwise-identical: {eq_unroll} ({time.time() - t0:.1f}s)")
    checks = {"unroll_bitwise": eq_unroll}
    if TIER == "bf16":
        m_ref = np.asarray(kern_half(y_ref))
        m_y = np.asarray(kern_half(y_ref.astype(jnp.bfloat16)))
        eq_y = bool(np.array_equal(m_ref, m_y))
        checks["y_bf16_bitwise"] = eq_y
        if not eq_y:
            d = np.abs(m_ref - m_y)
            checks["y_bf16_max_abs_diff"] = float(d.max())
            checks["y_bf16_rel"] = float(d.max() / max(np.abs(m_ref).max(), 1e-30))
        log(f"y-bf16 kernel bitwise: {checks}")

    for ch in chains:
        t0 = time.time()
        ch.run_k(1)
        log(f"{ch.name}: compile+first {time.time() - t0:.1f}s")
        ch.run_k(3)

    slopes = {ch.name: [] for ch in chains}
    for rep in range(6):
        for ch in chains:
            slopes[ch.name].append(ch.slope())
        log("rep %d: %s" % (
            rep, {k: f"{v[-1] * 1e3:.3f} ms" for k, v in slopes.items()}))

    med = {k: sorted(v)[len(v) // 2] * 1e3 for k, v in slopes.items()}
    out = {
        "tier": TIER,
        "checks": checks,
        "medians_ms": med,
        "slopes_ms": {k: [round(x * 1e3, 4) for x in v]
                      for k, v in slopes.items()},
        "samples_per_dispatch": C * F * N,
        "gsps_pipe": C * F * N / (med["pipe"] * 1e-3) / 1e9,
        "gsps_best": C * F * N / (min(med[k] for k in med
                                      if k.startswith("pipe")) * 1e-3) / 1e9,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
