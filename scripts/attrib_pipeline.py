"""Pipeline-level time attribution at the f32 tier (paired, interleaved).

Companion to scripts/ablate_spectrum.py (kernel-internal attribution):
this splits the FULL production dispatch (bench.py's C=8 x F=64 hybrid)
into its two halves, timed as whole programs interleaved per rep:

  pipe    the shipped hybrid: XLA window+IIR(HIGH) -> Pallas FFT kernel
  iir     the XLA half alone: window + sosfilt_blocked_composite(HIGH)
  kern    the Pallas half alone: spectrum_from_state bypass high3+kara
  io      device copy of the same 33 MB (transfer/launch floor)

Every chain evolves its own carried state (relay memoization hazard).

Run (TPU, ONE process): timeout 590 python scripts/attrib_pipeline.py
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
    from tpu_sdr.core.config import FilterMode, PipelineConfig
    from tpu_sdr.kernels import biquad, window
    from tpu_sdr.kernels.pallas import iir_fft
    from tpu_sdr.runtime import banks
    from tpu_sdr.runtime.stream import _MODE_TO_INDEX  # noqa: F401

    log(f"devices: {jax.devices()}")
    cfg = PipelineConfig(channels=C)
    sos = sps.butter(12, 0.25, output="sos")
    hann = window.hann_coefficients(N)
    from tpu_sdr.kernels import fft as fftmod

    plan = fftmod.plan_constants(cfg.fft_n1, cfg.fft_n2)
    bank = banks.build_bank(cfg, hann, plan, banks.prepare_sos(sos, cfg.n_sections))
    op, pp = bank["op"], bank["pp"]
    m = pp.state_dim

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((C, F * N)), jnp.float32)
    from jax.lax import Precision

    @jax.jit
    def step_pipe(x, zi):
        xw = (x.reshape(C, F, N) * hann).reshape(C, F * N)
        y, zf = biquad.sosfilt_blocked_composite(
            op, xw, zi, precision=Precision.HIGH)
        zs = jnp.zeros((C * F, m), jnp.float32)
        mag = iir_fft.spectrum_from_state(
            y.reshape(-1, N), zs, pp, precision="high3", bypass=True,
            apply_window=False, karatsuba=True)
        x1 = mag.reshape(C, F * N) * jnp.float32(1e-3) + zf[..., :1, 0]
        return x1, zf

    @jax.jit
    def step_iir(x, zi):
        xw = (x.reshape(C, F, N) * hann).reshape(C, F * N)
        y, zf = biquad.sosfilt_blocked_composite(
            op, xw, zi, precision=Precision.HIGH)
        return y * jnp.float32(1e-3), zf

    @jax.jit
    def step_kern(x, c):
        zs = jnp.zeros((C * F, m), jnp.float32)
        mag = iir_fft.spectrum_from_state(
            x.reshape(-1, N), zs, pp, precision="high3", bypass=True,
            apply_window=False, karatsuba=True)
        x1 = mag.reshape(C, F * N) * jnp.float32(1e-3) + c * jnp.float32(1e-7)
        return x1, c + 1.0

    @jax.jit
    def step_io(x, c):
        return x * jnp.float32(1.000001) + c * jnp.float32(1e-9), c + 1.0

    # bare pallas_call (the ablation harness's cat3 kernel): isolates the
    # spectrum_from_state wrapper's cost (zs ref, unused const refs, pad)
    import scripts.ablate_spectrum as ab

    twr8 = jnp.tile(plan["twr"], (1, 8))
    twi8 = jnp.tile(plan["twi"], (1, 8))
    raw_consts = [plan["w2r"], plan["w2i"], twr8, twi8,
                  plan["w1r"], plan["w1i"]]
    raw_step = ab.make_step("cat3", raw_consts)

    @jax.jit
    def step_kern_raw(x, c):
        x1, c1, _mag = raw_step(x.reshape(ab.F, ab.N), c)
        return x1.reshape(C, F * N), c1

    @jax.jit
    def step_kern_nokara(x, c):
        zs = jnp.zeros((C * F, m), jnp.float32)
        mag = iir_fft.spectrum_from_state(
            x.reshape(-1, N), zs, pp, precision="high3", bypass=True,
            apply_window=False, karatsuba=False)
        x1 = mag.reshape(C, F * N) * jnp.float32(1e-3) + c * jnp.float32(1e-7)
        return x1, c + 1.0

    zi0 = jnp.zeros((C, cfg.n_sections, 2), jnp.float32)
    chains = [
        Chain("pipe", step_pipe, x0, zi0),
        Chain("iir", step_iir, x0, zi0),
        Chain("kern", step_kern, x0, jnp.float32(1.0)),
        Chain("kern_raw", step_kern_raw, x0, jnp.float32(1.0)),
        Chain("kern_nokara", step_kern_nokara, x0, jnp.float32(1.0)),
        Chain("io", step_io, x0, jnp.float32(1.0)),
    ]
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
        "medians_ms": med,
        "slopes_ms": {k: [round(x * 1e3, 4) for x in v]
                      for k, v in slopes.items()},
        "samples_per_dispatch": C * F * N,
        "gsps_pipe": C * F * N / (med["pipe"] * 1e-3) / 1e9,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
