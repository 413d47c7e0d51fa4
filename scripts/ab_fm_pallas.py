"""On-chip interleaved A/B: fused Mosaic FM kernel vs the XLA path.

Round-2 verdict #4: the fused FM kernel (`kernels/pallas/affine_scan.
fm_demod_pallas`, `FMDemodulator(use_pallas=True)`) shipped bitwise-
tested but with no on-chip timing verdict ("pending a healthy tunnel
window"). This script settles it: both paths chained on their own
carried DemodState (every dispatch unique — relay memoization hazard),
one slope per variant per rep, INTERLEAVED A,B,A,B (CLAUDE.md
measurement discipline: sequential same-process A/B has produced
2x phantom wins).

Run (TPU, ONE process): timeout 590 python scripts/ab_fm_pallas.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpu_sdr.kernels.demod import FMDemodulator  # noqa: E402

C = 8
T = 1 << 20  # 1 Msample per channel -> 8.4 Msamples per dispatch
T0 = time.time()


def log(msg):
    print(f"[{time.time() - T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


class Chain:
    """One FM path chained on its own evolving state + input feedback."""

    def __init__(self, fm: FMDemodulator, re0, im0):
        self.fm = fm
        self.re, self.im = re0, im0
        self.st = fm.initial_state((C,))

        @jax.jit
        def fold(audio, re, im):
            # rotate the input planes by the audio (bounded, evolving) so
            # consecutive dispatch inputs differ; stays inside the jitted
            # step (host-side folds cost +3.3 ms/dispatch, measured)
            g = jnp.tanh(audio) * jnp.float32(0.05)
            return re + g, im - g

        self._fold = fold

    def run_k(self, k):
        re, im, st = self.re, self.im, self.st
        t0 = time.perf_counter()
        for _ in range(k):
            audio, st = self.fm.process(re, im, st)
            re, im = self._fold(audio, re, im)
        float(np.asarray(audio.ravel()[0]))
        dt = time.perf_counter() - t0
        self.re, self.im, self.st = re, im, st
        return dt

    def slope(self, k_long=52):
        ts = min(self.run_k(2) for _ in range(2))
        tl = min(self.run_k(k_long) for _ in range(2))
        return (tl - ts) / (k_long - 2)


def main():
    log(f"devices: {jax.devices()}")
    fs = 200e3
    rng = np.random.default_rng(0)
    ph = np.cumsum(rng.standard_normal((C, T)) * 0.2, axis=-1)
    re0 = jnp.asarray(np.cos(ph), jnp.float32)
    im0 = jnp.asarray(np.sin(ph), jnp.float32)

    xla = Chain(FMDemodulator(fs, deviation_hz=75e3, deemphasis_tau=75e-6,
                              use_pallas=False), re0, im0)
    pls = Chain(FMDemodulator(fs, deviation_hz=75e3, deemphasis_tau=75e-6,
                              use_pallas=True), re0, im0)
    for name, ch in (("xla", xla), ("pallas", pls)):
        t0 = time.time()
        ch.run_k(1)
        log(f"{name}: compile+first {time.time() - t0:.1f}s")
        ch.run_k(3)

    slopes = {"xla": [], "pallas": []}
    for rep in range(7):
        for name, ch in (("xla", xla), ("pallas", pls)):
            slopes[name].append(ch.slope())
        log("rep %d: %s" % (
            rep, {k: f"{v[-1] * 1e3:.3f} ms" for k, v in slopes.items()}))

    med = {k: sorted(v)[len(v) // 2] * 1e3 for k, v in slopes.items()}
    out = {
        "medians_ms": med,
        "slopes_ms": {k: [round(x * 1e3, 4) for x in v]
                      for k, v in slopes.items()},
        "samples_per_dispatch": C * T,
        "gsps": {k: C * T / (m * 1e-3) / 1e9 for k, m in med.items()},
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
