"""Layout-tax A/B (round 5, VERDICT r4 item 1): kill the output relayout.

The r4 device traces showed the production dispatch spending 0.052 ms
(~17% of bf16, ~10% of f32) in ``%reshape.19`` — a pure relayout of the
Pallas kernel's (F, 128, 128) magnitude store into the (..., F, 16384)
consumer layout — plus ``%copy.44``-class layout copies. Three variants,
slope-timed INTERLEAVED in one process (CLAUDE.md discipline), carried
state threading every dispatch (relay-memoization guard):

  base     production path, pallas_flat_emit=False: kernel stores
           (F, 128, 128), XLA relayouts to (C, F, N)  [the r4 shape]
  flat     pallas_flat_emit=True: the kernel itself emits each frame as
           one flattened (N,)-lane row (in-kernel VMEM relayout), so the
           (C, F, N) view is a free bitcast — same bits
  blocked  CEILING: the kernel-native (C*F, 128, 128) array is the jit
           output, no flatten anywhere — what a consumer-side contract
           change would buy

Tiers: bf16 (largest tax) and f32 (headline). Writes
docs/measurements/layout_ab_r5.json.

Run (TPU, ONE process): timeout 590 python scripts/layout_ab.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import scipy.signal as sps  # noqa: E402

C, F, N = 8, 64, 16384
T0 = time.time()
REPS = int(os.environ.get("LAYOUT_AB_REPS", "5"))


def log(msg):
    print(f"[{time.time() - T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


class PipeChain:
    """Carried-state chain over SpectrumPipeline.process (the real path)."""

    def __init__(self, name, cfg):
        from tpu_sdr.core.config import FilterMode
        from tpu_sdr.runtime import SpectrumPipeline
        from tpu_sdr.runtime.state import StreamState

        self.name = name
        self.mode = FilterMode.CUSTOM
        self.pipe = SpectrumPipeline(cfg)
        self.pipe.upload_sos(sps.butter(12, 0.25, output="sos"))
        rng = np.random.default_rng(0)
        self.x = jnp.asarray(rng.standard_normal((C, F * N)), jnp.float32)
        self.st = StreamState(
            sos_state=jnp.zeros((C, cfg.n_sections, 2), jnp.float32),
            window_phase=jnp.zeros((), jnp.int32),
            frame_count=jnp.zeros((), jnp.int32),
        )

    def _step(self, st):
        out, st = self.pipe.process(self.x, st, self.mode)
        return out["magnitude"], st

    def warm(self):
        t0 = time.time()
        mag, st1 = self._step(self.st)
        float(mag.ravel()[0])
        log(f"{self.name}: compile+first {time.time() - t0:.1f}s")
        _, st2 = self._step(st1)
        assert any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree.leaves(st1), jax.tree.leaves(st2))
        ), "state must evolve (memoization guard)"
        self.st = st2
        self.run_k(3)
        return mag

    def run_k(self, k):
        st = self.st
        t0 = time.perf_counter()
        for _ in range(k):
            mag, st = self._step(st)
        float(mag.ravel()[0])
        dt = time.perf_counter() - t0
        self.st = st
        return dt

    def slope(self, k_long=102):
        ts = min(self.run_k(2) for _ in range(2))
        tl = min(self.run_k(k_long) for _ in range(2))
        return (tl - ts) / (k_long - 2)


class BlockedChain(PipeChain):
    """Ceiling: hybrid step replicated with blocked_output=True — the
    kernel-native (C*F, 128, 128) magnitudes ARE the jit output."""

    def __init__(self, name, cfg):
        super().__init__(name, cfg)
        from tpu_sdr.kernels.pallas import iir_fft
        from tpu_sdr.runtime.state import StreamState
        from tpu_sdr.runtime.stream import (
            _iir_precision, _kernel_karatsuba, _kernel_out_dtype,
            _kernel_precision, _maybe_bf16_y, _run_iir,
        )

        bank = self.pipe.bank_custom
        hann_w = self.pipe.hann_w
        pp = bank["pp"]
        m = pp.state_dim
        n = cfg.fft_size

        @jax.jit
        def step(x, st):
            t = x.shape[-1]
            nf = t // n
            xw = (x.reshape(C, nf, n) * hann_w).reshape(C, t)
            y, zf = _run_iir(
                bank["op"], xw, st.sos_state, _iir_precision(cfg), None
            )
            zs = jnp.zeros((C * nf, m), jnp.float32)
            mag3 = iir_fft.spectrum_from_state(
                _maybe_bf16_y(cfg, y).reshape(-1, n), zs, pp,
                precision=_kernel_precision(cfg), bypass=True,
                apply_window=False, karatsuba=_kernel_karatsuba(cfg),
                out_dtype=_kernel_out_dtype(cfg), blocked_output=True,
            )
            st2 = StreamState(
                sos_state=zf,
                window_phase=(st.window_phase + t) % n,
                frame_count=st.frame_count + nf,
            )
            return mag3, st2

        self._jstep = step

    def _step(self, st):
        return self._jstep(self.x, st)


def main():
    from tpu_sdr.core.config import PipelineConfig

    log(f"devices: {jax.devices()}")
    # warm-window probe (CLAUDE.md: record transfer health with any rate)
    t0 = time.time()
    probe = jnp.asarray(np.zeros((256, 2048), np.float32))
    probe.block_until_ready()
    probe_ms = (time.time() - t0) * 1e3
    log(f"2MB upload probe: {probe_ms:.1f} ms")

    chains = []
    for tier in ("bf16", "f32"):
        cfg0 = PipelineConfig(channels=C, dtype=tier)
        cfg1 = PipelineConfig(channels=C, dtype=tier, pallas_flat_emit=True)
        chains.append(PipeChain(f"{tier}_base", cfg0))
        chains.append(PipeChain(f"{tier}_flat", cfg1))
        chains.append(BlockedChain(f"{tier}_blocked", cfg0))

    # bitwise equivalence on-chip BEFORE timing: flat == base == blocked
    mags = {ch.name: np.asarray(ch.warm()) for ch in chains}
    checks = {}
    for tier in ("bf16", "f32"):
        base = mags[f"{tier}_base"]
        checks[f"{tier}_flat_bitwise"] = bool(
            np.array_equal(base, mags[f"{tier}_flat"])
        )
        checks[f"{tier}_blocked_bitwise"] = bool(
            np.array_equal(
                base.reshape(-1, N),
                mags[f"{tier}_blocked"].reshape(-1, N),
            )
        )
    log(f"checks: {checks}")
    assert all(checks.values()), f"layout variants not bitwise: {checks}"

    slopes = {ch.name: [] for ch in chains}
    for rep in range(REPS):
        for ch in chains:
            slopes[ch.name].append(ch.slope())
        log("rep %d: %s" % (
            rep, {k: f"{v[-1] * 1e3:.3f} ms" for k, v in slopes.items()}))

    med = {k: sorted(v)[len(v) // 2] * 1e3 for k, v in slopes.items()}
    paired = {}
    for tier in ("bf16", "f32"):
        b = slopes[f"{tier}_base"]
        paired[tier] = {
            "flat_minus_base_ms": [
                round((f - x) * 1e3, 4)
                for f, x in zip(slopes[f"{tier}_flat"], b)
            ],
            "blocked_minus_base_ms": [
                round((f - x) * 1e3, 4)
                for f, x in zip(slopes[f"{tier}_blocked"], b)
            ],
        }
    out = {
        "probe_upload_ms_2MB": round(probe_ms, 1),
        "checks": checks,
        "medians_ms": {k: round(v, 4) for k, v in med.items()},
        "slopes_ms": {k: [round(x * 1e3, 4) for x in v]
                      for k, v in slopes.items()},
        "paired_deltas": paired,
        "samples_per_dispatch": C * F * N,
        "gsps": {k: round(C * F * N / (v * 1e-3) / 1e9, 2)
                 for k, v in med.items()},
        "reps": REPS,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "measurements",
        "layout_ab_r5.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
