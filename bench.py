"""Benchmark: sustained samples/sec/chip through window + IIR12 + 16K FFT.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
Baseline = the reference FPGA's 1 MSPS real-time rate (BASELINE.md);
target = >= 1 GSPS/chip (BASELINE.json north star). The extra fields carry
the whole perf story (VERDICT r1 item 3): per-tier throughput (f32 headline,
bf16, f32max), latency-mode single-frame time, and the roofline fraction
from the analytic cost model — so ARCHITECTURE.md's numbers are reproducible
artifacts, not prose.

Methodology notes (this container's axon TPU tunnel):
- first call pays a ~5-9 min remote compile (no terminal-side cache);
  progress goes to stderr so the driver sees liveness;
- host<->device sync round trips cost ~35 ms each, so naive per-dispatch
  timing measures the tunnel, not the chip. We time K=2 vs K=102 chained
  dispatches and take the slope — constant sync/launch overhead cancels;
- dispatch uniqueness: the carried StreamState (sos_state) is the previous
  dispatch's real output and evolves every step, so the relay's
  memoization of identical dispatches cannot replay the chain (CLAUDE.md
  measurement discipline). This is VERIFIED before timing
  (``assert_chain_unique``): if a refactor ever stops the state evolving,
  the bench fails loudly instead of silently timing cache replays.
  Folding the output into x (or into the state) OUTSIDE the jitted step
  was measured at +3.3 ms/dispatch regardless of fold size — any host-side
  jnp op between process calls costs a relay round trip — so the guard is
  an assertion, not an extra dispatch (interleaved A/B/C, 2026-08-20);
- optional tiers run only while the time budget (BENCH_BUDGET_S, default
  520 s) allows: the headline f32 number is never sacrificed to breadth.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

T_START = time.time()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "520"))


def log(msg):
    print(f"[{time.time() - T_START:6.1f}s] {msg}", file=sys.stderr, flush=True)


def remaining() -> float:
    return BUDGET_S - (time.time() - T_START)


def measure_tier(dtype: str, C: int, F: int, reps: int = 7, k_long: int = 102):
    """Median slope time per dispatch for one quality tier. Returns
    (samples_per_sec, per_dispatch_seconds, samples_per_dispatch)."""
    import jax
    import jax.numpy as jnp
    import scipy.signal as sps

    from tpu_sdr.core.config import FilterMode, PipelineConfig
    from tpu_sdr.runtime import SpectrumPipeline
    from tpu_sdr.runtime.state import StreamState

    cfg = PipelineConfig(channels=C, dtype=dtype)
    pipe = SpectrumPipeline(cfg)
    pipe.upload_sos(sps.butter(12, 0.25, output="sos"))
    n = cfg.fft_size
    samples_per_dispatch = C * F * n
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((C, F * n)), jnp.float32)
    state0 = StreamState(
        sos_state=jnp.zeros((C, cfg.n_sections, 2), jnp.float32),
        window_phase=jnp.zeros((), jnp.int32),
        frame_count=jnp.zeros((), jnp.int32),
    )

    log(f"bench[{dtype} C={C} F={F}]: compiling...")
    t0 = time.time()
    out, st1 = pipe.process(x0, state0, FilterMode.CUSTOM)
    float(out["magnitude"].ravel()[0])
    log(f"bench[{dtype}]: compile+first call {time.time() - t0:.1f}s")

    # Structural uniqueness guard: the carried state must differ between
    # consecutive dispatches (it is the previous dispatch's real output),
    # else every chained dispatch would be identical and the relay would
    # replay its cache. NOTE: sos_state alone is NOT enough — after an
    # 8.4-Msample dispatch the IIR transient from the initial condition
    # underflows f32 to exactly zero, so sos_state converges to a
    # bit-identical fixed point (measured: assert fired 2026-08-20). The
    # evolving frame_count is what keys every dispatch unique.
    _, st2 = pipe.process(x0, st1, FilterMode.CUSTOM)
    state_differs = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(st1), jax.tree.leaves(st2))
    )
    assert state_differs, (
        "carried StreamState is bit-identical across consecutive "
        "dispatches; the slope chain would time relay cache replays — fix "
        "the state threading before trusting any number from this bench"
    )

    def run_k(k: int) -> float:
        st = state0
        t0 = time.perf_counter()
        for _ in range(k):
            out, st = pipe.process(x0, st, FilterMode.CUSTOM)
        float(out["magnitude"].ravel()[0])  # one sync at the end
        return time.perf_counter() - t0

    run_k(3)  # warm the executable/queues
    slopes = []
    for rep in range(reps):
        t_short = min(run_k(2) for _ in range(2))
        t_long = min(run_k(k_long) for _ in range(2))
        slopes.append((t_long - t_short) / (k_long - 2))
        log(f"bench[{dtype}]: rep {rep}: per-dispatch {slopes[-1] * 1e3:.3f} ms")
        if remaining() < 30 and len(slopes) >= 3:
            log(f"bench[{dtype}]: budget low, stopping at {len(slopes)} reps")
            break
    slopes.sort()
    per_dispatch = slopes[len(slopes) // 2]
    rate = samples_per_dispatch / per_dispatch
    log(
        f"bench[{dtype}]: median per-dispatch {per_dispatch * 1e3:.3f} ms "
        f"=> {rate / 1e9:.2f} GSPS"
    )
    return rate, per_dispatch, samples_per_dispatch


def measure_latency_ms() -> float:
    """Latency mode: one 16K frame (C=1, F=1) per dispatch, slope-timed.
    The reference FPGA's figure is <10 ms acquisition-to-wire
    (README.md:168-169); ours is the single-frame device time."""
    _, per_dispatch, _ = measure_tier("f32", C=1, F=1, reps=3, k_long=52)
    return per_dispatch * 1e3


def main():
    import jax

    log(f"bench: devices = {jax.devices()}")
    log(f"bench: budget {BUDGET_S:.0f}s")

    # Headline: default f32 tier, C=8 x F=64 16K-frames per dispatch
    # (8.4 Msamples amortizes the tunnel's per-launch cost).
    C, F = 8, 64
    rate_f32, per_dispatch, spd = measure_tier("f32", C, F)

    extras: dict = {"tiers": {"f32": rate_f32}}

    # Roofline fraction from the analytic cost model (bench/roofline.py).
    try:
        from tpu_sdr.bench.roofline import roofline_report
        from tpu_sdr.core.config import PipelineConfig

        rep = roofline_report(
            PipelineConfig(channels=C), measured_samples_per_sec=rate_f32
        )
        extras["roofline"] = {
            "bound": rep["bound"],
            "ceiling_samples_per_sec": rep["ceiling_samples_per_sec"],
            "fraction_of_roofline": rep.get("fraction_of_ceiling"),
            "arithmetic_intensity": rep["arithmetic_intensity"],
        }
    except Exception as e:  # never lose the headline to the extras
        log(f"bench: roofline report failed: {type(e).__name__}: {e}")

    # Optional tiers + latency, budget permitting.
    if remaining() > 150:
        try:
            rate_bf16, _, _ = measure_tier("bf16", C, F, reps=5)
            extras["tiers"]["bf16"] = rate_bf16
        except Exception as e:
            log(f"bench: bf16 tier failed: {type(e).__name__}: {e}")
    else:
        log("bench: skipping bf16 tier (budget)")
    if remaining() > 150:
        try:
            rate_max, _, _ = measure_tier("f32max", C, F, reps=5)
            extras["tiers"]["f32max"] = rate_max
        except Exception as e:
            log(f"bench: f32max tier failed: {type(e).__name__}: {e}")
    else:
        log("bench: skipping f32max tier (budget)")
    if remaining() > 90:
        try:
            extras["latency_frame_ms"] = measure_latency_ms()
            extras["latency_target_ms"] = 10.0  # reference README.md:168-169
        except Exception as e:
            log(f"bench: latency mode failed: {type(e).__name__}: {e}")
    else:
        log("bench: skipping latency mode (budget)")

    print(
        json.dumps(
            {
                "metric": "samples_per_sec_per_chip_window_iir12_fft16k",
                "value": rate_f32,
                "unit": "samples/s",
                "vs_baseline": rate_f32 / 1_000_000.0,
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
