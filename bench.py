"""Benchmark: sustained samples/sec/chip through window + IIR12 + 16K FFT.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
Baseline = the reference FPGA's 1 MSPS real-time rate (BASELINE.md);
target = >= 1 GSPS/chip (BASELINE.json north star). The extra fields carry
the whole perf story (VERDICT r1 item 3): per-tier throughput (f32 headline,
bf16, f32max), latency-mode single-frame time, and the roofline fraction
from the analytic cost model — so ARCHITECTURE.md's numbers are reproducible
artifacts, not prose.

Methodology notes (this container's axon TPU tunnel):
- first call pays a remote compile with no terminal-side cache — usually
  seconds, measured as bad as ~5 min of constant-upload + compile on a
  degraded tunnel day; progress goes to stderr so the driver sees liveness,
  and a SIGTERM/SIGINT handler emits the headline JSON line if an outer
  ``timeout`` fires after the f32 tier completed but before the optional
  tiers finish — the headline is never sacrificed to breadth;
- host<->device sync round trips cost ~35 ms each, so naive per-dispatch
  timing measures the tunnel, not the chip. We time K=2 vs K=102 chained
  dispatches and take the slope — constant sync/launch overhead cancels;
- dispatch uniqueness: each tier carries ONE StreamState across every
  chained dispatch it ever issues (the state is the previous dispatch's
  real output; frame_count strictly increases for the life of the process),
  so no two dispatches in the whole run are identical and the relay's
  memoization of identical dispatches can never replay a chain — not within
  a rep, and not across reps (restarting each rep from state0 would make
  rep N a bit-identical replay candidate of rep N-1). This is VERIFIED
  before timing: if a refactor ever stops the state evolving, the bench
  fails loudly instead of silently timing cache replays. Folding the output
  into x OUTSIDE the jitted step was measured at +3.3 ms/dispatch — any
  host-side jnp op between process calls costs a relay round trip — so the
  guard is state threading + an assertion, not an extra dispatch;
- tier comparison discipline (CLAUDE.md): the bf16/f32max tiers are
  measured INTERLEAVED with f32 re-reps (A,B,C per round, one process),
  because sequential same-process A/B has produced 1.7-2.5x phantom wins
  that vanish under interleaving. The HEADLINE is the f32 median of those
  same interleaved rounds (VERDICT r3 item 2): one slope set feeds both
  the headline and the tier dict, so the headline can never regress while
  the tier medians improve just because a separate block caught a bad
  co-tenancy window. A 2-slope provisional headline lands first (before
  any optional compile can eat the budget) purely as SIGTERM insurance;
  ``headline_mode`` records which one the emitted value is, and
  ``headline_spread`` carries the min/median/max of the headline slopes;
- optional tiers run only while the time budget (BENCH_BUDGET_S, default
  520 s) allows: the headline f32 number is never sacrificed to breadth.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

import numpy as np

T_START = time.time()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "520"))

# Filled in as results arrive; emitted exactly once (at exit or on SIGTERM).
RESULT: dict | None = None
_EMITTED = False


def log(msg):
    print(f"[{time.time() - T_START:6.1f}s] {msg}", file=sys.stderr, flush=True)


def remaining() -> float:
    return BUDGET_S - (time.time() - T_START)


def emit_result():
    """Print the single contracted JSON line (idempotent)."""
    global _EMITTED
    if _EMITTED or RESULT is None:
        return
    _EMITTED = True
    print(json.dumps(RESULT), flush=True)


def _on_term(signum, frame):
    # An outer `timeout` fired mid-optional-tier: emit the completed
    # headline rather than dying with zero output.
    log(f"bench: signal {signum} — emitting headline and exiting")
    emit_result()
    os._exit(0 if _EMITTED else 124)


def tier_config(tier: str, C: int):
    """Tier label -> PipelineConfig (tier labels are a superset of dtypes)."""
    from tpu_sdr.core.config import PipelineConfig

    if tier == "bf16io":
        return PipelineConfig(channels=C, dtype="bf16", bf16_io=True)
    return PipelineConfig(channels=C, dtype=tier)


class TierRunner:
    """One quality tier's pipeline + carried state + slope timing.

    The carried ``self.st`` threads through EVERY dispatch this runner ever
    issues, so all dispatches in the process are globally unique (see module
    docstring: relay memoization hazard).
    """

    def __init__(self, dtype: str, C: int, F: int):
        import jax
        import jax.numpy as jnp
        import scipy.signal as sps

        from tpu_sdr.core.config import FilterMode, PipelineConfig
        from tpu_sdr.runtime import SpectrumPipeline
        from tpu_sdr.runtime.state import StreamState

        # ``dtype`` is the TIER label; "bf16io" = the bf16 tier with bf16_io
        # (bf16 y transfer + bf16 magnitude store — the reduced-HBM variant).
        self.dtype, self.C, self.F = dtype, C, F
        self.mode = FilterMode.CUSTOM
        log(f"bench[{dtype} C={C} F={F}]: building pipeline (constant upload)...")
        cfg = tier_config(dtype, C)
        self.pipe = SpectrumPipeline(cfg)
        self.pipe.upload_sos(sps.butter(12, 0.25, output="sos"))
        self.samples_per_dispatch = C * F * cfg.fft_size
        rng = np.random.default_rng(0)
        self.x0 = jnp.asarray(
            rng.standard_normal((C, F * cfg.fft_size)), jnp.float32
        )
        self.st = StreamState(
            sos_state=jnp.zeros((C, cfg.n_sections, 2), jnp.float32),
            window_phase=jnp.zeros((), jnp.int32),
            frame_count=jnp.zeros((), jnp.int32),
        )

        log(f"bench[{dtype}]: compiling...")
        t0 = time.time()
        out, st1 = self.pipe.process(self.x0, self.st, self.mode)
        float(out["magnitude"].ravel()[0])
        log(f"bench[{dtype}]: compile+first call {time.time() - t0:.1f}s")

        # Structural uniqueness guard: consecutive dispatch states must
        # differ (each is the previous dispatch's real output), else every
        # chained dispatch would be identical and the relay would replay its
        # cache. NOTE: sos_state alone is NOT enough — after an 8.4-Msample
        # dispatch the IIR transient from the initial condition underflows
        # f32 to exactly zero, so sos_state converges to a bit-identical
        # fixed point (measured: assert fired 2026-08-20). The evolving
        # frame_count is what keys every dispatch unique.
        _, st2 = self.pipe.process(self.x0, st1, self.mode)
        state_differs = any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree.leaves(st1), jax.tree.leaves(st2))
        )
        assert state_differs, (
            "carried StreamState is bit-identical across consecutive "
            "dispatches; the slope chain would time relay cache replays — "
            "fix the state threading before trusting any number from this "
            "bench"
        )
        self.st = st2
        self.run_k(3)  # warm the executable/queues

    def run_k(self, k: int) -> float:
        st = self.st
        t0 = time.perf_counter()
        for _ in range(k):
            out, st = self.pipe.process(self.x0, st, self.mode)
        float(out["magnitude"].ravel()[0])  # one sync at the end
        elapsed = time.perf_counter() - t0
        self.st = st  # thread: the next chain continues from here
        return elapsed

    def slope(self, k_long: int = 102) -> float:
        """Seconds per dispatch: (t_long - t_short) / (k_long - 2)."""
        t_short = min(self.run_k(2) for _ in range(2))
        t_long = min(self.run_k(k_long) for _ in range(2))
        return (t_long - t_short) / (k_long - 2)


def median_rate(runner: TierRunner, slopes: list[float]) -> float:
    s = sorted(slopes)
    return runner.samples_per_dispatch / s[len(s) // 2]


def spread_fields(slopes: list[float]) -> dict:
    """Honesty fields for a slope set: the per-rep spread the median hides."""
    s = sorted(slopes)
    return {
        "n": len(s),
        "min_ms": round(s[0] * 1e3, 4),
        "median_ms": round(s[len(s) // 2] * 1e3, 4),
        "max_ms": round(s[-1] * 1e3, 4),
        "spread_ratio": round(s[-1] / s[0], 3) if s[0] > 0 else None,
    }


def measure_latency_ms() -> float:
    """Latency mode: one 16K frame (C=1, F=1) per dispatch, slope-timed.
    The reference FPGA's figure is <10 ms acquisition-to-wire
    (README.md:168-169); ours is the single-frame device time."""
    r = TierRunner("f32", C=1, F=1)
    slopes = [r.slope(k_long=52) for _ in range(3)]
    return sorted(slopes)[len(slopes) // 2] * 1e3


def main():
    global RESULT
    import jax

    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)

    log(f"bench: devices = {jax.devices()}")
    log(f"bench: budget {BUDGET_S:.0f}s")

    # Headline: default f32 tier, C=8 x F=64 16K-frames per dispatch
    # (8.4 Msamples amortizes the tunnel's per-launch cost).
    #
    # Round-4 headline discipline (VERDICT r3 item 2): the headline is the
    # f32 median FROM THE INTERLEAVED TIER REPS — the same numbers the tier
    # dict reports — not a separate sequential block. A dedicated block can
    # land in a bad co-tenancy window while the interleaved medians improve
    # (measured r2->r3: headline 15.8->11.4 while every tier median rose);
    # deriving both from one interleaved set makes that divergence
    # impossible. Two quick f32 slopes still run first as a PROVISIONAL
    # headline so a SIGTERM before the tier block never leaves zero output.
    C, F = 8, 64
    f32 = TierRunner("f32", C, F)
    prov_slopes = [f32.slope() for _ in range(2)]
    rate_f32 = median_rate(f32, prov_slopes)
    log(f"bench[f32]: provisional headline {rate_f32 / 1e9:.2f} GSPS")

    # Per-rep slope arrays (ms) per tier: the drift/variance evidence the
    # medians alone can't carry (CLAUDE.md measurement discipline).
    slopes_ms: dict[str, list[float]] = {
        "f32_provisional": [round(s * 1e3, 4) for s in prov_slopes]
    }
    extras: dict = {
        "tiers": {"f32": rate_f32},
        "slopes_ms": slopes_ms,
        "headline_mode": "provisional",
    }
    RESULT = {
        "metric": "samples_per_sec_per_chip_window_iir12_fft16k",
        "value": rate_f32,
        "unit": "samples/s",
        "vs_baseline": rate_f32 / 1_000_000.0,
        **extras,
    }  # from here on, SIGTERM emits this much

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
        # the honest program floor (serial phases + real hybrid HBM
        # traffic): how much restructuring headroom remains, vs the
        # idealized MXU-only ceiling above (round-3 attribution)
        from tpu_sdr.bench.roofline import serial_floor_report

        sf = serial_floor_report(
            PipelineConfig(channels=C), measured_samples_per_sec=rate_f32
        )
        extras["roofline"]["serial_floor_samples_per_sec"] = sf[
            "serial_floor_samples_per_sec"
        ]
        extras["roofline"]["fraction_of_serial_floor"] = sf.get(
            "fraction_of_serial_floor"
        )
    except Exception as e:  # never lose the headline to the extras
        log(f"bench: roofline report failed: {type(e).__name__}: {e}")
    RESULT.update(extras)  # keep the SIGTERM-emitted line current per stage

    # The tier block: all tiers compiled up front, then measured INTERLEAVED
    # (A,B,C per round, one process) per the measurement discipline —
    # sequential same-process tier blocks are not comparable. The f32 rounds
    # here ARE the headline (updated after every round, so a SIGTERM mid-
    # block still emits the newest interleaved median).
    runners = [f32]
    for dtype in ("bf16", "bf16io", "f32max"):
        if remaining() > 180:
            try:
                runners.append(TierRunner(dtype, C, F))
            except Exception as e:
                log(f"bench: {dtype} tier setup failed: {type(e).__name__}: {e}")
        else:
            log(f"bench: skipping {dtype} tier (budget)")
    tier_slopes: dict[str, list[float]] = {r.dtype: [] for r in runners}
    rounds_done = 0
    try:
        for rep in range(7):
            if remaining() < 45 and rep >= 2:
                log(f"bench: interleaved tiers stopping at round {rep} (budget)")
                break
            for r in runners:
                tier_slopes[r.dtype].append(r.slope())
            rounds_done = rep + 1
            log(
                "bench: interleaved round %d: %s"
                % (
                    rep,
                    {
                        d: f"{s[-1] * 1e3:.3f} ms"
                        for d, s in tier_slopes.items()
                    },
                )
            )
            # Re-derive everything the rounds support so far.
            for r in runners:
                if tier_slopes[r.dtype]:
                    extras["tiers"][r.dtype] = median_rate(
                        r, tier_slopes[r.dtype]
                    )
                    slopes_ms[r.dtype] = [
                        round(s * 1e3, 4) for s in tier_slopes[r.dtype]
                    ]
            if rounds_done >= 2:
                # Enough rounds for a real median: promote the f32 median to
                # the headline. The label only claims interleaving when more
                # than one tier actually alternated in these rounds — if the
                # optional tiers failed to build, these are solo f32 reps and
                # the label must say so (advisor finding r4).
                rate_f32 = extras["tiers"]["f32"]
                RESULT["value"] = rate_f32
                RESULT["vs_baseline"] = rate_f32 / 1_000_000.0
                extras["headline_mode"] = (
                    "interleaved_median" if len(runners) > 1 else "solo_median"
                )
                extras["headline_spread"] = spread_fields(tier_slopes["f32"])
            RESULT.update(extras)
    except Exception as e:
        # Guarded like every other optional stage: a relay/TPU error during
        # a slope must not swallow the already-measured headline.
        log(f"bench: interleaved tiers failed: {type(e).__name__}: {e}")
    # Interleaving is only demonstrated once >= 2 full A/B/C rounds landed
    # (a single round is effectively a sequential pass — ADVICE r3).
    extras["tiers_interleaved"] = len(runners) > 1 and rounds_done >= 2
    extras["tier_rounds"] = rounds_done
    # per-tier roofline fraction (the ceiling is dtype-dependent:
    # bf16 needs fewer MXU passes than split-f32)
    try:
        from tpu_sdr.bench.roofline import roofline_report as _rr

        extras["roofline_per_tier"] = {
            d: round(
                _rr(tier_config(d, C), measured_samples_per_sec=rate)[
                    "fraction_of_ceiling"
                ],
                4,
            )
            for d, rate in extras["tiers"].items()
        }
        from tpu_sdr.bench.roofline import serial_floor_report as _sf

        extras["serial_floor_per_tier"] = {
            d: round(
                _sf(tier_config(d, C), measured_samples_per_sec=rate)[
                    "fraction_of_serial_floor"
                ],
                4,
            )
            for d, rate in extras["tiers"].items()
        }
    except Exception as e:
        log(f"bench: per-tier roofline failed: {type(e).__name__}: {e}")
    # The roofline block above ran against the provisional rate; refresh its
    # measured fractions to match the promoted headline.
    if "roofline" in extras:
        rl = extras["roofline"]
        rate_f32 = RESULT["value"]
        if rl.get("ceiling_samples_per_sec"):
            rl["fraction_of_roofline"] = (
                rate_f32 / rl["ceiling_samples_per_sec"]
            )
        if rl.get("serial_floor_samples_per_sec"):
            rl["fraction_of_serial_floor"] = (
                rate_f32 / rl["serial_floor_samples_per_sec"]
            )
    RESULT.update(extras)

    # Device-trace ground truth per tier (round 5), budget permitting: the
    # slope numbers above include relay round-trip + co-tenancy queueing
    # (headline_spread shows up to 2x per-rep swings); the xplane trace of
    # one steady dispatch measures DEVICE time only — the co-tenancy-immune
    # per-dispatch figure the roofline fractions should be judged against
    # (flat-emit measured bf16 at 0.257 ms device time = 0.32 of its
    # ceiling while the same day's slope medians swung 0.33-0.98 ms).
    if remaining() > 60:
        try:
            from tpu_sdr.bench.trace import capture_op_table
            from tpu_sdr.bench.roofline import roofline_report as _rr2

            dt: dict[str, dict] = {}
            for r in runners:
                def step(r=r):
                    out, r.st = r.pipe.process(r.x0, r.st, r.mode)
                    return out["magnitude"]

                res = capture_op_table(step, reps=6)
                if not res.get("device_trace"):
                    continue
                ms = res["dispatch_ms"]
                rate = r.samples_per_dispatch / (ms * 1e-3)
                ceil = _rr2(
                    tier_config(r.dtype, C), measured_samples_per_sec=rate
                )
                dt[r.dtype] = {
                    "dispatch_ms": round(ms, 4),
                    "device_idle_ms": round(res["device_idle_ms"], 4),
                    "gsps": round(rate / 1e9, 2),
                    "fraction_of_roofline": round(
                        ceil.get("fraction_of_ceiling") or 0.0, 4
                    ),
                }
                log(f"bench: device trace {r.dtype}: {dt[r.dtype]}")
            if dt:
                extras["device_trace_per_tier"] = dt
        except Exception as e:
            log(f"bench: device-trace block failed: {type(e).__name__}: {e}")
    else:
        log("bench: skipping device-trace block (budget)")
    RESULT.update(extras)

    # Latency mode, budget permitting.
    if remaining() > 90:
        try:
            extras["latency_frame_ms"] = measure_latency_ms()
            extras["latency_target_ms"] = 10.0  # reference README.md:168-169
        except Exception as e:
            log(f"bench: latency mode failed: {type(e).__name__}: {e}")
    else:
        log("bench: skipping latency mode (budget)")

    RESULT.update(extras)
    emit_result()


if __name__ == "__main__":
    main()
