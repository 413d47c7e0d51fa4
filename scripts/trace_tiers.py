"""Per-tier device traces (round 5, VERDICT r4 item 2): every quality tier
gets the op-level ground-truth treatment.

For each tier (f32, bf16, bf16io, f32max) this warms the production
dispatch (C=8, F=64, CUSTOM mode, carried state threading every call per
the CLAUDE.md memoization guard), captures a jax.profiler trace through
the tunnel, and writes the parsed op table to
docs/measurements/trace_<tier>_r5.json — dispatch wall time, device idle
time, and the ranked op list, so each tier's floor statement in
ARCHITECTURE.md is evidence, not prose.

Env:
  TRACE_TIERS       comma list (default f32,bf16,bf16io,f32max)
  TRACE_FLAT        "1" (default) = pallas_flat_emit layout, "0" = legacy

Run (TPU, ONE process): timeout 590 python scripts/trace_tiers.py
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


def log(msg):
    print(f"[{time.time() - T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def tier_config(tier: str, flat: bool):
    from tpu_sdr.core.config import PipelineConfig

    kw = dict(channels=C, pallas_flat_emit=flat)
    if tier == "bf16io":
        return PipelineConfig(dtype="bf16", bf16_io=True, **kw)
    return PipelineConfig(dtype=tier, **kw)


def main():
    from tpu_sdr.bench.trace import capture_op_table
    from tpu_sdr.core.config import FilterMode
    from tpu_sdr.runtime import SpectrumPipeline
    from tpu_sdr.runtime.state import StreamState

    tiers = os.environ.get("TRACE_TIERS", "f32,bf16,bf16io,f32max").split(",")
    flat = os.environ.get("TRACE_FLAT", "1") == "1"
    log(f"devices: {jax.devices()}  tiers={tiers} flat={flat}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((C, F * N)), jnp.float32)
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "measurements")

    for tier in tiers:
        cfg = tier_config(tier, flat)
        pipe = SpectrumPipeline(cfg)
        pipe.upload_sos(sps.butter(12, 0.25, output="sos"))
        st = StreamState(
            sos_state=jnp.zeros((C, cfg.n_sections, 2), jnp.float32),
            window_phase=jnp.zeros((), jnp.int32),
            frame_count=jnp.zeros((), jnp.int32),
        )
        t0 = time.time()
        out, st = pipe.process(x, st, FilterMode.CUSTOM)
        float(out["magnitude"].ravel()[0])
        log(f"{tier}: compile+first {time.time() - t0:.1f}s")
        _, st2 = pipe.process(x, st, FilterMode.CUSTOM)
        assert any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(st2))
        ), "state must evolve (memoization guard)"
        box = {"st": st2}

        def step():
            out, box["st"] = pipe.process(x, box["st"], FilterMode.CUSTOM)
            return out["magnitude"]

        for _ in range(3):  # steady state before the profiler turns on
            step()
        res = capture_op_table(step, reps=10)
        res["tier"] = tier
        res["pallas_flat_emit"] = flat
        res["samples_per_dispatch"] = C * F * N
        if res.get("device_trace"):
            res["gsps_from_trace"] = round(
                C * F * N / (res["dispatch_ms"] * 1e-3) / 1e9, 2
            )
            # layout-tax accounting: time in PURE relayout ops (sync
            # reshape/transpose/copy). %copy-start/-done are async DATA
            # movements (e.g. constant prefetch overlapping compute) and
            # %bitcast-operand fusions are compute — excluded.
            def is_layout(name):
                head = name.split(" ", 1)[0].lstrip("%")
                return head.split(".")[0] in ("reshape", "transpose", "copy")

            lay = sum(ms for name, ms in res["top_ops_ms"] if is_layout(name))
            res["layout_ops_ms"] = round(lay, 4)
            res["layout_ops_fraction"] = round(lay / res["dispatch_ms"], 4)
        path = os.path.join(out_dir, f"trace_{tier}_r5.json")
        with open(path, "w") as f:
            json.dump(res, f)
        log(
            f"{tier}: dispatch {res.get('dispatch_ms', '?')} ms, "
            f"idle {res.get('device_idle_ms', '?')} ms, layout "
            f"{res.get('layout_ops_fraction', '?')} -> {path}"
        )
        print(json.dumps({
            "tier": tier,
            "dispatch_ms": res.get("dispatch_ms"),
            "layout_ops_fraction": res.get("layout_ops_fraction"),
            "gsps_from_trace": res.get("gsps_from_trace"),
        }), flush=True)


if __name__ == "__main__":
    main()
