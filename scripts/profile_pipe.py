"""jax.profiler device trace of the hybrid dispatch + op-level attribution.

Round-4 discovery: the axon tunnel DOES emit real TPU xplanes
(``/device:TPU:0`` with per-op XLA events). This script captures 10
chained dispatches of the production pipeline at a given tier, parses the
xplane directly (the tensorboard-plugin converter's native wrapper is
incompatible with the installed TF; ``tensorflow.tsl...xplane_pb2``
works), and emits the op table + device idle time for ONE steady-state
dispatch — the ground-truth answer to "where does the dispatch go".

f32 result (2026-08-21): 0.500 ms dispatch, device idle 0.001 ms —
the device is BUSY wall-to-wall; the Pallas FFT custom-call (0.186 ms)
sits at its 3-pass MXU floor (0.198 analytic), the IIR half is ~0.19 ms
of matmul fusions + 0.025 ms frame-chain while-loop, and ~0.065 ms is
layout movement (the kernel output lands in alternate memory and is
copied/reshaped to the HBM output). There is no overlap slack to claw
back — the analytic "serial floor" UNDERestimates the IIR's real cost.

Run (TPU, ONE process): timeout 590 python scripts/profile_pipe.py [tier]
tier: f32 (default) | bf16 | bf16io | f32max
"""

from __future__ import annotations

import collections
import glob
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
LOGDIR = "/tmp/tpu_sdr_trace"
TIER = sys.argv[1] if len(sys.argv) > 1 else "f32"
T0 = time.time()


def log(m):
    print(f"[{time.time() - T0:6.1f}s] {m}", file=sys.stderr, flush=True)


def tier_cfg():
    from tpu_sdr.core.config import PipelineConfig

    if TIER == "bf16io":
        return PipelineConfig(channels=C, dtype="bf16", bf16_io=True)
    return PipelineConfig(channels=C, dtype=TIER)


def analyze() -> dict:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    planes = glob.glob(f"{LOGDIR}/**/*.xplane.pb", recursive=True)
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(planes[0], "rb").read())
    tpu = [p for p in xs.planes if p.name == "/device:TPU:0"]
    if not tpu:
        return {"device_trace": False,
                "planes": [p.name for p in xs.planes]}
    tpu = tpu[0]
    md = {k: v.name for k, v in tpu.event_metadata.items()}
    lines = {ln.name: ln for ln in tpu.lines}
    mods = sorted(
        (e.offset_ps, e.duration_ps, md[e.metadata_id])
        for e in lines["XLA Modules"].events
    )
    # the pipeline dispatch = the repeated longest module
    durs = collections.Counter(n for _, _, n in mods)
    pipe_name = max(durs, key=lambda n: durs[n])
    pipe_mods = [m for m in mods if m[2] == pipe_name]
    o0, d0, _ = pipe_mods[-1]
    ops = sorted(
        (e.offset_ps, e.duration_ps, md[e.metadata_id])
        for e in lines["XLA Ops"].events
    )
    inside = [(o, d, n) for o, d, n in ops if o0 <= o < o0 + d0]
    tot = collections.Counter()
    for _, d, n in inside:
        tot[n] += d
    gap = 0
    prev_end = o0
    for o, d, _ in inside:
        if o > prev_end:
            gap += o - prev_end
        prev_end = max(prev_end, o + d)
    return {
        "device_trace": True,
        "tier": TIER,
        "dispatch_ms": d0 / 1e9,
        "dispatch_ms_all": [round(d / 1e9, 4) for _, d, _ in pipe_mods],
        "n_ops": len(inside),
        "op_sum_ms": sum(d for _, d, _ in inside) / 1e9,
        "device_idle_ms": gap / 1e9,
        "top_ops_ms": [
            [n[:110], round(d / 1e9, 4)] for n, d in tot.most_common(30)
        ],
    }


def main():
    from tpu_sdr.core.config import FilterMode
    from tpu_sdr.runtime import SpectrumPipeline
    from tpu_sdr.runtime.state import StreamState

    log(f"devices: {jax.devices()}  tier={TIER}")
    pipe = SpectrumPipeline(tier_cfg())
    pipe.upload_sos(sps.butter(12, 0.25, output="sos"))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((C, F * N)), jnp.float32)
    st = StreamState(
        sos_state=jnp.zeros((C, pipe.cfg.n_sections, 2), jnp.float32),
        window_phase=jnp.zeros((), jnp.int32),
        frame_count=jnp.zeros((), jnp.int32),
    )
    out, st = pipe.process(x, st, FilterMode.CUSTOM)
    float(np.asarray(out["magnitude"], np.float32).ravel()[0])
    log("compiled + warm")

    os.system(f"rm -rf {LOGDIR}")
    jax.profiler.start_trace(LOGDIR)
    for _ in range(10):
        out, st = pipe.process(x, st, FilterMode.CUSTOM)
    float(np.asarray(out["magnitude"], np.float32).ravel()[0])
    jax.profiler.stop_trace()
    log("trace captured; parsing")
    print(json.dumps(analyze()), flush=True)


if __name__ == "__main__":
    main()
