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
    from tpu_sdr.bench.trace import parse_xplane

    res = parse_xplane(LOGDIR)
    res["tier"] = TIER
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
