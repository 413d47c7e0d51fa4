"""bf16_io measured end-to-end win (round 5, VERDICT r4 item 5).

The bf16_io tier was documented as buying "egress/memory, not dispatch
speed" from byte arithmetic alone. This script measures the two claimed
benefits on the real chip:

1. **Spectrum-export egress**: the full-dispatch magnitude fetch
   (device->host, the waterfall/recorder/export path) — (8, 64, 16384)
   magnitudes as f32 (33.5 MB) vs bf16 (16.8 MB), fetched as ONE packed
   array per the transfer discipline, INTERLEAVED A/B/A/B (the tunnel's
   transfer health drifts minute to minute).
2. **In-flight HBM footprint**: device memory_stats() live bytes with a
   dispatch's outputs resident, f32-magnitude vs bf16-magnitude tier
   (backend-permitting; recorded when available).

Writes docs/measurements/bf16io_egress_r5.json.

Run (TPU, ONE process): timeout 590 python scripts/bf16io_egress.py
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


def main():
    from tpu_sdr.core.config import FilterMode, PipelineConfig
    from tpu_sdr.runtime import SpectrumPipeline
    from tpu_sdr.runtime.state import StreamState

    log(f"devices: {jax.devices()}")
    t0 = time.time()
    probe = jnp.asarray(np.zeros((256, 2048), np.float32))
    probe.block_until_ready()
    up_ms = (time.time() - t0) * 1e3
    log(f"2MB upload probe: {up_ms:.1f} ms")

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((C, F * N)), jnp.float32)
    sos = sps.butter(12, 0.25, output="sos")

    variants = {}
    mem_stats = {}
    for name, kw in (
        ("bf16", dict(dtype="bf16")),
        ("bf16io", dict(dtype="bf16", bf16_io=True)),
    ):
        cfg = PipelineConfig(channels=C, pallas_flat_emit=True, **kw)
        pipe = SpectrumPipeline(cfg)
        pipe.upload_sos(sos)
        st = StreamState(
            sos_state=jnp.zeros((C, cfg.n_sections, 2), jnp.float32),
            window_phase=jnp.zeros((), jnp.int32),
            frame_count=jnp.zeros((), jnp.int32),
        )
        t0 = time.time()
        out, st = pipe.process(x, st, FilterMode.CUSTOM)
        jax.block_until_ready(out["magnitude"])
        log(f"{name}: compile+first {time.time() - t0:.1f}s "
            f"(mag dtype {out['magnitude'].dtype})")
        try:
            ms = jax.local_devices()[0].memory_stats()
            mem_stats[name] = {
                k: int(v) for k, v in ms.items()
                if k in ("bytes_in_use", "peak_bytes_in_use",
                         "largest_alloc_size")
            }
        except Exception as e:
            mem_stats[name] = {"unavailable": str(e)}
        variants[name] = (pipe, {"st": st, "out": out})

    # keep a FRESH dispatch's output resident per fetch (state threads, so
    # every dispatch is unique); fetch the whole packed magnitude array ONCE
    def fetch_once(name):
        pipe, box = variants[name]
        out, box["st"] = pipe.process(x, box["st"], FilterMode.CUSTOM)
        jax.block_until_ready(out["magnitude"])  # isolate transfer time
        t0 = time.perf_counter()
        host = np.asarray(out["magnitude"])
        dt = time.perf_counter() - t0
        return dt, host.nbytes

    for name in variants:  # warm one fetch each
        fetch_once(name)
    times = {name: [] for name in variants}
    nbytes = {}
    REPS = int(os.environ.get("EGRESS_REPS", "5"))
    for rep in range(REPS):
        for name in variants:  # interleaved A/B
            dt, nb = fetch_once(name)
            times[name].append(dt)
            nbytes[name] = nb
        log("rep %d: %s" % (
            rep, {k: f"{v[-1] * 1e3:.0f} ms" for k, v in times.items()}))

    med = {k: sorted(v)[len(v) // 2] for k, v in times.items()}
    out = {
        "probe_upload_ms_2MB": round(up_ms, 1),
        "magnitude_bytes": nbytes,
        "fetch_ms": {k: [round(t * 1e3, 1) for t in v]
                     for k, v in times.items()},
        "fetch_ms_median": {k: round(v * 1e3, 1) for k, v in med.items()},
        "fetch_MBps": {
            k: round(nbytes[k] / med[k] / 1e6, 1) for k in med
        },
        "egress_speedup_bf16io": round(med["bf16"] / med["bf16io"], 3),
        "memory_stats": mem_stats,
        "note": (
            "full-dispatch spectrum export (the waterfall/recorder path): "
            "bf16_io halves the magnitude bytes on the wire-limited "
            "device->host link; fetches interleaved A/B in one process, "
            "each of a FRESH unique dispatch's output"
        ),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "measurements",
        "bf16io_egress_r5.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
