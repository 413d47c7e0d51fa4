"""Benchmark: sustained samples/sec/chip through window + IIR12 + 16K FFT.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = the reference FPGA's 1 MSPS real-time rate (BASELINE.md);
target = >= 1 GSPS/chip (BASELINE.json north star).

Methodology notes (this container's axon TPU tunnel):
- first call pays a ~5-9 min remote compile (no terminal-side cache);
  progress goes to stderr so the driver sees liveness;
- host<->device sync round trips cost ~35 ms each, so naive per-dispatch
  timing measures the tunnel, not the chip. We time K=2 vs K=22 chained
  dispatches (state-dependent, so they serialize on device) and take the
  slope — constant sync/launch overhead cancels, leaving device time.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import scipy.signal as sps

    from tpu_sdr.core.config import FilterMode, PipelineConfig
    from tpu_sdr.runtime import SpectrumPipeline
    from tpu_sdr.runtime.state import StreamState

    log(f"bench: devices = {jax.devices()}")
    # Work size per dispatch: C channels x F frames of 16K samples.
    # Default quality tier ("f32", ~98 dB SNR vs float64 golden — well inside
    # the reference's Q15 bound). The "bf16" tier reaches the HBM roofline
    # (~0.02 ms/dispatch, ~100 GSPS) at ~50 dB SNR.
    C, F = 8, 64  # 8.4 Msamples/dispatch amortizes the tunnel's per-launch cost
    cfg = PipelineConfig(channels=C)
    pipe = SpectrumPipeline(cfg)
    pipe.upload_sos(sps.butter(12, 0.25, output="sos"))

    n = cfg.fft_size
    samples_per_dispatch = C * F * n
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((C, F * n)), jnp.float32)
    state = StreamState(
        sos_state=jnp.zeros((C, cfg.n_sections, 2), jnp.float32),
        window_phase=jnp.zeros((), jnp.int32),
        frame_count=jnp.zeros((), jnp.int32),
    )

    log("bench: compiling (first call; may take several minutes on the tunnel)...")
    t0 = time.time()
    out, _ = pipe.process(x, state, FilterMode.CUSTOM)
    float(out["magnitude"].ravel()[0])
    log(f"bench: compile+first call {time.time() - t0:.1f}s")

    def run_k(k: int) -> float:
        st = state
        t0 = time.perf_counter()
        for _ in range(k):
            out, st = pipe.process(x, st, FilterMode.CUSTOM)
        float(out["magnitude"].ravel()[0])  # one sync at the end
        return time.perf_counter() - t0

    run_k(3)  # warm the executable/queues
    # Slope-time K=2 vs K=102 chained dispatches: the tunnel adds multi-ms
    # jitter per sync and the chip is co-tenanted, so the long batch must
    # accumulate enough device time (100 extra 8.4-Msample dispatches,
    # ~50-80 ms) to dominate both; median of several slopes on top.
    slopes = []
    for rep in range(7):
        t_short = min(run_k(2) for _ in range(2))
        t_long = min(run_k(102) for _ in range(2))
        slopes.append((t_long - t_short) / 100)
        log(f"bench: rep {rep}: per-dispatch {slopes[-1] * 1e3:.3f} ms")
    slopes.sort()
    per_dispatch = slopes[len(slopes) // 2]
    log(f"bench: median per-dispatch {per_dispatch * 1e3:.3f} ms")
    rate = samples_per_dispatch / per_dispatch

    print(
        json.dumps(
            {
                "metric": "samples_per_sec_per_chip_window_iir12_fft16k",
                "value": rate,
                "unit": "samples/s",
                "vs_baseline": rate / 1_000_000.0,
            }
        )
    )


if __name__ == "__main__":
    main()
