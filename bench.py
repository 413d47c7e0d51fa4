"""Benchmark: sustained samples/sec/chip through window + IIR12 + 16K FFT.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = the reference FPGA's 1 MSPS real-time rate (BASELINE.md);
target = >= 1 GSPS/chip (BASELINE.json north star).

Run on the real TPU with the ambient environment (single process!).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import scipy.signal as sps

    from tpu_sdr.core.config import PipelineConfig
    from tpu_sdr.runtime import SpectrumPipeline
    from tpu_sdr.runtime.state import StreamState
    from tpu_sdr.core.config import FilterMode

    dev = jax.devices()[0]
    # Work size per dispatch: C channels x F frames of 16K samples.
    C, F = 8, 16
    cfg = PipelineConfig(channels=C)
    pipe = SpectrumPipeline(cfg)
    pipe.upload_sos(sps.butter(12, 0.25, output="sos"))

    n = cfg.fft_size
    samples_per_dispatch = C * F * n
    rng = np.random.default_rng(0)
    x_host = rng.standard_normal((C, F * n)).astype(np.float32)
    x = jax.device_put(jnp.asarray(x_host), dev)
    state = StreamState(
        sos_state=jnp.zeros((C, cfg.n_sections, 2), jnp.float32),
        window_phase=jnp.zeros((), jnp.int32),
        frame_count=jnp.zeros((), jnp.int32),
    )

    # Warmup / compile.
    out, st = pipe.process(x, state, FilterMode.CUSTOM)
    jax.block_until_ready(out["magnitude"])

    # Timed: chain dispatches with carried state (true streaming behavior).
    iters = 20
    t0 = time.perf_counter()
    st_t = state
    outs = []
    for _ in range(iters):
        out, st_t = pipe.process(x, st_t, FilterMode.CUSTOM)
        outs.append(out["magnitude"])
    jax.block_until_ready(outs[-1])
    dt = time.perf_counter() - t0

    sps_rate = samples_per_dispatch * iters / dt
    print(
        json.dumps(
            {
                "metric": "samples_per_sec_per_chip_window_iir12_fft16k",
                "value": sps_rate,
                "unit": "samples/s",
                "vs_baseline": sps_rate / 1_000_000.0,
            }
        )
    )


if __name__ == "__main__":
    main()
