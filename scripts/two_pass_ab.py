"""On-chip A/B: hybrid vs fused two-pass at f32 (and f32max), post
transposed-scan.

The round-2 two-pass verdict (2.1 ms vs hybrid 0.93 at f32max) predates
two changes: cat3 high3 and the transposed in-kernel scan (M=16 dots,
8x less MXU per doubling). The two-pass trades the hybrid's y HBM
round-trip (~0.08 ms) for in-kernel IIR work — re-measure both tiers,
interleaved, full pipeline dispatches chained on carried state.

Run (TPU, ONE process): timeout 590 python scripts/two_pass_ab.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import scipy.signal as sps  # noqa: E402

C, F = 8, 64
N = 16384
T0 = time.time()


def log(msg):
    print(f"[{time.time() - T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


class Chain:
    def __init__(self, name, dtype, fused):
        from tpu_sdr.core.config import FilterMode, PipelineConfig
        from tpu_sdr.runtime import SpectrumPipeline
        from tpu_sdr.runtime.state import StreamState

        self.name = name
        self.mode = FilterMode.CUSTOM
        cfg = PipelineConfig(channels=C, dtype=dtype, fused_two_pass=fused)
        self.pipe = SpectrumPipeline(cfg)
        self.pipe.upload_sos(sps.butter(12, 0.25, output="sos"))
        rng = np.random.default_rng(0)
        self.x = jnp.asarray(
            rng.standard_normal((C, F * N)), jnp.float32)
        self.st = StreamState(
            sos_state=jnp.zeros((C, cfg.n_sections, 2), jnp.float32),
            window_phase=jnp.zeros((), jnp.int32),
            frame_count=jnp.zeros((), jnp.int32),
        )
        t0 = time.time()
        out, self.st = self.pipe.process(self.x, self.st, self.mode)
        float(out["magnitude"].ravel()[0])
        log(f"{name}: compile+first {time.time() - t0:.1f}s")

    def run_k(self, k):
        st = self.st
        t0 = time.perf_counter()
        for _ in range(k):
            out, st = self.pipe.process(self.x, st, self.mode)
        float(out["magnitude"].ravel()[0])
        dt = time.perf_counter() - t0
        self.st = st
        return dt

    def slope(self, k_long=102):
        ts = min(self.run_k(2) for _ in range(2))
        tl = min(self.run_k(k_long) for _ in range(2))
        return (tl - ts) / (k_long - 2)


def main():
    log(f"devices: {jax.devices()}")
    chains = [
        Chain("hybrid_f32", "f32", False),
        Chain("twopass_f32", "f32", True),
        Chain("hybrid_f32max", "f32max", False),
        Chain("twopass_f32max", "f32max", True),
    ]
    for ch in chains:
        ch.run_k(3)
    slopes = {ch.name: [] for ch in chains}
    for rep in range(6):
        for ch in chains:
            slopes[ch.name].append(ch.slope())
        log("rep %d: %s" % (
            rep, {k: f"{v[-1] * 1e3:.3f} ms" for k, v in slopes.items()}))
    med = {k: sorted(v)[len(v) // 2] * 1e3 for k, v in slopes.items()}
    print(json.dumps({
        "medians_ms": med,
        "slopes_ms": {k: [round(x * 1e3, 4) for x in v]
                      for k, v in slopes.items()},
        "gsps": {k: C * F * N / (m * 1e-3) / 1e9 for k, m in med.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
