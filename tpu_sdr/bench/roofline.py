"""Roofline model + profiling hooks for the spectrum pipeline.

The observability layer the reference lacks on-device (SURVEY.md §5.1: the
FPGA has 15 debug LEDs; the GUI has FPS counters). Here: an analytic
FLOP/byte cost model per pipeline stage, a roofline verdict against chip
specs, and a thin ``jax.profiler`` trace helper.
"""

from __future__ import annotations

import contextlib
import dataclasses

from tpu_sdr.core.config import PipelineConfig

# v5e per-chip peaks (public numbers).
CHIP_SPECS = {
    "v5e": {"bf16_tflops": 197.0, "hbm_gbs": 819.0},
}

# MXU passes per LOGICAL flop for each quality tier: the model counts
# algorithmic flops, and the executed matmuls multiply that by the
# precision trick's pass count — bf16 runs the MXU natively; the f32
# tier's high3 splits every product into 3 bf16 passes (hi*hi + hi*lo +
# lo*hi, docs/ARCHITECTURE.md "Per-tier kernel precision"); f32max's
# HIGHEST is the 6-pass bf16_6x-class exact-f32 scheme. Effective logical
# rate = bf16 peak / passes.
TIER_MXU_PASSES = {"bf16": 1.0, "f32": 3.0, "f32max": 6.0}


@dataclasses.dataclass
class StageCost:
    name: str
    flops_per_frame: float
    hbm_bytes_per_frame: float

    @property
    def intensity(self) -> float:
        return self.flops_per_frame / max(self.hbm_bytes_per_frame, 1.0)


def pipeline_cost(cfg: PipelineConfig | None = None) -> list[StageCost]:
    """Analytic per-frame cost of each stage (nominal FLOPs, fused-HBM bytes)."""
    cfg = cfg or PipelineConfig()
    n = cfg.fft_size
    L = cfg.iir_block
    B = n // L
    m = 2 * cfg.n_sections
    f4 = 4.0  # f32 bytes
    stages = [
        StageCost("window", n, 0.0),  # fused: no extra HBM traffic
        StageCost(
            "iir_toeplitz", 2.0 * B * L * L, 0.0
        ),  # y_zs = x @ T^T per block
        StageCost("iir_forcing", 2.0 * B * L * m, 0.0),
        StageCost(
            "iir_scan", 2.0 * 7 * B * m * m + 2.0 * B * m * 2, 0.0
        ),  # doubling scan + z_in
        StageCost("iir_inject", 2.0 * B * m * L, 0.0),
        StageCost(
            "fft_4step",
            # step1 real input: 2 real matmuls of n*n2 MACs = 4*n*n2 flops
            # (kernels/fft.py step-1 einsum pair), + twiddle elementwise,
            # + step3 complex: 4 real matmuls of n*n1 MACs = 8*n*n1 flops
            4.0 * n * cfg.fft_n2 + 4.0 * 2.0 * n
            + 4.0 * n * cfg.fft_n1 * 2.0,
            0.0,
        ),
        StageCost("magnitude", 4.0 * n, 0.0),
        StageCost("io", 0.0, 2.0 * n * f4),  # one frame in, one mag out
    ]
    return stages


def _tier_compute(cfg: PipelineConfig, chip: str):
    """The shared prelude of both reports: (spec, stages, flops,
    passes, t_compute) — one source so fraction_of_ceiling and
    fraction_of_serial_floor can never silently diverge."""
    spec = CHIP_SPECS[chip]
    stages = pipeline_cost(cfg)
    flops = sum(s.flops_per_frame for s in stages)
    passes = TIER_MXU_PASSES.get(cfg.dtype, 3.0)
    tflops = spec["bf16_tflops"] / passes
    t_compute = flops / (tflops * 1e12)
    return spec, stages, flops, passes, t_compute


def roofline_report(
    cfg: PipelineConfig | None = None,
    chip: str = "v5e",
    measured_samples_per_sec: float | None = None,
) -> dict:
    """Summarize the pipeline against the chip's compute/memory roofs."""
    cfg = cfg or PipelineConfig()
    spec, stages, flops, passes, t_compute = _tier_compute(cfg, chip)
    hbm = sum(s.hbm_bytes_per_frame for s in stages)
    t_memory = hbm / (spec["hbm_gbs"] * 1e9)
    bound = "compute" if t_compute > t_memory else "memory"
    # Ingest ceiling: a frame of compute advances the stream by hop samples
    # (== n for the non-overlapped default; < n for STFT configs).
    ceiling_sps = cfg.effective_hop / max(t_compute, t_memory)
    report = {
        "chip": chip,
        "dtype": cfg.dtype,
        "flops_per_frame": flops,
        "hbm_bytes_per_frame": hbm,
        "arithmetic_intensity": flops / max(hbm, 1.0),
        "mxu_passes": passes,
        "bound": bound,
        "ceiling_samples_per_sec": ceiling_sps,
        "stages": {s.name: s.flops_per_frame for s in stages},
    }
    if measured_samples_per_sec is not None:
        report["measured_samples_per_sec"] = measured_samples_per_sec
        report["fraction_of_ceiling"] = measured_samples_per_sec / ceiling_sps
    return report


def serial_floor_report(
    cfg: PipelineConfig | None = None,
    chip: str = "v5e",
    measured_samples_per_sec: float | None = None,
) -> dict:
    """The HONEST floor of the shipped hybrid program, vs the idealized
    MXU-only ceiling of ``roofline_report``.

    Measured round 3 (docs/measurements/attrib_pipeline_r3.json): the
    dispatch's phases do not fully overlap, and the hybrid moves FOUR
    HBM passes per frame (x in, the IIR output y written and re-read by
    the Pallas kernel, magnitudes out) — so the achievable floor is
    t_compute + t_memory with the real traffic, not max(t_c, t_m) with
    in+out only. The measured pipeline sits at ~0.8+ of this floor
    (round-3 attribution), which is the number that says how much
    restructuring headroom actually remains.
    """
    cfg = cfg or PipelineConfig()
    spec, _stages, _flops, _passes, t_compute = _tier_compute(cfg, chip)
    n = cfg.fft_size
    if cfg.dtype == "bf16" and cfg.bf16_io:
        # x in (4 B) + y round-trip in bf16 (2+2) + bf16 magnitudes (2)
        hybrid_hbm = n * (4.0 + 2.0 + 2.0 + 2.0)
    else:
        hybrid_hbm = 4.0 * n * 4.0  # x in + y round-trip + mag out, f32
    t_memory = hybrid_hbm / (spec["hbm_gbs"] * 1e9)
    floor_sps = cfg.effective_hop / (t_compute + t_memory)
    report = {
        "chip": chip,
        "dtype": cfg.dtype,
        "hybrid_hbm_bytes_per_frame": hybrid_hbm,
        "t_compute_us_per_frame": t_compute * 1e6,
        "t_memory_us_per_frame": t_memory * 1e6,
        "serial_floor_samples_per_sec": floor_sps,
    }
    if measured_samples_per_sec is not None:
        report["fraction_of_serial_floor"] = (
            measured_samples_per_sec / floor_sps
        )
    return report


@contextlib.contextmanager
def profiled(logdir: str = "/tmp/tpu_sdr_trace"):
    """Capture a jax.profiler device trace around a code block."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
