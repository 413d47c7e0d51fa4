"""Configuration for the TPU SDR pipeline.

The reference has three configuration tiers (SURVEY.md §5.6):

  (a) compile-time VHDL generics / vendor IP parameters (FFT N, FIFO depth,
      baud, widths) — here: the static, hashable ``PipelineConfig`` that shapes
      all traced programs;
  (b) the GUI's USER CONFIG constant block
      (reference ``scripts/fft_analyzer_gui.py:17-54``) — here:
      ``HostConfig`` (ports, addresses, display rates);
  (c) the runtime single-byte command protocol + ``web_config`` dict — here:
      the runtime command API in ``tpu_sdr.control`` mutating a small dynamic
      state (filter mode, comm mode, coefficients), never shapes.

Anything that changes a traced shape lives in ``PipelineConfig`` and triggers
a (cached) recompile; everything else is data.
"""

from __future__ import annotations

import dataclasses
import enum


class FilterMode(enum.IntEnum):
    """Datapath routing, mirroring reference command bytes.

    Reference: ``src/command_control.vhd:46-74`` decodes 0x00 (fixed filter),
    0xA1 (custom filter), 0xB1 (bypass, the reset default :31).
    """

    FIXED = 0x00
    CUSTOM = 0xA1
    BYPASS = 0xB1


class CommMode(enum.IntEnum):
    """Output transport select, mirroring reference ``imp/sequ2.vhd:82-96``."""

    ETHERNET = 0xEF
    UART = 0xFE


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Static (shape-defining) configuration. Hashable; safe as a jit static.

    Defaults reproduce the reference scale facts (SURVEY.md §0):
    16K-point FFT, 1 MSPS, 12th-order IIR = 6 biquad sections.
    """

    # FFT frame length; must equal fft_n1 * fft_n2.
    fft_size: int = 16384
    # Four-step FFT factors. 128x128 keeps both DFT matmuls MXU-shaped.
    fft_n1: int = 128
    fft_n2: int = 128
    # Biquad cascade depth: 12th-order = 6 second-order sections
    # (reference imp/filter_iir12.vhd: 6 cascaded filter_iir stages).
    n_sections: int = 6
    # Blocked-scan block length for the IIR state-space kernel. 128 makes the
    # per-block Toeplitz operator a 128x128 MXU tile.
    iir_block: int = 128
    # Number of parallel channels processed together (the reference has 2
    # always-on filter banks; BASELINE configs scale 1 -> 64 -> 4096).
    channels: int = 1
    # Nominal sample rate in Hz (display/derived quantities only; never a
    # traced shape). Reference: XADC 1 MSPS.
    sample_rate: float = 1_000_000.0
    # Window/FFT hop. fft_size = no overlap (the reference's behavior: the
    # window phase counter wraps every 16384 samples, src/hann8192.vhd:41-44).
    hop: int | None = None
    # Numeric quality tier for the matmul-heavy kernels:
    #   "f32"    ~98 dB SNR vs float64 golden — 3-pass (bf16-split) IIR and
    #            Pallas FFT; the default (comfortably above the Q15 bound)
    #   "f32max" ~139 dB SNR — everything in 6-pass exact f32
    #   "bf16"   ~50 dB SNR — bf16 MXU passes, max throughput
    dtype: str = "f32"
    # When True, use the RTL-faithful offset window (2*hann-1 = -cos) instead
    # of the true Hann window. See quirks register, SURVEY.md §7 item (a);
    # reference scripts/hann_coeff.py:4-5 stores (hann-0.5)*2^16.
    rtl_faithful_window: bool = False
    # Use the fused Pallas window+FFT+magnitude kernel for magnitude output
    # (interpreted on CPU, compiled on TPU). ~3x the XLA path's throughput
    # at bf16, ~1.1x at f32-highest, with one HBM read+write per frame.
    use_pallas: bool = True
    # f32max structure: False (default) = hybrid XLA IIR @HIGHEST + Pallas
    # FFT kernel (measured 9.0 GSPS on v5e); True = the fully-fused two-pass
    # Pallas pipeline (one HBM read+write per frame, ~4 GSPS — the in-kernel
    # doubling scan pays 6-pass MXU tiles on (B,12)@(12,12) dots). Keep the
    # fused variant for HBM-constrained deployments; ignored by other tiers.
    # (Round-4 note: the two-pass was also measured at the bf16 tier —
    # 0.96 vs 0.34 ms hybrid, docs/measurements/ab_bf16_traffic_r4.json —
    # so it stays f32max-only.)
    fused_two_pass: bool = False
    # bf16 tier only: halve the inter-kernel HBM traffic — the IIR output
    # ships to the FFT kernel as bfloat16 (bitwise-neutral on TPU: DEFAULT-
    # precision MXU dots round their inputs to bf16 in hardware anyway —
    # verified on-chip, docs/measurements/attrib_bf16_r4.json) and the
    # magnitudes are STORED as bfloat16 (values = the f32 kernel results
    # rounded once; output dtype changes, so this is opt-in). All streaming
    # invariance contracts (chunked==one-shot, sharded==single-device,
    # bitwise) hold within the mode. Ignored by other tiers.
    bf16_io: bool = False
    # Pallas magnitude store layout: True (default) = the kernel writes each
    # frame's magnitudes as one flattened (n,)-lane row, so the (..., F, n)
    # consumer view of the output is a free bitcast instead of an XLA
    # relayout copy (the r4 device traces showed that copy at 0.052 ms,
    # 10-17% of the production dispatch — trace_bf16_r4.json %reshape.19).
    # Bits are identical either way (tested at every precision tier).
    # Measured on-chip, paired/interleaved (layout_ab_r5.json): flat wins
    # at both tiers — bf16 0.471 -> 0.332 ms/dispatch median, f32 0.525 ->
    # 0.488 — and captures most of the no-flatten ceiling (0.274 / 0.474,
    # the `blocked_output` variant, which would need a (F, n1, n2) consumer
    # contract). False = kernel-native (F, n1, n2) store + XLA reshape.
    pallas_flat_emit: bool = True

    def __post_init__(self):
        if self.fft_n1 * self.fft_n2 != self.fft_size:
            raise ValueError(
                f"fft_n1*fft_n2 ({self.fft_n1}*{self.fft_n2}) != fft_size "
                f"({self.fft_size})"
            )
        if self.fft_size % self.iir_block != 0:
            raise ValueError("fft_size must be a multiple of iir_block")
        if self.hop is not None and not (0 < self.hop <= self.fft_size):
            raise ValueError("hop must be in (0, fft_size]")
        if self.hop is not None and self.fft_size % self.hop:
            raise ValueError("hop must divide fft_size (aligned framing)")
        if self.dtype not in ("f32", "f32max", "bf16"):
            raise ValueError(
                f"dtype must be f32 | f32max | bf16, got {self.dtype!r}"
            )

    @property
    def effective_hop(self) -> int:
        return self.fft_size if self.hop is None else self.hop

    def pallas_geometry_ok(self) -> bool:
        """Whether the fused Pallas kernels apply to this configuration.

        The kernels hard-code the 128x128 four-step geometry (128-lane
        tiling, LOG2B state doublings, the HALF_K2 mirror table); every
        other legal factorization — e.g. fft_n1=64/fft_n2=256 — takes the
        XLA path. This single predicate is THE eligibility gate: bank
        construction (``runtime/banks.build_bank``) and all three dispatch
        sites in ``runtime/stream.py`` must agree, or a config builds a
        plan it never uses — or worse, crashes building a plan the
        dispatch gate would have skipped (review finding: fft_n1=64/
        fft_n2=256 crashed in ``build_plan`` because the bank gate
        omitted the n1/n2 checks the dispatch gates had)."""
        return (
            self.use_pallas
            and self.fft_n1 == 128
            and self.fft_n2 == 128
            and self.iir_block == 128
        )

    @property
    def bins_per_hz(self) -> float:
        return self.fft_size / self.sample_rate

    @property
    def hz_per_bin(self) -> float:
        # Reference README.md:166 — ~61 Hz/bin at 1 MSPS / 16K.
        return self.sample_rate / self.fft_size


@dataclasses.dataclass
class HostConfig:
    """Host-edge (transport / GUI) configuration.

    Mirrors the USER CONFIG block of the reference GUI
    (``scripts/fft_analyzer_gui.py:17-54``).
    """

    udp_bind_ip: str = "0.0.0.0"
    udp_port: int = 6006
    expected_src_ip: str = "169.254.252.255"
    expected_src_port: int = 5005
    frame_size_bytes: int = 65536
    packets_per_frame: int = 64
    packet_data_size: int = 1024
    ethernet_payload_size: int = 1025
    display_fps_cap: float = 30.0
    http_port: int = 5000
    uart_baud: int = 230400


def default_config(**overrides) -> PipelineConfig:
    return PipelineConfig(**overrides)
