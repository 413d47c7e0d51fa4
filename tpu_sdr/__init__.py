"""tpu_sdr — TPU-native real-time FFT spectrum-analyzer framework.

A brand-new streaming DSP framework (JAX / XLA / Pallas / shard_map) with the
capabilities of the FPGA reference ``mfkiwl/fpga-real-time-fft-analyzer``
(see SURVEY.md): a receive-only SDR signal chain

    sample stream -> Hann window -> 12th-order cascaded-biquad IIR bank
                  -> 16K-point complex FFT -> magnitude/phase spectra
                  -> UDP/UART-style framing -> live web GUI

re-designed TPU-first rather than translated from VHDL:

- the sequential Q15 biquad cascade (reference ``imp/filter_iir12.vhd``)
  becomes a blocked state-space system: per-block Toeplitz matmuls on the MXU
  plus a 2-state-per-section inter-block recurrence evaluated with an
  associative scan (``tpu_sdr.kernels.biquad``);
- the Xilinx 16K FFT IP (reference ``ip/xfft_0``) becomes a four-step
  128x128 decomposition — two dense 128-point DFT matmuls and a twiddle
  multiply, all MXU work (``tpu_sdr.kernels.fft``);
- the async-FIFO / dual-clock streaming machinery (reference ``imp/fifo.vhd``)
  becomes a time-blocked streaming runtime with an explicit carried-state
  pytree (``tpu_sdr.runtime``);
- the hand-rolled Ethernet MAC / UDP framing (reference
  ``imp/phy_rmii_if.vhd``) becomes a host-edge packetizer with a C++ hot path
  (``tpu_sdr.transport``), while chip-to-chip communication rides ICI
  collectives under ``shard_map`` (``tpu_sdr.shard``).
"""

__version__ = "0.1.0"

from tpu_sdr.core.config import (  # noqa: F401
    FilterMode,
    CommMode,
    PipelineConfig,
    default_config,
)
