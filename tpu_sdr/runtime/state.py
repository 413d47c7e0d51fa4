"""Carried stream state — the explicit, checkpointable runtime state.

The reference's state is implicit in hardware registers: per-section biquad
history (``imp/filter_iir.vhd:130-151``), the window address counter
(``src/hann8192.vhd:41-44``), the Ethernet frame counter
(``imp/phy_rmii_if.vhd:434``) and the 12-byte coefficient RAM
(``src/coeff_cdc.vhd:34-46``). Here all of it is one pytree, which makes
checkpoint/resume trivial (SURVEY.md §5.4: the build's carried-state dict is
checkpointable by construction) and makes sharding the stream a matter of
sharding this tree.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class StreamState:
    """Per-channel carried state of the streaming DSP chain.

    Leaves:
      sos_state   (..., channels, n_sections, 2) float32 — TDF-II biquad
                  state per section per channel (scipy ``zi`` convention),
                  for the *selected* filter path.
      window_phase () int32 — sample index mod fft_size of the next sample.
      frame_count () int32 — spectra produced so far (the Ethernet IP-ID /
                  mark counter analog).
      history     (..., channels, fft_size - hop) float32 — trailing filtered
                  samples for overlapped (hop < fft_size) framing; None when
                  hop == fft_size (the reference's configuration).
    """

    sos_state: Any
    window_phase: Any
    frame_count: Any
    history: Any = None

    @staticmethod
    def initial(
        channels: int,
        n_sections: int = 6,
        batch_shape=(),
        history_len: int = 0,
    ) -> "StreamState":
        return StreamState(
            sos_state=jnp.zeros((*batch_shape, channels, n_sections, 2), jnp.float32),
            window_phase=jnp.zeros((), jnp.int32),
            frame_count=jnp.zeros((), jnp.int32),
            history=(
                jnp.zeros((*batch_shape, channels, history_len), jnp.float32)
                if history_len
                else None
            ),
        )

    def to_numpy(self) -> dict:
        """Checkpoint: pull to host as plain arrays."""
        return {
            "sos_state": np.asarray(self.sos_state),
            "window_phase": np.asarray(self.window_phase),
            "frame_count": np.asarray(self.frame_count),
            "history": None if self.history is None else np.asarray(self.history),
        }

    @staticmethod
    def from_numpy(d: dict) -> "StreamState":
        h = d.get("history")
        return StreamState(
            sos_state=jnp.asarray(d["sos_state"]),
            window_phase=jnp.asarray(d["window_phase"]),
            frame_count=jnp.asarray(d["frame_count"]),
            history=None if h is None else jnp.asarray(h),
        )
