"""The block-stream runtime: frames in, spectra out, state carried.

TPU-native replacement for the reference's acquire/fill/drain machinery
(``imp/sequencer_dsp.vhd`` + ``imp/sequ2.vhd`` + the 16K async FIFO): instead
of a 1-sample/cycle pipeline decoupled by FIFOs across clock domains, the
runtime processes whole batches of 16K-sample frames per dispatch, carrying
{biquad state, window phase, frame count} across calls. Host<->device rate
decoupling — the async-FIFO role — is played by JAX's async dispatch queue
plus double-buffered ``jax.device_put`` in ``tpu_sdr.runtime.feeder``.

Datapath order matches the reference (SURVEY.md §3.2):

    samples -> Hann window -> {bypass | fixed IIR12 | custom IIR12} -> 16K FFT
            -> magnitude (+ optional phase / complex spectra)
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tpu_sdr.core.config import FilterMode, PipelineConfig
from tpu_sdr.kernels import biquad, fft, magnitude, window
from tpu_sdr.control import golden
from tpu_sdr.runtime.state import StreamState

Precision = jax.lax.Precision

_MODE_TO_INDEX = {FilterMode.BYPASS: 0, FilterMode.FIXED: 1, FilterMode.CUSTOM: 2}


def _precision(cfg: PipelineConfig):
    return Precision.HIGHEST if cfg.dtype == "f32" else Precision.DEFAULT


def process_stream(
    x: jnp.ndarray,
    state: StreamState,
    op_fixed: biquad.BlockedSOS,
    op_custom: biquad.BlockedSOS,
    hann_w: jnp.ndarray,
    plan: dict,
    *,
    mode_index: int,
    cfg: PipelineConfig,
    outputs: str = "magnitude",
    time_axis: str | None = None,
):
    """Process a stream chunk x (..., channels, T), T a multiple of fft_size.

    Pure jittable function: (x, state, ops) -> (out dict, new state).
    ``mode_index``: 0 bypass / 1 fixed / 2 custom (static — each mode is its
    own compiled program, mirroring the reference's datapath mux
    ``src/command_control.vhd:81-120``).

    ``time_axis``: when running inside ``shard_map`` with the stream's frame
    axis sharded over a mesh axis of that name, the IIR state chain exchanges
    per-frame summaries over the interconnect and stays bit-identical to the
    unsharded run; counters then account for the global stream.
    """
    n = cfg.fft_size
    prec = _precision(cfg)
    t = x.shape[-1]
    n_frames = t // n
    lead = x.shape[:-1]  # (..., channels)
    t_global = t if time_axis is None else t * jax.lax.psum(1, time_axis)
    n_frames_global = t_global // n

    # 1. Window over the continuous stream. With frame-aligned hops the
    #    phase is static 0; keep the general path for hop != n later.
    xw = x.reshape(*lead, n_frames, n) * hann_w
    xw = xw.reshape(*lead, t)

    # 2. IIR filter bank (or bypass).
    if mode_index == 0:
        y = xw
        zf = state.sos_state
    else:
        op = op_fixed if mode_index == 1 else op_custom
        if time_axis is None:
            y, zf = biquad.sosfilt_blocked_composite(
                op, xw, state.sos_state, precision=prec
            )
        else:
            y, zf = biquad.sosfilt_blocked_composite_timesharded(
                op, xw, state.sos_state, time_axis=time_axis, precision=prec
            )

    # 3. Per-frame FFT (real input: the reference zero-pads imag,
    #    src/command_control.vhd:123).
    frames = y.reshape(*lead, n_frames, n)
    fr, fi = fft.fft_4step(frames, None, plan, precision=prec)

    out = {}
    if outputs in ("magnitude", "all"):
        out["magnitude"] = magnitude.magnitude(fr, fi)
    if outputs in ("complex", "all"):
        out["re"], out["im"] = fr, fi
    if outputs == "power":
        out["power"] = magnitude.power(fr, fi)

    new_state = StreamState(
        sos_state=zf,
        window_phase=(state.window_phase + t_global) % n,
        frame_count=state.frame_count + n_frames_global,
    )
    return out, new_state


class SpectrumPipeline:
    """Convenience wrapper owning the device constants + jit cache.

    This is the single-device engine; the sharded engine wraps the same
    ``process_stream`` under ``shard_map`` (``tpu_sdr.shard``).
    """

    def __init__(self, cfg: PipelineConfig | None = None):
        self.cfg = cfg or PipelineConfig()
        self.hann_w = window.hann_coefficients(
            self.cfg.fft_size, self.cfg.rtl_faithful_window
        )
        self.plan = fft.plan_constants(self.cfg.fft_n1, self.cfg.fft_n2)
        fb = self.cfg.fft_size // self.cfg.iir_block
        self.op_fixed = biquad.precompute_composite(
            golden.fixed_filter_sos(), self.cfg.iir_block, fb
        )
        # Custom bank boots as identity (pass-through) until coefficients are
        # uploaded — the analog of the zeroed coefficient RAM.
        self.op_custom = biquad.precompute_composite(
            biquad.sos_identity(self.cfg.n_sections), self.cfg.iir_block, fb
        )
        self._jitted = {}

    def initial_state(self, batch_shape=()) -> StreamState:
        return StreamState.initial(
            self.cfg.channels, self.cfg.n_sections, batch_shape
        )

    def upload_sos(self, sos: np.ndarray):
        """Runtime coefficient reload of the custom bank.

        The analog of the 0xF1 coefficient upload path (SURVEY.md §3.5):
        recomputes the blocked operator on device; shapes are unchanged so no
        recompilation of the hot loop occurs. Unstable sections (poles on or
        outside the unit circle) are rejected — the blocked operator raises
        A to the 128th power, which overflows to inf/nan for unstable poles.
        """
        sos = biquad.pad_sos(sos, self.cfg.n_sections)
        for i, sec in enumerate(sos):
            poles = np.roots(sec[3:6])
            if np.any(np.abs(poles) >= 1.0):
                raise ValueError(
                    f"SOS section {i} is unstable (|pole| = "
                    f"{np.max(np.abs(poles)):.4f} >= 1); refusing upload"
                )
        self.op_custom = biquad.precompute_composite(
            sos, self.cfg.iir_block, self.cfg.fft_size // self.cfg.iir_block
        )

    def _fn(self, mode_index: int, outputs: str):
        key = (mode_index, outputs)
        if key not in self._jitted:
            self._jitted[key] = jax.jit(
                functools.partial(
                    process_stream,
                    mode_index=mode_index,
                    cfg=self.cfg,
                    outputs=outputs,
                )
            )
        return self._jitted[key]

    def process(
        self,
        x,
        state: StreamState,
        mode: FilterMode = FilterMode.BYPASS,
        outputs: str = "magnitude",
    ):
        """x: (..., channels, T) or (T,) -> (out dict, new_state)."""
        x = jnp.asarray(x, jnp.float32)
        if x.ndim == 1:
            x = x[None, :]
        if x.shape[-1] % self.cfg.fft_size:
            raise ValueError(
                f"stream chunk length {x.shape[-1]} must be a multiple of "
                f"fft_size={self.cfg.fft_size} (frame-aligned dispatch)"
            )
        fn = self._fn(_MODE_TO_INDEX[FilterMode(mode)], outputs)
        return fn(x, state, self.op_fixed, self.op_custom, self.hann_w, self.plan)
