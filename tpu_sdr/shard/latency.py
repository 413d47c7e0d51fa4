"""Latency-mode pipeline: ONE 16K frame spread across the whole mesh.

The throughput engine (`tpu_sdr.shard.pipeline`) shards whole frames; its
per-frame latency is a single device's frame time. This module instead puts
every device to work on the SAME frame — the TPU-native analog of the
reference's pipelined single-stream datapath (<10 ms acquisition→display,
``README.md:169``), for latency-critical single-stream operation:

  1. the frame's (n2, n1) block view is ROW-sharded: each device holds
     B/D contiguous 128-sample blocks;
  2. window + the blocked IIR run locally; only per-device m-vector state
     summaries cross the interconnect (`all_gather`, D*m floats), every
     device replays the tiny replicated device chain — bit-consistent by
     the same construction as the throughput path;
  3. one `all_to_all` re-shards rows→columns — the four-step FFT's
     transpose as a collective;
  4. `fft_4step_sharded` (step-1/twiddle local, step-3 partials combined
     with `psum_scatter` over k1) leaves the natural-order spectrum
     k1-contiguously sharded; magnitude is local.

SURVEY.md §2.7 "TP-like intra-FFT sharding" — this is the streaming-engine
integration of that kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from tpu_sdr.core.config import FilterMode, PipelineConfig
from tpu_sdr.kernels import biquad, fft, window
from tpu_sdr.kernels.biquad import _composite_emit, _composite_frame_terms
from tpu_sdr.control import golden
from tpu_sdr.runtime.stream import _MODE_TO_INDEX, _precision

Precision = jax.lax.Precision


class LatencyPipeline:
    """Single-frame, whole-mesh engine. x: (fft_size,) real samples.

    State is just the composite IIR state (replicated): (n_sections, 2).
    """

    def __init__(self, cfg: PipelineConfig | None = None, mesh=None):
        self.cfg = cfg or PipelineConfig()
        if self.cfg.channels != 1:
            raise ValueError("latency mode is single-stream (channels=1)")
        if self.cfg.effective_hop != self.cfg.fft_size:
            raise ValueError("latency mode has no overlap (hop == fft_size)")
        if mesh is None:
            mesh = jax.make_mesh((len(jax.devices()),), ("fft",))
        self.mesh = mesh
        (self.axis,) = mesh.axis_names
        self.D = mesh.shape[self.axis]
        n2, n1 = self.cfg.fft_n2, self.cfg.fft_n1
        if n2 % self.D or n1 % self.D:
            raise ValueError(
                f"mesh size {self.D} must divide n1={n1} and n2={n2}"
            )
        if self.cfg.iir_block != n1:
            # The latency engine's IIR blocks are the rows of the (n2, n1)
            # view, so the composite operator's block length must equal
            # fft_n1 (review finding: a legal fft_n1=64/iir_block=128
            # config used to die in a cryptic einsum shape error deep
            # inside shard_map at the first filtered frame).
            raise ValueError(
                f"latency mode requires iir_block == fft_n1 (the IIR "
                f"blocks are the frame's rows); got iir_block="
                f"{self.cfg.iir_block}, fft_n1={n1}"
            )
        self.b_loc = n2 // self.D  # contiguous blocks per device
        self.hann2d = window.hann_coefficients(
            self.cfg.fft_size, self.cfg.rtl_faithful_window
        ).reshape(n2, n1)
        self.plan = fft.plan_constants(n1, n2)
        # Per-device composite operator: B_loc blocks per "frame"; its ALB is
        # the per-device state transition A^(B_loc*L).
        self.op_fixed = biquad.precompute_composite(
            golden.fixed_filter_sos(), self.cfg.iir_block, self.b_loc
        )
        self.op_custom = biquad.precompute_composite(
            biquad.sos_identity(self.cfg.n_sections),
            self.cfg.iir_block,
            self.b_loc,
        )
        self._jitted = {}

    def initial_state(self) -> jnp.ndarray:
        return jnp.zeros((self.cfg.n_sections, 2), jnp.float32)

    def upload_sos(self, sos: np.ndarray):
        from tpu_sdr.runtime import banks

        self.op_custom = biquad.precompute_composite(
            banks.prepare_sos(sos, self.cfg.n_sections),
            self.cfg.iir_block,
            self.b_loc,
        )
        self._jitted.clear()  # operators are captured as constants

    def _body(self, x2d_loc, zi, op, *, mode_index, prec):
        ax = self.axis
        m = 2 * self.cfg.n_sections
        xw = x2d_loc * self._w_loc()
        if mode_index == 0:
            y = xw
            zf = zi.reshape(m)
        else:
            v = xw[None]  # one local "frame" of B_loc blocks
            # canonical=False: skip the single-frame GEMV guard's 2x padding
            # — latency mode's contract is cross-engine float parity, not the
            # streaming engine's bitwise chunking invariance.
            y_zs, zhat = _composite_frame_terms(op, v, prec, canonical=False)
            w_dev = zhat[0, -1]  # (m,) my end-of-span summary
            w_all = jax.lax.all_gather(w_dev, ax)  # (D, m) replicated

            def step(z, w):
                # biquad.alb_step: the one exact-f32 VPU frame-chain step
                return biquad.alb_step(op, z, w), z

            z0 = zi.reshape(m)
            zf, z_starts = jax.lax.scan(step, z0, w_all)
            mine = z_starts[jax.lax.axis_index(ax)]
            y = _composite_emit(op, y_zs, zhat, mine[None], prec)[0]
        # rows -> columns: the four-step transpose as an all_to_all
        y_cols = jax.lax.all_to_all(
            y, ax, split_axis=1, concat_axis=0, tiled=True
        )  # (n2, n1/D)
        fr, fi = fft.fft_4step_sharded(y_cols, None, self.plan, ax, prec)
        return jnp.sqrt(fr * fr + fi * fi), zf.reshape(
            self.cfg.n_sections, 2
        )

    def _w_loc(self):
        # window rows for my block span (sliced inside shard_map; hann2d is
        # captured as a replicated constant)
        idx = jax.lax.axis_index(self.axis)
        return jax.lax.dynamic_slice_in_dim(
            self.hann2d, idx * self.b_loc, self.b_loc, axis=0
        )

    def _fn(self, mode_index: int):
        if mode_index in self._jitted:
            return self._jitted[mode_index]
        # Honor the configured quality tier (the sharded FFT accepts any
        # jax.lax.Precision; there is no Pallas kernel on this path).
        prec = _precision(self.cfg)
        op = self.op_fixed if mode_index == 1 else self.op_custom

        body = functools.partial(
            self._body, op=op, mode_index=mode_index, prec=prec
        )
        fn = jax.jit(
            jax.shard_map(
                body,
                mesh=self.mesh,
                in_specs=(P(self.axis, None), P()),
                out_specs=(P(self.axis), P()),
                check_vma=False,
            )
        )
        self._jitted[mode_index] = fn
        return fn

    def process_frame(
        self, x, state, mode: FilterMode = FilterMode.BYPASS
    ):
        """x (fft_size,) -> (magnitude (fft_size,), new_state)."""
        n = self.cfg.fft_size
        x = jnp.asarray(x, jnp.float32).reshape(n)
        x2d = x.reshape(self.cfg.fft_n2, self.cfg.fft_n1)
        fn = self._fn(_MODE_TO_INDEX[FilterMode(mode)])
        mag, zf = fn(x2d, jnp.asarray(state, jnp.float32))
        return mag.reshape(n), zf
