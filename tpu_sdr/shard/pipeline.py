"""Sharded spectrum pipeline: shard_map over a (channel, time) mesh.

The distributed equivalent of the reference's single-stream dataflow
(SURVEY.md §2.8): instead of UART/Ethernet framing between producer and
consumer, shards exchange only the per-frame IIR state summaries over
ICI/DCN collectives; spectra come out sharded (channel, frame) and are
gathered (or packetized per-shard) at the host edge.

Bit-consistency contract: for any mesh shape, outputs and final state are
bit-identical to the single-device ``SpectrumPipeline`` — validated in
tests/test_sharding.py on a virtual 8-device CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from tpu_sdr.core.config import FilterMode, PipelineConfig
from tpu_sdr.kernels import biquad, window, fft
from tpu_sdr.control import golden
from tpu_sdr.runtime.state import StreamState
from tpu_sdr.runtime.stream import (
    process_stream,
    process_stream_complex,
    _MODE_TO_INDEX,
)


class ShardedSpectrumPipeline:
    """Multi-device engine: x (C, T) sharded (channel, time-frames).

    The carried stream-head state is replicated over the time axis (it is
    the state at the global stream head; every device derives its own
    entry state from the gathered frame summaries).
    """

    def __init__(self, cfg: PipelineConfig | None = None, mesh=None):
        from tpu_sdr.shard.mesh import make_sdr_mesh

        self.cfg = cfg or PipelineConfig()
        self.mesh = mesh if mesh is not None else make_sdr_mesh()
        self.hann_w = window.hann_coefficients(
            self.cfg.fft_size, self.cfg.rtl_faithful_window
        )
        self.plan = fft.plan_constants(self.cfg.fft_n1, self.cfg.fft_n2)
        self.bank_fixed = self._build_bank(golden.fixed_filter_sos())
        self.bank_custom = self._build_bank(
            biquad.sos_identity(self.cfg.n_sections)
        )
        self._jitted = {}

    def _build_bank(self, sos: np.ndarray) -> dict:
        from tpu_sdr.runtime import banks

        return banks.build_bank(self.cfg, self.hann_w, self.plan, sos)

    def initial_state(self, batch_shape=()) -> StreamState:
        """batch_shape=(2,) for complex (IQ) input (re/im-stacked state)."""
        return StreamState.initial(
            self.cfg.channels,
            self.cfg.n_sections,
            batch_shape,
            history_len=self.cfg.fft_size - self.cfg.effective_hop,
        )

    def upload_sos(self, sos: np.ndarray):
        from tpu_sdr.runtime import banks

        self.bank_custom = self._build_bank(
            banks.prepare_sos(sos, self.cfg.n_sections)
        )

    def upload_sos_bank(self, sos_bank):
        """Per-channel coefficient reload on any (channel, time) mesh.

        Per-channel operators shard over the channel axis and are replicated
        over time; under time sharding the banked cascade exchanges only
        per-frame (C, m) state summaries over the interconnect.
        """
        from tpu_sdr.runtime import banks

        padded = banks.prepare_bank(
            sos_bank, self.cfg.channels, self.cfg.n_sections
        )
        op = banks.build_channel_bank_op(self.cfg, padded)
        op = jax.device_put(
            op,
            jax.tree_util.tree_map(
                lambda _: NamedSharding(self.mesh, P("channel")), op
            ),
        )
        self.bank_custom = {"op": op, "pp": self.bank_fixed["pp"]}

    def _fn(self, mode_index: int, outputs: str, complex_input: bool = False):
        banked = self.bank_custom["op"].T.ndim == 3
        key = (mode_index, outputs, banked, complex_input)
        if key in self._jitted:
            return self._jitted[key]

        # Complex (IQ) input stacks re/im as an unsharded leading axis.
        lead = (None,) if complex_input else ()
        state_specs = StreamState(
            sos_state=P(*lead, "channel", None, None),
            window_phase=P(),
            frame_count=P(),
            history=(
                P(*lead, "channel", None)
                if self.cfg.effective_hop != self.cfg.fft_size
                else None
            ),
        )
        sp = P("channel", "time", None)
        out_specs_map = {
            "magnitude": {"magnitude": sp},
            "power": {"power": sp},
            "phase": {"phase": sp},
            "complex": {"re": sp, "im": sp},
            "all": {"magnitude": sp, "re": sp, "im": sp, "phase": sp, "power": sp},
        }[outputs]

        # With a single time shard there is nothing to exchange; skip the
        # collectives entirely. (Per-channel banks fully support time
        # sharding too — test_banked_time_sharded_equals_single.)
        time_axis = "time" if self.mesh.shape["time"] > 1 else None
        body = functools.partial(
            process_stream_complex if complex_input else process_stream,
            mode_index=mode_index,
            cfg=self.cfg,
            outputs=outputs,
            time_axis=time_axis,
            pallas_interpret=jax.default_backend() == "cpu",
        )

        custom_spec = (
            {
                "op": jax.tree_util.tree_map(
                    lambda _: P("channel"), self.bank_custom["op"]
                ),
                "pp": P(None),
            }
            if banked
            else P(None)
        )
        shmapped = jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=(
                P(*lead, "channel", "time"),  # x (C, T) or (2, C, T)
                state_specs,
                P(None),  # bank_fixed (replicated pytree)
                custom_spec,  # bank_custom (sharded over channel when banked)
                P(None),  # hann_w
                P(None),  # plan
            ),
            out_specs=(out_specs_map, state_specs),
            check_vma=False,
        )
        self._jitted[key] = jax.jit(shmapped)
        return self._jitted[key]

    def shard_input(self, x) -> jax.Array:
        """Place host samples (C, T) onto the mesh with the canonical layout.

        The time axis is split into contiguous per-device frame runs —
        the sharded analog of the reference's sequential frame stream.
        Complex input becomes a re/im-stacked (2, C, T) array with the
        stacked axis replicated.
        """
        if jnp.iscomplexobj(x):
            # Split on the host: TPU backends may not implement complex
            # dtypes on device at all.
            xn = np.asarray(x)
            if xn.ndim == 1:
                xn = xn[None, :]
            xs = np.stack([xn.real, xn.imag], axis=0).astype(np.float32)
            return jax.device_put(
                xs, NamedSharding(self.mesh, P(None, "channel", "time"))
            )
        # Host input goes up in ONE device_put with the target sharding,
        # like the complex branch above (review finding: jnp.asarray-then-
        # device_put first committed the whole chunk to the default device
        # and paid a second placement hop; per CLAUDE.md transfer
        # discipline, host<->device ops are priced per-OPERATION on this
        # tunnel). Already-device-resident arrays keep the reshard path —
        # np.asarray would drag them back through the host.
        if isinstance(x, jax.Array):
            if x.dtype != jnp.float32:
                x = x.astype(jnp.float32)
        else:
            x = np.asarray(x, np.float32)
        if x.ndim == 1:
            x = x[None, :]
        return jax.device_put(
            x, NamedSharding(self.mesh, P("channel", "time"))
        )

    def process(
        self,
        x,
        state: StreamState,
        mode: FilterMode = FilterMode.BYPASS,
        outputs: str = "magnitude",
    ):
        complex_input = jnp.iscomplexobj(x)
        if complex_input:
            expected = (2, self.cfg.channels, self.cfg.n_sections, 2)
            if tuple(state.sos_state.shape) != expected:
                raise ValueError(
                    "complex input needs a re/im-stacked state of shape "
                    f"{expected}, got {tuple(state.sos_state.shape)}: create "
                    "it with initial_state(batch_shape=(2,))"
                )
        # friendly errors BEFORE the put (like channelizer/ddc/psd): a bad
        # chunk length must not cost a multi-MB mesh transfer first, and a
        # non-divisible T would die inside shard_map as a cryptic GSPMD
        # sharding error
        tpd = self.mesh.shape["time"] * self.cfg.fft_size
        if np.shape(x)[-1] % tpd:
            raise ValueError(
                f"stream chunk length {np.shape(x)[-1]} must be a multiple "
                f"of time_shards*fft_size = {tpd}"
            )
        cd = self.mesh.shape["channel"]
        if self.cfg.channels % cd:
            # same friendly-error rule for the channel axis (review
            # finding: this one used to fall through to the GSPMD error)
            raise ValueError(
                f"channels ({self.cfg.channels}) must be a multiple of the "
                f"mesh channel axis ({cd})"
            )
        x = self.shard_input(x)
        fn = self._fn(
            _MODE_TO_INDEX[FilterMode(mode)], outputs, complex_input
        )
        return fn(
            x, state, self.bank_fixed, self.bank_custom, self.hann_w, self.plan
        )
