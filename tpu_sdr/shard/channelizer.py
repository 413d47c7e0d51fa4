"""Time/channel-sharded PFB channelizer (capability extension).

Same (channel, time) mesh as the spectrum pipeline: the channel axis is
communication-free data parallelism; the time axis splits the stream into
contiguous runs and the only ICI traffic is the (taps−1)·M-sample halo a
shard needs from its left neighbour (one ``ppermute``) plus the carried
stream head for shard 0 — the channelizer analog of the overlapped-framing
halo exchange in ``shard/pipeline.py``. Output is sharded (time, steps)
like the input; the carried state (the stream's global tail) is returned
replicated.

Sharded == single-device bit-identity is tested for every mesh shape
(tests/test_pfb.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from tpu_sdr.kernels.pfb import Channelizer, _forward
from tpu_sdr.shard.halo import left_halo


class ShardedChannelizer:
    """``Channelizer`` under ``shard_map`` over a (channel, time) mesh.

    Input: real ``(C, T)`` or IQ planes ``(2, C, T)``; C must divide over
    the mesh's channel axis, and each time shard's slice must be a
    multiple of M and at least the (taps−1)·M history length.
    """

    def __init__(self, ch: Channelizer, mesh: jax.sharding.Mesh):
        self.ch = ch
        self.mesh = mesh
        self._jitted = {}

    def initial_state(self, batch_shape: tuple = ()) -> jnp.ndarray:
        return self.ch.initial_state(batch_shape)

    def _fn(self, iq: bool, outputs: str):
        key = (iq, outputs)
        if key in self._jitted:
            return self._jitted[key]
        ch = self.ch
        hist = ch.history_len
        time_shards = self.mesh.shape["time"]

        def body(x_loc, state, h2, cos, sin):
            if hist:
                # canonical one-ppermute exchange (shard/halo.py) — also
                # the single-shard identity (halo=state, carry my tail)
                tail = x_loc[..., x_loc.shape[-1] - hist :]
                halo, new_state = left_halo(tail, state, time_shards)
            else:
                halo, new_state = state, state
            cat = jnp.concatenate([halo, x_loc], axis=-1)
            re, im, _ = _forward(
                cat, h2, cos, sin, ch.taps, ch.m, ch._precision, iq=iq,
                use_pallas=ch.use_pallas, kprec=ch._kprec,
            )
            return ch._pack(re, im, outputs), new_state

        lead = (None,) if iq else ()
        # IQ input keeps the re/im lead axis on x and state, but the output
        # is already complex-combined: re/im are plain (C, steps, m)
        out_sp = P("channel", "time", None)
        out_specs_map = {
            "complex": {"re": out_sp, "im": out_sp},
            "magnitude": {"magnitude": out_sp},
            "all": {"re": out_sp, "im": out_sp, "magnitude": out_sp},
        }[outputs]
        shmapped = jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=(
                P(*lead, "channel", "time"),  # x
                P(*lead, "channel", None),  # state (replicated over time)
                P(None),  # h2
                P(None),  # cos
                P(None),  # sin
            ),
            out_specs=(out_specs_map, P(*lead, "channel", None)),
            check_vma=False,
        )
        self._jitted[key] = jax.jit(shmapped)
        return self._jitted[key]

    def shard_input(self, x, iq: bool) -> jax.Array:
        lead = (None,) if iq else ()
        # host input: ONE device_put with the target sharding (no default-
        # device hop); device input: reshard (see pipeline.shard_input)
        if isinstance(x, jax.Array):
            if x.dtype != jnp.float32:
                x = x.astype(jnp.float32)
        else:
            x = np.asarray(x, np.float32)
        return jax.device_put(
            x, NamedSharding(self.mesh, P(*lead, "channel", "time")),
        )

    def _check(self, xs, state, iq: bool):
        t_loc = xs.shape[-1] // self.mesh.shape["time"]
        if xs.shape[-1] % self.mesh.shape["time"]:
            raise ValueError(
                f"T={xs.shape[-1]} must divide over {self.mesh.shape['time']} "
                "time shards"
            )
        cd = self.mesh.shape["channel"]
        if xs.shape[-2] % cd:
            raise ValueError(
                f"channels ({xs.shape[-2]}) must be a multiple of the mesh "
                f"channel axis ({cd})"
            )
        if t_loc % self.ch.m:
            raise ValueError(
                f"per-shard slice {t_loc} not a multiple of m={self.ch.m}"
            )
        if t_loc < self.ch.history_len:
            raise ValueError(
                f"per-shard slice {t_loc} shorter than the halo "
                f"({self.ch.history_len}); use fewer time shards"
            )
        want = xs.shape[:-1] + (self.ch.history_len,)
        if tuple(state.shape) != want:
            raise ValueError(f"state shape {tuple(state.shape)} != {want}")

    def process(self, x, state, outputs: str = "complex"):
        """Real-input sharded channelization: x (C, T)."""
        if not isinstance(x, jax.Array):
            x = np.asarray(x, np.float32)
        self._check(x, state, iq=False)  # friendly errors BEFORE the put
        x = self.shard_input(x, iq=False)
        return self._fn(False, outputs)(
            x, state, self.ch._h2, self.ch._cos, self.ch._sin
        )

    def process_planes(self, xs, state_planes, outputs: str = "complex"):
        """IQ-input sharded channelization: xs (2, C, T) re/im planes."""
        if not isinstance(xs, jax.Array):
            xs = np.asarray(xs, np.float32)
        self._check(xs, state_planes, iq=True)
        xs = self.shard_input(xs, iq=True)
        return self._fn(True, outputs)(
            xs, state_planes, self.ch._h2, self.ch._cos, self.ch._sin
        )
