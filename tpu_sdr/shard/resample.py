"""Time/channel-sharded rational resampler.

The polyphase L/M resampler's outputs depend only on a (P-1)-sample
input window, and its phase pattern restarts at zero whenever the
absolute input offset is a multiple of M — which every shard boundary
is, given per-shard slices that are M multiples. So sharding the time
axis needs exactly ONE ``ppermute``: each shard passes its last P-1
input samples to its right neighbour (shard 0 splices the carried
stream history) and then runs the IDENTICAL single-device forward
(``kernels/resample._resample_forward``) on its slice. Outputs stay
(channel, time)-sharded with T*L/M per shard; the new global tail is
replicated back as the carried state.

Sharded == single-device BITWISE for every mesh shape (tested).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tpu_sdr.kernels.resample import Resampler, ResamplerState, _resample_forward
from tpu_sdr.shard.halo import left_halo


class ShardedResampler:
    """``Resampler`` over a (channel, time) mesh: input (C, T), C over
    ``channel``, T over ``time``; per-shard slices must be multiples of
    the reduced M and at least P-1 samples."""

    def __init__(self, rs: Resampler, mesh: jax.sharding.Mesh):
        self.rs = rs
        self.mesh = mesh
        ts = mesh.shape["time"]
        hist = rs.history_len

        def body(x, tail, h):
            t = x.shape[-1]
            if hist:
                halo, new_tail = left_halo(x[..., t - hist:], tail, ts)
            else:
                halo, new_tail = tail, tail
            out, _ = _resample_forward.__wrapped__(
                x, halo, h, up=rs.up, down=rs.down, p=rs.p)
            return out, new_tail

        self._body = body
        self._jitted_by_rank: dict[int, object] = {}

    def _jitted(self, rank: int):
        """The shard_map'd body for a given input rank: (C, T) for mono
        audio, (C, 2, T) for a stereo receiver's L/R planes — the extra
        middle axes are unsharded."""
        fn = self._jitted_by_rank.get(rank)
        if fn is None:
            mid = (None,) * (rank - 2)
            fn = jax.jit(jax.shard_map(
                self._body, mesh=self.mesh,
                in_specs=(P("channel", *mid, "time"),
                          P("channel", *mid, None), P(None)),
                out_specs=(P("channel", *mid, "time"),
                           P("channel", *mid, None)),
                check_vma=False,
            ))
            self._jitted_by_rank[rank] = fn
        return fn

    def initial_state(self, batch_shape: tuple = ()) -> ResamplerState:
        return self.rs.initial_state(batch_shape)

    def process(self, x, state: ResamplerState):
        ts = self.mesh.shape["time"]
        t = x.shape[-1]
        if t % ts:
            raise ValueError(f"T={t} must divide over {ts} time shards")
        t_loc = t // ts
        if t_loc % self.rs.down:
            raise ValueError(
                f"per-shard slice {t_loc} not a multiple of M={self.rs.down}")
        if t_loc < self.rs.history_len:
            raise ValueError(
                f"per-shard slice {t_loc} shorter than the halo "
                f"({self.rs.history_len}); use fewer time shards")
        want = tuple(x.shape[:-1]) + (self.rs.history_len,)
        if tuple(state.tail.shape) != want:
            raise ValueError(f"state shape {tuple(state.tail.shape)} != {want}")
        mid = (None,) * (x.ndim - 2)
        x = jax.device_put(
            jnp.asarray(x, jnp.float32),
            NamedSharding(self.mesh, P("channel", *mid, "time")))
        out, tail = self._jitted(x.ndim)(x, state.tail, self.rs._h)
        return out, ResamplerState(tail, state.offset + t)
