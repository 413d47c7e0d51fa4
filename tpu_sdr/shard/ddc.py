"""Time/channel-sharded DDC (capability extension).

Same (channel, time) mesh as the rest of the framework. The NCO is
trivially shardable — the 32-bit phase accumulator is a wrapping uint32
multiply from the absolute sample index, so each time shard computes
its slice's phases exactly (bit-identical to the single-device mixer:
``local0 = phase0 + shard_index * t_loc * K`` wraps to the same words).
The
decimating FIR needs the previous (P-1)*R MIXED samples: each shard
mixes locally, sends its mixed tail to the right neighbour with one
``ppermute``, and shard 0 splices the carried stream history — the same
halo pattern as ``shard/channelizer.py``. The carried state (the
stream's global mixed tail) is returned replicated; the output stays
(channel, time)-sharded.

Sharded == single-device bit-identity is tested for every mesh shape
(tests/test_ddc.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tpu_sdr.kernels.ddc import DDC, DDCState, _fold_decimate, _mix
from tpu_sdr.shard.halo import left_halo


class ShardedDDC:
    """``DDC`` under ``shard_map`` over a (channel, time) mesh.

    Input: real ``(C, T)`` or IQ planes ``(2, C, T)``; C must divide over
    the mesh's channel axis; each time shard's slice must be a multiple
    of R and at least the (P-1)*R history length.
    """

    def __init__(self, ddc: DDC, mesh: jax.sharding.Mesh):
        self.ddc = ddc
        self.mesh = mesh
        self._jitted = {}

    def initial_state(self, batch_shape: tuple = ()) -> DDCState:
        return self.ddc.initial_state(batch_shape)

    def _fn(self, iq: bool):
        if iq in self._jitted:
            return self._jitted[iq]
        ddc = self.ddc
        hist = ddc.history_len
        p, r = ddc.p, ddc.r
        time_shards = self.mesh.shape["time"]

        def body(x, tail_re, tail_im, phase0, k, h2):
            t = x.shape[-1]
            # this shard's start phase: global start + idx*t_loc samples
            # of tuning word — wrapping uint32, exact (== single device)
            idx = jax.lax.axis_index("time")
            local0 = phase0 + idx.astype(jnp.uint32) * (jnp.uint32(t) * k)
            yre, yim = _mix(x, local0, k, iq)
            outs, new_tails = [], []
            for y, carried in ((yre, tail_re), (yim, tail_im)):
                if hist:
                    halo, new_tail = left_halo(
                        y[..., t - hist :], carried, time_shards)
                else:
                    halo, new_tail = carried, carried
                cat = jnp.concatenate([halo, y], axis=-1) if hist else y
                outs.append(_fold_decimate(cat, h2, p, r))
                new_tails.append(new_tail)
            return outs[0], outs[1], new_tails[0], new_tails[1]

        lead = (None,) if iq else ()
        shmapped = jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=(
                P(*lead, "channel", "time"),  # x
                P("channel", None),  # mixed tail re (replicated over time)
                P("channel", None),  # mixed tail im
                P(),  # NCO start phase (uint32 scalar, replicated)
                P(),  # NCO tuning word (uint32 scalar, replicated)
                P(None),  # h2
            ),
            out_specs=(
                P("channel", "time"),
                P("channel", "time"),
                P("channel", None),
                P("channel", None),
            ),
            check_vma=False,
        )
        self._jitted[iq] = jax.jit(shmapped)
        return self._jitted[iq]

    def _check(self, xs, state, iq: bool):
        time_shards = self.mesh.shape["time"]
        if xs.shape[-1] % time_shards:
            raise ValueError(
                f"T={xs.shape[-1]} must divide over {time_shards} time shards"
            )
        t_loc = xs.shape[-1] // time_shards
        if t_loc % self.ddc.r:
            raise ValueError(
                f"per-shard slice {t_loc} not a multiple of R={self.ddc.r}"
            )
        if t_loc < self.ddc.history_len:
            raise ValueError(
                f"per-shard slice {t_loc} shorter than the halo "
                f"({self.ddc.history_len}); use fewer time shards"
            )
        batch = xs.shape[1:-1] if iq else xs.shape[:-1]
        want = tuple(batch) + (self.ddc.history_len,)
        if tuple(state.tail_re.shape) != want:
            raise ValueError(
                f"state shape {tuple(state.tail_re.shape)} != {want}"
            )

    def _process(self, x, state: DDCState, iq: bool):
        lead = (None,) if iq else ()
        x = jnp.asarray(x, jnp.float32)
        self._check(x, state, iq)  # friendly errors BEFORE the sharded put
        x = jax.device_put(
            x, NamedSharding(self.mesh, P(*lead, "channel", "time"))
        )
        phase0, k = self.ddc._nco_scalars(state.offset)
        ore, oim, tre, tim = self._fn(iq)(
            x, state.tail_re, state.tail_im, phase0, k, self.ddc._h2
        )
        return {"re": ore, "im": oim}, DDCState(
            tre, tim, state.offset + x.shape[-1]
        )

    def process(self, x, state: DDCState):
        """Real input (C, T) -> complex baseband planes (C, T/R)."""
        return self._process(x, state, iq=False)

    def process_planes(self, xs, state: DDCState):
        """IQ planes (2, C, T) -> complex baseband planes (C, T/R)."""
        return self._process(xs, state, iq=True)
