"""Time/channel-sharded overlap-save FastFIR (capability extension).

Same (channel, time) mesh as the rest of the framework: the channel axis
is communication-free data parallelism; the time axis splits the stream
into contiguous runs and the only ICI traffic is the ``history``-sample
input halo each shard pulls from its left neighbour (one ``ppermute``)
plus the carried stream head for shard 0. Because overlap-save frames
are independent (no cross-frame reduction) and every shard's local block
grid lands on the absolute global grid (per-shard slices are multiples
of ``block``), the sharded output is **bitwise** identical to the
single-device run for every mesh shape (tests/test_fastconv.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from tpu_sdr.kernels.fastconv import FastFIR, FastFIRState, _fastfir_forward
from tpu_sdr.shard.halo import left_halo


class ShardedFastFIR:
    """``FastFIR`` under ``shard_map`` over a (channel, time) mesh.

    Input: real ``(C, T)`` or IQ planes ``(2, C, T)``; C must divide
    over the mesh's channel axis, and each time shard's slice must be a
    multiple of ``block`` — i.e. T a multiple of ``chunk_granularity``
    (= block x time_shards) — and at least ``history`` long.
    """

    def __init__(self, f: FastFIR, mesh: jax.sharding.Mesh):
        self.f = f
        self.mesh = mesh
        self._jitted = {}

    @property
    def chunk_granularity(self) -> int:
        return self.f.block * self.mesh.shape["time"]

    def initial_state(self, batch_shape: tuple = (),
                      iq: bool | None = None) -> FastFIRState:
        return self.f.initial_state(batch_shape, iq=iq)

    def _fn(self, iq: bool):
        if iq in self._jitted:
            return self._jitted[iq]
        f = self.f
        hist = f.history
        time_shards = self.mesh.shape["time"]

        def body(x_loc, tail, hr, hi, plan):
            if time_shards > 1:
                # canonical one-ppermute exchange (shard/halo.py)
                mine = x_loc[..., x_loc.shape[-1] - hist:]
                halo, new_tail = left_halo(mine, tail, time_shards)
            else:
                halo = tail
                new_tail = None  # forward returns it below
            if iq:
                o_r, o_i, t_r, t_i = _fastfir_forward(
                    x_loc[0], x_loc[1], halo[0], halo[1], hr, hi, plan,
                    block=f.block, history=hist, cplx=True,
                    precision=f._precision)
                out = jnp.stack([o_r, o_i])
                loc_tail = jnp.stack([t_r, t_i])
            else:
                out, loc_tail = _fastfir_forward(
                    x_loc, None, halo, None, hr, hi, plan,
                    block=f.block, history=hist, cplx=False,
                    precision=f._precision)
            if new_tail is None:
                new_tail = loc_tail
            return out, new_tail

        lead = (None,) if iq else ()
        shmapped = jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=(
                P(*lead, "channel", "time"),   # x
                P(*lead, "channel", None),     # tail (replicated over time)
                P(None), P(None), P(None),     # hr, hi, plan (prefix)
            ),
            out_specs=(P(*lead, "channel", "time"),
                       P(*lead, "channel", None)),
            check_vma=False,
        )
        self._jitted[iq] = jax.jit(shmapped)
        return self._jitted[iq]

    def _check(self, shape, state: FastFIRState, iq: bool):
        t = shape[-1]
        t_shards = self.mesh.shape["time"]
        if t % t_shards:
            raise ValueError(
                f"T={t} must divide over {t_shards} time shards")
        t_loc = t // t_shards
        if t_loc % self.f.block:
            # message names the same quantity chunk_granularity reports
            # (review finding: it used to call the per-shard block size
            # 'chunk_granularity', contradicting the property)
            raise ValueError(
                f"per-shard slice {t_loc} not a multiple of block="
                f"{self.f.block}; chunk T must be a multiple of "
                f"chunk_granularity={self.chunk_granularity}")
        cd = self.mesh.shape["channel"]
        if shape[-2] % cd:
            raise ValueError(
                f"channels ({shape[-2]}) must be a multiple of the mesh "
                f"channel axis ({cd})")
        if t_loc < self.f.history:
            raise ValueError(
                f"per-shard slice {t_loc} shorter than the halo "
                f"({self.f.history}); use fewer time shards")
        want = tuple(shape[:-1]) + (self.f.history,)
        if tuple(state.tail.shape) != want:
            raise ValueError(
                f"state shape {tuple(state.tail.shape)} != {want}")

    def _shard_input(self, x, iq: bool):
        lead = (None,) if iq else ()
        # host input: ONE device_put with the target sharding (no default-
        # device hop); device input: reshard (see pipeline.shard_input)
        if isinstance(x, jax.Array):
            if x.dtype != jnp.float32:
                x = x.astype(jnp.float32)
        else:
            x = np.asarray(x, np.float32)
        return jax.device_put(
            x, NamedSharding(self.mesh, P(*lead, "channel", "time")))

    def process(self, x, state: FastFIRState):
        """Real sharded filtering: x (C, T) -> (out (C, T), new state)."""
        if self.f.complex_taps:
            raise ValueError(
                "complex taps produce IQ output; use process_planes")
        if not isinstance(x, jax.Array):
            x = np.asarray(x, np.float32)
        self._check(x.shape, state, iq=False)
        out, tail = self._fn(False)(
            self._shard_input(x, False), state.tail,
            self.f._hr, self.f._hi, self.f._plan)
        return out, FastFIRState(tail, state.offset + x.shape[-1])

    def process_planes(self, planes, state: FastFIRState):
        """IQ sharded filtering: planes (2, C, T) -> (planes, state)."""
        if not isinstance(planes, jax.Array):
            planes = np.asarray(planes, np.float32)
        if planes.shape[0] != 2:
            raise ValueError(
                f"planes must be (2, C, T); got {tuple(planes.shape)}")
        self._check(planes.shape, state, iq=True)
        out, tail = self._fn(True)(
            self._shard_input(planes, True), state.tail,
            self.f._hr, self.f._hi, self.f._plan)
        return out, FastFIRState(tail, state.offset + planes.shape[-1])
