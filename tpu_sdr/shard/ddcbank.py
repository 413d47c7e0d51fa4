"""Carrier-sharded DDC bank: K carriers spread over the mesh.

The EP-like axis of this framework (SURVEY.md §2.7 "two parallel filter
banks"): one shared wideband stream, K tuners. ``DDCBank`` vmaps the
carriers on one device; this variant shards the CARRIER axis over the
mesh's ``channel`` dimension (each device mixes only its carriers — the
axis needs zero communication) and the TIME axis over ``time`` (the
mixed-tail halo rides one ``ppermute``, exactly like ``ShardedDDC``).
The stream itself is replicated over the carrier axis by the input
sharding — one host upload serves every device.

Bit-identity: the per-carrier NCO phases are absolute-index uint32
words, so every (carrier, time) placement mixes the same bits; the fold
is the shared ``_fold_decimate``. Sharded == single-device ``DDCBank``
BITWISE for every mesh shape (tested in tests/test_ddc.py).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tpu_sdr.kernels.ddc import DDCBank, DDCState, _fold_decimate
from tpu_sdr.shard.halo import left_halo


class ShardedDDCBank:
    """``DDCBank`` over a (channel, time) mesh: carriers on ``channel``,
    the stream on ``time``.

    Input: real ``(T,)`` or IQ planes ``(2, T)`` — ONE shared stream.
    K must divide over the mesh's channel axis; each time shard's slice
    must be a multiple of R and at least the (P-1)*R history."""

    def __init__(self, bank: DDCBank, mesh: jax.sharding.Mesh):
        self.bank = bank
        self.mesh = mesh
        self._jitted = {}

    def initial_state(self) -> DDCState:
        return self.bank.initial_state()

    def retune(self, centers_hz):
        self.bank.retune(centers_hz)

    def _fn(self, iq: bool):
        if iq in self._jitted:
            return self._jitted[iq]
        tmpl = self.bank._template
        hist = tmpl.history_len
        p, r = tmpl.p, tmpl.r
        time_shards = self.mesh.shape["time"]

        def body(x, tail_re, tail_im, phase0s, words, h2):
            t = x.shape[-1]
            idx = jax.lax.axis_index("time")
            # Per-carrier start phase of this time shard (wrapping uint32,
            # exact == single device).
            local0 = phase0s + idx.astype(jnp.uint32) * (jnp.uint32(t) * words)
            n = jax.lax.iota(jnp.uint32, t)
            ph_u = local0[:, None] + n[None, :] * words[:, None]
            ph = ph_u.astype(jnp.float32) * jnp.float32(2.0**-32)
            ang = (2.0 * np.pi) * ph
            c, s = jnp.cos(ang), jnp.sin(ang)
            if iq:
                yre = x[0][None, :] * c + x[1][None, :] * s
                yim = x[1][None, :] * c - x[0][None, :] * s
            else:
                yre = x[None, :] * c
                yim = -(x[None, :] * s)
            outs, new_tails = [], []
            for y, carried in ((yre, tail_re), (yim, tail_im)):
                if hist:
                    halo, new_tail = left_halo(
                        y[..., t - hist:], carried, time_shards)
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
                P(*lead, "time"),  # the ONE stream (replicated over channel)
                P("channel", None),  # mixed tails per carrier
                P("channel", None),
                P("channel"),  # per-carrier NCO start phases
                P("channel"),  # per-carrier tuning words
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

    def _check(self, x, state, iq: bool):
        k = self.bank.k
        ch_shards = self.mesh.shape["channel"]
        if k % ch_shards:
            raise ValueError(
                f"K={k} carriers must divide over {ch_shards} channel shards")
        tmpl = self.bank._template
        time_shards = self.mesh.shape["time"]
        if x.ndim != (2 if iq else 1):
            raise ValueError(
                "sharded bank takes ONE stream: (T,) real or (2, T) IQ")
        if x.shape[-1] % time_shards:
            raise ValueError(
                f"T={x.shape[-1]} must divide over {time_shards} time shards")
        t_loc = x.shape[-1] // time_shards
        if t_loc % tmpl.r:
            raise ValueError(
                f"per-shard slice {t_loc} not a multiple of R={tmpl.r}")
        if t_loc < tmpl.history_len:
            raise ValueError(
                f"per-shard slice {t_loc} shorter than the halo "
                f"({tmpl.history_len}); use fewer time shards")
        want = (k, tmpl.history_len)
        if tuple(state.tail_re.shape) != want:
            raise ValueError(
                f"state shape {tuple(state.tail_re.shape)} != {want}")

    def _process(self, x, state: DDCState, iq: bool):
        x = jnp.asarray(x, jnp.float32)
        self._check(x, state, iq)
        lead = (None,) if iq else ()
        x = jax.device_put(x, NamedSharding(self.mesh, P(*lead, "time")))
        phase0s = jnp.asarray(
            [(state.offset * w) % (1 << 32) for w in self.bank._words],
            jnp.uint32,
        )
        words = jnp.asarray(self.bank._words, jnp.uint32)
        ore, oim, tre, tim = self._fn(iq)(
            x, state.tail_re, state.tail_im, phase0s, words,
            self.bank._template._h2,
        )
        return {"re": ore, "im": oim}, DDCState(
            tre, tim, state.offset + x.shape[-1])

    def process(self, x, state: DDCState):
        """Real stream (T,) -> complex planes (K, T/R), (carrier, time)-
        sharded."""
        return self._process(x, state, iq=False)

    def process_planes(self, xs, state: DDCState):
        """IQ planes (2, T) -> complex planes (K, T/R)."""
        return self._process(xs, state, iq=True)
