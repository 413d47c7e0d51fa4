"""Time/channel-sharded demodulators and AGC.

The recurrence story (SURVEY.md §5.7) applied to the receiver chain:
every demod recurrence here is the first-order affine solver of
``kernels/demod.py``, whose in-block Hillis-Steele tree is fixed at 128
samples. Sharding the time axis therefore needs only:

1. the in-block prefixes computed locally (identical ops when shard
   boundaries align to block multiples),
2. ONE ``all_gather`` of the per-block affine scalars (2 floats per
   128 samples — far below ICI limits), after which every device
   replays the identical replicated inter-block chain and slices its
   own block inputs — the same replay pattern as the spectrum
   pipeline's time sharding, and
3. a one-sample left-neighbour halo (``ppermute``) for the FM
   discriminator / AM envelope difference.

Sharded == single-device BITWISE for every mesh shape (tested in
tests/test_shard_receiver.py). The channel axis is communication-free.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tpu_sdr.shard.halo import left_halo
from tpu_sdr.kernels.ddc import _nco_cos_sin
from tpu_sdr.kernels.demod import (
    AGC,
    AGCState,
    AMDemodulator,
    DemodState,
    FMDemodulator,
    SSBDemodulator,
    Squelch,
    SquelchState,
    _agc_solve,
    _chain_blocks,
    _fm_disc_raw,
    _inblock_prefix,
)


def _affine_timesharded(a, b, y0, block: int, time_shards: int):
    """The blocked affine solver under shard_map: a, b (..., t_loc)
    sharded on "time"; y0 (...,) replicated. Returns (y (..., t_loc)
    sharded, y_final (...,) replicated). Bitwise == the single-device
    ``_affine_prefix_raw`` when t_loc % block == 0."""
    lead = a.shape[:-1]
    A, B = _inblock_prefix(a, b, block)  # (..., G_loc, L)
    A_l, B_l = A[..., -1], B[..., -1]  # (..., G_loc)
    if time_shards > 1:
        A_all = jnp.moveaxis(jax.lax.all_gather(A_l, "time"), 0, -2)
        B_all = jnp.moveaxis(jax.lax.all_gather(B_l, "time"), 0, -2)
        A_all = A_all.reshape(*lead, -1)  # (..., ts*G_loc) time-major
        B_all = B_all.reshape(*lead, -1)
    else:
        A_all, B_all = A_l, B_l
    y_final, y_ins_all = _chain_blocks(A_all, B_all, y0, len(lead))
    if time_shards > 1:
        idx = jax.lax.axis_index("time")
        g_loc = A_l.shape[-1]
        y_ins = jax.lax.dynamic_slice_in_dim(
            y_ins_all, idx * g_loc, g_loc, axis=-1)
    else:
        y_ins = y_ins_all
    y = A * y_ins[..., None] + B
    return y.reshape(*a.shape), y_final


def _prev_sample_halo(last, carried, time_shards: int):
    """One-sample halo: each shard receives its left neighbour's last
    sample; shard 0 splices the carried stream history. Returns
    (prev (..., 1) sharded, new_carried (..., 1) replicated = the global
    last sample)."""
    return left_halo(last, carried, time_shards)


class _ShardedDemodBase:
    """Shared plumbing: (C, T) planes over the (channel, time) mesh."""

    def __init__(self, inner, mesh: jax.sharding.Mesh):
        self.inner = inner
        self.mesh = mesh
        self._jitted = None

    def initial_state(self, batch_shape: tuple = ()):
        return self.inner.initial_state(batch_shape)

    def _block(self) -> int:
        return getattr(self.inner, "block", 1)

    def _check(self, re, state):
        ts = self.mesh.shape["time"]
        t = re.shape[-1]
        if t % ts:
            raise ValueError(f"T={t} must divide over {ts} time shards")
        blk = self._block()
        if (t // ts) % blk:
            raise ValueError(
                f"per-shard slice {t // ts} not a multiple of block={blk}")

    def _place(self, *planes):
        sh = NamedSharding(self.mesh, P("channel", "time"))
        return tuple(jax.device_put(jnp.asarray(p, jnp.float32), sh)
                     for p in planes)


class ShardedFMDemodulator(_ShardedDemodBase):
    """``FMDemodulator`` over the mesh: discriminator halo = 1 sample,
    de-emphasis via the time-sharded affine solver."""

    def __init__(self, fm: FMDemodulator, mesh: jax.sharding.Mesh):
        super().__init__(fm, mesh)
        fm_ = fm
        ts = mesh.shape["time"]

        def body(re, im, prev_re, prev_im, filt):
            prev_r, new_r = _prev_sample_halo(re[..., -1:], prev_re, ts)
            prev_i, new_i = _prev_sample_halo(im[..., -1:], prev_im, ts)
            audio = _fm_disc_raw(re, im, prev_r, prev_i, fm_.fs)
            audio = audio * jnp.float32(1.0 / fm_.deviation_hz)
            if fm_._pole is not None:
                a = jnp.float32(fm_._pole)
                audio, filt = _affine_timesharded(
                    jnp.broadcast_to(a, audio.shape),
                    (1.0 - a) * audio, filt, fm_.block, ts)
            return audio, new_r, new_i, filt

        self._jitted = jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(P("channel", "time"), P("channel", "time"),
                      P("channel", None), P("channel", None),
                      P("channel")),
            out_specs=(P("channel", "time"), P("channel", None),
                       P("channel", None), P("channel")),
            check_vma=False,
        ))

    def process(self, re, im, state: DemodState):
        self._check(re, state)
        re, im = self._place(re, im)
        audio, pr, pi, filt = self._jitted(
            re, im, state.prev_re, state.prev_im, state.filt)
        return audio, DemodState(pr, pi, filt, state.offset + re.shape[-1])


class ShardedAMDemodulator(_ShardedDemodBase):
    """``AMDemodulator`` over the mesh: envelope is elementwise; the DC
    blocker's x[n-1] rides the one-sample halo."""

    def __init__(self, am: AMDemodulator, mesh: jax.sharding.Mesh):
        super().__init__(am, mesh)
        am_ = am
        ts = mesh.shape["time"]

        def body(re, im, prev_re, prev_im, filt):
            prev_r, new_r = _prev_sample_halo(re[..., -1:], prev_re, ts)
            prev_i, new_i = _prev_sample_halo(im[..., -1:], prev_im, ts)
            env = jnp.sqrt(re * re + im * im)
            prev_env = jnp.sqrt(prev_r * prev_r + prev_i * prev_i)
            env1 = jnp.concatenate([prev_env, env[..., :-1]], axis=-1)
            audio, filt = _affine_timesharded(
                jnp.broadcast_to(jnp.float32(am_.dc_pole), env.shape),
                env - env1, filt, am_.block, ts)
            return audio, new_r, new_i, filt

        self._jitted = jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(P("channel", "time"), P("channel", "time"),
                      P("channel", None), P("channel", None),
                      P("channel")),
            out_specs=(P("channel", "time"), P("channel", None),
                       P("channel", None), P("channel")),
            check_vma=False,
        ))

    def process(self, re, im, state: DemodState):
        self._check(re, state)
        re, im = self._place(re, im)
        audio, pr, pi, filt = self._jitted(
            re, im, state.prev_re, state.prev_im, state.filt)
        return audio, DemodState(pr, pi, filt, state.offset + re.shape[-1])


class ShardedSSBDemodulator(_ShardedDemodBase):
    """``SSBDemodulator`` over the mesh: the BFO NCO derives each
    shard's phases from the absolute sample index (wrapping uint32 —
    exact), so the mix is shard-invariant by construction."""

    def __init__(self, ssb: SSBDemodulator, mesh: jax.sharding.Mesh):
        super().__init__(ssb, mesh)
        ts = mesh.shape["time"]

        def body(re, im, prev_re, prev_im, phase0, word):
            t = re.shape[-1]
            idx = jax.lax.axis_index("time")
            local0 = phase0 + idx.astype(jnp.uint32) * (jnp.uint32(t) * word)
            c, s = _nco_cos_sin(local0, word, t)
            audio = re * c + im * s
            _, new_r = _prev_sample_halo(re[..., -1:], prev_re, ts)
            _, new_i = _prev_sample_halo(im[..., -1:], prev_im, ts)
            return audio, new_r, new_i

        self._jitted = jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(P("channel", "time"), P("channel", "time"),
                      P("channel", None), P("channel", None), P(), P()),
            out_specs=(P("channel", "time"), P("channel", None),
                       P("channel", None)),
            check_vma=False,
        ))

    def process(self, re, im, state: DemodState):
        self._check(re, state)
        re, im = self._place(re, im)
        word = self.inner._word
        phase0 = jnp.uint32((state.offset * word) % (1 << 32))
        audio, pr, pi = self._jitted(
            re, im, state.prev_re, state.prev_im, phase0, jnp.uint32(word))
        return audio, DemodState(
            pr, pi, state.filt, state.offset + re.shape[-1])


class ShardedAGC(_ShardedDemodBase):
    """``AGC`` over the mesh: the time-varying affine gain loop through
    the time-sharded solver; g_prev needs the previous sample's gain,
    which IS the block-input slice shifted by one — recovered from the
    inclusive solve exactly as the single-device path does."""

    def __init__(self, agc: AGC, mesh: jax.sharding.Mesh):
        super().__init__(agc, mesh)
        agc_ = agc
        ts = mesh.shape["time"]

        def _g_prev(g, g0):
            # g_prev[n] = g[n-1]; the first sample of each shard needs the
            # left neighbour's last inclusive gain (shard 0: the carried g0).
            if ts == 1:
                return jnp.concatenate([g0[..., None], g[..., :-1]], axis=-1)
            left = jax.lax.ppermute(
                g[..., -1:], "time", [(i, i + 1) for i in range(ts - 1)])
            first = jnp.where(
                jax.lax.axis_index("time") == 0, g0[..., None], left)
            return jnp.concatenate([first, g[..., :-1]], axis=-1)

        def body_real(x, g0):
            mag = jnp.abs(x)
            g, g_final = _agc_solve(
                mag, g0, agc_.mu, agc_.ref, agc_.block,
                affine=_affine_timesharded, time_shards=ts)
            return _g_prev(g, g0) * x, g_final

        def body_planes(re, im, g0):
            mag = jnp.sqrt(re * re + im * im)
            g, g_final = _agc_solve(
                mag, g0, agc_.mu, agc_.ref, agc_.block,
                affine=_affine_timesharded, time_shards=ts)
            g_prev = _g_prev(g, g0)
            return g_prev * re, g_prev * im, g_final

        self._jitted = jax.jit(jax.shard_map(
            body_real, mesh=mesh,
            in_specs=(P("channel", "time"), P("channel")),
            out_specs=(P("channel", "time"), P("channel")),
            check_vma=False,
        ))
        self._jitted_planes = jax.jit(jax.shard_map(
            body_planes, mesh=mesh,
            in_specs=(P("channel", "time"), P("channel", "time"),
                      P("channel")),
            out_specs=(P("channel", "time"), P("channel", "time"),
                       P("channel")),
            check_vma=False,
        ))

    def process_real(self, x, state: AGCState):
        self._check(x, state)
        (x,) = self._place(x)
        y, g_final = self._jitted(x, state.gain)
        return y, AGCState(g_final, state.offset + x.shape[-1])

    def process(self, re, im, state: AGCState):
        self._check(re, state)
        re, im = self._place(re, im)
        yre, yim, g_final = self._jitted_planes(re, im, state.gain)
        return yre, yim, AGCState(g_final, state.offset + re.shape[-1])

class ShardedSquelch(_ShardedDemodBase):
    """``Squelch`` over the mesh: per-block power moments gathered once
    (2 floats per 128 samples), the EMA chain replayed replicated —
    gates bitwise == single device."""

    def __init__(self, sq: Squelch, mesh: jax.sharding.Mesh):
        super().__init__(sq, mesh)
        sq_ = sq
        ts = mesh.shape["time"]

        def body(re, im, p0):
            lead = re.shape[:-1]
            L = sq_.block
            G = re.shape[-1] // L
            rb = re.reshape(*lead, G, L)
            ib = im.reshape(*lead, G, L)
            pw = jnp.sum(rb * rb + ib * ib, axis=-1) * jnp.float32(1.0 / L)
            b = jnp.float32(1.0 - sq_.leak) * pw
            if ts > 1:
                b_all = jnp.moveaxis(jax.lax.all_gather(b, "time"), 0, -2)
                b_all = b_all.reshape(*lead, -1)
            else:
                b_all = b
            a_all = jnp.full(b_all.shape, jnp.float32(sq_.leak))
            p_final, p_prev_all = _chain_blocks(a_all, b_all, p0, len(lead))
            if ts > 1:
                idx = jax.lax.axis_index("time")
                p_prev = jax.lax.dynamic_slice_in_dim(
                    p_prev_all, idx * G, G, axis=-1)
            else:
                p_prev = p_prev_all
            gate = (p_prev > jnp.float32(sq_.threshold)).astype(jnp.float32)
            return jnp.repeat(gate, L, axis=-1), p_final

        self._jitted = jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(P("channel", "time"), P("channel", "time"),
                      P("channel")),
            out_specs=(P("channel", "time"), P("channel")),
            check_vma=False,
        ))

    def gates(self, re, im, state: SquelchState):
        self._check(re, state)
        re, im = self._place(re, im)
        gate, p_final = self._jitted(re, im, state.power)
        return gate, SquelchState(p_final, state.offset + re.shape[-1])
