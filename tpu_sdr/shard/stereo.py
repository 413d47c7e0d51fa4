"""Time/channel-sharded FM stereo (MPX) decoder.

``kernels/stereo.py``'s decoder is built from exactly the pieces the
sharding story (SURVEY.md §5.7) already covers:

1. the 19/38 kHz NCOs derive each shard's phases from the absolute sample
   index (wrapping uint32 — exact), like the sharded SSB BFO;
2. the per-block pilot correlator is local to each shard;
3. the rotation products B_g = A_g * conj(A_{g-1}) need each shard's
   FIRST block to see the left neighbour's LAST raw block phasor — the
   re/im pair stacked into ONE 2-float ``ppermute`` halo (shard 0
   splices the carried phasor);
4. the four pilot EMAs are constant-coefficient ``_chain_blocks``
   chains: their per-block forcings stack into ONE ``all_gather``
   (8 floats per 128 samples), then every device replays the identical
   replicated chains — the ShardedSquelch pattern. The de-lag/gate/doubling math
   then runs on the FULL replicated chain (a few flops per block) so
   the global last block's |pilot|^2 falls out without an extra
   collective; each shard slices its own blocks for the carrier mix;
5. per-channel de-emphasis is the time-sharded affine solver.

Sharded == single-device BITWISE for every mesh shape (tested in
tests/test_shard_receiver.py); the elementwise tracking math is shared
verbatim via ``kernels.stereo._track_pilot``.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tpu_sdr.kernels.ddc import _nco_cos_sin
from tpu_sdr.kernels.demod import _chain_blocks
from tpu_sdr.kernels.stereo import (
    StereoDecoder,
    StereoDecoderState,
    _block_phasor,
    _hann_corr_win,
    _track_pilot,
)
from tpu_sdr.shard.demod import _affine_timesharded
from tpu_sdr.shard.halo import left_halo


def _ema_full_chains(bvals, y0s, lam: float, lead_ndim: int,
                     time_shards: int):
    """Constant-``lam`` EMAs over blocks, time-sharded: the four pilot
    chains' per-block forcings ride ONE ``all_gather`` (stacked on a new
    axis — pure data movement, so the replayed chains stay bitwise equal
    to four separate gathers), then each replicated global chain replays.
    ``bvals``: list of (..., G_loc); ``y0s``: list of (...,). Returns a
    list of (final (replicated), prev_all (..., G_total))."""
    lead = bvals[0].shape[:-1]
    stacked = jnp.stack(bvals, axis=lead_ndim)  # (..., K, G_loc)
    if time_shards > 1:
        b_all = jnp.moveaxis(jax.lax.all_gather(stacked, "time"), 0, -2)
        b_all = b_all.reshape(*lead, len(bvals), -1)  # (..., K, ts*G_loc)
    else:
        b_all = stacked
    a_all = jnp.full(b_all.shape[:-2] + b_all.shape[-1:], jnp.float32(lam))
    return [
        _chain_blocks(a_all, b_all[..., k, :], y0, lead_ndim)
        for k, y0 in enumerate(y0s)
    ]


class ShardedStereoDecoder:
    """``StereoDecoder`` over a (channel, time) mesh: MPX (C, T) ->
    stacked L/R planes (C, 2, T), C over ``channel``, T over ``time``;
    per-shard slices must be multiples of the decoder block."""

    def __init__(self, dec: StereoDecoder, mesh: jax.sharding.Mesh):
        self.dec = dec
        self.mesh = mesh
        ts = mesh.shape["time"]
        blk = dec.block
        lam, thresh = dec.leak, dec.pilot_threshold
        sub_gain, pole, w_max = dec.subcarrier_gain, dec._pole, dec._w_max

        def body(m, a_re0, a_im0, b_re0, b_im0, last_re0, last_im0,
                 filt0, phase0, word):
            lead = m.shape[:-1]
            t = m.shape[-1]
            g = t // blk
            idx = jax.lax.axis_index("time")
            local0 = phase0 + idx.astype(jnp.uint32) * (jnp.uint32(t) * word)
            c19, s19 = _nco_cos_sin(local0, word, t)
            c38, s38 = _nco_cos_sin(
                local0 * jnp.uint32(2), word * jnp.uint32(2), t)

            win = _hann_corr_win(blk)
            ar, ai = _block_phasor(m, c19, s19, win, blk)  # (..., G_loc)

            # previous-block phasor: re/im stacked into ONE 2-float halo
            # exchange (step 3 above; stacking is pure data movement)
            nd = len(lead)
            tail = jnp.stack([ar[..., -1:], ai[..., -1:]], axis=nd)
            carried = jnp.stack(
                [last_re0[..., None], last_im0[..., None]], axis=nd)
            halo, new_last = left_halo(tail, carried, ts)
            halo_r = jnp.take(halo, 0, axis=nd)
            halo_i = jnp.take(halo, 1, axis=nd)
            new_last_r = jnp.take(new_last, 0, axis=nd)
            new_last_i = jnp.take(new_last, 1, axis=nd)
            pr = jnp.concatenate([halo_r, ar[..., :-1]], axis=-1)
            pi = jnp.concatenate([halo_i, ai[..., :-1]], axis=-1)
            br = ar * pr + ai * pi
            bi = ai * pr - ar * pi

            one_m = jnp.float32(1.0 - lam)
            (
                (fin_ar, prev_ar),
                (fin_ai, prev_ai),
                (fin_br, prev_br),
                (fin_bi, prev_bi),
            ) = _ema_full_chains(
                [one_m * ar, one_m * ai, one_m * br, one_m * bi],
                [a_re0, a_im0, b_re0, b_im0], lam, nd, ts)

            # tracking math on the FULL replicated chain (identical ops
            # to single-device => bitwise), then slice this shard's blocks
            d2r, d2i, gate, p2 = _track_pilot(
                prev_ar, prev_ai, prev_br, prev_bi,
                lam=lam, thresh=thresh, w_max=w_max)
            if ts > 1:
                sl = lambda v: jax.lax.dynamic_slice_in_dim(
                    v, idx * g, g, axis=-1)
                d2r_l, d2i_l, gate_l = sl(d2r), sl(d2i), sl(gate)
            else:
                d2r_l, d2i_l, gate_l = d2r, d2i, gate

            c38b = c38.reshape(*([1] * nd), g, blk)
            s38b = s38.reshape(*([1] * nd), g, blk)
            carrier = c38b * d2r_l[..., None] - s38b * d2i_l[..., None]
            mb = m.reshape(*lead, g, blk)
            diff = (2.0 * jnp.float32(sub_gain)) * mb * carrier * gate_l[..., None]
            left = (mb + diff).reshape(*lead, t)
            right = (mb - diff).reshape(*lead, t)
            lr = jnp.stack([left, right], axis=nd)  # (..., 2, T_loc)

            if pole is not None:
                a_de = jnp.broadcast_to(jnp.float32(pole), lr.shape)
                lr, filt = _affine_timesharded(
                    a_de, (1.0 - jnp.float32(pole)) * lr, filt0, blk, ts)
            else:
                filt = filt0
            return (lr, fin_ar, fin_ai, fin_br, fin_bi,
                    new_last_r[..., 0], new_last_i[..., 0], filt, p2[..., -1])

        self._jitted = jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(P("channel", "time"),) + (P("channel"),) * 6
            + (P("channel", None), P(), P()),
            out_specs=(P("channel", None, "time"),) + (P("channel"),) * 6
            + (P("channel", None), P("channel")),
            check_vma=False,
        ))

    def initial_state(self, batch_shape: tuple = ()) -> StereoDecoderState:
        return self.dec.initial_state(batch_shape)

    def process(self, m, state: StereoDecoderState):
        """MPX (C, T) -> ((C, 2, T) L/R planes, new state)."""
        ts = self.mesh.shape["time"]
        t = m.shape[-1]
        if t % ts:
            raise ValueError(f"T={t} must divide over {ts} time shards")
        if (t // ts) % self.dec.block:
            raise ValueError(
                f"per-shard slice {t // ts} not a multiple of "
                f"block={self.dec.block}")
        if tuple(state.a_re.shape) != tuple(m.shape[:-1]):
            raise ValueError(
                f"state shape {tuple(state.a_re.shape)} != "
                f"{tuple(m.shape[:-1])}")
        m = jax.device_put(
            jnp.asarray(m, jnp.float32),
            NamedSharding(self.mesh, P("channel", "time")))
        word = self.dec._word
        phase0 = jnp.uint32((state.offset * word) % (1 << 32))
        (lr, far, fai, fbr, fbi, lre, lim, filt, p2) = self._jitted(
            m, state.a_re, state.a_im, state.b_re, state.b_im,
            state.last_re, state.last_im, state.filt,
            phase0, jnp.uint32(word))
        new = StereoDecoderState(
            far, fai, fbr, fbi, lre, lim, filt, state.offset + t,
            p2)  # device-resident; see StereoDecoderState.pilot_pow
        return lr, new
