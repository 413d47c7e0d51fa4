"""Time/channel-sharded Welch PSD (capability extension).

Same (channel, time) mesh as the spectrum pipeline and channelizer: the
channel axis is communication-free; the time axis splits the stream into
contiguous runs. Welch segments overlap by ``noverlap`` samples, so each
shard needs exactly that many samples from its right neighbour (segments
are assigned to the shard their START index falls in) — one ``ppermute``
of the neighbour's head, the sharded analog of the overlap in
``scipy.signal.welch``'s segmentation. Per-shard segment PSDs are
mask-summed (segments that would run past the global end are dropped,
exactly like the unsharded estimator) and combined with one ``psum``;
the result is replicated.

Median averaging needs a global order statistic and is not shardable
this way; ``ShardedWelchPSD`` supports ``average='mean'`` only.

Sharded == single-device within f32 reduction-order tolerance is tested
for every mesh shape (tests/test_psd.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tpu_sdr.runtime.psd import WelchPSD, _welch


class ShardedWelchPSD:
    """``WelchPSD`` under ``shard_map`` over a (channel, time) mesh.

    Input: real ``(C, T)`` or IQ planes ``(2, C, T)``; C must divide over
    the mesh's channel axis; each time shard's slice must be a multiple
    of the segment step and at least ``nperseg`` samples.
    """

    def __init__(self, est: WelchPSD, mesh: jax.sharding.Mesh):
        if est.average != "mean":
            raise ValueError(
                "sharded Welch supports average='mean' only (median needs "
                "a global order statistic)"
            )
        self.est = est
        self.mesh = mesh
        self._jitted = {}

    def _fn(self, iq: bool):
        if iq in self._jitted:
            return self._jitted[iq]
        est = self.est
        time_shards = self.mesh.shape["time"]
        halo = est.noverlap

        def body(x):
            t_loc = x.shape[-1]
            if time_shards > 1 and halo:
                head = x[..., :halo]
                # shift heads left: shard s receives shard s+1's head; the
                # last shard receives zeros (its tail segments are masked)
                right = jax.lax.ppermute(
                    head,
                    "time",
                    [(s + 1, s) for s in range(time_shards - 1)],
                )
                ext = jnp.concatenate([x, right], axis=-1)
            else:
                ext = (
                    jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, halo)])
                    if halo
                    else x
                )
            k = t_loc // est.step  # segments starting in this shard
            xr, xi = (ext[0], ext[1]) if iq else (ext, None)
            p2 = _welch(
                xr,
                xi,
                est._w,
                est._plan,
                jnp.float32(est._scale),
                nperseg=est.nperseg,
                step=est.step,
                nseg=k,
                detrend=est.detrend,
                onesided=not iq,
                average="none",
                precision=est._precision,
            )  # (..., k, nfreq), scale already applied (linear)
            t_global = t_loc * time_shards
            nseg_global = (t_global - est.noverlap) // est.step
            start = (
                jax.lax.axis_index("time") * k + jnp.arange(k)
            ) * est.step
            valid = (start + est.nperseg <= t_global).astype(p2.dtype)
            part = jnp.sum(p2 * valid[:, None], axis=-2)
            return jax.lax.psum(part, "time") / nseg_global

        lead = (None,) if iq else ()
        shmapped = jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=(P(*lead, "channel", "time"),),
            out_specs=P("channel", None),
            check_vma=False,
        )
        self._jitted[iq] = jax.jit(shmapped)
        return self._jitted[iq]

    def _check(self, xs):
        time_shards = self.mesh.shape["time"]
        if xs.shape[-1] % time_shards:
            raise ValueError(
                f"T={xs.shape[-1]} must divide over {time_shards} time shards"
            )
        t_loc = xs.shape[-1] // time_shards
        if t_loc % self.est.step:
            raise ValueError(
                f"per-shard slice {t_loc} not a multiple of the segment "
                f"step {self.est.step}"
            )
        if t_loc < self.est.nperseg:
            raise ValueError(
                f"per-shard slice {t_loc} shorter than nperseg="
                f"{self.est.nperseg}; use fewer time shards"
            )

    def compute(self, x) -> jnp.ndarray:
        """Real input (C, T) -> one-sided PSD (C, nperseg//2+1), replicated."""
        x = jnp.asarray(x, jnp.float32)
        self._check(x)  # friendly errors BEFORE the sharded put
        x = jax.device_put(x, NamedSharding(self.mesh, P("channel", "time")))
        return self._fn(False)(x)

    def compute_iq(self, xs) -> jnp.ndarray:
        """IQ planes (2, C, T) -> two-sided PSD (C, nperseg), unshifted."""
        xs = jnp.asarray(xs, jnp.float32)
        self._check(xs)
        xs = jax.device_put(
            xs, NamedSharding(self.mesh, P(None, "channel", "time"))
        )
        return self._fn(True)(xs)
