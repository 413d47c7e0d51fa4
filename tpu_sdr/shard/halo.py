"""The one left-neighbour halo exchange every streaming op shares.

Every time-sharded streaming kernel in this framework (channelizer,
DDC, DDC bank, resampler, demodulators) carries the same state shape: a
fixed-length tail of recent samples. Sharding the time axis then always
means: shard i consumes shard i-1's tail (one ``ppermute``), shard 0
consumes the carried stream history, and the new carried state is the
LAST shard's tail (replicated back via ``all_gather``). This module is
that pattern, once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def left_halo(my_tail, carried, time_shards: int, axis_name: str = "time"):
    """Inside shard_map: exchange each shard's tail rightward.

    my_tail: this shard's trailing samples (..., H); carried: the stream
    history (..., H), replicated. Returns (halo, new_carried): the
    samples to prepend to this shard's slice, and the global stream tail
    (replicated) to carry into the next chunk. Pure data movement — no
    arithmetic, so sharded == single-device stays bitwise."""
    if time_shards == 1:
        return carried, my_tail
    left = jax.lax.ppermute(
        my_tail, axis_name, [(i, i + 1) for i in range(time_shards - 1)])
    idx = jax.lax.axis_index(axis_name)
    halo = jnp.where(idx == 0, carried, left)
    new_carried = jax.lax.all_gather(my_tail, axis_name)[-1]
    return halo, new_carried
