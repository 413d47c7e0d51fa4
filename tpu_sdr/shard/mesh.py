"""Device-mesh construction for the SDR pipeline.

Two mesh axes (SURVEY.md §2.7):

- ``channel``: data parallelism over independent receive channels (the
  filter-bank axis; BASELINE configs scale 64 -> 4096 channels). State is
  per-channel, so this axis needs no communication at all.
- ``time``: sequence parallelism over the stream's frame axis. Only the
  2-per-section biquad state summaries cross this axis (ICI), via
  ``all_gather`` in ``biquad.sosfilt_blocked_timesharded``.

On a multi-host pod slice, ``jax.distributed.initialize`` makes
``jax.devices()`` span hosts and the same mesh covers DCN; the channel axis
should map to the outer (DCN) dimension since it never communicates.
"""

from __future__ import annotations

import jax
import numpy as np


def make_sdr_mesh(
    channel: int | None = None,
    time: int | None = None,
    devices=None,
) -> jax.sharding.Mesh:
    """Build a (channel, time) mesh over the available devices.

    Defaults: all devices on the time axis (maximises single-stream
    throughput); pass ``channel`` to split. channel*time must equal the
    device count used.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if channel is None and time is None:
        channel, time = 1, n
    elif channel is None:
        channel = n // time
    elif time is None:
        time = n // channel
    if channel * time > n:
        raise ValueError(f"channel*time = {channel}*{time} > {n} devices")
    devices = devices[: channel * time]  # sub-meshes are fine
    return jax.sharding.Mesh(
        devices.reshape(channel, time), axis_names=("channel", "time")
    )
