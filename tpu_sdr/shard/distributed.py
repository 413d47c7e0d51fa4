"""Multi-host (pod-slice) initialization and scaling helpers.

BASELINE config 5: channels x time-blocks sharded over N >= 2 hosts with
collective boundary-state exchange. On a real pod slice:

    import tpu_sdr.shard.distributed as dist
    dist.initialize()                       # jax.distributed under the hood
    mesh = dist.pod_mesh(channel=...)       # DCN-aware axis layout
    pipe = ShardedSpectrumPipeline(cfg, mesh)

Axis placement: the ``channel`` axis never communicates, so it maps to the
outer (DCN, cross-host) mesh dimension; the ``time`` axis exchanges only
per-frame 12-float summaries, riding ICI within each host. This is the
idiomatic inversion of the reference's transport hierarchy (SURVEY.md §2.8):
chip-to-chip state exchange replaces the FPGA's UART/Ethernet wire, while
UDP survives only at the host edge for the GUI.

This container has a single chip, so multi-host paths are validated by the
driver's virtual-device dryrun; the code paths here are the real ones.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    auto: bool = False,
):
    """Bring up jax.distributed (no-op when single-process).

    Three ways in (review finding: the previous defaults implemented
    none of its documented ones correctly):

    - explicit arguments (what ``tests/dist_worker.py`` uses);
    - the ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
      ``JAX_PROCESS_ID`` env triple — read HERE and forwarded, because
      jax's own initialize() does not read ``JAX_PROCESS_ID`` (verified
      against jax 0.9.0's ``jax._src.distributed``: only cluster
      auto-detect or explicit args supply the process id);
    - ``auto=True`` on a real TPU pod slice: defer entirely to
      ``jax.distributed.initialize()``'s cluster auto-detection (TPU
      metadata service), which needs NO env and discovers
      coordinator/process-count/process-id itself.
    """
    if auto:
        jax.distributed.initialize()
        return True
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if num_processes <= 1 and coordinator_address is None:
        return False  # single process: nothing to do
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        # CPU multi-process collectives need an explicit backend; gloo is
        # the in-tree one (verified working 2-process on this JAX — see
        # tests/test_distributed.py). Must be set before initialize().
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:  # pragma: no cover - older/newer config surface
            pass
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def pod_mesh(
    channel: int | None = None,
    time: int | None = None,
) -> jax.sharding.Mesh:
    """Build the (channel, time) mesh over all devices, hosts-outermost.

    Devices are ordered host-major (jax.devices() groups by process), so
    reshaping (channel, time) with channel >= n_hosts puts the
    communication-free channel axis across DCN and the chatty time axis on
    ICI — the layout the scaling-efficiency target assumes.
    """
    devices = np.asarray(jax.devices())
    n = devices.size
    n_hosts = max(jax.process_count(), 1)
    if channel is None and time is None:
        channel, time = n_hosts, n // n_hosts
    elif channel is None:
        channel = n // time
    elif time is None:
        time = n // channel
    if channel * time != n:
        raise ValueError(f"channel*time = {channel}*{time} != {n} devices")
    if n_hosts > 1 and channel % n_hosts:
        # With host-major device order, channel % hosts != 0 makes channel
        # rows span hosts, putting the chatty time axis on DCN.
        import warnings

        warnings.warn(
            f"channel axis ({channel}) is not a multiple of hosts "
            f"({n_hosts}); the time axis will cross DCN, hurting the "
            "state-exchange latency",
            stacklevel=2,
        )
    return jax.sharding.Mesh(
        devices.reshape(channel, time), axis_names=("channel", "time")
    )


def scaling_efficiency(rates_per_n: dict[int, float]) -> dict[int, float]:
    """samples/s at n devices -> efficiency vs linear scaling from n=1."""
    if 1 not in rates_per_n:
        raise ValueError("need the n=1 baseline rate")
    base = rates_per_n[1]
    return {n: rates_per_n[n] / (base * n) for n in sorted(rates_per_n)}
