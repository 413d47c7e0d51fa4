"""Worker for tests/test_distributed.py: one of two REAL processes.

Executes the actual multi-process path (BASELINE config 5 / SURVEY §2.8,
the analog of the reference's Ethernet backend
``phy_rmii_if.vhd:185-444``): ``shard.distributed.initialize`` brings up
jax.distributed against a localhost coordinator, ``pod_mesh`` builds the
hosts-outermost (channel, time) mesh over 2 processes x 4 virtual CPU
devices, and one ``ShardedSpectrumPipeline`` step runs with REAL
cross-process collectives (gloo). Each process then checks its
addressable output shards bitwise against the single-device reference
the parent test computed, and prints WORKER_OK.

Run only via test_distributed.py (env: JAX_PLATFORMS=cpu,
XLA_FLAGS=--xla_force_host_platform_device_count=4).
"""

import sys

import numpy as np


def main() -> int:
    pid, port, data_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    import jax

    from tpu_sdr.shard import distributed

    started = distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=2,
        process_id=pid,
    )
    assert started, "initialize() must report it brought up jax.distributed"
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    mesh = distributed.pod_mesh()  # hosts-outermost: (channel=2, time=4)
    assert dict(mesh.shape) == {"channel": 2, "time": 4}, dict(mesh.shape)

    from tpu_sdr.core.config import FilterMode, PipelineConfig
    from tpu_sdr.shard.pipeline import ShardedSpectrumPipeline

    ref = np.load(data_path)
    cfg = PipelineConfig(channels=2)
    pipe = ShardedSpectrumPipeline(cfg, mesh)
    out, st = pipe.process(
        ref["x"], pipe.initial_state(), FilterMode.FIXED
    )

    # Each process verifies the shards it can address, bitwise.
    checked = 0
    for shard in out["magnitude"].addressable_shards:
        np.testing.assert_array_equal(
            np.asarray(shard.data), ref["mag"][shard.index]
        )
        checked += 1
    assert checked > 0, "process addressed no output shards"
    for shard in st.sos_state.addressable_shards:
        np.testing.assert_array_equal(
            np.asarray(shard.data), ref["sos_state"][shard.index]
        )
    assert int(np.asarray(st.frame_count.addressable_shards[0].data)) == int(
        ref["frame_count"]
    )
    print(f"WORKER_OK pid={pid} shards={checked}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
