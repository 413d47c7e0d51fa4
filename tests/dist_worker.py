"""Worker for tests/test_distributed.py + scripts/dist_scaling.py.

Executes the actual multi-process path (BASELINE config 5 / SURVEY §2.8,
the analog of the reference's Ethernet backend
``phy_rmii_if.vhd:185-444``): ``shard.distributed.initialize`` brings up
jax.distributed against a localhost coordinator, ``pod_mesh`` builds the
hosts-outermost (channel, time) mesh over N processes x K virtual CPU
devices, and ``ShardedSpectrumPipeline`` steps run with REAL
cross-process collectives (gloo).

Modes (argv: pid port nprocs mode data_or_json):
  verify  one step; each process checks its addressable output shards
          bitwise against the single-device reference the parent computed
          (data_or_json = path to the parent's .npz), prints WORKER_OK.
  bench   fixed per-DEVICE work (weak scaling over the chatty time axis):
          slope-timed chained steps with carried state; process 0 prints
          one BENCH_JSON line (data_or_json = json of knobs).

Run only via the parent (env: JAX_PLATFORMS=cpu,
XLA_FLAGS=--xla_force_host_platform_device_count=K, PYTHONPATH=repo).
"""

import json
import sys
import time

import numpy as np


def _setup(pid: int, port: str, nprocs: int):
    import jax

    from tpu_sdr.shard import distributed

    if nprocs > 1:
        started = distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=nprocs,
            process_id=pid,
        )
        assert started, "initialize() must report it brought up jax.distributed"
        assert jax.process_count() == nprocs, jax.process_count()
    mesh = distributed.pod_mesh()  # hosts-outermost: (channel=nprocs, time=.)
    return jax, mesh


def run_verify(pid: int, port: str, nprocs: int, data_path: str) -> int:
    jax, mesh = _setup(pid, port, nprocs)
    from tpu_sdr.core.config import FilterMode, PipelineConfig
    from tpu_sdr.shard.pipeline import ShardedSpectrumPipeline

    ref = np.load(data_path)
    channels = int(ref["x"].shape[0])
    assert dict(mesh.shape)["channel"] == max(nprocs, 1), dict(mesh.shape)
    cfg = PipelineConfig(channels=channels)
    pipe = ShardedSpectrumPipeline(cfg, mesh)
    out, st = pipe.process(ref["x"], pipe.initial_state(), FilterMode.FIXED)

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


def _patch_no_exchange():
    """Measurement-only (scripts/dist_scaling.py exchange A/B): replace
    ``jax.lax.all_gather`` with a shape-identical LOCAL tile, so a program
    traced under the patch does the same per-device compute on the same
    shapes but never exchanges the summaries — mathematically inert (wrong
    results by design), used solely to difference out the measured
    exchange cost per step (VERDICT r4 item 3). Returns the real
    all_gather for restoration; the patch only matters at trace time."""
    import jax
    import jax.numpy as jnp

    real = jax.lax.all_gather

    def fake_all_gather(x, axis_name, *, axis=0, tiled=False, **kw):
        d = jax.lax.psum(1, axis_name)  # static axis size
        if not tiled:
            return jnp.broadcast_to(
                jnp.expand_dims(x, axis),
                x.shape[:axis] + (d,) + x.shape[axis:],
            )
        reps = [1] * x.ndim
        reps[axis] = d
        return jnp.tile(x, reps)

    jax.lax.all_gather = fake_all_gather
    return real


def run_bench(pid: int, port: str, nprocs: int, knobs_json: str) -> int:
    """Weak scaling: frames per TIME SHARD fixed, time axis grows with the
    device count, so per-device compute is constant and any step-time growth
    is collective/runtime overhead. Carried state threads through every
    step (the chain-validity discipline of bench.py, applied here too)."""
    knobs = json.loads(knobs_json)
    jax, mesh = _setup(pid, port, nprocs)
    import scipy.signal as sps

    from tpu_sdr.core.config import FilterMode, PipelineConfig
    from tpu_sdr.shard import distributed
    from tpu_sdr.shard.pipeline import ShardedSpectrumPipeline

    if "mesh_channel" in knobs or "mesh_time" in knobs:
        # Explicit axis split (the scaling harness measures BOTH layouts:
        # channel-across-processes — the production one — and
        # time-across-processes, the one that puts the summary exchange on
        # the cross-process boundary).
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            mesh = distributed.pod_mesh(
                channel=knobs.get("mesh_channel"),
                time=knobs.get("mesh_time"),
            )
    channels = int(knobs.get("channels", 2))
    f_loc = int(knobs.get("frames_per_shard", 8))
    t_shards = dict(mesh.shape)["time"]
    cfg = PipelineConfig(channels=channels)
    pipe = ShardedSpectrumPipeline(cfg, mesh)
    pipe.upload_sos(sps.butter(12, 0.25, output="sos"))
    T = f_loc * t_shards * cfg.fft_size
    x = np.random.default_rng(0).standard_normal((channels, T)).astype(
        np.float32
    )
    st = pipe.initial_state()
    out, st = pipe.process(x, st, FilterMode.CUSTOM)  # compile
    float(np.asarray(out["magnitude"].addressable_shards[0].data).ravel()[0])

    def make_runner(p):
        box = {"st": p.initial_state()}

        def run_k(k):
            z = box["st"]
            t0 = time.perf_counter()
            for _ in range(k):
                out, z = p.process(x, z, FilterMode.CUSTOM)
            float(
                np.asarray(
                    out["magnitude"].addressable_shards[0].data
                ).ravel()[0]
            )
            box["st"] = z
            return time.perf_counter() - t0

        return run_k

    def slope_of(run_k):
        ts = min(run_k(1) for _ in range(2))
        tl = min(run_k(7) for _ in range(2))
        return (tl - ts) / 6

    run_a = make_runner(pipe)
    run_a(2)  # warm

    ab = None
    if knobs.get("exchange_ab"):
        # Paired exchange-cost measurement: a second pipeline traced with
        # all_gather replaced by an inert local tile (same local compute,
        # summaries not exchanged), slope-timed INTERLEAVED with the real
        # one in the same process (CLAUDE.md pairing discipline).
        real_ag = _patch_no_exchange()
        try:
            pipe_b = ShardedSpectrumPipeline(cfg, mesh)
            pipe_b.upload_sos(sps.butter(12, 0.25, output="sos"))
            st_b = pipe_b.initial_state()
            out_b, st_b = pipe_b.process(x, st_b, FilterMode.CUSTOM)  # trace
            mag_b = np.concatenate([
                np.asarray(s.data).ravel()
                for s in out_b["magnitude"].addressable_shards
            ])
        finally:
            jax.lax.all_gather = real_ag
        if dict(mesh.shape)["time"] > 1:
            # the patch must actually have removed the exchange: the inert
            # variant's magnitudes must DIFFER from the real ones on SOME
            # addressable shard (time shard 0's entry state is the global
            # head either way, so shard 0 alone is identical by design)
            out_a1, _ = pipe.process(x, pipe.initial_state(), FilterMode.CUSTOM)
            mag_a1 = np.concatenate([
                np.asarray(s.data).ravel()
                for s in out_a1["magnitude"].addressable_shards
            ])
            assert not np.array_equal(mag_a1, mag_b), (
                "no-exchange variant produced identical output — the "
                "all_gather patch did not take; the A/B would measure zero"
            )
        run_b = make_runner(pipe_b)
        run_b(2)  # warm
        s_a, s_b = [], []
        for _ in range(int(knobs.get("reps", 5))):
            s_a.append(slope_of(run_a))  # interleaved A,B per round
            s_b.append(slope_of(run_b))
        deltas = sorted(a - b for a, b in zip(s_a, s_b))
        ab = {
            "slopes_ms_exchange": [round(s * 1e3, 3) for s in s_a],
            "slopes_ms_no_exchange": [round(s * 1e3, 3) for s in s_b],
            "paired_delta_ms": [round(d * 1e3, 3) for d in deltas],
            "exchange_cost_ms_median": round(
                deltas[len(deltas) // 2] * 1e3, 3
            ),
        }
        slopes = s_a
    else:
        slopes = [slope_of(run_a) for _ in range(int(knobs.get("reps", 5)))]
    med = sorted(slopes)[len(slopes) // 2]
    if pid == 0:
        rec = {
            "nprocs": nprocs,
            "devices": len(jax.devices()),
            "mesh": dict(mesh.shape),
            "channels": channels,
            "frames_per_shard": f_loc,
            "samples_per_step": channels * T,
            "step_ms_median": med * 1e3,
            "step_ms_slopes": [round(s * 1e3, 3) for s in slopes],
        }
        if ab is not None:
            rec["exchange_ab"] = ab
        print("BENCH_JSON " + json.dumps(rec), flush=True)
    return 0


def main() -> int:
    pid, port, nprocs, mode, payload = (
        int(sys.argv[1]),
        sys.argv[2],
        int(sys.argv[3]),
        sys.argv[4],
        sys.argv[5],
    )
    if mode == "bench":
        return run_bench(pid, port, nprocs, payload)
    return run_verify(pid, port, nprocs, payload)


if __name__ == "__main__":
    sys.exit(main())
