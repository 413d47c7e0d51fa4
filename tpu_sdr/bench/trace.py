"""Device-trace capture + op-level attribution (SURVEY §5.1 tracing).

Round-4 discovery: ``jax.profiler`` captures REAL TPU xplanes even
through the axon relay tunnel (``/device:TPU:0`` with per-op XLA
events), so the framework can attribute a production dispatch on actual
hardware — the observability the reference lacks entirely (15 debug
LEDs, ``imp/phy_rmii_if.vhd:461-537``). The tensorboard-plugin
converter's native wrapper doesn't match the installed TF, so the
xplane proto is parsed directly (``tensorflow.tsl...xplane_pb2``).

``capture_op_table(step)`` runs a warmed callable a few times under the
profiler and returns, for one steady-state dispatch: wall time, device
idle time (gaps between op events — ~0 on a healthy program), and the
op table ranked by total self time. Ground-truth round-4 result for the
spectrum pipeline: f32 dispatch 0.507 ms with 0.001 ms idle — every
major op at its own MXU/HBM floor (docs/measurements/trace_f32_r4.json).
"""

from __future__ import annotations

import collections
import glob
import os
import shutil
import tempfile


def parse_xplane(logdir: str) -> dict:
    """Parse a jax.profiler trace dir -> op-level attribution dict.

    Returns {"device_trace": False, ...} when no TPU plane exists (CPU
    backends produce host-only traces).
    """
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except Exception as e:  # pragma: no cover - env without TF
        return {"device_trace": False, "reason": f"no xplane proto: {e}"}
    planes = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))
    if not planes:
        return {"device_trace": False, "reason": "no xplane files"}
    xs = xplane_pb2.XSpace()
    with open(planes[-1], "rb") as f:
        xs.ParseFromString(f.read())
    tpu = [p for p in xs.planes if p.name.startswith("/device:TPU")]
    if not tpu:
        return {
            "device_trace": False,
            "planes": [p.name for p in xs.planes],
        }
    tpu = tpu[0]
    md = {k: v.name for k, v in tpu.event_metadata.items()}
    lines = {ln.name: ln for ln in tpu.lines}
    if "XLA Modules" not in lines or "XLA Ops" not in lines:
        return {"device_trace": False, "reason": "no XLA lines"}
    mods = sorted(
        (e.offset_ps, e.duration_ps, md[e.metadata_id])
        for e in lines["XLA Modules"].events
    )
    if not mods:
        return {"device_trace": False, "reason": "no module events"}
    # the dispatch under study = the most-repeated module (the hot step);
    # take its LAST execution (steady state)
    counts = collections.Counter(n for _, _, n in mods)
    hot = max(counts, key=lambda n: counts[n])
    o0, d0, _ = [m for m in mods if m[2] == hot][-1]
    ops = sorted(
        (e.offset_ps, e.duration_ps, md[e.metadata_id])
        for e in lines["XLA Ops"].events
    )
    inside = [(o, d, n) for o, d, n in ops if o0 <= o < o0 + d0]
    tot: collections.Counter = collections.Counter()
    for _, d, n in inside:
        tot[n] += d
    gap = 0
    prev_end = o0
    for o, d, _ in inside:
        if o > prev_end:
            gap += o - prev_end
        prev_end = max(prev_end, o + d)
    return {
        "device_trace": True,
        "module": hot,
        "executions": counts[hot],
        "dispatch_ms": d0 / 1e9,
        "n_ops": len(inside),
        "op_sum_ms": sum(d for _, d, _ in inside) / 1e9,
        "device_idle_ms": gap / 1e9,
        "top_ops_ms": [
            [n[:110], round(d / 1e9, 4)] for n, d in tot.most_common(30)
        ],
    }


def capture_op_table(step, reps: int = 10, logdir: str | None = None) -> dict:
    """Profile ``step()`` (already warmed/compiled; each call should
    dispatch the program under study) and return the op attribution of
    one steady-state dispatch. The caller is responsible for the
    chain-validity discipline (CLAUDE.md): ``step`` must evolve real
    state so the relay cannot replay a memoized dispatch.

    ``logdir``: optional directory to KEEP the raw trace in — the capture
    lands in a fresh unique subdirectory (pre-existing contents are never
    touched). Default: a temp dir, removed after parsing.
    """
    import jax

    if logdir:
        # never delete caller-owned contents: trace into a fresh unique
        # subdirectory of the requested dir (parse_xplane below reads THIS
        # capture, not older ones that may live alongside)
        os.makedirs(logdir, exist_ok=True)
        tmp = tempfile.mkdtemp(prefix="capture_", dir=logdir)
    else:
        tmp = tempfile.mkdtemp(prefix="tpu_sdr_trace_")
    jax.profiler.start_trace(tmp)
    try:
        out = None
        for _ in range(reps):
            out = step()
        jax.block_until_ready(out)
    finally:
        jax.profiler.stop_trace()
    try:
        return parse_xplane(tmp)
    finally:
        if logdir is None:
            shutil.rmtree(tmp, ignore_errors=True)
