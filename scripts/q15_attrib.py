"""Faithful-Q15 filtered-mode attribution + pipelining A/B (VERDICT r3 #4).

r3 measured the filtered split mode at 4.7 MSPS while its slowest single
component (the native C++ filter) runs 45 MSPS — ~90% of the wall time was
unattributed. This script measures, on the real chip, per 64-frame chunk
(1.05 Msamples, C=1):

  host_window_ms   vectorized NumPy RTL window
  filter_ms        native C++ saturating IIR (the sequential stage)
  upload_ms        jnp.asarray of the filtered int16 frames (2 MB)
  fft_take_ms      device integer-FFT dispatch slope, gather bit-reversal
  fft_transpose_ms same, transpose bit-reversal (bit-identical outputs)
  fetch_mag_ms     np.asarray of the f32 magnitudes (4 MB)
  fetch_wire_ms    np.asarray of the int16 re/im wire words (2x2 MB)
  e2e_seq_ms       today's sequential process() loop (the r3 number)
  e2e_pipe_ms      double-buffered: device stage of chunk k overlaps the
                   host window+filter of chunk k+1 (JAX async dispatch)

Every chained device measurement feeds the previous dispatch's output back
into the next input (relay memoization discipline).

Run (TPU, ONE process): timeout 590 python scripts/q15_attrib.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

F, N = 64, 16384
T0 = time.time()


def log(m):
    print(f"[{time.time() - T0:6.1f}s] {m}", file=sys.stderr, flush=True)


def med(v):
    s = sorted(v)
    return s[len(s) // 2]


def main():
    import scipy.signal as sps

    from tpu_sdr import PipelineConfig
    from tpu_sdr.core import qformat as qf
    from tpu_sdr.kernels import fft_q15 as fq
    from tpu_sdr.kernels import native_q15, window
    from tpu_sdr.runtime.q15 import Q15Pipeline

    log(f"devices: {jax.devices()}")
    pipe = Q15Pipeline(PipelineConfig(channels=1), device_fft=True)
    sos_q = qf.quantize_coeff_x64(sps.butter(4, 0.25, output="sos"))
    pipe.upload_sos_q(sos_q)
    rom = np.asarray(window.hann_q16_rom(N))
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((1, F * N)) * 8000).astype(np.int16)
    out = {}

    # --- host stages (pure CPU, no device) ---------------------------------
    frames = x.reshape(1, F, N)
    reps = []
    for _ in range(5):
        t0 = time.perf_counter()
        xw = qf.window_multiply_q15(frames, rom).reshape(1, -1)
        reps.append(time.perf_counter() - t0)
    out["host_window_ms"] = med(reps) * 1e3

    sos64 = np.asarray(pipe.sos_q, np.int64)
    zi = np.zeros((1, pipe.cfg.n_sections, 2), np.int64)
    reps = []
    for _ in range(5):
        t0 = time.perf_counter()
        ys, zf = native_q15.sosfilt_q15_rows(sos64, xw, zi.reshape(1, -1, 2))
        reps.append(time.perf_counter() - t0)
    out["filter_ms"] = med(reps) * 1e3
    out["filter_msps"] = F * N / med(reps) / 1e6

    # --- transfers ---------------------------------------------------------
    reps = []
    for i in range(5):
        arr = np.roll(ys, i + 1, axis=-1)  # unique per rep
        t0 = time.perf_counter()
        d = jnp.asarray(arr.reshape(F, N))
        jax.block_until_ready(d)
        reps.append(time.perf_counter() - t0)
    out["upload_ms"] = med(reps) * 1e3

    # --- device FFT dispatch slope (chained, output-fed) -------------------
    def make_fft(bitrev):
        @jax.jit
        def step(r):
            rr, ii = fq.fft_q15(r, bitrev=bitrev)
            # feed wire words back as next input (int16 -> int16, unique)
            return jnp.bitwise_xor(rr, ii)

        return step

    slopes = {}
    for bitrev in ("take", "transpose"):
        step = make_fft(bitrev)
        r = jnp.asarray(ys.reshape(F, N))
        t0 = time.time()
        r1 = step(r)
        jax.block_until_ready(r1)
        log(f"fft[{bitrev}]: compile+first {time.time() - t0:.1f}s")

        def run_k(r0, k):
            rr = r0
            t0 = time.perf_counter()
            for _ in range(k):
                rr = step(rr)
            jax.block_until_ready(rr)
            return time.perf_counter() - t0, rr

        _, r = run_k(r, 3)
        vals = []
        for _ in range(5):
            ts, r = run_k(r, 2)
            tl, r = run_k(r, 22)
            vals.append((tl - ts) / 20)
        slopes[bitrev] = med(vals) * 1e3
        log(f"fft[{bitrev}]: {slopes[bitrev]:.2f} ms/dispatch")
    out["fft_take_ms"] = slopes["take"]
    out["fft_transpose_ms"] = slopes["transpose"]

    # --- fetches -----------------------------------------------------------
    # Each rep fetches a FRESH process() output, completion-waited first,
    # so the timing is the device->host transfer alone. (The original form
    # re-fetched ONE materialized array — reps 2+ hit jax's host-side
    # value cache and reported ~free fetches; review finding. True costs
    # on this tunnel: ~35 ms per sync + ~40-50 MB/s download bandwidth.)
    def timed_fetch(keys):
        reps = []
        for i in range(4):
            o, _ = pipe.process(np.roll(x, i + 11, axis=-1), bypass=False)
            for k in keys:
                jax.block_until_ready(o[k])
            t0 = time.perf_counter()
            for k in keys:
                np.asarray(o[k])
            reps.append(time.perf_counter() - t0)
        return med(reps) * 1e3

    out["fetch_mag_ms"] = timed_fetch(("magnitude",))
    out["fetch_wire_ms"] = timed_fetch(
        ("spectrum_re_q15", "spectrum_im_q15")
    )

    # --- end-to-end sequential (the r3 method: process + fetch mag) --------
    def seq_chunk(i):
        xi = np.roll(x, i + 1, axis=-1)
        oo, _ = pipe.process(xi, bypass=False)
        return np.asarray(oo["magnitude"])

    seq_chunk(0)  # warm
    reps = []
    for i in range(6):
        t0 = time.perf_counter()
        seq_chunk(i + 1)
        reps.append(time.perf_counter() - t0)
    out["e2e_seq_ms"] = med(reps) * 1e3
    out["e2e_seq_msps"] = F * N / med(reps) / 1e6

    # --- end-to-end double-buffered ---------------------------------------
    # Submit chunk k's device stage (async), run chunk k+1's host stages
    # while it executes, then fetch k. Steady state = max(host, device+io).
    def host_stage(xi):
        fr = xi.reshape(1, F, N)
        w = qf.window_multiply_q15(fr, rom).reshape(1, -1)
        y2, _ = native_q15.sosfilt_q15_rows(
            sos64, w, np.zeros((1, pipe.cfg.n_sections, 2), np.int64)
        )
        return y2

    fft_jit = pipe._fft_jit
    ys0 = host_stage(x)
    pending = fft_jit(jnp.asarray(ys0.reshape(1, F, N)), bypass=False)
    reps = []
    for i in range(8):
        t0 = time.perf_counter()
        y_next = host_stage(np.roll(x, i + 2, axis=-1))
        nxt = fft_jit(jnp.asarray(y_next.reshape(1, F, N)), bypass=False)
        _m = np.asarray(pending["magnitude"])  # fetch chunk k
        pending = nxt
        reps.append(time.perf_counter() - t0)
    out["e2e_pipe_ms"] = med(reps) * 1e3
    out["e2e_pipe_msps"] = F * N / med(reps) / 1e6
    out["samples_per_chunk"] = F * N
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
