"""Op-level attribution of the fused spectrum kernel's time (f32 tier).

Round-2 verdict #3: the headline kernel sits ~2.4x above its IO floor
with the gap attributed only as "VPU/relayout-bound in aggregate". This
script times WHOLE-KERNEL variants, interleaved A/B/.../H per rep (the
only valid comparison on this chip — CLAUDE.md measurement discipline),
chaining each variant on its own evolving state so every dispatch is
unique (relay memoization hazard). Variants:

correct math (candidates to ship; cat3 WON and shipped as the default
high3 in kernels/pallas/iir_fft.py):
  full       the r2 kernel: stacked 3-dot high3+karatsuba, 8 out .T
  cat3       K-concatenated single-pass high3 (one MXU dot/contraction)
  splitonce  hi/lo bf16 splits factored to once per operand
  combo      splitonce + ONE big output transpose

wrong math (timing-only ablations, cumulative):
  noT        full minus the output transposes        (transpose cost)
  noTw       noT minus the twiddle multiply          (twiddle cost)
  prec1      full at precision=default               (2 of 3 MXU passes)
  io         copy kernel                             (the floor)

Each kernel runs the same grid (F/G steps) over the same (F, 16384)
input; per-dispatch slope = (t_K - t_2)/(K-2), median over reps.

Run (TPU, ONE process): timeout 590 python scripts/ablate_spectrum.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from tpu_sdr.kernels import fft, window  # noqa: E402

G = 8
N1 = N2 = 128
N = N1 * N2
F = 512  # frames per dispatch (the bench's C=8 x F=64)
T0 = time.time()


def log(msg):
    print(f"[{time.time() - T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def _split2(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _d(x, y):
    return jnp.dot(x, y, preferred_element_type=jnp.float32, precision="default")


def _dot_h3(a, b):
    ah, al = _split2(a)
    bh, bl = _split2(b)
    return _d(ah, bh) + (_d(ah, bl) + _d(al, bh))


def _dT(x, y):
    return jax.lax.dot_general(
        x, y, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision="default")


def _dotT_h3(a, b):
    ah, al = _split2(a)
    bh, bl = _split2(b)
    return _dT(ah, bh) + (_dT(ah, bl) + _dT(al, bh))


def _dotT_h3_pre(ah, al, bh, bl):
    return _dT(ah, bh) + (_dT(ah, bl) + _dT(al, bh))


def _stack_to_lanes(y):
    return jnp.concatenate(
        [y[f * N2 : (f + 1) * N2, :] for f in range(G)], axis=1)


def _stack_to_rows(yl):
    return jnp.concatenate(
        [yl[:, f * N1 : (f + 1) * N1] for f in range(G)], axis=0)


def _kernel(x_ref, w2r, w2i, twr, twi, w1r, w1i, out_ref, *, variant):
    y = x_ref[:].reshape(G * N2, N1)
    if variant == "io":
        out_ref[:] = x_ref[:]
        return
    if variant == "cat3":
        # K-concatenated 3-pass: ah@bh + ah@bl + al@bh == [ah|ah|al] @
        # [bh;bl;bh] — ONE MXU dot per contraction (f32 accumulate runs
        # K-serially over 3K, numerically a valid high3, different sum
        # order than the 3-dot form), no inter-dot f32 result adds. The
        # constant sides concatenate from const refs (tiny).
        yl = _stack_to_lanes(y)
        ylh, yll = _split2(yl)
        b1 = jnp.concatenate([ylh, yll, ylh], axis=0)  # (3*n2, G*n1) bf16
        w2rh, w2rl = _split2(w2r[:])
        w2ih, w2il = _split2(w2i[:])
        a_ri = jnp.concatenate([
            jnp.concatenate([w2rh, w2rh, w2rl], axis=1),
            jnp.concatenate([w2ih, w2ih, w2il], axis=1),
        ], axis=0)  # (2*k2, 3*n2)
        yri = _d(a_ri, b1)  # (2*k2, G*n1) f32
        yr, yi = yri[:N2], yri[N2:]
        tr = yr * twr[:] - yi * twi[:]
        ti = yr * twi[:] + yi * twr[:]
        trs = _stack_to_rows(tr)
        tis = _stack_to_rows(ti)
        trh, trl = _split2(trs)
        tih, til = _split2(tis)
        tsh, tsl = _split2(trs + tis)
        w1rh, w1rl = _split2(w1r[:])
        w1ih, w1il = _split2(w1i[:])
        w1sh, w1sl = _split2(w1r[:] + w1i[:])
        catA = lambda h, l: jnp.concatenate([h, h, l], axis=1)  # (M, 3K)
        catB = lambda h, l: jnp.concatenate([h, l, h], axis=1)  # (N, 3K)
        t1 = _dT(catA(trh, trl), catB(w1rh, w1rl))
        t2 = _dT(catA(tih, til), catB(w1ih, w1il))
        t3 = _dT(catA(tsh, tsl), catB(w1sh, w1sl))
        zr, zi = t1 - t2, t3 - t1 - t2
        mag = jnp.sqrt(zr * zr + zi * zi)
        for f in range(G):
            out_ref[f] = mag[f * N2 : (f + 1) * N2, :].T
        return
    if variant == "perframe":
        # no stacking anywhere: per-frame (128,128) dots + per-frame .T
        tw_r, tw_i = twr[:, :N1], twi[:, :N1]
        for f in range(G):
            xf = y[f * N2 : (f + 1) * N2, :]
            yr = _dot_h3(w2r[:], xf)
            yi = _dot_h3(w2i[:], xf)
            tr = yr * tw_r - yi * tw_i
            ti = yr * tw_i + yi * tw_r
            t1 = _dotT_h3(tr, w1r[:])
            t2 = _dotT_h3(ti, w1i[:])
            t3 = _dotT_h3(tr + ti, w1r[:] + w1i[:])
            zr, zi = t1 - t2, t3 - t1 - t2
            out_ref[f] = jnp.sqrt(zr * zr + zi * zi).T
        return
    prec1 = variant == "prec1"
    dot = _d if prec1 else _dot_h3
    dotT = _dT if prec1 else _dotT_h3
    yl = _stack_to_lanes(y)  # (n2, G*n1)
    if variant in ("splitonce", "combo"):
        ylh, yll = _split2(yl)
        w2rh, w2rl = _split2(w2r[:])
        w2ih, w2il = _split2(w2i[:])
        d = lambda bh, bl: _d(bh, ylh) + (_d(bh, yll) + _d(bl, ylh))
        yr = d(w2rh, w2rl)
        yi = d(w2ih, w2il)
    else:
        yr = dot(w2r[:], yl)
        yi = dot(w2i[:], yl)
    if variant == "noTw":
        tr, ti = yr, yi
    else:
        tr = yr * twr[:] - yi * twi[:]
        ti = yr * twi[:] + yi * twr[:]
    trs = _stack_to_rows(tr)  # (G*k2, n1)
    tis = _stack_to_rows(ti)
    if variant in ("splitonce", "combo"):
        trh, trl = _split2(trs)
        tih, til = _split2(tis)
        tsh, tsl = _split2(trs + tis)
        w1rh, w1rl = _split2(w1r[:])
        w1ih, w1il = _split2(w1i[:])
        # split the f32 SUM (bitwise == full's split(w1r + w1i)); summing
        # the bf16 hi/lo parts instead rounds differently and breaks the
        # karatsuba cancellation
        w1sh, w1sl = _split2(w1r[:] + w1i[:])
        t1 = _dotT_h3_pre(trh, trl, w1rh, w1rl)
        t2 = _dotT_h3_pre(tih, til, w1ih, w1il)
        t3 = _dotT_h3_pre(tsh, tsl, w1sh, w1sl)
    else:
        t1 = dotT(trs, w1r[:])
        t2 = dotT(tis, w1i[:])
        t3 = dotT(trs + tis, w1r[:] + w1i[:])
    zr, zi = t1 - t2, t3 - t1 - t2
    mag = jnp.sqrt(zr * zr + zi * zi)
    if variant in ("noT", "noTw"):
        for f in range(G):
            out_ref[f] = mag[f * N2 : (f + 1) * N2, :]
    elif variant in ("bigT", "combo"):
        magT = mag.T  # one (G*k2, k1) -> (k1, G*k2) transpose
        for f in range(G):
            out_ref[f] = magT[:, f * N2 : (f + 1) * N2]
    else:  # full, splitonce, prec1
        for f in range(G):
            out_ref[f] = mag[f * N2 : (f + 1) * N2, :].T


def make_step(variant, consts):
    fspec = pl.BlockSpec((G, N2, N1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    vspec = lambda s: pl.BlockSpec(
        s, lambda i: tuple(0 for _ in s), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        functools.partial(_kernel, variant=variant),
        out_shape=jax.ShapeDtypeStruct((F, N1, N2), jnp.float32),
        grid=(F // G,),
        in_specs=[fspec] + [vspec(c.shape) for c in consts],
        out_specs=pl.BlockSpec((G, N1, N2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=bool(int(os.environ.get("ABLATE_INTERPRET", "0"))),
    )

    @jax.jit
    def step(x, c):
        mag = call(x.reshape(F, N2, N1), *consts)
        # feedback keeps every chained dispatch's input unique; the counter
        # guards against the multiplicative map settling into a cycle
        # (a cycle would hand the relay bit-identical dispatches to replay)
        x1 = mag.reshape(F, N) * jnp.float32(1e-3) + c * jnp.float32(1e-7)
        return x1, c + 1.0, mag

    return step


class Chain:
    def __init__(self, variant, consts, x0):
        self.step = make_step(variant, consts)
        self.x = x0
        self.c = jnp.float32(1.0)
        self.variant = variant

    def run_k(self, k):
        x, c = self.x, self.c
        t0 = time.perf_counter()
        for _ in range(k):
            x, c, mag = self.step(x, c)
        float(mag.ravel()[0])
        dt = time.perf_counter() - t0
        self.x, self.c = x, c
        return dt

    def slope(self, k_long=102):
        ts = min(self.run_k(2) for _ in range(2))
        tl = min(self.run_k(k_long) for _ in range(2))
        return (tl - ts) / (k_long - 2)


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((F, N)), jnp.float32)
    win = window.hann_coefficients(N)
    plan = fft.plan_constants(N1, N2)
    twr = jnp.tile(plan["twr"], (1, G))
    twi = jnp.tile(plan["twi"], (1, G))
    consts = [plan["w2r"], plan["w2i"], twr, twi, plan["w1r"], plan["w1i"]]
    del win  # bypass path: the bench kernel windows upstream in XLA

    variants = ["full", "cat3", "splitonce", "combo",
                "noT", "noTw", "prec1", "io"]
    chains = {}
    for v in variants:
        t0 = time.time()
        chains[v] = Chain(v, consts, x0)
        chains[v].run_k(1)  # compile
        log(f"{v}: compiled in {time.time() - t0:.1f}s")

    # correctness: the correct-math variants must match `full` bitwise
    ref_step = chains["full"].step
    _, _, m_ref = ref_step(x0, jnp.float32(0.0))
    for v in ("cat3", "splitonce", "combo"):
        _, _, m_v = chains[v].step(x0, jnp.float32(0.0))
        same = bool(jnp.all(m_v == m_ref))
        log(f"{v}: bitwise == full: {same}")
        if not same:
            err = float(jnp.max(jnp.abs(m_v - m_ref) / (jnp.abs(m_ref) + 1e-6)))
            log(f"{v}: max rel err vs full: {err:.3e}")

    for v in variants:
        chains[v].run_k(3)  # warm queues

    slopes = {v: [] for v in variants}
    for rep in range(5):
        for v in variants:  # interleaved: one slope per variant per rep
            slopes[v].append(chains[v].slope())
        log("rep %d: %s" % (
            rep, {v: f"{s[-1] * 1e3:.3f} ms" for v, s in slopes.items()}))

    med = {v: sorted(s)[len(s) // 2] * 1e3 for v, s in slopes.items()}
    out = {
        "medians_ms": med,
        "slopes_ms": {v: [round(x * 1e3, 4) for x in s]
                      for v, s in slopes.items()},
        "frames_per_dispatch": F,
        "deltas_ms": {
            "transpose_8x (full - noT)": med["full"] - med["noT"],
            "twiddle (noT - noTw)": med["noT"] - med["noTw"],
            "third_mxu_pass (full - prec1)": med["full"] - med["prec1"],
            "above_io_floor (full - io)": med["full"] - med["io"],
        },
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
