"""On-chip A/B: spectrum-kernel group size G=8 vs G=16 (cat3 high3).

Doubling the frames stacked per grid step halves the per-step fixed
costs (const splits/concats, pipeline bubbles) and doubles the dot M
dims — IF the working set still fits VMEM (~16 MB). A Mosaic
compile/OOM failure is itself the (cheap) negative verdict.

Run (TPU, ONE process): timeout 590 python scripts/g16_ab.py
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from tpu_sdr.kernels import fft  # noqa: E402

N1 = N2 = 128
N = N1 * N2
F = 512
T0 = time.time()


def log(msg):
    print(f"[{time.time() - T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def _split2(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dT(x, y):
    return jax.lax.dot_general(
        x, y, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision="default")


def _kernel(x_ref, w2r, w2i, twr, twi, w1r, w1i, out_ref, *, g):
    y = x_ref[:].reshape(g * N2, N1)
    yl = jnp.concatenate(
        [y[f * N2:(f + 1) * N2, :] for f in range(g)], axis=1)
    ylh, yll = _split2(yl)
    b1 = jnp.concatenate([ylh, yll, ylh], axis=0)
    w2rh, w2rl = _split2(w2r[:])
    w2ih, w2il = _split2(w2i[:])
    a_ri = jnp.concatenate([
        jnp.concatenate([w2rh, w2rh, w2rl], axis=1),
        jnp.concatenate([w2ih, w2ih, w2il], axis=1),
    ], axis=0)
    yri = jnp.dot(a_ri, b1, preferred_element_type=jnp.float32,
                  precision="default")
    yr, yi = yri[:N2], yri[N2:]
    tr = yr * twr[:] - yi * twi[:]
    ti = yr * twi[:] + yi * twr[:]
    trs = jnp.concatenate(
        [tr[:, f * N1:(f + 1) * N1] for f in range(g)], axis=0)
    tis = jnp.concatenate(
        [ti[:, f * N1:(f + 1) * N1] for f in range(g)], axis=0)
    trh, trl = _split2(trs)
    tih, til = _split2(tis)
    tsh, tsl = _split2(trs + tis)
    w1rh, w1rl = _split2(w1r[:])
    w1ih, w1il = _split2(w1i[:])
    w1sh, w1sl = _split2(w1r[:] + w1i[:])
    catA = lambda h, l: jnp.concatenate([h, h, l], axis=1)
    catB = lambda h, l: jnp.concatenate([h, l, h], axis=1)
    t1 = _dT(catA(trh, trl), catB(w1rh, w1rl))
    t2 = _dT(catA(tih, til), catB(w1ih, w1il))
    t3 = _dT(catA(tsh, tsl), catB(w1sh, w1sl))
    zr, zi = t1 - t2, t3 - t1 - t2
    mag = jnp.sqrt(zr * zr + zi * zi)
    for fi in range(g):
        out_ref[fi] = mag[fi * N2:(fi + 1) * N2, :].T


def make_step(g, consts):
    fspec = pl.BlockSpec((g, N2, N1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    vspec = lambda s: pl.BlockSpec(
        s, lambda i: tuple(0 for _ in s), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        functools.partial(_kernel, g=g),
        out_shape=jax.ShapeDtypeStruct((F, N1, N2), jnp.float32),
        grid=(F // g,),
        in_specs=[fspec] + [vspec(c.shape) for c in consts],
        out_specs=pl.BlockSpec((g, N1, N2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    @jax.jit
    def step(x, c):
        mag = call(x.reshape(F, N2, N1), *consts)
        x1 = mag.reshape(F, N) * jnp.float32(1e-3) + c * jnp.float32(1e-7)
        return x1, c + 1.0, mag

    return step


class Chain:
    def __init__(self, g, consts, x0):
        self.step = make_step(g, consts)
        self.x, self.c = x0, jnp.float32(1.0)

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
    plan = fft.plan_constants(N1, N2)
    chains = {}
    for g in (8, 16):
        consts = [plan["w2r"], plan["w2i"],
                  jnp.tile(plan["twr"], (1, g)), jnp.tile(plan["twi"], (1, g)),
                  plan["w1r"], plan["w1i"]]
        try:
            t0 = time.time()
            ch = Chain(g, consts, x0)
            ch.run_k(1)
            log(f"G={g}: compiled in {time.time() - t0:.1f}s")
            chains[g] = ch
        except Exception as e:
            log(f"G={g}: FAILED to compile/run: {type(e).__name__}: {e}")
    if 16 in chains and 8 in chains:
        _, _, m8 = chains[8].step(x0, jnp.float32(0.0))
        _, _, m16 = chains[16].step(x0, jnp.float32(0.0))
        log(f"G16 bitwise == G8: {bool(jnp.all(m8 == m16))}")
    for ch in chains.values():
        ch.run_k(3)
    slopes = {g: [] for g in chains}
    for rep in range(6):
        for g, ch in chains.items():
            slopes[g].append(ch.slope())
        log("rep %d: %s" % (
            rep, {g: f"{s[-1] * 1e3:.3f} ms" for g, s in slopes.items()}))
    med = {g: sorted(s)[len(s) // 2] * 1e3 for g, s in slopes.items()}
    print(json.dumps({
        "medians_ms": med,
        "slopes_ms": {g: [round(x * 1e3, 4) for x in s]
                      for g, s in slopes.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
