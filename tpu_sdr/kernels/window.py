"""Window kernel: TPU-native equivalent of the reference Hann window path.

Reference: a 16K-entry coefficient ROM (``src/hann.vhd``) feeding a Q15
multiply-round unit (``src/hann8192.vhd:28-47``) at one sample per cycle.
Here the window is a device-resident coefficient vector and the "kernel" is a
pure elementwise multiply over whole frames — XLA fuses it into whichever
consumer follows (the IIR block matmul or the first FFT matmul), so it costs
zero extra HBM passes.

Streaming semantics: the RTL window address counter runs over the continuous
sample stream mod N (``src/hann8192.vhd:41-44``), so with frame-aligned blocks
(hop == N, the reference configuration) the phase at each frame start is 0.
The carried ``window_phase`` counter is observability state (the RTL ROM
address counter analog); frame-aligned dispatch keeps windowing phase-free.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from tpu_sdr.control import golden


@functools.lru_cache(maxsize=8)
def _hann_np(n: int, rtl_faithful: bool) -> np.ndarray:
    if rtl_faithful:
        return golden.hann_rtl_effective(n)
    return golden.hann_true(n)


def hann_coefficients(n: int, rtl_faithful: bool = False, dtype=jnp.float32):
    """Device window coefficients.

    ``rtl_faithful=True`` reproduces the RTL's effective -cos window
    (quirks register item (a)); default is the true Hann window.
    """
    return jnp.asarray(_hann_np(n, rtl_faithful), dtype=dtype)


def hann_q16_rom(n: int) -> jnp.ndarray:
    """The bit-exact int16 ROM contents (``src/hann.vhd:5-6``)."""
    return jnp.asarray(golden.hann_q16_rom(n))


def apply_window(frames: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """frames (..., N) * w (N,) — the whole window 'kernel'."""
    return frames * w


def window_q15(frames_q15: jnp.ndarray, rom_q16: jnp.ndarray) -> jnp.ndarray:
    """Bit-exact RTL window multiply on device: (x*w)>>15 + half-LSB bit.

    Reference ``src/hann8192.vhd:36-39``. int16 x int16 -> int32 products,
    result wraps to int16 exactly like the RTL slice assignment.
    """
    p = frames_q15.astype(jnp.int32) * rom_q16.astype(jnp.int32)
    out = (p >> 15) + ((p >> 14) & 1)
    return out.astype(jnp.int16)
