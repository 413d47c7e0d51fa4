"""Waterfall / spectrogram output (BASELINE config 4: wideband display).

Turns the magnitude stream into display products at sustainable rates:

- ``decimate_db``: device-side peak-preserving decimation + dB conversion
  (jittable; fuses into the pipeline epilogue) — 16384 bins -> ~1-2K display
  columns so 4096-channel waterfalls stay within UDP/GUI practicality
  (SURVEY.md §7 hard parts: host streaming rate);
- ``Waterfall``: host-side ring buffer of decimated rows with peak-hold and
  average traces — the classic spectrum-analyzer display modes the
  reference GUI approximates with its magnitude plot.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("points", "db"))
def decimate_db(
    mag: jnp.ndarray, points: int = 1024, db: bool = True, floor: float = 1e-9
):
    """Peak-preserving decimation of magnitudes (..., N) -> (..., points).

    Max-pool buckets keep narrowband peaks visible at any zoom (a mean-pool
    would bury a 1-bin tone 12 dB for every 16x decimation).
    """
    n = mag.shape[-1]
    if n % points:
        raise ValueError(f"bins {n} not divisible by points {points}")
    pooled = jnp.max(mag.reshape(*mag.shape[:-1], points, n // points), axis=-1)
    if db:
        pooled = 20.0 * jnp.log10(jnp.maximum(pooled, floor))
    return pooled


class Waterfall:
    """Scrolling spectrogram with peak-hold and exponential-average traces."""

    def __init__(self, points: int = 1024, depth: int = 256, avg_alpha: float = 0.1):
        self.points = points
        self.depth = depth
        self.avg_alpha = avg_alpha
        self.rows = np.full((depth, points), -200.0, dtype=np.float32)
        self.peak_hold = np.full(points, -200.0, dtype=np.float32)
        self.average = np.full(points, -200.0, dtype=np.float32)
        self.row_count = 0
        self._head = 0

    def push(self, decimated_db: np.ndarray):
        """Add one (or a batch of) decimated dB rows (points,) or (F, points)."""
        rows = np.atleast_2d(np.asarray(decimated_db, np.float32))
        for r in rows:
            self.rows[self._head] = r
            self._head = (self._head + 1) % self.depth
            self.row_count += 1
            np.maximum(self.peak_hold, r, out=self.peak_hold)
            if self.row_count == 1:
                self.average[:] = r
            else:
                self.average += self.avg_alpha * (r - self.average)

    def image(self) -> np.ndarray:
        """(depth, points) array, newest row last — ready for display."""
        return np.roll(self.rows, -self._head, axis=0)

    def reset_peak(self):
        self.peak_hold[:] = -200.0

    def clear(self):
        """Full display reset (the GUI 'reset_plot' event)."""
        self.rows[:] = -200.0
        self.peak_hold[:] = -200.0
        self.average[:] = -200.0
        self.row_count = 0
        self._head = 0

    def latest(self) -> np.ndarray:
        return self.rows[(self._head - 1) % self.depth]
