"""Magnitude / phase / power decode of complex spectra.

Reference: host-side NumPy ``sqrt(re^2+im^2)`` over the assembled 65536-byte
frame (``scripts/fft_analyzer_gui.py:256-260``). Here it runs on device and
fuses into the FFT epilogue.
"""

from __future__ import annotations

import jax.numpy as jnp


def magnitude(re: jnp.ndarray, im: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(re * re + im * im)


def power(re: jnp.ndarray, im: jnp.ndarray) -> jnp.ndarray:
    return re * re + im * im


def phase(re: jnp.ndarray, im: jnp.ndarray) -> jnp.ndarray:
    return jnp.arctan2(im, re)


def magnitude_db(re: jnp.ndarray, im: jnp.ndarray, floor: float = 1e-12):
    return 10.0 * jnp.log10(jnp.maximum(power(re, im), floor))
