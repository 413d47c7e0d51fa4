"""ctypes bindings for the native Q15 integer SOS filter.

Same pattern as ``transport/native.py``: build on first use, fall back to
the pure-NumPy oracle (``control/golden.sosfilt_q15_intended``) when the
toolchain is missing. The C++ loop is bit-exact vs the oracle (tested,
tests/test_q15.py) and ~250x faster — it is what lets the hardware-
faithful live mode (``Q15Pipeline(device_fft=True)``) keep up with real
time in the FILTERED modes, not just bypass.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
import warnings

import numpy as np

_DIR = os.path.join(os.path.dirname(__file__), "native")
_SO = os.path.join(_DIR, "libq15filter.so")
_lib = None
_tried = False
_load_lock = threading.Lock()


def _load():
    with _load_lock:
        return _load_locked()


def _load_locked():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        subprocess.run(
            ["make", "-C", _DIR], check=True, capture_output=True, timeout=120
        )
    except Exception as e:  # no toolchain / build failure
        if not os.path.exists(_SO):
            warnings.warn(
                f"native q15 filter build failed ({e}); using NumPy oracle"
            )
            return None
        warnings.warn(
            f"native q15 filter rebuild failed ({e}); using existing .so"
        )
    try:
        lib = ctypes.CDLL(_SO)
    except OSError as e:
        warnings.warn(f"native q15 filter load failed ({e}); using NumPy oracle")
        return None
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    i16p = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
    lib.sosfilt_q15_batch.restype = ctypes.c_int
    lib.sosfilt_q15_batch.argtypes = [
        i64p, ctypes.c_int, i16p, ctypes.c_int64, ctypes.c_int64, i64p, i16p,
    ]
    try:
        lib.sosfilt_q15_window_batch.restype = ctypes.c_int
        lib.sosfilt_q15_window_batch.argtypes = [
            i64p, ctypes.c_int, i16p, ctypes.c_int64, ctypes.c_int64,
            i16p, ctypes.c_int64, ctypes.c_int64, i64p, i16p, i16p,
        ]
    except AttributeError:  # pragma: no cover - stale prebuilt .so
        pass
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def sosfilt_q15_rows(sos_x64, x_q15, zi):
    """Filter R independent rows: x (R, T) int16, zi (R, S, 2) int64.

    Returns (y (R, T) int16, zf (R, S, 2) int64) — bit-exact vs looping
    ``golden.sosfilt_q15_intended`` per row (which is also the fallback).
    """
    sos = np.ascontiguousarray(sos_x64, np.int64)
    if sos.ndim != 2 or sos.shape[1] != 6:
        raise ValueError(f"sos must be (S, 6); got {sos.shape}")
    if np.any(sos[:, 3] != 64):
        raise ValueError(
            f"normalized sections required (a0 == 64); got {sos[:, 3].tolist()}"
        )
    x = np.ascontiguousarray(x_q15, np.int16)
    if x.ndim != 2:
        raise ValueError(f"x must be (R, T); got {x.shape}")
    rows, n = x.shape
    z = np.ascontiguousarray(zi, np.int64).copy()
    if z.shape != (rows, sos.shape[0], 2):
        raise ValueError(
            f"zi must be {(rows, sos.shape[0], 2)}; got {z.shape}"
        )
    lib = _load()
    if lib is None:  # pure-NumPy oracle fallback
        from tpu_sdr.control import golden

        y = np.empty_like(x)
        for r in range(rows):
            y[r], z[r] = golden.sosfilt_q15_intended(sos, x[r], z[r])
        return y, z
    y = np.empty_like(x)
    rc = lib.sosfilt_q15_batch(
        sos, sos.shape[0], x, rows, n, z.reshape(-1), y
    )
    if rc != 0:  # pragma: no cover - a0 validated above
        raise ValueError("native q15 filter rejected the coefficient set")
    return y, z.reshape(rows, sos.shape[0], 2)


def sosfilt_q15_window_rows(sos_x64, x_q15, rom_q16, zi, want_windowed=True):
    """Fused RTL window + filter over R independent rows, ONE pass.

    x (R, T) int16 RAW samples; rom (n,) int16 window ROM (frame-aligned:
    T % n == 0); zi (R, S, 2) int64. Returns (y, yw, zf) with yw the
    windowed intermediate (``windowed_q15``) or None when not requested —
    bit-exact vs ``qformat.window_multiply_q15`` + ``sosfilt_q15_rows``
    (tested), at ~half the host time of the two-pass form.
    """
    sos = np.ascontiguousarray(sos_x64, np.int64)
    if sos.ndim != 2 or sos.shape[1] != 6:
        raise ValueError(f"sos must be (S, 6); got {sos.shape}")
    if np.any(sos[:, 3] != 64):
        raise ValueError(
            f"normalized sections required (a0 == 64); got {sos[:, 3].tolist()}"
        )
    x = np.ascontiguousarray(x_q15, np.int16)
    if x.ndim != 2:
        raise ValueError(f"x must be (R, T); got {x.shape}")
    rows, t = x.shape
    rom = np.ascontiguousarray(rom_q16, np.int16)
    if rom.ndim != 1 or t % rom.shape[0]:
        raise ValueError(
            f"rom must be 1-D with length dividing T; got {rom.shape} vs T={t}"
        )
    z = np.ascontiguousarray(zi, np.int64).copy()
    if z.shape != (rows, sos.shape[0], 2):
        raise ValueError(f"zi must be {(rows, sos.shape[0], 2)}; got {z.shape}")
    lib = _load()
    if lib is None or not hasattr(lib, "sosfilt_q15_window_batch"):
        # NumPy fallback: the two-pass form (same bits).
        from tpu_sdr.core import qformat as qf

        xw = qf.window_multiply_q15(
            x.reshape(rows, -1, rom.shape[0]), rom
        ).reshape(rows, t)
        y, zf = sosfilt_q15_rows(sos, xw, z)
        return y, (xw if want_windowed else None), zf
    y = np.empty_like(x)
    yw = np.empty_like(x)  # always passed (ndpointer argtypes reject None)
    rc = lib.sosfilt_q15_window_batch(
        sos, sos.shape[0], x, rows, t, rom, rom.shape[0], 0,
        z.reshape(-1), yw, y,
    )
    if rc != 0:  # pragma: no cover - a0 validated above
        raise ValueError("native q15 filter rejected the coefficient set")
    return y, (yw if want_windowed else None), z.reshape(rows, sos.shape[0], 2)
