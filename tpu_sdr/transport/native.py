"""ctypes bindings for the C++ framer, with transparent NumPy fallback.

Builds ``libframer.so`` on first use if the toolchain is available; all
entry points are also implemented in pure NumPy (``framing.py`` / ``crc32.py``)
which double as the correctness oracle in tests/test_native.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import warnings

import numpy as np

_DIR = os.path.join(os.path.dirname(__file__), "native")
_SO = os.path.join(_DIR, "libframer.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO):
        try:
            subprocess.run(
                ["make", "-C", _DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception as e:  # no toolchain / build failure -> fallback
            warnings.warn(f"native framer build failed ({e}); using NumPy fallback")
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError as e:
        warnings.warn(f"native framer load failed ({e}); using NumPy fallback")
        return None
    lib.crc32_raw.restype = ctypes.c_uint32
    lib.crc32_raw.argtypes = [
        ctypes.c_char_p,
        ctypes.c_uint64,
        ctypes.c_uint32,
    ]
    lib.crc32_eth.restype = ctypes.c_uint32
    lib.crc32_eth.argtypes = lib.crc32_raw.argtypes
    lib.quantize_interleave.restype = None
    lib.quantize_interleave.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int16),
        ctypes.c_uint64,
        ctypes.c_float,
    ]
    lib.packetize.restype = None
    lib.packetize.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_uint32,
        ctypes.c_uint32,
    ]
    lib.assemble.restype = ctypes.c_uint32
    lib.assemble.argtypes = [
        ctypes.c_char_p,
        ctypes.c_uint32,
        ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def crc32_ethernet(data: bytes, crc: int = 0xFFFFFFFF) -> int:
    lib = _load()
    if lib is None:
        from tpu_sdr.transport.crc32 import crc32_ethernet as py

        return py(data, crc)
    return lib.crc32_eth(data, len(data), crc)


def crc32_raw(data: bytes, crc: int = 0xFFFFFFFF) -> int:
    lib = _load()
    if lib is None:
        from tpu_sdr.transport.crc32 import crc32_update_raw as py

        return py(data, crc)
    return lib.crc32_raw(data, len(data), crc)


def spectrum_to_frame_bytes(re, im, scale: float = 1.0) -> bytes:
    lib = _load()
    if lib is None:
        from tpu_sdr.transport.framing import spectrum_to_frame_bytes as py

        return py(re, im, scale)
    re = np.ascontiguousarray(re, dtype=np.float32)
    im = np.ascontiguousarray(im, dtype=np.float32)
    if re.shape != im.shape or re.ndim != 1:
        raise ValueError(f"re/im must be equal-length 1-D, got {re.shape}/{im.shape}")
    from tpu_sdr.transport.framing import N_BINS

    if re.shape[-1] != N_BINS:
        raise ValueError(f"expected {N_BINS} bins, got {re.shape[-1]}")
    out = np.empty(2 * re.shape[-1], dtype=np.int16)
    lib.quantize_interleave(
        re.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        im.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        re.shape[-1],
        scale,
    )
    return out.tobytes()


def frame_to_packets(frame: bytes, packets: int = 64, data_size: int = 1024):
    lib = _load()
    if lib is None:
        from tpu_sdr.transport import framing

        if (packets, data_size) != (
            framing.PACKETS_PER_FRAME,
            framing.PACKET_DATA_SIZE,
        ):
            # never silently emit different wire output than the native path
            raise RuntimeError(
                "native framer unavailable; the NumPy fallback only supports "
                f"the default {framing.PACKETS_PER_FRAME}x"
                f"{framing.PACKET_DATA_SIZE} packetization"
            )
        return framing.frame_to_packets(frame)
    if len(frame) != packets * data_size:
        raise ValueError(
            f"frame must be {packets * data_size} bytes, got {len(frame)}"
        )
    out = np.empty(packets * (data_size + 1), dtype=np.uint8)
    lib.packetize(
        frame, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), packets, data_size
    )
    raw = out.tobytes()
    step = data_size + 1
    return [raw[i * step : (i + 1) * step] for i in range(packets)]
