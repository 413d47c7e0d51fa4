"""Filter-bank construction shared by the single-device and sharded engines.

One implementation of SOS validation, padding, and operator building (the
0xF1-upload backend), so stability rules and wire-padding semantics cannot
drift between engines.
"""

from __future__ import annotations

import numpy as np

from tpu_sdr.core.config import PipelineConfig
from tpu_sdr.kernels import biquad


def validate_stable(sos: np.ndarray, label: str = "SOS"):
    """Reject sections with poles on/outside the unit circle — the blocked
    operator raises A to the 128th power, which overflows for unstable poles.
    """
    for i, sec in enumerate(np.atleast_2d(sos)):
        if sec[3] == 0.0:
            # np.roots would strip the leading zero and silently pass a
            # section whose a0 normalization divides by zero downstream
            raise ValueError(
                f"{label} section {i} has a0 == 0; refusing upload"
            )
        poles = np.roots(sec[3:6])
        if np.any(np.abs(poles) >= 1.0):
            raise ValueError(
                f"{label} section {i} is unstable (|pole| = "
                f"{np.max(np.abs(poles)):.4f} >= 1); refusing upload"
            )


def prepare_sos(sos, n_sections: int) -> np.ndarray:
    """Pad to the engine's section count and validate stability."""
    sos = biquad.pad_sos(sos, n_sections)
    validate_stable(sos)
    return sos


def prepare_bank(sos_bank, channels: int, n_sections: int) -> np.ndarray:
    """Normalize a per-channel bank: (C, S, 6) array or list of designs
    (orders may differ; each padded per channel), stability-validated.
    """
    if isinstance(sos_bank, (list, tuple)):
        bank_list = [np.atleast_2d(np.asarray(s, np.float64)) for s in sos_bank]
    else:
        arr = np.asarray(sos_bank, np.float64)
        if arr.ndim == 2:
            # one (S, 6) design -> a 1-channel bank. NOT np.atleast_3d,
            # which APPENDS the axis ((S, 6) -> (S, 6, 1)) and mangles the
            # rows into length-1 pseudo-cascades (review finding).
            arr = arr[None]
        bank_list = [arr[c] for c in range(arr.shape[0])]
    if len(bank_list) != channels:
        raise ValueError(
            f"bank has {len(bank_list)} channel filters; config has "
            f"{channels} channels"
        )
    padded = []
    for c, sos in enumerate(bank_list):
        sos = biquad.pad_sos(sos, n_sections)
        validate_stable(sos, label=f"channel {c}")
        padded.append(sos)
    return np.stack(padded)


def build_bank(cfg: PipelineConfig, hann_w, fft_plan, sos) -> dict:
    """Build one {op, pp} filter bank for a shared (non-per-channel) cascade."""
    fb = cfg.fft_size // cfg.iir_block
    bank = {"op": biquad.precompute_composite(sos, cfg.iir_block, fb)}
    # THE eligibility predicate — must match stream.py's dispatch gates
    # (review finding: this gate used to omit the fft_n1/fft_n2 checks, so
    # a legal fft_n1=64/fft_n2=256 config crashed in build_plan instead of
    # falling back to the XLA path the dispatch would have taken).
    if cfg.pallas_geometry_ok():
        from tpu_sdr.kernels.pallas import iir_fft

        bank["pp"] = iir_fft.build_plan(sos, hann_w, fft_plan, cfg.iir_block, fb)
    else:
        bank["pp"] = None
    return bank


def build_channel_bank_op(cfg: PipelineConfig, sos_bank_padded: np.ndarray):
    """Per-channel composite operator stack from a prepared (C, S, 6) bank."""
    return biquad.precompute_composite_bank(
        sos_bank_padded, cfg.iir_block, cfg.fft_size // cfg.iir_block
    )
