"""Q15-faithful integer pipeline — the bit-exact validation path.

The fast pipeline computes in float (within the Q15 SNR envelope); this mode
reproduces the reference's integer arithmetic exactly where it is defined
(SURVEY.md §2.6 contract):

- window: int16 ROM (= clip(round((hann-0.5)*2^16))) with the RTL's
  (x*w)>>15 + half-LSB rounding — bit-exact vs ``golden.rtl_window_q15``;
  ``rtl_misaligned_window=True`` additionally reproduces the RTL's 1-sample
  coefficient lag (ROM[k-1] applied to sample k, quirks register item (b)).
  NOTE: this deliberately includes the RTL's offset-window quirk (the ROM
  encodes hann-0.5, so the effective window is -cos): pure tones appear
  split into the two ADJACENT bins with the center suppressed, exactly as
  on the real FPGA — A/B against the float pipeline (true Hann) makes the
  quirk visible (quirks register item (a), SURVEY.md §7);
- IIR: x64 int8 coefficients, >>6 round-half-away, int16 saturation
  (the *intended* /64 scale; the RTL's /128 quirk is modeled separately in
  ``golden.rtl_biquad12_quirky``) — bit-exact vs
  ``golden.sosfilt_q15_intended``;
- FFT: the scaled 16-bit fixed-point model of the xfft core's default
  configuration — 1/N scaling schedule, truncation rounding, Q15 phase
  factors (``kernels/fft_q15.py``; the RTL never writes the config channel,
  ``dsp_system_top.vhd:534-536``). Output ``spectrum_re_q15/_im_q15`` are
  the int16 words the FPGA drains onto the wire (``sequ2.vhd:153``); the
  model is schedule-faithful (gate-level rounding points are proprietary)
  and the float path is bound against it within a few wire LSBs
  (``tests/test_q15.py``);
- magnitude: the GUI decode math over those wire ints
  (``fft_analyzer_gui.py:256-260``).

The filter is inherently sequential (saturation is nonlinear) — this is a
correctness oracle and A/B tool, not a throughput path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpu_sdr.core.config import PipelineConfig
from tpu_sdr.core import qformat as qf
from tpu_sdr.kernels import biquad, fft_q15, window


class Q15Pipeline:
    """Bit-faithful integer chain: q15 samples -> q15 filtered -> spectra."""

    def __init__(
        self,
        cfg: PipelineConfig | None = None,
        rtl_misaligned_window: bool = False,
        device_fft: bool = False,
    ):
        self.cfg = cfg or PipelineConfig()
        n = self.cfg.fft_size
        rom = np.asarray(window.hann_q16_rom(n))
        if rtl_misaligned_window:
            # The RTL applies ROM[k-1] to sample k (one-process pipeline lag,
            # src/hann8192.vhd:36-43; steady-state counter wrap gives sample 0
            # ROM[N-1]) — see golden.rtl_window_q15(misaligned=True).
            rom = np.roll(rom, 1)
        self.rom_np = rom
        self.rom = jnp.asarray(rom)
        self.sos_q: np.ndarray | None = None
        # device_fft: the live-streaming split (round-3 verdict #8) — the
        # vectorizable stages (window elementwise, 14-rank integer FFT) run
        # as ONE jitted device dispatch per chunk; only the inherently
        # per-sample saturating IIR stays on the host (NumPy oracle), and
        # bypass mode skips it entirely. Same bits as the all-scan jit path
        # and the NumPy oracle (tested); the win is rate: the full-jit path
        # compiles a T-iteration lax.scan, useless for live chunks.
        self.device_fft = bool(device_fft)
        self._jit = jax.jit(self._process)
        self._fft_jit = jax.jit(self._window_fft, static_argnames=("bypass",))

    def upload_sos_q(self, sos_x64: np.ndarray):
        """Quantized coefficients, int8 x64 (the wire format's payload)."""
        sos_x64 = np.atleast_2d(np.asarray(sos_x64))
        self.sos_q = biquad.pad_sos(
            sos_x64.astype(np.float64) / qf.COEFF_SCALE, self.cfg.n_sections
        ) * qf.COEFF_SCALE
        self.sos_q = np.rint(self.sos_q).astype(np.int32)

    def _process(self, x_q15, zi, sos_q):
        n = self.cfg.fft_size
        lead = x_q15.shape[:-1]
        frames = x_q15.reshape(*lead, -1, n)
        xw = window.window_q15(frames, self.rom)  # bit-exact RTL window
        y, zf = biquad.sosfilt_q15_scan(
            sos_q, xw.reshape(*lead, -1), zi
        )  # bit-exact intended integer filter
        yq = y.reshape(*lead, -1, n)
        # scaled fixed-point FFT: the int16 wire words (sequ2.vhd:153)
        fr_q, fi_q = fft_q15.fft_q15(yq)
        fr = fr_q.astype(jnp.float32)
        fi = fi_q.astype(jnp.float32)
        return {
            "windowed_q15": xw,
            "filtered_q15": yq,
            "spectrum_re_q15": fr_q,
            "spectrum_im_q15": fi_q,
            # GUI decode math over the wire ints (fft_analyzer_gui.py:256-260)
            "magnitude": jnp.sqrt(fr * fr + fi * fi),
        }, zf

    def _window_fft(self, y_frames, *, bypass):
        """Device stage of the split path: [window +] integer FFT + decode.

        ``bypass=True``: y_frames are RAW q15 frames — window on device
        (elementwise) then FFT. ``bypass=False``: y_frames are already
        windowed+filtered on the host — FFT only.
        """
        if bypass:
            y_frames = window.window_q15(y_frames, self.rom)
        fr_q, fi_q = fft_q15.fft_q15(y_frames)
        fr = fr_q.astype(jnp.float32)
        fi = fi_q.astype(jnp.float32)
        return {
            "spectrum_re_q15": fr_q,
            "spectrum_im_q15": fi_q,
            "magnitude": jnp.sqrt(fr * fr + fi * fi),
        }

    def _process_split(self, x, zi, bypass):
        """Host window + native-C++ filter -> ONE device dispatch."""
        n = self.cfg.fft_size
        x = np.asarray(x, np.int16)
        if x.ndim == 1:
            x = x[None, :]
        lead = x.shape[:-1]
        if bypass:
            if zi is None:
                zi = np.zeros((*lead, self.cfg.n_sections, 2), np.int64)
            out = self._fft_jit(
                jnp.asarray(x.reshape(*lead, -1, n)), bypass=True
            )
            return out, np.asarray(zi)
        if self.sos_q is None:
            raise ValueError("upload_sos_q first")
        frames = x.reshape(*lead, -1, n)
        # vectorized host window (bit-exact: same ROM/rounding as the RTL)
        xw = qf.window_multiply_q15(frames, self.rom_np).reshape(*lead, -1)
        flat = xw.reshape(-1, xw.shape[-1])
        if zi is None:
            zi = np.zeros((*lead, self.cfg.n_sections, 2), np.int64)
        zflat = np.asarray(zi, np.int64).reshape(-1, self.cfg.n_sections, 2)
        sos64 = np.asarray(self.sos_q, np.int64)
        # the one per-sample host stage: the native C++ loop (bit-exact vs
        # golden.sosfilt_q15_intended, ~250x faster; NumPy fallback inside)
        from tpu_sdr.kernels import native_q15

        ys, zflat = native_q15.sosfilt_q15_rows(sos64, flat, zflat)
        out = self._fft_jit(
            jnp.asarray(ys.reshape(*lead, -1, n)), bypass=False
        )
        out = dict(out)
        # FRAMED (*lead, F, n), matching the all-jit path's output contract.
        # These are HOST-side products — returned as NumPy, never shipped
        # to the device (each needless upload costs one tunnel round trip
        # per chunk; measured 100s of ms in degraded windows, which took
        # the filtered live mode from ~12 MSPS to 1.7)
        out["windowed_q15"] = xw.reshape(*lead, -1, n)
        out["filtered_q15"] = ys.reshape(*lead, -1, n)
        return out, zflat.reshape(*lead, self.cfg.n_sections, 2)

    def process(self, x_q15, zi=None, bypass: bool = False):
        """x_q15 (..., T) int16 (frame-aligned). Returns (out dict, zf).

        ``bypass``: window+FFT only (the reference's reset-default 0xB1
        mode) — only honored on the ``device_fft`` split path; the all-jit
        path always filters (its zf contract predates the flag).
        """
        if self.device_fft:
            return self._process_split(x_q15, zi, bypass)
        if self.sos_q is None:
            raise ValueError("upload_sos_q first")
        x = jnp.asarray(x_q15, jnp.int16)
        if x.ndim == 1:
            x = x[None, :]
        if zi is None:
            zi = jnp.zeros((*x.shape[:-1], self.cfg.n_sections, 2), jnp.int32)
        return self._jit(x, zi, jnp.asarray(self.sos_q, jnp.int32))
