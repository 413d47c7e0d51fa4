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
        self._fft_jit = jax.jit(
            self._window_fft, static_argnames=("bypass", "display")
        )

    def upload_sos_q(self, sos_x64: np.ndarray):
        """Quantized coefficients, int8 x64 (the wire format's payload)."""
        sos_x64 = np.atleast_2d(np.asarray(sos_x64))
        sos_q = biquad.pad_sos(
            sos_x64.astype(np.float64) / qf.COEFF_SCALE, self.cfg.n_sections
        ) * qf.COEFF_SCALE
        sos_q = np.rint(sos_q).astype(np.int32)
        if np.any(sos_q[:, 3] != qf.COEFF_SCALE):
            # The integer recurrence assumes a0 == 64 (the designer always
            # emits it; golden.sosfilt_q15_intended, the native C++ filter,
            # and the split path all reject anything else). Validate HERE
            # so the all-jit path can't silently produce non-faithful bits
            # for the same coefficients the split path raises on (review
            # finding).
            raise ValueError(
                f"a0 must be {qf.COEFF_SCALE} (x64 normalized) in every "
                f"section; got {sos_q[:, 3].tolist()}"
            )
        self.sos_q = sos_q

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

    def _window_fft(self, y_frames, *, bypass, display=False):
        """Device stage of the split path: [window +] integer FFT + decode.

        ``bypass=True``: y_frames are RAW q15 frames — window on device
        (elementwise) then FFT. ``bypass=False``: y_frames are already
        windowed+filtered on the host — FFT only.

        ``display=True`` adds a ``display_frame`` leaf: the LAST frame's
        [re, im, |X|] stacked into ONE (..., 3, N) f32 array (re/im are
        int16-exact in f32). Rationale (round-4 measurement,
        docs/measurements/q15_rate_r4.json): on the tunneled chip every
        host-initiated sync costs ~35 ms regardless of bytes, and the
        download link runs ~40-50 MB/s — so a live display consumer must
        pull its whole per-chunk product in ONE fetch of a small array,
        not three full-spectrum ones.
        """
        if bypass:
            y_frames = window.window_q15(y_frames, self.rom)
        fr_q, fi_q = fft_q15.fft_q15(y_frames)
        fr = fr_q.astype(jnp.float32)
        fi = fi_q.astype(jnp.float32)
        out = {
            "spectrum_re_q15": fr_q,
            "spectrum_im_q15": fi_q,
            "magnitude": jnp.sqrt(fr * fr + fi * fi),
        }
        if display:
            lf = fr[..., -1, :]
            li = fi[..., -1, :]
            out["display_frame"] = jnp.stack(
                [lf, li, jnp.sqrt(lf * lf + li * li)], axis=-2
            )
        return out

    def _process_split(self, x, zi, bypass, display=False):
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
                jnp.asarray(x.reshape(*lead, -1, n)), bypass=True,
                display=display,
            )
            return out, np.asarray(zi)
        # identical to process_async from here (review finding: this used
        # to be a line-for-line copy of it, incl. the transfer-discipline
        # rationale for returning the host products as NumPy)
        return self.process_async(x, zi, display=display)

    def _host_stage(self, x, zi):
        """The per-sample host half of the filtered split path: fused
        RTL window + saturating IIR in ONE native pass (round 4 — the
        separate vectorized-NumPy window cost ~17 ms per 1M-sample chunk,
        nearly the filter itself; the fused loop does both in ~the filter's
        time, bit-exact vs the two-pass form, tested). Returns
        (ys, xw, zf) as flat (R, T) rows + (R, S, 2) state."""
        n = self.cfg.fft_size
        x = np.asarray(x, np.int16)
        if x.ndim == 1:
            x = x[None, :]
        lead = x.shape[:-1]
        flat = x.reshape(-1, x.shape[-1])
        if zi is None:
            zi = np.zeros((*lead, self.cfg.n_sections, 2), np.int64)
        zflat = np.asarray(zi, np.int64).reshape(-1, self.cfg.n_sections, 2)
        sos64 = np.asarray(self.sos_q, np.int64)
        from tpu_sdr.kernels import native_q15

        ys, xw, zflat = native_q15.sosfilt_q15_window_rows(
            sos64, flat, self.rom_np.astype(np.int16), zflat,
            want_windowed=True,
        )
        return ys, xw, zflat

    def process_async(self, x_q15, zi=None, display: bool = False):
        """Filtered split path, device stage left IN FLIGHT.

        Runs the host stage (fused window+filter) synchronously, dispatches
        the device FFT, and returns ``(pending, zf)`` where ``pending`` is a
        dict whose spectrum leaves are un-fetched device arrays plus the
        host-side ``windowed_q15``/``filtered_q15`` products. The caller
        overlaps further host work with the device stage and materializes
        when ready (``np.asarray``). ``Q15Stream`` packages the pattern.
        """
        if not self.device_fft:
            raise ValueError("process_async requires device_fft=True")
        if self.sos_q is None:
            raise ValueError("upload_sos_q first")
        n = self.cfg.fft_size
        x = np.asarray(x_q15, np.int16)
        if x.ndim == 1:
            x = x[None, :]
        lead = x.shape[:-1]
        ys, xw, zflat = self._host_stage(x, zi)
        out = dict(
            self._fft_jit(
                jnp.asarray(ys.reshape(*lead, -1, n)), bypass=False,
                display=display,
            )
        )
        out["windowed_q15"] = xw.reshape(*lead, -1, n)
        out["filtered_q15"] = ys.reshape(*lead, -1, n)
        return out, zflat.reshape(*lead, self.cfg.n_sections, 2)

    def process(
        self, x_q15, zi=None, bypass: bool = False, display: bool = False
    ):
        """x_q15 (..., T) int16 (frame-aligned). Returns (out dict, zf).

        ``bypass``: window+FFT only (the reference's reset-default 0xB1
        mode) — only honored on the ``device_fft`` split path; the all-jit
        path always filters (its zf contract predates the flag).
        ``display``: split path only — adds the single-fetch
        ``display_frame`` leaf (see ``_window_fft``).
        """
        if self.device_fft:
            return self._process_split(x_q15, zi, bypass, display)
        if self.sos_q is None:
            raise ValueError("upload_sos_q first")
        x = jnp.asarray(x_q15, jnp.int16)
        if x.ndim == 1:
            x = x[None, :]
        if zi is None:
            zi = jnp.zeros((*x.shape[:-1], self.cfg.n_sections, 2), jnp.int32)
        return self._jit(x, zi, jnp.asarray(self.sos_q, jnp.int32))


class Q15Stream:
    """Double-buffered live driver for the filtered faithful mode.

    The FPGA's filter never stalls its FFT (``imp/filter_iir12.vhd:38-137``
    — a free-running 1-sample pipeline); the r3 split path DID stall: host
    window -> host filter -> upload -> device FFT -> fetch, strictly
    sequential, measured 4.7 MSPS while its slowest component ran 45+.
    This runner restores the overlap with a depth-1 pipeline:

      * a single worker thread runs chunk k+1's host stage (the fused
        native window+filter — C code, GIL released) while the main thread
        uploads/dispatches chunk k and fetches chunk k-1;
      * filter state threads through the worker in submission order, so
        the output stream is bit-identical to sequential ``process()``
        calls (tested);
      * ``push(chunk)`` returns the COMPLETED result for the oldest
        in-flight chunk (None until the pipeline holds ``depth`` chunks);
        ``flush()`` drains one tail chunk per call, oldest first.
      * ``depth`` (default 1): chunks in flight. Deeper pipelines give
        the tunnel's transfer scheduler more slack — by fetch time the
        result finished long ago, so the fetch pays transfer cost, not
        completion wait — at the price of depth x chunk latency.

    Steady-state rate = max(host stage, upload+dispatch+fetch) instead of
    their sum.

    Error semantics (review finding): a chunk that fails in the worker
    (bad length, device error) surfaces on the NEXT ``push``/``flush`` —
    the call that would have returned its result — as the original
    exception; the internal chain is then poisoned and every later call
    re-raises until ``reset()`` is called, which discards the failed tail
    and resumes from ``self.zf``, the state after the last chunk that
    completed its host stage. The common shape mistake (length not a
    multiple of fft_size) is validated synchronously in ``push`` so it
    never poisons the chain.
    """

    def __init__(
        self, pipe: Q15Pipeline, fetch=("magnitude",), display: bool = False,
        depth: int = 1,
    ):
        if not pipe.device_fft:
            raise ValueError("Q15Stream requires Q15Pipeline(device_fft=True)")
        if depth < 1:
            raise ValueError("depth must be >= 1")
        import collections
        import concurrent.futures

        self.pipe = pipe
        self.fetch = tuple(fetch)
        self.display = bool(display)
        self.depth = int(depth)
        self._pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
        self._pending = collections.deque()  # futures, oldest first
        self.zf = None  # state after the newest successful host stage

    def _materialize(self, fut):
        out, zf = fut.result()
        done = dict(out)
        for k in self.fetch:
            done[k] = np.asarray(out[k])
        return done, zf

    def push(self, x_q15):
        """Feed one frame-aligned chunk; returns the completed (out, zf) of
        the PREVIOUS chunk, or None while the pipeline fills."""
        t = np.asarray(x_q15).shape[-1]
        if t % self.pipe.cfg.fft_size:
            raise ValueError(
                f"chunk length {t} must be a multiple of "
                f"fft_size={self.pipe.cfg.fft_size}"
            )
        # Defensive copy: the host stage runs LATER on the worker thread
        # over this buffer, and np.asarray is no-copy for contiguous int16
        # — a caller that refills one chunk buffer in place would race the
        # worker and tear samples, silently breaking the bit-identical
        # contract (review finding).
        x_q15 = np.array(x_q15, copy=True)
        zi = self.zf
        # State must thread chunk-to-chunk: the host stage is sequential.
        # The single worker executes submissions in order, so chaining
        # through the previous future costs nothing and never deadlocks.
        prev = self._pending[-1] if self._pending else None

        def run(x=x_q15, prev_fut=prev, zi0=zi):
            if prev_fut is not None:
                _, z = prev_fut.result()  # ordered: worker is single-thread
            else:
                z = zi0
            res = self.pipe.process_async(x, z, display=self.display)
            # Continuously advance the resume point (worker thread; the
            # GIL makes the attribute store atomic). reset() restarts
            # from here after a poisoned chain.
            self.zf = res[1]
            return res

        self._pending.append(self._pool.submit(run))
        if len(self._pending) <= self.depth:
            return None
        return self._materialize(self._pending.popleft())

    def flush(self):
        """Drain ONE in-flight chunk, oldest first (None when empty) —
        call repeatedly to empty a depth>1 pipeline."""
        if not self._pending:
            return None
        return self._materialize(self._pending.popleft())

    def reset(self):
        """Discard the in-flight tail and resynchronize deterministically.

        Not-yet-started chunks are cancelled (newest first, so the single
        ordered worker never reaches them); a chunk already running is
        waited out — its host stage still advances ``self.zf`` before we
        return. Without the wait, a reset() racing a still-in-flight
        SUCCESSFUL chunk left the resume point dependent on whether the
        abandoned chunk's host stage finished before or after the next
        push captured ``self.zf`` (advisor finding r4). After reset() the
        next ``push`` always resumes from the state after the last chunk
        whose host stage actually ran."""
        while self._pending:
            fut = self._pending.pop()  # newest first: cancel before started
            if not fut.cancel():
                try:
                    fut.result()
                except Exception:
                    pass  # the failed tail is exactly what reset() discards

    def close(self):
        self._pool.shutdown(wait=True)
