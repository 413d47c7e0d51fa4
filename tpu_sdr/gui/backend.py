"""GUI backend: analyzer + source + event fan-out (the Flask app's brain).

Replaces the reference's Flask/SocketIO + PyQt receiver plumbing
(``scripts/fft_analyzer_gui.py``) with a plain-threaded backend that any
front-end transport (our stdlib SSE server, or flask_socketio if installed)
can sit on. Event payloads keep the reference's vocabulary: ``frame_data``
carries magnitude + peak/FPS stats (``fft_analyzer_gui.py:439-455``),
``receiver_status`` carries command acknowledgements.
"""

from __future__ import annotations

import json
import queue
import threading
import time

import numpy as np

from tpu_sdr.control import SpectrumAnalyzer, designer as designer_mod
from tpu_sdr.core.config import CommMode, FilterMode, PipelineConfig
from tpu_sdr.runtime.measure import refine_peak


class GuiBackend:
    def __init__(
        self,
        analyzer: SpectrumAnalyzer | None = None,
        source=None,
        frames_per_dispatch: int = 2,
        display_fps: float = 30.0,
        display_points: int = 2048,
        pace: bool = False,
    ):
        from tpu_sdr.runtime.source import SyntheticSource

        self.sa = analyzer or SpectrumAnalyzer(PipelineConfig(channels=1))
        self.source = source or SyntheticSource(
            tones_hz=((100_000.0, 0.5), (250_000.0, 0.2)), noise=0.01
        )
        self.frames_per_dispatch = frames_per_dispatch
        self.display_fps = display_fps
        self.display_points = display_points
        self.pace = pace
        self.freq_range_khz = (0.0, self.sa.cfg.sample_rate / 2000.0)
        # display_mode: 'magnitude' | 'real' | 'imag' | 'power' — the
        # reference GUI's plot toggles (index.html:304-306)
        self.display_mode = "magnitude"
        # Display calibration: the FPGA GUI plots magnitudes of the int16
        # wire words, which carry the xfft default 1/N scaling
        # (ip/xfft_0/xfft_0.xci; the RTL never writes s_axis_config,
        # dsp_system_top.vhd:534-536). Our pipeline plots float spectra, so
        # we apply XFFT_WIRE_SCALE (= 2^15/N = 2.0) to display in the same
        # wire-LSB units a GUI calibrated against the FPGA would read.
        # Set to 1.0 for raw float units.
        from tpu_sdr.transport.framing import XFFT_WIRE_SCALE

        self.wire_calibration = float(XFFT_WIRE_SCALE)
        self.filter_config = {
            "kind": "butterworth",
            "btype": "lowpass",
            "order": 4,
            "cutoff_hz": 100_000.0,
            "cutoff2_hz": 200_000.0,
            "ripple_db": 1.0,
            "attenuation_db": 60.0,
        }
        from tpu_sdr.runtime.waterfall import Waterfall

        self.waterfall = Waterfall(points=512, depth=160)
        self.waterfall_enabled = True
        # Display detector (bucketed decimation mode) for the waterfall row:
        # peak | minpeak | avg | rms | sample.
        self.detector = "peak"
        # Peak-hold / EMA-average trace overlays (classic analyzer detector
        # modes) computed over the decimated display vector; reset whenever
        # the display signature (mode/range/points) changes.
        self.traces_enabled = False
        self.trace_alpha = 0.2
        self._trace_sig = None
        self._trace_peak = None
        self._trace_avg = None
        # Band-power trigger (classic analyzer capture): 'normal' shows
        # only frames whose in-band peak level crosses the threshold;
        # 'single' freezes on the first crossing until re-armed.
        self.trigger_cfg = {
            "enabled": False,
            "mode": "single",  # 'single' | 'normal'
            "f_lo_khz": 0.0,
            "f_hi_khz": 500.0,
            "threshold_db": -20.0,
        }
        self._trigger_armed = True
        # raw-sample capture (runtime/recorder): armed from the HTTP
        # thread, appended from the acquisition loop
        self._recorder = None
        self._record_path = None
        # Live audio demod (runtime/receiver): a Receiver tees every raw
        # chunk; the demodulated audio accumulates in a bounded ring the
        # save_audio route writes to WAV.
        self.audio_cfg = {
            "enabled": False,
            "center_khz": 100.0,
            "mode": "wbfm",
            "max_seconds": 30.0,
            "stereo": False,
        }
        self._audio_rt = None
        # Raw-sample ring for on-demand band scans (POST /api/scan), burst
        # demodulation, and RDS decode: the acquisition loop keeps the last
        # ~2 s of channel-0 samples (RDS needs ~1 s per PS name cycle).
        self._scan_ring = np.zeros(0, np.float32)
        self._scan_ring_len = 0  # set from cfg on first append
        # Blind IQ imbalance correction on complex sources
        # (update_config {"iq_correction": true}); no-op for real input.
        self.iq_correction = False
        self._iqcorr_rt = None  # (IQCorrector, state)
        # Zoom mode: PFB-channelize the raw stream and run a small spectrum
        # pipeline on ONE subchannel (the zoom-FFT workflow, demo_zoom.py).
        # m/taps/fft_size are fixed per session; channel is live-switchable.
        self.zoom_cfg = {
            "enabled": False,
            "mode": "pfb",  # 'pfb' (subchannel grid) | 'ddc' (any center)
            "channel": 32,
            "center_hz": 250_000.0,
            "decimation": 128,
            "m": 128,
            "taps": 8,
            "fft_size": 1024,
        }
        self._zoom_gen = 0
        self._zoom_rt: dict | None = None
        self._subscribers: list[queue.Queue] = []
        self._sub_lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._last_emit = 0.0
        self._fps_window: list[float] = []

    # ---------------- event fan-out ----------------

    def subscribe(self) -> queue.Queue:
        q: queue.Queue = queue.Queue(maxsize=8)
        with self._sub_lock:
            self._subscribers.append(q)
        return q

    def unsubscribe(self, q: queue.Queue):
        with self._sub_lock:
            if q in self._subscribers:
                self._subscribers.remove(q)

    def emit(self, event: str, payload: dict):
        msg = (event, json.dumps(payload))
        with self._sub_lock:
            subs = list(self._subscribers)
        for q in subs:
            try:
                q.put_nowait(msg)
            except queue.Full:
                pass  # slow client: drop (display data is disposable)

    def status(self, message: str, ok: bool = True):
        self.emit("receiver_status", {"ok": ok, "message": message})

    # ---------------- acquisition loop ----------------

    def start_receiver(self):
        # (Re)arm acquisition even if the loop thread survived a reset —
        # 0xFF stops the analyzer but not the thread (the thread just idles),
        # and 0x55 must always restart acquisition.
        self.sa.start()
        if self._thread is not None and self._thread.is_alive():
            self.status("receiver already running")
            return
        self._stop.clear()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        self.status("receiver started")

    def stop_receiver(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=3.0)
            self._thread = None
        self.sa.stop()
        self.status("receiver stopped")

    def _loop(self):
        try:
            self._loop_inner()
        except Exception as e:  # surface, don't die silently
            self.status(f"receiver loop error: {type(e).__name__}: {e}", ok=False)
            raise

    def _loop_inner(self):
        n = self.sa.cfg.fft_size
        chunk = self.frames_per_dispatch * n
        while not self._stop.is_set():
            x = self.source.read(chunk, pace=self.pace)
            self._iq = bool(np.iscomplexobj(x))
            if self.iq_correction and self._iq:
                try:
                    x = self._iq_correct(x)
                except Exception as e:  # never kill acquisition
                    self.iq_correction = False
                    self._iqcorr_rt = None
                    self.status(
                        f"iq correction disabled after error: "
                        f"{type(e).__name__}: {e}", ok=False)
            rec = self._recorder  # snapshot: HTTP thread swaps it
            if rec is not None:
                try:
                    rec.append(np.atleast_2d(x))
                except ValueError as e:  # closed/shape flip: drop cleanly
                    self._recorder = None
                    self.status(f"recording stopped: {e}", ok=False)
            # snapshot the mode once per iteration: it can be flipped from
            # the HTTP thread between the request and the decode otherwise
            # (the snapshot is threaded through _emit_frame too)
            mode = self.display_mode
            # request only what the mode needs (phase/re/im for modes that
            # never display them would be wasted device work per dispatch)
            want = {
                "magnitude": "magnitude",
                "power": "power",
                "real": "complex",
                "imag": "complex",
            }[mode]
            out = self.sa.process(x, outputs=want)
            if out is None:
                time.sleep(0.01)
                continue
            if mode == "magnitude":
                disp = np.asarray(out["magnitude"])[0, -1]
                wf_mag = disp
            elif mode == "power":
                disp = np.asarray(out["power"])[0, -1]
                wf_mag = np.sqrt(disp)
            else:  # real / imag from the complex spectra
                re = np.asarray(out["re"])[0, -1]
                im = np.asarray(out["im"])[0, -1]
                disp = re if mode == "real" else im
                wf_mag = np.hypot(re, im)
            # hardware wire-LSB calibration (see __init__.wire_calibration)
            cal = self.wire_calibration
            if cal != 1.0:
                disp = disp * (cal * cal if mode == "power" else cal)
                wf_mag = wf_mag * cal
            now = time.monotonic()
            self._fps_window = [t for t in self._fps_window + [now] if now - t < 1.0]
            # zoom taps EVERY raw chunk (it accumulates subchannel samples
            # across iterations) — before the display rate limiter
            if self.zoom_cfg["enabled"]:
                try:
                    self._zoom_step(x)
                except Exception as e:  # zoom must never kill acquisition
                    self.zoom_cfg["enabled"] = False
                    self._zoom_rt = None
                    self.status(
                        f"zoom disabled after error: {type(e).__name__}: {e}",
                        ok=False,
                    )
            # scan ring: keep the newest ~0.5 s of raw channel-0 samples
            xr = x[0] if getattr(x, "ndim", 1) > 1 else x
            if self._scan_ring.dtype != xr.dtype:
                self._scan_ring = np.zeros(0, xr.dtype)  # real<->IQ flip
            if not self._scan_ring_len:
                self._scan_ring_len = int(2.0 * self.sa.cfg.sample_rate)
            self._scan_ring = np.concatenate(
                [self._scan_ring, np.asarray(xr)])[-self._scan_ring_len:]
            # audio demod taps every raw chunk too (carried receiver state)
            if self.audio_cfg["enabled"]:
                try:
                    self._audio_step(x)
                except Exception as e:  # audio must never kill acquisition
                    self.audio_cfg["enabled"] = False
                    self._audio_rt = None
                    self.status(
                        f"audio disabled after error: {type(e).__name__}: {e}",
                        ok=False,
                    )
            # trigger gate: evaluated per dispatch, BEFORE the rate limiter
            trig = dict(self.trigger_cfg)  # snapshot (HTTP thread mutates)
            triggered = False
            force_emit = False  # only single-shot's ONE frame skips the limiter
            if trig["enabled"]:
                level = self._band_level_db(wf_mag, trig)
                fired = level >= trig["threshold_db"]
                if trig["mode"] == "single":
                    if not (self._trigger_armed and fired):
                        continue  # frozen (or waiting): hold the display
                    self._trigger_armed = False
                    triggered = force_emit = True
                    self.status(
                        f"triggered at {level:.1f} dB "
                        f"({trig['f_lo_khz']:g}-{trig['f_hi_khz']:g} kHz); "
                        "display frozen until re-arm"
                    )
                else:  # normal: only show crossing frames (rate-limited)
                    if not fired:
                        continue
                    triggered = True
            if not force_emit and now - self._last_emit < 1.0 / self.display_fps:
                continue
            self._last_emit = now
            try:
                self._emit_frame(disp, mode, triggered=triggered)
                if self.waterfall_enabled:
                    self._emit_waterfall_row(wf_mag)
            except Exception as e:  # display errors must not kill acquisition
                self.status(
                    f"display error: {type(e).__name__}: {e}", ok=False
                )

    def _band_level_db(self, mag: np.ndarray, trig: dict) -> float:
        """Peak in-band level (dB of the magnitude row) for the trigger —
        the same dB axis the display shows. The band is [f_lo, f_hi] kHz;
        IQ streams evaluate BOTH sidebands (|f| in the band), unlike the
        display crop which is deliberately symmetric-from-DC."""
        n = self.sa.cfg.fft_size
        fs = self.sa.cfg.sample_rate
        lo_b = trig["f_lo_khz"] * 1e3 * n / fs
        hi_b = trig["f_hi_khz"] * 1e3 * n / fs
        if getattr(self, "_iq", False):
            view = np.fft.fftshift(mag)
            c = n // 2
            level = 0.0
            for a, b in (
                (c + lo_b, c + hi_b),  # positive sideband
                (c - hi_b, c - lo_b),  # negative sideband
            ):
                a = int(np.clip(a, 0, n - 2))
                b = int(np.clip(b, a + 1, n))
                level = max(level, float(np.max(view[a:b])))
        else:
            lo = int(np.clip(lo_b, 0, n // 2 - 1))
            hi = int(np.clip(hi_b, lo + 1, n // 2))
            level = float(np.max(mag[lo:hi]))
        return float(20.0 * np.log10(max(level, 1e-30)))

    def start_record(self, max_seconds: float = 60.0) -> dict:
        """Arm raw-sample capture into ./captures/ (ring-bounded)."""
        import os
        import time as _t

        from tpu_sdr.runtime.recorder import SampleRecorder

        if self._recorder is not None:
            raise ValueError("already recording; stop_record first")
        fs = self.sa.cfg.sample_rate
        max_seconds = float(np.clip(float(max_seconds), 0.1, 600.0))
        os.makedirs("captures", exist_ok=True)
        path = os.path.join(
            "captures", _t.strftime("capture_%Y%m%d_%H%M%S.npy")
        )
        self._record_path = path
        self._recorder = SampleRecorder(
            path, fs=fs, max_samples=int(max_seconds * fs)
        )
        self.status(f"recording to {path} (last {max_seconds:g}s kept)")
        return {"ok": True, "path": path}

    def stop_record(self) -> dict:
        """Finalize the capture file; returns its metadata."""
        rec, self._recorder = self._recorder, None
        if rec is None:
            raise ValueError("not recording")
        try:
            meta = rec.close()
        except ValueError as e:  # nothing recorded yet
            self.status(f"recording discarded: {e}", ok=False)
            return {"ok": False, "error": str(e)}
        self.status(
            f"capture saved: {self._record_path} "
            f"({meta['samples']} samples @ {meta['fs']:g} Hz)"
        )
        return {"ok": True, "path": self._record_path, **meta}

    def set_trigger(self, cfg: dict) -> dict:
        """Configure the band-power trigger; {'rearm': true} re-arms a
        fired single-shot trigger. Validates atomically."""
        known = {"enabled", "mode", "f_lo_khz", "f_hi_khz", "threshold_db",
                 "rearm"}
        unknown = sorted(set(cfg) - known)
        if unknown:
            self.status(f"ignored unknown trigger fields: {unknown}", ok=False)
        updates = {}
        if "mode" in cfg:
            m = str(cfg["mode"]).lower()
            if m not in ("single", "normal"):
                raise ValueError(f"trigger mode must be single|normal; got {m!r}")
            updates["mode"] = m
        if "f_lo_khz" in cfg or "f_hi_khz" in cfg:
            lo = float(cfg.get("f_lo_khz", self.trigger_cfg["f_lo_khz"]))
            hi = float(cfg.get("f_hi_khz", self.trigger_cfg["f_hi_khz"]))
            if not (0 <= lo < hi):
                raise ValueError(f"need 0 <= f_lo < f_hi; got [{lo}, {hi}] kHz")
            updates["f_lo_khz"], updates["f_hi_khz"] = lo, hi
        if "threshold_db" in cfg:
            updates["threshold_db"] = float(cfg["threshold_db"])
        if "enabled" in cfg:
            updates["enabled"] = bool(cfg["enabled"])
        was_enabled = self.trigger_cfg["enabled"]
        self.trigger_cfg.update(updates)
        # re-arm on explicit request or an off->on TRANSITION only — the UI
        # resends enabled=true on every field tweak, which must not quietly
        # overwrite a frozen single-shot capture
        if cfg.get("rearm") or (updates.get("enabled") and not was_enabled):
            self._trigger_armed = True
        state = "armed" if self._trigger_armed else "fired"
        if self.trigger_cfg["enabled"]:
            self.status(
                f"trigger {self.trigger_cfg['mode']} {state}: "
                f"{self.trigger_cfg['f_lo_khz']:g}-"
                f"{self.trigger_cfg['f_hi_khz']:g} kHz "
                f">= {self.trigger_cfg['threshold_db']:g} dB"
            )
        else:
            self.status("trigger off")
        return {
            "ok": True,
            "trigger": dict(self.trigger_cfg),
            "armed": self._trigger_armed,
        }

    def _emit_frame(
        self, mag: np.ndarray, mode: str | None = None, triggered: bool = False
    ):
        if mode is None:
            mode = self.display_mode
        n = self.sa.cfg.fft_size
        fs = self.sa.cfg.sample_rate
        lo_khz, hi_khz = self.freq_range_khz
        if getattr(self, "_iq", False):
            # IQ stream: single-sided spectrum is meaningless; show the full
            # fftshifted baseband (-fs/2..fs/2), freq range applied as +/-.
            view = np.fft.fftshift(
                np.abs(mag) if mode in ("real", "imag") else mag
            )
            base = -n // 2  # bin offset of view[0]
            lo = int(np.clip((n // 2) - hi_khz * 1000 * n / fs, 0, n - 2))
            hi = int(np.clip((n // 2) + hi_khz * 1000 * n / fs, lo + 1, n))
        else:
            view = (
                np.abs(mag[: n // 2])
                if mode in ("real", "imag")
                else mag[: n // 2]
            )
            base = 0
            lo = int(np.clip(lo_khz * 1000 * n / fs, 0, n // 2 - 1))
            hi = int(np.clip(hi_khz * 1000 * n / fs, lo + 1, n // 2))
        window = view[lo:hi]
        # Peak-preserving decimation for display (max-pool buckets).
        pts = min(self.display_points, hi - lo)
        edges = np.linspace(0, hi - lo, pts + 1).astype(int)
        dec = np.maximum.reduceat(window, edges[:-1])
        freqs_khz = (base + lo + edges[:-1] * 1.0) * fs / n / 1000.0
        peak = int(np.argmax(window))
        # sub-bin refinement of the peak marker (parabolic in dB) — the
        # reference GUI reports only the raw bin (fft_analyzer_gui.py:444)
        d, _ = refine_peak(window, peak)
        peak_interp_khz = float(base + lo + peak + d) * fs / n / 1000.0
        traces = {}
        if self.traces_enabled:
            # snapshot to locals: the HTTP thread may null these concurrently
            # (update_config/reset_plot); compute on locals, assign back once
            sig = (mode, getattr(self, "_iq", False), base, lo, hi, pts)
            pk, av = self._trace_peak, self._trace_avg
            if sig != self._trace_sig or pk is None or av is None:
                pk = dec.astype(np.float64)
                av = dec.astype(np.float64)
            else:
                pk = np.maximum(pk, dec)
                av = av + self.trace_alpha * (dec - av)
            self._trace_sig, self._trace_peak, self._trace_avg = sig, pk, av
            traces = {
                "trace_peak": np.round(pk, 4).tolist(),
                "trace_avg": np.round(av, 4).tolist(),
            }
        # one _fps_window stamp per dispatch; each dispatch carries
        # frames_per_dispatch frames
        incoming_fps = len(self._fps_window) * float(self.frames_per_dispatch)
        self.emit(
            "frame_data",
            {
                "freqs_khz": np.round(freqs_khz, 3).tolist(),
                "magnitude": np.round(dec.astype(np.float64), 4).tolist(),
                **traces,
                "peak_bin": (base + lo + peak) % n,
                "peak_freq_khz": (base + lo + peak) * fs / n / 1000.0,
                "peak_freq_interp_khz": round(peak_interp_khz, 4),
                "triggered": triggered,
                "peak_mag": float(window[peak]),
                "frames_received": self.sa.stats.frames_produced,
                "incoming_fps": round(self.sa.stats.frames_produced and incoming_fps, 2),
                "filter_mode": int(self.sa.filter_mode),
                "comm_mode": int(self.sa.comm_mode),
                "display_mode": mode,
            },
        )

    # ---------------- zoom mode (PFB subchannel -> zoom FFT) ----------

    def _zoom_runtime(self, iq: bool) -> dict:
        """Build (or rebuild after set_zoom/source-type change) the zoom
        chain: channelizer-or-DDC + small spectrum pipeline + states."""
        rt = self._zoom_rt
        if rt is not None and rt["gen"] == self._zoom_gen and rt["iq"] == iq:
            return rt
        from tpu_sdr.runtime import SpectrumPipeline

        zc = dict(self.zoom_cfg)  # snapshot: set_zoom can mutate mid-step
        nz = zc["fft_size"]
        fs = self.sa.cfg.sample_rate
        if zc["mode"] == "ddc":
            from tpu_sdr.kernels.ddc import DDC

            front = DDC(
                fs=fs, center_hz=zc["center_hz"], decimation=zc["decimation"]
            )
            # DDC batch excludes the plane axis (planes (2, T) <-> state (hist,))
            front_state = front.initial_state(())
            sub_rate = front.output_rate
            center_hz = zc["center_hz"]
        else:
            from tpu_sdr.kernels.pfb import Channelizer

            front = Channelizer(m=zc["m"], taps=zc["taps"], sample_rate=fs)
            front_state = front.initial_state((2,) if iq else ())
            sub_rate = fs / zc["m"]
            k = int(zc["channel"]) % zc["m"]
            center_hz = k * sub_rate
            if iq and center_hz > fs / 2:
                center_hz -= fs  # IQ subchannels wrap to negative freqs
        # 1024-pt zoom FFT = 32x32 four-step at the decimated rate
        pipe = SpectrumPipeline(
            PipelineConfig(
                fft_size=nz, fft_n1=32, fft_n2=32, channels=1,
                sample_rate=sub_rate,
            )
        )
        self._zoom_rt = {
            "gen": self._zoom_gen,
            "iq": iq,
            "cfg": zc,  # the config this runtime was BUILT for
            "sub_rate": sub_rate,
            "center_hz": center_hz,
            "front": front,
            "pipe": pipe,
            "front_state": front_state,
            "pipe_state": pipe.initial_state(batch_shape=(2,)),
            "buf": np.zeros(0, np.complex64),
            "raw": np.zeros(0, np.complex64 if iq else np.float32),
        }
        return self._zoom_rt

    @staticmethod
    def _run_front(rt: dict, arr: np.ndarray, iq: bool) -> dict:
        """Dispatch one chunk to the front-end (real vs IQ planes)."""
        if iq:
            planes = np.stack([arr.real, arr.imag]).astype(np.float32)
            out, rt["front_state"] = rt["front"].process_planes(
                planes, rt["front_state"]
            )
        else:
            out, rt["front_state"] = rt["front"].process(
                arr.astype(np.float32), rt["front_state"]
            )
        return out

    def _zoom_front(self, rt: dict, xn: np.ndarray, iq: bool) -> np.ndarray:
        """Run one raw chunk through the zoom front-end (PFB subchannel or
        DDC); returns the new complex baseband samples. Uses rt's BUILT
        config, never the live zoom_cfg (a set_zoom between runtime build
        and this call must not mismatch front object and branch)."""
        zc = rt["cfg"]
        if zc["mode"] == "ddc":
            # DDC consumes multiples of R; carry the remainder host-side
            r = zc["decimation"]
            buf = np.concatenate([rt["raw"], xn])
            take = (buf.shape[0] // r) * r
            rt["raw"] = buf[take:]
            if not take:
                return np.zeros(0, np.complex64)
            out = self._run_front(rt, buf[:take], iq)
            return (
                np.asarray(out["re"]) + 1j * np.asarray(out["im"])
            ).astype(np.complex64)
        k = int(zc["channel"]) % zc["m"]
        out = self._run_front(rt, xn, iq)
        return (
            np.asarray(out["re"])[..., k] + 1j * np.asarray(out["im"])[..., k]
        ).astype(np.complex64)

    def _zoom_step(self, x):
        """Channelize one raw chunk, accumulate the selected subchannel,
        and emit a ``zoom_frame`` per full zoom-FFT frame."""
        from tpu_sdr.core.config import FilterMode as FM

        xn = np.asarray(x).reshape(-1)  # single-stream tap
        iq = bool(np.iscomplexobj(xn))
        rt = self._zoom_runtime(iq)
        sub = self._zoom_front(rt, xn, iq)
        rt["buf"] = np.concatenate([rt["buf"], sub])
        nz = rt["cfg"]["fft_size"]
        while rt["buf"].shape[0] >= nz:
            frame, rt["buf"] = rt["buf"][:nz], rt["buf"][nz:]
            zout, rt["pipe_state"] = rt["pipe"].process(
                frame[None, :], rt["pipe_state"], FM.BYPASS
            )
            self._emit_zoom_frame(rt, np.asarray(zout["magnitude"])[0, -1])

    def _emit_zoom_frame(self, rt: dict, mag: np.ndarray):
        zc = rt["cfg"]
        nz = zc["fft_size"]
        sub_rate, center_hz = rt["sub_rate"], rt["center_hz"]
        view = np.fft.fftshift(mag)  # subchannel stream is complex baseband
        offs = (np.arange(nz) - nz // 2) * (sub_rate / nz)
        peak = int(np.argmax(view))
        self.emit(
            "zoom_frame",
            {
                "mode": zc["mode"],
                "channel": int(zc["channel"]) % zc["m"],
                "center_khz": round(center_hz / 1e3, 3),
                "span_hz": sub_rate,
                "hz_per_bin": sub_rate / nz,
                "offsets_hz": np.round(offs, 2).tolist(),
                "magnitude": np.round(view.astype(np.float64), 4).tolist(),
                "peak_offset_hz": round(float(offs[peak]), 2),
                "peak_freq_khz": round((center_hz + offs[peak]) / 1e3, 4),
                "peak_mag": float(view[peak]),
            },
        )

    def _iq_correct(self, x: np.ndarray) -> np.ndarray:
        """Run the blind image-rejection corrector over a complex chunk
        (carried state; lazily built for the chunk's batch shape)."""
        from tpu_sdr.kernels.iqcorr import IQCorrector

        xn = np.asarray(x)
        batch = xn.shape[:-1]
        if self._iqcorr_rt is None or (
            tuple(np.shape(self._iqcorr_rt[1].power)) != batch
        ):
            corr = IQCorrector()
            self._iqcorr_rt = (corr, corr.initial_state(batch))
        corr, st = self._iqcorr_rt
        t = xn.shape[-1] - xn.shape[-1] % corr.block
        if not t:
            return x
        wre, wim, st = corr.process(
            xn.real[..., :t].astype(np.float32),
            xn.imag[..., :t].astype(np.float32), st)
        self._iqcorr_rt = (corr, st)
        out = np.asarray(wre) + 1j * np.asarray(wim)
        if t < xn.shape[-1]:  # pass the sub-block tail through uncorrected
            out = np.concatenate([out, xn[..., t:]], axis=-1)
        return out.astype(np.complex64)

    # ---------------- on-demand band scan ---------------------------------

    def scan_band(self, cfg: dict) -> dict:
        """Run a SpectrumScanner sweep over the raw-sample ring:
        {'start_khz', 'stop_khz', 'bw_khz', 'threshold_db'}. Returns the
        hits (strongest first) + the full per-channel table."""
        from tpu_sdr.runtime.scanner import SpectrumScanner

        fs = self.sa.cfg.sample_rate
        # snapshot (the acquisition thread swaps the ring); the newest
        # 0.5 s is plenty for occupancy and bounds the sweep's cost now
        # that the ring holds ~2 s for RDS
        ring = self._scan_ring[-int(0.5 * fs):]
        if ring.size < int(0.05 * fs):
            raise ValueError(
                "scan ring has too few samples; start the receiver and retry")
        iq = bool(np.iscomplexobj(ring))
        lo = float(cfg.get("start_khz", -fs / 2e3 if iq else 0.0)) * 1e3
        hi = float(cfg.get("stop_khz", fs / 2e3 if iq else fs / 2e3)) * 1e3
        bw = float(cfg.get("bw_khz", 25.0)) * 1e3
        thr = float(cfg.get("threshold_db", 10.0))
        sc = SpectrumScanner(fs, lo, hi, channel_bw=bw, threshold_db=thr)
        if iq:
            planes = np.stack([ring.real, ring.imag]).astype(np.float32)
            res = sc.scan_planes(planes)
        else:
            res = sc.scan(ring.astype(np.float32))
        self.status(
            f"scan: {len(res.hits)} of {sc.n_channels} channels occupied "
            f"(floor {res.noise_floor_db:.1f} dB)")
        return {
            "ok": True,
            "n_channels": sc.n_channels,
            "channel_bw_khz": bw / 1e3,
            "noise_floor_db": round(res.noise_floor_db, 1),
            "centers_khz": np.round(res.centers_hz / 1e3, 1).tolist(),
            "power_db": np.round(res.power_db, 1).tolist(),
            "occupied": res.occupied.tolist(),
            "hits": [
                {
                    "center_khz": round(h["center_hz"] / 1e3, 1),
                    "power_db": round(h["power_db"], 1),
                    "snr_db": round(h["snr_db"], 1),
                }
                for h in res.hits
            ],
        }

    def demod_burst(self, cfg: dict) -> dict:
        """Demodulate a digital burst from the live raw-sample ring or a
        ``.npy`` capture: {'scheme' (bpsk|qpsk|qam16|2fsk|4fsk), 'bits',
        'sps', 'center_khz', 'path', 'max_lag_syms', 'symbol_rate_khz',
        'deviation_khz'}. Returns the recovered payload bits as hex, the
        sync estimates, and (linear schemes) decimated payload
        constellation points for plotting."""
        from tpu_sdr.kernels.digital import BurstModem, FSKModem

        scheme = str(cfg.get("scheme", "qpsk"))
        n_bits = int(cfg.get("bits", 0))
        if n_bits < 1:
            raise ValueError("bits must be a positive payload bit count")
        fs = self.sa.cfg.sample_rate
        path = cfg.get("path")
        if path:
            from tpu_sdr.runtime.source import FileSource

            src = FileSource(str(path), fs=fs)
            x = np.asarray(src.data[0])
            fs = src.fs
        else:
            # snapshot the newest second (bounds the demod's cost now
            # that the ring holds ~2 s for RDS)
            x = self._scan_ring[-int(fs):]
            if x.size < 1024:
                raise ValueError(
                    "raw-sample ring has too few samples; start the "
                    "receiver and retry (or pass a capture 'path')")
        z = x if np.iscomplexobj(x) else x.astype(np.complex128)
        center = float(cfg.get("center_khz", 0.0)) * 1e3
        if center:
            z = z * np.exp(-2j * np.pi * center / fs * np.arange(z.size))
        re = z.real.astype(np.float32)
        im = z.imag.astype(np.float32)
        extra: dict = {}
        if scheme in ("2fsk", "4fsk"):
            modem = FSKModem(
                fs=fs,
                symbol_rate=float(cfg.get("symbol_rate_khz", 125.0)) * 1e3,
                deviation_hz=float(cfg.get("deviation_khz", 250.0)) * 1e3,
                levels=2 if scheme == "2fsk" else 4)
            out = modem.demodulate(re, im, n_bits)
            extra["offset_samples"] = int(out["offset"])
        else:
            modem = BurstModem(
                scheme, sps=int(cfg.get("sps", 8)),
                max_lag_syms=int(cfg.get("max_lag_syms", 16)))
            out = modem.demodulate(re, im, n_bits)
            extra.update(
                frame_lag_syms=int(out["frame_lag"]),
                timing_samples=round(float(out["timing"]), 3),
                cfo_cyc_per_sym=float(out["cfo"]),
                phase_rad=round(float(out["phase"]), 3))
            sr = np.asarray(out["symbols"][0]).reshape(-1)
            si = np.asarray(out["symbols"][1]).reshape(-1)
            k = max(1, sr.size // 512)
            extra["constellation"] = {
                "re": np.round(sr[::k], 4).tolist(),
                "im": np.round(si[::k], 4).tolist()}
        bits = np.asarray(out["bits"]).reshape(-1)
        padn = (-bits.size) % 8
        hexstr = np.packbits(
            np.concatenate([bits, np.zeros(padn, np.uint8)])).tobytes().hex()
        self.status(f"burst: {scheme} {n_bits} bits demodulated")
        return {"ok": True, "scheme": scheme, "n_bits": n_bits,
                "bits_hex": hexstr, **extra}

    def rds_decode(self, cfg: dict) -> dict:
        """Decode RDS from the live raw-sample ring or a ``.npy``
        capture: {'center_khz' (FM carrier), 'path', 'deviation_khz'}.
        Chain: DDC to the carrier -> quadrature discriminator (raw MPX)
        -> `kernels.rds.RDSDecoder`. Returns PI/PS/RadioText and block
        statistics; partial fields show as '_' until enough groups
        arrive (the ring holds ~2 s)."""
        from tpu_sdr.kernels.ddc import DDC
        from tpu_sdr.kernels.demod import FMDemodulator
        from tpu_sdr.kernels.rds import RDSDecoder

        fs = self.sa.cfg.sample_rate
        path = cfg.get("path")
        if path:
            from tpu_sdr.runtime.source import FileSource

            src = FileSource(str(path), fs=fs)
            x = np.asarray(src.data[0])
            fs = src.fs
        else:
            x = self._scan_ring  # snapshot: acquisition thread swaps it
            if x.size < int(0.2 * fs):
                raise ValueError(
                    "raw-sample ring has too few samples; start the "
                    "receiver and retry (or pass a capture 'path')")
        # pick an MPX rate that reaches the 19 kHz bit grid (>= 114 kHz
        # so the 57 kHz subcarrier survives) with the CHEAPEST rational
        # resample — phase count drives the resampler's trace size
        dec = None
        for r in range(int(fs // 114_000), 0, -1):
            try:
                cand = RDSDecoder(fs / r)
            except ValueError:
                continue
            up = 1 if cand.resamp is None else cand.resamp.up
            if dec is None or up < best_up:
                dec, best_up = cand, up
        if dec is None:
            raise ValueError(f"no RDS-capable decimation from fs={fs}")
        center = float(cfg.get("center_khz", 100.0)) * 1e3
        ddc = DDC(fs, center_hz=center, decimation=int(round(fs / dec.fs)),
                  taps_per_phase=12)
        iq = bool(np.iscomplexobj(x))
        t = (x.shape[-1] // (ddc.r * 128)) * (ddc.r * 128)
        if iq:
            planes = np.stack([x.real, x.imag])[:, :t].astype(np.float32)
            bb, _ = ddc.process_planes(planes, ddc.initial_state())
        else:
            bb, _ = ddc.process(x[:t].astype(np.float32),
                                ddc.initial_state())
        fm = FMDemodulator(
            dec.fs, deviation_hz=float(cfg.get("deviation_khz", 75.0)) * 1e3,
            deemphasis_tau=None)
        mpx, _ = fm.process(bb["re"], bb["im"], fm.initial_state())
        res = dec.decode(np.asarray(mpx))
        if res.pi is None:
            self.status("rds: no groups decoded", ok=False)
        else:
            self.status(f"rds: PI={res.pi:04X} PS={res.ps_name!r}")
        return {
            "ok": True,
            "pi": None if res.pi is None else f"{res.pi:04X}",
            "pty": res.pty,
            "tp": res.tp,
            "ps": res.ps_name,
            "radiotext": res.radiotext,
            "groups": res.groups,
            "n_blocks": res.n_blocks,
            "block_error_rate": round(res.block_error_rate, 4),
        }

    # ---------------- live audio demod (the 'listen' feature) -------------

    def _audio_step(self, x):
        """Tee one raw chunk into the receiver; accumulate demodulated
        audio in the bounded ring (newest kept)."""
        rt = self._audio_rt
        if rt is None:
            return
        xn = np.asarray(x)
        if xn.ndim > 1:
            xn = xn[0]  # listen to channel 0 of multi-channel sources
        iq = bool(np.iscomplexobj(xn))
        if iq != rt["iq"]:
            raise ValueError("source real/IQ type changed; re-enable audio")
        buf = np.concatenate([rt["raw"], xn])
        g = rt["rx"].chunk_granularity
        take = (buf.shape[0] // g) * g
        rt["raw"] = buf[take:]
        if not take:
            return
        seg = buf[:take]
        if iq:
            planes = np.stack([seg.real, seg.imag]).astype(np.float32)
            audio, rt["state"] = rt["rx"].process_planes(planes, rt["state"])
        else:
            audio, rt["state"] = rt["rx"].process(
                seg.astype(np.float32), rt["state"])
        ring = np.concatenate(
            [rt["audio"], np.asarray(audio, np.float32)], axis=-1)
        rt["audio"] = ring[..., -rt["max_samples"]:]

    def set_audio(self, cfg: dict) -> dict:
        """Enable/disable the live receiver: {'enabled', 'center_khz',
        'mode' (wbfm|nbfm|am|usb|lsb), 'max_seconds'}. Enabling (re)builds
        the receiver and clears the audio ring."""
        from tpu_sdr.runtime.receiver import MODES, Receiver

        known = {"enabled", "center_khz", "mode", "max_seconds", "stereo"}
        unknown = sorted(set(cfg) - known)
        ac = dict(self.audio_cfg)
        if "center_khz" in cfg:
            ac["center_khz"] = float(cfg["center_khz"])
        if "mode" in cfg:
            mode = str(cfg["mode"]).lower()
            if mode not in MODES:
                raise ValueError(f"mode must be one of {MODES}; got {mode!r}")
            ac["mode"] = mode
        if "max_seconds" in cfg:
            ac["max_seconds"] = float(np.clip(float(cfg["max_seconds"]), 1, 600))
        if "stereo" in cfg:
            ac["stereo"] = bool(cfg["stereo"])
        if "enabled" in cfg:
            ac["enabled"] = bool(cfg["enabled"])
        if ac["stereo"] and ac["mode"] != "wbfm":
            raise ValueError("stereo decoding is a wbfm feature")
        self.audio_cfg = ac
        if ac["enabled"]:
            rx = Receiver(
                fs=self.sa.cfg.sample_rate,
                center_hz=ac["center_khz"] * 1e3,
                mode=ac["mode"],
                stereo=ac["stereo"],
            )
            rate = float(rx.realized_audio_rate)
            self._audio_rt = {
                "rx": rx,
                "state": rx.initial_state(),
                "iq": bool(getattr(self, "_iq", False)),
                "raw": np.zeros(
                    0,
                    np.complex64 if getattr(self, "_iq", False) else np.float32,
                ),
                "audio": np.zeros((2, 0) if ac["stereo"] else 0, np.float32),
                "rate": rate,
                "max_samples": int(ac["max_seconds"] * rate),
            }
            self.status(
                f"audio on: {ac['mode']}{' stereo' if ac['stereo'] else ''} "
                f"at {ac['center_khz']:g} kHz -> {rate:.0f} Hz audio")
        else:
            self._audio_rt = None
            self.status("audio off")
        if unknown:
            self.status(f"ignored unknown audio fields: {unknown}", ok=False)
        return {"ok": True, "audio": dict(self.audio_cfg)}

    def save_audio(self) -> dict:
        """Write the buffered audio ring to captures/audio_<ts>.wav."""
        import os
        import time as _t

        from tpu_sdr.runtime.receiver import write_wav

        rt = self._audio_rt
        if rt is None or rt["audio"].size == 0:
            raise ValueError("no audio buffered; enable audio first")
        os.makedirs("captures", exist_ok=True)
        path = os.path.join(
            "captures", _t.strftime("audio_%Y%m%d_%H%M%S.wav"))
        write_wav(path, rt["audio"], rt["rate"])
        seconds = rt["audio"].shape[-1] / rt["rate"]
        self.status(f"audio saved: {path} ({seconds:.1f} s)")
        return {"ok": True, "path": path, "seconds": round(seconds, 2),
                "rate": rt["rate"]}

    def set_zoom(self, cfg: dict) -> dict:
        """Enable/disable zoom, pick the front-end ('pfb' subchannel grid
        or 'ddc' arbitrary center), and its tuning; ``m``/``taps``/
        ``fft_size`` are session-fixed (traced shapes)."""
        known = {"enabled", "mode", "channel", "center_khz", "decimation"}
        unknown = sorted(set(cfg) - known)
        if unknown:
            self.status(f"ignored unknown zoom fields: {unknown}", ok=False)
        fs = self.sa.cfg.sample_rate
        # Validate everything BEFORE mutating (atomic, like update_config).
        updates = {}
        if "mode" in cfg:
            mode = str(cfg["mode"]).lower()
            if mode not in ("pfb", "ddc"):
                raise ValueError(f"zoom mode must be 'pfb' or 'ddc'; got {mode!r}")
            updates["mode"] = mode
        if "channel" in cfg:
            ch = int(cfg["channel"])
            if not (0 <= ch < self.zoom_cfg["m"]):
                raise ValueError(
                    f"zoom channel must be in [0, {self.zoom_cfg['m']})"
                )
            updates["channel"] = ch
        if "center_khz" in cfg:
            c = float(cfg["center_khz"]) * 1e3
            if not (-fs / 2 <= c <= fs / 2):
                raise ValueError(
                    f"zoom center must be within +/-{fs / 2e3:.0f} kHz"
                )
            updates["center_hz"] = c
        if "decimation" in cfg:
            r = int(cfg["decimation"])
            if not (2 <= r <= self.zoom_cfg["fft_size"] * 16):
                raise ValueError(f"zoom decimation out of range: {r}")
            updates["decimation"] = r
        if "enabled" in cfg:
            updates["enabled"] = bool(cfg["enabled"])
        self.zoom_cfg.update(updates)
        self._zoom_gen += 1  # rebuild states: any retune restarts clean
        zc = self.zoom_cfg
        if zc["enabled"]:
            if zc["mode"] == "ddc":
                sub_rate = fs / zc["decimation"]
                self.status(
                    f"zoom on (ddc): {zc['center_hz'] / 1e3:.1f} kHz, "
                    f"span {sub_rate / 1e3:.2f} kHz, "
                    f"{sub_rate / zc['fft_size']:.2f} Hz/bin"
                )
            else:
                sub_rate = fs / zc["m"]
                self.status(
                    f"zoom on: channel {zc['channel']} "
                    f"({zc['channel'] * sub_rate / 1e3:.1f} kHz, "
                    f"span {sub_rate / 1e3:.2f} kHz, "
                    f"{sub_rate / zc['fft_size']:.2f} Hz/bin)"
                )
        else:
            self.status("zoom off")
        return {"ok": True, "zoom": dict(self.zoom_cfg)}

    def _emit_waterfall_row(self, mag: np.ndarray):
        n = self.sa.cfg.fft_size
        if getattr(self, "_iq", False):
            half = np.fft.fftshift(mag)  # full baseband for IQ
        else:
            half = mag[: n // 2]
        from tpu_sdr.runtime.waterfall import detect_bucketed

        pts = self.waterfall.points
        edges = np.linspace(0, half.shape[0], pts + 1).astype(int)
        dec = detect_bucketed(half, edges, self.detector)
        row_db = 20.0 * np.log10(np.maximum(dec, 1e-9))
        self.waterfall.push(row_db)
        self.emit(
            "waterfall_row",
            {
                "row_db": np.round(row_db.astype(np.float64), 1).tolist(),
                "peak_hold_db": np.round(
                    self.waterfall.peak_hold.astype(np.float64), 1
                ).tolist(),
                "rows": self.waterfall.row_count,
            },
        )

    # ---------------- command handlers (the SocketIO event surface) -------

    def set_mode(self, mode: str):
        """'ethernet' | 'uart' — mirrors the GUI's set_mode full-reset dance
        (``fft_analyzer_gui.py:1003-1053``)."""
        m = CommMode.ETHERNET if mode.lower().startswith("eth") else CommMode.UART
        self.sa.reset()
        self.sa.set_comm_mode(m)
        self.sa.start()
        self.status(f"comm mode -> {m.name}")

    def fpga_reset(self):
        self.sa.reset()
        self.status("analyzer reset")

    def set_filter_type(self, mode: str):
        fm = {
            "fixed": FilterMode.FIXED,
            "custom": FilterMode.CUSTOM,
            "bypass": FilterMode.BYPASS,
        }[mode.lower()]
        self.sa.set_filter_mode(fm)
        self.status(f"filter mode -> {fm.name}")

    def set_display_mode(self, mode: str):
        if mode not in ("magnitude", "real", "imag", "power"):
            raise ValueError(f"unknown display mode {mode!r}")
        self.display_mode = mode
        self.status(f"display -> {mode}")

    def send_command_bytes(self, hex_str: str) -> dict:
        """Raw command console: hex bytes straight into the wire decoder
        (the reference GUI's command console, e.g. '55', 'b1 55', 'f1 40...')."""
        try:
            data = bytes.fromhex(hex_str.replace("0x", "").replace(",", " "))
        except ValueError as e:
            self.status(f"bad hex: {e}", ok=False)
            return {"ok": False, "error": str(e)}
        events = self.sa.handle_bytes(data)
        desc = []
        for ev in events:
            if ev.kind == "command":
                desc.append(ev.command.name)
            elif ev.kind == "coefficients":
                desc.append(f"COEFFICIENTS[{len(ev.coefficients)}]")
            else:
                desc.append(f"ignored(0x{ev.raw:02X})")
        if self.sa.decoder.busy:
            desc.append("(awaiting coefficient bytes...)")
        self.status(f"cmd {hex_str} -> {', '.join(desc) or 'no event'}")
        return {"ok": True, "events": desc}

    def apply_frequency_range(self, lo_khz: float, hi_khz: float):
        nyq_khz = self.sa.cfg.sample_rate / 2000.0
        lo = float(np.clip(lo_khz, 0.0, nyq_khz - 1))
        hi = float(np.clip(hi_khz, lo + 1, nyq_khz))
        self.freq_range_khz = (lo, hi)
        self.status(f"frequency range {lo:.0f}-{hi:.0f} kHz")

    def update_filter_config(self, cfg: dict):
        known = set(self.filter_config)
        unknown = sorted(set(cfg) - known)
        self.filter_config.update({k: v for k, v in cfg.items() if k in known})
        if unknown:
            self.status(f"ignored unknown filter fields: {unknown}", ok=False)
        else:
            self.status("filter config updated")

    def _design(self):
        c = self.filter_config
        cutoff = (
            (float(c["cutoff_hz"]), float(c["cutoff2_hz"]))
            if c["btype"] in ("bandpass", "bandstop")
            else float(c["cutoff_hz"])
        )
        return designer_mod.design_iir_filter(
            kind=c["kind"],
            btype=c["btype"],
            order=int(c["order"]),
            fs=self.sa.cfg.sample_rate,
            cutoff_hz=cutoff,
            ripple_db=float(c["ripple_db"]),
            attenuation_db=float(c["attenuation_db"]),
        )

    def generate_filter_preview(self) -> dict:
        """Design + response arrays (client renders; no matplotlib needed)."""
        try:
            d = self._design()
        except ValueError as e:
            self.status(f"design error: {e}", ok=False)
            return {"ok": False, "error": str(e)}
        w, mag_db = d.frequency_response()
        wq, mag_q_db = d.quantized_response()
        preview = {
            "ok": True,
            "freqs_hz": np.round(w, 1).tolist(),
            "mag_db": np.round(mag_db, 2).tolist(),
            "mag_db_quantized": np.round(mag_q_db, 2).tolist(),
            "sos": np.round(d.sos, 6).tolist(),
            "sos_q": d.sos_q.tolist(),
        }
        self.emit("filter_preview", preview)
        return preview

    def apply_filter(self) -> dict:
        try:
            d = self._design()
            self.sa.upload_filter(d.sos)
            self.sa.set_filter_mode(FilterMode.CUSTOM)
        except ValueError as e:
            self.status(f"filter apply failed: {e}", ok=False)
            return {"ok": False, "error": str(e)}
        self.status(
            f"applied {d.kind} {d.btype} order {d.order} "
            f"(upload #{self.sa.stats.coefficient_uploads})"
        )
        return {"ok": True}

    def reset_plot(self):
        """Reference 'reset_plot' event: clear display state + stats
        (``fft_analyzer_gui.py`` SocketIO API, SURVEY.md §2.5). Clients also
        clear their canvases on the emitted event."""
        self.waterfall.clear()
        self.sa.stats.reset()
        self._fps_window.clear()
        self._trace_sig = None
        self._trace_peak = None
        self._trace_avg = None
        self.emit("plot_reset", {})
        self.status("plot reset")

    def update_config(self, cfg: dict):
        """Reference 'update_config' event: mutate the runtime display
        config (the ``web_config`` dict analog — display rate/points and
        waterfall toggle; never traced shapes)."""
        known = {
            "display_fps",
            "display_points",
            "waterfall_enabled",
            "traces_enabled",
            "trace_alpha",
            "detector",
            "iq_correction",
        }
        unknown = sorted(set(cfg) - known)
        # Parse everything BEFORE mutating anything: a malformed field must
        # not leave the config half-applied.
        updates = {}
        if "display_fps" in cfg:
            updates["display_fps"] = float(
                np.clip(float(cfg["display_fps"]), 1, 120)
            )
        if "display_points" in cfg:
            updates["display_points"] = int(
                np.clip(int(cfg["display_points"]), 64, 16384)
            )
        if "waterfall_enabled" in cfg:
            updates["waterfall_enabled"] = bool(cfg["waterfall_enabled"])
        if "traces_enabled" in cfg:
            updates["traces_enabled"] = bool(cfg["traces_enabled"])
        if "trace_alpha" in cfg:
            updates["trace_alpha"] = float(
                np.clip(float(cfg["trace_alpha"]), 0.01, 1.0)
            )
        if "detector" in cfg:
            from tpu_sdr.runtime.waterfall import DETECTORS

            det = str(cfg["detector"]).lower()
            if det not in DETECTORS:
                raise ValueError(
                    f"detector must be one of {DETECTORS}; got {det!r}")
            updates["detector"] = det
        if "iq_correction" in cfg:
            updates["iq_correction"] = bool(cfg["iq_correction"])
        for k, v in updates.items():
            setattr(self, k, v)
        if updates.get("traces_enabled") is False:
            self._trace_sig = self._trace_peak = self._trace_avg = None
        if updates.get("iq_correction") is False:
            self._iqcorr_rt = None  # re-converge fresh on re-enable
        if unknown:
            self.status(f"ignored unknown config fields: {unknown}", ok=False)
        else:
            self.status("config updated")

    def get_roofline(self) -> dict:
        """Roofline cost model + live measured rate (SURVEY.md §5.1: the
        per-kernel counters surfaced through the stats channel)."""
        from tpu_sdr.bench.roofline import roofline_report

        measured = None
        started = self.sa.stats.started_at
        if started and self.sa.stats.samples_consumed:
            elapsed = max(time.time() - started, 1e-9)
            measured = self.sa.stats.samples_consumed / elapsed
        return roofline_report(
            self.sa.cfg, measured_samples_per_sec=measured
        )

    def get_state(self) -> dict:
        art = self._audio_rt  # snapshot: HTTP/acquisition threads swap it
        return {
            "running": self.sa.running,
            "filter_mode": self.sa.filter_mode.name,
            "comm_mode": self.sa.comm_mode.name,
            "freq_range_khz": self.freq_range_khz,
            "filter_config": self.filter_config,
            "display_mode": self.display_mode,
            "detector": self.detector,
            "iq_correction": self.iq_correction,
            "zoom": dict(self.zoom_cfg),
            "trigger": {**self.trigger_cfg, "armed": self._trigger_armed},
            "recording": (
                None if self._recorder is None else self._record_path
            ),
            "audio": {
                **self.audio_cfg,
                "buffered_seconds": (
                    0.0 if art is None
                    else round(art["audio"].shape[-1] / art["rate"], 2)
                ),
            },
            "stats": self.sa.stats.as_dict(),
            "config": {
                "fft_size": self.sa.cfg.fft_size,
                "sample_rate": self.sa.cfg.sample_rate,
                "hz_per_bin": self.sa.cfg.hz_per_bin,
                "channels": self.sa.cfg.channels,
            },
        }
