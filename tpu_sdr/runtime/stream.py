"""The block-stream runtime: frames in, spectra out, state carried.

TPU-native replacement for the reference's acquire/fill/drain machinery
(``imp/sequencer_dsp.vhd`` + ``imp/sequ2.vhd`` + the 16K async FIFO): instead
of a 1-sample/cycle pipeline decoupled by FIFOs across clock domains, the
runtime processes whole batches of 16K-sample frames per dispatch, carrying
{biquad state, window phase, frame count} across calls. Host<->device rate
decoupling — the async-FIFO role — is played by JAX's async dispatch queue
plus the double-buffered stager in ``tpu_sdr.runtime.feeder.StreamFeeder``.

Datapath order matches the reference (SURVEY.md §3.2):

    samples -> Hann window -> {bypass | fixed IIR12 | custom IIR12} -> 16K FFT
            -> magnitude (+ optional phase / complex spectra)
"""

from __future__ import annotations

import functools


import jax
import jax.numpy as jnp
import numpy as np

from tpu_sdr.core.config import FilterMode, PipelineConfig
from tpu_sdr.kernels import biquad, fft, magnitude, window
from tpu_sdr.control import golden
from tpu_sdr.runtime.state import StreamState

Precision = jax.lax.Precision

_MODE_TO_INDEX = {FilterMode.BYPASS: 0, FilterMode.FIXED: 1, FilterMode.CUSTOM: 2}


def _precision(cfg: PipelineConfig):
    return {
        "f32max": Precision.HIGHEST,
        "f32": Precision.HIGH,
        "bf16": Precision.DEFAULT,
    }[cfg.dtype]


def _kernel_precision(cfg: PipelineConfig) -> str:
    """Pallas-kernel matmul precision per quality tier.

    Mosaic only lowers default/highest, so the f32 tier uses the kernel's
    manual 3-pass bf16-split emulation of Precision.HIGH ("high3") — same
    numeric class as the tier's XLA IIR, ~1.4x faster than "highest" on v5e.
    """
    return {"f32max": "highest", "f32": "high3", "bf16": "default"}[cfg.dtype]


def _kernel_karatsuba(cfg: PipelineConfig) -> bool:
    """3-mult complex FFT pass-2: f32 tier only (exact tiers keep 4-mult)."""
    return cfg.dtype == "f32"


def _kernel_out_dtype(cfg: PipelineConfig) -> str:
    """Magnitude store dtype: bf16 when the bf16 tier opts into bf16_io."""
    return (
        "bfloat16" if cfg.dtype == "bf16" and cfg.bf16_io else "float32"
    )


def _maybe_bf16_y(cfg: PipelineConfig, y):
    """bf16_io: ship the IIR output to the FFT kernel as bf16 (bitwise-
    neutral on TPU — DEFAULT-precision MXU dots round inputs to bf16 in
    hardware; verified on-chip, docs/measurements/attrib_bf16_r4.json)."""
    if cfg.dtype == "bf16" and cfg.bf16_io:
        return y.astype(jnp.bfloat16)
    return y


def _finalize_bf16_io(cfg: PipelineConfig, out: dict) -> dict:
    """bf16_io dtype contract on the XLA fallback paths (non-128x128
    shapes, use_pallas=False, multi-output requests): magnitudes come back
    bfloat16 — the f32 results rounded once — exactly as the Pallas
    kernel's ``out_dtype`` stores them, so one config never yields two
    output dtypes depending on which execution path compiled (review
    finding). Other outputs (complex/power/phase) stay f32."""
    if cfg.dtype == "bf16" and cfg.bf16_io and "magnitude" in out:
        out["magnitude"] = out["magnitude"].astype(jnp.bfloat16)
    return out


def _decode_outputs(cfg: PipelineConfig, fr, fi, outputs: str) -> dict:
    """Spectrum decode shared by every XLA path (non-hop, hop, complex).

    One place owns the outputs vocabulary AND the bf16_io finalize, so the
    output dict can never become execution-path-dependent — exactly the
    class of bug ``_finalize_bf16_io`` exists to prevent (review finding:
    this block used to be copy-pasted at three dispatch sites)."""
    out = {}
    if outputs in ("magnitude", "all"):
        out["magnitude"] = magnitude.magnitude(fr, fi)
    if outputs in ("complex", "all"):
        out["re"], out["im"] = fr, fi
    if outputs in ("power", "all"):
        out["power"] = magnitude.power(fr, fi)
    if outputs in ("phase", "all"):
        out["phase"] = magnitude.phase(fr, fi)
    return _finalize_bf16_io(cfg, out)


def _iir_precision(cfg: PipelineConfig):
    """XLA IIR precision in the hybrid structure (HIGH for the f32 tier)."""
    return Precision.HIGH if cfg.dtype == "f32" else _precision(cfg)


def _run_iir(op, xw, zi, precision, time_axis):
    """Dispatch to the right composite variant (shared / per-channel bank)."""
    if op.T.ndim == 3:  # per-channel bank (leading channel axis)
        return biquad.sosfilt_blocked_composite_bank(
            op, xw, zi, precision, time_axis=time_axis
        )
    if time_axis is None:
        return biquad.sosfilt_blocked_composite(op, xw, zi, precision=precision)
    return biquad.sosfilt_blocked_composite_timesharded(
        op, xw, zi, time_axis=time_axis, precision=precision
    )


def process_stream(
    x: jnp.ndarray,
    state: StreamState,
    bank_fixed: dict,
    bank_custom: dict,
    hann_w: jnp.ndarray,
    plan: dict,
    *,
    mode_index: int,
    cfg: PipelineConfig,
    outputs: str = "magnitude",
    time_axis: str | None = None,
    pallas_interpret: bool = False,
):
    """Process a stream chunk x (..., channels, T), T a multiple of fft_size.

    Pure jittable function: (x, state, banks) -> (out dict, new state).
    ``mode_index``: 0 bypass / 1 fixed / 2 custom (static — each mode is its
    own compiled program, mirroring the reference's datapath mux
    ``src/command_control.vhd:81-120``). Each filter bank is a dict
    {"op": BlockedSOSComposite, "pp": PallasSOSPlan}.

    ``time_axis``: when running inside ``shard_map`` with the stream's frame
    axis sharded over a mesh axis of that name, the IIR state chain exchanges
    per-frame summaries over the interconnect and stays bit-identical to the
    unsharded run; counters then account for the global stream.

    Two execution paths:
    - Pallas (default for magnitude output at the 16K/128x128 shape): the
      two-pass kernel pipeline of ``tpu_sdr.kernels.pallas.iir_fft`` — all
      heavy math in two VMEM-resident kernels, XLA reduced to the 12-dim
      frame chain (compiles in seconds on the remote-compile tunnel).
    - XLA: composite blocked einsums (any shape, any outputs).
    """
    n = cfg.fft_size
    if cfg.effective_hop != n:
        return _process_stream_hop(
            x, state, bank_fixed, bank_custom, hann_w, plan,
            mode_index=mode_index, cfg=cfg, outputs=outputs,
            time_axis=time_axis, pallas_interpret=pallas_interpret,
        )
    prec = _precision(cfg)
    t = x.shape[-1]
    n_frames = t // n
    lead = x.shape[:-1]  # (..., channels)
    t_global = t if time_axis is None else t * jax.lax.psum(1, time_axis)
    n_frames_global = t_global // n

    pallas_ok = cfg.pallas_geometry_ok() and outputs == "magnitude"

    out = {}
    if pallas_ok:
        from tpu_sdr.kernels.pallas import iir_fft

        bank = bank_fixed if mode_index != 2 else bank_custom
        pp = bank["pp"]
        m = pp.state_dim
        kprec = _kernel_precision(cfg)
        flat = x.reshape(-1, n)  # kernels window internally (reference order)
        banked = mode_index == 2 and bank["op"].T.ndim == 3
        if mode_index == 0:
            zs = jnp.zeros((flat.shape[0], m), jnp.float32)
            mag = iir_fft.spectrum_from_state(
                flat, zs, pp, interpret=pallas_interpret, precision=kprec,
                bypass=True, karatsuba=_kernel_karatsuba(cfg),
                out_dtype=_kernel_out_dtype(cfg),
                flat_emit=cfg.pallas_flat_emit,
            )
            zf = state.sos_state
        elif banked or not (
            cfg.dtype in ("f32max", "f32") and cfg.fused_two_pass
        ):
            # Hybrid structure (all tiers by default): XLA window+IIR
            # (3-pass f32 for the f32 tier, bf16 passes for bf16, 6-pass
            # exact f32 for f32max) feeding the fused Pallas FFT+magnitude
            # kernel. Measured faster than the two-pass kernels at
            # production dispatch sizes for every tier on v5e.
            xw = (x.reshape(*lead, n_frames, n) * hann_w).reshape(*lead, t)
            y, zf = _run_iir(
                bank["op"], xw, state.sos_state, _iir_precision(cfg), time_axis
            )
            zs = jnp.zeros((flat.shape[0], m), jnp.float32)
            mag = iir_fft.spectrum_from_state(
                _maybe_bf16_y(cfg, y).reshape(-1, n), zs, pp,
                interpret=pallas_interpret,
                precision=kprec, bypass=True, apply_window=False,
                karatsuba=_kernel_karatsuba(cfg),
                out_dtype=_kernel_out_dtype(cfg),
                flat_emit=cfg.pallas_flat_emit,
            )
        else:
            # fused_two_pass (f32max exact, or f32 high3 since the
            # transposed in-kernel scan made the 12-state doublings cheap):
            # fully-fused two-pass Pallas pipeline, one HBM read+write per
            # frame. Summaries only seed boundary corrections, so they
            # always run at default precision (no measurable SNR impact).
            w = iir_fft.iir_summaries(
                flat, pp, interpret=pallas_interpret, precision="default"
            ).reshape(*lead, n_frames, m)
            if time_axis is not None:
                w = jax.lax.all_gather(w, time_axis, axis=len(lead), tiled=True)
            z0 = state.sos_state.reshape(*lead, m)

            def step(z, wf):
                # biquad.alb_step: exact f32 VPU matvec (a bare einsum
                # would lower to bf16 MXU passes on TPU — see the helper)
                return biquad.alb_step(pp, z, wf), z

            wF = jnp.moveaxis(w, len(lead), 0)
            z_final, z_starts = jax.lax.scan(step, z0, wF)
            z_starts = jnp.moveaxis(z_starts, 0, len(lead))
            if time_axis is not None:
                t_idx = jax.lax.axis_index(time_axis)
                z_starts = jax.lax.dynamic_slice_in_dim(
                    z_starts, t_idx * n_frames, n_frames, axis=len(lead)
                )
            mag = iir_fft.spectrum_from_state(
                flat,
                z_starts.reshape(-1, m),
                pp,
                interpret=pallas_interpret,
                precision=kprec,
                karatsuba=_kernel_karatsuba(cfg),
                flat_emit=cfg.pallas_flat_emit,
            )
            zf = z_final.reshape(*lead, m // 2, 2)
        out["magnitude"] = mag.reshape(*lead, n_frames, n)
    else:
        # 1. Window over the continuous stream (frame-aligned: phase 0).
        xw = (x.reshape(*lead, n_frames, n) * hann_w).reshape(*lead, t)

        # 2. IIR filter bank (or bypass).
        if mode_index == 0:
            y = xw
            zf = state.sos_state
        else:
            op = (bank_fixed if mode_index == 1 else bank_custom)["op"]
            y, zf = _run_iir(op, xw, state.sos_state, prec, time_axis)

        # 3. Per-frame FFT (real input: the reference zero-pads imag,
        #    src/command_control.vhd:123) + output decode.
        frames = y.reshape(*lead, n_frames, n)
        fr, fi = fft.fft_4step(frames, None, plan, precision=prec)
        out = _decode_outputs(cfg, fr, fi, outputs)

    new_state = StreamState(
        sos_state=zf,
        window_phase=(state.window_phase + t_global) % n,
        frame_count=state.frame_count + n_frames_global,
    )
    return out, new_state


def _process_stream_hop(
    x, state, bank_fixed, bank_custom, hann_w, plan, *,
    mode_index, cfg, outputs, time_axis, pallas_interpret,
):
    """Overlapped (STFT) framing: hop < fft_size, with carried history.

    The reference has no overlap (its window phase counter spans exactly one
    FFT frame); for hop < N the window-first order is ill-defined, so this
    mode uses the standard STFT order — IIR on the *continuous* stream, then
    overlapped framing + window + FFT — a documented divergence
    (SURVEY.md §7). State carries the last (N - hop) filtered samples so
    chunked streaming matches a one-shot run exactly.

    Under time sharding each device holds a contiguous run of the stream;
    after the (already bit-consistent) time-sharded IIR, the (N - hop)
    overlap tail rides ``ppermute`` to the right-hand neighbor — the halo
    exchange — and shard 0 splices in the carried history. The new carried
    history (the global stream tail) is replicated from the last shard.
    """
    n = cfg.fft_size
    hop = cfg.effective_hop
    hist = n - hop
    prec = _precision(cfg)
    t = x.shape[-1]
    lead = x.shape[:-1]
    n_frames = t // hop

    # 1. IIR on the raw continuous stream.
    if mode_index == 0:
        y = x
        zf = state.sos_state
    else:
        op = (bank_fixed if mode_index == 1 else bank_custom)["op"]
        y, zf = _run_iir(op, x, state.sos_state, _iir_precision(cfg), time_axis)

    # 2. Overlapped frames from left context + this chunk.
    if time_axis is None:
        left = state.history
        new_history = jnp.concatenate([state.history, y], axis=-1)[..., t:]
        n_shards = 1
    else:
        # the canonical one-ppermute exchange (shard/halo.py — review
        # finding: this used to be an inline copy of that pattern); the
        # carried history comes back replicated, keeping the state
        # replication contract bit-identical on every shard.
        from tpu_sdr.shard.halo import left_halo

        n_shards = jax.lax.psum(1, time_axis)
        tail = y[..., t - hist :]  # (..., hist)
        left, new_history = left_halo(
            tail, state.history, n_shards, axis_name=time_axis
        )
    ext = jnp.concatenate([left, y], axis=-1)  # (..., hist + t)
    frames = jnp.stack(
        [
            jax.lax.dynamic_slice_in_dim(ext, k * hop, n, axis=-1)
            for k in range(n_frames)
        ],
        axis=-2,
    )  # (..., F, n)

    # 3. Window + FFT + decode.
    out = {}
    pallas_ok = cfg.pallas_geometry_ok() and outputs == "magnitude"
    if pallas_ok:
        from tpu_sdr.kernels.pallas import iir_fft

        pp = (bank_fixed if mode_index != 2 else bank_custom)["pp"]
        kprec = _kernel_precision(cfg)
        flat = frames.reshape(-1, n)
        zs = jnp.zeros((flat.shape[0], pp.state_dim), jnp.float32)
        mag = iir_fft.spectrum_from_state(
            flat, zs, pp, interpret=pallas_interpret, precision=kprec,
            bypass=True, apply_window=True, karatsuba=_kernel_karatsuba(cfg),
            out_dtype=_kernel_out_dtype(cfg),
            flat_emit=cfg.pallas_flat_emit,
        )
        out["magnitude"] = mag.reshape(*lead, n_frames, n)
    else:
        xw = frames * hann_w
        fr, fi = fft.fft_4step(xw, None, plan, precision=prec)
        out = _decode_outputs(cfg, fr, fi, outputs)

    new_state = StreamState(
        sos_state=zf,
        window_phase=(state.window_phase + t * n_shards) % n,
        frame_count=state.frame_count + n_frames * n_shards,
        history=new_history,
    )
    return out, new_state


def process_stream_complex(
    xs: jnp.ndarray,
    state: StreamState,
    bank_fixed: dict,
    bank_custom: dict,
    hann_w: jnp.ndarray,
    plan: dict,
    *,
    mode_index: int,
    cfg: PipelineConfig,
    outputs: str = "magnitude",
    time_axis: str | None = None,
    pallas_interpret: bool = False,
):
    """Complex (IQ) stream: xs (2, ..., channels, T) stacked re/im planes.

    The reference hardware is real-only (XADC, imag zero-padded at
    ``src/command_control.vhd:123``); IQ input is the SDR-natural extension
    (BASELINE config 4: "synthetic IQ"). The window and the real-coefficient
    IIR act on re/im independently, and the DFT is linear, so the complex
    spectrum is combined from two real-input runs:

        X = FFT(re) + i*FFT(im)
          = (Ar - Bi) + i*(Ai + Br),  A = FFT(re), B = FFT(im)

    State carries a leading 2-axis: ``initial_state(batch_shape=(2,))``.

    Magnitude output takes a fused complex-input Pallas FFT kernel (XLA
    window+IIR on the stacked planes feeding ``spectrum_mag_complex``);
    other outputs combine the XLA complex path.
    """
    n = cfg.fft_size
    pallas_ok = (
        cfg.pallas_geometry_ok()
        and outputs == "magnitude"
        and cfg.effective_hop == n
    )
    if pallas_ok:
        from tpu_sdr.kernels.pallas import iir_fft

        kprec = _kernel_precision(cfg)
        kara = _kernel_karatsuba(cfg)
        t = xs.shape[-1]
        n_frames = t // n
        lead = xs.shape[1:-1]  # (..., channels)
        t_global = t if time_axis is None else t * jax.lax.psum(1, time_axis)
        bank = bank_fixed if mode_index != 2 else bank_custom
        pp = bank["pp"]
        if mode_index == 0:
            y = xs
            zf = state.sos_state
            apply_window = True
        else:
            xw = (xs.reshape(2, *lead, n_frames, n) * hann_w).reshape(
                2, *lead, t
            )
            y, zf = _run_iir(
                bank["op"], xw, state.sos_state, _iir_precision(cfg), time_axis
            )
            apply_window = False
        # bf16_io: the y cast is only bitwise-free when y feeds the MXU
        # dots directly (filtered branch, apply_window=False). In bypass
        # the kernel windows first — casting the RAW input would round
        # BEFORE the elementwise multiply, violating the "f32 results
        # rounded once on store" contract (review finding) — so bypass
        # keeps f32 input and relies on out_dtype alone.
        yr, yi = y[0], y[1]
        if not apply_window:
            yr, yi = _maybe_bf16_y(cfg, yr), _maybe_bf16_y(cfg, yi)
        mag = iir_fft.spectrum_mag_complex(
            yr.reshape(-1, n), yi.reshape(-1, n), pp,
            interpret=pallas_interpret, precision=kprec,
            apply_window=apply_window, karatsuba=kara,
            out_dtype=_kernel_out_dtype(cfg),
        )
        new_state = StreamState(
            sos_state=zf,
            window_phase=(state.window_phase + t_global) % n,
            frame_count=state.frame_count + t_global // n,
            history=state.history,
        )
        return {"magnitude": mag.reshape(*lead, n_frames, n)}, new_state

    out, new_state = process_stream(
        xs, state, bank_fixed, bank_custom, hann_w, plan,
        mode_index=mode_index, cfg=cfg, outputs="complex",
        time_axis=time_axis, pallas_interpret=pallas_interpret,
    )
    fr = out["re"][0] - out["im"][1]
    fi = out["im"][0] + out["re"][1]
    res = _decode_outputs(cfg, fr, fi, outputs)
    # Counters are scalars derived from T, so the stacked planes advance the
    # global stream exactly once — new_state is already correct.
    return res, new_state


class SpectrumPipeline:
    """Convenience wrapper owning the device constants + jit cache.

    This is the single-device engine; the sharded engine wraps the same
    ``process_stream`` under ``shard_map`` (``tpu_sdr.shard``).
    """

    def __init__(self, cfg: PipelineConfig | None = None):
        self.cfg = cfg or PipelineConfig()
        self.hann_w = window.hann_coefficients(
            self.cfg.fft_size, self.cfg.rtl_faithful_window
        )
        self.plan = fft.plan_constants(self.cfg.fft_n1, self.cfg.fft_n2)
        # Custom bank boots as identity (pass-through) until coefficients are
        # uploaded — the analog of the zeroed coefficient RAM.
        self.bank_fixed = self._build_bank(golden.fixed_filter_sos())
        self.bank_custom = self._build_bank(
            biquad.sos_identity(self.cfg.n_sections)
        )
        self._jitted = {}

    def _build_bank(self, sos: np.ndarray) -> dict:
        from tpu_sdr.runtime import banks

        return banks.build_bank(self.cfg, self.hann_w, self.plan, sos)

    def initial_state(self, batch_shape=()) -> StreamState:
        return StreamState.initial(
            self.cfg.channels,
            self.cfg.n_sections,
            batch_shape,
            history_len=self.cfg.fft_size - self.cfg.effective_hop,
        )

    def upload_sos(self, sos: np.ndarray):
        """Runtime coefficient reload of the custom bank.

        The analog of the 0xF1 coefficient upload path (SURVEY.md §3.5):
        recomputes the blocked operator on device; shapes are unchanged so no
        recompilation of the hot loop occurs. Unstable sections (poles on or
        outside the unit circle) are rejected — the blocked operator raises
        A to the 128th power, which overflows to inf/nan for unstable poles.
        """
        from tpu_sdr.runtime import banks

        self.bank_custom = self._build_bank(
            banks.prepare_sos(sos, self.cfg.n_sections)
        )

    def upload_sos_bank(self, sos_bank: np.ndarray):
        """Per-channel coefficient reload.

        ``sos_bank``: (channels, sections, 6) array, or a list of per-channel
        SOS arrays (orders may differ; each is padded to the engine depth).
        The BASELINE config-3 filter bank — each channel gets its own
        cascade, stability-validated per channel.
        """
        from tpu_sdr.runtime import banks

        padded = banks.prepare_bank(
            sos_bank, self.cfg.channels, self.cfg.n_sections
        )
        op = banks.build_channel_bank_op(self.cfg, padded)
        # keep the shared-plan pallas FFT for the hybrid epilogue
        self.bank_custom = {"op": op, "pp": self.bank_fixed["pp"]}

    def _fn(self, mode_index: int, outputs: str, complex_input: bool = False):
        key = (mode_index, outputs, complex_input)
        if key not in self._jitted:
            self._jitted[key] = jax.jit(
                functools.partial(
                    process_stream_complex if complex_input else process_stream,
                    mode_index=mode_index,
                    cfg=self.cfg,
                    outputs=outputs,
                    pallas_interpret=jax.default_backend() == "cpu",
                )
            )
        return self._jitted[key]

    def process(
        self,
        x,
        state: StreamState,
        mode: FilterMode = FilterMode.BYPASS,
        outputs: str = "magnitude",
    ):
        """x: (..., channels, T) or (T,) -> (out dict, new_state).

        Complex (IQ) input is accepted: pass complex samples and a state
        created with ``initial_state(batch_shape=(2,))`` — the stacked re/im
        planes run the real pipeline once and combine by DFT linearity.
        """
        complex_input = jnp.iscomplexobj(x)
        if complex_input:
            # Split on the host: TPU backends may not implement complex
            # dtypes at all (axon: UNIMPLEMENTED on .real/.imag on device).
            expected = (2, self.cfg.channels, self.cfg.n_sections, 2)
            if tuple(state.sos_state.shape) != expected:
                raise ValueError(
                    "complex input needs a re/im-stacked state of shape "
                    f"{expected}, got {tuple(state.sos_state.shape)}: create "
                    "it with initial_state(batch_shape=(2,))"
                )
            xn = np.asarray(x)
            if xn.ndim == 1:
                xn = xn[None, :]
            x = jnp.asarray(
                np.stack([xn.real, xn.imag], axis=0), jnp.float32
            )
        else:
            x = jnp.asarray(x, jnp.float32)
            if x.ndim == 1:
                x = x[None, :]
        if x.shape[-1] % self.cfg.fft_size:
            raise ValueError(
                f"stream chunk length {x.shape[-1]} must be a multiple of "
                f"fft_size={self.cfg.fft_size} (frame-aligned dispatch)"
            )
        fn = self._fn(
            _MODE_TO_INDEX[FilterMode(mode)], outputs, complex_input
        )
        return fn(
            x, state, self.bank_fixed, self.bank_custom, self.hann_w, self.plan
        )

    def process_planes(
        self,
        xs,
        state: StreamState,
        mode: FilterMode = FilterMode.BYPASS,
        outputs: str = "magnitude",
    ):
        """Complex (IQ) fast path for PRE-SPLIT re/im planes.

        xs: (2, ..., channels, T) float32 — e.g. a device-resident chunk
        from ``StreamFeeder`` over an IQ source, or host arrays split once
        and reused. Skips the per-call host split of ``process``.
        """
        if xs.shape[0] != 2:
            raise ValueError(
                f"xs must stack re/im as a leading 2-axis, got {xs.shape}"
            )
        if state.sos_state.shape[:1] != (2,):
            raise ValueError(
                "plane-stacked input needs the re/im-stacked state: create "
                "it with initial_state(batch_shape=(2,))"
            )
        if xs.shape[-1] % self.cfg.fft_size:
            # same frame-aligned contract process() enforces (review
            # finding: without it a misaligned chunk died in an opaque
            # reshape error deep inside jit)
            raise ValueError(
                f"stream chunk length {xs.shape[-1]} must be a multiple of "
                f"fft_size={self.cfg.fft_size} (frame-aligned dispatch)"
            )
        fn = self._fn(_MODE_TO_INDEX[FilterMode(mode)], outputs, True)
        return fn(
            xs, state, self.bank_fixed, self.bank_custom, self.hann_w,
            self.plan,
        )
