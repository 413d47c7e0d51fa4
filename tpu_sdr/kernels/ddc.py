"""Digital down-converter (DDC): NCO mixer + polyphase decimating FIR.

Capability extension — the tunable zoom front-end the reference lacks
(its only narrowband tool is the monolithic 16K FFT;
``scripts/fft_analyzer_gui.py`` zooms by cropping display bins). The DDC
translates an arbitrary center frequency to baseband and decimates by R:

    y[n]   = x[n] * exp(-2j*pi*fc/fs * n)          (mix)
    out[m] = (h (*) y)[(m+1)*R - 1]                (filter + decimate)

i.e. each output is the causal FIR output at the last sample of each
R-block — ``scipy.signal.lfilter(h, 1, y)[R-1::R]`` is the golden model
(tests/test_ddc.py, float64 oracle).

TPU-first mapping:
- **NCO = 32-bit phase accumulator in uint32 lanes** (the classic DDS
  NCO, computed on the VPU). naive ``frac(n * fc/fs)`` in f32 is garbage
  for n ~ 1e6 (ulp(5e5) ≈ 0.03 cycles); instead the tuning word
  ``K = round(fc/fs * 2^32)`` makes the phase of sample n exactly
  ``(n*K mod 2^32) / 2^32`` — wrapping uint32 multiply-adds, EXACT for
  any stream length and bitwise-invariant to chunking/sharding by
  construction. Only one uint32 scalar (the chunk's start phase,
  ``offset*K mod 2^32`` computed from the exact host integer offset)
  crosses the host boundary per chunk — the previous design shipped a
  512 KB float64-derived phase table through the tunnel per dispatch
  (~11 ms, 20x the kernel itself). Residual error: frequency quantizes
  to fs/2^32 (~2.3e-4 Hz at 1 MSPS — the same semantics as a hardware
  NCO) and the uint32→f32 phase conversion rounds to 2^-24 cycles
  (spur floor ~ -120 dBc).
- **Polyphase fold**: the decimating FIR is the PFB fold with the branch
  axis summed — P shifted multiply-accumulates over an (steps, R) layout
  (VPU), no per-sample loop, then a sum over R. h is reversed into
  ``h2[p, r] = h[(P-1-p)R + (R-1-r)]`` so the fold IS the causal
  convolution above.
- Streaming state carries the last (P-1)*R MIXED samples (re/im planes),
  so chunked processing is bit-identical to one-shot (tested) and the
  mixer never re-touches old samples.

Real and IQ input both produce complex baseband planes at fs/R; complex
dtypes never reach the device (re/im planes throughout).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


def design_decimation_fir(
    r: int, taps_per_phase: int = 8, window: str = "hamming"
) -> np.ndarray:
    """Lowpass anti-alias FIR for decimation by r: length taps_per_phase*r,
    cutoff fs/(2r), unit DC gain (float64)."""
    import scipy.signal as sps

    h = sps.firwin(taps_per_phase * r, cutoff=1.0 / r, window=window)
    return (h / h.sum()).astype(np.float64)


def _tuning_word(fs: float, center_hz: float) -> int:
    """32-bit NCO tuning word: round(fc/fs * 2^32) mod 2^32."""
    return int(round(center_hz / fs * 2.0**32)) % (1 << 32)


def _principal_alias_hz(fs: float, word: int) -> float:
    """The frequency a tuning word actually produces, in [-fs/2, fs/2)."""
    if word >= 1 << 31:
        word -= 1 << 32
    return word * fs / 2.0**32


def _nco_cos_sin(phase0_u32, k_u32, t: int):
    """cos/sin of the NCO carrier for t consecutive samples.

    phase0_u32: uint32 scalar start phase (sample 0 of this chunk);
    k_u32: uint32 scalar tuning word. Wrapping uint32 accumulator —
    exact, so any chunking/sharding of the stream mixes identically."""
    n = jax.lax.iota(jnp.uint32, t)
    ph_u = phase0_u32 + n * k_u32  # wraps mod 2^32 (exact NCO semantics)
    ph = ph_u.astype(jnp.float32) * jnp.float32(2.0**-32)
    ang = (2.0 * np.pi) * ph
    return jnp.cos(ang), jnp.sin(ang)


def _mix(x, phase0_u32, k_u32, iq: bool):
    """Mix x with the NCO carrier exp(-j*2*pi*phase): real (..., T) or IQ
    planes (2, ..., T) -> (yre, yim)."""
    c, s = _nco_cos_sin(phase0_u32, k_u32, x.shape[-1])
    if iq:
        return x[0] * c + x[1] * s, x[1] * c - x[0] * s
    return x * c, -(x * s)


def _fold_decimate(cat, h2, p: int, r: int):
    """Polyphase fold over (..., (steps+p-1)*r) -> (..., steps): the
    causal FIR output at the last sample of each R-block (shared by the
    single-device and sharded paths — one definition, one bitwise
    behavior)."""
    rows = cat.reshape(cat.shape[:-1] + (-1, r))
    steps = rows.shape[-2] - (p - 1)
    acc = rows[..., 0:steps, :] * h2[0]
    for tp in range(1, p):
        acc = acc + rows[..., tp : tp + steps, :] * h2[tp]
    return jnp.sum(acc, axis=-1)


@functools.partial(jax.jit, static_argnames=("p", "r", "iq"))
def _ddc_forward(
    x, tail_re, tail_im, phase0_u32, k_u32, h2, p: int, r: int, iq: bool
):
    """Mix + fold-decimate one chunk.

    x: (..., T) real or (2, ..., T) IQ planes; tail_*: (..., (p-1)*r) mixed
    history; phase0_u32/k_u32: uint32 NCO start phase and tuning word.
    Returns (out_re, out_im, new_tail_re, new_tail_im)."""
    yre, yim = _mix(x, phase0_u32, k_u32, iq)
    hist = (p - 1) * r
    outs, tails = [], []
    for y, tail in ((yre, tail_re), (yim, tail_im)):
        cat = jnp.concatenate([tail, y], axis=-1) if hist else y
        outs.append(_fold_decimate(cat, h2, p, r))
        # tail from CAT, not the chunk: a chunk shorter than hist must
        # keep the older history's remainder (chunked == one-shot)
        tails.append(cat[..., cat.shape[-1] - hist :] if hist else tail)
    return outs[0], outs[1], tails[0], tails[1]


class DDCState:
    """Streaming state: mixed-sample tails (device) + absolute sample
    offset (host integer — exact for any stream length)."""

    def __init__(self, tail_re, tail_im, offset: int = 0):
        self.tail_re = tail_re
        self.tail_im = tail_im
        self.offset = int(offset)

    def to_numpy(self) -> dict:
        return {
            "tail_re": np.asarray(self.tail_re),
            "tail_im": np.asarray(self.tail_im),
            "offset": np.int64(self.offset),
        }

    @classmethod
    def from_numpy(cls, d: dict) -> "DDCState":
        return cls(
            jnp.asarray(d["tail_re"]),
            jnp.asarray(d["tail_im"]),
            int(d["offset"]),
        )


class DDC:
    """Streaming digital down-converter.

    Parameters: ``fs`` input rate, ``center_hz`` NCO frequency (any sign;
    retunable), ``decimation`` R, ``fir`` an explicit FIR (zero-padded to
    a multiple of R) or None for a ``design_decimation_fir`` lowpass with
    ``taps_per_phase`` taps per branch. Output rate is fs/R.
    """

    def __init__(
        self,
        fs: float = 1_000_000.0,
        center_hz: float = 100_000.0,
        decimation: int = 8,
        fir: np.ndarray | None = None,
        taps_per_phase: int = 8,
        window: str = "hamming",
    ):
        if decimation < 1:
            raise ValueError(f"decimation must be >= 1; got {decimation}")
        self.fs = float(fs)
        self.r = int(decimation)
        if fir is None:
            # R=1 has no aliasing to suppress: pure mixer (passthrough FIR)
            fir = (
                np.ones(1)
                if self.r == 1
                else design_decimation_fir(self.r, taps_per_phase, window)
            )
        h = np.asarray(fir, np.float64).reshape(-1)
        if h.size % self.r:
            h = np.pad(h, (0, self.r - h.size % self.r))
        self.fir = h
        self.p = h.size // self.r
        # h2[p, r] = h[(P-1-p)R + (R-1-r)]: the fold == causal convolution
        self._h2 = jnp.asarray(
            h[::-1].reshape(self.p, self.r), jnp.float32
        )
        self.retune(center_hz)

    @property
    def history_len(self) -> int:
        return (self.p - 1) * self.r

    @property
    def output_rate(self) -> float:
        return self.fs / self.r

    def retune(self, center_hz: float):
        """Change the NCO frequency (takes effect next chunk; the carrier
        phase restarts from the absolute-sample-index grid of the new
        frequency — no phase continuity across a retune). The realized
        frequency is quantized to the 32-bit tuning grid fs/2^32."""
        self.center_hz = float(center_hz)
        self._dphi = self.center_hz / self.fs
        # 32-bit NCO tuning word; negative frequencies wrap (mod 2^32)
        self._tuning_word = _tuning_word(self.fs, self.center_hz)

    @property
    def realized_center_hz(self) -> float:
        """The NCO's actual frequency after 32-bit tuning quantization:
        within fs/2^33 of the requested center for in-Nyquist tunes
        (|fc| <= fs/2); a request beyond Nyquist returns its alias
        (mod fs into [-fs/2, fs/2) — the frequency the NCO actually
        produces)."""
        return _principal_alias_hz(self.fs, self._tuning_word)

    def initial_state(self, batch_shape: tuple = ()) -> DDCState:
        z = jnp.zeros(tuple(batch_shape) + (self.history_len,), jnp.float32)
        return DDCState(z, z, 0)

    def _nco_scalars(self, offset: int):
        """(start phase, tuning word) as uint32 scalars — the only
        per-chunk host->device NCO traffic."""
        return (
            jnp.uint32((offset * self._tuning_word) % (1 << 32)),
            jnp.uint32(self._tuning_word),
        )

    def _process(self, x, state: DDCState, iq: bool):
        t = x.shape[-1]
        if t % self.r:
            raise ValueError(f"chunk length {t} not a multiple of R={self.r}")
        batch = x.shape[1:-1] if iq else x.shape[:-1]
        want = tuple(batch) + (self.history_len,)
        if tuple(state.tail_re.shape) != want:
            raise ValueError(
                f"state shape {tuple(state.tail_re.shape)} != {want}"
            )
        phase0, k = self._nco_scalars(state.offset)
        ore, oim, tre, tim = _ddc_forward(
            jnp.asarray(x, jnp.float32),
            state.tail_re,
            state.tail_im,
            phase0,
            k,
            self._h2,
            p=self.p,
            r=self.r,
            iq=iq,
        )
        return {"re": ore, "im": oim}, DDCState(tre, tim, state.offset + t)

    def process(self, x, state: DDCState):
        """Real input (..., T) -> complex baseband planes (..., T/R)."""
        return self._process(x, state, iq=False)

    def process_planes(self, xs, state: DDCState):
        """IQ planes (2, ..., T) -> complex baseband planes (..., T/R)."""
        return self._process(xs, state, iq=True)


class DDCBank:
    """K simultaneous down-converters on ONE shared input stream
    (multi-carrier monitoring). All carriers share the decimation and
    anti-alias FIR; each has its own 32-bit tuning word. The whole bank
    is one vmapped dispatch over the carrier axis — the input is read
    once and mixed K ways on the VPU. Output planes gain a leading
    carrier axis: (K, ..., T/R). Bitwise-identical to K independent
    ``DDC`` instances (tested)."""

    def __init__(
        self,
        fs: float = 1_000_000.0,
        centers_hz=(100_000.0,),
        decimation: int = 8,
        fir: np.ndarray | None = None,
        taps_per_phase: int = 8,
        window: str = "hamming",
    ):
        if len(centers_hz) < 1:
            raise ValueError("need at least one carrier")
        self._template = DDC(
            fs=fs,
            center_hz=float(centers_hz[0]),
            decimation=decimation,
            fir=fir,
            taps_per_phase=taps_per_phase,
            window=window,
        )
        self._fwd = {}  # iq -> jitted vmapped forward (ONE compiled dispatch)
        self.retune(centers_hz)

    def retune(self, centers_hz):
        """Replace the carrier set (next chunk; count must not change
        after the first process call only if you want to avoid a
        retrace — shapes are static per K)."""
        if len(centers_hz) < 1:
            raise ValueError("need at least one carrier")
        self.centers_hz = [float(c) for c in centers_hz]
        fs = self._template.fs
        self._words = [_tuning_word(fs, c) for c in self.centers_hz]

    @property
    def k(self) -> int:
        return len(self.centers_hz)

    @property
    def fs(self) -> float:
        return self._template.fs

    @property
    def output_rate(self) -> float:
        return self._template.output_rate

    @property
    def history_len(self) -> int:
        return self._template.history_len

    @property
    def realized_centers_hz(self) -> list[float]:
        return [_principal_alias_hz(self.fs, w) for w in self._words]

    def initial_state(self, batch_shape: tuple = ()) -> DDCState:
        z = jnp.zeros(
            (self.k,) + tuple(batch_shape) + (self._template.history_len,),
            jnp.float32,
        )
        return DDCState(z, z, 0)

    def _process(self, x, state: DDCState, iq: bool):
        tmpl = self._template
        t = x.shape[-1]
        if t % tmpl.r:
            raise ValueError(f"chunk length {t} not a multiple of R={tmpl.r}")
        batch = x.shape[1:-1] if iq else x.shape[:-1]
        want = (self.k,) + tuple(batch) + (tmpl.history_len,)
        if tuple(state.tail_re.shape) != want:
            raise ValueError(
                f"state shape {tuple(state.tail_re.shape)} != {want}"
            )
        phase0 = jnp.asarray(
            [(state.offset * w) % (1 << 32) for w in self._words], jnp.uint32
        )
        words = jnp.asarray(self._words, jnp.uint32)
        if iq not in self._fwd:
            # jit the vmapped forward: without the outer jit, vmap
            # dispatches op-by-op (measured 10x slower through the tunnel)
            self._fwd[iq] = jax.jit(
                jax.vmap(
                    functools.partial(
                        _ddc_forward.__wrapped__, p=tmpl.p, r=tmpl.r, iq=iq
                    ),
                    in_axes=(None, 0, 0, 0, 0, None),
                )
            )
        ore, oim, tre, tim = self._fwd[iq](
            jnp.asarray(x, jnp.float32),
            state.tail_re,
            state.tail_im,
            phase0,
            words,
            tmpl._h2,
        )
        return {"re": ore, "im": oim}, DDCState(tre, tim, state.offset + t)

    def process(self, x, state: DDCState):
        """Real input (..., T) -> complex planes (K, ..., T/R)."""
        return self._process(x, state, iq=False)

    def process_planes(self, xs, state: DDCState):
        """IQ planes (2, ..., T) -> complex planes (K, ..., T/R)."""
        return self._process(xs, state, iq=True)
