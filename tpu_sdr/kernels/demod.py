"""Demodulators: FM quadrature discriminator, AM envelope, SSB product
detector, and a block-scan AGC.

Capability extension — the reference is a pure spectrum display: its only
signal product is |FFT| magnitudes shipped to the GUI
(`scripts/fft_analyzer_gui.py:250-260`); nothing in the VHDL recovers a
message signal. These demodulators complete the receiver chain
(DDC -> demod -> Resampler -> audio) the analyzer front-end implies.

TPU-first notes:

- The FM discriminator is the classic quadrature form
  ``f[n] = angle(z[n] * conj(z[n-1])) * fs / (2*pi)`` — one elementwise
  atan2 over the whole chunk (VPU), carried state = one complex sample.
  With zero history the first output is atan2(0, 0) = 0.
- Every recurrence here (de-emphasis pole, DC blocker, AGC loop) is a
  first-order affine recurrence ``y[n] = a[n]*y[n-1] + b[n]`` and runs
  through ONE shared blocked prefix solver: a canonical Hillis-Steele
  composition inside fixed 128-sample blocks (log2(L) elementwise VPU
  passes — no GEMM, so no shape-dependent accumulation order; cf. the
  M=1-GEMV divergence note in docs/ARCHITECTURE.md) plus a sequential
  ``lax.scan`` chain across blocks. Chunked == one-shot BITWISE for any
  block-multiple chunking (tested).
- The SSB product detector reuses the DDC's exact uint32 NCO for the BFO
  (beat-frequency oscillator), so its carrier phase is invariant to
  chunking/sharding by construction. Sideband selection is the filter
  method: the preceding DDC's anti-alias FIR picks the sideband; this
  stage only mixes and takes the real part.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from tpu_sdr.kernels.ddc import _nco_cos_sin, _principal_alias_hz, _tuning_word


# ---------------------------------------------------------------- filters


def deemphasis_sos(fs: float, tau: float = 75e-6) -> np.ndarray:
    """FM de-emphasis: one-pole lowpass with time constant tau
    (75 us US / 50 us EU), impulse-invariant pole, unit DC gain. SOS form
    for documentation/preview; the engine runs the same difference
    equation y[n] = (1-a)*x[n] + a*y[n-1] through the affine solver."""
    a = float(np.exp(-1.0 / (fs * tau)))
    return np.array([[1.0 - a, 0.0, 0.0, 1.0, -a, 0.0]])


def dc_block_sos(r: float = 0.995) -> np.ndarray:
    """DC blocker y[n] = x[n] - x[n-1] + r*y[n-1] (pole at r)."""
    return np.array([[1.0, -1.0, 0.0, 1.0, -float(r), 0.0]])


# ------------------------------------------------- blocked affine solver


def _inblock_prefix(a, b, block: int):
    """Inclusive Hillis-Steele prefix of affine maps inside fixed-size
    blocks: a, b (..., T) -> (A, B) of shape (..., G, L) with
    y_k(in block) = A[..., k] * y_in + B[..., k]. The tree is always over
    exactly L elements, so the op order is identical no matter how many
    blocks a dispatch carries or how blocks are sharded across devices."""
    lead = a.shape[:-1]
    L = block
    G = a.shape[-1] // L
    A = a.reshape(*lead, G, L)
    B = b.reshape(*lead, G, L)
    d = 1
    while d < L:
        pad = [(0, 0)] * (A.ndim - 1) + [(d, 0)]
        A_e = jnp.pad(A[..., :-d], pad, constant_values=1.0)
        B_e = jnp.pad(B[..., :-d], pad)
        A, B = A * A_e, A * B_e + B
        d *= 2
    return A, B


def _chain_blocks(A_last, B_last, y0, lead_ndim: int):
    """Sequential scan over block-final affines (the canonical state
    order): A_last, B_last (..., G); y0 (...,). Returns
    (y_final (...,), y_ins (..., G))."""
    A_g = jnp.moveaxis(A_last, -1, 0)  # (G, ...)
    B_g = jnp.moveaxis(B_last, -1, 0)

    def step(y, ab):
        a_j, b_j = ab
        return a_j * y + b_j, y

    y_final, y_ins = jax.lax.scan(step, y0, (A_g, B_g))
    return y_final, jnp.moveaxis(y_ins, 0, lead_ndim)


def _affine_prefix_raw(a, b, y0, block: int):
    """Solve y[n] = a[n]*y[n-1] + b[n] (inclusive), y[-1] = y0.

    a, b: (..., T) with T % block == 0; y0: (...,). Returns
    (y (..., T), y_final (...,)). The in-block tree is a fixed
    Hillis-Steele over ``block`` elements and the inter-block chain is a
    sequential scan, so the op order — and every rounding — is identical
    for any block-multiple chunking of the stream. Un-jitted so the
    fused forwards and the sharded path inline the identical ops."""
    lead = a.shape[:-1]
    A, B = _inblock_prefix(a, b, block)
    y_final, y_ins = _chain_blocks(A[..., -1], B[..., -1], y0, len(lead))
    y = A * y_ins[..., None] + B
    return y.reshape(*lead, a.shape[-1]), y_final


# --------------------------------------------------------- FM discriminator


def _fm_disc_raw(re, im, prev_re, prev_im, fs: float):
    """Instantaneous frequency (Hz) of z = re + j*im, one sample of
    history carried in prev_* (..., 1). Un-jitted so the sharded path
    can inline the identical ops."""
    re1 = jnp.concatenate([prev_re, re[..., :-1]], axis=-1)
    im1 = jnp.concatenate([prev_im, im[..., :-1]], axis=-1)
    dot = re * re1 + im * im1
    cross = im * re1 - re * im1
    return jnp.arctan2(cross, dot) * jnp.float32(fs / (2.0 * np.pi))


_fm_disc = functools.partial(jax.jit, static_argnames=("fs",))(_fm_disc_raw)


def fm_discriminate(re, im, prev_re, prev_im, fs: float):
    """Functional form: (..., T) planes -> instantaneous Hz (..., T)."""
    return _fm_disc(re, im, prev_re, prev_im, fs)


# ------------------------------------------------------------------- AGC


class AGCState:
    def __init__(self, gain, offset: int = 0):
        self.gain = gain
        self.offset = int(offset)

    def to_numpy(self) -> dict:
        return {"gain": np.asarray(self.gain), "offset": np.int64(self.offset)}

    @classmethod
    def from_numpy(cls, d: dict) -> "AGCState":
        return cls(jnp.asarray(d["gain"]), int(d["offset"]))


def _agc_solve(mag, g0, mu: float, ref: float, block: int, affine=_affine_prefix_raw,
               **affine_kw):
    """Shared gain solve for y[n] = g[n-1]*x[n] under the linear loop
    g[n] = g[n-1]*(1 - mu*mag[n]) + mu*ref. Returns (g inclusive,
    g_final); textually shared by the single-device fused forwards and
    the sharded mirror so both graphs fold identically.

    The loop factor is floored at 0: an input spike with mag > 1/mu
    would flip the gain's sign, and sustained mag > 2/mu makes the
    unclamped recurrence diverge to +-inf (review finding — e.g. raw
    int16-scale envelopes fed to the default mu). Floor-at-zero snaps
    the gain straight to mu*ref (the hardest legitimate correction) and
    is bit-neutral for the normalized signals the loop is designed for
    (mu*mag << 1)."""
    return affine(
        jnp.maximum(1.0 - jnp.float32(mu) * mag, jnp.float32(0.0)),
        jnp.broadcast_to(jnp.float32(mu * ref), mag.shape),
        g0, block, **affine_kw)


@functools.partial(jax.jit, static_argnames=("mu", "ref", "block"))
def _agc_forward_real(x, g0, mu: float, ref: float, block: int):
    mag = jnp.abs(x)
    g, g_final = _agc_solve(mag, g0, mu, ref, block)
    g_prev = jnp.concatenate([g0[..., None], g[..., :-1]], axis=-1)
    return g_prev * x, g_final


@functools.partial(jax.jit, static_argnames=("mu", "ref", "block"))
def _agc_forward_planes(re, im, g0, mu: float, ref: float, block: int):
    mag = jnp.sqrt(re * re + im * im)
    g, g_final = _agc_solve(mag, g0, mu, ref, block)
    g_prev = jnp.concatenate([g0[..., None], g[..., :-1]], axis=-1)
    return g_prev * re, g_prev * im, g_final


class AGC:
    """Streaming automatic gain control toward envelope ``ref``.

    ``mu`` is the loop gain per sample (time constant ~ 1/(mu*ref)
    samples). Chunk lengths must be multiples of ``block``."""

    def __init__(self, mu: float = 1e-3, ref: float = 1.0, block: int = 128,
                 g_init: float = 1.0):
        if not (0.0 < mu < 1.0):
            raise ValueError(f"mu must be in (0, 1); got {mu}")
        self.mu = float(mu)
        self.ref = float(ref)
        self.block = int(block)
        self.g_init = float(g_init)

    def initial_state(self, batch_shape: tuple = ()) -> AGCState:
        return AGCState(jnp.full(batch_shape, self.g_init, jnp.float32), 0)

    def _check(self, x, state: AGCState):
        t = x.shape[-1]
        if t % self.block:
            raise ValueError(
                f"chunk length {t} not a multiple of block={self.block}")
        if tuple(state.gain.shape) != tuple(x.shape[:-1]):
            raise ValueError(
                f"state shape {tuple(state.gain.shape)} != {tuple(x.shape[:-1])}")

    def process_real(self, x, state: AGCState):
        x = jnp.asarray(x, jnp.float32)
        self._check(x, state)
        y, g_final = _agc_forward_real(
            x, state.gain, mu=self.mu, ref=self.ref, block=self.block)
        return y, AGCState(g_final, state.offset + x.shape[-1])

    def process(self, re, im, state: AGCState):
        """Complex planes: one gain track drives both planes."""
        re = jnp.asarray(re, jnp.float32)
        im = jnp.asarray(im, jnp.float32)
        self._check(re, state)
        yre, yim, g_final = _agc_forward_planes(
            re, im, state.gain, mu=self.mu, ref=self.ref, block=self.block)
        return yre, yim, AGCState(g_final, state.offset + re.shape[-1])


# ----------------------------------------------------------------- squelch


class SquelchState:
    def __init__(self, power, offset: int = 0):
        self.power = power
        self.offset = int(offset)

    def to_numpy(self) -> dict:
        return {"power": np.asarray(self.power), "offset": np.int64(self.offset)}

    @classmethod
    def from_numpy(cls, d: dict) -> "SquelchState":
        return cls(jnp.asarray(d["power"]), int(d["offset"]))


@functools.partial(jax.jit, static_argnames=("lam", "thresh", "block"))
def _squelch_forward(re, im, p0, lam: float, thresh: float, block: int):
    """Per-block baseband power EMA -> open/closed gate. Block k is
    gated on the EMA as of block k-1 (causal)."""
    lead = re.shape[:-1]
    L = block
    G = re.shape[-1] // L
    rb = re.reshape(*lead, G, L)
    ib = im.reshape(*lead, G, L)
    pw = jnp.sum(rb * rb + ib * ib, axis=-1) * jnp.float32(1.0 / L)
    a = jnp.full(pw.shape, jnp.float32(lam))
    p_final, p_prev = _chain_blocks(a, jnp.float32(1.0 - lam) * pw, p0,
                                    len(lead))
    gate = (p_prev > jnp.float32(thresh)).astype(jnp.float32)
    return gate, p_final


class Squelch:
    """Carrier-power squelch: mutes audio while the baseband power EMA
    sits below ``threshold`` (linear mean|z|^2; use
    ``10**(dB/10)``). ``gates`` returns a per-sample 0/1 mask aligned to
    the input; multiply it into the audio. Chunked == one-shot bitwise
    at block granularity."""

    def __init__(self, threshold: float, leak: float = 0.99,
                 block: int = 128):
        if threshold <= 0:
            raise ValueError(f"threshold must be > 0; got {threshold}")
        if not (0.0 <= leak < 1.0):
            raise ValueError(f"leak must be in [0, 1); got {leak}")
        self.threshold = float(threshold)
        self.leak = float(leak)
        self.block = int(block)

    def initial_state(self, batch_shape: tuple = ()) -> SquelchState:
        return SquelchState(jnp.zeros(batch_shape, jnp.float32), 0)

    def gates(self, re, im, state: SquelchState):
        re = jnp.asarray(re, jnp.float32)
        im = jnp.asarray(im, jnp.float32)
        t = re.shape[-1]
        if t % self.block:
            raise ValueError(
                f"chunk length {t} not a multiple of block={self.block}")
        if tuple(state.power.shape) != tuple(re.shape[:-1]):
            raise ValueError(
                f"state shape {tuple(state.power.shape)} != {tuple(re.shape[:-1])}")
        gate, p_final = _squelch_forward(
            re, im, state.power, lam=self.leak, thresh=self.threshold,
            block=self.block)
        per_sample = jnp.repeat(gate, self.block, axis=-1)
        return per_sample, SquelchState(p_final, state.offset + t)


# ------------------------------------------------------------ demodulators


@functools.partial(jax.jit, static_argnames=("fs", "dev", "pole", "block"))
def _fm_forward(re, im, prev_re, prev_im, filt, fs: float, dev: float,
                pole, block: int):
    """Fused FM forward — ONE graph, so XLA's algebraic simplifications
    apply identically here and in the sharded mirror (shard/demod.py);
    separate per-stage jits would fold differently and break sharded
    bitwise parity (measured: 1-ulp divergence from the scale-multiply
    fold)."""
    audio = _fm_disc_raw(re, im, prev_re, prev_im, fs)
    audio = audio * jnp.float32(1.0 / dev)
    if pole is not None:
        a = jnp.float32(pole)
        audio, filt = _affine_prefix_raw(
            jnp.broadcast_to(a, audio.shape), (1.0 - a) * audio, filt, block)
    return audio, re[..., -1:], im[..., -1:], filt


@functools.partial(jax.jit, static_argnames=("pole", "block"))
def _am_forward(re, im, prev_re, prev_im, filt, pole: float, block: int):
    env = jnp.sqrt(re * re + im * im)
    prev_env = jnp.sqrt(prev_re * prev_re + prev_im * prev_im)
    env1 = jnp.concatenate([prev_env, env[..., :-1]], axis=-1)
    audio, filt = _affine_prefix_raw(
        jnp.broadcast_to(jnp.float32(pole), env.shape), env - env1, filt,
        block)
    return audio, re[..., -1:], im[..., -1:], filt


@jax.jit
def _ssb_forward(re, im, phase0, word):
    c, s = _nco_cos_sin(phase0, word, re.shape[-1])
    audio = re * c + im * s  # Re{z * (c - j*s)}
    return audio, re[..., -1:], im[..., -1:]


class DemodState:
    """prev complex sample (planes (..., 1)) + filter state (...,) +
    absolute sample offset (host int, drives the SSB BFO phase)."""

    def __init__(self, prev_re, prev_im, filt, offset: int = 0):
        self.prev_re = prev_re
        self.prev_im = prev_im
        self.filt = filt
        self.offset = int(offset)

    def to_numpy(self) -> dict:
        return {
            "prev_re": np.asarray(self.prev_re),
            "prev_im": np.asarray(self.prev_im),
            "filt": np.asarray(self.filt),
            "offset": np.int64(self.offset),
        }

    @classmethod
    def from_numpy(cls, d: dict) -> "DemodState":
        return cls(
            jnp.asarray(d["prev_re"]), jnp.asarray(d["prev_im"]),
            jnp.asarray(d["filt"]), int(d["offset"]),
        )


class FMDemodulator:
    """FM: quadrature discriminator -> /deviation -> de-emphasis.

    Input: complex baseband planes at ``fs`` (a DDC output). Output:
    audio at the same rate, ~[-1, 1] for full deviation; compose a
    ``Resampler`` for the sound-card rate. ``deemphasis_tau=None``
    disables the de-emphasis pole.

    ``use_pallas=True`` routes through the fused Mosaic kernel
    (``kernels/pallas/affine_scan.fm_demod_pallas``): one HBM pass,
    in-VMEM prefix + chain over the same canonical 128-sample blocks.
    Its bits differ ~5e-9 from the XLA path (roll+mask tree vs pad
    shifts), but are invariant to chunking and tile width, so the
    chunked == one-shot contract holds within the path. Requires
    block == 128; the sharded mirror always uses the XLA raw ops."""

    def __init__(self, fs: float, deviation_hz: float = 75e3,
                 deemphasis_tau: float | None = 75e-6, block: int = 128,
                 use_pallas: bool = False):
        self.fs = float(fs)
        self.deviation_hz = float(deviation_hz)
        self.tau = deemphasis_tau
        self.block = int(block)
        self._pole = (None if deemphasis_tau is None
                      else float(np.exp(-1.0 / (self.fs * deemphasis_tau))))
        if use_pallas and self.block != 128:
            raise ValueError("use_pallas requires block=128")
        self.use_pallas = bool(use_pallas)

    def initial_state(self, batch_shape: tuple = ()) -> DemodState:
        b = tuple(batch_shape)
        z1 = jnp.zeros(b + (1,), jnp.float32)
        return DemodState(z1, z1, jnp.zeros(b, jnp.float32), 0)

    def _process_pallas(self, re, im, state: DemodState):
        from tpu_sdr.kernels.pallas.affine_scan import fm_demod_pallas

        lead = re.shape[:-1]
        t = re.shape[-1]
        c = int(np.prod(lead, dtype=np.int64)) if lead else 1
        n_blocks = t // 128
        # Largest tile width (<= 64 blocks) dividing the chunk; the kernel's
        # math is bitwise invariant to this choice (block-local tree +
        # sequential chain), so different chunk lengths stay consistent.
        rows = next(r for r in range(min(64, n_blocks), 0, -1)
                    if n_blocks % r == 0)
        audio, pr, pi, filt = fm_demod_pallas(
            re.reshape(c, t), im.reshape(c, t),
            state.prev_re.reshape(c, 1), state.prev_im.reshape(c, 1),
            state.filt.reshape(c),
            fs=self.fs, dev=self.deviation_hz, pole=self._pole,
            rows_per_tile=rows,
            interpret=jax.default_backend() == "cpu")
        return (audio.reshape(*lead, t),
                DemodState(pr.reshape(*lead, 1), pi.reshape(*lead, 1),
                           filt.reshape(lead), state.offset + t))

    def process(self, re, im, state: DemodState):
        re = jnp.asarray(re, jnp.float32)
        im = jnp.asarray(im, jnp.float32)
        t = re.shape[-1]
        if t % self.block:
            raise ValueError(
                f"chunk length {t} not a multiple of block={self.block}")
        if self.use_pallas:
            return self._process_pallas(re, im, state)
        audio, pr, pi, filt = _fm_forward(
            re, im, state.prev_re, state.prev_im, state.filt,
            fs=self.fs, dev=self.deviation_hz, pole=self._pole,
            block=self.block)
        return audio, DemodState(pr, pi, filt, state.offset + t)


class AMDemodulator:
    """AM: envelope |z| -> DC block. Output ~carrier-amplitude-scaled;
    add an ``AGC`` stage for constant loudness."""

    def __init__(self, fs: float, dc_pole: float = 0.995, block: int = 128):
        self.fs = float(fs)
        self.block = int(block)
        self.dc_pole = float(dc_pole)

    def initial_state(self, batch_shape: tuple = ()) -> DemodState:
        b = tuple(batch_shape)
        z1 = jnp.zeros(b + (1,), jnp.float32)
        return DemodState(z1, z1, jnp.zeros(b, jnp.float32), 0)

    def process(self, re, im, state: DemodState):
        re = jnp.asarray(re, jnp.float32)
        im = jnp.asarray(im, jnp.float32)
        t = re.shape[-1]
        if t % self.block:
            raise ValueError(
                f"chunk length {t} not a multiple of block={self.block}")
        audio, pr, pi, filt = _am_forward(
            re, im, state.prev_re, state.prev_im, state.filt,
            pole=self.dc_pole, block=self.block)
        return audio, DemodState(pr, pi, filt, state.offset + t)


class SSBDemodulator:
    """SSB product detector: audio = Re{z * exp(-j*2*pi*bfo*n/fs)}.

    Sideband selection is done by the preceding DDC (filter method):
    tune the DDC so the wanted sideband sits inside its FIR passband;
    ``bfo_hz`` then re-inserts the carrier offset (signed — negative
    values shift for LSB tuning conventions). The BFO rides the exact
    uint32 NCO, so chunked == one-shot bitwise at any chunking."""

    def __init__(self, fs: float, bfo_hz: float = 0.0):
        self.fs = float(fs)
        self.retune(bfo_hz)

    def retune(self, bfo_hz: float):
        self.bfo_hz = float(bfo_hz)
        self._word = _tuning_word(self.fs, self.bfo_hz)

    @property
    def realized_bfo_hz(self) -> float:
        return _principal_alias_hz(self.fs, self._word)

    def initial_state(self, batch_shape: tuple = ()) -> DemodState:
        z1 = jnp.zeros(tuple(batch_shape) + (1,), jnp.float32)
        return DemodState(z1, z1, jnp.zeros(tuple(batch_shape), jnp.float32), 0)

    def process(self, re, im, state: DemodState):
        re = jnp.asarray(re, jnp.float32)
        im = jnp.asarray(im, jnp.float32)
        t = re.shape[-1]
        phase0 = jnp.uint32((state.offset * self._word) % (1 << 32))
        audio, pr, pi = _ssb_forward(re, im, phase0, jnp.uint32(self._word))
        return audio, DemodState(pr, pi, state.filt, state.offset + t)
