"""FM stereo (MPX) decoder: pilot-locked L/R recovery, filter-free.

Capability extension — the reference is a spectrum display; this
framework's receiver chain recovers audio (`runtime/receiver.py`), and
this module completes broadcast FM by decoding the stereo multiplex:

    m(t) = (L+R)/2  +  cos(2*theta_p(t)) * (L-R)/2  +  a_p*cos(theta_p(t))

with the 19 kHz pilot at theta_p and the L-R DSB subcarrier locked to
exactly twice its phase. The decoder recovers the 38 kHz carrier from
the pilot and matrixes L = sum+diff, R = sum-diff.

TPU-first design — NO bandpass/lowpass FIRs anywhere in the decoder:

- **Pilot extraction is a per-128-sample-block correlator against the
  exact uint32 NCO** (`kernels/ddc._nco_cos_sin`): the block phasor
  A_g = (2/L)*sum m[n]*e^{-j theta_nco[n]} is one reshape+sum (VPU).
  The NCO runs on the absolute sample offset, so the correlator — and
  everything downstream — is bitwise invariant to chunking.
- **Phase/frequency tracking is two complex EMAs over blocks** (the
  canonical `_chain_blocks` affine machinery shared with AGC/IQcorr):
  one on A_g (pilot phasor), one on the block-to-block rotation
  B_g = A_g * conj(A_{g-1}) (pilot frequency error vs the NCO). A
  steady EMA tracking a phasor rotating w per block lags by the
  complex factor C = (1-lam)/(1 - lam*e^{-jw}); the tracker divides
  that factor back out using the measured rotation, so a pilot a few
  Hz off the NCO (broadcast spec is +/-2 Hz) is tracked with no
  first-order phase lag.
- **Strictly causal**: block g uses the EMAs as of block g-1 (advanced
  one block by the measured rotation), so the whole op is a pure
  function of the carried state — the same contract as the AGC.
- **Carrier doubling is algebraic**: the unit phasor at 2*phi is
  U^2/|U|^2, and the 38 kHz NCO reuses the doubled tuning word
  (2*k19 mod 2^32 — exact, so pilot and subcarrier stay phase-locked
  by construction). cos(2*theta+2*phi) = c38*cos(2phi) - s38*sin(2phi).

The matrixed outputs still contain the >=19 kHz multiplex residue
(pilot, DSB images); de-emphasis (optional here, on by default in the
`Receiver`) plus the audio resampler's anti-alias lowpass attenuate it
below ~-40 dBFS. ``subcarrier_gain`` compensates upstream droop at
38 kHz — e.g. the one-lag discriminator's sinc response
(`Receiver` passes (pi*38k/fs)/sin(pi*38k/fs) automatically).

A silent pilot (mono broadcast) drops the per-block gate to zero and
the decoder degrades to L == R == m exactly.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from tpu_sdr.kernels.ddc import _nco_cos_sin, _principal_alias_hz, _tuning_word
from tpu_sdr.kernels.demod import _affine_prefix_raw, _chain_blocks

PILOT_HZ = 19_000.0


def _hann_corr_win(block: int):
    """The normalized periodic-Hann correlator window (see _block_phasor)."""
    n_b = np.arange(block)
    w_np = 0.5 - 0.5 * np.cos(2.0 * np.pi * n_b / block)
    return jnp.asarray(2.0 * w_np / w_np.sum(), jnp.float32)


def _track_pilot(prev_ar, prev_ai, prev_br, prev_bi, *, lam: float,
                 thresh: float, w_max: float):
    """Per-block pilot tracking from the EMA states-as-of-block-(g-1):
    rotation clamp, EMA de-lag, one-block advance, squaring, gate.
    Shared verbatim by the single-device and sharded paths so
    sharded == single-device stays bitwise. Returns (d2r, d2i, gate, p2):
    the unit doubled phasor, the stereo gate, and |pilot|^2 per block."""
    lam_f = jnp.float32(lam)
    one_m = jnp.float32(1.0 - lam)
    # unit per-block rotation phasor w (pilot frequency error vs NCO),
    # clamped to the plausible drift range: without the clamp, a
    # noise-driven w lets the de-lag factor below amplify the A-EMA by
    # up to (1+lam)/(1-lam) (measured: a mono input synthesized a
    # phantom pilot 400x above the noise floor)
    bmag = jnp.sqrt(prev_br * prev_br + prev_bi * prev_bi)
    safe_b = bmag > jnp.float32(1e-12)
    wr_raw = jnp.where(safe_b, prev_br / jnp.maximum(bmag, 1e-12), 1.0)
    wi_raw = jnp.where(safe_b, prev_bi / jnp.maximum(bmag, 1e-12), 0.0)
    s_max = jnp.float32(np.sin(w_max))
    wi = jnp.clip(jnp.where(wr_raw > 0, wi_raw, jnp.sign(wi_raw)), -s_max, s_max)
    wr = jnp.sqrt(jnp.maximum(1.0 - wi * wi, 0.0))
    # de-lag the A-EMA: divide by C = (1-lam)/(1-lam*conj(w)), then
    # advance one block (the EMA is causal: it ends at block g-1)
    dr = (1.0 - lam_f * wr) / one_m  # (1 - lam*conj(w)) / (1-lam)
    di = (lam_f * wi) / one_m
    ur = prev_ar * dr - prev_ai * di
    ui = prev_ar * di + prev_ai * dr
    ur, ui = ur * wr - ui * wi, ur * wi + ui * wr  # advance by w

    p2 = ur * ur + ui * ui  # |pilot|^2 estimate per block
    gate = (p2 > jnp.float32(thresh * thresh)).astype(jnp.float32)
    # unit doubled phasor e^{j2phi} = U^2 / |U|^2
    inv = 1.0 / jnp.maximum(p2, jnp.float32(1e-12))
    d2r = (ur * ur - ui * ui) * inv
    d2i = (2.0 * ur * ui) * inv
    return d2r, d2i, gate, p2


def _block_phasor(m, c19, s19, win, block: int):
    """Per-block pilot correlator: (..., T) -> (A_re, A_im) (..., G).

    ``win`` is a Hann window over the block: a boxcar correlator's -31 dB
    Dirichlet sidelobes let audio/DSB content (18-34 kHz away) leak in
    with block-to-block-CORRELATED phase, which biases the downstream
    rotation estimate — and the EMA de-lag correction amplifies any
    rotation bias by ~lam/(1-lam) blocks of phase (measured: a 0.011
    rad/block leakage bias threw the recovered carrier 1.15 rad off).
    The Hann taper puts those sidelobes below -65 dB."""
    lead = m.shape[:-1]
    g = m.shape[-1] // block
    rb = (m * c19).reshape(*lead, g, block)
    ib = (m * (-s19)).reshape(*lead, g, block)
    return jnp.sum(rb * win, axis=-1), jnp.sum(ib * win, axis=-1)


def _stereo_forward(m, a_re0, a_im0, b_re0, b_im0, last_re0, last_im0,
                    filt0, phase19, k19, *, lam: float, thresh: float,
                    sub_gain: float, pole, block: int, w_max: float):
    """One chunk of MPX -> stacked (L, R) planes (..., 2, T) + state
    finals. Un-jitted so a sharded mirror could inline identical ops."""
    lead = m.shape[:-1]
    t = m.shape[-1]
    g = t // block
    c19, s19 = _nco_cos_sin(phase19, k19, t)
    # doubled word/phase: exact mod-2^32 arithmetic keeps the 38 kHz
    # carrier phase-locked to the pilot NCO for any stream offset
    c38, s38 = _nco_cos_sin(phase19 * jnp.uint32(2), k19 * jnp.uint32(2), t)

    # periodic Hann, normalized so a full-scale pilot reads amplitude 1
    win = _hann_corr_win(block)
    ar, ai = _block_phasor(m, c19, s19, win, block)  # (..., G)

    # rotation products B_g = A_g * conj(A_{g-1}); A_{-1} carried
    pr = jnp.concatenate([last_re0[..., None], ar[..., :-1]], axis=-1)
    pi = jnp.concatenate([last_im0[..., None], ai[..., :-1]], axis=-1)
    br = ar * pr + ai * pi
    bi = ai * pr - ar * pi

    lam_f = jnp.float32(lam)
    one_m = jnp.float32(1.0 - lam)
    a_bc = jnp.full(ar.shape, lam_f)
    fin_ar, prev_ar = _chain_blocks(a_bc, one_m * ar, a_re0, len(lead))
    fin_ai, prev_ai = _chain_blocks(a_bc, one_m * ai, a_im0, len(lead))
    fin_br, prev_br = _chain_blocks(a_bc, one_m * br, b_re0, len(lead))
    fin_bi, prev_bi = _chain_blocks(a_bc, one_m * bi, b_im0, len(lead))

    d2r, d2i, gate, p2 = _track_pilot(
        prev_ar, prev_ai, prev_br, prev_bi,
        lam=lam, thresh=thresh, w_max=w_max)

    # cos(2theta + 2phi) per sample, per-block phasor broadcast over L
    c38b = c38.reshape(*([1] * len(lead)), g, block)
    s38b = s38.reshape(*([1] * len(lead)), g, block)
    carrier = c38b * d2r[..., None] - s38b * d2i[..., None]
    mb = m.reshape(*lead, g, block)
    diff = (2.0 * jnp.float32(sub_gain)) * mb * carrier * gate[..., None]
    left = (mb + diff).reshape(*lead, t)
    right = (mb - diff).reshape(*lead, t)
    lr = jnp.stack([left, right], axis=len(lead))  # (..., 2, T)

    if pole is not None:
        a_de = jnp.broadcast_to(jnp.float32(pole), lr.shape)
        lr, filt = _affine_prefix_raw(
            a_de, (1.0 - jnp.float32(pole)) * lr, filt0, block)
    else:
        filt = filt0
    return (lr, fin_ar, fin_ai, fin_br, fin_bi,
            ar[..., -1], ai[..., -1], filt, p2[..., -1])


_stereo_jit = functools.partial(
    jax.jit,
    static_argnames=("lam", "thresh", "sub_gain", "pole", "block", "w_max"))(
        _stereo_forward)


class StereoDecoderState:
    """Carried state: pilot-phasor EMA (a), rotation EMA (b), the last
    raw block phasor, per-channel de-emphasis state (..., 2), and the
    absolute sample offset driving the NCO."""

    def __init__(self, a_re, a_im, b_re, b_im, last_re, last_im, filt,
                 offset: int = 0, pilot_pow: float = 0.0):
        self.a_re, self.a_im = a_re, a_im
        self.b_re, self.b_im = b_re, b_im
        self.last_re, self.last_im = last_re, last_im
        self.filt = filt
        self.offset = int(offset)
        # |pilot|^2 estimate at chunk end — kept as a DEVICE array (per
        # batch/station) like every other state leaf: converting it to a
        # Python float per chunk forced a completion-wait sync in the
        # streaming hot path (~35 ms flat per host sync on the tunnel,
        # CLAUDE.md) and collapsed batched streams to one shared scalar
        # (review finding). Fetch lazily via pilot_level()/to_numpy().
        self.pilot_pow = pilot_pow

    def to_numpy(self) -> dict:
        return {
            "a_re": np.asarray(self.a_re), "a_im": np.asarray(self.a_im),
            "b_re": np.asarray(self.b_re), "b_im": np.asarray(self.b_im),
            "last_re": np.asarray(self.last_re),
            "last_im": np.asarray(self.last_im),
            "filt": np.asarray(self.filt),
            "offset": np.int64(self.offset),
            "pilot_pow": np.asarray(self.pilot_pow, np.float64),
        }

    @classmethod
    def from_numpy(cls, d: dict) -> "StereoDecoderState":
        return cls(
            jnp.asarray(d["a_re"]), jnp.asarray(d["a_im"]),
            jnp.asarray(d["b_re"]), jnp.asarray(d["b_im"]),
            jnp.asarray(d["last_re"]), jnp.asarray(d["last_im"]),
            jnp.asarray(d["filt"]), int(d["offset"]),
            np.asarray(d.get("pilot_pow", 0.0), np.float64),
        )

    def pilot_level(self):
        """Estimated pilot amplitude (same units as the MPX input).

        Fetches lazily (one small sync HERE, not per streamed chunk).
        Returns a float for an unbatched stream, a per-station array
        otherwise."""
        p = np.asarray(self.pilot_pow, np.float64)
        lvl = np.sqrt(np.maximum(p, 0.0))
        return float(lvl) if lvl.ndim == 0 else lvl


class StereoDecoder:
    """Streaming FM stereo MPX decoder.

    Input: the demodulated MPX (deviation-normalized discriminator
    output) at ``fs`` >= ~106 kHz. Output: stacked (L, R) planes
    (..., 2, T) at the same rate. Chunk lengths must be multiples of
    ``block``; chunked == one-shot bitwise.

    ``leak``: per-block EMA retention of the pilot tracker (lock time
    ~ block/(1-leak) samples). ``pilot_threshold``: pilot amplitude
    (vs the MPX scale) below which the decoder gates to mono.
    ``deemphasis_tau``: per-channel de-emphasis (None = off).
    ``subcarrier_gain``: L-R gain trim for upstream droop at 38 kHz.
    """

    def __init__(self, fs: float, leak: float = 0.995,
                 pilot_threshold: float = 0.02,
                 deemphasis_tau: float | None = None,
                 subcarrier_gain: float = 1.0, block: int = 128,
                 max_pilot_offset_hz: float = 4.0):
        if fs < 106_000.0:  # 2 * (38 kHz subcarrier + 15 kHz sideband)
            raise ValueError(
                f"fs={fs} too low for the 38 kHz subcarrier + 15 kHz audio")
        if not (0.0 <= leak < 1.0):
            raise ValueError(f"leak must be in [0, 1); got {leak}")
        self.fs = float(fs)
        self.leak = float(leak)
        self.pilot_threshold = float(pilot_threshold)
        self.tau = deemphasis_tau
        self.subcarrier_gain = float(subcarrier_gain)
        self.block = int(block)
        self._pole = (None if deemphasis_tau is None
                      else float(np.exp(-1.0 / (self.fs * deemphasis_tau))))
        self._word = _tuning_word(self.fs, PILOT_HZ)
        # max tracked pilot drift, as rotation per block (rad)
        self._w_max = float(
            2.0 * np.pi * max_pilot_offset_hz * self.block / self.fs)

    @property
    def realized_pilot_hz(self) -> float:
        return _principal_alias_hz(self.fs, self._word)

    def initial_state(self, batch_shape: tuple = ()) -> StereoDecoderState:
        b = tuple(batch_shape)
        z = jnp.zeros(b, jnp.float32)
        return StereoDecoderState(
            z, z, z, z, z, z, jnp.zeros(b + (2,), jnp.float32), 0)

    def process(self, m, state: StereoDecoderState):
        """MPX (..., T) -> ((..., 2, T) L/R, new state)."""
        m = jnp.asarray(m, jnp.float32)
        t = m.shape[-1]
        if t % self.block:
            raise ValueError(
                f"chunk length {t} not a multiple of block={self.block}")
        if tuple(state.a_re.shape) != tuple(m.shape[:-1]):
            raise ValueError(
                f"state shape {tuple(state.a_re.shape)} != {tuple(m.shape[:-1])}")
        phase0 = jnp.uint32((state.offset * self._word) % (1 << 32))
        (lr, far, fai, fbr, fbi, lre, lim, filt, p2) = _stereo_jit(
            m, state.a_re, state.a_im, state.b_re, state.b_im,
            state.last_re, state.last_im, state.filt,
            phase0, jnp.uint32(self._word),
            lam=self.leak, thresh=self.pilot_threshold,
            sub_gain=self.subcarrier_gain, pole=self._pole, block=self.block,
            w_max=self._w_max)
        new = StereoDecoderState(
            far, fai, fbr, fbi, lre, lim, filt, state.offset + t, p2)
        return lr, new


def make_mpx(left: np.ndarray, right: np.ndarray, fs: float,
             pilot_amp: float = 0.09, pilot_hz: float = PILOT_HZ,
             pilot_phase: float = 0.0, audio_gain: float = 0.9) -> np.ndarray:
    """Host-side stereo multiplex generator (float64) for tests/demos:
    audio_gain*((L+R)/2 + cos(2*theta)*(L-R)/2) + pilot_amp*cos(theta)."""
    left = np.asarray(left, np.float64)
    right = np.asarray(right, np.float64)
    n = left.shape[-1]
    theta = 2.0 * np.pi * pilot_hz * np.arange(n) / fs + pilot_phase
    s = 0.5 * (left + right)
    d = 0.5 * (left - right)
    return audio_gain * (s + np.cos(2.0 * theta) * d) + pilot_amp * np.cos(theta)
