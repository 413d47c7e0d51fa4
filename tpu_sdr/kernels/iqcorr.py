"""Blind IQ imbalance correction (image rejection).

Capability extension — any real quadrature front-end has gain/phase
mismatch between its I and Q paths, which folds a mirror image of every
signal across DC (the reference digitizes a single real channel and
never faces this; an IQ-capable rebuild must). The standard model: the
received stream is

    z[n] = alpha * s[n] + beta * conj(s[n])

for the true (circular) signal s. For a proper signal E[s^2] = 0, so
the "improperness" moment E[z^2] / E[|z|^2] estimates the image leak,
and the one-tap corrector

    w[n] = z[n] - c * conj(z[n]),   c = E[z^2] / (2 * E[|z|^2])

cancels the image to first order (classic blind image-rejection, cf.
Moseley & Slump's adaptive form). The factor 2: E[z^2] = 2*alpha*beta*
E[|s|^2] while the zero of E[w^2] sits at c = beta/conj(alpha) —
halving the raw improperness ratio lands there to first order.

TPU-first mapping: the moments are per-128-sample-block sums (one
reshape + sum, VPU), smoothed across blocks with a leak-rate EMA — a
first-order affine chain evaluated with the same canonical machinery as
the AGC (``kernels/demod._chain_blocks``), so chunked == one-shot
BITWISE at block granularity. Block k is corrected with the estimate
as of block k-1 (strictly causal): the corrector never sees its own
block, which keeps the whole op a pure function of the carried state.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from tpu_sdr.kernels.demod import _chain_blocks


def _iq_block_update(re, im, m2re0, m2im0, p0, lam: float, block: int):
    """Per-block moment EMAs. Returns (c_re, c_im per block (..., G) —
    the PREVIOUS block's estimate ratio, m2/p finals). Shared verbatim
    by the single-device forward and the sharded mirror."""
    lead = re.shape[:-1]
    L = block
    G = re.shape[-1] // L
    rb = re.reshape(*lead, G, L)
    ib = im.reshape(*lead, G, L)
    # Block moments: E[z^2] (complex) and E[|z|^2] (real), mean over L.
    inv = jnp.float32(1.0 / L)
    e2re = jnp.sum(rb * rb - ib * ib, axis=-1) * inv
    e2im = jnp.sum(2.0 * rb * ib, axis=-1) * inv
    pw = jnp.sum(rb * rb + ib * ib, axis=-1) * inv
    # EMA across blocks: m[k] = lam*m[k-1] + (1-lam)*moment[k].
    a = jnp.full(e2re.shape, jnp.float32(lam))
    one_m = jnp.float32(1.0 - lam)
    fin_re, prev_re = _chain_blocks(a, one_m * e2re, m2re0, len(lead))
    fin_im, prev_im = _chain_blocks(a, one_m * e2im, m2im0, len(lead))
    fin_p, prev_p = _chain_blocks(a, one_m * pw, p0, len(lead))
    # prev_* are the EMAs BEFORE each block — the causal estimate.
    # c = E[z^2] / (2 E[|z|^2]) ~= beta/conj(alpha): the first-order zero
    # of E[w^2].
    denom = jnp.maximum(2.0 * prev_p, jnp.float32(1e-12))
    return prev_re / denom, prev_im / denom, fin_re, fin_im, fin_p


def _iq_apply(re, im, c_re, c_im, block: int):
    """w = z - c*conj(z), with per-block c (..., G) broadcast over L."""
    lead = re.shape[:-1]
    L = block
    G = re.shape[-1] // L
    rb = re.reshape(*lead, G, L)
    ib = im.reshape(*lead, G, L)
    cr = c_re[..., None]
    ci = c_im[..., None]
    wre = rb - (cr * rb + ci * ib)
    wim = ib - (ci * rb - cr * ib)
    t = G * L
    return wre.reshape(*lead, t), wim.reshape(*lead, t)


@functools.partial(jax.jit, static_argnames=("lam", "block"))
def _iqcorr_forward(re, im, m2re0, m2im0, p0, lam: float, block: int):
    c_re, c_im, fr, fi, fp = _iq_block_update(
        re, im, m2re0, m2im0, p0, lam, block)
    wre, wim = _iq_apply(re, im, c_re, c_im, block)
    return wre, wim, fr, fi, fp


class IQCorrectorState:
    """EMA moments: E[z^2] (re/im) and E[|z|^2], each (...,)."""

    def __init__(self, m2re, m2im, power, offset: int = 0):
        self.m2re = m2re
        self.m2im = m2im
        self.power = power
        self.offset = int(offset)

    def to_numpy(self) -> dict:
        return {
            "m2re": np.asarray(self.m2re), "m2im": np.asarray(self.m2im),
            "power": np.asarray(self.power), "offset": np.int64(self.offset),
        }

    @classmethod
    def from_numpy(cls, d: dict) -> "IQCorrectorState":
        return cls(jnp.asarray(d["m2re"]), jnp.asarray(d["m2im"]),
                   jnp.asarray(d["power"]), int(d["offset"]))

    def estimate(self):
        """The current corrector tap c = E[z^2]/(2 E[|z|^2])
        (host values, ~= beta/conj(alpha)). Returns a Python complex for
        an unbatched state, a complex ndarray per batch element otherwise
        (review finding: float() raised on batched states the class
        otherwise fully supports)."""
        p = np.maximum(2.0 * np.asarray(self.power, np.float64), 1e-12)
        c = np.asarray(self.m2re, np.float64) / p \
            + 1j * np.asarray(self.m2im, np.float64) / p
        return complex(c) if c.ndim == 0 else c


class IQCorrector:
    """Streaming blind IQ imbalance corrector on complex planes.

    ``leak`` is the per-block EMA retention (time constant ~
    block/(1-leak) samples). Chunk lengths must be multiples of
    ``block``; chunked == one-shot bitwise."""

    def __init__(self, leak: float = 0.99, block: int = 128):
        if not (0.0 <= leak < 1.0):
            raise ValueError(f"leak must be in [0, 1); got {leak}")
        self.leak = float(leak)
        self.block = int(block)

    def initial_state(self, batch_shape: tuple = ()) -> IQCorrectorState:
        z = jnp.zeros(batch_shape, jnp.float32)
        return IQCorrectorState(z, z, z, 0)

    def process(self, re, im, state: IQCorrectorState):
        re = jnp.asarray(re, jnp.float32)
        im = jnp.asarray(im, jnp.float32)
        t = re.shape[-1]
        if t % self.block:
            raise ValueError(
                f"chunk length {t} not a multiple of block={self.block}")
        if tuple(state.power.shape) != tuple(re.shape[:-1]):
            raise ValueError(
                f"state shape {tuple(state.power.shape)} != {tuple(re.shape[:-1])}")
        wre, wim, fr, fi, fp = _iqcorr_forward(
            re, im, state.m2re, state.m2im, state.power,
            lam=self.leak, block=self.block)
        return wre, wim, IQCorrectorState(fr, fi, fp, state.offset + t)


def apply_imbalance(z: np.ndarray, gain_db: float, phase_deg: float):
    """Test helper: impair a complex stream with I/Q gain (dB) and phase
    skew (deg): I' = g*I, Q' = Q*cos(phi) + I*sin(phi) — host NumPy."""
    g = 10.0 ** (gain_db / 20.0)
    phi = np.deg2rad(phase_deg)
    i = g * z.real
    q = z.imag * np.cos(phi) + z.real * np.sin(phi)
    return i + 1j * q
