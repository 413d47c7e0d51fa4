"""Forward error correction: convolutional codes + batched Viterbi decoding.

Capability extension — the reference transmits raw spectra with a CRC32
frame check only (`imp/crc_generator.vhd`; no channel coding anywhere in
the RTL), and its GUI never recovers bits at all
(`scripts/fft_analyzer_gui.py:250-260`). This module adds the channel
code layer under the digital burst modem (`kernels/digital.py`): a
rate-1/n non-recursive convolutional encoder with optional puncturing,
and a soft/hard-decision Viterbi decoder.

TPU-first design:

- **The batch axis is the parallel axis.** Viterbi is a sequential
  trellis recursion by nature; the TPU-shaped formulation keeps the
  per-step work fully vectorized — one `lax.scan` over trellis steps
  whose body is two (B, n)@(n, S) branch-metric matmuls plus an
  elementwise add-compare-select over all S states of all B bursts at
  once — and amortizes the scan across many bursts per dispatch
  (serving decodes bursts in batches, exactly like `BurstModem`'s
  batched demodulation).
- **No data-dependent control flow**: predecessor wiring is two static
  index tables baked into the program; the traceback is a second
  (reversed) `lax.scan` with `take_along_axis` selects.
- A tropical-algebra ((max,+) matrix product) block-parallel scan over
  the time axis was considered and rejected for this regime: it raises
  the per-step cost from O(S) to O(S^2)..O(S^3) to shorten an axis that
  the batch dimension already amortizes.
- Per-step path metrics are re-zeroed against their running maximum, so
  float32 never accumulates toward overflow regardless of burst length.

Conventions:

- Generator polynomials are given in the standard octal form with the
  MSB as the D^0 (newest-input) tap — e.g. the NASA/Voyager K=7 pair
  ``(0o133, 0o171)`` is G1 = 1+D^2+D^3+D^5+D^6, G2 = 1+D+D^2+D^3+D^6.
- Encoding is zero-terminated: K-1 tail zeros flush the register, so
  the decoder tracebacks from state 0 (no truncation loss at burst
  ends).
- Soft inputs follow the positive-means-zero convention: the LLR/
  channel value for coded bit c is positive when c = 0 is more likely
  (BPSK mapping x = (1-2c) + noise satisfies this directly).
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp


_NEG = -1e9  # "minus infinity" for float32 path metrics


def _poly_taps(poly: int, k: int) -> np.ndarray:
    """Octal generator -> tap array t[i] = coefficient of D^i (multiplies
    u_{n-i}), using the MSB = D^0 convention described in the module
    docstring."""
    if poly <= 0 or poly >= (1 << k):
        raise ValueError(f"polynomial {poly:#o} does not fit constraint length {k}")
    bits = [(poly >> (k - 1 - i)) & 1 for i in range(k)]
    return np.array(bits, np.uint8)


# Standard puncturing patterns for a rate-1/2 mother code (802.11a/DVB-style).
# pattern[j, p] == 1 keeps output stream j at trellis step (k mod P).
_PUNCTURE_PATTERNS = {
    "1/2": np.array([[1], [1]], np.uint8),
    "2/3": np.array([[1, 1], [1, 0]], np.uint8),
    "3/4": np.array([[1, 0, 1], [1, 1, 0]], np.uint8),
}


class ConvCode:
    """Rate-1/n convolutional code with Viterbi decoding on device.

    Parameters
    ----------
    constraint_len : total register length K (state = K-1 bits).
    polys : octal generators, one per output stream (n = len(polys)).
    puncture : None / "1/2" (no-op) / "2/3" / "3/4" for the standard
        rate-1/2 patterns, or an explicit (n, P) 0/1 array applied
        cyclically over trellis steps.
    """

    def __init__(self, constraint_len: int = 7,
                 polys: tuple[int, ...] = (0o133, 0o171),
                 puncture=None):
        self.k = int(constraint_len)
        if self.k < 2 or self.k > 12:
            raise ValueError(f"constraint length {self.k} out of range [2, 12]")
        self.polys = tuple(int(p) for p in polys)
        self.n_out = len(self.polys)
        if self.n_out < 2:
            raise ValueError("need at least 2 generator polynomials")
        self.n_states = 1 << (self.k - 1)
        self._taps = np.stack([_poly_taps(p, self.k) for p in self.polys])
        if puncture is None:
            pat = np.ones((self.n_out, 1), np.uint8)
        elif isinstance(puncture, str):
            if self.n_out != 2:
                raise ValueError("named puncture patterns assume a rate-1/2 mother code")
            pat = _PUNCTURE_PATTERNS.get(puncture)
            if pat is None:
                raise ValueError(f"unknown puncture pattern {puncture!r}; "
                                 f"choose from {sorted(_PUNCTURE_PATTERNS)}")
        else:
            pat = np.asarray(puncture, np.uint8)
            if pat.ndim != 2 or pat.shape[0] != self.n_out:
                raise ValueError(f"puncture pattern must be (n_out={self.n_out}, P)")
        self.puncture_pattern = pat
        self.rate = pat.shape[1] / float(pat.sum())

        # Trellis tables. Register r = (s << 1) | b, K bits with bit i
        # holding u_{n-i} (bit 0 = newest); next state t = r & (S-1), so
        # t's predecessors are p0 = t >> 1 and p1 = p0 + S/2, both with
        # input bit b = t & 1.
        s_all = np.arange(self.n_states)
        # G_j as an integer whose bit i is the D^i tap (matches r's layout)
        g_ints = [int(np.sum(self._taps[j].astype(np.int64) << np.arange(self.k)))
                  for j in range(self.n_out)]

        def outs(reg):
            r = np.asarray(reg)[..., None] & np.array(g_ints)  # (..., n)
            # popcount via unpackbits on the K<=12-bit masked register
            o = np.zeros(r.shape, np.uint8)
            for i in range(self.k):
                o ^= ((r >> i) & 1).astype(np.uint8)
            return o

        t_all = np.arange(self.n_states)
        b_in = (t_all & 1).astype(np.int64)
        p0 = t_all >> 1
        p1 = p0 + self.n_states // 2
        self._prev0 = p0.astype(np.int32)
        self._prev1 = p1.astype(np.int32)
        # branch output signs (1-2c) for the p0->t and p1->t transitions
        self._sign0 = (1.0 - 2.0 * outs((p0 << 1) | b_in)).astype(np.float32)
        self._sign1 = (1.0 - 2.0 * outs((p1 << 1) | b_in)).astype(np.float32)
        # encoder table: next state / outputs per (state, input bit)
        reg = (s_all[:, None] << 1) | np.array([0, 1])
        self._enc_next = (reg & (self.n_states - 1)).astype(np.int32)
        self._enc_out = outs(reg)  # (S, 2, n)

    # ------------------------------------------------------------ lengths

    def n_steps(self, n_bits: int) -> int:
        """Trellis steps for ``n_bits`` info bits (incl. K-1 tail zeros)."""
        return int(n_bits) + self.k - 1

    def _keep_mask(self, n_bits: int) -> np.ndarray:
        t = self.n_steps(n_bits)
        p = self.puncture_pattern.shape[1]
        # (T, n) mask, step-major like the coded stream
        return self.puncture_pattern.T[np.arange(t) % p].astype(bool)

    def coded_len(self, n_bits: int) -> int:
        """Wire bits produced by ``encode`` for ``n_bits`` info bits."""
        return int(self._keep_mask(n_bits).sum())

    # ------------------------------------------------------------- encode

    def encode(self, bits: np.ndarray) -> np.ndarray:
        """Info bits (..., n_bits) uint8 -> coded bits (..., coded_len),
        zero-terminated then punctured. Host-side numpy (the TX side of
        the modem is host-side too)."""
        bits = np.asarray(bits)
        if bits.ndim == 0:
            raise ValueError("bits must have at least one axis")
        lead = bits.shape[:-1]
        n = bits.shape[-1]
        u = bits.reshape(-1, n).astype(np.uint8)
        t = self.n_steps(n)
        # c_j = conv(u, taps_j) mod 2; 'full' length n+K-1 == T gives the
        # zero-termination tail for free.
        c = np.stack(
            [np.stack([np.convolve(row, self._taps[j]) % 2 for row in u])
             for j in range(self.n_out)], axis=-1)  # (B, T, n)
        keep = self._keep_mask(n)
        out = c[:, keep].astype(np.uint8)
        return out.reshape(*lead, -1)

    # ------------------------------------------------------------- decode

    def decode(self, soft, n_bits: int):
        """Soft-decision Viterbi decode.

        ``soft``: (..., coded_len(n_bits)) float array, positive ⇒ coded
        bit 0 (see module docstring). Returns (..., n_bits) uint8 info
        bits. Leading axes are decoded together in one batched dispatch.
        """
        soft = np.asarray(soft, np.float32)
        lead = soft.shape[:-1]
        want = self.coded_len(n_bits)
        if soft.shape[-1] != want:
            raise ValueError(
                f"soft stream has {soft.shape[-1]} values; "
                f"{n_bits} info bits need coded_len={want}")
        t = self.n_steps(n_bits)
        b = int(np.prod(lead, initial=1))
        # depuncture: erased positions get metric 0 (no opinion)
        full = np.zeros((b, t, self.n_out), np.float32)
        full[:, self._keep_mask(n_bits)] = soft.reshape(b, -1)
        bits = _viterbi(
            jnp.asarray(full),
            jnp.asarray(self._prev0), jnp.asarray(self._prev1),
            jnp.asarray(self._sign0), jnp.asarray(self._sign1),
            k=self.k)
        bits = np.asarray(bits)[:, :n_bits]
        return bits.reshape(*lead, n_bits)

    def decode_hard(self, coded_bits, n_bits: int):
        """Hard-decision decode: coded bits (..., coded_len) in {0,1}."""
        coded = np.asarray(coded_bits)
        return self.decode(1.0 - 2.0 * coded.astype(np.float32), n_bits)


@functools.partial(jax.jit, static_argnames=("k",))
def _viterbi(x, prev0, prev1, sign0, sign1, *, k: int):
    """Batched Viterbi: x (B, T, n) branch observations -> (B, T) uint8
    decisions (info bits incl. tail). Forward ACS scan + reverse
    traceback scan, all states in parallel."""
    n_states = sign0.shape[0]
    b = x.shape[0]
    pm0 = jnp.full((b, n_states), _NEG, jnp.float32).at[:, 0].set(0.0)

    def acs(pm, xk):
        # branch metrics for the two incoming edges of every state
        bm0 = xk @ sign0.T  # (B, S)
        bm1 = xk @ sign1.T
        c0 = jnp.take(pm, prev0, axis=-1) + bm0
        c1 = jnp.take(pm, prev1, axis=-1) + bm1
        dec = c1 > c0
        pm = jnp.where(dec, c1, c0)
        pm = pm - jnp.max(pm, axis=-1, keepdims=True)
        return pm, dec

    _, decs = jax.lax.scan(acs, pm0, jnp.swapaxes(x, 0, 1))  # decs (T, B, S)

    def back(state, dec_k):
        # dec_k (B, S); state (B,) current trellis state at step k+1's end
        bit = (state & 1).astype(jnp.uint8)
        won1 = jnp.take_along_axis(dec_k, state[:, None], axis=-1)[:, 0]
        state = (state >> 1) | (won1.astype(state.dtype) << (k - 2))
        return state, bit

    end = jnp.zeros((b,), jnp.int32)  # zero-terminated
    _, bits_rev = jax.lax.scan(back, end, decs, reverse=True)
    return jnp.swapaxes(bits_rev, 0, 1)  # (B, T), time-forward


# --------------------------------------------------------- soft demapping


def max_log_llrs(s_re, s_im, points: np.ndarray, bit_lut: np.ndarray,
                 noise_var: float = 1.0):
    """Max-log-MAP bit LLRs from equalized symbols.

    ``points`` (M,) complex constellation, ``bit_lut`` (M, bps) the
    per-point bit labels (e.g. ``BurstModem.points`` / ``.bit_lut``).
    Returns (..., n_sym * bps) float32, positive ⇒ bit 0 — directly
    consumable by `ConvCode.decode`.
    """
    s_re = jnp.asarray(s_re, jnp.float32)
    s_im = jnp.asarray(s_im, jnp.float32)
    pt_re = jnp.asarray(np.asarray(points).real, jnp.float32)
    pt_im = jnp.asarray(np.asarray(points).imag, jnp.float32)
    d2 = (s_re[..., None] - pt_re) ** 2 + (s_im[..., None] - pt_im) ** 2
    bps = bit_lut.shape[1]
    llrs = []
    for i in range(bps):
        one = np.asarray(bit_lut[:, i], bool)
        d_one = jnp.min(jnp.where(jnp.asarray(one), d2, np.inf), axis=-1)
        d_zero = jnp.min(jnp.where(jnp.asarray(~one), d2, np.inf), axis=-1)
        llrs.append((d_one - d_zero) / float(noise_var))
    out = jnp.stack(llrs, axis=-1)  # (..., n_sym, bps)
    return out.reshape(*out.shape[:-2], -1)


def modem_soft_bits(modem, sym_re, sym_im, noise_var: float = 1.0):
    """Bit LLRs for a coherent `BurstModem`'s recovered payload symbols
    (the ``symbols`` planes returned by ``demodulate``). Differential
    modems demap on phase increments, not absolute points — use hard
    decisions + `decode_hard` there."""
    if modem.differential:
        raise ValueError("soft demapping needs a coherent (differential=False) modem")
    return max_log_llrs(sym_re, sym_im, modem.points, modem.bit_lut,
                        noise_var=noise_var)
