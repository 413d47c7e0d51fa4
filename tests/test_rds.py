"""RDS: block codec algebra, encoder framing, and full MPX loopback
decode (PS + RadioText) under pilot offset and noise."""

import numpy as np
import pytest

from tpu_sdr.kernels.rds import (
    OFFSET_WORDS,
    RDSDecoder,
    RDSEncoder,
    _crc10,
    _syndromes,
    encode_block,
    make_mpx_rds,
)

FS = 200e3


def test_crc_and_syndrome_algebra():
    """A valid block's syndrome is exactly its offset word; any single
    bit flip breaks it (the code detects all single errors)."""
    rng = np.random.default_rng(0x2D5)
    for off in OFFSET_WORDS:
        info = int(rng.integers(1 << 16))
        blk = encode_block(info, off)
        assert _syndromes(blk)[0] == OFFSET_WORDS[off]
        for i in range(26):
            bad = blk.copy()
            bad[i] ^= 1
            assert _syndromes(bad)[0] != OFFSET_WORDS[off]


def test_crc_is_linear():
    a, b = 0x1234, 0x8F0F
    assert _crc10(a ^ b) == _crc10(a) ^ _crc10(b)


def test_encoder_group_structure():
    enc = RDSEncoder(pi=0xBEEF, pty=9, tp=True, ps="KTPU-FM ",
                     radiotext="HELLO")
    cyc = enc.groups()
    assert len(cyc) == 4 + 16  # 4 PS groups + 16 RT segments
    for blocks in cyc:
        assert blocks[0] == (0xBEEF, "A")
    b2 = cyc[0][1][0]
    assert b2 >> 12 == 0          # type 0
    assert (b2 >> 10) & 1 == 1    # TP
    assert (b2 >> 5) & 0x1F == 9  # PTY
    # bit stream length: 104 bits per group
    assert len(enc.bit_stream(7)) == 7 * 104


def _loopback(pilot_hz=19000.0, snr_db=None, seed=0, rt="TPU RADIOTEXT 42"):
    n = 1 << 20  # ~5.2 s at 200 kHz
    t = np.arange(n) / FS
    left = 0.6 * np.sin(2 * np.pi * 1000 * t)
    right = 0.6 * np.sin(2 * np.pi * 2500 * t)
    enc = RDSEncoder(pi=0xC0DE, pty=4, ps="TPU SDR ", radiotext=rt)
    m = make_mpx_rds(left, right, FS, enc, n_groups=64, pilot_hz=pilot_hz)
    if snr_db is not None:
        rng = np.random.default_rng(seed)
        m = m + 10 ** (-snr_db / 20) * rng.standard_normal(n)
    dec = RDSDecoder(FS)
    return dec.decode(m)


def test_loopback_clean():
    res = _loopback()
    assert res.pi == 0xC0DE
    assert res.pty == 4
    assert res.ps_name == "TPU SDR "
    assert res.radiotext == "TPU RADIOTEXT 42"
    assert res.block_error_rate < 0.05
    assert res.groups.get("0A", 0) > 0 and res.groups.get("2A", 0) > 0


def test_loopback_pilot_offset_and_noise():
    """Pilot (and the locked 57 kHz subcarrier) 2 Hz off, 26 dB MPX
    SNR: the feedforward carrier recovery must still deliver the PS."""
    res = _loopback(pilot_hz=19002.0, snr_db=26, seed=7)
    assert res.pi == 0xC0DE
    assert res.ps_name == "TPU SDR "
    assert res.block_error_rate < 0.3


def test_decoder_validation():
    with pytest.raises(ValueError):
        RDSDecoder(fs=123456.0)  # no small rational path to 19 kHz
    dec = RDSDecoder(FS)
    res = dec.decode(np.zeros(4096, np.float32))  # too short -> empty
    assert res.pi is None and res.n_blocks == 0


def test_min_samples_hint():
    dec = RDSDecoder(FS)
    n = dec.min_samples(12)
    assert n * 1.0 / FS > 12 * 104 / 1187.5  # covers 12 groups
    assert n % (dec.ddc.r * dec.resamp.down) == 0
