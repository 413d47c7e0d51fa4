"""Sharded receiver chain: every stage and the full composition must be
BITWISE identical to the single-device path, for every mesh shape."""

import numpy as np
import pytest

from tpu_sdr.kernels.demod import AGC, AMDemodulator, FMDemodulator, SSBDemodulator
from tpu_sdr.kernels.resample import Resampler
from tpu_sdr.runtime.receiver import Receiver
from tpu_sdr.shard import (
    ShardedAGC,
    ShardedAMDemodulator,
    ShardedFMDemodulator,
    ShardedReceiver,
    ShardedResampler,
    ShardedSSBDemodulator,
    make_sdr_mesh,
)

FS = 100_000.0
MESHES = [(1, 8), (2, 4), (4, 2), (8, 1)]


def _planes(rng, c, t):
    return (rng.standard_normal((c, t)).astype(np.float32),
            rng.standard_normal((c, t)).astype(np.float32))


@pytest.mark.parametrize("mesh_shape", MESHES)
def test_sharded_fm_bitwise(rng, mesh_shape):
    c_ax, t_ax = mesh_shape
    mesh = make_sdr_mesh(channel=c_ax, time=t_ax)
    fm = FMDemodulator(FS, deviation_hz=5e3, deemphasis_tau=75e-6)
    sh = ShardedFMDemodulator(fm, mesh)
    c, t = 8, t_ax * 512
    re, im = _planes(rng, c, t)
    # two chunks with carried state on BOTH paths
    s1, s2 = fm.initial_state((c,)), sh.initial_state((c,))
    for _ in range(2):
        a_ref, s1 = fm.process(re, im, s1)
        a_got, s2 = sh.process(re, im, s2)
        np.testing.assert_array_equal(np.asarray(a_got), np.asarray(a_ref))
    np.testing.assert_array_equal(np.asarray(s2.filt), np.asarray(s1.filt))
    np.testing.assert_array_equal(np.asarray(s2.prev_re), np.asarray(s1.prev_re))


@pytest.mark.parametrize("mesh_shape", [(2, 4), (1, 8)])
def test_sharded_am_bitwise(rng, mesh_shape):
    c_ax, t_ax = mesh_shape
    mesh = make_sdr_mesh(channel=c_ax, time=t_ax)
    am = AMDemodulator(FS)
    sh = ShardedAMDemodulator(am, mesh)
    c, t = 4, t_ax * 384
    re, im = _planes(rng, c, t)
    a_ref, s1 = am.process(re, im, am.initial_state((c,)))
    a_got, s2 = sh.process(re, im, sh.initial_state((c,)))
    np.testing.assert_array_equal(np.asarray(a_got), np.asarray(a_ref))
    b_ref, _ = am.process(im, re, s1)
    b_got, _ = sh.process(im, re, s2)
    np.testing.assert_array_equal(np.asarray(b_got), np.asarray(b_ref))


@pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2)])
def test_sharded_ssb_bitwise(rng, mesh_shape):
    c_ax, t_ax = mesh_shape
    mesh = make_sdr_mesh(channel=c_ax, time=t_ax)
    ssb = SSBDemodulator(FS, bfo_hz=1500.0)
    sh = ShardedSSBDemodulator(ssb, mesh)
    c, t = 4, t_ax * 256
    re, im = _planes(rng, c, t)
    s1, s2 = ssb.initial_state((c,)), sh.initial_state((c,))
    for _ in range(2):
        a_ref, s1 = ssb.process(re, im, s1)
        a_got, s2 = sh.process(re, im, s2)
        np.testing.assert_array_equal(np.asarray(a_got), np.asarray(a_ref))


@pytest.mark.parametrize("mesh_shape", [(2, 4), (1, 8)])
def test_sharded_agc_bitwise(rng, mesh_shape):
    c_ax, t_ax = mesh_shape
    mesh = make_sdr_mesh(channel=c_ax, time=t_ax)
    agc = AGC(mu=5e-3, ref=1.0)
    sh = ShardedAGC(agc, mesh)
    c, t = 4, t_ax * 256
    x = rng.standard_normal((c, t)).astype(np.float32)
    y_ref, s1 = agc.process_real(x, agc.initial_state((c,)))
    y_got, s2 = sh.process_real(x, sh.initial_state((c,)))
    np.testing.assert_array_equal(np.asarray(y_got), np.asarray(y_ref))
    np.testing.assert_array_equal(np.asarray(s2.gain), np.asarray(s1.gain))
    # complex planes path, carried state
    re, im = _planes(rng, c, t)
    r_ref, i_ref, _ = agc.process(re, im, s1)
    r_got, i_got, _ = sh.process(re, im, s2)
    np.testing.assert_array_equal(np.asarray(r_got), np.asarray(r_ref))
    np.testing.assert_array_equal(np.asarray(i_got), np.asarray(i_ref))


@pytest.mark.parametrize("mesh_shape", MESHES)
def test_sharded_resampler_bitwise(rng, mesh_shape):
    c_ax, t_ax = mesh_shape
    mesh = make_sdr_mesh(channel=c_ax, time=t_ax)
    rs = Resampler(up=3, down=2, taps_per_phase=6)
    sh = ShardedResampler(rs, mesh)
    c, t = 8, t_ax * 64
    x = rng.standard_normal((c, t)).astype(np.float32)
    s1, s2 = rs.initial_state((c,)), sh.initial_state((c,))
    for _ in range(2):
        y_ref, s1 = rs.process(x, s1)
        y_got, s2 = sh.process(x, s2)
        np.testing.assert_array_equal(np.asarray(y_got), np.asarray(y_ref))
    np.testing.assert_array_equal(np.asarray(s2.tail), np.asarray(s1.tail))


@pytest.mark.parametrize("mode", ["wbfm", "am", "usb"])
@pytest.mark.parametrize("mesh_shape", [(2, 4), (1, 8)])
def test_sharded_receiver_bitwise(mode, mesh_shape):
    c_ax, t_ax = mesh_shape
    mesh = make_sdr_mesh(channel=c_ax, time=t_ax)
    fs = 1_000_000.0
    rx = Receiver(fs=fs, center_hz=250e3, mode=mode, audio_rate=16e3)
    sh = ShardedReceiver(rx, mesh)
    assert sh.chunk_granularity == t_ax * rx.chunk_granularity
    c = 2
    t = sh.chunk_granularity
    n = np.arange(t)
    msg = np.sin(2 * np.pi * 500.0 * n / fs)
    ph = 2 * np.pi * 250e3 * n / fs + 2 * np.pi * 50e3 / fs * np.cumsum(msg)
    x = np.stack([0.5 * np.cos(ph), 0.4 * np.cos(ph + 0.3)]).astype(np.float32)
    s1, s2 = rx.initial_state((c,)), sh.initial_state((c,))
    for _ in range(2):
        a_ref, s1 = rx.process(x, s1)
        a_got, s2 = sh.process(x, s2)
        np.testing.assert_array_equal(np.asarray(a_got), np.asarray(a_ref))


def test_sharded_receiver_with_squelch_bitwise():
    mesh = make_sdr_mesh(channel=2, time=4)
    fs = 1_000_000.0
    rx = Receiver(fs=fs, center_hz=250e3, mode="am", audio_rate=16e3,
                  squelch_db=-25.0)
    sh = ShardedReceiver(rx, mesh)
    t = sh.chunk_granularity
    n = np.arange(t)
    msg = np.sin(2 * np.pi * 600.0 * n / fs)
    x = np.stack([
        ((1 + 0.5 * msg) * 0.4 * np.cos(2 * np.pi * 250e3 * n / fs)),
        1e-3 * np.random.default_rng(2).standard_normal(t),  # muted channel
    ]).astype(np.float32)
    s1, s2 = rx.initial_state((2,)), sh.initial_state((2,))
    for _ in range(2):
        a_ref, s1 = rx.process(x, s1)
        a_got, s2 = sh.process(x, s2)
        np.testing.assert_array_equal(np.asarray(a_got), np.asarray(a_ref))
    assert np.max(np.abs(np.asarray(a_got)[1][256:])) == 0.0  # squelched


def test_sharded_receiver_validation():
    mesh = make_sdr_mesh(channel=1, time=8)
    rx = Receiver(fs=1e6, center_hz=100e3, mode="wbfm", audio_rate=16e3)
    sh = ShardedReceiver(rx, mesh)
    with pytest.raises(ValueError, match="chunk_granularity"):
        sh.process(np.zeros((1, rx.chunk_granularity), np.float32),
                   sh.initial_state((1,)))


@pytest.mark.parametrize("mesh_shape", MESHES)
def test_sharded_stereo_decoder_bitwise(rng, mesh_shape):
    """ShardedStereoDecoder == StereoDecoder bitwise for every mesh shape,
    on a real MPX (pilot + L/R program) with carried state across chunks."""
    from tpu_sdr.kernels.stereo import StereoDecoder, make_mpx
    from tpu_sdr.shard.stereo import ShardedStereoDecoder

    c_ax, t_ax = mesh_shape
    mesh = make_sdr_mesh(channel=c_ax, time=t_ax)
    fs = 200_000.0
    dec = StereoDecoder(fs, deemphasis_tau=75e-6, leak=0.98)
    sh = ShardedStereoDecoder(dec, mesh)
    c, t = 8, t_ax * 512
    n = np.arange(2 * t)
    left = 0.5 * np.sin(2 * np.pi * 700.0 * n / fs)
    right = 0.4 * np.sin(2 * np.pi * 1100.0 * n / fs)
    mpx = make_mpx(left, right, fs).astype(np.float32)
    m = np.stack([np.roll(mpx, 13 * i) for i in range(c)])
    s1, s2 = dec.initial_state((c,)), sh.initial_state((c,))
    for k in range(2):
        chunk = m[:, k * t:(k + 1) * t]
        lr_ref, s1 = dec.process(chunk, s1)
        lr_got, s2 = sh.process(chunk, s2)
        np.testing.assert_array_equal(np.asarray(lr_got), np.asarray(lr_ref))
    for f in ("a_re", "a_im", "b_re", "b_im", "last_re", "last_im", "filt"):
        np.testing.assert_array_equal(
            np.asarray(getattr(s2, f)), np.asarray(getattr(s1, f)))
    assert s2.offset == s1.offset
    np.testing.assert_allclose(
        np.asarray(s2.pilot_pow), np.asarray(s1.pilot_pow)
    )


@pytest.mark.parametrize("mesh_shape", [(2, 4), (1, 8)])
def test_sharded_receiver_stereo_bitwise(mesh_shape):
    """The full stereo WBFM chain (DDC -> FM -> MPX decode -> de-emphasis
    -> resample) sharded == single-device bitwise, closing the one
    capability corner the sharded chain lacked (round-2 verdict #6)."""
    c_ax, t_ax = mesh_shape
    mesh = make_sdr_mesh(channel=c_ax, time=t_ax)
    fs = 1_000_000.0
    rx = Receiver(fs=fs, center_hz=250e3, mode="wbfm", audio_rate=16e3,
                  stereo=True)
    sh = ShardedReceiver(rx, mesh)
    assert sh.stereo_dec is not None
    c = 2
    t = sh.chunk_granularity
    n = np.arange(t)
    # stereo MPX program (19 kHz pilot — preserved through the DDC) ->
    # FM modulate at 250 kHz with the full 75 kHz broadcast deviation
    from tpu_sdr.kernels.stereo import make_mpx
    left = 0.5 * np.sin(2 * np.pi * 700.0 * n / fs)
    right = 0.4 * np.sin(2 * np.pi * 300.0 * n / fs)
    mpx = make_mpx(left, right, fs)
    ph = 2 * np.pi * 250e3 * n / fs + 2 * np.pi * 75e3 / fs * np.cumsum(mpx)
    x = np.stack([0.5 * np.cos(ph), 0.4 * np.cos(ph + 0.3)]).astype(np.float32)
    s1, s2 = rx.initial_state((c,)), sh.initial_state((c,))
    for _ in range(2):
        a_ref, s1 = rx.process(x, s1)
        a_got, s2 = sh.process(x, s2)
        assert a_got.shape == (c, 2, a_ref.shape[-1])
        np.testing.assert_array_equal(np.asarray(a_got), np.asarray(a_ref))
    # the pilot actually locked and the L/R matrix engaged (guards
    # against a closed gate making this a mono-path-only comparison);
    # pilot_level is per-channel now — every channel carries the pilot
    assert np.all(np.asarray(s2.stereo.pilot_level()) > 0.02)
    a = np.asarray(a_got)[0]
    assert not np.array_equal(a[0], a[1])


@pytest.mark.parametrize("mode", ["wbfm", "am"])
@pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2)])
def test_sharded_receiver_bank_bitwise(mode, mesh_shape):
    """ShardedReceiverBank == single-device ReceiverBank bitwise: K
    stations mixed from ONE shared stream, carriers over the channel
    axis, every later stage through the shared sharded chain."""
    from tpu_sdr.runtime.receiver import ReceiverBank
    from tpu_sdr.shard import ShardedReceiverBank

    c_ax, t_ax = mesh_shape
    mesh = make_sdr_mesh(channel=c_ax, time=t_ax)
    fs = 1_000_000.0
    centers = [150e3, 250e3, 330e3, 410e3]
    bank = ReceiverBank(fs=fs, centers_hz=centers, mode=mode,
                        audio_rate=16e3)
    sh = ShardedReceiverBank(bank, mesh)
    assert sh.k == 4
    assert sh.chunk_granularity == t_ax * bank.chunk_granularity
    t = sh.chunk_granularity
    n = np.arange(t)
    # two modulated stations + noise on the shared stream
    msg = np.sin(2 * np.pi * 700.0 * n / fs)
    x = (0.4 * np.cos(2 * np.pi * 150e3 * n / fs
                      + 2 * np.pi * 40e3 / fs * np.cumsum(msg))
         + 0.3 * (1 + 0.5 * msg) * np.cos(2 * np.pi * 330e3 * n / fs)
         + 0.01 * np.random.default_rng(0).standard_normal(t)
         ).astype(np.float32)
    s1, s2 = bank.initial_state(), sh.initial_state()
    for _ in range(2):
        a_ref, s1 = bank.process(x, s1)
        a_got, s2 = sh.process(x, s2)
        assert a_got.shape == a_ref.shape == (4, a_ref.shape[-1])
        np.testing.assert_array_equal(np.asarray(a_got), np.asarray(a_ref))


def test_sharded_receiver_bank_stereo_bitwise():
    """stereo=True through the sharded bank: (K, 2, T') L/R planes,
    bitwise vs the single-device bank."""
    from tpu_sdr.kernels.stereo import make_mpx
    from tpu_sdr.runtime.receiver import ReceiverBank
    from tpu_sdr.shard import ShardedReceiverBank

    mesh = make_sdr_mesh(channel=2, time=4)
    fs = 1_000_000.0
    bank = ReceiverBank(fs=fs, centers_hz=[150e3, 350e3], mode="wbfm",
                        audio_rate=16e3, stereo=True)
    sh = ShardedReceiverBank(bank, mesh)
    t = sh.chunk_granularity
    n = np.arange(t)
    left = 0.5 * np.sin(2 * np.pi * 700.0 * n / fs)
    right = 0.4 * np.sin(2 * np.pi * 300.0 * n / fs)
    mpx = make_mpx(left, right, fs)
    x = (0.5 * np.cos(2 * np.pi * 150e3 * n / fs
                      + 2 * np.pi * 75e3 / fs * np.cumsum(mpx))
         ).astype(np.float32)
    s1, s2 = bank.initial_state(), sh.initial_state()
    for _ in range(2):
        a_ref, s1 = bank.process(x, s1)
        a_got, s2 = sh.process(x, s2)
        assert a_got.shape == (2, 2, a_ref.shape[-1])
        np.testing.assert_array_equal(np.asarray(a_got), np.asarray(a_ref))
    # pilot_level is now PER-STATION (no host-collapsing max): station 0
    # genuinely locked
    assert np.asarray(s2.stereo.pilot_level()).reshape(-1)[0] > 0.02
