"""FM stereo decoder: separation, pilot tracking, mono fallback, chunk
invariance, checkpointing, and the stereo Receiver end to end."""

import numpy as np
import pytest

from tpu_sdr.kernels.stereo import StereoDecoder, StereoDecoderState, make_mpx
from tpu_sdr.runtime.receiver import Receiver, ReceiverState, write_wav

FS = 200e3
N = 1 << 16
T = np.arange(N) / FS
LEFT = 0.8 * np.sin(2 * np.pi * 1000 * T)
RIGHT = 0.8 * np.sin(2 * np.pi * 2500 * T)


def _tone_pow(x, f, fs):
    h = len(x) // 2
    win = np.hanning(h)
    k = int(round(f * h / fs))
    spec = np.abs(np.fft.rfft(np.asarray(x, np.float64)[h:] * win)) ** 2
    return np.max(spec[k - 2: k + 3])


def _separation_db(out, fs):
    """(2, T) decoded audio -> (sep_left, sep_right) in dB, measured on
    the second half (post pilot lock)."""
    l, r = np.asarray(out, np.float64)
    sep_l = 10 * np.log10(_tone_pow(l, 1000, fs) / _tone_pow(l, 2500, fs))
    sep_r = 10 * np.log10(_tone_pow(r, 2500, fs) / _tone_pow(r, 1000, fs))
    return sep_l, sep_r


def _decode(m, **kw):
    dec = StereoDecoder(FS, **kw)
    out, st = dec.process(np.asarray(m, np.float32), dec.initial_state())
    return np.asarray(out), st


def test_separation_locked():
    out, st = _decode(make_mpx(LEFT, RIGHT, FS))
    sep_l, sep_r = _separation_db(out, FS)
    assert sep_l > 60 and sep_r > 60
    assert abs(st.pilot_level() - 0.09) < 0.01


@pytest.mark.parametrize("df,phase", [(2.0, 0.0), (-2.0, 0.7)])
def test_separation_tracks_pilot_offset(df, phase):
    """Broadcast pilots are 19 kHz +/- 2 Hz; the rotation tracker must
    hold separation there (a plain EMA would lag ~1 rad of phase)."""
    m = make_mpx(LEFT, RIGHT, FS, pilot_hz=19000.0 + df, pilot_phase=phase)
    out, _ = _decode(m)
    sep_l, sep_r = _separation_db(out, FS)
    assert sep_l > 40 and sep_r > 40


def test_separation_with_noise():
    rng = np.random.default_rng(0x57E6)
    m = make_mpx(LEFT, RIGHT, FS, pilot_hz=19001.0)
    m = m + 10 ** (-30 / 20) * rng.standard_normal(N)
    out, _ = _decode(m)
    sep_l, sep_r = _separation_db(out, FS)
    assert sep_l > 30 and sep_r > 30


def test_mono_fallback_exact():
    """No pilot -> the gate stays closed and L == R == MPX bitwise."""
    m = make_mpx(LEFT, LEFT, FS, pilot_amp=0.0).astype(np.float32)
    out, st = _decode(m)
    np.testing.assert_array_equal(out[0], out[1])
    np.testing.assert_array_equal(out[0], m)
    assert st.pilot_level() < 1e-3


def test_chunked_equals_oneshot_bitwise():
    m = make_mpx(LEFT, RIGHT, FS).astype(np.float32)
    dec = StereoDecoder(FS, deemphasis_tau=75e-6)
    one, fin = dec.process(m, dec.initial_state())
    for n_chunks in (2, 8, 64):
        st = dec.initial_state()
        outs = []
        for c in np.split(m, n_chunks):
            o, st = dec.process(c, st)
            outs.append(np.asarray(o))
        np.testing.assert_array_equal(
            np.concatenate(outs, axis=-1), np.asarray(one),
            err_msg=f"n_chunks={n_chunks}")
        assert st.offset == fin.offset


def test_checkpoint_roundtrip_bitwise():
    m = make_mpx(LEFT, RIGHT, FS).astype(np.float32)
    dec = StereoDecoder(FS, deemphasis_tau=75e-6)
    one, _ = dec.process(m, dec.initial_state())
    half = N // 2
    _, st = dec.process(m[:half], dec.initial_state())
    st2 = StereoDecoderState.from_numpy(st.to_numpy())
    out2, _ = dec.process(m[half:], st2)
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(one)[..., half:])


def test_batched_decode():
    m = np.stack([make_mpx(LEFT, RIGHT, FS),
                  make_mpx(RIGHT, LEFT, FS)]).astype(np.float32)
    dec = StereoDecoder(FS)
    out, _ = dec.process(m, dec.initial_state((2,)))
    assert out.shape == (2, 2, N)
    sep_l, _ = _separation_db(np.asarray(out)[0], FS)
    sep_swapped_r, _ = _separation_db(np.asarray(out)[1][::-1], FS)
    assert sep_l > 60 and sep_swapped_r > 60


def test_validation():
    with pytest.raises(ValueError):
        StereoDecoder(96e3)  # subcarrier does not fit
    with pytest.raises(ValueError):
        StereoDecoder(FS, leak=1.0)
    dec = StereoDecoder(FS)
    with pytest.raises(ValueError):
        dec.process(np.zeros(100, np.float32), dec.initial_state())


# ---------------------------------------------------------- full receiver


def _fm_modulate(mpx, fs, center_hz, deviation_hz):
    phase = 2.0 * np.pi * np.cumsum(
        center_hz + deviation_hz * np.asarray(mpx, np.float64)) / fs
    return np.cos(phase).astype(np.float32)


def test_receiver_stereo_end_to_end():
    fs = 1e6
    n = 1 << 20
    t = np.arange(n) / fs
    left = 0.7 * np.sin(2 * np.pi * 1000 * t)
    right = 0.7 * np.sin(2 * np.pi * 2500 * t)
    mpx = make_mpx(left, right, fs, pilot_hz=19001.0)
    x = _fm_modulate(mpx, fs, 150e3, 75e3)
    rx = Receiver(fs=fs, center_hz=150e3, mode="wbfm", stereo=True)
    n_chunks = 4
    g = rx.chunk_granularity * n_chunks
    x = x[: (n // g) * g]
    audio, st = rx.process(x, rx.initial_state())
    audio = np.asarray(audio, np.float64)
    assert audio.ndim == 2 and audio.shape[0] == 2
    fs_a = float(rx.realized_audio_rate)
    sep_l = 10 * np.log10(_tone_pow(audio[0], 1000, fs_a)
                          / _tone_pow(audio[0], 2500, fs_a))
    sep_r = 10 * np.log10(_tone_pow(audio[1], 2500, fs_a)
                          / _tone_pow(audio[1], 1000, fs_a))
    assert sep_l > 25 and sep_r > 25
    assert st.stereo.pilot_level() > 0.05

    # chunked == one-shot bitwise through the whole stereo chain
    st2 = rx.initial_state()
    outs = []
    for c in np.split(x, n_chunks):
        o, st2 = rx.process(c, st2)
        outs.append(np.asarray(o))
    np.testing.assert_array_equal(np.concatenate(outs, axis=-1), audio)

    # checkpoint roundtrip keeps the stereo tracker state
    st3 = ReceiverState.from_numpy(st2.to_numpy())
    assert st3.stereo is not None
    assert st3.stereo.offset == st2.stereo.offset


def test_receiver_stereo_validation():
    with pytest.raises(ValueError):
        Receiver(mode="am", stereo=True)


def test_write_wav_stereo(tmp_path):
    import wave

    audio = np.stack([np.sin(np.linspace(0, 20, 4800)),
                      np.cos(np.linspace(0, 20, 4800))])
    p = write_wav(tmp_path / "st.wav", audio, 48000.0)
    with wave.open(str(p), "rb") as w:
        assert w.getnchannels() == 2
        assert w.getnframes() == 4800
    with pytest.raises(ValueError):
        write_wav(tmp_path / "bad.wav", np.zeros((3, 10)), 48000.0)
