"""Receiver chain: tune-to-audio end-to-end, chunk invariance, checkpoint."""

import numpy as np
import pytest

from tpu_sdr.runtime.receiver import Receiver, ReceiverState, write_wav

FS = 1_000_000.0


def _fm_rf(fs, carrier, audio_f, dev, t_len, amp=0.8):
    """Real wideband FM signal at `carrier` with a sine message."""
    n = np.arange(t_len)
    msg = np.sin(2 * np.pi * audio_f * n / fs)
    phase = 2 * np.pi * carrier * n / fs + 2 * np.pi * dev / fs * np.cumsum(msg)
    return (amp * np.cos(phase)).astype(np.float32)


def _tone_hz(audio, rate):
    a = np.asarray(audio, np.float64)
    a = a - a.mean()
    w = np.hanning(a.size)
    spec = np.abs(np.fft.rfft(a * w))
    return np.argmax(spec) * rate / a.size


def test_wbfm_receiver_recovers_audio_tone():
    rx = Receiver(fs=FS, center_hz=250e3, mode="wbfm", audio_rate=48e3)
    t_len = 8 * rx.chunk_granularity
    x = _fm_rf(FS, 250e3, 1_000.0, 75e3, t_len)
    audio, st = rx.process(x, rx.initial_state())
    a = np.asarray(audio, np.float64)
    rate = float(rx.realized_audio_rate)
    assert rate == pytest.approx(48e3, rel=1e-9)
    skip = int(0.01 * rate)
    tail = a[skip:]
    assert _tone_hz(tail, rate) == pytest.approx(1000.0, abs=2 * rate / tail.size)
    # Deviation-normalized FM through de-emphasis: the 1 kHz tone passes
    # nearly unattenuated (pole at ~2.1 kHz).
    assert 0.5 < np.max(np.abs(tail)) < 1.2


def test_nbfm_receiver_recovers_audio_tone():
    rx = Receiver(fs=FS, center_hz=455e3, mode="nbfm", audio_rate=8e3)
    t_len = 4 * rx.chunk_granularity
    x = _fm_rf(FS, 455e3, 300.0, 2.5e3, t_len)
    audio, _ = rx.process(x, rx.initial_state())
    rate = float(rx.realized_audio_rate)
    a = np.asarray(audio, np.float64)[int(0.05 * rate):]
    assert _tone_hz(a, rate) == pytest.approx(300.0, abs=2 * rate / a.size)


def test_am_receiver_recovers_audio_tone():
    rx = Receiver(fs=FS, center_hz=300e3, mode="am", audio_rate=8e3)
    t_len = 8 * rx.chunk_granularity
    n = np.arange(t_len)
    msg = np.sin(2 * np.pi * 800.0 * n / FS)
    x = ((1.0 + 0.5 * msg) * 0.5 * np.cos(2 * np.pi * 300e3 * n / FS)).astype(
        np.float32)
    audio, _ = rx.process(x, rx.initial_state())
    rate = float(rx.realized_audio_rate)
    a = np.asarray(audio, np.float64)[int(0.1 * rate):]
    assert _tone_hz(a, rate) == pytest.approx(800.0, abs=2 * rate / a.size)


@pytest.mark.parametrize("mode,audio_f", [("usb", 700.0), ("lsb", 700.0)])
def test_ssb_receiver_recovers_audio_tone(mode, audio_f):
    # SSB signal: a single RF tone at carrier +/- audio_f IS the sideband.
    rx = Receiver(fs=FS, center_hz=400e3, mode=mode, audio_rate=8e3)
    sign = 1.0 if mode == "usb" else -1.0
    t_len = 16 * rx.chunk_granularity
    n = np.arange(t_len)
    x = (0.5 * np.cos(2 * np.pi * (400e3 + sign * audio_f) * n / FS)).astype(
        np.float32)
    audio, _ = rx.process(x, rx.initial_state())
    rate = float(rx.realized_audio_rate)
    a = np.asarray(audio, np.float64)[int(0.2 * rate):]
    assert _tone_hz(a, rate) == pytest.approx(audio_f, abs=3 * rate / a.size)


@pytest.mark.parametrize("mode", ["wbfm", "am", "usb"])
def test_receiver_chunked_equals_oneshot(mode):
    rx = Receiver(fs=FS, center_hz=250e3, mode=mode, audio_rate=16e3)
    g = rx.chunk_granularity
    t_len = 8 * g
    x = _fm_rf(FS, 250e3, 500.0, 20e3, t_len)
    one, _ = rx.process(x, rx.initial_state())
    st = rx.initial_state()
    outs = []
    for i in range(0, t_len, 2 * g):
        o, st = rx.process(x[i : i + 2 * g], st)
        outs.append(np.asarray(o))
    np.testing.assert_array_equal(np.concatenate(outs), np.asarray(one))


def test_receiver_checkpoint_roundtrip():
    rx = Receiver(fs=FS, center_hz=250e3, mode="wbfm", audio_rate=16e3)
    g = rx.chunk_granularity
    x = _fm_rf(FS, 250e3, 500.0, 75e3, 4 * g)
    _, st = rx.process(x[: 2 * g], rx.initial_state())
    st2 = ReceiverState.from_numpy(st.to_numpy())
    a, _ = rx.process(x[2 * g :], st)
    b, _ = rx.process(x[2 * g :], st2)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_receiver_iq_input_and_retune():
    rx = Receiver(fs=FS, center_hz=-100e3, mode="wbfm", audio_rate=16e3)
    t_len = 4 * rx.chunk_granularity
    n = np.arange(t_len)
    msg = np.sin(2 * np.pi * 400.0 * n / FS)
    phase = -2 * np.pi * 100e3 * n / FS + 2 * np.pi * 75e3 / FS * np.cumsum(msg)
    planes = np.stack([np.cos(phase), np.sin(phase)]).astype(np.float32)
    audio, _ = rx.process_planes(planes, rx.initial_state())
    rate = float(rx.realized_audio_rate)
    a = np.asarray(audio, np.float64)[int(0.01 * rate):]
    assert _tone_hz(a, rate) == pytest.approx(400.0, abs=2 * rate / a.size)
    rx.retune(150e3)
    assert rx.center_hz == pytest.approx(150e3)


def test_receiver_validation():
    rx = Receiver(fs=FS, center_hz=100e3, mode="wbfm")
    with pytest.raises(ValueError, match="chunk_granularity"):
        rx.process(np.zeros(rx.chunk_granularity + 1, np.float32),
                   rx.initial_state())
    with pytest.raises(ValueError, match="mode"):
        Receiver(mode="fm")


def test_receiver_bank_two_stations():
    from tpu_sdr.runtime.receiver import ReceiverBank

    bank = ReceiverBank(fs=FS, centers_hz=[150e3, 350e3], mode="wbfm",
                        audio_rate=16e3)
    t_len = 4 * bank.chunk_granularity
    n = np.arange(t_len)
    x = np.zeros(t_len)
    tones = {150e3: 700.0, 350e3: 1100.0}
    for fc, fa in tones.items():
        msg = np.sin(2 * np.pi * fa * n / FS)
        x = x + 0.4 * np.cos(
            2 * np.pi * fc * n / FS + 2 * np.pi * 75e3 / FS * np.cumsum(msg))
    audio, _ = bank.process(x.astype(np.float32), bank.initial_state())
    rate = float(bank.realized_audio_rate)
    a = np.asarray(audio, np.float64)
    assert a.shape[0] == 2
    skip = int(0.01 * rate)
    assert _tone_hz(a[0, skip:], rate) == pytest.approx(
        700.0, abs=2 * rate / (a.shape[1] - skip))
    assert _tone_hz(a[1, skip:], rate) == pytest.approx(
        1100.0, abs=2 * rate / (a.shape[1] - skip))


def test_receiver_bank_bitwise_equals_singles():
    from tpu_sdr.runtime.receiver import ReceiverBank

    centers = [150e3, 350e3]
    bank = ReceiverBank(fs=FS, centers_hz=centers, mode="wbfm",
                        audio_rate=16e3)
    t_len = 2 * bank.chunk_granularity
    x = _fm_rf(FS, 150e3, 500.0, 75e3, t_len)
    a_bank, _ = bank.process(x, bank.initial_state())
    for i, fc in enumerate(centers):
        rx = Receiver(fs=FS, center_hz=fc, mode="wbfm", audio_rate=16e3)
        a_one, _ = rx.process(x, rx.initial_state())
        np.testing.assert_array_equal(np.asarray(a_bank[i]), np.asarray(a_one))


def test_write_wav_roundtrip(tmp_path):
    import wave

    rate = 8000.0
    audio = np.sin(2 * np.pi * 440 * np.arange(1600) / rate)
    p = write_wav(tmp_path / "t.wav", audio, rate)
    with wave.open(str(p), "rb") as w:
        assert w.getframerate() == 8000
        assert w.getnchannels() == 1
        pcm = np.frombuffer(w.readframes(w.getnframes()), "<i2")
    assert pcm.size == 1600
    assert np.max(np.abs(pcm)) == pytest.approx(0.9 * 32767, rel=0.01)


def test_receiver_rejects_complex_input():
    """Review finding: complex input was silently cast to float (only a
    ComplexWarning), demodulating the real plane alone — no image
    rejection, wrong audio, no error."""
    rx = Receiver(fs=1e6, center_hz=200e3, mode="am", audio_rate=25e3)
    iq = np.zeros(rx.chunk_granularity, np.complex64)
    with pytest.raises(ValueError, match="process_planes"):
        rx.process(iq, rx.initial_state())
