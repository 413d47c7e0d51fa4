"""Demo: the tune-to-audio receiver — two FM stations to WAV files.

Synthesizes a wideband capture carrying two broadcast-FM stations, then
demodulates BOTH at once with a ``ReceiverBank`` (one DDCBank mix per
chunk — the input is read once) and writes each station's audio to a
48 kHz WAV. Chunked streaming is bitwise-identical to one-shot.

    PYTHONPATH= JAX_PLATFORMS=cpu python examples/demo_receiver.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from tpu_sdr.runtime.receiver import ReceiverBank, write_wav


def main():
    fs = 1e6
    stations = {200e3: 440.0, 380e3: 880.0}  # carrier -> audio tone (Hz)
    bank = ReceiverBank(fs=fs, centers_hz=list(stations), mode="wbfm",
                        audio_rate=48e3)
    g = bank.chunk_granularity
    t_len = 16 * g
    n = np.arange(t_len)

    x = 2e-4 * np.random.default_rng(0).standard_normal(t_len)
    for fc, fa in stations.items():
        msg = np.sin(2 * np.pi * fa * n / fs)
        x = x + 0.5 * np.cos(
            2 * np.pi * fc * n / fs + 2 * np.pi * 75e3 / fs * np.cumsum(msg))
    x = x.astype(np.float32)

    print(f"receiver bank: {bank.k} stations, mode={bank.mode}, "
          f"audio {float(bank.realized_audio_rate):.0f} Hz, "
          f"chunk granularity {g} samples")
    st = bank.initial_state()
    audio = []
    for i in range(0, t_len, 4 * g):  # stream like a live capture
        a, st = bank.process(x[i : i + 4 * g], st)
        audio.append(np.asarray(a))
    audio = np.concatenate(audio, axis=-1)

    rate = float(bank.realized_audio_rate)
    for i, (fc, fa) in enumerate(stations.items()):
        a = audio[i, int(0.01 * rate):]
        spec = np.abs(np.fft.rfft(a * np.hanning(a.size)))
        f_peak = np.argmax(spec) * rate / a.size
        path = write_wav(f"/tmp/station_{int(fc/1e3)}k.wav", audio[i], rate)
        print(f"  {fc/1e3:.0f} kHz: dominant audio tone {f_peak:.1f} Hz "
              f"(sent {fa:.0f}) -> {path}")


if __name__ == "__main__":
    main()
