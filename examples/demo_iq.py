"""Demo: complex (IQ) baseband input — single-sided spectra.

The reference hardware digitizes a real signal (XADC), so every tone
mirrors around DC. With IQ input the spectrum is single-sided: positive
and negative frequencies are distinct — the standard SDR baseband view.

    PYTHONPATH= JAX_PLATFORMS=cpu python examples/demo_iq.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import scipy.signal as sps

from tpu_sdr import FilterMode, PipelineConfig
from tpu_sdr.runtime import SpectrumPipeline


def main():
    fs, n = 1_000_000.0, 16384
    pipe = SpectrumPipeline(PipelineConfig())
    t = np.arange(2 * n) / fs

    # +150 kHz and -350 kHz complex exponentials: distinguishable only
    # with IQ input.
    iq = (
        np.exp(2j * np.pi * 150e3 * t) + 0.5 * np.exp(-2j * np.pi * 350e3 * t)
    ).astype(np.complex64)

    state = pipe.initial_state(batch_shape=(2,))  # re/im-stacked state
    out, state = pipe.process(iq, state, FilterMode.BYPASS)
    mag = np.asarray(out["magnitude"])[0, -1]

    def bin_to_khz(k):
        f = k * fs / n
        return (f if f <= fs / 2 else f - fs) / 1000.0

    # two strongest distinct peaks (Hann spreads each tone over ~3 bins)
    m = mag.copy()
    peaks = []
    for _ in range(2):
        k = int(np.argmax(m))
        peaks.append(bin_to_khz(k))
        m[max(0, k - 4) : k + 5] = 0
    print("strongest peaks:", sorted(peaks), "kHz  (expect [-350, +150])")

    # A 200 kHz lowpass keeps +150 kHz and removes -350 kHz (real
    # coefficients act symmetrically on +/- frequencies).
    pipe.upload_sos(sps.butter(12, 200e3 / (fs / 2), output="sos"))
    out, state = pipe.process(iq, state, FilterMode.CUSTOM)
    mag2 = np.asarray(out["magnitude"])[0, -1]
    k350 = n - int(350e3 * n / fs)
    print(
        f"-350 kHz tone: {20*np.log10(mag2[k350]/mag[k350]):.1f} dB after lowpass"
    )


if __name__ == "__main__":
    main()
