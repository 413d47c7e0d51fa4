"""Demo: the reference's core use case — find a tone, design a filter, kill
an interferer. Runs on CPU or TPU.

    PYTHONPATH= JAX_PLATFORMS=cpu python examples/demo_two_tone.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from tpu_sdr import FilterMode, PipelineConfig
from tpu_sdr.control import SpectrumAnalyzer, design_iir_filter
from tpu_sdr.runtime.source import SyntheticSource


def main():
    fs = 1_000_000.0
    sa = SpectrumAnalyzer(PipelineConfig(channels=1))
    sa.start()
    src = SyntheticSource(
        tones_hz=((250_000.0, 0.4), (400_000.0, 0.4)), noise=0.01, fs=fs
    )
    x = src.read(4 * sa.cfg.fft_size)

    out = sa.process(x)
    mag = np.asarray(out["magnitude"])[0, -1]
    peak_khz = np.argsort(mag[: 8192])[-2:] * sa.cfg.hz_per_bin / 1000
    print(f"bypass: two peaks near {sorted(peak_khz.round(1))} kHz")

    d = design_iir_filter("butterworth", "lowpass", 12, fs, 300_000.0)
    sa.upload_filter(d.sos)
    sa.set_filter_mode(FilterMode.CUSTOM)
    out2 = sa.process(x)
    mag2 = np.asarray(out2["magnitude"])[0, -1]
    b400 = int(400_000 * sa.cfg.fft_size / fs)
    print(
        f"after 300 kHz lowpass: 400 kHz suppressed "
        f"{20*np.log10((mag2[b400]+1e-9)/mag[b400]):.1f} dB"
    )
    print(f"stats: {sa.stats.as_dict()}")


if __name__ == "__main__":
    main()
