"""Demo: zoom FFT — channelizer + spectrum pipeline composed.

The direct 16K FFT at 1 MSPS resolves ~61 Hz/bin (the reference's
resolution, README.md:166). Channelizing first and running the 16K
pipeline on ONE subchannel's decimated IQ stream zooms that subchannel to
fs / (M * 16384) ≈ 0.48 Hz/bin — two tones 12 Hz apart, invisible to the
direct FFT, resolve cleanly.

    PYTHONPATH= JAX_PLATFORMS=cpu python examples/demo_zoom.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from tpu_sdr import FilterMode, PipelineConfig
from tpu_sdr.kernels.pfb import Channelizer
from tpu_sdr.runtime import SpectrumPipeline


def main():
    fs, m, n = 1e6, 128, 16384
    ch = Channelizer(m=m, taps=8, sample_rate=fs)
    sub_rate = fs / m
    zoom_bin = sub_rate / n
    k = 32  # subchannel centered at 250 kHz
    f1 = k * sub_rate + 1000.0
    f2 = f1 + 12.0
    print(f"direct resolution {fs / n:.1f} Hz/bin; "
          f"zoom resolution {zoom_bin:.3f} Hz/bin")
    print(f"tones at {f1:.1f} and {f2:.1f} Hz (12 Hz apart)")

    T = (n + ch.taps) * m
    t = np.arange(T) / fs
    iq = 0.5 * np.exp(2j * np.pi * f1 * t) + 0.5 * np.exp(2j * np.pi * f2 * t)
    xs = np.stack([iq.real, iq.imag]).astype(np.float32)

    out, _ = ch.process_planes(xs, ch.initial_state((2,)))
    sub = (np.asarray(out["re"])[..., k] + 1j * np.asarray(out["im"])[..., k])
    sub = sub[ch.taps : ch.taps + n]  # one settled zoom frame

    pipe = SpectrumPipeline(
        PipelineConfig(channels=1, sample_rate=sub_rate)
    )
    zout, _ = pipe.process(
        sub.astype(np.complex64)[None, :],
        pipe.initial_state(batch_shape=(2,)),
        FilterMode.BYPASS,
    )
    mag = np.asarray(zout["magnitude"])[0, 0]
    top2 = sorted(np.argsort(mag)[-2:].tolist())
    for b in top2:
        f_abs = k * sub_rate + b * zoom_bin
        print(f"  zoom peak at bin {b} -> {f_abs:.2f} Hz")
    sep = (top2[1] - top2[0]) * zoom_bin
    print(f"  separation {sep:.2f} Hz (expected 12) — resolved: "
          f"{abs(sep - 12.0) < 1.5}")


if __name__ == "__main__":
    main()
