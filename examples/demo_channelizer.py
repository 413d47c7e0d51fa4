"""Demo: PFB channelizer — split the band into 128 decimated subchannels.

Two IQ tones (one above DC, one below) land in their own subchannels with
the prototype FIR's stopband (not a bare FFT bin) as the only leakage.

    PYTHONPATH= JAX_PLATFORMS=cpu python examples/demo_channelizer.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from tpu_sdr.kernels.pfb import Channelizer


def main():
    fs, m = 1e6, 128
    ch = Channelizer(m=m, taps=8, sample_rate=fs)
    print(f"{m} subchannels x {ch.channel_hz / 1e3:.2f} kHz, "
          f"prototype {ch.taps * m} taps")

    t = np.arange(64 * m) / fs
    iq = 0.8 * np.exp(2j * np.pi * 250e3 * t) + 0.3 * np.exp(
        -2j * np.pi * 101e3 * t
    )
    xs = np.stack([iq.real, iq.imag]).astype(np.float32)

    out, _ = ch.process_planes(xs, ch.initial_state((2,)), outputs="magnitude")
    mag = np.asarray(out["magnitude"])[-1]  # last (settled) step
    occupied = np.flatnonzero(mag > 0.05)
    for k in occupied:
        f = k * ch.channel_hz
        if f > fs / 2:
            f -= fs  # IQ channels wrap to negative frequencies
        print(f"  channel {k:3d} ({f / 1e3:+7.1f} kHz): |Y| = {mag[k]:.3f}")
    floor = np.delete(mag, occupied).max()
    print(f"  leakage floor elsewhere: {20 * np.log10(floor + 1e-12):.1f} dBFS")


if __name__ == "__main__":
    main()
