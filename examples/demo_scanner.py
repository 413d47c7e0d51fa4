"""Demo: band-occupancy scan of 0-500 kHz in 25 kHz channels.

Builds a capture with four emitters of very different strengths, scans
the span with DDCBank batches (16 carriers mixed per dispatch), and
prints the occupancy table with SNR over the adaptive noise floor.

    PYTHONPATH= JAX_PLATFORMS=cpu python examples/demo_scanner.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from tpu_sdr.runtime import SpectrumScanner


def main():
    fs = 1e6
    rng = np.random.default_rng(1)
    n = np.arange(2**19)
    emitters = [(87.5e3, 0.5), (212.5e3, 0.1), (287.5e3, 0.02), (437.5e3, 0.004)]
    x = 1e-4 * rng.standard_normal(n.size)
    for f, a in emitters:
        x = x + a * np.cos(2 * np.pi * f * n / fs + rng.uniform(0, 2 * np.pi))

    sc = SpectrumScanner(fs, 0.0, 500e3, channel_bw=25e3, threshold_db=10.0)
    res = sc.scan(x.astype(np.float32))

    print(f"scanned {sc.n_channels} channels of {sc.channel_bw/1e3:.0f} kHz "
          f"(decimation {sc.decimation}); noise floor "
          f"{res.noise_floor_db:.1f} dB")
    print(f"{'center':>10} {'power':>9} {'snr':>7}  occupied")
    for i, c in enumerate(res.centers_hz):
        mark = "  ***" if res.occupied[i] else ""
        print(f"{c/1e3:>8.1f}k {res.power_db[i]:>8.1f}dB "
              f"{res.power_db[i]-res.noise_floor_db:>6.1f}dB{mark}")
    print("hits (strongest first):")
    for h in res.hits:
        print(f"  {h['center_hz']/1e3:.1f} kHz  {h['power_db']:.1f} dB "
              f"(snr {h['snr_db']:.1f} dB)")


if __name__ == "__main__":
    main()
