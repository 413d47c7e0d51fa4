"""Demo: DDC tuning + calibrated Welch PSD.

Tune the DDC to an arbitrary (off-grid) center frequency, decimate by
64, and measure the baseband with a calibrated Welch PSD — the tone's
power integrates to its true mean-square value regardless of window or
segment count (scipy.signal.welch semantics, on-device).

    PYTHONPATH= JAX_PLATFORMS=cpu python examples/demo_ddc_psd.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from tpu_sdr.kernels.ddc import DDC
from tpu_sdr.runtime import WelchPSD


def main():
    fs, r = 1e6, 64
    fc = 217_700.0        # not on any subchannel grid
    f_tone, amp = fc + 1800.0, 0.4
    ddc = DDC(fs=fs, center_hz=fc, decimation=r, taps_per_phase=16)
    print(f"DDC: center {fc / 1e3:.1f} kHz, output rate {ddc.output_rate / 1e3:.2f} kHz")

    n = np.arange(2**21, dtype=np.float64)
    x = (
        amp * np.cos(2 * np.pi * (f_tone / fs) * n)
        + 0.02 * np.random.default_rng(0).standard_normal(n.size)
    ).astype(np.float32)

    out, _ = ddc.process(x, ddc.initial_state(()))
    zr = np.asarray(out["re"])[512:]
    zi = np.asarray(out["im"])[512:]

    est = WelchPSD(fs=ddc.output_rate, nperseg=2048, window="hann")
    psd = np.asarray(est.compute_iq(zr, zi), np.float64)
    f = est.frequencies(onesided=False)

    peak = int(np.argmax(psd))
    # integrate the tone's spectral neighborhood -> its mean-square power.
    # the real tone (amp/2 per exponential) downconverts to a single
    # complex exponential of amplitude amp/2 -> power amp^2/4
    df = ddc.output_rate / est.nperseg
    p_tone = psd[max(0, peak - 4) : peak + 5].sum() * df
    print(f"tone recovered at {fc + f[peak]:.1f} Hz (true {f_tone:.1f})")
    print(f"integrated tone power {p_tone:.5f} (true {amp**2 / 4:.5f})")
    assert abs(fc + f[peak] - f_tone) < df
    assert abs(p_tone - amp**2 / 4) / (amp**2 / 4) < 0.05
    print("OK")


if __name__ == "__main__":
    main()
