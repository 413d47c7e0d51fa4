"""Demo: digital burst link — QPSK packets over an impaired channel.

Builds a 16-QAM and a QPSK burst (RRC-shaped, preamble-framed), passes
them through a channel with delay, carrier offset, phase rotation and
noise, then recovers the exact payload bits with the all-feedforward
burst demodulator and prints the sync estimates. Also demonstrates the
DDC -> BurstModem composition: a burst riding a 200 kHz carrier inside
a 1 MSPS capture is mixed to baseband first, then demodulated.

    PYTHONPATH= JAX_PLATFORMS=cpu python examples/demo_burst.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from tpu_sdr.kernels.digital import BurstModem, bit_error_rate


def impair(re, im, delay, cfo_cps, phase, snr_db, rng):
    z = re.astype(np.float64) + 1j * im.astype(np.float64)
    z = np.concatenate([np.zeros(delay), z])
    z *= np.exp(2j * np.pi * cfo_cps * np.arange(z.size) + 1j * phase)
    n0 = 10.0 ** (-snr_db / 10.0)
    z += np.sqrt(n0 / 2) * (rng.standard_normal(z.size)
                            + 1j * rng.standard_normal(z.size))
    return z


def main():
    rng = np.random.default_rng(42)

    for scheme, n_syms, snr in (("qpsk", 512, 18.0), ("qam16", 512, 28.0)):
        mod = BurstModem(scheme, sps=8)
        n_bits = n_syms * mod.bps
        bits = rng.integers(2, size=n_bits).astype(np.uint8)
        re, im = mod.modulate(bits, pad_syms=mod.max_lag_syms + mod.span)
        z = impair(re, im, delay=43, cfo_cps=3e-5, phase=0.7,
                   snr_db=snr, rng=rng)
        out = mod.demodulate(z.real.astype(np.float32),
                             z.imag.astype(np.float32), n_bits)
        ber = bit_error_rate(bits, out["bits"])
        print(f"{scheme:6s}: {n_bits} bits  BER {ber:.1e}  "
              f"lag {int(out['frame_lag'])} syms  "
              f"timing {float(out['timing']):+.2f} samp  "
              f"cfo {float(out['cfo']):+.2e} cyc/sym")
        assert ber == 0.0

    # burst on a carrier: DDC to baseband, then demodulate
    from tpu_sdr.kernels.ddc import DDC

    fs, fc = 1e6, 200e3
    # the capture leads the burst by 200 samples = 25 symbols, so widen
    # the frame-search window beyond its 16-symbol default
    mod = BurstModem("qpsk", sps=8, max_lag_syms=32)
    bits = rng.integers(2, size=1024).astype(np.uint8)
    bre, bim = mod.modulate(bits, pad_syms=mod.max_lag_syms + mod.span)
    zb = impair(bre, bim, delay=200, cfo_cps=0.0, phase=0.3,
                snr_db=25.0, rng=rng)
    x = (zb * np.exp(2j * np.pi * fc / fs * np.arange(zb.size))).real * 2.0
    pad = (-x.size) % 64
    x = np.concatenate([x, np.zeros(pad)]).astype(np.float32)

    ddc = DDC(fs, center_hz=fc, decimation=1)
    bb, _ = ddc.process(x, ddc.initial_state())
    out = mod.demodulate(np.asarray(bb["re"]), np.asarray(bb["im"]), 1024)
    ber = bit_error_rate(bits, out["bits"])
    print(f"carrier-riding qpsk via DDC: BER {ber:.1e}  "
          f"lag {int(out['frame_lag'])} syms")
    assert ber == 0.0
    print("demo_burst: OK")


if __name__ == "__main__":
    main()
