"""Demo: the hardware-faithful Q15 wire mode, sequential and streamed.

Shows the three guarantees of the faithful path (SURVEY §2.6 contract):
  1. the int16 spectrum words are exactly what the reference FPGA would
     drain onto its UART/Ethernet wire for the same samples (RTL window
     ROM + x64 integer IIR + the xfft scaled-FFT model);
  2. the RTL's offset-window quirk is visible: a pure tone splits into
     the two ADJACENT bins with the center suppressed — compare with the
     float pipeline's true-Hann peak;
  3. the double-buffered Q15Stream emits the SAME bits as sequential
     process() calls while overlapping host filtering with the device
     FFT.

    PYTHONPATH= JAX_PLATFORMS=cpu python examples/demo_faithful.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import scipy.signal as sps

from tpu_sdr import PipelineConfig
from tpu_sdr.core import qformat as qf
from tpu_sdr.runtime.q15 import Q15Pipeline, Q15Stream


def main():
    fs, n = 1_000_000.0, 16384
    f_tone = 250_000.0
    k = round(f_tone * n / fs)
    t = np.arange(4 * n) / fs
    x = np.clip(
        np.round(0.7 * 32767 * np.sin(2 * np.pi * f_tone * t)), -32768, 32767
    ).astype(np.int16)

    pipe = Q15Pipeline(PipelineConfig(channels=1), device_fft=True)
    pipe.upload_sos_q(qf.quantize_coeff_x64(sps.butter(4, 0.6, output="sos")))

    # 1+2: bypass mode — wire words + the offset-window quirk
    out, _ = pipe.process(x, bypass=True, display=True)
    disp = np.asarray(out["display_frame"]).reshape(3, n)
    mag = disp[2][: n // 2]
    top = np.argsort(mag)[-3:][::-1]
    print(f"tone at bin {k}: top wire-magnitude bins = {sorted(top.tolist())}")
    print(
        "  (RTL offset window -cos: energy in the ADJACENT bins "
        f"{k - 1}/{k + 1}, center suppressed — exactly as on the FPGA)"
    )
    re_q = disp[0].astype(np.int16)
    im_q = disp[1].astype(np.int16)
    wire_peak = max(int(np.abs(re_q).max()), int(np.abs(im_q).max()))
    print(f"  int16 wire words: peak |re/im| = {wire_peak} "
          f"(these bytes ARE the UART/UDP frame)")

    # 3: streamed == sequential, bitwise, while overlapping
    chunks = [x[i * n : (i + 1) * n] for i in range(4)]
    # warm the filtered-mode jit OUTSIDE the timed loops — otherwise the
    # sequential loop absorbs the one-time compile and the comparison
    # reports a phantom streaming win (measurement-discipline 101)
    pipe.process(chunks[0], None, bypass=False)
    zi, seq = None, []
    t0 = time.perf_counter()
    for c in chunks:
        o, zi = pipe.process(c, zi, bypass=False)
        seq.append(np.asarray(o["magnitude"]))
    t_seq = time.perf_counter() - t0

    stream = Q15Stream(pipe, fetch=("magnitude",))
    got = []
    t0 = time.perf_counter()
    for c in chunks:
        r = stream.push(c)
        if r is not None:
            got.append(r[0]["magnitude"])
    got.append(stream.flush()[0]["magnitude"])
    t_stream = time.perf_counter() - t0
    stream.close()

    same = all(np.array_equal(a, b) for a, b in zip(seq, got))
    print(f"streamed == sequential, bitwise: {same} "
          f"(seq {t_seq * 1e3:.0f} ms, streamed {t_stream * 1e3:.0f} ms)")
    assert same


if __name__ == "__main__":
    main()
