"""Demo: multi-channel filter bank + waterfall spectrogram (configs 3-4).

    PYTHONPATH= JAX_PLATFORMS=cpu python examples/demo_waterfall.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import scipy.signal as sps

from tpu_sdr import FilterMode, PipelineConfig
from tpu_sdr.runtime import SpectrumPipeline
from tpu_sdr.runtime.state import StreamState
from tpu_sdr.runtime.waterfall import Waterfall, decimate_db

C = 8


def main():
    pipe = SpectrumPipeline(PipelineConfig(channels=C))
    # per-channel filter bank: staggered lowpass cutoffs
    pipe.upload_sos_bank(
        [sps.butter(12, 0.1 * (c + 1), output="sos") for c in range(C)]
    )
    state = StreamState.initial(C)
    wf = Waterfall(points=1024, depth=64)

    rng = np.random.default_rng(0)
    for step in range(4):
        x = rng.standard_normal((C, 2 * 16384)).astype(np.float32)
        out, state = pipe.process(x, state, FilterMode.CUSTOM)
        mags = np.asarray(out["magnitude"])
        wf.push(np.asarray(decimate_db(mags[0])))
    img = wf.image()
    print(f"waterfall {img.shape}, rows {wf.row_count}, "
          f"peak-hold max {wf.peak_hold.max():.1f} dB")
    # per-channel noise floors reflect each channel's cutoff
    floors = [
        float(np.median(20 * np.log10(np.asarray(out['magnitude'])[c, -1] + 1e-9)))
        for c in range(C)
    ]
    print("per-channel median dB:", np.round(floors, 1))


if __name__ == "__main__":
    main()
