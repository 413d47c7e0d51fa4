"""Literal certification of the BASELINE.json configs at their stated
scales (the smaller-scale equivalents run throughout the suite; these
pin the exact numbers the baseline names).

Config 1 (single 16K block vs CPU reference)  -> test_stream.test_config1_*
Config 3 (64-channel bank, runtime reload)    -> test_filterbank.*
Config 5 (N>=2 hosts, collective exchange)    -> test_distributed.* (2 and
                                                 4 REAL processes, bitwise)

Here: config 2 at the full 1024 sequential blocks, and config 4 at the
full 4096 channels (sharded over the 8-device virtual mesh, waterfall
output). Kept on the XLA path (use_pallas=False) so CPU wall time stays
test-suite friendly; the Pallas path's equivalence is covered elsewhere.
"""

import jax.numpy as jnp
import numpy as np
import scipy.signal as sps

from tpu_sdr.control import golden
from tpu_sdr.core.config import FilterMode, PipelineConfig
from tpu_sdr.runtime import SpectrumPipeline
from tpu_sdr.runtime.state import StreamState


def test_config2_1024_blocks_state_carry_bitwise():
    """BASELINE config 2: 1024 sequential 16K blocks with carried IIR
    state — chunked (16 dispatches of 64 frames) == one-shot, bitwise,
    and the counters account for the full stream."""
    n = 16384
    blocks = 1024
    cfg = PipelineConfig(channels=1, use_pallas=False)
    pipe = SpectrumPipeline(cfg)
    pipe.upload_sos(sps.ellip(12, 0.5, 70, 0.3, output="sos"))
    rng = np.random.default_rng(2)
    x = rng.standard_normal(blocks * n).astype(np.float32)

    out_whole, st_whole = pipe.process(x, pipe.initial_state(), FilterMode.CUSTOM)
    mags_whole = np.asarray(out_whole["magnitude"])[0]
    assert mags_whole.shape == (blocks, n)

    st = pipe.initial_state()
    mags = []
    for chunk in np.split(x, 16):
        o, st = pipe.process(chunk, st, FilterMode.CUSTOM)
        mags.append(np.asarray(o["magnitude"])[0])
    assert np.array_equal(np.concatenate(mags, axis=0), mags_whole)
    assert int(st.frame_count) == blocks
    assert int(st.window_phase) == 0  # 1024 full frames wrap exactly
    assert np.array_equal(
        np.asarray(st.sos_state), np.asarray(st_whole.sos_state)
    )


def test_config4_4096_channels_sharded_waterfall():
    """BASELINE config 4: 4096 channels sharded over the (8, 1) virtual
    mesh, one 16K frame each, waterfall (per-channel magnitude rows);
    spot channels bitwise vs the single-device run and within 1 dB of
    the golden model."""
    from tpu_sdr.shard import ShardedSpectrumPipeline, make_sdr_mesh

    n = 16384
    C = 4096
    cfg = PipelineConfig(channels=C, use_pallas=False)
    mesh = make_sdr_mesh(channel=8, time=1)
    sharded = ShardedSpectrumPipeline(cfg, mesh)
    rng = np.random.default_rng(4)
    # distinct tone per spot-checked channel + noise everywhere
    x = 0.05 * rng.standard_normal((C, n)).astype(np.float32)
    spot = [0, 1234, 4095]
    freqs = [100_000.0, 250_000.0, 400_000.0]
    t = np.arange(n) / 1e6
    for c, f in zip(spot, freqs):
        x[c] += 0.5 * np.sin(2 * np.pi * f * t).astype(np.float32)

    st = StreamState(
        sos_state=jnp.zeros((C, cfg.n_sections, 2), jnp.float32),
        window_phase=jnp.zeros((), jnp.int32),
        frame_count=jnp.zeros((), jnp.int32),
    )
    out, st1 = sharded.process(x, st, FilterMode.BYPASS)
    waterfall = np.asarray(out["magnitude"])[:, 0, :]  # (C, n) rows
    assert waterfall.shape == (C, n)
    assert np.isfinite(waterfall).all()
    assert int(st1.frame_count) == 1

    # spot channels: bitwise vs an unsharded run of the same channels,
    # and the tone lands in the right bin within 1 dB of golden
    single = SpectrumPipeline(PipelineConfig(channels=3, use_pallas=False))
    st3 = StreamState(
        sos_state=jnp.zeros((3, cfg.n_sections, 2), jnp.float32),
        window_phase=jnp.zeros((), jnp.int32),
        frame_count=jnp.zeros((), jnp.int32),
    )
    o3, _ = single.process(x[spot], st3, FilterMode.BYPASS)
    m3 = np.asarray(o3["magnitude"])[:, 0, :]
    assert np.array_equal(waterfall[spot], m3)
    for row, f in zip(m3, freqs):
        ref = golden.golden_pipeline(
            np.asarray(x[spot[freqs.index(f)]], np.float64), sos=None,
            window="hann",
        )["magnitude"][0]
        mask = ref > ref.max() * 1e-2
        db = 20 * np.log10(np.maximum(row[mask], 1e-12) / ref[mask])
        assert np.abs(db).max() < 1.0
        assert abs(int(np.argmax(row[: n // 2])) - round(f * n / 1e6)) <= 1
