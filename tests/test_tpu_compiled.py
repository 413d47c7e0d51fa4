"""Compiled-kernel parity on a REAL TPU — opt-in.

Run exactly one process against the chip:

    timeout 590 env TPU_SDR_TPU_TESTS=1 python -m pytest tests/test_tpu_compiled.py -q

The regular suite exercises the Pallas kernels in interpret mode on CPU;
this file compiles them with Mosaic and checks the numerics on the chip.

References are NumPy float64 oracles or the compiled-"highest" variant —
NOT interpret mode: under a TPU backend, interpret-mode jnp dots execute
on the chip at their stated precision, so an interpret "reference" for
the bf16-split variants would itself degrade to bf16 quality (measured:
interpret-on-TPU high3 sits 3e-3 from everything else while compiled
high3 is 5e-6 from exact f32).
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("TPU_SDR_TPU_TESTS") != "1",
    reason="opt-in real-TPU suite (TPU_SDR_TPU_TESTS=1)",
)


@pytest.fixture(scope="module")
def setup():
    import jax
    import jax.numpy as jnp
    import scipy.signal as sps

    if jax.default_backend() == "cpu":
        pytest.skip("no TPU available")
    from tpu_sdr.kernels import fft, window
    from tpu_sdr.kernels.pallas import iir_fft

    sos = sps.butter(12, 0.25, output="sos")
    win = window.hann_coefficients(16384)
    plan = fft.plan_constants(128, 128)
    pp = iir_fft.build_plan(sos, win, plan, 128, 128)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((8, 16384)), jnp.float32)
    zs = jnp.asarray(rng.standard_normal((8, 12)) * 0.1, jnp.float32)
    return iir_fft, pp, np.asarray(win), x, zs


def test_compiled_highest_matches_numpy_oracle(setup):
    """Exact-f32 compiled kernel vs the float64 windowed-FFT oracle."""
    iir_fft, pp, win, x, zs = setup
    got = np.array(
        iir_fft.spectrum_from_state(
            x, zs * 0, pp, precision="highest", bypass=True
        ),
        np.float64,
    )
    ref = np.abs(np.fft.fft(np.asarray(x, np.float64) * win, axis=-1))
    rel = np.abs(got - ref).max() / ref.max()
    assert rel < 1e-5, f"compiled highest vs numpy: {rel}"


@pytest.mark.parametrize(
    "kw,tol",
    [
        (dict(precision="high3"), 5e-5),
        (dict(precision="high3", karatsuba=True), 5e-5),
        (dict(precision="default"), 1e-2),
        (dict(precision="highest", half_spectrum=True), 1e-5),
    ],
    ids=["high3", "high3+kara", "default", "half"],
)
def test_compiled_variants_vs_compiled_highest(setup, kw, tol):
    """Each tier's kernel variant against the exact-f32 compiled kernel —
    verifies the bf16-split precision emulation does its job ON the chip
    (full IIR structure, nonzero entry states)."""
    iir_fft, pp, win, x, zs = setup
    ref = np.array(
        iir_fft.spectrum_from_state(x, zs, pp, precision="highest"),
        np.float64,
    )
    got = np.array(
        iir_fft.spectrum_from_state(x, zs, pp, **kw), np.float64
    )
    rel = np.abs(got - ref).max() / ref.max()
    assert rel < tol, f"{kw}: rel err vs compiled highest {rel}"


@pytest.mark.parametrize("precision", ["high3", "default", "highest"])
def test_compiled_flat_emit_bitwise(setup, precision):
    """The round-5 flat-emit store (in-kernel relayout to (F, n) lane
    rows) must reproduce the default layout's bits exactly ON the chip —
    Mosaic lowers the transpose+merge differently from interpret mode, so
    the CPU bitwise test alone is not evidence."""
    iir_fft, pp, win, x, zs = setup
    base = np.array(
        iir_fft.spectrum_from_state(x, zs, pp, precision=precision)
    )
    flat = np.array(
        iir_fft.spectrum_from_state(
            x, zs, pp, precision=precision, flat_emit=True
        )
    )
    np.testing.assert_array_equal(flat, base)
    blocked = np.array(
        iir_fft.spectrum_from_state(
            x, zs, pp, precision=precision, blocked_output=True
        )
    )
    np.testing.assert_array_equal(blocked.reshape(base.shape), base)


def test_compiled_complex_kernel_vs_numpy(setup):
    iir_fft, pp, win, x, zs = setup
    xi = x[::-1]
    got = np.array(
        iir_fft.spectrum_mag_complex(x, xi, pp, precision="highest"),
        np.float64,
    )
    z = (np.asarray(x, np.float64) + 1j * np.asarray(xi, np.float64)) * win
    ref = np.abs(np.fft.fft(z, axis=-1))
    rel = np.abs(got - ref).max() / ref.max()
    assert rel < 1e-5, f"complex kernel vs numpy: {rel}"


def test_compiled_pfb_kernel_vs_numpy(setup):
    """The fused PFB fold+DFT Pallas kernel compiled with Mosaic on the
    chip vs a float64 NumPy weighted-overlap-fold oracle."""
    import scipy.signal as sps

    from tpu_sdr.kernels.pfb import Channelizer

    m, taps = 128, 8
    ch = Channelizer(m=m, taps=taps, use_pallas=True)
    rng = np.random.default_rng(11)
    x = rng.standard_normal((2, 40 * m)).astype(np.float32)
    out, _ = ch.process(x, ch.initial_state((2,)))
    got = np.asarray(out["re"], np.float64) + 1j * np.asarray(
        out["im"], np.float64
    )
    h = np.asarray(ch._h2, np.float64).reshape(-1)
    xc = np.concatenate([np.zeros((2, (taps - 1) * m)), x], axis=-1)
    steps = x.shape[-1] // m
    W = np.exp(-2j * np.pi * np.outer(np.arange(m), np.arange(m)) / m)
    ref = np.empty((2, steps, m), complex)
    for n in range(steps):
        blk = xc[:, n * m : (n + taps) * m] * h
        ref[:, n] = blk.reshape(2, taps, m).sum(axis=1) @ W
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 1e-5, f"compiled pfb vs numpy: {rel}"


def test_compiled_ddc_uint32_nco_vs_oracle(setup):
    """The uint32 wrapping NCO + polyphase decimator compiled on the chip
    vs the float64 lfilter oracle (locks the axon backend's uint32
    multiply/convert semantics)."""
    import scipy.signal as sps

    from tpu_sdr.kernels.ddc import DDC

    fs, fc, r = 1e6, 123_456.789, 8
    ddc = DDC(fs=fs, center_hz=fc, decimation=r)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 128 * r)).astype(np.float32)
    out, _ = ddc.process(x, ddc.initial_state((2,)))
    got = np.asarray(out["re"], np.float64) + 1j * np.asarray(
        out["im"], np.float64
    )
    n = np.arange(x.shape[-1], dtype=np.float64)
    fc_q = ddc.realized_center_hz  # the 32-bit tuning grid frequency
    y = np.asarray(x, np.float64) * np.exp(-2j * np.pi * (fc_q / fs) * n)
    ref = sps.lfilter(np.asarray(ddc.fir, np.float64), 1.0, y, axis=-1)[
        ..., r - 1 :: r
    ]
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 1e-5, f"compiled ddc vs oracle: {rel}"


def test_compiled_ddc_bank_matches_singles(setup):
    """The jitted vmapped bank on the chip == independent DDCs."""
    from tpu_sdr.kernels.ddc import DDC, DDCBank

    centers = [77e3, -150e3, 313_131.5]
    bank = DDCBank(fs=1e6, centers_hz=centers, decimation=8)
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 64 * 8)).astype(np.float32)
    bout, _ = bank.process(x, bank.initial_state((2,)))
    for i, fc in enumerate(centers):
        d = DDC(fs=1e6, center_hz=fc, decimation=8)
        o, _ = d.process(x, d.initial_state((2,)))
        got = np.asarray(bout["re"])[i]
        ref = np.asarray(o["re"])
        rel = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-12)
        assert rel < 1e-6, (i, rel)


def test_compiled_pipeline_tone():
    from tpu_sdr import PipelineConfig, FilterMode
    from tpu_sdr.runtime import SpectrumPipeline

    fs, n = 1e6, 16384
    pipe = SpectrumPipeline(PipelineConfig())
    t = np.arange(2 * n) / fs
    x = (0.4 * np.sin(2 * np.pi * 250e3 * t)).astype(np.float32)
    out, st = pipe.process(x, pipe.initial_state(), FilterMode.BYPASS)
    mag = np.array(out["magnitude"])[0, -1][: n // 2]
    assert np.argmax(mag) == 4096
    assert int(st.frame_count) == 2


def test_compiled_resampler_vs_upfirdn(setup):
    """The polyphase L/M resampler compiled on the chip vs the scipy
    upfirdn float64 oracle (locks strided-slice + MAC ordering)."""
    import scipy.signal as sps

    from tpu_sdr.kernels.resample import Resampler

    rs = Resampler(up=3, down=2, taps_per_phase=8)
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 40 * 2)).astype(np.float32)
    out, _ = rs.process(x, rs.initial_state((2,)))
    got = np.asarray(out, np.float64)
    ref = sps.upfirdn(np.asarray(rs.fir, np.float64),
                      np.asarray(x, np.float64), 3, 2)[..., : got.shape[-1]]
    assert np.abs(got - ref).max() < 2e-5


def test_compiled_fm_demod_vs_oracle(setup):
    """Quadrature discriminator + affine-prefix de-emphasis on the chip
    vs the float64 sequential oracle (locks atan2 + the blocked
    Hillis-Steele affine solver)."""
    import scipy.signal as sps

    from tpu_sdr.kernels.demod import FMDemodulator, deemphasis_sos

    fs, dev = 200e3, 75e3
    fm = FMDemodulator(fs, deviation_hz=dev, deemphasis_tau=75e-6)
    rng = np.random.default_rng(6)
    n = np.arange(4096)
    msg = np.sin(2 * np.pi * 1000 * n / fs)
    ph = 2 * np.pi * dev / fs * np.cumsum(msg)
    re = np.cos(ph).astype(np.float32)
    im = np.sin(ph).astype(np.float32)
    audio, _ = fm.process(re, im, fm.initial_state())
    z = re.astype(np.float64) + 1j * im.astype(np.float64)
    zp = np.concatenate([[0.0], z[:-1]])
    disc = np.angle(z * np.conj(zp)) * fs / (2 * np.pi) / dev
    ref = sps.sosfilt(deemphasis_sos(fs, 75e-6), disc)
    assert np.abs(np.asarray(audio, np.float64) - ref).max() < 1e-3


def test_compiled_agc_vs_sequential(setup):
    """The blocked affine AGC on the chip vs the sequential float64 loop."""
    from tpu_sdr.kernels.demod import AGC

    rng = np.random.default_rng(8)
    x = (0.1 + np.abs(rng.standard_normal(1024))).astype(np.float32)
    agc = AGC(mu=5e-3, ref=1.0)
    y, _ = agc.process_real(x, agc.initial_state())
    g = np.empty(x.size + 1)
    g[0] = 1.0
    for i in range(x.size):
        g[i + 1] = g[i] * (1 - 5e-3 * x[i]) + 5e-3
    rel = np.abs(np.asarray(y, np.float64) - g[:-1] * x).max()
    assert rel < 1e-4


def test_compiled_fm_pallas_kernel(setup):
    """The fused Mosaic FM kernel on the chip vs the float64 NumPy oracle
    (sequential discriminator + de-emphasis), plus compiled chunked-vs-
    oneshot consistency of the kernel itself.

    The pallas-vs-XLA-forward equivalence is pinned on CPU (interpret
    parity, ~5e-9, tests/test_pallas_kernel.py); the on-chip question is
    whether MOSAIC compilation preserves the kernel's numerics, which the
    f64 oracle answers without paying the XLA forward's relay compile
    (measured: _fm_forward's remote compile hung >570 s in a degraded
    window while the Mosaic kernel compiled in 0.9 s). prev state is
    (1, 0) so the first sample avoids the signed-zero atan2(+-0, -0)
    corner, which np.angle(0j)=0 defines differently than IEEE."""
    import jax.numpy as jnp

    from tpu_sdr.kernels.pallas.affine_scan import fm_demod_pallas

    rng = np.random.default_rng(11)
    c, t = 4, 2 * 64 * 128
    re_np = rng.standard_normal((c, t)).astype(np.float32)
    im_np = rng.standard_normal((c, t)).astype(np.float32)
    fs, dev, pole = 2e5, 75e3, 0.9997
    z = re_np.astype(np.float64) + 1j * im_np.astype(np.float64)
    z1 = np.concatenate([np.ones((c, 1), complex), z[:, :-1]], axis=1)
    disc = np.angle(z * np.conj(z1)) * fs / (2 * np.pi) / dev
    ref = np.empty_like(disc)
    acc = np.zeros(c)
    for n in range(t):
        acc = pole * acc + (1 - pole) * disc[:, n]
        ref[:, n] = acc

    re = jnp.asarray(re_np)
    im = jnp.asarray(im_np)
    pr = jnp.ones((c, 1), jnp.float32)
    pi0 = jnp.zeros((c, 1), jnp.float32)
    y0 = jnp.zeros((c,), jnp.float32)
    kw = dict(fs=fs, dev=dev, pole=pole)
    a_pal, r1, i1, f1 = fm_demod_pallas(re, im, pr, pi0, y0, **kw)
    rel = np.abs(np.asarray(a_pal) - ref).max()
    assert rel < 1e-5, f"pallas on chip vs f64 oracle: {rel}"  # CPU: 8.1e-7
    assert np.abs(np.asarray(f1) - ref[:, -1]).max() < 1e-5
    # carried-state chunking at tile width (same grid per chunk)
    h = t // 2
    c1, r2, i2, f2 = fm_demod_pallas(re[:, :h], im[:, :h], pr, pi0, y0, **kw)
    c2, *_ = fm_demod_pallas(re[:, h:], im[:, h:], r2, i2, f2, **kw)
    got = np.concatenate([np.asarray(c1), np.asarray(c2)], axis=1)
    assert np.abs(got - np.asarray(a_pal)).max() < 1e-6


def test_compiled_fastfir_vs_lfilter(setup):
    """The overlap-save FastFIR compiled on the chip vs the scipy
    lfilter float64 oracle, plus compiled chunked-vs-oneshot bitwise
    invariance (locks the frame gather + DFT multiply ordering)."""
    import scipy.signal as sps

    from tpu_sdr.kernels.fastconv import FastFIR

    h = sps.firwin(257, 0.23)
    f = FastFIR(h, nfft=1024, block=512)
    rng = np.random.default_rng(12)
    x = rng.standard_normal((2, 4 * 512)).astype(np.float32)
    one, _ = f.process(x, f.initial_state((2,)))
    got = np.asarray(one, np.float64)
    ref = sps.lfilter(h, 1.0, x.astype(np.float64))
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() / scale < 5e-6
    st = f.initial_state((2,))
    parts = []
    for i in range(4):
        o, st = f.process(x[..., i * 512 : (i + 1) * 512], st)
        parts.append(np.asarray(o))
    np.testing.assert_array_equal(np.concatenate(parts, -1), np.asarray(one))


def test_compiled_burst_modem_loopback(setup):
    """QPSK burst demod compiled on the chip: impaired loopback must
    recover the exact bits (locks conv/timing/scan-tracker numerics)."""
    from tpu_sdr.kernels.digital import BurstModem, bit_error_rate

    rng = np.random.default_rng(13)
    mod = BurstModem("qpsk", sps=8)
    bits = rng.integers(2, size=512).astype(np.uint8)
    re, im = mod.modulate(bits, pad_syms=mod.max_lag_syms + mod.span)
    z = (re + 1j * im) * np.exp(
        2j * np.pi * 2e-5 * np.arange(re.size) + 0.9j)
    z = np.concatenate([np.zeros(19), z])
    z += 0.01 * (rng.standard_normal(z.size)
                 + 1j * rng.standard_normal(z.size))
    out = mod.demodulate(z.real.astype(np.float32),
                         z.imag.astype(np.float32), 512)
    assert bit_error_rate(bits, out["bits"]) == 0.0
    assert int(out["frame_lag"]) == 2


def test_compiled_stereo_decoder(setup):
    """FM stereo decoder compiled on the chip: L/R separation holds and
    chunked == one-shot stays bitwise (round-4 VERDICT item 5 — the newer
    kernel families get real-Mosaic coverage, not just interpret mode)."""
    from tpu_sdr.kernels.stereo import StereoDecoder, make_mpx

    fs = 200e3
    n = 1 << 16
    t = np.arange(n) / fs
    left = 0.8 * np.sin(2 * np.pi * 1000 * t)
    right = 0.8 * np.sin(2 * np.pi * 2500 * t)
    m = make_mpx(left, right, fs).astype(np.float32)
    dec = StereoDecoder(fs)
    out, st = dec.process(m, dec.initial_state())
    l, r = np.asarray(out, np.float64)

    def tone_pow(x, f):
        h = len(x) // 2
        win = np.hanning(h)
        k = int(round(f * h / fs))
        spec = np.abs(np.fft.rfft(x[h:] * win)) ** 2
        return np.max(spec[k - 2 : k + 3])

    sep_l = 10 * np.log10(tone_pow(l, 1000) / tone_pow(l, 2500))
    sep_r = 10 * np.log10(tone_pow(r, 2500) / tone_pow(r, 1000))
    assert sep_l > 40 and sep_r > 40, (sep_l, sep_r)
    # chunked == one-shot, bitwise, on the chip
    dec2 = StereoDecoder(fs)
    st2 = dec2.initial_state()
    parts = []
    for chunk in np.split(m, 4):
        o, st2 = dec2.process(chunk, st2)
        parts.append(np.asarray(o))
    assert np.array_equal(np.concatenate(parts, axis=-1), np.asarray(out))


def test_compiled_rds_loopback(setup):
    """RDS encoder -> MPX -> compiled decoder on the chip: PI/PS/RadioText
    recovered through the real Mosaic/XLA-TPU lowering."""
    from tpu_sdr.kernels.rds import RDSDecoder, RDSEncoder, make_mpx_rds

    fs = 200e3
    enc = RDSEncoder(pi=0xC0DE, pty=4, ps="TPU SDR ", radiotext="TPU RADIOTEXT 42")
    n_groups = 48
    t_needed = RDSDecoder(fs).min_samples(n_groups)
    t = np.arange(t_needed) / fs
    left = 0.5 * np.sin(2 * np.pi * 1000 * t)
    m = make_mpx_rds(left, left, fs, enc, n_groups=n_groups).astype(np.float32)
    res = RDSDecoder(fs).decode(m)
    assert res.pi == 0xC0DE
    assert res.ps_name == "TPU SDR "
    assert "TPU RADIOTEXT 42" in res.radiotext
    assert res.block_error_rate < 0.1


def test_compiled_fec_viterbi(setup):
    """Convolutional encode + Viterbi decode (hard and punctured) run the
    whole trellis scan on the chip; clean-channel roundtrip must be exact."""
    from tpu_sdr.kernels.fec import ConvCode

    rng = np.random.default_rng(0xFEC)
    bits = rng.integers(2, size=200).astype(np.uint8)
    for punct in (None, "3/4"):
        code = ConvCode(7, (0o133, 0o171), puncture=punct)
        coded = code.encode(bits)
        out = code.decode_hard(coded, 200)
        np.testing.assert_array_equal(out, bits, err_msg=f"puncture={punct}")


def test_compiled_latency_pipeline(setup):
    """LatencyPipeline (the intra-FFT TP engine) on the real chip: a
    1-device mesh, bypass + filtered frames against the throughput engine
    at the exact tier."""
    import scipy.signal as sps

    from tpu_sdr.core.config import FilterMode, PipelineConfig
    from tpu_sdr.runtime import SpectrumPipeline
    from tpu_sdr.shard.latency import LatencyPipeline

    cfg = PipelineConfig(channels=1, dtype="f32max")
    lat, thr = LatencyPipeline(cfg), SpectrumPipeline(cfg)
    sos = sps.ellip(12, 0.5, 70, 0.3, output="sos")
    lat.upload_sos(sos)
    thr.upload_sos(sos)
    rng = np.random.default_rng(41)
    x = rng.standard_normal(2 * 16384).astype(np.float32)
    z = lat.initial_state()
    mags = []
    for k in range(2):
        mag, z = lat.process_frame(
            x[k * 16384 : (k + 1) * 16384], z, FilterMode.CUSTOM
        )
        mags.append(np.asarray(mag))
    out, _ = thr.process(x, thr.initial_state(), FilterMode.CUSTOM)
    ref = np.asarray(out["magnitude"])[0]
    got = np.stack(mags)
    rel = np.abs(got - ref).max() / ref.max()
    assert rel < 1e-4, f"latency vs throughput on chip: {rel}"


def test_compiled_bf16_io_rounding_contract(setup):
    """bf16_io mode on the chip: bf16-stored magnitudes equal the plain
    bf16 tier's f32 magnitudes rounded once, and the y->bf16 transfer is
    bitwise-free (DEFAULT MXU rounds inputs to bf16 in hardware)."""
    import jax.numpy as jnp
    import scipy.signal as sps

    from tpu_sdr.core.config import FilterMode, PipelineConfig
    from tpu_sdr.runtime import SpectrumPipeline

    rng = np.random.default_rng(11)
    x = rng.standard_normal((2, 2 * 16384)).astype(np.float32)
    sos = sps.butter(12, 0.25, output="sos")
    p_ref = SpectrumPipeline(PipelineConfig(channels=2, dtype="bf16"))
    p_io = SpectrumPipeline(
        PipelineConfig(channels=2, dtype="bf16", bf16_io=True)
    )
    p_ref.upload_sos(sos)
    p_io.upload_sos(sos)
    o_ref, _ = p_ref.process(x, p_ref.initial_state(), FilterMode.CUSTOM)
    o_io, _ = p_io.process(x, p_io.initial_state(), FilterMode.CUSTOM)
    assert o_io["magnitude"].dtype == jnp.bfloat16
    ref_rounded = np.asarray(
        jnp.asarray(o_ref["magnitude"]).astype(jnp.bfloat16)
    )
    np.testing.assert_array_equal(np.asarray(o_io["magnitude"]), ref_rounded)
