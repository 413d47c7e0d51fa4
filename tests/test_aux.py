"""UART transport, waterfall, roofline, distributed helpers, sources."""

import numpy as np
import pytest

from tpu_sdr.transport.uart_stream import UartDeframer, UartFramer
from tpu_sdr.transport.framing import FRAME_SIZE_BYTES, spectrum_to_frame_bytes
from tpu_sdr.runtime.waterfall import Waterfall, decimate_db
from tpu_sdr.runtime.source import FileSource, SyntheticSource
from tpu_sdr.bench.roofline import pipeline_cost, roofline_report
from tpu_sdr.shard.distributed import scaling_efficiency
from tpu_sdr.core.config import PipelineConfig


def _frame(seed=0):
    rng = np.random.default_rng(seed)
    re = (rng.standard_normal(16384) * 500).astype(np.float32)
    im = (rng.standard_normal(16384) * 500).astype(np.float32)
    return spectrum_to_frame_bytes(re, im)


class TestUart:
    def test_roundtrip_chunked(self):
        sink = bytearray()
        tx = UartFramer(sink.extend)
        frame = _frame()
        tx.send_frame_bytes(frame)
        rx = UartDeframer()
        frames = []
        # feed in odd-sized chunks like a serial read loop would
        data = bytes(sink)
        for off in range(0, len(data), 1237):
            frames += rx.push(data[off : off + 1237])
        assert frames == [frame]
        assert rx.frames_received == 1

    def test_stall_resync(self):
        t = [0.0]
        rx = UartDeframer(stall_after=1.0, clock=lambda: t[0])
        f1, f2 = _frame(1), _frame(2)
        rx.push(f1[:10_000])  # partial, then the stream stalls
        t[0] = 5.0
        frames = rx.push(f2[:40_000])
        frames += rx.push(f2[40_000:])
        assert frames == [f2]
        assert rx.stalls_detected == 1
        assert rx.bytes_dropped == 10_000

    def test_overflow_extracts_before_trim(self):
        # complete frames are DELIVERED, never trimmed: a push larger than
        # max_buffer returns every whole frame and keeps the sub-frame
        # remainder (the overflow trim only ever applies to genuine excess,
        # which extraction makes impossible)
        rx = UartDeframer(max_buffer=2 * FRAME_SIZE_BYTES)
        junk = bytes(3 * FRAME_SIZE_BYTES + 17)
        frames = rx.push(junk)
        assert len(frames) == 3
        assert rx.bytes_dropped == 0
        assert rx.frames_received == 3

    def test_baud_pacing_rate(self):
        import time

        sink = bytearray()
        tx = UartFramer(sink.extend, baud=230400 * 400, chunk=65536)
        t0 = time.monotonic()
        tx.send_frame_bytes(_frame())
        dt = time.monotonic() - t0
        expected = FRAME_SIZE_BYTES / (230400 * 400 / 10)
        assert dt >= expected * 0.5


class TestWaterfall:
    def test_decimate_db_preserves_peaks(self):
        mag = np.ones(16384, np.float32)
        mag[5000] = 1000.0
        dec = np.array(decimate_db(mag, points=1024))
        assert dec.max() == pytest.approx(60.0, abs=0.1)  # 20log10(1000)
        assert dec.shape == (1024,)

    def test_decimate_db_detectors(self):
        from tpu_sdr.runtime.waterfall import detect_bucketed

        mag = np.ones(1024, np.float32)
        mag[100] = 10.0
        mag[101] = 0.1
        buckets = mag.reshape(256, 4)
        for det, ref in (
            ("peak", buckets.max(-1)),
            ("minpeak", buckets.min(-1)),
            ("avg", buckets.mean(-1)),
            ("rms", np.sqrt((buckets**2).mean(-1))),
            ("sample", buckets[:, 0]),
        ):
            dec = np.asarray(decimate_db(mag, points=256, db=False, detector=det))
            np.testing.assert_allclose(dec, ref, rtol=1e-6)
            # Host path (uneven-capable) agrees on even buckets.
            host = detect_bucketed(mag, np.arange(0, 1025, 4), det)
            np.testing.assert_allclose(host, ref, rtol=1e-6)
        with pytest.raises(ValueError, match="detector"):
            decimate_db(mag, points=256, detector="bogus")
        with pytest.raises(ValueError, match="edges"):
            detect_bucketed(mag, np.array([0, 5, 4]), "peak")  # decreasing
        with pytest.raises(ValueError, match="out of range"):
            detect_bucketed(mag, np.array([0, 2000]), "peak")

    def test_detect_bucketed_duplicate_edges(self):
        """More display points than bins (small-FFT configs): duplicate
        edges follow reduceat semantics — empty bucket = start bin —
        for EVERY detector (the GUI waterfall must not raise)."""
        from tpu_sdr.runtime.waterfall import detect_bucketed

        x = np.arange(8, dtype=np.float64)
        edges = np.linspace(0, 8, 17).astype(int)  # 16 buckets over 8 bins
        for det in ("peak", "minpeak", "avg", "rms", "sample"):
            out = detect_bucketed(x, edges, det)
            assert out.shape == (16,)
            assert np.isfinite(out).all()
        np.testing.assert_array_equal(
            detect_bucketed(x, edges, "peak"), np.repeat(x, 2))

    def test_waterfall_ring_and_traces(self):
        wf = Waterfall(points=64, depth=4)
        for i in range(6):
            row = np.full(64, float(i))
            wf.push(row)
        img = wf.image()
        assert img.shape == (4, 64)
        assert img[-1][0] == 5.0 and img[0][0] == 2.0  # newest last
        assert wf.peak_hold[0] == 5.0
        wf.reset_peak()
        assert wf.peak_hold[0] == -200.0


class TestRoofline:
    def test_cost_model_sane(self):
        rep = roofline_report(PipelineConfig())
        # the four-step design trades FLOPs for MXU residency: ~1.6 kFLOP
        # per sample (vs ~100 for a radix-2 FFT + 30 MACs of IIR)
        per_sample = rep["flops_per_frame"] / 16384
        assert 500 < per_sample < 4000
        assert rep["bound"] in ("compute", "memory")
        assert rep["ceiling_samples_per_sec"] > 1e9  # the 1 GSPS target fits
        names = set(rep["stages"])
        assert {"fft_4step", "iir_toeplitz", "magnitude"} <= names

    def test_measured_fraction(self):
        rep = roofline_report(
            PipelineConfig(), measured_samples_per_sec=5.2e9
        )
        assert 0 < rep["fraction_of_ceiling"] <= 1.5


class TestDistributedHelpers:
    def test_scaling_efficiency(self):
        eff = scaling_efficiency({1: 5e9, 4: 18e9, 8: 32e9})
        assert eff[1] == 1.0
        assert eff[4] == pytest.approx(0.9)
        assert eff[8] == pytest.approx(0.8)
        with pytest.raises(ValueError):
            scaling_efficiency({4: 1.0})


class TestSources:
    def test_synthetic_phase_continuity(self):
        src = SyntheticSource(tones_hz=((100e3, 0.5),), adc_bits=None)
        a = src.read(10000)[0]
        b = src.read(10000)[0]
        whole = SyntheticSource(tones_hz=((100e3, 0.5),), adc_bits=None).read(20000)[0]
        assert np.allclose(np.concatenate([a, b]), whole, atol=1e-6)

    def test_synthetic_adc_quantization(self):
        src = SyntheticSource(tones_hz=((100e3, 0.5),), adc_bits=12)
        x = src.read(4096)[0]
        # values on the 12-bit grid
        assert np.allclose(x * 2048, np.round(x * 2048), atol=1e-4)

    def test_file_source_loop(self, tmp_path):
        data = np.arange(100, dtype=np.float32)
        p = tmp_path / "cap.npy"
        np.save(p, data)
        src = FileSource(str(p))
        out = src.read(250)[0]
        assert np.array_equal(out[:100], data)
        assert np.array_equal(out[100:200], data)


class TestFeeder:
    def test_double_buffered_staging(self):
        from tpu_sdr.runtime.feeder import StreamFeeder

        src = SyntheticSource(tones_hz=((100e3, 0.5),), adc_bits=None)
        ref = SyntheticSource(tones_hz=((100e3, 0.5),), adc_bits=None)
        f = StreamFeeder(src, chunk_samples=4096, depth=2).start()
        chunks = [np.asarray(f.get()) for _ in range(3)]
        f.stop()
        # FIFO order = contiguous stream
        whole = ref.read(3 * 4096)
        got = np.concatenate([c[0] for c in chunks])
        assert np.allclose(got, whole[0], atol=1e-6)
        assert f.chunks_staged >= 3

    def test_feeder_error_surfaces(self):
        from tpu_sdr.runtime.feeder import StreamFeeder
        from tpu_sdr.runtime.source import CallbackSource

        def boom(n):
            raise RuntimeError("source died")

        f = StreamFeeder(CallbackSource(boom), chunk_samples=128).start()
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="source died"):
            f.get(timeout=5.0)
        f.stop()


def test_uart_overflow_trim_preserves_alignment():
    """Overflow trim drops whole frames so later frames stay aligned."""
    rx = UartDeframer(max_buffer=2 * FRAME_SIZE_BYTES)
    f1, f2, f3, f4 = _frame(11), _frame(12), _frame(13), _frame(14)
    # one burst of 3.5 frames: overflow by a non-multiple of the frame size
    burst = f1 + f2 + f3 + f4[: FRAME_SIZE_BYTES // 2]
    frames = rx.push(burst)
    # alignment preserved: everything emitted is one of the real frames
    for fr in frames:
        assert fr in (f1, f2, f3, f4)
    frames += rx.push(f4[FRAME_SIZE_BYTES // 2 :])
    assert frames and frames[-1] == f4


class TestFeederIQ:
    def test_feeder_preserves_iq_planes(self):
        """Regression: the feeder cast complex chunks to float32, silently
        dropping the Q plane. It must stage (2, C, T) float planes that the
        complex pipeline consumes via process_planes."""
        from tpu_sdr.runtime.feeder import StreamFeeder
        from tpu_sdr.runtime.source import SyntheticSource
        from tpu_sdr import PipelineConfig, FilterMode
        from tpu_sdr.runtime import SpectrumPipeline

        n = 16384
        src = SyntheticSource(tones_hz=((-250e3, 0.5),), iq=True, noise=0.0)
        f = StreamFeeder(src, chunk_samples=n, depth=2).start()
        try:
            chunk = f.get()
        finally:
            f.stop() if hasattr(f, "stop") else f._stop.set()
        assert chunk.shape == (2, 1, n) and chunk.dtype == np.float32
        assert float(abs(np.asarray(chunk[1])).max()) > 0.1, "Q plane lost"
        pipe = SpectrumPipeline(PipelineConfig(channels=1))
        out, _ = pipe.process_planes(
            chunk, pipe.initial_state(batch_shape=(2,)), FilterMode.BYPASS
        )
        mag = np.asarray(out["magnitude"])[0, 0]
        k = round(250e3 * n / 1e6)
        assert np.argmax(mag) == n - k  # negative-frequency tone survives


def test_roofline_ceiling_accounts_for_hop():
    from tpu_sdr.bench.roofline import roofline_report
    from tpu_sdr import PipelineConfig

    full = roofline_report(PipelineConfig())
    half = roofline_report(PipelineConfig(hop=8192))
    assert half["ceiling_samples_per_sec"] == pytest.approx(
        full["ceiling_samples_per_sec"] / 2, rel=1e-6
    )


class TestCli:
    """`python -m tpu_sdr` front door (tpu_sdr/__main__.py)."""

    def test_design_prints_wire_bytes(self, capsys):
        from tpu_sdr.__main__ import main

        rc = main(["design", "butterworth", "lowpass", "4", "--cutoff", "100e3"])
        out = capsys.readouterr().out
        assert rc == 0
        assert "wire bytes" in out and "SOS (2 sections)" in out
        # 12 hex bytes on the wire line
        wire = [l for l in out.splitlines() if l.startswith("wire bytes")][0]
        assert len(wire.split(":")[1].split()) == 12

    def test_design_band_requires_hi_edge(self, capsys):
        from tpu_sdr.__main__ import main

        rc = main(["design", "butterworth", "bandpass", "4", "--cutoff", "100e3"])
        assert rc == 2
        assert "--cutoff-hi" in capsys.readouterr().err

    def test_selftest_passes(self, capsys):
        from tpu_sdr.__main__ import main

        assert main(["selftest"]) == 0
        assert "selftest: PASS" in capsys.readouterr().out

    def test_scan_demo_finds_emitters(self, capsys):
        from tpu_sdr.__main__ import main

        assert main(["scan", "--seconds", "0.13"]) == 0
        out = capsys.readouterr().out
        assert "87.5 kHz" in out and "212.5 kHz" in out

    def test_rx_demo_writes_wav(self, tmp_path, capsys):
        import wave

        from tpu_sdr.__main__ import main

        out = str(tmp_path / "a.wav")
        assert main(["rx", "--center", "150e3", "--seconds", "0.3",
                     "--audio-rate", "16e3", "--output", out]) == 0
        with wave.open(out) as w:
            assert w.getframerate() == 16000
            assert w.getnframes() > 1000

    def test_rx_from_capture_roundtrip(self, tmp_path, capsys):
        """SampleRecorder capture -> `tpu-sdr rx --input` -> WAV."""
        import wave

        from tpu_sdr.__main__ import main
        from tpu_sdr.runtime.recorder import SampleRecorder

        fs = 1_000_000.0
        n = np.arange(96_000)
        msg = np.sin(2 * np.pi * 700.0 * n / fs)
        ph = 2 * np.pi * 150e3 * n / fs + 2 * np.pi * 75e3 / fs * np.cumsum(msg)
        x = (0.5 * np.cos(ph)).astype(np.float32)
        cap = str(tmp_path / "cap.npy")
        rec = SampleRecorder(cap, fs=fs)
        rec.append(x[None, :])
        rec.close()
        out = str(tmp_path / "b.wav")
        assert main(["rx", "--input", cap, "--center", "150e3",
                     "--audio-rate", "16e3", "--output", out]) == 0
        with wave.open(out) as w:
            rate = w.getframerate()
            pcm = np.frombuffer(w.readframes(w.getnframes()), "<i2")
        a = pcm.astype(np.float64)[rate // 100:]
        spec = np.abs(np.fft.rfft(a * np.hanning(a.size)))
        f_peak = np.argmax(spec) * rate / a.size
        assert f_peak == pytest.approx(700.0, abs=3 * rate / a.size)

    def test_burst_demo_loopback(self, capsys):
        from tpu_sdr.__main__ import main

        assert main(["burst", "--scheme", "qpsk", "--bits", "256"]) == 0
        out = capsys.readouterr().out
        assert "loopback BER: 0.00e+00" in out
        assert "frame lag 3 syms" in out
        assert "bits (256):" in out

    def test_burst_fsk_demo(self, capsys):
        from tpu_sdr.__main__ import main

        assert main(["burst", "--scheme", "4fsk", "--bits", "128",
                     "--snr", "30"]) == 0
        out = capsys.readouterr().out
        assert "loopback BER: 0.00e+00" in out
        assert "timing offset 11 samples" in out  # onset + sub-symbol

    def test_burst_from_capture(self, tmp_path, capsys):
        """BurstModem TX -> SampleRecorder IQ capture -> `tpu-sdr burst
        --input` with a carrier mix-down recovers the exact bits."""
        from tpu_sdr.__main__ import main
        from tpu_sdr.kernels.digital import BurstModem
        from tpu_sdr.runtime.recorder import SampleRecorder

        rng = np.random.default_rng(3)
        mod = BurstModem("qam16", sps=8)
        bits = rng.integers(2, size=512).astype(np.uint8)
        re, im = mod.modulate(bits, pad_syms=mod.max_lag_syms + mod.span)
        fs = 1e6
        z = (re + 1j * im) * np.exp(
            2j * np.pi * 200e3 / fs * np.arange(re.size))
        cap = str(tmp_path / "burst.npy")
        rec = SampleRecorder(cap, fs=fs)
        rec.append(z.astype(np.complex64)[None, :])
        rec.close()
        assert main(["burst", "--input", cap, "--scheme", "qam16",
                     "--bits", "512", "--center", "200e3"]) == 0
        out = capsys.readouterr().out
        pad = (-512) % 8
        want = np.packbits(
            np.concatenate([bits, np.zeros(pad, np.uint8)])).tobytes().hex()
        assert want in out

    def test_bench_small(self, capsys):
        import json as _json

        from tpu_sdr.__main__ import main

        assert main(["bench", "--channels", "1", "--frames", "2", "--reps", "1"]) == 0
        rec = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rec["value"] > 0 and rec["quality"] == "f32"


def test_uart_deframer_rejects_sub_frame_max_buffer():
    """max_buffer < one frame cannot preserve alignment under overflow
    (review finding: the trim clamped to a non-frame-multiple and broke
    every subsequent frame boundary) — rejected at construction."""
    with pytest.raises(ValueError, match="at least one"):
        UartDeframer(max_buffer=1000)
    # exactly one frame is legal and the trim only ever drops whole frames
    rx = UartDeframer(max_buffer=FRAME_SIZE_BYTES)
    f0 = bytes(range(256)) * (FRAME_SIZE_BYTES // 256)
    f1 = bytes([7]) * FRAME_SIZE_BYTES
    # half of f0, then the rest plus all of f1 (overflow mid-push)
    out = rx.push(f0[: FRAME_SIZE_BYTES // 2])
    out += rx.push(f0[FRAME_SIZE_BYTES // 2 :] + f1)
    assert out == [f0, f1]  # alignment survived; nothing corrupted


def test_uart_deframer_burst_push_delivers_all_frames():
    """A burst push (what SerialTransport.read_frames produces after a
    stall) at the DEFAULT max_buffer must deliver every complete frame:
    the round-2 bug trimmed the buffer before extracting, deleting
    never-delivered frames whenever a push crossed max_buffer."""
    rx = UartDeframer()  # default max_buffer = 4 frames
    frames = [bytes([i]) * FRAME_SIZE_BYTES for i in range(6)]
    out = rx.push(b"".join(frames))  # 6 frames > max_buffer in one push
    assert out == frames
    assert rx.bytes_dropped == 0
    assert rx.frames_received == 6
    # partial remainder after a burst is preserved, not trimmed
    out = rx.push(frames[0] + frames[1][: FRAME_SIZE_BYTES // 2])
    assert out == [frames[0]]
    out = rx.push(frames[1][FRAME_SIZE_BYTES // 2 :])
    assert out == [frames[1]]
    assert rx.bytes_dropped == 0


def test_serial_floor_report_bounds():
    """The serial-phase floor is strictly BELOW the idealized MXU-only
    ceiling (it adds memory time instead of taking the max) and the
    fraction responds to the measured rate."""
    from tpu_sdr.bench.roofline import roofline_report, serial_floor_report

    cfg = PipelineConfig(channels=8)
    rr = roofline_report(cfg)
    sf = serial_floor_report(cfg, measured_samples_per_sec=15e9)
    assert sf["serial_floor_samples_per_sec"] < rr["ceiling_samples_per_sec"]
    assert sf["hybrid_hbm_bytes_per_frame"] == 4 * cfg.fft_size * 4
    assert 0 < sf["fraction_of_serial_floor"] < 1
    # a measured rate above the floor reports > 1 (overlap achieved)
    sf2 = serial_floor_report(
        cfg, measured_samples_per_sec=2 * sf["serial_floor_samples_per_sec"])
    assert sf2["fraction_of_serial_floor"] == pytest.approx(2.0)


def test_file_source_raw_float32_suffix(tmp_path):
    """Review finding: every non-.npy file decoded as int16, so the
    documented raw-float32 path played garbage. Suffix-selected dtypes
    now cover the common SDR raw formats."""
    from tpu_sdr.runtime.source import FileSource

    ref = (np.sin(np.arange(256) * 0.1)).astype(np.float32)
    p32 = tmp_path / "cap.f32"
    ref.tofile(p32)
    src = FileSource(str(p32), fs=1e6)
    got = src.read(256)
    assert np.array_equal(got[0], ref)

    iq = (ref + 1j * ref[::-1]).astype(np.complex64)
    pc = tmp_path / "cap.cf32"
    iq.tofile(pc)
    srcc = FileSource(str(pc), fs=1e6)
    gotc = srcc.read(256)
    assert np.iscomplexobj(gotc) and np.array_equal(gotc[0], iq)


def test_feeder_restart_runs_single_producer():
    """Review finding: stop() nulled the thread after its bounded join
    timed out (producer blocked in a long source.read()), so a restart
    spawned a SECOND producer over the same source, interleaving
    out-of-order chunks. start() now waits the old producer out, and a
    restart clears any stale error."""
    import threading

    from tpu_sdr.runtime.feeder import StreamFeeder

    gate = threading.Event()
    lock = threading.Lock()
    active = {"n": 0, "max": 0, "reads": 0}

    class BlockingSource:
        def read(self, n, pace=False):
            with lock:
                active["n"] += 1
                active["max"] = max(active["max"], active["n"])
                active["reads"] += 1
            try:
                if active["reads"] == 1:
                    assert gate.wait(30)  # first read wedges past the join
                return np.zeros(n, np.float32)
            finally:
                with lock:
                    active["n"] -= 1

    f = StreamFeeder(BlockingSource(), chunk_samples=256)
    f.start()
    import time as _t

    _t.sleep(0.2)  # ensure the producer is inside the wedged read
    f.stop()  # bounded join times out; thread survives, reference kept
    gate.set()  # the wedged read completes in the background
    f.start()  # must wait the old producer out before spawning anew
    got = f.get(timeout=10.0)
    assert got.shape[-1] == 256
    f.stop()
    assert active["max"] == 1, "two producers ran over one source"
    assert f._error is None
