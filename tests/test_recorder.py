"""SampleRecorder capture -> FileSource playback roundtrips."""

import json
import time

import numpy as np
import pytest

from tpu_sdr.runtime.recorder import RecordingSource, SampleRecorder
from tpu_sdr.runtime.source import FileSource, SyntheticSource


@pytest.fixture
def rng():
    return np.random.default_rng(5)


def test_real_roundtrip(tmp_path, rng):
    path = str(tmp_path / "cap.npy")
    rec = SampleRecorder(path, fs=2e6)
    chunks = [rng.standard_normal((2, n)).astype(np.float32) for n in (100, 37, 63)]
    for c in chunks:
        rec.append(c)
    meta = rec.close()
    assert meta == {
        "fs": 2e6, "channels": 2, "complex": False,
        "samples": 200, "samples_seen": 200,
    }
    src = FileSource(path)
    assert src.fs == 2e6  # sidecar overrides the default
    got = src.read(200)
    np.testing.assert_array_equal(got, np.concatenate(chunks, axis=-1))
    # looped playback wraps
    np.testing.assert_array_equal(src.read(200), got)


def test_complex_iq_roundtrip(tmp_path, rng):
    path = str(tmp_path / "iq.npy")
    rec = SampleRecorder(path, fs=1e6)
    z = (rng.standard_normal(256) + 1j * rng.standard_normal(256)).astype(
        np.complex64
    )
    rec.append(z)  # 1-D chunk is promoted to (1, n)
    meta = rec.close()
    assert meta["complex"] and meta["channels"] == 1
    src = FileSource(path)
    got = src.read(256)
    assert np.iscomplexobj(got)
    np.testing.assert_array_equal(got[0], z)


def test_ring_keeps_last_n(tmp_path, rng):
    path = str(tmp_path / "ring.npy")
    rec = SampleRecorder(path, fs=1e6, max_samples=150)
    full = rng.standard_normal((1, 400)).astype(np.float32)
    for i in range(0, 400, 80):
        rec.append(full[:, i : i + 80])
    meta = rec.close()
    assert meta["samples"] == 150 and meta["samples_seen"] == 400
    got = np.load(path)
    np.testing.assert_array_equal(got, full[:, -150:])


def test_recording_source_tees_displayed_samples(tmp_path):
    path = str(tmp_path / "tee.npy")
    inner = SyntheticSource(tones_hz=((50e3, 0.5),), noise=0.0)
    rec = SampleRecorder(path, fs=inner.fs)
    src = RecordingSource(inner, rec)
    a = src.read(128)
    b = src.read(64)
    rec.close()
    got = np.load(path)
    np.testing.assert_array_equal(
        got, np.concatenate([np.atleast_2d(a), np.atleast_2d(b)], axis=-1)
    )
    # sidecar exists with the source's rate
    assert json.load(open(str(tmp_path / "tee.json")))["fs"] == inner.fs


def test_validation(tmp_path, rng):
    rec = SampleRecorder(str(tmp_path / "v.npy"))
    with pytest.raises(ValueError):
        rec.append(np.zeros((2, 2, 2), np.float32))
    rec.append(np.zeros((2, 8), np.float32))
    with pytest.raises(ValueError, match="signature"):
        rec.append(np.zeros((3, 8), np.float32))
    with pytest.raises(ValueError, match="signature"):
        rec.append(np.zeros((2, 8), np.complex64))
    rec.close()
    with pytest.raises(ValueError):
        rec.append(np.zeros((2, 8), np.float32))
    with pytest.raises(ValueError):
        rec.close()
    with pytest.raises(ValueError):
        SampleRecorder(str(tmp_path / "x.npy"), max_samples=0)
    empty = SampleRecorder(str(tmp_path / "e.npy"))
    with pytest.raises(ValueError, match="nothing recorded"):
        empty.close()
    # an empty close must NOT brick the recorder: append-then-close works
    empty.append(np.ones((1, 4), np.float32))
    assert empty.close()["samples"] == 4


def test_ring_trim_releases_big_chunk(tmp_path, rng):
    """Regression: the ring trim must COPY, not keep a view whose .base
    is the whole original chunk."""
    rec = SampleRecorder(str(tmp_path / "r.npy"), max_samples=100)
    rec.append(rng.standard_normal((1, 10_000)).astype(np.float32))
    head = rec._chunks[0]
    assert head.shape[-1] == 100
    assert head.base is None or head.base.shape[-1] <= 100


def test_file_source_channel_semantics(tmp_path, rng):
    """channels=1 (default) plays a file's NATIVE channel count; a mono
    file fans out to any requested C; any other mismatch raises instead of
    silently replacing recorded channels with channel 0 (review finding)."""
    two = str(tmp_path / "two.npy")
    np.save(two, rng.standard_normal((2, 64)).astype(np.float32))
    assert FileSource(two).read(10).shape == (2, 10)  # native
    assert FileSource(two, channels=2).read(10).shape == (2, 10)
    with pytest.raises(ValueError, match="2 channels"):
        FileSource(two, channels=3)
    mono = str(tmp_path / "mono.npy")
    np.save(mono, rng.standard_normal(64).astype(np.float32))
    out = FileSource(mono, channels=4).read(10)
    assert out.shape == (4, 10)
    np.testing.assert_array_equal(out[0], out[3])


def test_recorder_append_close_race_is_clean(tmp_path, rng):
    """append/close serialize on the recorder's lock: a chunk either lands
    in the saved capture or raises 'recorder is closed' — hammer the pair
    from two threads and assert the saved file is a clean prefix-chain of
    whole chunks (no torn/partial chunk)."""
    import threading

    path = str(tmp_path / "race.npy")
    rec = SampleRecorder(path, fs=1e6)
    stop = threading.Event()
    appended = []

    def writer():
        i = 0
        while not stop.is_set():
            c = np.full((1, 17), float(i), np.float32)
            try:
                rec.append(c)
                appended.append(i)
            except ValueError as e:
                assert "closed" in str(e)
                return
            i += 1

    t = threading.Thread(target=writer)
    t.start()
    # deadline the wait: a writer-thread death (any exception other than
    # the expected ValueError) must surface as a test failure, not a hang
    deadline = time.monotonic() + 10.0
    while len(appended) < 50:
        if not t.is_alive() or time.monotonic() > deadline:
            break
    meta = rec.close()
    stop.set()
    t.join(timeout=10.0)
    assert not t.is_alive(), "writer thread failed to exit"
    assert len(appended) >= 50, "writer made no progress before the deadline"
    data = np.load(path)
    # every 17-sample chunk is whole and consecutive from 0
    assert meta["samples"] % 17 == 0
    k = meta["samples"] // 17
    expect = np.repeat(np.arange(k, dtype=np.float32), 17)[None, :]
    np.testing.assert_array_equal(data, expect)


def test_recorder_copies_reused_buffer(tmp_path):
    """Review finding: append() stored an already-contiguous float32
    chunk by REFERENCE (ascontiguousarray is a no-copy pass-through), so
    a source refilling one preallocated buffer made the capture replay
    its last chunk."""
    from tpu_sdr.runtime.recorder import SampleRecorder

    path = str(tmp_path / "cap.npy")
    rec = SampleRecorder(path, fs=1e6)
    buf = np.zeros((1, 64), np.float32)  # one reused read buffer
    for k in range(3):
        buf[:] = float(k + 1)
        rec.append(buf)
    info = rec.close()
    data = np.load(path)
    assert data.shape[-1] == 192
    assert np.array_equal(
        data[0, ::64], np.array([1.0, 2.0, 3.0], np.float32)
    ), "capture aliased the reused buffer"
    assert info["samples"] == 192
