"""Serial edge adapter: pty loopback of the reference UART host path.

The reference drives real hardware over a COM port
(``fft_analyzer_gui.py:464-553``); here the same framing flows through an
actual ``/dev/pts`` device pair — one side plays the FPGA (0xA5-triggered
frame drain, ``sequ2.vhd`` U_IDLE2->U_READ), the other the GUI host.
"""

import os
import threading
import time

import numpy as np
import pytest

from tpu_sdr.transport.framing import (
    FRAME_SIZE_BYTES,
    decode_frame,
    spectrum_to_frame_bytes,
)
from tpu_sdr.transport.serial_port import FdSerial, SerialTransport, make_raw_pty


def _frame(seed=0):
    rng = np.random.default_rng(seed)
    re = (rng.standard_normal(16384) * 800).astype(np.float32)
    im = (rng.standard_normal(16384) * 800).astype(np.float32)
    return spectrum_to_frame_bytes(re, im, scale=1.0)


@pytest.fixture()
def pty_pair():
    m, s = make_raw_pty()
    fpga = SerialTransport(FdSerial(m, timeout=0.05))
    host = SerialTransport(FdSerial(s, timeout=0.05))
    yield fpga, host
    fpga.close()
    host.close()


def test_pty_full_frame_end_to_end(pty_pair):
    """One 65,536-byte frame streams through a real pty device pair."""
    fpga, host = pty_pair
    frame = _frame(1)
    tx = threading.Thread(target=fpga.send_frame_bytes, args=(frame,))
    tx.start()
    got = host.read_frames(1, timeout=10.0)
    tx.join()
    assert got == [frame]
    re, im, mag = decode_frame(got[0])
    assert np.isfinite(mag).all()


def test_pty_request_frame_transaction(pty_pair):
    """The reference's 0xA5 transaction: command out, one frame back."""
    fpga, host = pty_pair
    frame = _frame(2)
    stop = threading.Event()
    sim = threading.Thread(
        target=fpga.serve_frames, args=(lambda: frame, stop), daemon=True
    )
    sim.start()
    try:
        got = host.request_frame(timeout=10.0)
        assert got == frame
        got2 = host.request_frame(timeout=10.0)
        assert got2 == frame
        assert host.deframer.frames_received == 2
    finally:
        stop.set()
        sim.join(timeout=5.0)


def test_pty_baud_pacing_230400_equivalent(pty_pair):
    """Baud pacing throttles the byte stream: at 230,400-equivalent x100
    (22.9 kB per 0.01 s-equivalent), a 64 KiB frame takes >= 80% of the
    nominal 10*bytes/baud wire time. (The real 230,400 rate => 2.84 s/frame,
    too slow for a unit test; the pacing code path is rate-independent.)"""
    fpga, host = pty_pair
    baud = 230_400 * 100
    fpga.framer.baud = baud
    frame = _frame(3)
    t0 = time.monotonic()
    tx = threading.Thread(target=fpga.send_frame_bytes, args=(frame,))
    tx.start()
    got = host.read_frames(1, timeout=10.0)
    tx.join()
    elapsed = time.monotonic() - t0
    assert got == [frame]
    nominal = FRAME_SIZE_BYTES * 10.0 / baud  # 8N1: 10 wire bits per byte
    assert elapsed >= 0.8 * nominal, (elapsed, nominal)


def test_open_serial_falls_back_to_fd(tmp_path):
    """open_serial works without pyserial on any rw device-ish path (here a
    pty slave by name, the literal /dev/pts mapping)."""
    import tty

    m, s = os.openpty()
    for fd in (m, s):
        tty.setraw(fd)
    name = os.ttyname(s)
    from tpu_sdr.transport.serial_port import open_serial

    port = open_serial(name, timeout=0.05)
    try:
        os.write(m, b"\x55\xa5")
        time.sleep(0.05)
        assert port.read(2) == b"\x55\xa5"
        port.write(b"\xff")
        os.set_blocking(m, False)
        time.sleep(0.05)
        assert os.read(m, 1) == b"\xff"
    finally:
        port.close()
        for fd in (m, s):
            try:
                os.close(fd)
            except OSError:
                pass


def test_peer_close_fails_fast_not_busy_spin():
    """A closed pty peer must end read_frames immediately (EOF detection),
    not busy-spin at 100% CPU until the timeout deadline."""
    m, s = make_raw_pty()
    host = SerialTransport(FdSerial(s, timeout=0.05))
    try:
        os.write(m, b"\xa5" * 4)  # some junk, then hangup
        os.close(m)
        t0 = time.monotonic()
        frames = host.read_frames(1, timeout=10.0)
        elapsed = time.monotonic() - t0
        assert frames == []
        assert host.ser.eof
        assert elapsed < 2.0, f"busy-spun for {elapsed:.1f}s after peer close"
    finally:
        host.close()


def test_read_frames_stale_backlog_trim():
    """A consumer stall leaves a frame backlog in the wire buffer; on
    resume read_frames keeps only the NEWEST max(n, max_stale) frames
    (the reference GUI's trim policy, fft_analyzer_gui.py:687-689) while
    the deframer itself delivered everything (no mid-stream loss)."""

    class ReplaySerial:
        """Feeds a prepared backlog in read_chunk pieces."""

        def __init__(self, data):
            self.data = data
            self.off = 0
            self.eof = False

        def read(self, n):
            piece = self.data[self.off:self.off + n]
            self.off += len(piece)
            if not piece:
                self.eof = True
            return piece

        def write(self, data):
            return len(data)

        def close(self):
            pass

    frames = [bytes([i]) * FRAME_SIZE_BYTES for i in range(9)]
    tr = SerialTransport(ReplaySerial(b"".join(frames)))
    got = tr.read_frames(n=1)  # default max_stale=4 -> newest 4
    assert got == frames[-4:]
    assert tr.frames_stale_dropped == 5
    # n > max_stale: the request size wins
    tr2 = SerialTransport(ReplaySerial(b"".join(frames)))
    got2 = tr2.read_frames(n=6)
    assert got2 == frames[-6:]
    assert tr2.frames_stale_dropped == 3
    # opt-out returns everything
    tr3 = SerialTransport(ReplaySerial(b"".join(frames)))
    assert tr3.read_frames(n=1, max_stale=None) == frames
    assert tr3.frames_stale_dropped == 0


def test_read_frames_live_stream_returns_at_n():
    """Review finding: against a CONTINUOUS live streamer (reads never
    empty, but short — below read_chunk), read_frames(n=1) must return as
    soon as one frame completes plus one frameless poll, not spin until
    max_stale frames arrive or the timeout expires."""

    class LiveSerial:
        """Endless wire at 'live rate': every read yields a small piece."""

        def __init__(self, piece=1024):
            self.frame = bytes(range(256)) * (FRAME_SIZE_BYTES // 256)
            self.off = 0
            self.piece = piece
            self.reads = 0

        def read(self, nbytes):
            self.reads += 1
            start = self.off % len(self.frame)
            out = (self.frame * 2)[start : start + self.piece]
            self.off += self.piece
            return out

        def write(self, data):
            return len(data)

        def close(self):
            pass

    tr = SerialTransport(LiveSerial(), read_chunk=4096)
    got = tr.read_frames(n=1, timeout=5.0)
    assert len(got) == 1
    # one read per piece to finish the frame, plus at most a couple of
    # frameless polls — NOT thousands of reads spinning to the deadline
    assert tr.ser.reads <= FRAME_SIZE_BYTES // 1024 + 3


def test_read_frames_isolated_short_read_is_not_live_rate():
    """Advisor r4: pyserial-style ports return only ``in_waiting`` bytes,
    so an OS-buffered backlog can arrive in sub-chunk pieces. ONE short
    frameless read mid-backlog must not be mistaken for the wire's live
    rate — the drain only ends on TWO consecutive short frameless polls
    (or an empty read), so the max_stale trim still sees the whole
    backlog. Fully scripted port: deterministic, no pty timing."""

    class ScriptedPort:
        """read(n) serves the next scripted piece (each <= n by design)."""

        def __init__(self, pieces):
            self.pieces = list(pieces)

        def read(self, n=1):
            if not self.pieces:
                return b""  # drained: triggers the empty-read break
            piece = self.pieces.pop(0)
            assert len(piece) <= n
            return piece

        def write(self, data):
            return len(data)

        def close(self):
            pass

    F = FRAME_SIZE_BYTES
    frames = [bytes([40 + i]) * F for i in range(4)]
    stream = b"".join(frames)
    chunk = 16384
    # frame 0 in four full-chunk reads; then ONE isolated 8 KB short piece
    # (completes no frame — the advisor's misclassification trigger); then
    # the rest of the backlog in full chunks again
    cut = 4 * chunk + 8192
    pieces = [stream[i : i + chunk] for i in range(0, 4 * chunk, chunk)]
    pieces.append(stream[4 * chunk : cut])
    pieces += [stream[i : i + chunk] for i in range(cut, len(stream), chunk)]

    tr = SerialTransport(ScriptedPort(pieces), read_chunk=chunk)
    got = tr.read_frames(n=1, timeout=5.0, max_stale=4)
    # pre-fix behavior: the short read broke the drain after frame 0 and
    # returned [frames[0]] with the backlog unseen
    assert got == frames
    assert tr.frames_stale_dropped == 0

    # the same backlog with n=1, max_stale=2 must be fully drained AND
    # trimmed to the newest 2, with the dropped ones counted
    tr2 = SerialTransport(
        ScriptedPort(
            [stream[i : i + chunk] for i in range(0, 4 * chunk, chunk)]
            + [stream[4 * chunk : cut]]
            + [stream[i : i + chunk] for i in range(cut, len(stream), chunk)]
        ),
        read_chunk=chunk,
    )
    got2 = tr2.read_frames(n=1, timeout=5.0, max_stale=2)
    assert got2 == frames[-2:]
    assert tr2.frames_stale_dropped == 2

    # two consecutive short frameless reads DO end the drain (live trickle)
    tr3 = SerialTransport(
        ScriptedPort(
            [stream[i : i + chunk] for i in range(0, 4 * chunk, chunk)]
            + [b"\x01" * 100, b"\x02" * 100, stream[4 * chunk :]]
        ),
        read_chunk=chunk,
    )
    got3 = tr3.read_frames(n=1, timeout=5.0, max_stale=4)
    assert got3 == frames[:1]  # broke at the live-rate boundary
