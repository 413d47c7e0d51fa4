"""Double-buffered host->device sample staging — the async-FIFO analog.

The reference decouples its 1 MSPS producer from the burst consumer with a
dual-clock FIFO (``imp/fifo.vhd``, SURVEY.md §2.7). Here the producer is a
host sample source and the consumer is the device pipeline; the decoupling
is a background thread that reads the source and stages chunks on device
(``jax.device_put``) ahead of consumption, so acquisition, H2D transfer and
compute overlap. ``depth`` staged chunks play the FIFO-depth role; when the
consumer stalls, the feeder blocks (backpressure) rather than dropping —
drop policy belongs to the display edge, not the signal path.

    feeder = StreamFeeder(source, chunk_samples=4 * 16384)
    feeder.start()
    for _ in range(n):
        x = feeder.get()              # device-resident, already transferred
        out, state = pipe.process(x, state, mode)

Complex (IQ) sources are split into re/im planes on the host (shape
(2, ..., T) float32); consume those chunks with
``pipe.process_planes(x, state, mode)`` — the device-array fast path of
the complex pipeline.
"""

from __future__ import annotations

import queue
import threading

import jax


class StreamFeeder:
    def __init__(
        self,
        source,
        chunk_samples: int,
        depth: int = 2,
        sharding=None,
        pace: bool = False,
    ):
        self.source = source
        self.chunk_samples = chunk_samples
        self.sharding = sharding
        self.pace = pace
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._error: BaseException | None = None
        self.chunks_staged = 0

    def start(self):
        # A restart must never run TWO producers over one source: if a
        # previous thread out-waited stop()'s bounded join (blocked in a
        # long source.read()), wait it out for real before spawning the
        # replacement — its loop exits at the next _stop check, but only
        # if _stop is still set while it runs (review finding: clearing
        # _stop first resumed the old loop alongside the new thread,
        # interleaving out-of-order chunks into the stream).
        if self._thread is not None and self._thread.is_alive():
            self._stop.set()
            self._thread.join()
        self._thread = None
        self._error = None  # a restart starts clean (review finding)
        self._stop.clear()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def _run(self):
        import numpy as np

        try:
            while not self._stop.is_set():
                x = self.source.read(self.chunk_samples, pace=self.pace)
                if np.iscomplexobj(x):
                    # IQ source: split re/im on the HOST (TPU backends may not
                    # implement complex dtypes) into the (2, ..., T) stacked
                    # layout the complex pipeline consumes — never silently
                    # drop the Q plane.
                    host = np.stack(
                        [np.asarray(x).real, np.asarray(x).imag], axis=0
                    ).astype(np.float32)
                else:
                    host = np.asarray(x, np.float32)
                # device_put straight from host memory (no intermediate
                # default-device staging copy)
                if self.sharding is not None:
                    arr = jax.device_put(host, self.sharding)
                else:
                    arr = jax.device_put(host)
                # block (backpressure) until the consumer frees a slot
                while not self._stop.is_set():
                    try:
                        self._q.put(arr, timeout=0.2)
                        self.chunks_staged += 1
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # surface in get()
            self._error = e

    def get(self, timeout: float = 30.0):
        """Next device-resident chunk (FIFO order). Raises feeder errors
        promptly (short-poll so a dead producer fails fast)."""
        import time as _time

        deadline = _time.monotonic() + timeout
        while True:
            # drain already-staged chunks before surfacing a producer error:
            # data transferred before the failure is still valid signal
            try:
                return self._q.get_nowait()
            except queue.Empty:
                pass
            if self._error is not None:
                raise self._error
            remaining = deadline - _time.monotonic()
            if remaining <= 0:
                raise TimeoutError("feeder produced no chunk in time")
            try:
                return self._q.get(timeout=min(0.2, remaining))
            except queue.Empty:
                continue

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2.0)
            if not self._thread.is_alive():
                self._thread = None
            # else: still blocked in source.read(); keep the reference so
            # start() can wait it out — nulling it here let a restart run
            # two producers over one source (review finding)
        # drain staged chunks so buffers free promptly
        while True:
            try:
                self._q.get_nowait()
            except queue.Empty:
                break
