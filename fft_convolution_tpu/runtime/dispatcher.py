"""Real-time dispatcher: the thread structure of a deployed convolver.

The reference leaves concurrency as a comment ("might be done in some
background thread", ``src/fft_convolver.rs:478``); this module implements
the actual production shape:

    audio callback ──lock-free ring──► dispatcher thread ──ring──► callback
       (RT thread,      (C++ SPSC)      (owns the device,            out
        never blocks)                    drains blocks, runs
                                         the jitted engine)

The RT side only touches the native lock-free rings (never the GIL-holding
device dispatch); the dispatcher thread assembles fixed blocks, runs the
engine, and publishes output.  Underruns are observable, not fatal: the
consumer reads zeros when output isn't ready yet and the dispatcher keeps a
running count.
"""

from __future__ import annotations

import threading
import time

import numpy as np

from .chunker import BlockAssembler, RingBuffer


class RealTimeDispatcher:
    """Push/pull streaming through a background dispatch thread."""

    def __init__(self, engine, capacity_blocks: int = 64):
        self.engine = engine
        cfg = engine.cfg
        self.block_size = getattr(cfg, "block_size", None) or cfg.head_block
        cap = capacity_blocks * self.block_size
        self.in_ring = RingBuffer(cap)
        self.out_ring = RingBuffer(cap)
        self.assembler = BlockAssembler(self.block_size)
        self.samples_pushed = 0
        self.blocks_processed = 0
        self.underruns = 0
        self._running = False
        self._thread: threading.Thread | None = None

    # -- producer side (the audio callback; never blocks) -------------------

    def push(self, samples) -> int:
        """Offer input samples; returns how many were accepted."""
        accepted = self.in_ring.write(np.ascontiguousarray(samples, np.float32))
        self.samples_pushed += accepted
        return accepted

    # -- consumer side -------------------------------------------------------

    def pull(self, n: int) -> np.ndarray:
        """Take up to ``n`` processed samples (zero-padded on underrun)."""
        got = self.out_ring.read(n)
        if len(got) < n:
            self.underruns += 1
            got = np.concatenate([got, np.zeros(n - len(got), np.float32)])
        return got

    def available(self) -> int:
        return self.out_ring.readable()

    # -- dispatcher thread ----------------------------------------------------

    def _loop(self) -> None:
        b = self.block_size
        while self._running:
            chunk = self.in_ring.read(b)
            if len(chunk) == 0:
                time.sleep(0.0002)
                continue
            blocks = self.assembler.push(chunk)
            for block in blocks:
                y = self.engine.process(block)
                written = 0
                while written < b and self._running:
                    written += self.out_ring.write(y[written:])
                self.blocks_processed += 1

    def start(self) -> None:
        self._running = True
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._running = False
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None

    def drain(self, timeout: float = 10.0) -> None:
        """Block until every whole block's worth of pushed samples has been
        processed AND its output published.

        ``blocks_processed`` is incremented only after the engine output is
        fully written to the output ring, so the condition
        ``blocks_processed >= samples_pushed // block_size`` is exact — no
        "counter settled across one poll" heuristic (which raced with an
        engine step slower than the poll interval: input ring drained,
        counter static, block mid-``engine.process``)."""
        deadline = time.monotonic() + timeout
        expected = self.samples_pushed // self.block_size
        while time.monotonic() < deadline:
            if self.blocks_processed >= expected:
                return
            time.sleep(0.002)
        raise TimeoutError("dispatcher did not drain in time")

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()
