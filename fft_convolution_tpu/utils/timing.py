"""Timing / profiling harness.

The reference's only measurement apparatus is ``std::time::Instant`` around
the block loop (``examples/compare_partitioned.rs:28-53``).  Here we add the
real-time metrics the audio world actually cares about: per-block latency
percentiles and the real-time factor xRT = (block / sample_rate) / t_block.
``jax.block_until_ready`` bounds every measurement (device work is async).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Sequence

import jax
import numpy as np


@dataclasses.dataclass
class BlockTiming:
    wall_s: float          # total wall time for the run
    n_blocks: int
    block_size: int
    sample_rate: float
    per_block_s: Sequence[float] | None = None  # per-dispatch latencies, if measured

    @property
    def xrt(self) -> float:
        """Real-time factor: how many realtime streams one run sustains."""
        audio_s = self.n_blocks * self.block_size / self.sample_rate
        return audio_s / self.wall_s

    def percentile_ms(self, q: float) -> float:
        assert self.per_block_s is not None
        return float(np.percentile(np.asarray(self.per_block_s), q) * 1e3)


def time_stream(fn: Callable, *args, warmup: int = 2, iters: int = 5) -> float:
    """Median wall time of ``fn(*args)`` with compile warmup; blocks on the
    result so device time is fully counted."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def time_per_block(step: Callable, state, blocks, warmup: int = 8) -> list[float]:
    """Latency of each single-block dispatch (the real-time serving path)."""
    for i in range(min(warmup, blocks.shape[0])):
        state2, y = step(state, blocks[i])
        jax.block_until_ready(y)
    times = []
    for i in range(blocks.shape[0]):
        t0 = time.perf_counter()
        state, y = step(state, blocks[i])
        jax.block_until_ready(y)
        times.append(time.perf_counter() - t0)
    return times
