"""Streaming front-end: the audio-callback-facing runtime.

Ties the native block assembler to a convolution engine so an audio host can
push arbitrary-size buffers and pull processed audio with one block of
latency structure identical to the engine's own (zero added latency for
aligned blocks — sub-block pushes are forwarded straight to the engine's
sub-block path, mirroring ``src/fft_convolver.rs:222-294``).

``StreamingConvolver`` is the deployment-shaped wrapper: the reference
leaves this role to the caller's audio callback
(``examples/compare_partitioned.rs:30-48``).
"""

from __future__ import annotations

import numpy as np

from .chunker import BlockAssembler


class StreamingConvolver:
    """Push/pull streaming around any ``Convolution`` engine.

    ``push(x)`` accepts any number of samples and returns the same number of
    processed samples (the engine produces output with zero added latency).
    Full blocks are dispatched through the engine's scanned fast path; the
    ragged head/tail go through its sub-block path.
    """

    def __init__(self, engine, prefer_aligned: bool = True):
        self.engine = engine
        self.block_size = engine.cfg.block_size if hasattr(engine.cfg, "block_size") \
            else engine.cfg.head_block
        self.assembler = BlockAssembler(self.block_size)
        self.prefer_aligned = prefer_aligned

    def push(self, samples) -> np.ndarray:
        """Process ``samples`` (any length), returning processed audio of the
        same length."""
        x = np.ascontiguousarray(samples, np.float32)
        if not self.prefer_aligned or self.assembler.fill or len(x) % self.block_size:
            # ragged path: engine's internal chunker handles sub-blocks;
            # keep the assembler's fill mirror in sync for introspection
            self.assembler.push(x)
            return self.engine.process(x)
        blocks = self.assembler.push(x)
        if len(blocks) == 0:
            return np.zeros(0, np.float32)
        return self.engine.process(blocks.reshape(-1))

    def update(self, response) -> None:
        self.engine.update(response)

    def reset(self) -> None:
        self.engine.reset()
        self.assembler.reset()
