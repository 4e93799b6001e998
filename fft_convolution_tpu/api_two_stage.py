"""Stateful wrapper for the two-stage convolver — the ``Convolution``
implementation of ``TwoStageFFTConvolver`` (``src/fft_convolver.rs:339-512``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .models import two_stage


@functools.lru_cache(maxsize=None)
def _jit_block(cfg: two_stage.TwoStageConfig):
    return jax.jit(functools.partial(two_stage.process_block, cfg))


@functools.lru_cache(maxsize=None)
def _jit_partial(cfg: two_stage.TwoStageConfig):
    return jax.jit(functools.partial(two_stage.process_partial, cfg))


@functools.lru_cache(maxsize=None)
def _jit_stream(cfg: two_stage.TwoStageConfig):
    return jax.jit(functools.partial(two_stage.process_stream, cfg))


@functools.lru_cache(maxsize=None)
def _jit_stream_aligned(cfg: two_stage.TwoStageConfig):
    return jax.jit(functools.partial(two_stage.process_stream_aligned, cfg))


@functools.lru_cache(maxsize=None)
def _jit_stream_khats(cfg: two_stage.TwoStageConfig):
    return jax.jit(functools.partial(two_stage.stream_khats, cfg),
                   static_argnums=(1,))


@functools.lru_cache(maxsize=None)
def _jit_reset(cfg: two_stage.TwoStageConfig):
    return jax.jit(functools.partial(two_stage.reset, cfg))


@functools.lru_cache(maxsize=None)
def _jit_update_ext(cfg: two_stage.TwoStageConfig):
    return jax.jit(functools.partial(two_stage.update, cfg))


class TwoStageFFTConvolver:
    """Non-uniform (head/tail) partitioned convolution engine.

    The reference restricts ``process`` to ``input.len() <= head_block_size``
    (assert at ``src/fft_convolver.rs:414``).  This wrapper accepts that
    surface and, as a documented extension, also accepts longer block-aligned
    streams (processed head-block by head-block through the scanned fast
    path) — the natural TPU streaming call.
    """

    def __init__(self, response, block_size: int, max_response_length: int):
        if block_size & (block_size - 1) or block_size == 0:
            # The jitted schedule indexes period buffers at head-block
            # granularity; non-pow2 heads would need the reference's
            # sample-level re-chunking. Explicit > silently wrong.
            raise ValueError("TwoStageFFTConvolver requires a power-of-two block_size")
        self.cfg, self.state = two_stage.init(response, block_size, max_response_length)
        self._fill = 0         # host shadow of tail_input_fill % head_block
        self._period_fill = 0  # host shadow of tail_input_fill (period position)
        # head/tail0 stream-MAC kernel meta-spectra
        # (models.two_stage.stream_khats), cached per aligned-stream T:
        # input-independent between IR updates
        self._khat_cache = {}

    def update(self, response) -> None:
        """``todo!()`` in the reference (``src/fft_convolver.rs:408-410``) —
        surface matched.  Use :class:`CrossfadeConvolver` for live IR swaps."""
        raise NotImplementedError(
            "TwoStageFFTConvolver.update is unimplemented upstream "
            "(src/fft_convolver.rs:408-410); wrap in CrossfadeConvolver "
            "for artifact-free IR switching"
        )

    def update_extension(self, response) -> None:
        """EXTENSION (clearly marked — NOT reference surface): RT-safe IR
        swap for the two-stage engine, stage-wise semantics documented at
        :func:`models.two_stage.update`.  For reference-faithful live IR
        switching use :class:`CrossfadeConvolver`."""
        response = np.asarray(response, np.float32)
        # capacity is the init max_response_length, reconstructed from the
        # stage IR caps (src/fft_convolver.rs:352-384)
        cap = self.cfg.head.ir_len
        if self.cfg.tail0 is not None:
            cap = self.cfg.tail_block + self.cfg.tail0.ir_len
        if self.cfg.tail is not None:
            cap = 2 * self.cfg.tail_block + self.cfg.tail.ir_len
        if response.shape[0] > cap:
            raise ValueError("New impulse response is longer than initialized length")
        padded = np.zeros(cap, np.float32)
        padded[: response.shape[0]] = response
        self.state = _jit_update_ext(self.cfg)(
            self.state, jnp.asarray(padded),
            jnp.asarray(response.shape[0], jnp.int32),
        )
        # cached khats belong to the OLD stage tables
        self._khat_cache.clear()

    def reset(self) -> None:
        self.state = _jit_reset(self.cfg)(self.state)
        self._fill = 0
        self._period_fill = 0

    def process(self, input) -> np.ndarray:
        x = np.asarray(input, np.float32)
        n = x.shape[0]
        b = self.cfg.head_block
        tb = self.cfg.tail_block
        if n == 0:
            return np.zeros((0,), np.float32)
        if self._fill == 0 and n % b == 0:
            # split at period boundaries so the bulk of any long stream runs
            # on the aligned batched path; ragged period edges use the scan
            pre = 0 if self._period_fill == 0 else min(n, tb - self._period_fill)
            aligned = ((n - pre) // tb) * tb
            pieces = []
            for lo, hi, fn in (
                (0, pre, _jit_stream(self.cfg)),
                (pre, pre + aligned, _jit_stream_aligned(self.cfg)),
                (pre + aligned, n, _jit_stream(self.cfg)),
            ):
                if hi > lo:
                    if fn is not _jit_stream_aligned(self.cfg):
                        self.state, y = fn(
                            self.state, jnp.reshape(x[lo:hi], (-1, b))
                        )
                    else:
                        # aligned fast path: serve with the cached
                        # input-independent head/tail0 kernel meta-DFTs
                        # (keyed per T: head and tail0 may round to
                        # different meta lengths, and a T key can never
                        # serve a mismatched pair)
                        t = (hi - lo) // b
                        khats = self._khat_cache.get(t)
                        if khats is None:
                            khats = _jit_stream_khats(self.cfg)(self.state, t)
                            self._khat_cache[t] = khats
                        self.state, y = fn(
                            self.state, jnp.reshape(x[lo:hi], (-1, b)),
                            khats=khats,
                        )
                    pieces.append(np.asarray(y).reshape(-1))
            self._period_fill = (self._period_fill + n) % tb
            return pieces[0] if len(pieces) == 1 else np.concatenate(pieces)
        return self._process_chunked(x)

    def _process_chunked(self, x: np.ndarray) -> np.ndarray:
        b = self.cfg.head_block
        n = x.shape[0]
        out = np.empty(n, np.float32)
        partial = _jit_partial(self.cfg)
        processed = 0
        while processed < n:
            processing = min(n - processed, b - self._fill)
            chunk = np.zeros(b, np.float32)
            chunk[:processing] = x[processed : processed + processing]
            offset = self._fill
            self.state, y_full = partial(
                self.state, jnp.asarray(chunk), jnp.asarray(processing, jnp.int32)
            )
            out[processed : processed + processing] = np.asarray(y_full)[
                offset : offset + processing
            ]
            self._fill = (self._fill + processing) % b
            self._period_fill = (self._period_fill + processing) % self.cfg.tail_block
            processed += processing
        return out

    def snapshot(self):
        return (self.state, self._fill, self._period_fill)

    def restore(self, snap) -> None:
        self.state, self._fill, self._period_fill = snap
        # the snapshot may carry different stage tables than the cached khats
        self._khat_cache.clear()

    def clone(self) -> "TwoStageFFTConvolver":
        other = object.__new__(TwoStageFFTConvolver)
        other.cfg = self.cfg
        other.state = self.state
        other._fill = self._fill
        other._period_fill = self._period_fill
        # own cache: an update on either must not leave the other reading
        # khats of the wrong tables
        other._khat_cache = dict(self._khat_cache)
        return other
