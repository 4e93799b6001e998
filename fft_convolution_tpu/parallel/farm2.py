"""Two-stage reverb farm: many voices x long IRs, production configuration.

The uniform farm (``farm.py``) is O(ir_len) per voice-block; for 60 s IRs
the two-stage engine cuts per-voice compute ~20x and shrinks the streaming
working set (the big-tail stage uses the hoisted-DFT ring scan, which never
materializes the conv-core's extended history).  Voice count per chip is
bounded by the IR spectra themselves (~16L bytes/voice) instead of the
uniform farm's ~45L.

All stage streams are the *unguarded* cores vmapped over voices — batching a
``lax.cond`` would execute both branches for every voice, so cleanliness
(``current < active`` per stage) is a documented precondition.  It holds by
construction here: this farm exposes init + stream (IR updates go through
re-init or the uniform farm).

Multi-chip: states stack along the voice axis, so the same ``('dp',)``
sharding as ``farm.shard_farm`` applies (zero steady-state collectives).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import two_stage, uniform
from . import farm


def farm2_init(irs, block_size: int, max_response_length: int
               ) -> Tuple[two_stage.TwoStageConfig, two_stage.TwoStageState]:
    """Initialize V two-stage voices from ``irs [V, ir_len]``; returns the
    shared static config and a stacked state pytree.

    Mirrors ``TwoStageFFTConvolver::init`` (``src/fft_convolver.rs:340-406``)
    per voice, with each stage built through the batched farm initializer
    (one MXU-batched DFT per stage instead of V python loops).
    """
    irs = np.asarray(irs, np.float32)
    v = irs.shape[0]
    if max_response_length < irs.shape[1]:
        raise ValueError(
            "max_response_length must be at least the length of the initial "
            "impulse response"
        )
    head_block = block_size
    tb = two_stage.compute_tail_block_size(block_size, max_response_length)
    padded = np.zeros((v, max_response_length), np.float32)
    padded[:, : irs.shape[1]] = irs

    head_len = min(max_response_length, tb)
    head_cfg, head_state = farm.farm_init(padded[:, :head_len], head_block, head_len)

    if max_response_length > tb:
        t0_len = min(max_response_length - tb, tb)
        tail0_cfg, tail0_state = farm.farm_init(
            padded[:, tb : tb + t0_len], head_block, t0_len
        )
    else:
        tail0_cfg = None
        _, t0s = uniform.empty(head_block)
        tail0_state = jax.tree.map(lambda l: jnp.broadcast_to(l, (v,) + l.shape), t0s)

    if max_response_length > 2 * tb:
        t_len = max_response_length - 2 * tb
        tail_cfg, tail_state = farm.farm_init(padded[:, 2 * tb :], tb, t_len)
        # farm2-internal state convention: the big tail's IR table carries
        # CORR_EXTRA_ROWS periodic extension rows and the ring stays REBASED
        # (current == 0) so the correlation stream core uses only static
        # slices and never rebuilds a doubled table per call (the per-call
        # build was half the tail's HBM traffic — see
        # uniform.stream_corr_rebased_unguarded)
        n_t = tail_cfg.seg_count
        ext_idx = jnp.arange(uniform.CORR_EXTRA_ROWS) % n_t
        tail_state = tail_state._replace(
            segments_ir=jnp.concatenate(
                [tail_state.segments_ir,
                 jnp.take(tail_state.segments_ir, ext_idx, axis=1)],
                axis=1,
            )
        )
    else:
        tail_cfg = None
        _, ts = uniform.empty(tb)
        tail_state = jax.tree.map(lambda l: jnp.broadcast_to(l, (v,) + l.shape), ts)

    cfg = two_stage.TwoStageConfig(
        head_block=head_block, tail_block=tb,
        head=head_cfg, tail0=tail0_cfg, tail=tail_cfg,
    )
    # distinct arrays per field: donation rejects one buffer donated twice
    def zeros_t():
        return jnp.zeros((v, tb), jnp.float32)

    state = two_stage.TwoStageState(
        head=head_state, tail0=tail0_state, tail=tail_state,
        tail_output0=zeros_t(), tail_precalc0=zeros_t(),
        tail_output=zeros_t(), tail_precalc=zeros_t(),
        tail_input=zeros_t(),
        tail_fill=jnp.zeros((v,), jnp.int32),
        precalc_pos=jnp.zeros((v,), jnp.int32),
    )
    return cfg, state


def farm2_stream(cfg: two_stage.TwoStageConfig, state: two_stage.TwoStageState,
                 blocks: jnp.ndarray) -> Tuple[two_stage.TwoStageState, jnp.ndarray]:
    """Stream ``blocks [T, V, B]`` -> ``[T, V, B]``; requires period-aligned
    state (fresh or after period-multiple streams) and ``T % period == 0``.

    Voices run in lockstep (same T every call), so all per-voice scalars
    (ring heads, period counters) vmap unbatched — ring slices stay
    shared-index operations instead of per-voice gathers."""
    vx = jnp.swapaxes(blocks, 0, 1)  # [V, T, B]
    per_voice = functools.partial(
        two_stage.process_stream_aligned, cfg,
        small_stream=uniform.stream_conv_unguarded,
        big_stream=uniform.stream_corr_rebased_unguarded,
    )
    st2, ys = farm.lockstep_vmap_stream(per_voice, state, vx)
    return st2, jnp.swapaxes(ys, 0, 1)
