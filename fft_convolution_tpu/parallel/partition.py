"""Segment-axis sharding: one voice, one giant IR, many chips.

For very long impulse responses (60 s @ 48 kHz = 2.88 M taps -> ~23 MB of
partition spectra per voice at B=128, SURVEY.md §5) the frequency-delay line
itself is the thing to shard.  This module partitions the FDL's segment axis
over an ``('sp',)`` mesh axis with ``shard_map``:

* ``segments`` (input-block spectra ring) is sharded by storage row;
* ``segments_ir`` is replicated (each chip reads only a circular window of
  it per block, and it never changes between updates);
* each chip computes its local masked spectral MAC, and one ``psum`` of a
  single ``[2, B]`` spectrum (~1 KB at B=128) merges the partial sums over
  ICI — the only cross-chip traffic in the steady-state audio path;
* the fresh input spectrum is computed replicated, so partition 0's product
  (``segments[current] * ir[0]``) needs no gather at all.

The ring gather is re-expressed gather-free: the reference pairs IR index
``i`` with stored row ``(current + i) % active`` (``src/fft_convolver.rs:248``),
so stored row ``j`` pairs with IR row ``(j - current) mod active`` — each
chip indexes the *replicated* IR with its own local window instead of
gathering remote segment rows.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..models import uniform
from ..ops.cpx import pmul, pmul_sum
from ..ops.fft import irdft_block, rdft_block


class ShardedFDLState(NamedTuple):
    """Distributed uniform-convolver state.  ``segments`` is sharded on its
    row axis over 'sp'; everything else is replicated."""

    segments: jnp.ndarray      # f32 [seg_count, 2, B]  (sharded rows)
    segments_ir: jnp.ndarray   # f32 [seg_count, 2, B]  (replicated)
    overlap: jnp.ndarray       # f32 [B]
    current: jnp.ndarray       # i32 []
    active_segs: jnp.ndarray   # i32 []


def make_mesh(devices=None, axis: str = "sp") -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def init(mesh: Mesh, response, block_size: int, max_response_length: int
         ) -> Tuple[uniform.UniformConfig, ShardedFDLState]:
    """Build a sharded FDL; seg_count is padded up to a multiple of the mesh
    size so every chip owns an equal row slab."""
    n_dev = mesh.devices.size
    cfg0 = uniform.make_config(block_size, max_response_length)
    seg_count = -(-cfg0.seg_count // n_dev) * n_dev
    cfg = uniform.UniformConfig(
        block_size=cfg0.block_size, seg_count=seg_count, ir_len=cfg0.ir_len
    )
    response = jnp.asarray(response, jnp.float32)
    if max_response_length < response.shape[0]:
        raise ValueError(
            "max_response_length must be at least the length of the initial "
            "impulse response"
        )
    padded = jnp.pad(response, (0, seg_count * cfg.block_size - response.shape[0]))
    from ..ops.fft import ir_to_spectra

    ir_spec = ir_to_spectra(padded, cfg.block_size, seg_count)
    state = ShardedFDLState(
        segments=jax.device_put(
            jnp.zeros((seg_count, 2, cfg.block_size), jnp.float32),
            NamedSharding(mesh, P("sp")),
        ),
        segments_ir=jax.device_put(ir_spec, NamedSharding(mesh, P())),
        overlap=jax.device_put(jnp.zeros((cfg.block_size,), jnp.float32),
                               NamedSharding(mesh, P())),
        current=jax.device_put(jnp.zeros((), jnp.int32), NamedSharding(mesh, P())),
        # active counts real (unpadded) segments, like the reference (:117)
        active_segs=jax.device_put(
            jnp.asarray(cfg0.seg_count, jnp.int32), NamedSharding(mesh, P())
        ),
    )
    return cfg, state


def _build_raw_step(cfg: uniform.UniformConfig, mesh: Mesh):
    """Unjitted sharded block step: ``(state, x[B]) -> (state, y[B])``."""
    b = cfg.block_size
    n = cfg.seg_count
    n_dev = mesh.devices.size
    local_rows = n // n_dev

    def local_step(seg_local, ir_full, overlap, current, active, x):
        # shard_map body: seg_local [local_rows, 2, B]; everything else full
        rank = jax.lax.axis_index("sp")
        row0 = rank * local_rows
        j = row0 + jnp.arange(local_rows, dtype=jnp.int32)  # global storage rows

        spec = rdft_block(x, 2 * b)  # replicated compute: one tiny DFT

        # write the fresh spectrum into the owner's local slab
        is_mine = (j == current)[:, None, None]
        seg_local = jnp.where(is_mine, spec[None], seg_local)

        # local masked MAC: stored row j pairs IR row (j - current) mod active
        active_safe = jnp.maximum(active, 1)
        ir_idx = jnp.mod(j - current, active_safe)
        mask = (j < active) & (ir_idx >= 1)
        ir_rows = jnp.take(ir_full, ir_idx, axis=0)
        partial = pmul_sum(ir_rows, seg_local, mask)
        pre = jax.lax.psum(partial, "sp")  # ~1 KB over ICI

        conv = pre + pmul(spec, ir_full[0])
        fft_buffer = irdft_block(conv, 2 * b)
        y = fft_buffer[:b] + overlap
        new_overlap = fft_buffer[b:]
        new_current = jnp.where(current > 0, current - 1, active - 1).astype(jnp.int32)
        return seg_local, new_overlap, new_current, y

    mapped = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P("sp"), P(), P(), P(), P(), P()),
        out_specs=(P("sp"), P(), P(), P()),
        check_vma=False,
    )

    def step(state: ShardedFDLState, x: jnp.ndarray):
        seg, overlap, current, y = mapped(
            state.segments, state.segments_ir, state.overlap,
            state.current, state.active_segs, x,
        )
        return ShardedFDLState(
            segments=seg, segments_ir=state.segments_ir,
            overlap=overlap, current=current, active_segs=state.active_segs,
        ), y

    return step


def build_step(cfg: uniform.UniformConfig, mesh: Mesh):
    """Jitted sharded block step: ``(state, x[B]) -> (state, y[B])``."""
    return jax.jit(_build_raw_step(cfg, mesh), donate_argnums=(0,))


def build_stream(cfg: uniform.UniformConfig, mesh: Mesh):
    """Jitted sharded stream: ``(state, blocks[T, B]) -> (state, y[T, B])``."""
    raw = _build_raw_step(cfg, mesh)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(state: ShardedFDLState, blocks: jnp.ndarray):
        return jax.lax.scan(raw, state, blocks)

    return run
