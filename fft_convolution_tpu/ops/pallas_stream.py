"""Grid-streaming Pallas kernel: long-IR uniform serving without the VMEM
ceiling on the IR tables.

:mod:`ops.pallas_engine` keeps the whole working set (ring + doubled IR)
VMEM-resident, capping IRs at ~10 s @ 48 kHz / B=128.  This kernel removes
the IR from the budget: the grid walks GROUPS of 8 audio blocks, and for
every group the *reversed* IR spectrum tables stay HBM-resident and stream
through VMEM in double-buffered ``[C+8, B]`` chunks (an in-kernel DMA
pipeline), while only the input ring persists in VMEM scratch across the
whole grid.  Per 8 blocks the chip reads the full IR once from HBM (the
FDL MAC is inherently O(N) reads, amortized 8x by the grouping), so
per-block cost approaches the VPU MAC floor instead of failing to
compile.

Layout choices:

* ring slots are CHRONOLOGICAL (block ``t`` is written at slot
  ``w = (w0 + t) mod N`` — an incrementing head, vs the reference's
  decrementing ``current``; the engine contract is over outputs, and the
  wrapper documents the equivalence) so the MAC pairing

      conv[t] = sum_u irrev[u] (*) ring[(w + 1 + u) mod N],
      irrev[u] = ir[N - 1 - u]

  walks ASCENDING contiguous windows of both tables;
* the ring scratch carries ``C`` mirror rows (``ring[N + r] == ring[r]``
  for ``r < C``) so every length-``C`` window ``[s0, s0 + C)`` with
  ``s0 < N`` reads contiguously — no wraparound slicing;
* the fresh block's spectrum enters the MAC algebraically (the stale slot
  ``w`` is corrected with ``(spec - ring[w]) (*) ir[0]`` at the last chunk,
  exactly like :mod:`ops.pallas_engine`) and is stored to the ring after;
* ring state enters and leaves through chunk-streamed inputs/outputs whose
  index maps collapse to block 0 outside ``t == 0`` / ``t == T - 1``, so
  state I/O costs one extra chunk of traffic per call, not one per block.

``seg_count`` is padded to a multiple of the chunk size with zero-IR rows
(equivalent to a reference convolver with a padded ``max_response_length``,
``src/fft_convolver.rs:111-118``).  Hot-loop contract preserved:
``src/fft_convolver.rs:215-295``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fft import _irdft_basis, _rdft_basis
from .pallas_engine import _dot, _unpack_words
from ..models.uniform import UniformConfig

# the ring scratch + bases + chunk double-buffers must fit VMEM
_VMEM_BUDGET = 14 * 1024 * 1024


class StreamConsts(NamedTuple):
    """Per-IR tables (rebuilt by update): reversed IR spectra, DFT bases.
    re/im stay SEPARATE [N, B] planes: at the native 128-lane width Mosaic
    accepts the dynamic (unaligned) sublane windows the sliding MAC needs;
    a merged [N, 2B] layout does not lower."""

    irrev_re: jnp.ndarray   # f32 [N, B]  irrev[u] = ir[N-1-u]
    irrev_im: jnp.ndarray   # f32 [N, B]
    fwd_half: jnp.ndarray   # f32 [B, 2B]
    inv_re: jnp.ndarray     # f32 [B, 2B]
    inv_im: jnp.ndarray     # f32 [B, 2B]


class StreamState(NamedTuple):
    """Engine state between calls (HBM-resident)."""

    ring_re: jnp.ndarray    # f32 [N, B] chronological input spectra
    ring_im: jnp.ndarray    # f32 [N, B]
    overlap: jnp.ndarray    # f32 [1, B]
    w: jnp.ndarray          # i32 [1] next write slot


def padded_seg_count(seg_count: int, c: int) -> int:
    return -(-seg_count // c) * c


def fits_vmem(seg_count: int, block_size: int, chunk: int = 512) -> bool:
    c = min(chunk, seg_count)
    n = padded_seg_count(seg_count, c)
    working = (n + c) * 2 * block_size * 4          # ring scratch (re + im)
    working += 3 * block_size * 2 * block_size * 4  # bases
    working += 4 * c * block_size * 4               # 2 kbuf slots x 2 planes
    return working < _VMEM_BUDGET


def _kernel(n: int, b: int, c: int, t_real: int, t_pad: int, packed: bool,
            *refs):
    """1-D grid over audio blocks; the IR-chunk loop runs IN-KERNEL with
    explicitly double-buffered HBM->VMEM DMAs (the guide's slot pattern), so
    the per-chunk cost is a DMA wait + 4 VPU reductions instead of a full
    Pallas grid step.

    Row t == 0 DMAs the incoming ring state into scratch (the MAC windows
    slide with ``w``, so processing cannot start before the whole ring is
    resident); rows t in [1, t_real] process block t-1; row t_pad+1 DMAs
    the ring back out.  x/y move in (8, B) groups (Mosaic's sublane rule),
    the kernel selecting row (t-1) % 8.

    ``packed``: the IR table is ONE plane-packed uint32 ref instead of two
    f32 planes (ops/packing.py) — half the streamed bytes per chunk (the
    dominant per-block cost for long IRs), unpacked lane-locally after the
    DMA wait.  The ring scratch stays f32 (resident, not streamed).

    (An 8-blocks-per-row variant that amortizes the IR DMA 8x was measured
    3.7x SLOWER: its per-block kernel-table pairing needs 8 sublane-
    misaligned slices per chunk, and misaligned VMEM access dominates
    everything on this target.)
    """
    if packed:
        (w0_ref, x_ref, irrev_w_hbm,
         rin_re_hbm, rin_im_hbm, ovl_in_ref,
         fwd_ref, invre_ref, invim_ref,
         y_ref, rout_re_hbm, rout_im_hbm, ovl_out_ref, w_out_ref,
         ring_re, ring_im, kbuf_w,
         spec_re, spec_im, ovl,
         sem_load, sem_k, sem_out) = refs
    else:
        (w0_ref, x_ref, irrev_re_hbm, irrev_im_hbm,
         rin_re_hbm, rin_im_hbm, ovl_in_ref,
         fwd_ref, invre_ref, invim_ref,
         y_ref, rout_re_hbm, rout_im_hbm, ovl_out_ref, w_out_ref,
         ring_re, ring_im, kbuf_re, kbuf_im,
         spec_re, spec_im, ovl,
         sem_load, sem_k, sem_out) = refs
    k_chunks = n // c
    t = pl.program_id(0)
    row = jax.lax.rem(t - 1, 8)
    w = jax.lax.rem(w0_ref[0] + t - 1, n)

    # ---- t == 0: DMA the incoming ring state into scratch ------------------
    @pl.when(t == 0)
    def _():
        copies = (
            pltpu.make_async_copy(rin_re_hbm, ring_re.at[pl.ds(0, n)],
                                  sem_load.at[0]),
            pltpu.make_async_copy(rin_im_hbm, ring_im.at[pl.ds(0, n)],
                                  sem_load.at[1]),
            # mirror rows [N, N+C) repeat rows [0, C)
            pltpu.make_async_copy(rin_re_hbm.at[pl.ds(0, c)],
                                  ring_re.at[pl.ds(n, c)], sem_load.at[2]),
            pltpu.make_async_copy(rin_im_hbm.at[pl.ds(0, c)],
                                  ring_im.at[pl.ds(n, c)], sem_load.at[3]),
        )
        for cp in copies:
            cp.start()
        for cp in copies:
            cp.wait()
        ovl[:] = ovl_in_ref[:]

    @pl.when((t >= 1) & (t <= t_real))
    def _process():
        spec = _dot(x_ref[pl.ds(row, 1), :], fwd_ref[:])   # [1, 2B] on MXU
        spec_re[:] = spec[:, :b]
        spec_im[:] = spec[:, b:]

        def k_copy(j, slot, plane_hbm, buf, sem_idx):
            return pltpu.make_async_copy(
                plane_hbm.at[pl.ds(j * c, c)], buf.at[slot],
                sem_k.at[slot, sem_idx],
            )

        def start_chunk(j, slot):
            if packed:
                k_copy(j, slot, irrev_w_hbm, kbuf_w, 0).start()
            else:
                k_copy(j, slot, irrev_re_hbm, kbuf_re, 0).start()
                k_copy(j, slot, irrev_im_hbm, kbuf_im, 1).start()

        start_chunk(0, 0)

        def body(j, accs):
            rr, ii, ri, ir_ = accs
            slot = jax.lax.rem(j, 2)

            @pl.when(j + 1 < k_chunks)
            def _():
                start_chunk(j + 1, jax.lax.rem(j + 1, 2))

            if packed:
                k_copy(j, slot, irrev_w_hbm, kbuf_w, 0).wait()
                k_re, k_im = _unpack_words(kbuf_w[slot])
            else:
                k_copy(j, slot, irrev_re_hbm, kbuf_re, 0).wait()
                k_copy(j, slot, irrev_im_hbm, kbuf_im, 1).wait()
                k_re = kbuf_re[slot]
                k_im = kbuf_im[slot]

            s0 = jax.lax.rem(w + 1 + j * c, n)
            seg_re = ring_re[pl.ds(s0, c), :]
            seg_im = ring_im[pl.ds(s0, c), :]
            rr = rr + jnp.sum(seg_re * k_re, axis=0, keepdims=True)
            ii = ii + jnp.sum(seg_im * k_im, axis=0, keepdims=True)
            ri = ri + jnp.sum(seg_re * k_im, axis=0, keepdims=True)
            ir_ = ir_ + jnp.sum(seg_im * k_re, axis=0, keepdims=True)
            return rr, ii, ri, ir_

        zero = jnp.zeros((1, b), jnp.float32)
        rr, ii, ri, ir_ = jax.lax.fori_loop(
            0, k_chunks, body, (zero, zero, zero, zero)
        )

        # stale-slot correction: slot w still holds the PREVIOUS occupant;
        # its pairing is ir[0] = irrev[N-1] = the last chunk's last row
        d_re = spec_re[:] - ring_re[pl.ds(w, 1), :]
        d_im = spec_im[:] - ring_im[pl.ds(w, 1), :]
        last = jax.lax.rem(k_chunks - 1, 2)
        if packed:
            ir0_re, ir0_im = _unpack_words(kbuf_w[last, pl.ds(c - 1, 1), :])
        else:
            ir0_re = kbuf_re[last, pl.ds(c - 1, 1), :]
            ir0_im = kbuf_im[last, pl.ds(c - 1, 1), :]
        rr = rr + d_re * ir0_re
        ii = ii + d_im * ir0_im
        ri = ri + d_re * ir0_im
        ir_ = ir_ + d_im * ir0_re

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)
        m0 = (lane == 0).astype(jnp.float32)
        conv_re = rr - ii * (1.0 - m0)
        conv_im = (ri + ir_) * (1.0 - m0) + ii * m0

        out = _dot(conv_re, invre_ref[:]) + _dot(conv_im, invim_ref[:])
        y_ref[pl.ds(row, 1), :] = out[:, :b] + ovl[:]
        ovl[:] = out[:, b:]

        # store the fresh spectrum into the ring (+ mirror)
        ring_re[pl.ds(w, 1), :] = spec_re[:]
        ring_im[pl.ds(w, 1), :] = spec_im[:]

        @pl.when(w < c)
        def _():
            ring_re[pl.ds(n + w, 1), :] = spec_re[:]
            ring_im[pl.ds(n + w, 1), :] = spec_im[:]

    # ---- t == T_pad+1 (after the last block's ring write): DMA the ring
    # state back out ------------------------------------------------------------
    @pl.when(t == t_pad + 1)
    def _():
        copies = (
            pltpu.make_async_copy(ring_re.at[pl.ds(0, n)], rout_re_hbm,
                                  sem_out.at[0]),
            pltpu.make_async_copy(ring_im.at[pl.ds(0, n)], rout_im_hbm,
                                  sem_out.at[1]),
        )
        for cp in copies:
            cp.start()
        for cp in copies:
            cp.wait()
        ovl_out_ref[:] = ovl[:]
        w_out_ref[0] = jax.lax.rem(w0_ref[0] + t_real, n)


@functools.lru_cache(maxsize=None)
def _build_call(n: int, b: int, c: int, t_real: int, interpret: bool,
                packed: bool = False):
    t_pad = -(-t_real // 8) * 8
    kernel = functools.partial(_kernel, n, b, c, t_real, t_pad, packed)
    groups = t_pad // 8
    # rows: t=0 ring load, t in [1, T_real] block processing (rows up to
    # T_pad idle), t=T_pad+1 ring unload
    grid = (t_pad + 2,)

    def xy_map(t):
        return (jnp.clip((t - 1) // 8, 0, groups - 1), 0)

    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, b), jnp.float32),    # y (padded)
            jax.ShapeDtypeStruct((n, b), jnp.float32),        # ring_re out
            jax.ShapeDtypeStruct((n, b), jnp.float32),        # ring_im out
            jax.ShapeDtypeStruct((1, b), jnp.float32),        # overlap out
            jax.ShapeDtypeStruct((1,), jnp.int32),            # w out
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),             # w0
            pl.BlockSpec((8, b), xy_map),                      # x
        ] + (
            [pl.BlockSpec(memory_space=pl.ANY)]             # irrev_w (HBM)
            if packed else
            [pl.BlockSpec(memory_space=pl.ANY),             # irrev_re (HBM)
             pl.BlockSpec(memory_space=pl.ANY)]             # irrev_im (HBM)
        ) + [
            pl.BlockSpec(memory_space=pl.ANY),              # rin_re (HBM)
            pl.BlockSpec(memory_space=pl.ANY),              # rin_im (HBM)
            pl.BlockSpec((1, b), lambda t: (0, 0)),            # overlap in
            pl.BlockSpec(memory_space=pltpu.VMEM),             # fwd
            pl.BlockSpec(memory_space=pltpu.VMEM),             # inv_re
            pl.BlockSpec(memory_space=pltpu.VMEM),             # inv_im
        ],
        out_specs=(
            pl.BlockSpec((8, b), xy_map),                      # y
            pl.BlockSpec(memory_space=pl.ANY),              # ring_re out
            pl.BlockSpec(memory_space=pl.ANY),              # ring_im out
            pl.BlockSpec((1, b), lambda t: (0, 0)),            # overlap
            pl.BlockSpec(memory_space=pltpu.SMEM),             # w
        ),
        scratch_shapes=[
            pltpu.VMEM((n + c, b), jnp.float32),       # ring_re
            pltpu.VMEM((n + c, b), jnp.float32),       # ring_im
        ] + (
            [pltpu.VMEM((2, c, b), jnp.uint32)]        # kbuf_w (2 slots)
            if packed else
            [pltpu.VMEM((2, c, b), jnp.float32),       # kbuf_re (2 slots)
             pltpu.VMEM((2, c, b), jnp.float32)]       # kbuf_im
        ) + [
            pltpu.VMEM((1, b), jnp.float32),           # spec_re
            pltpu.VMEM((1, b), jnp.float32),           # spec_im
            pltpu.VMEM((1, b), jnp.float32),           # ovl
            pltpu.SemaphoreType.DMA((4,)),             # sem_load
            pltpu.SemaphoreType.DMA((2, 2)),           # sem_k [slot, plane]
            pltpu.SemaphoreType.DMA((2,)),             # sem_out
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )


def build_consts(ir_spectra: jnp.ndarray, n: int, b: int) -> StreamConsts:
    """``ir_spectra``: packed [N, 2, B] partition spectra (N already padded
    to the chunk multiple).  Reverses the partition axis for the ascending-
    window MAC."""
    rev = jnp.flip(ir_spectra, axis=0)
    fwd = np.asarray(_rdft_basis(2 * b))
    inv = np.asarray(_irdft_basis(2 * b))
    return StreamConsts(
        irrev_re=rev[:, 0], irrev_im=rev[:, 1],
        fwd_half=jnp.asarray(fwd[:b]),
        inv_re=jnp.asarray(inv[:b]),
        inv_im=jnp.asarray(inv[b:]),
    )


class StreamConstsPacked(NamedTuple):
    """Per-IR tables with the streamed table plane-packed to bf16 words
    (ops/packing.py): HALF the per-chunk DMA — the dominant per-block
    cost for long IRs — at ~1e-3 relative on the output."""

    irrev_w: jnp.ndarray    # u32 [N, B] packed irrev[u] = ir[N-1-u]
    fwd_half: jnp.ndarray   # f32 [B, 2B]
    inv_re: jnp.ndarray     # f32 [B, 2B]
    inv_im: jnp.ndarray     # f32 [B, 2B]


def build_consts_packed(ir_spectra: jnp.ndarray, n: int,
                        b: int) -> StreamConstsPacked:
    from .packing import pack_c32

    c = build_consts(ir_spectra, n, b)
    return StreamConstsPacked(
        irrev_w=pack_c32(c.irrev_re, c.irrev_im),
        fwd_half=c.fwd_half, inv_re=c.inv_re, inv_im=c.inv_im,
    )


def zero_state(n: int, b: int) -> StreamState:
    return StreamState(
        ring_re=jnp.zeros((n, b), jnp.float32),
        ring_im=jnp.zeros((n, b), jnp.float32),
        overlap=jnp.zeros((1, b), jnp.float32),
        w=jnp.zeros((1,), jnp.int32),
    )


def stream(cfg: UniformConfig, consts, state: StreamState,
           blocks: jnp.ndarray, chunk: int = 512,
           interpret: bool = False) -> Tuple[StreamState, jnp.ndarray]:
    """Run ``blocks [T, B]`` through the grid-streaming kernel.
    ``cfg.seg_count`` must be a multiple of ``chunk`` (wrapper pads).
    ``consts``: :class:`StreamConsts` (f32) or :class:`StreamConstsPacked`
    (bf16-packed table, half the streamed bytes)."""
    n, b = cfg.seg_count, cfg.block_size
    c = min(chunk, n)
    assert n % c == 0, "seg_count must be a multiple of the chunk size"
    packed = isinstance(consts, StreamConstsPacked)
    t_total = blocks.shape[0]
    call = _build_call(n, b, c, t_total, interpret, packed)
    t_pad = -(-t_total // 8) * 8
    if t_pad != t_total:
        blocks = jnp.pad(blocks, ((0, t_pad - t_total), (0, 0)))
    tables = ((consts.irrev_w,) if packed
              else (consts.irrev_re, consts.irrev_im))
    y, ring_re, ring_im, overlap, w = call(
        state.w, blocks, *tables,
        state.ring_re, state.ring_im, state.overlap,
        consts.fwd_half, consts.inv_re, consts.inv_im,
    )
    return StreamState(ring_re, ring_im, overlap, w), y[:t_total]
