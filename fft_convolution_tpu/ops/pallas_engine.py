"""Pallas fused block-step kernel for the uniform convolver.

One ``pallas_call`` per audio block replaces the ~15-op XLA graph of
``uniform.process_block`` (DFT matmul, ring write, gather, masked MAC,
inverse DFT, overlap-add) with a single fused kernel:

* the forward/inverse DFT bases live in VMEM and hit the MXU as one
  ``[1, 2B] @ [2B, 2B]`` matmul each;
* the ring write is a dynamic row store (``pl.ds``);
* the frequency-delay-line MAC is **gather-free**: partition pairing
  ``ir[(j - current) mod N]`` becomes one dynamic slice into a doubled IR
  table (``ir2 = concat(ir, ir)``) — a contiguous VMEM window, no gather;
* spectra are stored as separate re/im planes ``[N, B]`` so every ref
  tiles the (8, 128) VPU lanes exactly (the ``[N, 2, B]`` pytree layout
  would waste 4x sublanes inside the kernel).

Preconditions (checked by the caller, falling back to the jnp path):
``active_segs == seg_count`` (clean full ring — partition 0 is then just
the freshly written row, so the MAC needs no masks at all) and the working
set fits VMEM (see :func:`fits_vmem`).

Kernel-layer counterpart of the hot loop ``src/fft_convolver.rs:215-295``.
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
from ..models.uniform import UniformConfig, UniformState

# leave headroom under the ~16 MB/core VMEM for bases, x, y, and spills
_VMEM_BUDGET = 12 * 1024 * 1024


class PallasFDLState(NamedTuple):
    """Kernel-layout engine state (separate re/im planes)."""

    seg_re: jnp.ndarray    # f32 [N, B]
    seg_im: jnp.ndarray    # f32 [N, B]
    overlap: jnp.ndarray   # f32 [1, B]
    current: jnp.ndarray   # i32 [1]


class PallasFDLConsts(NamedTuple):
    """Immutable per-IR tables (rebuilt on update()).

    The DFT bases are pre-split so the kernel never concatenates along the
    lane axis (unsupported by Mosaic): the forward basis keeps only its top
    half (the zero-padded bottom half of the FFT input contributes nothing),
    and the inverse basis splits into the rows consumed by the re and im
    planes of the packed spectrum.
    """

    ir2_re: jnp.ndarray    # f32 [2N, B] doubled IR spectra (re)
    ir2_im: jnp.ndarray    # f32 [2N, B]
    fwd_half: jnp.ndarray  # f32 [B, 2B] forward basis rows :B
    inv_re: jnp.ndarray    # f32 [B, 2B] inverse basis rows :B  (re plane)
    inv_im: jnp.ndarray    # f32 [B, 2B] inverse basis rows B:  (im plane)


def fits_vmem(cfg: UniformConfig) -> bool:
    n, b = cfg.seg_count, cfg.block_size
    working = (2 * n * b + 2 * 2 * n * b) * 4  # seg planes + doubled ir planes
    working += 2 * (2 * b) * (2 * b) * 4       # two DFT bases
    return working < _VMEM_BUDGET


def from_uniform(cfg: UniformConfig, state: UniformState
                 ) -> Tuple[PallasFDLConsts, PallasFDLState]:
    """Convert engine state/IR into kernel layout."""
    ir_re, ir_im = state.segments_ir[:, 0], state.segments_ir[:, 1]
    b = cfg.block_size
    fwd = np.asarray(_rdft_basis(cfg.fft_size))
    inv = np.asarray(_irdft_basis(cfg.fft_size))
    consts = PallasFDLConsts(
        ir2_re=jnp.concatenate([ir_re, ir_re], axis=0),
        ir2_im=jnp.concatenate([ir_im, ir_im], axis=0),
        fwd_half=jnp.asarray(fwd[:b]),
        inv_re=jnp.asarray(inv[:b]),
        inv_im=jnp.asarray(inv[b:]),
    )
    pstate = PallasFDLState(
        seg_re=state.segments[:, 0],
        seg_im=state.segments[:, 1],
        overlap=state.overlap[None],
        current=state.current[None],
    )
    return consts, pstate


def to_uniform(cfg: UniformConfig, pstate: PallasFDLState,
               template: UniformState) -> UniformState:
    """Back to the pytree layout (for interop with the jnp paths).
    ``pre_multiplied`` is recomputed lazily by those paths at block start."""
    segments = jnp.stack([pstate.seg_re, pstate.seg_im], axis=1)
    return template._replace(
        segments=segments,
        overlap=pstate.overlap[0],
        current=pstate.current[0],
    )


class PallasFDLConstsPacked(NamedTuple):
    """Plane-packed bf16 IR tables (ops/packing.py): one uint32 word per
    bin — halves the table half of the kernel's per-block HBM traffic."""

    ir2_w: jnp.ndarray     # u32 [2N, B] doubled IR spectra, packed
    fwd_half: jnp.ndarray  # f32 [B, 2B]
    inv_re: jnp.ndarray    # f32 [B, 2B]
    inv_im: jnp.ndarray    # f32 [B, 2B]


class PallasFDLStatePacked(NamedTuple):
    seg_w: jnp.ndarray     # u32 [N, B] input-spectra ring, packed
    overlap: jnp.ndarray   # f32 [1, B]
    current: jnp.ndarray   # i32 [1]


def fits_vmem_packed(cfg: UniformConfig) -> bool:
    n, b = cfg.seg_count, cfg.block_size
    working = (n * b + 2 * n * b) * 4          # packed ring + packed table
    working += 2 * (2 * b) * (2 * b) * 4       # two DFT bases
    return working < _VMEM_BUDGET


def from_uniform_packed(cfg: UniformConfig, state: UniformState
                        ) -> Tuple[PallasFDLConstsPacked, PallasFDLStatePacked]:
    """Kernel layout with bf16-packed ring + IR table.  The ring and table
    carry bf16 precision (~1e-3 relative on the convolution tail terms);
    the CURRENT block's direct term stays f32-exact (the stale-row
    correction uses the fresh in-kernel spectrum, not the ring row)."""
    from .packing import pack_c32

    ir_re, ir_im = state.segments_ir[:, 0], state.segments_ir[:, 1]
    b = cfg.block_size
    fwd = np.asarray(_rdft_basis(cfg.fft_size))
    inv = np.asarray(_irdft_basis(cfg.fft_size))
    ir2_w = pack_c32(jnp.concatenate([ir_re, ir_re], axis=0),
                     jnp.concatenate([ir_im, ir_im], axis=0))
    consts = PallasFDLConstsPacked(
        ir2_w=ir2_w,
        fwd_half=jnp.asarray(fwd[:b]),
        inv_re=jnp.asarray(inv[:b]),
        inv_im=jnp.asarray(inv[b:]),
    )
    pstate = PallasFDLStatePacked(
        seg_w=pack_c32(state.segments[:, 0], state.segments[:, 1]),
        overlap=state.overlap[None],
        current=state.current[None],
    )
    return consts, pstate


def _dot(a, b):
    return jax.lax.dot_general(
        a, b,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _kernel(n: int, b: int,
            x_ref, seg_re_ref, seg_im_ref, ir2_re_ref, ir2_im_ref,
            overlap_ref, cur_ref, fwd_ref, inv_re_ref, inv_im_ref,
            y_ref, spec_re_out, spec_im_out, overlap_out, cur_out):
    """Segments are READ-ONLY here: writing one row of a multi-MB ref would
    force the whole buffer back out to HBM (aliased outputs get fresh VMEM
    on hardware — only the HBM storage is shared).  Instead the MAC treats
    the stale row algebraically: row ``cur`` pairs with ``ir[0]``, so

        conv = sum_j seg[j] (*) ir[(j-cur) mod N]  +  (spec - seg[cur]) (*) ir[0]

    and the caller performs the one-row ring write with an XLA in-place
    dynamic update on a donated buffer.
    """
    cur = cur_ref[0]

    # forward DFT on the MXU: the zero-padded bottom half of the FFT input
    # contributes nothing, so only the top half of the basis participates
    spec = _dot(x_ref[:], fwd_ref[:])   # [1, 2B] -> re | im halves
    spec_re, spec_im = spec[:, :b], spec[:, b:]
    spec_re_out[:] = spec_re
    spec_im_out[:] = spec_im

    # gather-free rolled IR pairing: rolled[j] = ir[(j - cur) mod N]
    roll0 = n - cur
    r_re = ir2_re_ref[pl.ds(roll0, n), :]
    r_im = ir2_im_ref[pl.ds(roll0, n), :]

    s_re = seg_re_ref[:]
    s_im = seg_im_ref[:]
    rr = jnp.sum(s_re * r_re, axis=0, keepdims=True)   # [1, B]
    ii = jnp.sum(s_im * r_im, axis=0, keepdims=True)
    ri = jnp.sum(s_re * r_im, axis=0, keepdims=True)
    ir_ = jnp.sum(s_im * r_re, axis=0, keepdims=True)

    # stale-row correction: replace seg[cur] (*) ir[0] with spec (*) ir[0]
    d_re = spec_re - seg_re_ref[pl.ds(cur, 1), :]
    d_im = spec_im - seg_im_ref[pl.ds(cur, 1), :]
    ir0_re = ir2_re_ref[pl.ds(0, 1), :]
    ir0_im = ir2_im_ref[pl.ds(0, 1), :]
    rr = rr + d_re * ir0_re
    ii = ii + d_im * ir0_im
    ri = ri + d_re * ir0_im
    ir_ = ir_ + d_im * ir0_re

    # packed halfcomplex product corrections on lane 0 (see ops/cpx.py)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)
    m0 = (lane == 0).astype(jnp.float32)
    conv_re = rr - ii * (1.0 - m0)
    conv_im = (ri + ir_) * (1.0 - m0) + ii * m0

    # inverse DFT: the packed [1, 2B] @ [2B, 2B] product splits into the
    # re-plane and im-plane halves of the basis (no lane concat needed)
    out = _dot(conv_re, inv_re_ref[:]) + _dot(conv_im, inv_im_ref[:])  # [1, 2B]

    y_ref[:] = out[:, :b] + overlap_ref[:]
    overlap_out[:] = out[:, b:]
    cur_out[0] = jnp.where(cur > 0, cur - 1, n - 1)


def _unpack_words(w):
    """Exact f32 (re, im) planes from packed words — two lane-local
    integer ops + free bitcasts (bf16 -> f32 is zero-extension); no
    sublane re-tiling (the separate-plane bf16 cast's cost)."""
    re = pltpu.bitcast(w & jnp.uint32(0xFFFF0000), jnp.float32)
    im = pltpu.bitcast(w << 16, jnp.float32)
    return re, im


def _kernel_packed(n: int, b: int,
                   x_ref, seg_w_ref, ir2_w_ref,
                   overlap_ref, cur_ref, fwd_ref, inv_re_ref, inv_im_ref,
                   y_ref, spec_re_out, spec_im_out, overlap_out, cur_out):
    """:func:`_kernel` over bf16-packed ring + IR table (half the HBM
    traffic of the f32 step — the step is DMA-bound at large N).  Same
    read-only-segments contract; the stale-row correction uses the fresh
    f32 spectrum, so the current block's direct term is f32-exact and
    only the N-1 history terms carry bf16 rounding."""
    cur = cur_ref[0]

    spec = _dot(x_ref[:], fwd_ref[:])   # [1, 2B] -> re | im halves
    spec_re, spec_im = spec[:, :b], spec[:, b:]
    spec_re_out[:] = spec_re
    spec_im_out[:] = spec_im

    roll0 = n - cur
    r_re, r_im = _unpack_words(ir2_w_ref[pl.ds(roll0, n), :])
    s_re, s_im = _unpack_words(seg_w_ref[:])
    rr = jnp.sum(s_re * r_re, axis=0, keepdims=True)   # [1, B]
    ii = jnp.sum(s_im * r_im, axis=0, keepdims=True)
    ri = jnp.sum(s_re * r_im, axis=0, keepdims=True)
    ir_ = jnp.sum(s_im * r_re, axis=0, keepdims=True)

    st_re, st_im = _unpack_words(seg_w_ref[pl.ds(cur, 1), :])
    d_re = spec_re - st_re
    d_im = spec_im - st_im
    ir0_re, ir0_im = _unpack_words(ir2_w_ref[pl.ds(0, 1), :])
    rr = rr + d_re * ir0_re
    ii = ii + d_im * ir0_im
    ri = ri + d_re * ir0_im
    ir_ = ir_ + d_im * ir0_re

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)
    m0 = (lane == 0).astype(jnp.float32)
    conv_re = rr - ii * (1.0 - m0)
    conv_im = (ri + ir_) * (1.0 - m0) + ii * m0

    out = _dot(conv_re, inv_re_ref[:]) + _dot(conv_im, inv_im_ref[:])

    y_ref[:] = out[:, :b] + overlap_ref[:]
    overlap_out[:] = out[:, b:]
    cur_out[0] = jnp.where(cur > 0, cur - 1, n - 1)


@functools.lru_cache(maxsize=None)
def _build_call_packed(n: int, b: int, interpret: bool):
    kernel = functools.partial(_kernel_packed, n, b)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, b), jnp.float32),    # y
            jax.ShapeDtypeStruct((1, b), jnp.float32),    # spec_re
            jax.ShapeDtypeStruct((1, b), jnp.float32),    # spec_im
            jax.ShapeDtypeStruct((1, b), jnp.float32),    # overlap
            jax.ShapeDtypeStruct((1,), jnp.int32),        # current
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),        # x
            pl.BlockSpec(memory_space=pltpu.VMEM),        # seg_w
            pl.BlockSpec(memory_space=pltpu.VMEM),        # ir2_w
            pl.BlockSpec(memory_space=pltpu.VMEM),        # overlap
            pl.BlockSpec(memory_space=pltpu.SMEM),        # current
            pl.BlockSpec(memory_space=pltpu.VMEM),        # fwd half basis
            pl.BlockSpec(memory_space=pltpu.VMEM),        # inv re basis
            pl.BlockSpec(memory_space=pltpu.VMEM),        # inv im basis
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=interpret,
    )


def block_step_packed(cfg: UniformConfig, consts: PallasFDLConstsPacked,
                      pstate: PallasFDLStatePacked, x: jnp.ndarray,
                      interpret: bool = False
                      ) -> Tuple[PallasFDLStatePacked, jnp.ndarray]:
    """Fused single-block step over packed storage; ring write packs the
    fresh spectrum to bf16 outside the kernel (lane-local ops)."""
    from .packing import pack_c32

    call = _build_call_packed(cfg.seg_count, cfg.block_size, interpret)
    cur = pstate.current[0]
    y, spec_re, spec_im, overlap, current = call(
        x[None], pstate.seg_w, consts.ir2_w,
        pstate.overlap, pstate.current, consts.fwd_half, consts.inv_re,
        consts.inv_im,
    )
    seg_w = jax.lax.dynamic_update_slice(
        pstate.seg_w, pack_c32(spec_re, spec_im), (cur, 0)
    )
    return PallasFDLStatePacked(seg_w, overlap, current), y[0]


@functools.lru_cache(maxsize=None)
def _build_call(n: int, b: int, interpret: bool):
    kernel = functools.partial(_kernel, n, b)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, b), jnp.float32),    # y
            jax.ShapeDtypeStruct((1, b), jnp.float32),    # spec_re
            jax.ShapeDtypeStruct((1, b), jnp.float32),    # spec_im
            jax.ShapeDtypeStruct((1, b), jnp.float32),    # overlap
            jax.ShapeDtypeStruct((1,), jnp.int32),        # current
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),        # x
            pl.BlockSpec(memory_space=pltpu.VMEM),        # seg_re
            pl.BlockSpec(memory_space=pltpu.VMEM),        # seg_im
            pl.BlockSpec(memory_space=pltpu.VMEM),        # ir2_re
            pl.BlockSpec(memory_space=pltpu.VMEM),        # ir2_im
            pl.BlockSpec(memory_space=pltpu.VMEM),        # overlap
            pl.BlockSpec(memory_space=pltpu.SMEM),        # current
            pl.BlockSpec(memory_space=pltpu.VMEM),        # fwd half basis
            pl.BlockSpec(memory_space=pltpu.VMEM),        # inv re basis
            pl.BlockSpec(memory_space=pltpu.VMEM),        # inv im basis
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=interpret,
    )


def block_step(cfg: UniformConfig, consts: PallasFDLConsts,
               pstate: PallasFDLState, x: jnp.ndarray,
               interpret: bool = False) -> Tuple[PallasFDLState, jnp.ndarray]:
    """Fused single-block step.  Precondition: full ring
    (``active_segs == seg_count``); the IR tables in ``consts`` define the
    response, so ``update()`` = rebuild consts (allocation-free swap)."""
    call = _build_call(cfg.seg_count, cfg.block_size, interpret)
    cur = pstate.current[0]
    y, spec_re, spec_im, overlap, current = call(
        x[None], pstate.seg_re, pstate.seg_im, consts.ir2_re, consts.ir2_im,
        pstate.overlap, pstate.current, consts.fwd_half, consts.inv_re,
        consts.inv_im,
    )
    # one-row ring write, in place under jit (donated buffers alias)
    seg_re = jax.lax.dynamic_update_slice(pstate.seg_re, spec_re, (cur, 0))
    seg_im = jax.lax.dynamic_update_slice(pstate.seg_im, spec_im, (cur, 0))
    return PallasFDLState(seg_re, seg_im, overlap, current), y[0]
