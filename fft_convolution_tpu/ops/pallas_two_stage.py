"""Pallas fused two-stage block step: head + tail0 in one kernel.

The two-stage engine's head and tail0 convolvers run at the SAME block size
over the SAME input (IR slices ``[0,T)`` and ``[T,2T)``,
``src/fft_convolver.rs:352-368``), so they share one input-spectra ring:
the reference (and the jnp engine) stores that ring twice and transforms
the input twice.  This kernel does, per block, in one dispatch:

* one forward DFT (``[1,B] @ [B,2B]`` on the MXU),
* one gather-free rolled-IR MAC per stage against the SHARED ring
  (stale-row corrected, as in ``pallas_engine``),
* two inverse DFTs,
* the head overlap-add PLUS the two precalculated-tail adds
  (``src/fft_convolver.rs:439-456``) — so ``y`` leaves the kernel finished,
* tail0's overlap-add into its period-buffer row.

The big-tail convolution every ``period`` blocks and the double-buffer swap
stay outside (they are rare and large); see ``serving.PallasTwoStageConvolver``.

Preconditions: full clean shared ring (``active == seg_count`` on both
stages — true from init by construction) and VMEM-resident working set.
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
from .pallas_engine import _VMEM_BUDGET, _dot


def fits_vmem(n: int, b: int, period: int) -> bool:
    """VMEM estimate for the fused head+tail0 kernel's working set:
    shared ring (2 planes), two doubled IR tables (4 planes of [2N, B]),
    3 basis halves of [B, 2B], and the two precalc period buffers."""
    working = 2 * n * b * 4            # shared seg ring (re + im)
    working += 4 * 2 * n * b * 4       # head + tail0 doubled IR tables
    working += 3 * b * (2 * b) * 4     # fwd_half, inv_re, inv_im bases
    working += 2 * period * b * 4      # precalc0 + precalc inputs
    return working < _VMEM_BUDGET


class FusedHeadState(NamedTuple):
    seg_re: jnp.ndarray       # f32 [N, B] shared input-spectra ring (re)
    seg_im: jnp.ndarray       # f32 [N, B]
    head_overlap: jnp.ndarray  # f32 [1, B]
    t0_overlap: jnp.ndarray    # f32 [1, B]
    current: jnp.ndarray       # i32 [1]


class FusedHeadConsts(NamedTuple):
    h_ir2_re: jnp.ndarray     # f32 [2N, B] doubled head IR spectra
    h_ir2_im: jnp.ndarray
    t_ir2_re: jnp.ndarray     # f32 [2N, B] doubled tail0 IR spectra
    t_ir2_im: jnp.ndarray
    fwd_half: jnp.ndarray     # f32 [B, 2B]
    inv_re: jnp.ndarray       # f32 [B, 2B]
    inv_im: jnp.ndarray       # f32 [B, 2B]


def _mac(n, b, s_re, s_im, ir2_re_ref, ir2_im_ref, cur,
         spec_re, spec_im, d_re, d_im):
    """Rolled-IR MAC over the shared ring + stale-row correction
    (see pallas_engine._kernel for the derivation)."""
    roll0 = n - cur
    r_re = ir2_re_ref[pl.ds(roll0, n), :]
    r_im = ir2_im_ref[pl.ds(roll0, n), :]
    rr = jnp.sum(s_re * r_re, axis=0, keepdims=True)
    ii = jnp.sum(s_im * r_im, axis=0, keepdims=True)
    ri = jnp.sum(s_re * r_im, axis=0, keepdims=True)
    ir_ = jnp.sum(s_im * r_re, axis=0, keepdims=True)
    ir0_re = ir2_re_ref[pl.ds(0, 1), :]
    ir0_im = ir2_im_ref[pl.ds(0, 1), :]
    rr = rr + d_re * ir0_re
    ii = ii + d_im * ir0_im
    ri = ri + d_re * ir0_im
    ir_ = ir_ + d_im * ir0_re
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)
    m0 = (lane == 0).astype(jnp.float32)
    conv_re = rr - ii * (1.0 - m0)
    conv_im = (ri + ir_) * (1.0 - m0) + ii * m0
    return conv_re, conv_im


def _kernel(n: int, b: int,
            x_ref, seg_re_ref, seg_im_ref,
            h_ir2_re, h_ir2_im, t_ir2_re, t_ir2_im,
            h_ov_ref, t_ov_ref, cur_ref, pos_ref,
            pre0_ref, pre_ref,
            fwd_ref, inv_re_ref, inv_im_ref,
            y_ref, out0_ref, spec_re_out, spec_im_out,
            h_ov_out, t_ov_out, cur_out):
    cur = cur_ref[0]
    row = pos_ref[0]

    spec = _dot(x_ref[:], fwd_ref[:])
    spec_re, spec_im = spec[:, :b], spec[:, b:]
    spec_re_out[:] = spec_re
    spec_im_out[:] = spec_im

    s_re = seg_re_ref[:]
    s_im = seg_im_ref[:]
    d_re = spec_re - seg_re_ref[pl.ds(cur, 1), :]
    d_im = spec_im - seg_im_ref[pl.ds(cur, 1), :]

    h_conv_re, h_conv_im = _mac(n, b, s_re, s_im, h_ir2_re, h_ir2_im,
                                cur, spec_re, spec_im, d_re, d_im)
    t_conv_re, t_conv_im = _mac(n, b, s_re, s_im, t_ir2_re, t_ir2_im,
                                cur, spec_re, spec_im, d_re, d_im)

    h_out = _dot(h_conv_re, inv_re_ref[:]) + _dot(h_conv_im, inv_im_ref[:])
    t_out = _dot(t_conv_re, inv_re_ref[:]) + _dot(t_conv_im, inv_im_ref[:])

    # finished head output: overlap-add + both precalculated tails at the
    # current period row (src/fft_convolver.rs:439-456)
    y_ref[:] = (h_out[:, :b] + h_ov_ref[:]
                + pre0_ref[pl.ds(row, 1), :] + pre_ref[pl.ds(row, 1), :])
    h_ov_out[:] = h_out[:, b:]

    out0_ref[:] = t_out[:, :b] + t_ov_ref[:]
    t_ov_out[:] = t_out[:, b:]

    cur_out[0] = jnp.where(cur > 0, cur - 1, n - 1)


@functools.lru_cache(maxsize=None)
def _build_call(n: int, b: int, interpret: bool):
    kernel = functools.partial(_kernel, n, b)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, b), jnp.float32),   # y (finished)
            jax.ShapeDtypeStruct((1, b), jnp.float32),   # out0 row
            jax.ShapeDtypeStruct((1, b), jnp.float32),   # spec_re
            jax.ShapeDtypeStruct((1, b), jnp.float32),   # spec_im
            jax.ShapeDtypeStruct((1, b), jnp.float32),   # head overlap'
            jax.ShapeDtypeStruct((1, b), jnp.float32),   # tail0 overlap'
            jax.ShapeDtypeStruct((1,), jnp.int32),       # current'
        ),
        in_specs=[vmem, vmem, vmem, vmem, vmem, vmem, vmem,
                  vmem, vmem, smem, smem, vmem, vmem, vmem, vmem, vmem],
        out_specs=(vmem, vmem, vmem, vmem, vmem, vmem, smem),
        interpret=interpret,
    )


def build_consts(head_ir_spec: jnp.ndarray, tail0_ir_spec: jnp.ndarray,
                 b: int) -> FusedHeadConsts:
    """``head_ir_spec``/``tail0_ir_spec``: packed [N, 2, B] partition spectra
    of ``ir[0:T]`` and ``ir[T:2T]`` at the head block size."""
    fwd = np.asarray(_rdft_basis(2 * b))
    inv = np.asarray(_irdft_basis(2 * b))

    def doubled(spec, plane):
        p = spec[:, plane]
        return jnp.concatenate([p, p], axis=0)

    return FusedHeadConsts(
        h_ir2_re=doubled(head_ir_spec, 0), h_ir2_im=doubled(head_ir_spec, 1),
        t_ir2_re=doubled(tail0_ir_spec, 0), t_ir2_im=doubled(tail0_ir_spec, 1),
        fwd_half=jnp.asarray(fwd[:b]),
        inv_re=jnp.asarray(inv[:b]),
        inv_im=jnp.asarray(inv[b:]),
    )


def block_step(n: int, b: int, consts: FusedHeadConsts, state: FusedHeadState,
               x: jnp.ndarray, pos_row: jnp.ndarray,
               precalc0: jnp.ndarray, precalc: jnp.ndarray,
               interpret: bool = False
               ) -> Tuple[FusedHeadState, jnp.ndarray, jnp.ndarray]:
    """One fused head+tail0 step.  ``precalc0``/``precalc`` are the period
    buffers viewed as [period, B]; ``pos_row`` is the intra-period row.
    Returns (state', finished y, tail0 output row)."""
    call = _build_call(n, b, interpret)
    cur = state.current[0]
    y, out0, spec_re, spec_im, h_ov, t_ov, cur2 = call(
        x[None], state.seg_re, state.seg_im,
        consts.h_ir2_re, consts.h_ir2_im, consts.t_ir2_re, consts.t_ir2_im,
        state.head_overlap, state.t0_overlap, state.current, pos_row[None],
        precalc0, precalc,
        consts.fwd_half, consts.inv_re, consts.inv_im,
    )
    seg_re = jax.lax.dynamic_update_slice(state.seg_re, spec_re, (cur, 0))
    seg_im = jax.lax.dynamic_update_slice(state.seg_im, spec_im, (cur, 0))
    return FusedHeadState(seg_re, seg_im, h_ov, t_ov, cur2), y[0], out0[0]
