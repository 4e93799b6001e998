"""Pallas fused A/B block-step kernel for low-latency IR morphing.

The crossfade wrapper (``src/crossfade_convolver.rs:66-78``) runs TWO
convolvers on the SAME input every block and mixes per sample.  Composed
naively over :mod:`ops.pallas_engine` that is two kernel dispatches with
two redundant copies of everything the input determines: both engines see
identical input-spectra rings and compute identical forward DFTs.  This
kernel runs the whole A/B step fused:

* ONE forward DFT (MXU) and ONE shared input ring serve both engines —
  only the doubled IR tables (A and B) and the OLA overlaps are per-engine;
* both frequency-delay-line MACs read the same resident ring rows
  (gather-free doubled-table pairing, as :mod:`ops.pallas_engine`);
* two inverse DFTs + overlap-adds produce ``ya``/``yb`` for the
  sample-accurate crossfader (mixed in jnp inside the same jitted step —
  a [B]-sized VPU epilogue XLA fuses with the state update).

Relative to two fused single-engine steps this saves one forward DFT, one
ring (memory AND the duplicate ring write), and one kernel dispatch; the
marginal cost over a single engine is one extra MAC + inverse DFT.

VMEM: ring + TWO doubled tables must be resident (:func:`fits_vmem`) —
the A/B ceiling is ~60% of the single-engine IR ceiling; longer IRs use
``CrossfadeConvolver(PallasFFTConvolver(...))`` (three dispatches) or the
jnp engines.

Reference contract: ``CrossfadeConvolver::process``
(``src/crossfade_convolver.rs:66-78``) — both convolvers always run —
over the hot loop ``src/fft_convolver.rs:215-295``.
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

_VMEM_BUDGET = 12 * 1024 * 1024


class XfadeState(NamedTuple):
    """Shared-ring A/B engine state (kernel layout, separate re/im planes)."""

    seg_re: jnp.ndarray     # f32 [N, B] shared input-spectra ring
    seg_im: jnp.ndarray     # f32 [N, B]
    overlap_a: jnp.ndarray  # f32 [1, B]
    overlap_b: jnp.ndarray  # f32 [1, B]
    current: jnp.ndarray    # i32 [1]


class XfadeConsts(NamedTuple):
    """Per-IR tables for both engines + shared pre-split DFT bases
    (see :class:`ops.pallas_engine.PallasFDLConsts` for the split)."""

    a2_re: jnp.ndarray     # f32 [2N, B] doubled IR spectra, engine A
    a2_im: jnp.ndarray
    b2_re: jnp.ndarray     # f32 [2N, B] engine B
    b2_im: jnp.ndarray
    fwd_half: jnp.ndarray  # f32 [B, 2B]
    inv_re: jnp.ndarray    # f32 [B, 2B]
    inv_im: jnp.ndarray    # f32 [B, 2B]


def fits_vmem(cfg: UniformConfig) -> bool:
    n, b = cfg.seg_count, cfg.block_size
    working = (2 * n * b + 2 * 2 * 2 * n * b) * 4  # ring + two doubled tables
    working += 3 * b * (2 * b) * 4                 # pre-split DFT bases
    return working < _VMEM_BUDGET


def build_consts(ir_spec_a: jnp.ndarray, ir_spec_b: jnp.ndarray,
                 b: int) -> XfadeConsts:
    """From two ``[N, 2, B]`` packed IR spectra tables (uniform-engine
    layout, same N — the shared-ring precondition)."""
    assert ir_spec_a.shape == ir_spec_b.shape
    fwd = np.asarray(_rdft_basis(2 * b))
    inv = np.asarray(_irdft_basis(2 * b))

    def doubled(spec, plane):
        p = spec[:, plane]
        return jnp.concatenate([p, p], axis=0)

    return XfadeConsts(
        a2_re=doubled(ir_spec_a, 0), a2_im=doubled(ir_spec_a, 1),
        b2_re=doubled(ir_spec_b, 0), b2_im=doubled(ir_spec_b, 1),
        fwd_half=jnp.asarray(fwd[:b]),
        inv_re=jnp.asarray(inv[:b]),
        inv_im=jnp.asarray(inv[b:]),
    )


def zero_state(n: int, b: int) -> XfadeState:
    return XfadeState(
        seg_re=jnp.zeros((n, b), jnp.float32),
        seg_im=jnp.zeros((n, b), jnp.float32),
        overlap_a=jnp.zeros((1, b), jnp.float32),
        overlap_b=jnp.zeros((1, b), jnp.float32),
        current=jnp.zeros((1,), jnp.int32),
    )


def from_uniform(cfg: UniformConfig, state_a: UniformState,
                 state_b: UniformState) -> Tuple[XfadeConsts, XfadeState]:
    """Kernel layout from two same-config uniform engine states (fresh —
    the shared ring assumes both engines saw the same input history, which
    holds by construction for the crossfade wrapper)."""
    consts = build_consts(state_a.segments_ir, state_b.segments_ir,
                          cfg.block_size)
    return consts, XfadeState(
        seg_re=state_a.segments[:, 0],
        seg_im=state_a.segments[:, 1],
        overlap_a=state_a.overlap[None],
        overlap_b=state_b.overlap[None],
        current=state_a.current[None],
    )


def _dot(a, b):
    return jax.lax.dot_general(
        a, b,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _kernel(n: int, b: int,
            x_ref, seg_re_ref, seg_im_ref,
            a2_re_ref, a2_im_ref, b2_re_ref, b2_im_ref,
            ov_a_ref, ov_b_ref, cur_ref, fwd_ref, inv_re_ref, inv_im_ref,
            ya_ref, yb_ref, spec_re_out, spec_im_out,
            ov_a_out, ov_b_out, cur_out):
    """One shared forward DFT + ring; two MAC/inverse/OLA pipelines.  The
    ring is read-only in-kernel (aliased outputs get fresh VMEM on
    hardware — ops/pallas_engine.py documents the stale-row algebra); the
    caller does the one-row ring write on the donated buffer."""
    cur = cur_ref[0]

    spec = _dot(x_ref[:], fwd_ref[:])   # [1, 2B]
    spec_re, spec_im = spec[:, :b], spec[:, b:]
    spec_re_out[:] = spec_re
    spec_im_out[:] = spec_im

    s_re = seg_re_ref[:]
    s_im = seg_im_ref[:]
    d_re = spec_re - seg_re_ref[pl.ds(cur, 1), :]
    d_im = spec_im - seg_im_ref[pl.ds(cur, 1), :]
    roll0 = n - cur
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)
    m0 = (lane == 0).astype(jnp.float32)

    def engine(ir2_re_ref, ir2_im_ref, ov_ref, y_ref, ov_out):
        r_re = ir2_re_ref[pl.ds(roll0, n), :]
        r_im = ir2_im_ref[pl.ds(roll0, n), :]
        rr = jnp.sum(s_re * r_re, axis=0, keepdims=True)   # [1, B]
        ii = jnp.sum(s_im * r_im, axis=0, keepdims=True)
        ri = jnp.sum(s_re * r_im, axis=0, keepdims=True)
        ir_ = jnp.sum(s_im * r_re, axis=0, keepdims=True)
        ir0_re = ir2_re_ref[pl.ds(0, 1), :]
        ir0_im = ir2_im_ref[pl.ds(0, 1), :]
        rr = rr + d_re * ir0_re
        ii = ii + d_im * ir0_im
        ri = ri + d_re * ir0_im
        ir_ = ir_ + d_im * ir0_re
        conv_re = rr - ii * (1.0 - m0)
        conv_im = (ri + ir_) * (1.0 - m0) + ii * m0
        out = _dot(conv_re, inv_re_ref[:]) + _dot(conv_im, inv_im_ref[:])
        y_ref[:] = out[:, :b] + ov_ref[:]
        ov_out[:] = out[:, b:]

    engine(a2_re_ref, a2_im_ref, ov_a_ref, ya_ref, ov_a_out)
    engine(b2_re_ref, b2_im_ref, ov_b_ref, yb_ref, ov_b_out)
    cur_out[0] = jnp.where(cur > 0, cur - 1, n - 1)


@functools.lru_cache(maxsize=None)
def _build_call(n: int, b: int, interpret: bool):
    kernel = functools.partial(_kernel, n, b)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, b), jnp.float32),    # ya
            jax.ShapeDtypeStruct((1, b), jnp.float32),    # yb
            jax.ShapeDtypeStruct((1, b), jnp.float32),    # spec_re
            jax.ShapeDtypeStruct((1, b), jnp.float32),    # spec_im
            jax.ShapeDtypeStruct((1, b), jnp.float32),    # overlap_a
            jax.ShapeDtypeStruct((1, b), jnp.float32),    # overlap_b
            jax.ShapeDtypeStruct((1,), jnp.int32),        # current
        ),
        in_specs=[vmem] * 9 + [smem] + [vmem] * 3,
        out_specs=(vmem, vmem, vmem, vmem, vmem, vmem, smem),
        interpret=interpret,
    )


def block_step(cfg: UniformConfig, consts: XfadeConsts, state: XfadeState,
               x: jnp.ndarray, interpret: bool = False
               ) -> Tuple[XfadeState, jnp.ndarray, jnp.ndarray]:
    """Fused A/B single-block step: ``(state', ya, yb)``.  Precondition:
    full shared ring (both engines initialized at full segment count, as
    the crossfade wrapper's update contract guarantees)."""
    call = _build_call(cfg.seg_count, cfg.block_size, interpret)
    cur = state.current[0]
    ya, yb, spec_re, spec_im, ov_a, ov_b, current = call(
        x[None], state.seg_re, state.seg_im,
        consts.a2_re, consts.a2_im, consts.b2_re, consts.b2_im,
        state.overlap_a, state.overlap_b, state.current,
        consts.fwd_half, consts.inv_re, consts.inv_im,
    )
    seg_re = jax.lax.dynamic_update_slice(state.seg_re, spec_re, (cur, 0))
    seg_im = jax.lax.dynamic_update_slice(state.seg_im, spec_im, (cur, 0))
    return XfadeState(seg_re, seg_im, ov_a, ov_b, current), ya[0], yb[0]
