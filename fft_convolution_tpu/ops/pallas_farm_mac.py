"""Pallas kernel for the reverb farm's phased big-tail MAC.

The farm tail core (:func:`parallel.farm2._tail_corr_phased_fused`) spends
nearly all its time in

    acc[t] = sum_x  U[x] (*) ext2[q + t + x],      t = 0 .. T-1

over planes-outer fused-voice operands ``U [2, N, VB]`` (input-spectra
ring) and ``ext2 [2, 2N+E, VB]`` (doubled periodic IR table) — a pure
HBM-bandwidth problem: ~3 GB of ring + ~3 GB of table window per call at
production voice counts.  XLA lowers the jnp formulation as one
multi-pass reduction PER STEP (t=0 and t=1 each re-read both operands,
and the product/reduce pair splits into further passes) — measured 76 ms
at V=131 against an ~8 ms single-pass floor.

This kernel makes exactly ONE pass: the grid walks lane chunks of the
fused ``V*B`` axis; per chunk the ring block arrives via the normal
Pallas pipeline (static index map) while the phase-offset table window
``ext2[:, q : q + N + T - 1]`` is DMA'd with an explicitly double-buffered
async copy (the window start ``q`` is a runtime scalar, which BlockSpec
index maps cannot express at element granularity).  All T outputs are
accumulated from the single resident window — the per-step views
``window[t : t + N]`` are VMEM sublane slices, not HBM re-reads.

Mosaic alignment rules shape the implementation (all hit in practice):
DMA offsets and sizes on the sublane dim must be multiples of 8 — the
copy starts at the aligned row below the phase and the in-VMEM reads
shift by the residue; dynamic sublane loads want 2-D refs (the window
scratch is a per-plane ``[2*rows, L]`` buffer with the slot folded into
the row offset) and 8-multiple sizes (``N`` must be a multiple of 8 —
``farm2_init`` pads the tail with live-but-silent zero segments,
reference padding semantics ``src/fft_convolver.rs:111-118``).

The DC/Nyquist lane-0 packing correction (ops/cpx.py) is applied in-kernel
per voice: lane ``g`` is a DC lane iff ``g % B == 0`` in the fused axis.

Used by :func:`parallel.farm2.farm2_stream` on TPU (opt-in flag); the jnp
core remains the portable reference (tests compare both, interpret mode on
CPU).  Reference hot-loop contract this accelerates:
``src/fft_convolver.rs:244-261`` (the per-block spectral MAC), batched
over voices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _window_rows(n: int, t_blocks: int, sub: int) -> int:
    """Rows per DMA'd window: the ``N + T - 1`` needed, plus up to
    ``sub - 1`` lead rows for the aligned start, rounded to the sublane
    DMA tile (8 rows for f32, 16 for bf16)."""
    return -(-(n + t_blocks - 1 + sub - 1) // sub) * sub


def _kernel(n: int, t_blocks: int, b_voice: int, l: int, sub: int,
            q_ref,                       # SMEM in
            u_ref,                       # VMEM in (pipelined [2, N, L] block)
            ext2_hbm,                    # ANY in (HBM table)
            out_ref,                     # VMEM out ([T, 2, L] block)
            wr_buf, wi_buf, sem):        # scratch
    j = pl.program_id(0)
    nj = pl.num_programs(0)
    rows = _window_rows(n, t_blocks, sub)
    q = q_ref[0]
    q0 = (q // sub) * sub
    d = q - q0

    def window_copy(jj, slot, plane, buf):
        return pltpu.make_async_copy(
            ext2_hbm.at[plane, pl.ds(q0, rows), pl.ds(jj * l, l)],
            buf.at[pl.ds(slot * rows, rows)],
            sem.at[slot, plane],
        )

    def start(jj, slot):
        window_copy(jj, slot, 0, wr_buf).start()
        window_copy(jj, slot, 1, wi_buf).start()

    slot = jax.lax.rem(j, 2)

    @pl.when(j == 0)
    def _():
        start(0, 0)

    @pl.when(j + 1 < nj)
    def _():
        start(j + 1, jax.lax.rem(j + 1, 2))

    window_copy(j, slot, 0, wr_buf).wait()
    window_copy(j, slot, 1, wi_buf).wait()

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, l), 1) + j * l
    m0 = (jax.lax.rem(lane, b_voice) == 0).astype(jnp.float32)

    # Mosaic only proves alignment for tile-multiple sublane offsets, so
    # the residue shift ``d`` cannot appear in a load offset: load the
    # whole (aligned) window and rotate it up by ``d`` — pltpu.roll takes
    # a dynamic shift — leaving per-step views as STATIC sub-slices.
    # The rotate is 32-bit-only in Mosaic: cast AFTER the (possibly bf16)
    # load, before the roll — HBM/VMEM traffic stays at storage width.
    shift = rows - d  # == roll by -d, kept non-negative
    w_re = pltpu.roll(
        wr_buf[pl.ds(slot * rows, rows), :].astype(jnp.float32), shift, axis=0
    )
    w_im = pltpu.roll(
        wi_buf[pl.ds(slot * rows, rows), :].astype(jnp.float32), shift, axis=0
    )

    ur = u_ref[0].astype(jnp.float32)
    ui = u_ref[1].astype(jnp.float32)
    for t in range(t_blocks):
        wr = jax.lax.slice_in_dim(w_re, t, t + n, axis=0)
        wi = jax.lax.slice_in_dim(w_im, t, t + n, axis=0)
        cross = ui * wi
        re = jnp.sum(ur * wr - cross * (1.0 - m0), axis=0, keepdims=True)
        im = jnp.sum((ur * wi + ui * wr) * (1.0 - m0) + cross * m0,
                     axis=0, keepdims=True)
        out_ref[t, 0, :] = re[0]
        out_ref[t, 1, :] = im[0]


@functools.lru_cache(maxsize=None)
def _build_call(n: int, rows_total: int, vb: int, t_blocks: int,
                b_voice: int, l: int, dtype_name: str, interpret: bool):
    dtype = jnp.dtype(dtype_name)
    sub = 16 if dtype.itemsize == 2 else 8
    kernel = functools.partial(_kernel, n, t_blocks, b_voice, l, sub)
    grid = (vb // l,)
    rows = _window_rows(n, t_blocks, sub)
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((t_blocks, 2, vb), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                # q
            pl.BlockSpec((2, n, l), lambda j: (0, 0, j)),         # u
            pl.BlockSpec(memory_space=pl.ANY),                    # ext2 (HBM)
        ],
        out_specs=pl.BlockSpec((t_blocks, 2, l), lambda j: (0, 0, j)),
        scratch_shapes=[
            # double-buffered per-plane windows, slot folded into rows
            pltpu.VMEM((2 * rows, l), dtype),                     # re
            pltpu.VMEM((2 * rows, l), dtype),                     # im
            pltpu.SemaphoreType.DMA((2, 2)),                      # [slot, plane]
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )


def phased_mac(u: jnp.ndarray, ext2: jnp.ndarray, q: jnp.ndarray,
               t_blocks: int, b_voice: int, lane_block: int | None = None,
               interpret: bool = False) -> jnp.ndarray:
    """``acc[t] = sum_x u[:, x] (*) ext2[:, q + t + x]`` for t < t_blocks.

    ``u``: [2, N, VB] with ``N`` a multiple of 8 (``farm2_init`` pads);
    ``ext2``: [2, R, VB] doubled periodic table with enough row slack for
    the aligned window (asserted); ``q``: scalar i32 phase in [0, N);
    ``b_voice``: per-voice lane width B of the fused axis (DC-lane mask
    period).  Returns [t_blocks, 2, VB] packed sums.
    """
    _, n, vb = u.shape
    rows_total = ext2.shape[1]
    if lane_block is None:
        # 2048 measured best for BOTH storage widths (bf16 at 4096 was
        # 25% slower: the bf16->f32 cast is a sublane re-tiling whose cost
        # scales with the chunk, while DMA overhead does not dominate)
        lane_block = 2048
    l = min(lane_block, vb)
    assert u.dtype == ext2.dtype
    sub = 16 if u.dtype.itemsize == 2 else 8
    assert n % sub == 0, (
        f"seg_count {n} must be a multiple of {sub} for the {u.dtype} "
        "Pallas tail MAC (farm2_init pads the tail with zero segments)"
    )
    assert vb % l == 0, (
        f"fused lane axis {vb} must divide by the lane block {l} "
        f"(B={b_voice} is a multiple of any power-of-two block <= B)"
    )
    # max aligned copy start is ((n-1)//sub)*sub; over-copy stays in bounds
    assert rows_total >= ((n - 1) // sub) * sub + _window_rows(n, t_blocks, sub), (
        f"table rows {rows_total} too few for the aligned window "
        f"(n={n}, T={t_blocks})"
    )
    call = _build_call(n, rows_total, vb, t_blocks, b_voice, l,
                       u.dtype.name, interpret)
    return call(jnp.asarray(q, jnp.int32).reshape(1), u, ext2)
