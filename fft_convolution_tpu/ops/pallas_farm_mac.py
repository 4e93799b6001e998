"""Pallas kernel for the reverb farm's phased big-tail step.

The farm tail core (:func:`parallel.farm2._tail_corr_phased_fused`)
computes, over planes-outer fused-voice operands ``U [2, N, VB]``
(input-spectra ring) and ``ext2 [2, 2N+E, VB]`` (doubled periodic IR
table),

    conv[t] = sum_x U[x] (*) ext2[q + t + x]
            + sum_{s<=t} (spec[s] - U[row_s]) (*) ext2[t - s]
    pre     = conv[T-1] - spec[T-1] (*) ext2[0]

— a pure HBM-bandwidth problem: ~3 GB of ring + ~3 GB of table window per
call at production voice counts.  Two XLA lowerings of the jnp
formulation motivated this kernel (both measured at V=128):

* the base sums lower as multi-pass reductions PER STEP — 76 ms against
  an ~8 ms single-pass floor;
* the correction terms' single-ROW reads of the (8,128)-tiled big arrays
  are 8x-amplified (one row of a tile touches the whole 8-sublane tile)
  — ~6.7 ms of ``[VB]``-shaped reduce fusions in the HLO cost model.

The kernel does the WHOLE step: the grid walks lane chunks of the fused
``V*B`` axis; per chunk the ring and spec blocks arrive via the normal
Pallas pipeline while the phase-offset table window
``ext2[:, q : q + N + T - 1]`` and the table head rows ``ext2[:, :sub]``
are DMA'd double-buffered (the window start ``q`` is a runtime scalar,
which BlockSpec index maps cannot express at element granularity).  All
T outputs and the ``pre`` accumulator come from the single resident
window; the correction terms' ring rows are mask-reduced out of the
already-resident ring block (one cheap VPU pass instead of an amplified
HBM read).

Mosaic rules that shape the implementation (all hit in practice): DMA
offsets and sizes on the sublane dim must be tile-multiples (8 rows f32 /
16 bf16) — the copy starts at the aligned row below the phase and the
loaded window rotates by the residue (``pltpu.roll``, 32-bit only, so
bf16 casts after the load); dynamic sublane loads want 2-D refs
(per-plane ``[2*rows, L]`` scratch, slot folded into the row offset) and
tile-multiple sizes (``N`` is padded by ``farm2_init`` with
live-but-silent zero segments, reference padding semantics
``src/fft_convolver.rs:111-118``).

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
            specs_ref,                   # VMEM in (pipelined [T, 2, L] block)
            ext2_hbm,                    # ANY in (HBM table)
            out_ref,                     # VMEM out ([T, 2, L] block)
            pre_ref,                     # VMEM out ([2, L] block)
            wr_buf, wi_buf, khr_buf, khi_buf, sem):  # scratch
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

    def khead_copy(jj, slot, plane, buf):
        return pltpu.make_async_copy(
            ext2_hbm.at[plane, pl.ds(0, sub), pl.ds(jj * l, l)],
            buf.at[pl.ds(slot * sub, sub)],
            sem.at[slot, 2 + plane],
        )

    def start(jj, slot):
        window_copy(jj, slot, 0, wr_buf).start()
        window_copy(jj, slot, 1, wi_buf).start()
        khead_copy(jj, slot, 0, khr_buf).start()
        khead_copy(jj, slot, 1, khi_buf).start()

    slot = jax.lax.rem(j, 2)

    @pl.when(j == 0)
    def _():
        start(0, 0)

    @pl.when(j + 1 < nj)
    def _():
        start(j + 1, jax.lax.rem(j + 1, 2))

    window_copy(j, slot, 0, wr_buf).wait()
    window_copy(j, slot, 1, wi_buf).wait()
    khead_copy(j, slot, 0, khr_buf).wait()
    khead_copy(j, slot, 1, khi_buf).wait()

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, l), 1)[0] + j * l
    m0 = (jax.lax.rem(lane, b_voice) == 0).astype(jnp.float32)
    m1 = 1.0 - m0

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
    kh_re = khr_buf[pl.ds(slot * sub, sub), :].astype(jnp.float32)
    kh_im = khi_buf[pl.ds(slot * sub, sub), :].astype(jnp.float32)

    ur = u_ref[0].astype(jnp.float32)
    ui = u_ref[1].astype(jnp.float32)
    riota = jax.lax.broadcasted_iota(jnp.int32, (n, l), 0)
    for t in range(t_blocks):
        wr = jax.lax.slice_in_dim(w_re, t, t + n, axis=0)
        wi = jax.lax.slice_in_dim(w_im, t, t + n, axis=0)
        cross = ui * wi
        re = jnp.sum(ur * wr - cross * m1, axis=0)
        im = jnp.sum((ur * wi + ui * wr) * m1 + cross * m0, axis=0)
        for s in range(t + 1):
            # double-rem: n - q - s can go negative for larger T and
            # lax.rem keeps the sign (jnp.mod semantics needed)
            row_s = jax.lax.rem(jax.lax.rem(n - q - s, n) + n, n)
            # the ring row about to be overwritten, mask-reduced out of
            # the resident block (an HBM row read would be 8x-amplified
            # by tiling, and a dynamic sublane load needs alignment)
            mask = (riota == row_s).astype(jnp.float32)
            dre = specs_ref[s, 0, :] - jnp.sum(ur * mask, axis=0)
            dim = specs_ref[s, 1, :] - jnp.sum(ui * mask, axis=0)
            kr = kh_re[t - s]
            ki = kh_im[t - s]
            crossd = dim * ki
            re = re + dre * kr - crossd * m1
            im = im + (dre * ki + dim * kr) * m1 + crossd * m0
        out_ref[t, 0, :] = re
        out_ref[t, 1, :] = im
        if t == t_blocks - 1:
            sr = specs_ref[t, 0, :]
            si = specs_ref[t, 1, :]
            cross0 = si * kh_im[0]
            pre_ref[0, :] = re - (sr * kh_re[0] - cross0 * m1)
            pre_ref[1, :] = im - ((sr * kh_im[0] + si * kh_re[0]) * m1
                                  + cross0 * m0)


def _unpack_words(w):
    """Exact f32 (re, im) from plane-packed bf16 words (ops/packing.py):
    two lane-local integer ops + free bitcasts — no sublane re-tiling,
    which is the whole point of the packed storage (the bf16->f32
    ``astype`` is a (16,128)->(8,128) re-tiling whose cost scales with
    the window)."""
    re = pltpu.bitcast(w & jnp.uint32(0xFFFF0000), jnp.float32)
    im = pltpu.bitcast(w << 16, jnp.float32)
    return re, im


def _kernel_v2(n: int, t_blocks: int, b_voice: int, l: int, sub: int,
               q_ref,                       # SMEM in
               u_ref,                       # VMEM in ([2N, L] planes-folded)
               specs_ref,                   # VMEM in (pipelined [T, 2, L])
               ext2_hbm,                    # ANY in (HBM table)
               out_ref,                     # VMEM out ([T, 2, L])
               pre_ref,                     # VMEM out ([2, L])
               wr_buf, wi_buf, khr_buf, khi_buf, sem):  # scratch
    """VPU-lean variant of :func:`_kernel` (same DMA schedule, same math):

    * the DC-lane masks ``m0``/``m1`` are row-independent, so they factor
      OUT of the ``[n, l]`` reductions — three plain product sums
      (``S1 = Σ ur·wr``, ``S2 = Σ ui·wi``, ``S3 = Σ (ur·wi + ui·wr)``)
      and an O(l) postfix replace per-element mask multiplies (v1 spent
      ~12 VPU ops/element; this spends 8);
    * each correction's ring row comes from a dynamic single-row read of
      the resident ring block (``u_ref[pl.ds(row_s, 1)]`` — the pattern
      ``ops/pallas_engine.py`` serves with) instead of an O(n·l)
      mask-reduction pass per (t, s) term, which at T=2 cost MORE VPU
      work than the main MAC itself.  The ring ref is planes-FOLDED
      ``[2N, L]`` because Mosaic's dynamic sublane loads want 2-D refs
      (module docstring): plane p row r lives at row ``p*n + r``.
    """
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

    def khead_copy(jj, slot, plane, buf):
        return pltpu.make_async_copy(
            ext2_hbm.at[plane, pl.ds(0, sub), pl.ds(jj * l, l)],
            buf.at[pl.ds(slot * sub, sub)],
            sem.at[slot, 2 + plane],
        )

    def start(jj, slot):
        window_copy(jj, slot, 0, wr_buf).start()
        window_copy(jj, slot, 1, wi_buf).start()
        khead_copy(jj, slot, 0, khr_buf).start()
        khead_copy(jj, slot, 1, khi_buf).start()

    slot = jax.lax.rem(j, 2)

    @pl.when(j == 0)
    def _():
        start(0, 0)

    @pl.when(j + 1 < nj)
    def _():
        start(j + 1, jax.lax.rem(j + 1, 2))

    window_copy(j, slot, 0, wr_buf).wait()
    window_copy(j, slot, 1, wi_buf).wait()
    khead_copy(j, slot, 0, khr_buf).wait()
    khead_copy(j, slot, 1, khi_buf).wait()

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, l), 1)[0] + j * l
    m0 = (jax.lax.rem(lane, b_voice) == 0).astype(jnp.float32)
    m1 = 1.0 - m0

    shift = rows - d  # == roll by -d, kept non-negative
    w_re = pltpu.roll(
        wr_buf[pl.ds(slot * rows, rows), :].astype(jnp.float32), shift, axis=0
    )
    w_im = pltpu.roll(
        wi_buf[pl.ds(slot * rows, rows), :].astype(jnp.float32), shift, axis=0
    )
    kh_re = khr_buf[pl.ds(slot * sub, sub), :].astype(jnp.float32)
    kh_im = khi_buf[pl.ds(slot * sub, sub), :].astype(jnp.float32)

    ur = u_ref[pl.ds(0, n), :].astype(jnp.float32)
    ui = u_ref[pl.ds(n, n), :].astype(jnp.float32)
    for t in range(t_blocks):
        wr = jax.lax.slice_in_dim(w_re, t, t + n, axis=0)
        wi = jax.lax.slice_in_dim(w_im, t, t + n, axis=0)
        s1 = jnp.sum(ur * wr, axis=0)
        s2 = jnp.sum(ui * wi, axis=0)
        s3 = jnp.sum(ur * wi + ui * wr, axis=0)
        re = s1 - s2 * m1
        im = s3 * m1 + s2 * m0
        for s in range(t + 1):
            # double-rem: n - q - s can go negative for larger T and
            # lax.rem keeps the sign (jnp.mod semantics needed)
            row_s = jax.lax.rem(jax.lax.rem(n - q - s, n) + n, n)
            ur_s = u_ref[pl.ds(row_s, 1), :].astype(jnp.float32)[0]
            ui_s = u_ref[pl.ds(n + row_s, 1), :].astype(jnp.float32)[0]
            dre = specs_ref[s, 0, :] - ur_s
            dim = specs_ref[s, 1, :] - ui_s
            kr = kh_re[t - s]
            ki = kh_im[t - s]
            crossd = dim * ki
            re = re + dre * kr - crossd * m1
            im = im + (dre * ki + dim * kr) * m1 + crossd * m0
        out_ref[t, 0, :] = re
        out_ref[t, 1, :] = im
        if t == t_blocks - 1:
            sr = specs_ref[t, 0, :]
            si = specs_ref[t, 1, :]
            cross0 = si * kh_im[0]
            pre_ref[0, :] = re - (sr * kh_re[0] - cross0 * m1)
            pre_ref[1, :] = im - ((sr * kh_im[0] + si * kh_re[0]) * m1
                                  + cross0 * m0)


def _kernel_packed_v2(n: int, t_blocks: int, b_voice: int, l: int, sub: int,
                      q_ref,                      # SMEM in
                      u_ref,                      # VMEM in ([N, L] u32 block)
                      specs_ref,                  # VMEM in ([T, 2, L] f32)
                      ext2_hbm,                   # ANY in ([R, VB] u32 table)
                      out_ref,                    # VMEM out ([T, 2, L])
                      pre_ref,                    # VMEM out ([2, L])
                      w_buf, kh_buf, sem):        # scratch
    """Packed-storage variant of :func:`_kernel_v2` — see its docstring
    for what changed vs v1 (mask factoring + direct correction-row
    reads; the packed ring ref is already 2-D)."""
    j = pl.program_id(0)
    nj = pl.num_programs(0)
    rows = _window_rows(n, t_blocks, sub)
    q = q_ref[0]
    q0 = (q // sub) * sub
    d = q - q0

    def window_copy(jj, slot):
        return pltpu.make_async_copy(
            ext2_hbm.at[pl.ds(q0, rows), pl.ds(jj * l, l)],
            w_buf.at[pl.ds(slot * rows, rows)],
            sem.at[slot, 0],
        )

    def khead_copy(jj, slot):
        return pltpu.make_async_copy(
            ext2_hbm.at[pl.ds(0, sub), pl.ds(jj * l, l)],
            kh_buf.at[pl.ds(slot * sub, sub)],
            sem.at[slot, 1],
        )

    def start(jj, slot):
        window_copy(jj, slot).start()
        khead_copy(jj, slot).start()

    slot = jax.lax.rem(j, 2)

    @pl.when(j == 0)
    def _():
        start(0, 0)

    @pl.when(j + 1 < nj)
    def _():
        start(j + 1, jax.lax.rem(j + 1, 2))

    window_copy(j, slot).wait()
    khead_copy(j, slot).wait()

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, l), 1)[0] + j * l
    m0 = (jax.lax.rem(lane, b_voice) == 0).astype(jnp.float32)
    m1 = 1.0 - m0

    shift = rows - d
    w_re, w_im = _unpack_words(
        pltpu.roll(w_buf[pl.ds(slot * rows, rows), :], shift, axis=0)
    )
    kh_re, kh_im = _unpack_words(kh_buf[pl.ds(slot * sub, sub), :])
    ur, ui = _unpack_words(u_ref[:])

    for t in range(t_blocks):
        wr = jax.lax.slice_in_dim(w_re, t, t + n, axis=0)
        wi = jax.lax.slice_in_dim(w_im, t, t + n, axis=0)
        s1 = jnp.sum(ur * wr, axis=0)
        s2 = jnp.sum(ui * wi, axis=0)
        s3 = jnp.sum(ur * wi + ui * wr, axis=0)
        re = s1 - s2 * m1
        im = s3 * m1 + s2 * m0
        for s in range(t + 1):
            row_s = jax.lax.rem(jax.lax.rem(n - q - s, n) + n, n)
            ur_s, ui_s = _unpack_words(u_ref[pl.ds(row_s, 1), :])
            dre = specs_ref[s, 0, :] - ur_s[0]
            dim = specs_ref[s, 1, :] - ui_s[0]
            kr = kh_re[t - s]
            ki = kh_im[t - s]
            crossd = dim * ki
            re = re + dre * kr - crossd * m1
            im = im + (dre * ki + dim * kr) * m1 + crossd * m0
        out_ref[t, 0, :] = re
        out_ref[t, 1, :] = im
        if t == t_blocks - 1:
            sr = specs_ref[t, 0, :]
            si = specs_ref[t, 1, :]
            cross0 = si * kh_im[0]
            pre_ref[0, :] = re - (sr * kh_re[0] - cross0 * m1)
            pre_ref[1, :] = im - ((sr * kh_im[0] + si * kh_re[0]) * m1
                                  + cross0 * m0)


def _kernel_packed(n: int, t_blocks: int, b_voice: int, l: int, sub: int,
                   q_ref,                      # SMEM in
                   u_ref,                      # VMEM in ([N, L] u32 block)
                   specs_ref,                  # VMEM in ([T, 2, L] f32)
                   ext2_hbm,                   # ANY in ([R, VB] u32 table)
                   out_ref,                    # VMEM out ([T, 2, L])
                   pre_ref,                    # VMEM out ([2, L])
                   w_buf, kh_buf, sem):        # scratch
    """Packed-storage variant of :func:`_kernel`: ring and table carry one
    uint32 word per bin (re/im bf16 halves, ops/packing.py), so the
    window is ONE 32-bit DMA stream with f32 alignment rules (sub = 8,
    ``pltpu.roll`` native) and half the f32 path's HBM bytes."""
    j = pl.program_id(0)
    nj = pl.num_programs(0)
    rows = _window_rows(n, t_blocks, sub)
    q = q_ref[0]
    q0 = (q // sub) * sub
    d = q - q0

    def window_copy(jj, slot):
        return pltpu.make_async_copy(
            ext2_hbm.at[pl.ds(q0, rows), pl.ds(jj * l, l)],
            w_buf.at[pl.ds(slot * rows, rows)],
            sem.at[slot, 0],
        )

    def khead_copy(jj, slot):
        return pltpu.make_async_copy(
            ext2_hbm.at[pl.ds(0, sub), pl.ds(jj * l, l)],
            kh_buf.at[pl.ds(slot * sub, sub)],
            sem.at[slot, 1],
        )

    def start(jj, slot):
        window_copy(jj, slot).start()
        khead_copy(jj, slot).start()

    slot = jax.lax.rem(j, 2)

    @pl.when(j == 0)
    def _():
        start(0, 0)

    @pl.when(j + 1 < nj)
    def _():
        start(j + 1, jax.lax.rem(j + 1, 2))

    window_copy(j, slot).wait()
    khead_copy(j, slot).wait()

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, l), 1)[0] + j * l
    m0 = (jax.lax.rem(lane, b_voice) == 0).astype(jnp.float32)
    m1 = 1.0 - m0

    # aligned-start residue rotate on the PACKED words (32-bit: native),
    # then the lane-local unpack — see _unpack_words
    shift = rows - d
    w_re, w_im = _unpack_words(
        pltpu.roll(w_buf[pl.ds(slot * rows, rows), :], shift, axis=0)
    )
    kh_re, kh_im = _unpack_words(kh_buf[pl.ds(slot * sub, sub), :])
    ur, ui = _unpack_words(u_ref[:])

    riota = jax.lax.broadcasted_iota(jnp.int32, (n, l), 0)
    for t in range(t_blocks):
        wr = jax.lax.slice_in_dim(w_re, t, t + n, axis=0)
        wi = jax.lax.slice_in_dim(w_im, t, t + n, axis=0)
        cross = ui * wi
        re = jnp.sum(ur * wr - cross * m1, axis=0)
        im = jnp.sum((ur * wi + ui * wr) * m1 + cross * m0, axis=0)
        for s in range(t + 1):
            row_s = jax.lax.rem(jax.lax.rem(n - q - s, n) + n, n)
            mask = (riota == row_s).astype(jnp.float32)
            dre = specs_ref[s, 0, :] - jnp.sum(ur * mask, axis=0)
            dim = specs_ref[s, 1, :] - jnp.sum(ui * mask, axis=0)
            kr = kh_re[t - s]
            ki = kh_im[t - s]
            crossd = dim * ki
            re = re + dre * kr - crossd * m1
            im = im + (dre * ki + dim * kr) * m1 + crossd * m0
        out_ref[t, 0, :] = re
        out_ref[t, 1, :] = im
        if t == t_blocks - 1:
            sr = specs_ref[t, 0, :]
            si = specs_ref[t, 1, :]
            cross0 = si * kh_im[0]
            pre_ref[0, :] = re - (sr * kh_re[0] - cross0 * m1)
            pre_ref[1, :] = im - ((sr * kh_im[0] + si * kh_re[0]) * m1
                                  + cross0 * m0)


@functools.lru_cache(maxsize=None)
def _build_call(n: int, rows_total: int, vb: int, t_blocks: int,
                b_voice: int, l: int, dtype_name: str, interpret: bool,
                variant: str = "v2"):
    dtype = jnp.dtype(dtype_name)
    grid = (vb // l,)
    if dtype == jnp.uint32:  # plane-packed bf16 storage
        sub = 8
        rows = _window_rows(n, t_blocks, sub)
        body = _kernel_packed_v2 if variant == "v2" else _kernel_packed
        return pl.pallas_call(
            functools.partial(body, n, t_blocks, b_voice, l, sub),
            grid=grid,
            out_shape=(
                jax.ShapeDtypeStruct((t_blocks, 2, vb), jnp.float32),
                jax.ShapeDtypeStruct((2, vb), jnp.float32),
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),                # q
                pl.BlockSpec((n, l), lambda j: (0, j)),               # u
                pl.BlockSpec((t_blocks, 2, l), lambda j: (0, 0, j)),  # specs
                pl.BlockSpec(memory_space=pl.ANY),                    # ext2
            ],
            out_specs=(
                pl.BlockSpec((t_blocks, 2, l), lambda j: (0, 0, j)),
                pl.BlockSpec((2, l), lambda j: (0, j)),
            ),
            scratch_shapes=[
                pltpu.VMEM((2 * rows, l), jnp.uint32),  # packed window
                pltpu.VMEM((2 * sub, l), jnp.uint32),   # packed table head
                pltpu.SemaphoreType.DMA((2, 2)),        # [slot, win/khead]
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )
    sub = 16 if dtype.itemsize == 2 else 8
    rows = _window_rows(n, t_blocks, sub)
    if variant == "v2":
        # v2 takes the ring planes-FOLDED [2N, VB] (2-D ref for the
        # dynamic correction-row reads — module docstring)
        kernel = functools.partial(_kernel_v2, n, t_blocks, b_voice, l, sub)
        u_spec = pl.BlockSpec((2 * n, l), lambda j: (0, j))
    else:
        kernel = functools.partial(_kernel, n, t_blocks, b_voice, l, sub)
        u_spec = pl.BlockSpec((2, n, l), lambda j: (0, 0, j))
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((t_blocks, 2, vb), jnp.float32),  # convs
            jax.ShapeDtypeStruct((2, vb), jnp.float32),            # pre
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                # q
            u_spec,                                               # u
            pl.BlockSpec((t_blocks, 2, l), lambda j: (0, 0, j)),  # specs
            pl.BlockSpec(memory_space=pl.ANY),                    # ext2 (HBM)
        ],
        out_specs=(
            pl.BlockSpec((t_blocks, 2, l), lambda j: (0, 0, j)),
            pl.BlockSpec((2, l), lambda j: (0, j)),
        ),
        scratch_shapes=[
            # double-buffered per-plane windows, slot folded into rows
            pltpu.VMEM((2 * rows, l), dtype),                     # window re
            pltpu.VMEM((2 * rows, l), dtype),                     # window im
            pltpu.VMEM((2 * sub, l), dtype),                      # k head re
            pltpu.VMEM((2 * sub, l), dtype),                      # k head im
            pltpu.SemaphoreType.DMA((2, 4)),   # [slot, win re/im + kh re/im]
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )


def phased_step(u: jnp.ndarray, ext2: jnp.ndarray, specs: jnp.ndarray,
                q: jnp.ndarray, b_voice: int,
                lane_block: int | None = None,
                interpret: bool = False,
                variant: str = "v2"):
    """Full phased correlation step: corrected conv sums and the
    ``pre_multiplied`` accumulator in one pass.

    ``u``: [2, N, VB] ring (``N`` a tile-multiple — ``farm2_init`` pads),
    planes-folded [2N, VB] (row ``p*N + r`` is plane p row r — what hot
    callers pass, see below), or [N, VB] uint32 for plane-packed bf16
    storage (ops/packing.py);
    ``ext2``: [2, R, VB] doubled periodic table ([R, VB] packed) with row
    slack for the aligned window (asserted); ``specs``: [T, 2, VB] fresh
    input spectra (T <= the storage tile, so the table-head DMA covers
    every k row); ``q``: scalar i32 phase in [0, N); ``b_voice``:
    per-voice lane width B of the fused axis.  Returns
    ``(convs [T, 2, VB], pre [2, VB])``.
    """
    packed = u.dtype == jnp.uint32
    folded = (not packed) and u.ndim == 2  # planes-folded [2N, VB] ring
    if packed:
        n, vb = u.shape
        rows_total = ext2.shape[0]
    elif folded:
        n, vb = u.shape[0] // 2, u.shape[1]
        rows_total = ext2.shape[1]
    else:
        _, n, vb = u.shape
        rows_total = ext2.shape[1]
    t_blocks = specs.shape[0]
    if lane_block is None:
        # 2048 measured best for BOTH storage widths (bf16 at 4096 was
        # 25% slower: the bf16->f32 cast is a sublane re-tiling whose cost
        # scales with the chunk, while DMA overhead does not dominate);
        # the packed path has no such cast but keeps the same chunk
        lane_block = 2048
    l = min(lane_block, vb)
    assert u.dtype == ext2.dtype
    sub = 8 if packed else (16 if u.dtype.itemsize == 2 else 8)
    assert t_blocks <= sub, (
        f"{t_blocks} blocks per call exceed the {sub}-row table-head DMA"
    )
    assert n % sub == 0, (
        f"seg_count {n} must be a multiple of {sub} for the {u.dtype} "
        "Pallas tail step (farm2_init pads the tail with zero segments)"
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
                       u.dtype.name, interpret, variant)
    if not packed:
        # v2's f32/bf16 kernel reads the ring planes-folded (2-D ref for
        # dynamic correction-row loads); v1 reads it [2, N, VB].  Hot
        # callers pass the ring PRE-FOLDED and keep their ring row writes
        # on the folded view too — a mixed 3-D-write/2-D-read ring makes
        # XLA carry it plane-on-sublanes and relayout-copy the WHOLE ring
        # in front of the kernel every period (farm2.py documents the
        # measurement).  The reshapes here are bitcasts either way.
        if variant == "v2" and not folded:
            u = u.reshape(2 * n, vb)
        elif variant != "v2" and folded:
            u = u.reshape(2, n, vb)
    return call(jnp.asarray(q, jnp.int32).reshape(1), u,
                specs.astype(jnp.float32), ext2)
