"""Experiment: farm2 stage breakdown + big-tail core variants on real TPU.

Times (slope method) the full two-stage farm stream and each stage in
isolation, then the big-tail stage under several cores:
  A sliced ring scan (current production path)
  B sliced ring scan, unrolled (q is tiny and static)
  C voice-chunked sliced scan (lax.map over voice chunks)
  D voice-chunked time-DFT conv core

Usage: python -m benchmarks.exp_farm_tail [--voices N] [--cpu]
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

if "--cpu" in sys.argv:
    import os

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import jax.numpy as jnp

from fft_convolution_tpu.models import uniform
from fft_convolution_tpu.ops.cpx import pmul, pmul_sum
from fft_convolution_tpu.parallel import farm, farm2

SR = 48000


def slope_time(run, state, x, c1=1, c2=3, reps=2):
    def build(length):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def chained(st, xs):
            def body(s, _):
                s2, y = run(s, xs)
                return s2, jnp.sum(y)
            sf, sums = jax.lax.scan(body, st, None, length=length)
            return sf, jnp.sum(sums)
        return chained

    r1, r2 = build(c1), build(c2)

    def timed(r, st):
        st, v = r(st, x)
        _ = float(v)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            st, v = r(st, x)
            _ = float(v)
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(r1, jax.tree.map(jnp.copy, state))
    t2 = timed(r2, jax.tree.map(jnp.copy, state))
    return max((t2 - t1) / (c2 - c1), 1e-9)


def _lockstep_axes(state):
    return jax.tree.map(lambda leaf: None if leaf.ndim == 1 else 0, state)


def chunked_lockstep_stream(stream_fn, state, vblocks, c):
    """lax.map over voice chunks of size ``c``; per-voice scalar state is
    lockstep-shared (unbatched inside each chunk's vmap)."""
    v = vblocks.shape[0]
    axes = _lockstep_axes(state)
    # xs for lax.map: batched leaves [v//c, c, ...]; scalar leaves replicated
    # per chunk [v//c, ...] so each chunk carries its own (identical) copy
    xs_state = jax.tree.map(
        lambda leaf, ax: (
            jnp.broadcast_to(leaf[0], (v // c,) + leaf.shape[1:])
            if ax is None else leaf.reshape((v // c, c) + leaf.shape[1:])
        ),
        state, axes,
    )
    blocks_r = vblocks.reshape((v // c, c) + vblocks.shape[1:])

    def body(op):
        st_chunk, blk_chunk = op
        return jax.vmap(stream_fn, in_axes=(axes, 0), out_axes=(axes, 0))(
            st_chunk, blk_chunk
        )

    st2, ys = jax.lax.map(body, (xs_state, blocks_r))
    st2 = jax.tree.map(
        lambda leaf, ax: (
            jnp.broadcast_to(leaf[0], (v,) + leaf.shape[1:])
            if ax is None else leaf.reshape((v,) + leaf.shape[2:])
        ),
        st2, axes,
    )
    return st2, ys.reshape((v,) + ys.shape[2:])


def _sliced_unrolled(cfg, state, blocks):
    """stream_scan_sliced_unguarded with the scan unrolled (q static, tiny)."""
    b = cfg.block_size
    n = cfg.seg_count
    specs = uniform.rdft_block(blocks, cfg.fft_size)
    ir2 = jnp.concatenate([state.segments_ir, state.segments_ir], axis=0)
    j = jnp.arange(n, dtype=jnp.int32)
    segments, current, pre = state.segments, state.current, state.pre_multiplied
    convs = []
    for k in range(blocks.shape[0]):
        spec = specs[k]
        segments = jax.lax.dynamic_update_index_in_dim(segments, spec, current, axis=0)
        rolled = jax.lax.dynamic_slice(ir2, (n - current, 0, 0), (n, 2, b))
        pre = pmul_sum(rolled, segments, j != current)
        conv = pre + pmul(spec, state.segments_ir[0])
        current = jnp.where(current > 0, current - 1, n - 1).astype(jnp.int32)
        convs.append(conv)
    convs = jnp.stack(convs)
    new_state = state._replace(segments=segments, current=current, pre_multiplied=pre)
    outs = uniform.irdft_block(convs, cfg.fft_size)
    tails = jnp.concatenate([state.overlap[None], outs[:-1, b:]], axis=0)
    y = outs[:, :b] + tails
    return new_state._replace(overlap=outs[-1, b:]), y


def main():
    voices = 32
    for i, a in enumerate(sys.argv):
        if a == "--voices":
            voices = int(sys.argv[i + 1])
    ir_seconds = 60
    block = 128

    rng = np.random.default_rng(4)
    irs = (rng.standard_normal((voices, ir_seconds * SR)) * 0.002).astype(np.float32)
    cfg, state_full = farm2.farm2_init(irs, block, ir_seconds * SR)
    # farm2_init's big tail is now ROWS-LEADING (phased corr core); the
    # A-F variants want the plain voice-leading stage state — build one
    # directly from the tail IR slice
    n_tail = cfg.tail.seg_count
    tb_ = cfg.tail_block
    _, tail_v = farm.farm_init(irs[:, 2 * tb_:], tb_, cfg.tail.ir_len)
    state = state_full._replace(tail=tail_v)
    ext_idx_e = jnp.arange(uniform.CORR_EXTRA_ROWS) % n_tail
    state_ext_tail = tail_v._replace(
        segments_ir=jnp.concatenate(
            [tail_v.segments_ir,
             jnp.take(tail_v.segments_ir, ext_idx_e, axis=1)],
            axis=1,
        )
    )
    p = cfg.period
    t = 2 * p
    q = t // p
    x = jnp.asarray(rng.standard_normal((t, voices, block)).astype(np.float32))
    audio = t * block / SR
    print(f"voices={voices} tail_block={cfg.tail_block} period={p} T={t} "
          f"audio={audio:.3f}s tail_segs={cfg.tail.seg_count}", flush=True)


    vx = jnp.swapaxes(x, 0, 1)  # [V, T, B]

    wall = slope_time(
        lambda st, xs: farm.lockstep_vmap_stream(
            functools.partial(uniform.stream_conv_unguarded, cfg.head), st, xs),
        state.head, vx)
    print(f"head stage:          {wall*1e3:9.2f} ms", flush=True)

    wall = slope_time(
        lambda st, xs: farm.lockstep_vmap_stream(
            functools.partial(uniform.stream_conv_unguarded, cfg.tail0), st, xs),
        state.tail0, vx)
    print(f"tail0 stage:         {wall*1e3:9.2f} ms", flush=True)

    big = vx.reshape(voices, q, cfg.tail_block)

    wall = slope_time(
        lambda st, xs: farm.lockstep_vmap_stream(
            functools.partial(uniform.stream_scan_sliced_unguarded, cfg.tail),
            st, xs),
        state.tail, big)
    print(f"tail A sliced scan:  {wall*1e3:9.2f} ms", flush=True)

    wall = slope_time(
        lambda st, xs: farm.lockstep_vmap_stream(
            functools.partial(_sliced_unrolled, cfg.tail), st, xs),
        state.tail, big)
    print(f"tail B unrolled:     {wall*1e3:9.2f} ms", flush=True)

    for c in (4, 8):
        if voices % c:
            continue
        wall = slope_time(
            lambda st, xs, c=c: chunked_lockstep_stream(
                functools.partial(uniform.stream_scan_sliced_unguarded, cfg.tail),
                st, xs, c),
            state.tail, big)
        print(f"tail C chunk{c} sliced:{wall*1e3:8.2f} ms", flush=True)

    for c in (4, 8):
        if voices % c:
            continue
        wall = slope_time(
            lambda st, xs, c=c: chunked_lockstep_stream(
                functools.partial(uniform.stream_conv_unguarded, cfg.tail),
                st, xs, c),
            state.tail, big)
        print(f"tail D chunk{c} tdft:  {wall*1e3:8.2f} ms", flush=True)

    # E: rebased correlation core (the farm2 default after this round;
    # state.tail built by farm2_init carries the extended table)
    wall = slope_time(
        lambda st, xs: farm.lockstep_vmap_stream(
            functools.partial(uniform.stream_corr_rebased_unguarded, cfg.tail),
            st, xs),
        state_ext_tail, big)
    print(f"tail E corr rebased: {wall*1e3:8.2f} ms", flush=True)

    # F: phased correlation core (roll-free: doubled periodic table, phase
    # carried in `current`; saves the rebase roll's full-ring copy)
    ext_idx = jnp.arange(n_tail + uniform.CORR_EXTRA_ROWS) % n_tail
    state_ph_tail = state.tail._replace(
        segments_ir=jnp.concatenate(
            [state.tail.segments_ir,
             jnp.take(state.tail.segments_ir, ext_idx, axis=1)],
            axis=1,
        )
    )
    wall = slope_time(
        lambda st, xs: farm.lockstep_vmap_stream(
            functools.partial(uniform.stream_corr_phased_unguarded, cfg.tail),
            st, xs),
        state_ph_tail, big)
    print(f"tail F corr phased:  {wall*1e3:8.2f} ms", flush=True)

    # G: planes-outer fused-voice phased core (the production farm2 tail
    # after r2): fusing V*B removes the voice axis XLA otherwise relayouts
    # onto lanes for the loop interior — the separate-axis variants E/F
    # provoked whole-table layout copies (visible in single-call time,
    # hidden from the slope; at 131 voices they alone exceeded HBM)
    state_rows_tail = farm2._tail_fused_state(tail_v, n_tail)
    big_rows = jnp.swapaxes(big, 0, 1)  # [q, V, tb]
    wall = slope_time(
        functools.partial(farm2._tail_corr_phased_fused, cfg.tail),
        state_rows_tail, big_rows)
    print(f"tail G phased fused:  {wall*1e3:8.2f} ms", flush=True)

    # single-call walls (relay constant included — compare RELATIVE): a
    # per-call layout copy shows up here but cancels out of the slope
    def one_call(run, st0, xs, reps=3):
        f = jax.jit(run, donate_argnums=(0,))
        st, y = f(st0, xs)
        _ = float(jnp.sum(y))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            st, y = f(st, xs)
            _ = float(jnp.sum(y))
            best = min(best, time.perf_counter() - t0)
        return best

    w_e = one_call(functools.partial(
        farm.lockstep_vmap_stream,
        functools.partial(uniform.stream_corr_rebased_unguarded, cfg.tail)),
        jax.tree.map(jnp.copy, state_ext_tail), big)
    w_g = one_call(functools.partial(farm2._tail_corr_phased_fused, cfg.tail),
                   jax.tree.map(jnp.copy, state_rows_tail), big_rows)
    print(f"1-call tail E/G:     {w_e*1e3:8.2f} / {w_g*1e3:8.2f} ms", flush=True)

    wall = slope_time(functools.partial(farm2.farm2_stream, cfg), state_full, x)
    print(f"full farm2:          {wall*1e3:8.2f} ms  xrt/voice={audio/wall:8.1f} "
          f"rt_voices={audio/wall*voices:8.0f}", flush=True)


if __name__ == "__main__":
    main()
