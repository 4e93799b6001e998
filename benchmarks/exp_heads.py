"""Experiment: combined 2n-segment head kernel vs the stacked two-kernel
head path, same window (the chip is time-shared — only same-window A/Bs
are comparable).

The farm's head+tail0 stage historically ran the stacked formulation:
kernel spectra on a leading stage axis through causal_conv_time (TWO
meta-products + TWO inverse meta-DFTs), tail0's one-period delay applied
to its conv spectra pre-inverse.  Since period == seg_count, the delay
folds into a COMBINED 2n-segment kernel (farm2._combined_head_kernel):
ONE meta-product + ONE inverse, half the khat residency, no delayed-
spectra concat.  This script slope-times both, khat-served, on identical
inputs, plus the full farm2_stream, and checks head-path parity.

Usage: python -m benchmarks.exp_heads [--voices N] [--bf16] [--cpu]
"""

from __future__ import annotations

import functools
import sys

import numpy as np

if "--cpu" in sys.argv:
    import os

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import jax.numpy as jnp

from fft_convolution_tpu.ops.fft import (causal_conv_khat, causal_conv_time,
                                         next_power_of_two)
from fft_convolution_tpu.parallel import farm2
from benchmarks.exp_farm_scale import slope_time_threaded

SR = 48000


def _stacked_heads(cfg, st_h, st_t0, vx, spec0_prev, khat2):
    """The pre-combined stacked formulation (khat-served), kept here as
    the A/B baseline: two kernels on a leading stage axis, tail0 conv
    spectra delayed one period pre-inverse."""
    from fft_convolution_tpu.ops.fft import irdft_block, rdft_block

    ucfg = cfg.head
    n = ucfg.seg_count
    b = ucfg.block_size
    p = cfg.period
    v, t = vx.shape[0], vx.shape[1]
    current = st_h.current[0]
    specs = rdft_block(vx, ucfg.fft_size)
    seg2 = jnp.concatenate([st_h.segments, st_h.segments], axis=1)
    window = jax.lax.dynamic_slice(
        seg2, (0, current + 1, 0, 0), (v, n - 1, 2, b)
    )
    ext = jnp.concatenate([jnp.flip(window, axis=1), specs], axis=1)
    kern2 = jnp.stack([st_h.segments_ir, st_t0.segments_ir])
    convs2 = causal_conv_time(ext, kern2, t, kern_hat=khat2)
    conv0_del = jnp.concatenate([spec0_prev, convs2[1, :, : t - p]], axis=1)
    s = convs2[0] + conv0_del
    outs = irdft_block(s, ucfg.fft_size)
    tails = jnp.concatenate([st_h.overlap[:, None], outs[:, :-1, b:]], axis=1)
    y = outs[:, :, :b] + tails
    st_h2, st_t02, _hist = farm2._heads_state_out(
        st_h, st_t0, ext, outs, t, n, n - 1
    )
    return (st_h2, st_t02), y


def main():
    voices, periods = 128, 2
    for i, a in enumerate(sys.argv):
        if a == "--voices":
            voices = int(sys.argv[i + 1])
        if a == "--periods":
            # tail blocks per call == periods; the phased kernel's table-
            # window DMA is per CALL, so longer calls amortize the tail's
            # dominant cost (bounds: 8 for the Pallas step, 16 jnp)
            periods = int(sys.argv[i + 1])
    ir_seconds = 60
    block = 128

    rng = np.random.default_rng(11)
    irs = (rng.standard_normal((voices, ir_seconds * SR)) * 0.002).astype(np.float32)
    tail_dtype = jnp.bfloat16 if "--bf16" in sys.argv else jnp.float32
    cfg, state = farm2.farm2_init(irs, block, ir_seconds * SR,
                                  tail_dtype=tail_dtype)
    n = cfg.head.seg_count
    p = cfg.period
    t = periods * p
    audio = t * block / SR
    x = jnp.asarray(rng.standard_normal((t, voices, block)).astype(np.float32))
    vx = jnp.swapaxes(x, 0, 1)

    print(f"V={voices} n={n} p={p} T={t} "
          f"m_combined={next_power_of_two(2 * n - 1 + t)} "
          f"m_stacked={next_power_of_two(n - 1 + t)}", flush=True)

    # parity first: combined vs stacked head path on the same fresh state
    khat_c = jax.jit(functools.partial(farm2.farm2_head_khat, cfg),
                     static_argnums=(1,))(state, t)
    m_s = next_power_of_two(n - 1 + t)
    khat_s = jax.jit(lambda st: causal_conv_khat(
        jnp.stack([st.head.segments_ir, st.tail0.segments_ir]), m_s
    ))(state)

    hist0 = jnp.zeros((voices, n - 1, 2, block), jnp.float32)
    spec00 = jnp.zeros((voices, p, 2, block), jnp.float32)

    @jax.jit
    def run_combined_once(st_h, st_t0, kh):
        st_h2, st_t02, y, _ = farm2._heads_fused(cfg, st_h, st_t0, vx, hist0,
                                                 suppress_flags=jnp.zeros((voices,), jnp.int32),
                                                 khat=kh)
        return y

    @jax.jit
    def run_stacked_once(st_h, st_t0, kh):
        _, y = _stacked_heads(cfg, st_h, st_t0, vx, spec00, kh)
        return y

    yc = np.asarray(run_combined_once(state.head, state.tail0, khat_c))
    ys = np.asarray(run_stacked_once(state.head, state.tail0, khat_s))
    ref = max(np.abs(ys).max(), 1e-30)
    print(f"head-path parity (combined vs stacked): "
          f"{np.abs(yc - ys).max() / ref:.3e} rel", flush=True)

    # slope-timed A/B, khat as a traced aux (not a baked constant)
    def combined(st, xs, kh):
        st_h, st_t0 = st
        st_h2, st_t02, y, hist = farm2._heads_fused(
            cfg, st_h, st_t0, jnp.swapaxes(xs, 0, 1), hist0,
            suppress_flags=jnp.zeros((voices,), jnp.int32), khat=kh
        )
        return (st_h2, st_t02), y

    def heads_copy():
        # slope_time_threaded donates its state: give each run its own
        return jax.tree.map(jnp.copy, (state.head, state.tail0))

    wall_c, _ = slope_time_threaded(combined, heads_copy(), x, aux=khat_c)
    print(f"combined heads: {wall_c*1e3:8.2f} ms", flush=True)

    wall_s, _ = slope_time_threaded(
        lambda st, xs, kh: _stacked_heads(
            cfg, st[0], st[1], jnp.swapaxes(xs, 0, 1), spec00, kh
        ),
        heads_copy(), x, aux=khat_s,
    )
    print(f"stacked heads:  {wall_s*1e3:8.2f} ms  "
          f"(combined = {wall_s/wall_c:.2f}x)", flush=True)

    # full farm2_stream, khat-served, for the headline number
    mac = "jnp" if jax.devices()[0].platform != "tpu" else "pallas"
    wall, _ = slope_time_threaded(
        lambda st, xs, kh: farm2.farm2_stream(cfg, st, xs, tail_mac=mac,
                                              head_khat=kh),
        state, x, aux=khat_c,
    )
    print(f"full farm2 ({mac}): {wall*1e3:8.2f} ms  "
          f"xrt/voice={audio/wall:8.1f} rt_voices={audio/wall*voices:8.0f}",
          flush=True)


if __name__ == "__main__":
    main()
