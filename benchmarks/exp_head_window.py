"""Experiment: the short-call heads' meta-DFT strategy A/B (r05).

The config-3 8-period call misses its xRT bar NOT on traffic (it sits
above its algorithmic floor) but on the fused-head pipeline's meta-DFT
chain: ONE causal conv over ``m = npo2(T + 2n - 1)`` rows (m=2048 at
T=8p), whose 4-step transform serializes three narrow (128-lane) stage
matmuls.  But the head stream is pure FEED-FORWARD — no output feeds
back into its own input within a call — so the same conv decomposes into
``q`` overlap-save windows of ``m_w = npo2(p + 2n - 1)`` rows (512),
batched on a leading axis: the meta-DFT becomes a single DIRECT basis
matmul ``[512, 512] x [512, q*128 lanes]`` — wide on the MXU, flat chain
depth in q.

This measures the two pipelines (forward meta + khat product + windowed
inverse meta) at the exact 8p head shape, same window, after an
equivalence check, WITHOUT touching engine code: if the batched-window
form doesn't clearly win here, the engine restructuring isn't worth it.

Shapes (config 3, ``src/fft_convolver.rs:412-495`` workload): head
n=128 segments, combined head+tail0 kernel 2n=256 rows, period p=128
blocks, q=8 periods, B=128 lanes per plane.

Usage: python -m benchmarks.exp_head_window [--cpu] [--mults 8,16]
"""

from __future__ import annotations

import sys

import numpy as np

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import jax.numpy as jnp

from benchmarks.configs import _chain_time
from fft_convolution_tpu.ops import fft as F

N = 128          # head seg_count == period (blocks)
NK = 2 * N       # combined head+tail0 kernel rows
B = 128          # lanes (block_size bins per plane)
P = N            # blocks per period


def khat(kern_re, kern_im, m):
    kr, ki = F._cdft4_axis2(F._pad_rows(kern_re, m), F._pad_rows(kern_im, m),
                            m, -1.0)
    return kr, ki


def pipeline_big(ext_re, ext_im, kh, t):
    """Strategy A (shipped): one m=npo2(t+2n-1) causal conv, kern_hat
    precomputed; inverse sliced to the t output rows (causal_conv_time's
    shape, minus the lane-0 packing details shared by both strategies)."""
    m = ext_re.shape[-2]
    er, ei = F._cdft4_axis2(ext_re, ext_im, m, -1.0)
    pr = er * kh[0] - ei * kh[1]
    pi = er * kh[1] + ei * kh[0]
    yr, yi = F._cdft4_axis2(pr, pi, m, 1.0, scale=1.0 / m,
                            out_rows=(N, t))
    return yr, yi


def pipeline_win(ext_re, ext_im, kh, t):
    """Strategy B: q overlap-save windows of m_w=npo2(p+2n-1) rows,
    batched on the leading axis, DIRECT basis meta-DFTs."""
    q = t // P
    m_w = F.next_power_of_two(P + NK - 1)          # 512
    lead = NK - 1 - N                              # zero rows before ext row 0

    def win(x):
        xp = jnp.concatenate([jnp.zeros((lead, B), x.dtype), x], axis=0)
        # window g: padded rows [g*P, g*P + NK-1+P), zero-tail to m_w
        ws = [jax.lax.slice_in_dim(xp, g * P, g * P + NK - 1 + P, axis=0)
              for g in range(q)]
        w = jnp.stack(ws)                          # [q, NK-1+P, B]
        return jnp.concatenate(
            [w, jnp.zeros((q, m_w - (NK - 1 + P), B), x.dtype)], axis=1)

    wr, wi = win(ext_re), win(ext_im)
    er, ei = F._cdft_direct_axis2(wr, wi, m_w, -1.0,
                                  jax.lax.Precision.HIGHEST, 1.0, None)
    pr = er * kh[0] - ei * kh[1]
    pi = er * kh[1] + ei * kh[0]
    yr, yi = F._cdft_direct_axis2(pr, pi, m_w, 1.0,
                                  jax.lax.Precision.HIGHEST, 1.0 / m_w,
                                  (NK - 1, P))
    return yr.reshape(t, B), yi.reshape(t, B)


def main() -> None:
    rng = np.random.default_rng(5)
    mults = (8, 16)
    for i, a in enumerate(sys.argv):
        if a == "--mults":
            mults = tuple(int(x) for x in sys.argv[i + 1].split(","))

    kern_re = jnp.asarray(rng.standard_normal((NK, B)).astype(np.float32))
    kern_im = jnp.asarray(rng.standard_normal((NK, B)).astype(np.float32))

    for mult in mults:
        t = mult * P
        m_big = F.next_power_of_two(t + NK - 1)
        m_w = F.next_power_of_two(P + NK - 1)
        kh_big = khat(kern_re, kern_im, m_big)
        kh_win = khat(kern_re, kern_im, m_w)
        # ext rows: N history + t specs (+ zeros to m_big, as shipped)
        rows = N + t
        ext_re = jnp.asarray(rng.standard_normal((rows, B)).astype(np.float32))
        ext_im = jnp.asarray(rng.standard_normal((rows, B)).astype(np.float32))
        pad = jnp.zeros((m_big - rows, B), jnp.float32)
        ebr, ebi = jnp.concatenate([ext_re, pad]), jnp.concatenate([ext_im, pad])

        # equivalence first: both must produce the same causal conv rows
        ya = pipeline_big(ebr, ebi, kh_big, t)
        yb = pipeline_win(ebr[: rows], ebi[: rows], kh_win, t)
        err = max(float(jnp.abs(ya[0] - yb[0]).max()),
                  float(jnp.abs(ya[1] - yb[1]).max()))
        scale = float(jnp.abs(ya[0]).max())
        print(f"T={mult}p: window-vs-big equivalence rel "
              f"{err / scale:.2e} (m_big={m_big}, m_w={m_w})", flush=True)
        assert err / scale < 1e-4, "window decomposition is wrong — fix first"

        # chained timing, same window, alternating strategies.  State =
        # ext planes; fold the output back in so iterations chain.
        def run_big(st, x, kh):
            er, ei = st
            yr, yi = pipeline_big(er, ei, kh, t)
            er = er.at[N: N + t].add(1e-6 * yr + x)
            ei = ei.at[N: N + t].add(1e-6 * yi)
            return (er, ei), yr

        def run_win(st, x, kh):
            er, ei = st
            yr, yi = pipeline_win(er[: rows], ei[: rows], kh, t)
            er = er.at[N: N + t].add(1e-6 * yr + x)
            ei = ei.at[N: N + t].add(1e-6 * yi)
            return (er, ei), yr

        x = jnp.asarray(rng.standard_normal((t, B)).astype(np.float32))
        for name, fn, kh in (("big ", run_big, kh_big),
                             ("win ", run_win, kh_win)):
            wall = _chain_time(fn, (jnp.copy(ebr), jnp.copy(ebi)), x,
                               aux=kh, samples=2, sample_pause_s=10.0)
            print(f"T={mult}p {name}: {wall * 1e3:7.3f} ms/call", flush=True)


if __name__ == "__main__":
    main()
