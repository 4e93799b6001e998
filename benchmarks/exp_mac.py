"""Microbenchmark: the Pallas phased tail MAC in isolation.

Separates the kernel's own cost from the surrounding core (corrections,
DFTs, ring updates) and probes what the time is made of:

* phase advancing by T (production: residue ``d`` varies, rolls active)
* phase advancing by 8 (always aligned: ``d == 0`` — isolates the
  sublane-shift cost of the roll + unaligned per-step slices)
* lane block sweep (DMA granularity / shuffle amortization)

Usage: python -m benchmarks.exp_mac [--voices N]
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from fft_convolution_tpu.ops.pallas_farm_mac import phased_mac
from fft_convolution_tpu.parallel import farm2

SR = 48000


def slope(fn, q0, n=88, c1=2, c2=10, reps=2):
    def build(length):
        @jax.jit
        def chained(q, u, ext2):
            def body(qq, _):
                acc = fn(u, ext2, qq)
                return (qq + 2) % n, jnp.sum(acc)

            qf, sums = jax.lax.scan(body, q, None, length=length)
            return qf, jnp.sum(sums)

        return chained

    return build(c1), build(c2)


def main():
    voices = 64
    for i, a in enumerate(sys.argv):
        if a == "--voices":
            voices = int(sys.argv[i + 1])

    rng = np.random.default_rng(4)
    irs = (rng.standard_normal((voices, 60 * SR)) * 0.002).astype(np.float32)
    dt = jnp.bfloat16 if "--bf16" in sys.argv else jnp.float32
    cfg, state = farm2.farm2_init(irs, 128, 60 * SR, tail_dtype=dt)
    u = state.tail.segments
    ext2 = state.tail.segments_ir
    n = cfg.tail.seg_count
    tb = cfg.tail_block
    print(f"V={voices} n={n} u={u.nbytes/1e9:.2f}G ext2={ext2.nbytes/1e9:.2f}G",
          flush=True)

    def timed_pair(r1, r2, c1, c2, label):
        def t(r):
            qf, v = r(jnp.asarray(0, jnp.int32), u, ext2)
            _ = float(v)
            best = float("inf")
            for _i in range(2):
                t0 = time.perf_counter()
                qf, v = r(jnp.asarray(0, jnp.int32), u, ext2)
                _ = float(v)
                best = min(best, time.perf_counter() - t0)
            return best
        w = max((t(r2) - t(r1)) / (c2 - c1), 1e-9)
        print(f"{label}: {w*1e3:8.2f} ms", flush=True)
        return w

    for lane_block in (None,):  # None = dtype-scaled default
        fn = functools.partial(
            phased_mac, t_blocks=2, b_voice=tb, lane_block=lane_block
        )
        r1, r2 = slope(lambda u_, e_, q_: fn(u_, e_, q_), 0, n=n)
        timed_pair(r1, r2, 2, 10, f"mac T=2 step=2 L={lane_block}")

    # --- core-overhead decomposition at the same shapes -------------------
    from fft_convolution_tpu.ops.fft import irdft_block, rdft_block

    fft_size = 2 * tb
    t_b = 2
    v = voices

    def slope_x(make_body, x0, label, c1=2, c2=10):
        def build(length):
            @jax.jit
            def chained(x, u_, e_):
                def body(xx, _):
                    return make_body(xx, u_, e_)
                xf, sums = jax.lax.scan(body, x, None, length=length)
                return xf, jnp.sum(sums)
            return chained

        def t(r):
            xf, val = r(x0, u, ext2)
            _ = float(val)
            best = float("inf")
            for _i in range(2):
                t0 = time.perf_counter()
                xf, val = r(x0, u, ext2)
                _ = float(val)
                best = min(best, time.perf_counter() - t0)
            return best

        w = max((t(build(c2)) - t(build(c1))) / (c2 - c1), 1e-9)
        print(f"{label}: {w*1e3:8.2f} ms", flush=True)

    # forward per-block DFT + fuse transpose (the specs pipeline)
    x0 = jnp.zeros((t_b, v, tb), jnp.float32)

    def body_rdft(xx, u_, e_):
        s = jnp.swapaxes(rdft_block(xx, fft_size), 1, 2)
        s = s.reshape(t_b, 2, v * tb)
        xx2 = xx + s.reshape(t_b, 2, v, tb)[:, 0]  # carry dep
        return xx2, jnp.sum(s)

    slope_x(body_rdft, x0, "rdft+fuse        ")

    # inverse per-block DFT + OLA shapes
    c0 = jnp.zeros((t_b, 2, v, tb), jnp.float32)

    def body_irdft(cc, u_, e_):
        outs = irdft_block(jnp.swapaxes(cc, 1, 2), fft_size)  # [T, V, 2B]
        cc2 = cc + outs.reshape(t_b, v, 2, tb)[:, :, :, :].swapaxes(1, 2) * 0.5
        return cc2, jnp.sum(outs)

    slope_x(body_irdft, c0, "irdft+ola shapes ")


if __name__ == "__main__":
    main()
