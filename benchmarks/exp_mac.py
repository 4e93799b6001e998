"""Microbenchmark + parity harness: the Pallas phased tail step in isolation.

Separates the kernel's own cost from the surrounding core (DFTs, ring
updates, glue) and A/Bs the kernel VARIANTS in one contention window:

* ``v1`` — original: per-element DC-mask multiplies inside the [n, l]
  reductions, correction ring rows mask-reduced out of the resident
  block (O(n*l) VPU work per (t, s) term);
* ``v2`` — mask factoring (S1/S2/S3 plain sums + O(l) postfix) and
  dynamic single-row correction reads (``u_ref[pl.ds(row_s, 1)]`` on a
  planes-folded 2-D ref — the pattern ops/pallas_engine.py serves with).

``--parity`` first runs both variants on identical synthetic operands ON
THE CURRENT BACKEND (real TPU when run under axon) across several phases
``q`` (exercising residue rolls and the dynamic row reads) and reports
max rel error v2-vs-v1, f32 and plane-packed storage.  v1 is the
hardware-validated anchor (bench.py farm gates); interpret mode provably
misses hardware divergence classes (CLAUDE.md), so run this on TPU
before trusting a new variant.

Usage: python -m benchmarks.exp_mac [--voices N] [--bf16] [--parity]
                                    [--skip-time]
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from fft_convolution_tpu.ops.pallas_farm_mac import _window_rows, phased_step
from fft_convolution_tpu.ops.packing import pack_c32_planes
from fft_convolution_tpu.parallel import farm2

SR = 48000
T_BLOCKS = 2


def _synth(v, n, tb, packed, seed=7):
    """Random phased-step operands at farm shapes (tile-padded table)."""
    rng = np.random.default_rng(seed)
    vb = v * tb
    rows = 2 * n + 16
    u = (rng.standard_normal((2, n, vb)) * 0.1).astype(np.float32)
    ext2 = (rng.standard_normal((2, rows, vb)) * 0.1).astype(np.float32)
    specs = (rng.standard_normal((T_BLOCKS, 2, vb)) * 0.1).astype(np.float32)
    u, ext2, specs = jnp.asarray(u), jnp.asarray(ext2), jnp.asarray(specs)
    if packed:
        # packed storage rounds to bf16 on store; both variants read the
        # SAME words, so the A/B is still exact-input-identical
        u = pack_c32_planes(u)
        ext2 = pack_c32_planes(ext2)
    return u, ext2, specs


def parity(v=4, n=16, tb=128, interpret=False):
    print(f"-- parity (backend={jax.devices()[0].platform}, V={v}, n={n}) --",
          flush=True)
    worst = 0.0
    for packed in (False, True):
        u, ext2, specs = _synth(v, n, tb, packed)

        def run(var, q):
            convs, pre = jax.jit(
                lambda u_, e_, s_, q_: phased_step(u_, e_, s_, q_, tb,
                                                   interpret=interpret,
                                                   variant=var),
                static_argnames=(),
            )(u, ext2, specs, jnp.asarray(q, jnp.int32))
            return np.asarray(convs), np.asarray(pre)

        for q in (0, 1, 7, 8, 13, n - 1):
            c1, p1 = run("v1", q)
            c2, p2 = run("v2", q)
            scale = max(np.abs(c1).max(), np.abs(p1).max(), 1e-9)
            rel = max(np.abs(c1 - c2).max(), np.abs(p1 - p2).max()) / scale
            worst = max(worst, rel)
            tag = "packed" if packed else "f32   "
            print(f"  {tag} q={q:3d}: rel {rel:.3e}", flush=True)
    print(f"parity worst rel: {worst:.3e}", flush=True)
    return worst


def slope(fn, n, c1=2, c2=10):
    def build(length):
        @jax.jit
        def chained(q, u, ext2, specs):
            def body(qq, _):
                convs, pre = fn(u, ext2, specs, qq)
                return (qq + 2) % n, jnp.sum(convs) + jnp.sum(pre)

            qf, sums = jax.lax.scan(body, q, None, length=length)
            return qf, jnp.sum(sums)

        return chained

    return build(c1), build(c2), c1, c2


def main():
    voices = 64
    for i, a in enumerate(sys.argv):
        if a == "--voices":
            voices = int(sys.argv[i + 1])
    packed = "--bf16" in sys.argv

    if "--parity" in sys.argv:
        parity(interpret="--interpret" in sys.argv)
        if "--skip-time" in sys.argv:
            return

    rng = np.random.default_rng(4)
    irs = (rng.standard_normal((voices, 60 * SR)) * 0.002).astype(np.float32)
    dt = jnp.bfloat16 if packed else jnp.float32
    cfg, state = farm2.farm2_init(irs, 128, 60 * SR, tail_dtype=dt)
    u = state.tail.segments
    ext2 = state.tail.segments_ir
    n = cfg.tail.seg_count
    tb = cfg.tail_block
    vb = voices * tb
    specs = jnp.asarray(
        (rng.standard_normal((T_BLOCKS, 2, vb)) * 0.1).astype(np.float32)
    )
    print(f"V={voices} n={n} storage={'packed' if packed else 'f32'} "
          f"u={u.nbytes/1e9:.2f}G ext2={ext2.nbytes/1e9:.2f}G", flush=True)

    runners = {}
    for var in ("v1", "v2"):
        def fn(u_, e_, s_, q_, var=var):
            return phased_step(u_, e_, s_, q_, tb, variant=var)

        runners[var] = slope(fn, n)

    def t(r):
        qf, val = r(jnp.asarray(0, jnp.int32), u, ext2, specs)
        _ = float(val)
        best = float("inf")
        for _i in range(2):
            t0 = time.perf_counter()
            qf, val = r(jnp.asarray(0, jnp.int32), u, ext2, specs)
            _ = float(val)
            best = min(best, time.perf_counter() - t0)
        return best

    # warm both variants' compiles before any timing, then alternate
    # endpoints so each A/B shares the contention window
    for var, (r1, r2, c1, c2) in runners.items():
        qf, val = r1(jnp.asarray(0, jnp.int32), u, ext2, specs)
        _ = float(val)
        qf, val = r2(jnp.asarray(0, jnp.int32), u, ext2, specs)
        _ = float(val)
    for _rep in range(2):
        for var, (r1, r2, c1, c2) in runners.items():
            w = max((t(r2) - t(r1)) / (c2 - c1), 1e-9)
            print(f"step {var}: {w*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
