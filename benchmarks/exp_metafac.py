"""Experiment: meta-DFT 4-step factorization A/B, ONE window.

The combined-head FDL's meta-DFTs (`ops/fft._cdft4_axis2`, m=1024 at the
V=128 farm head shapes) are the largest cumulative line item in the
HLO-cost mining (the fft.py dot_general cluster, ~15%).  The default
near-sqrt split gives [32, 32]-contraction matmul stages; the MXU's
systolic array is 128x128, so small contractions may underuse it.  This
times the same transform across (n1, n2) splits on the PRODUCTION head
shapes — [V, m, L] = [128, 1024, 128] complex — forward+inverse chained
(state-dependency through both, single scalar fetch, two-point slope).

Usage: python -m benchmarks.exp_metafac [--voices N] [--m M]
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from fft_convolution_tpu.ops.fft import _cdft4_axis2


def main() -> None:
    v, m, lanes = 128, 1024, 128
    for i, a in enumerate(sys.argv):
        if a == "--voices":
            v = int(sys.argv[i + 1])
        if a == "--m":
            m = int(sys.argv[i + 1])

    rng = np.random.default_rng(3)
    re0 = jnp.asarray(rng.standard_normal((v, m, lanes)).astype(np.float32))
    im0 = jnp.asarray(rng.standard_normal((v, m, lanes)).astype(np.float32))
    print(f"shapes [V={v}, m={m}, L={lanes}] fwd+inv per iteration",
          flush=True)

    splits = []
    n1 = m
    while n1 >= 1:
        n2 = m // n1
        if 4 <= n2 <= m // 4 or n1 == n2:
            splits.append((n1, n2))
        n1 //= 2
    splits = [s for s in splits if s[0] >= s[1] or s in ((8, 128), (16, 64))]

    def build(factors, length):
        @jax.jit
        def chained(re, im):
            def body(c, _):
                r, i = c
                fr, fi = _cdft4_axis2(r, i, m, -1.0, factors=factors)
                br, bi = _cdft4_axis2(fr, fi, m, 1.0, scale=1.0 / m,
                                      factors=factors)
                return (br, bi), jnp.sum(br)

            cf, sums = jax.lax.scan(body, (re, im), None, length=length)
            return cf, jnp.sum(sums)

        return chained

    runners = {}
    for s in splits:
        runners[s] = (build(s, 2), build(s, 10))
        # warm compiles before any timing
        for r in runners[s]:
            _ = float(r(re0, im0)[1])

    def t(r):
        best = float("inf")
        for _i in range(2):
            t0 = time.perf_counter()
            _ = float(r(re0, im0)[1])
            best = min(best, time.perf_counter() - t0)
        return best

    # round-trip parity vs the default split (both ~f32 roundoff of m-sum)
    base = None
    for s in splits:
        (r1, _r2) = runners[s][0], None
        cf, _ = r1(re0, im0)
        val = np.asarray(cf[0][:1, :4, :4])
        if base is None:
            base = val
        rel = np.abs(val - base).max() / max(np.abs(base).max(), 1e-9)
        for _rep in range(2):
            pass
        w = max((t(runners[s][1]) - t(runners[s][0])) / 8, 1e-9)
        print(f"  n1={s[0]:4d} n2={s[1]:4d}: {w*1e3:7.2f} ms/iter "
              f"(rel vs first {rel:.1e})", flush=True)


if __name__ == "__main__":
    main()
