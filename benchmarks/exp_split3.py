"""Experiment: manual 3-term split-float matmul vs HIGHEST, ONE window.

The farm/flagship meta-DFT matmul cluster runs at Precision.HIGHEST —
six bf16 MXU passes per f32 matmul on TPU.  Three passes (hi*hi + hi*lo
+ lo*hi) give ~2e-6 relative, plenty for the 1e-5 stream contract, but
this backend's Precision.HIGH measured a 7.6e-1 head divergence
(exp_headprec — broken, not bf16x3).  This A/Bs a MANUAL split-float
against HIGHEST and DEFAULT on the production head meta-DFT shapes:
wall (chained slope) + max rel error vs float64 numpy.

Usage: python -m benchmarks.exp_split3 [--m M] [--v V]
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def _split(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def mm_split3(mat, arr):
    """einsum('ki,...ijl->...kjl') with 3 bf16 passes (~2e-6 rel)."""
    mh, ml = _split(mat)
    ah, al = _split(arr)

    def e(a, b):
        return jnp.einsum("ki,...ijl->...kjl", a, b,
                          preferred_element_type=jnp.float32)

    return e(mh, ah) + e(mh, al) + e(ml, ah)


def mm_prec(mat, arr, prec):
    return jnp.einsum("ki,...ijl->...kjl", mat, arr,
                      preferred_element_type=jnp.float32, precision=prec)


def main() -> None:
    v, m, lanes = 128, 1024, 128
    for i, a in enumerate(sys.argv):
        if a == "--m":
            m = int(sys.argv[i + 1])
        if a == "--v":
            v = int(sys.argv[i + 1])
    n1 = n2 = int(np.sqrt(m))
    assert n1 * n2 == m

    rng = np.random.default_rng(5)
    mat64 = rng.standard_normal((n2, n2))
    arr64 = rng.standard_normal((v, n2, n1, lanes))
    want = np.einsum("ki,vijl->vkjl", mat64, arr64)
    scale = np.abs(want).max()
    mat = jnp.asarray(mat64.astype(np.float32))
    arr = jnp.asarray(arr64.astype(np.float32))

    arms = {
        "highest": lambda M, A: mm_prec(M, A, jax.lax.Precision.HIGHEST),
        "split3 ": mm_split3,
        "default": lambda M, A: mm_prec(M, A, jax.lax.Precision.DEFAULT),
    }

    runners = {}
    for name, f in arms.items():
        got = np.asarray(jax.jit(f)(mat, arr))
        rel = np.abs(got - want).max() / scale

        def build(length, f=f):
            @jax.jit
            def chained(M, A):
                def body(c, _):
                    out = f(M, c)
                    # feed back with a reshape so shapes close (n1==n2)
                    return out, jnp.sum(out)

                cf, s = jax.lax.scan(body, A, None, length=length)
                return cf, jnp.sum(s)

            return chained

        runners[name] = (build(2), build(10), rel)
        for r in runners[name][:2]:
            _ = float(r(mat, arr)[1])

    def t(r):
        best = float("inf")
        for _i in range(2):
            t0 = time.perf_counter()
            _ = float(r(mat, arr)[1])
            best = min(best, time.perf_counter() - t0)
        return best

    print(f"einsum ki,vijl->vkjl [{n2}x{n2}] x [{v},{n2},{n1},{lanes}]",
          flush=True)
    for _rep in range(2):
        for name, (r1, r2, rel) in runners.items():
            w = max((t(r2) - t(r1)) / 8, 1e-9)
            print(f"  {name}: {w*1e3:7.3f} ms/apply  rel_vs_f64 {rel:.2e}",
                  flush=True)


if __name__ == "__main__":
    main()
