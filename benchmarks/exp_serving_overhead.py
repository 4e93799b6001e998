"""Experiment: per-block serving cost vs ring size — fixed step overhead
or HBM traffic?

The uniform fused Pallas step at N=3750 segments serves at ~9.5 us/blk,
right at its ring+table DMA floor — but the fused two-stage step, whose
per-block working set is ~30x smaller, serves at ~10 us too.  Either the
two-stage step is leaving most of its latency on fixed per-step cost
(kernel launch + scan step machinery), or something else in its step is
traffic-heavy.  This sweeps the UNIFORM kernel over IR lengths (ring row
counts) and prints us/block per N: a flat curve = fixed overhead
dominates (then smaller rings/bf16 packing won't help latency); a linear
curve = traffic dominates (then a packed-bf16 ring/table halves it).

Usage: python -m benchmarks.exp_serving_overhead [--cpu]
"""

from __future__ import annotations

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

import functools

import jax.numpy as jnp

from fft_convolution_tpu.models import uniform
from fft_convolution_tpu.ops import pallas_engine

SR = 48000
BLOCK = 128


def time_chain(step, state0, xs, c1=2, c2=10, reps=2):
    """Two-point slope over scan-chained repetitions of a T-block scan
    (single scalar fetch per run; cancels dispatch constants)."""

    def build(length):
        @jax.jit
        def run(ps):
            def outer(ps, _):
                def body(ps, xb):
                    ps2, y = step(ps, xb)
                    return ps2, jnp.sum(y)
                ps, sums = jax.lax.scan(body, ps, xs)
                return ps, jnp.sum(sums)
            ps, v = jax.lax.scan(outer, ps, None, length=length)
            return ps, jnp.sum(v)

        return run

    r1, r2 = build(c1), build(c2)

    def timed(r):
        _, v = r(state0)
        _ = float(v)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _, v = r(state0)
            _ = float(v)
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = timed(r1), timed(r2)
    return max((t2 - t1) / (c2 - c1), 1e-9)


def main():
    interp = jax.devices()[0].platform != "tpu"
    rng = np.random.default_rng(3)
    t_blocks = 64
    xs = jnp.asarray(
        rng.standard_normal((t_blocks, BLOCK)).astype(np.float32)
    )

    for n_segs in (64, 256, 1024, 3750):
        ir = (rng.standard_normal(n_segs * BLOCK) * 0.01).astype(np.float32)
        ucfg, ustate = uniform.init(ir, BLOCK, len(ir))
        consts, pstate = pallas_engine.from_uniform(ucfg, ustate)
        step = functools.partial(
            pallas_engine.block_step, ucfg, consts, interpret=interp
        )
        wall = time_chain(step, pstate, xs)
        per_block = wall / t_blocks
        traffic = (2 + 4) * n_segs * BLOCK * 4  # ring (2 planes) + doubled table
        floor = traffic / 819e9
        print(
            f"N={n_segs:5d} f32:    {per_block*1e6:7.2f} us/blk "
            f"(ring+table DMA floor {floor*1e6:5.2f} us, "
            f"{floor/per_block*100:5.1f}% of floor)",
            flush=True,
        )

        pconsts, ppstate = pallas_engine.from_uniform_packed(ucfg, ustate)
        pstep = functools.partial(
            pallas_engine.block_step_packed, ucfg, pconsts, interpret=interp
        )
        wall_p = time_chain(pstep, ppstate, xs)
        per_block_p = wall_p / t_blocks
        floor_p = floor / 2
        print(
            f"N={n_segs:5d} packed: {per_block_p*1e6:7.2f} us/blk "
            f"(DMA floor {floor_p*1e6:5.2f} us, "
            f"{floor_p/per_block_p*100:5.1f}% of floor, "
            f"{per_block/per_block_p:4.2f}x the f32 step)",
            flush=True,
        )


if __name__ == "__main__":
    main()
