"""Experiment: packed-bf16 vs f32 storage for the Pallas serving kernels,
swept over IR length in ONE process / one relay window — the measured
crossover behind ``storage="auto"``.

Two kernels, each A/B'd at several segment counts:

* the VMEM-resident per-block step (``pallas_engine.block_step`` vs
  ``block_step_packed``): DMA halves with packing but the unpack adds
  VPU issue — BENCH_r03 measured packed SLOWER at N=3750 (10.3 vs
  7.4 us), so the win, if any, is at larger N / where only packed fits;
* the grid-streaming kernel (``pallas_stream``): IR tables stream from
  HBM every block, so packing halves the dominant traffic — CLAUDE.md
  records packed winning at N=11264.

Latency methodology: two-point slope over scanned step chains (the relay
constant cancels; see bench.py).

Usage: python -m benchmarks.exp_packed_crossover [--cpu]
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

SR = 48000
BLOCK = 128


def slope(step_fn, state0, xs1, xs2):
    """Two-point slope of a scanned per-block step chain with the relay
    hygiene of bench.slope_timed (intercept validation + physical floor +
    retries — plain best-of-3 returned negative deltas in degraded
    windows)."""
    import functools

    from bench import slope_timed

    @functools.partial(jax.jit, static_argnums=())
    def chain(st, xs):
        def body(s, xb):
            s2, y = step_fn(s, xb)
            return s2, jnp.sum(y)

        sf, sums = jax.lax.scan(body, st, xs)
        return sf, jnp.sum(sums)

    def build(c):
        xs = {xs1.shape[0]: xs1, xs2.shape[0]: xs2}[c]

        def run():
            _, v = chain(state0, xs)
            _ = float(v)

        return run

    w, _raw = slope_timed(build, xs1.shape[0], xs2.shape[0], "step",
                          min_slope_s=1e-6, samples=2, retries=3,
                          sample_pause_s=15.0)
    return w


def main() -> None:
    from fft_convolution_tpu.models import uniform
    from fft_convolution_tpu.ops import pallas_engine, pallas_stream

    interp = jax.devices()[0].platform != "tpu"
    rng = np.random.default_rng(5)
    n1, n2 = 64, 512
    x1 = jnp.asarray(rng.standard_normal((n1, BLOCK)).astype(np.float32))
    x2 = jnp.asarray(rng.standard_normal((n2, BLOCK)).astype(np.float32))

    print("== VMEM-resident per-block step (pallas_engine) ==", flush=True)
    for secs in (2, 5, 10, 16):
        ir = (rng.standard_normal(secs * SR) * 0.01).astype(np.float32)
        cfg = uniform.make_config(BLOCK, len(ir))
        row = [f"N={cfg.seg_count:5d} ({secs:2d}s)"]
        for packed in (False, True):
            fits = (pallas_engine.fits_vmem_packed if packed
                    else pallas_engine.fits_vmem)(cfg)
            if not fits:
                row.append(f"{'packed' if packed else 'f32'}: over-VMEM")
                continue
            _, ust = uniform.init(ir, BLOCK, len(ir))
            build = (pallas_engine.from_uniform_packed if packed
                     else pallas_engine.from_uniform)
            consts, pstate = build(cfg, ust)
            step = (pallas_engine.block_step_packed if packed
                    else pallas_engine.block_step)

            def step_fn(s, xb, _step=step, _c=consts):
                return _step(cfg, _c, s, xb, interpret=interp)

            w = slope(step_fn, pstate, x1, x2)
            row.append(f"{'packed' if packed else 'f32'}: {w*1e6:6.2f} us/blk")
        print("  ".join(row), flush=True)

    print("== grid-streaming kernel (pallas_stream), T=64-block calls ==",
          flush=True)
    c1, c2 = 2, 10
    t_call = 64
    xs = jnp.asarray(
        rng.standard_normal((t_call, BLOCK)).astype(np.float32))
    for secs in (5, 10, 20, 30):
        ir = (rng.standard_normal(secs * SR) * 0.01).astype(np.float32)
        cfg0 = uniform.make_config(BLOCK, len(ir))
        chunk = min(512, cfg0.seg_count)
        n = pallas_stream.padded_seg_count(cfg0.seg_count, chunk)
        cfg = uniform.make_config(BLOCK, n * BLOCK)
        _, ust = uniform.init(ir, BLOCK, n * BLOCK)
        row = [f"N={n:5d} ({secs:2d}s)"]
        for packed in (False, True):
            build = (pallas_stream.build_consts_packed if packed
                     else pallas_stream.build_consts)
            consts = build(ust.segments_ir, n, BLOCK)
            state0 = pallas_stream.zero_state(n, BLOCK)

            import functools

            @functools.partial(jax.jit, static_argnums=(3,))
            def chain(consts, st, xb, length):
                def body(s, _):
                    s2, y = pallas_stream.stream(
                        cfg, consts, s, xb, chunk=chunk, interpret=interp
                    )
                    return s2, jnp.sum(y)

                sf, sums = jax.lax.scan(body, st, None, length=length)
                return sf, jnp.sum(sums)

            from bench import slope_timed

            def build_run(c, _chain=chain, _consts=consts):
                def run():
                    _, v = _chain(_consts, state0, xs, c)
                    _ = float(v)

                return run

            w, _raw = slope_timed(build_run, c1, c2, "grid",
                                  min_slope_s=1e-5, samples=2, retries=3,
                                  sample_pause_s=15.0)
            w = w / t_call
            row.append(f"{'packed' if packed else 'f32'}: {w*1e6:6.2f} us/blk")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
