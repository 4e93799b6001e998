"""Experiment: farm2 per-stage scaling in the voice count.

Config-5 measured 111x/voice at V=32 but 13.6x/voice at V=131 — worse than
linear.  This slope-times the full farm2 stream and the head / big-tail
stages in isolation at a given V so the superlinear stage is identifiable.

Usage: python -m benchmarks.exp_farm_scale [--voices N] [--cpu]
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

from fft_convolution_tpu.models import uniform
from fft_convolution_tpu.parallel import farm, farm2

SR = 48000


def slope_time_threaded(run, state, x, c1=1, c2=3, reps=2, aux=None):
    """Slope timing that THREADS the donated state through the runs instead
    of copying it first — multi-GB farm states would otherwise exist twice
    and OOM (timing does not need a pristine start state).

    ``aux``: optional extra pytree passed to ``run(state, x, aux)`` as a
    traced ARGUMENT — closing over device arrays would serialize them as
    program constants, and the remote-compile relay caps the request
    body (HTTP 413 at a few MB)."""
    import time

    def build(length):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def chained(st, xs, ax):
            def body(s, _):
                s2, y = run(s, xs) if ax is None else run(s, xs, ax)
                return s2, jnp.sum(y)

            sf, sums = jax.lax.scan(body, st, None, length=length)
            return sf, jnp.sum(sums)

        return chained

    r1, r2 = build(c1), build(c2)

    def timed(r, st):
        st, v = r(st, x, aux)
        _ = float(v)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            st, v = r(st, x, aux)
            _ = float(v)
            best = min(best, time.perf_counter() - t0)
        return st, best

    state, t1 = timed(r1, state)
    state, t2 = timed(r2, state)
    return max((t2 - t1) / (c2 - c1), 1e-9), state


def main():
    voices = 32
    for i, a in enumerate(sys.argv):
        if a == "--voices":
            voices = int(sys.argv[i + 1])
    ir_seconds = 60
    block = 128

    rng = np.random.default_rng(4)
    irs = (rng.standard_normal((voices, ir_seconds * SR)) * 0.002).astype(np.float32)
    tail_dtype = jnp.bfloat16 if "--bf16" in sys.argv else jnp.float32
    cfg, state = farm2.farm2_init(irs, block, ir_seconds * SR,
                                  tail_dtype=tail_dtype)
    p = cfg.period
    t = 2 * p
    audio = t * block / SR
    x = jnp.asarray(rng.standard_normal((t, voices, block)).astype(np.float32))
    vx = jnp.swapaxes(x, 0, 1)  # [V, T, B]
    big_rows = jnp.swapaxes(
        vx.reshape(voices, t // p, cfg.tail_block), 0, 1
    )  # [q, V, tb]

    mac = "pallas" if "--pallas" in sys.argv else "jnp"
    prec = "high" if "--prec-high" in sys.argv else "highest"
    print(f"V={voices:4d} tail_dtype={np.dtype(tail_dtype).name} "
          f"(bf16 = plane-packed u32)", flush=True)
    wall, tail_st = slope_time_threaded(
        functools.partial(farm2._tail_corr_phased_fused, cfg.tail, mac=mac,
                          precision=farm2._PRECISIONS[prec]),
        state.tail, big_rows,
    )
    print(f"V={voices:4d} big tail ({mac},{prec}): {wall*1e3:8.2f} ms",
          flush=True)

    wall, head_st = slope_time_threaded(
        lambda st, xs: farm.lockstep_vmap_stream(
            functools.partial(uniform.stream_conv_unguarded, cfg.head), st, xs
        ),
        state.head, vx,
    )
    print(f"V={voices:4d} head:       {wall*1e3:8.2f} ms", flush=True)

    # the stage slopes donated their pieces; reassemble a structurally valid
    # full state (any ring phase is fine — both cores are phase-agnostic)
    state = state._replace(tail=tail_st, head=head_st)
    khat = jax.jit(
        functools.partial(farm2.farm2_head_khat, cfg, dft_precision=prec),
        static_argnums=(1,),
    )(state, t)
    wall, state = slope_time_threaded(
        functools.partial(farm2.farm2_stream, cfg, tail_mac=mac,
                          dft_precision=prec),
        state, x,
    )
    print(
        f"V={voices:4d} full farm2: {wall*1e3:8.2f} ms  "
        f"xrt/voice={audio/wall:8.1f} rt_voices={audio/wall*voices:8.0f}",
        flush=True,
    )
    # with the input-independent head-kernel meta-DFT precomputed (what
    # ReverbFarm.process serves every call with); khat rides as a traced
    # argument, not a baked-in program constant
    wall, _ = slope_time_threaded(
        lambda st, xs, kh: farm2.farm2_stream(
            cfg, st, xs, tail_mac=mac, dft_precision=prec, head_khat=kh
        ),
        state, x, aux=khat,
    )
    print(
        f"V={voices:4d} full+khat:  {wall*1e3:8.2f} ms  "
        f"xrt/voice={audio/wall:8.1f} rt_voices={audio/wall*voices:8.0f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
