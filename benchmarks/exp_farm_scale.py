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

from benchmarks.exp_farm_tail import slope_time
from fft_convolution_tpu.models import uniform
from fft_convolution_tpu.parallel import farm, farm2

SR = 48000


def main():
    voices = 32
    for i, a in enumerate(sys.argv):
        if a == "--voices":
            voices = int(sys.argv[i + 1])
    ir_seconds = 60
    block = 128

    rng = np.random.default_rng(4)
    irs = (rng.standard_normal((voices, ir_seconds * SR)) * 0.002).astype(np.float32)
    cfg, state = farm2.farm2_init(irs, block, ir_seconds * SR)
    p = cfg.period
    t = 2 * p
    audio = t * block / SR
    x = jnp.asarray(rng.standard_normal((t, voices, block)).astype(np.float32))
    vx = jnp.swapaxes(x, 0, 1)  # [V, T, B]
    big_rows = jnp.swapaxes(
        vx.reshape(voices, t // p, cfg.tail_block), 0, 1
    )  # [q, V, tb]

    wall = slope_time(
        lambda st, xs: farm.lockstep_vmap_stream(
            functools.partial(uniform.stream_conv_unguarded, cfg.head), st, xs
        ),
        state.head, vx,
    )
    print(f"V={voices:4d} head:       {wall*1e3:8.2f} ms", flush=True)

    wall = slope_time(
        functools.partial(farm2._tail_corr_phased_fused, cfg.tail),
        state.tail, big_rows,
    )
    print(f"V={voices:4d} big tail:   {wall*1e3:8.2f} ms", flush=True)

    wall = slope_time(functools.partial(farm2.farm2_stream, cfg), state, x)
    print(
        f"V={voices:4d} full farm2: {wall*1e3:8.2f} ms  "
        f"xrt/voice={audio/wall:8.1f} rt_voices={audio/wall*voices:8.0f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
