"""Experiment: farm2_stream call length (tail periods per call), ONE window.

The phased tail kernel's table-window DMA is per CALL while the head
meta-DFT work scales with T, so the best periods-per-call is a tradeoff
(and storage-dependent: packed bf16 halves the window bytes).  Cross-
window exp_heads runs disagreed by more than the effect size — this
sweeps q in one process, interleaved, khat-served, full farm2_stream.

Usage: python -m benchmarks.exp_qsweep [--voices N] [--bf16]
"""

from __future__ import annotations

import functools
import sys

import numpy as np

import jax
import jax.numpy as jnp

from benchmarks.exp_farm_scale import slope_time_threaded
from fft_convolution_tpu.parallel import farm2

SR = 48000


def main() -> None:
    voices = 128
    for i, a in enumerate(sys.argv):
        if a == "--voices":
            voices = int(sys.argv[i + 1])
    tail_dtype = jnp.bfloat16 if "--bf16" in sys.argv else jnp.float32
    block, ir_seconds = 128, 60

    rng = np.random.default_rng(11)
    irs = (rng.standard_normal((voices, ir_seconds * SR)) * 0.002
           ).astype(np.float32)
    cfg, state = farm2.farm2_init(irs, block, ir_seconds * SR,
                                  tail_dtype=tail_dtype)
    p = cfg.period
    mac = "jnp" if jax.devices()[0].platform != "tpu" else "pallas"
    # production defaults (ReverbFarm dft_precision="auto"): bf16 head
    # transforms on packed farms, highest on f32 farms
    prec = "bf16" if tail_dtype == jnp.bfloat16 else "highest"
    print(f"V={voices} p={p} storage="
          f"{'packed' if tail_dtype == jnp.bfloat16 else 'f32'} mac={mac} "
          f"heads={prec}",
          flush=True)

    qs = (2, 4, 8)
    khats, xs = {}, {}
    for q in qs:
        t = q * p
        khats[q] = jax.jit(
            functools.partial(farm2.farm2_head_khat, cfg,
                              dft_precision=prec),
            static_argnums=(1,))(state, t)
        xs[q] = jnp.asarray(
            rng.standard_normal((t, voices, block)).astype(np.float32)
        )

    def run(st, x, kh):
        return farm2.farm2_stream(cfg, st, x, tail_mac=mac,
                                  dft_precision=prec, head_khat=kh)

    # thread ONE state through all arms (a second V=128 f32 state OOMs);
    # two interleaved passes so every q sees the same window
    for _rep in range(2):
        for q in qs:
            wall, state = slope_time_threaded(run, state, xs[q],
                                              aux=khats[q])
            audio = q * p * block / SR
            print(f"  q={q}: {wall*1e3:8.2f} ms/call  "
                  f"xrt/voice={audio/wall:7.1f} "
                  f"rt_voices={audio/wall*voices:7.0f}", flush=True)


if __name__ == "__main__":
    main()
