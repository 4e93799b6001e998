"""Experiment: ``tail_dft_precision`` A/B on the packed-bf16 farm, ONE
window (the chip is time-shared — only same-window A/Bs are comparable).

The V=128 cost mining (benchmarks/exp_cost) puts the big tail's forward/
inverse block DFTs at ~4.6 ms of the 21.9 ms packed-bf16 call — f32
HIGHEST matmuls (six bf16 MXU passes each) feeding a tail contribution
that already carries ~1e-3 relative from the packed storage.
``tail_dft_precision="bf16"`` (ops/fft._mm_mode) runs those matmuls on
bf16 operands: one pass, half the inter-stage traffic, same accuracy
tier (CPU-measured: 1.8e-3 storage-only -> 4.3e-3 with bf16 DFTs).

This script slope-times the full khat-served farm2_stream (pallas tail)
with tail_dft_precision "highest" vs "bf16" in one window, and gates the
A/B with an ON-DEVICE divergence scalar over chained calls (bulk
device->host fetches crawl through the relay; only scalars come back).

MEASURED (TPU, 2026-08-18, V=128 packed-bf16 storage, one window):
highest 23.28 ms vs bf16 24.73 ms full call — the bf16 DFT mode LOSES
~6%: those matmul stages are memory-bound (same finding as the
Precision.HIGH A/B in exp_headprec), so cutting MXU passes 6x buys
nothing while the operand casts add real traffic.  Divergence gate
3.8e-3 rel (the expected ~1e-3 tier).  Consequence: ReverbFarm's
tail_dft_precision="auto" resolves to "highest"; the knob remains for
other shapes.

Usage: python -m benchmarks.exp_taildft [--voices N] [--cpu] [--f32]
"""

from __future__ import annotations

import functools
import sys

import numpy as np

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
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
    ir_seconds = 60
    block = 128
    tail_dtype = jnp.float32 if "--f32" in sys.argv else jnp.bfloat16

    rng = np.random.default_rng(11)
    irs = (rng.standard_normal((voices, ir_seconds * SR)) * 0.002
           ).astype(np.float32)
    cfg, state = farm2.farm2_init(irs, block, ir_seconds * SR,
                                  tail_dtype=tail_dtype)
    p = cfg.period
    t = 2 * p
    audio = t * block / SR
    x = jnp.asarray(rng.standard_normal((t, voices, block)).astype(np.float32))
    mac = "jnp" if jax.devices()[0].platform != "tpu" else "pallas"
    print(f"V={voices} n={cfg.head.seg_count} p={p} T={t} mac={mac} "
          f"tail_dtype={np.dtype(tail_dtype).name}", flush=True)

    khat = jax.jit(functools.partial(farm2.farm2_head_khat, cfg),
                   static_argnums=(1,))(state, t)

    # --- divergence gate: 3 chained calls per arm (the tail contribution
    # is two periods delayed — the third call carries it), compared as an
    # on-device max-abs scalar.  One extra state copy (~3 GB packed bf16
    # at V=128) is affordable; the f32 farm would not fit twice.
    def chained3(prec):
        @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(3,))
        def run(st, xs, kh, prec):
            def body(s, _):
                s2, y = farm2.farm2_stream(cfg, s, xs, tail_mac=mac,
                                           head_khat=kh,
                                           tail_dft_precision=prec)
                return s2, y

            sf, ys = jax.lax.scan(body, st, None, length=3)
            return sf, ys

        return lambda st: run(st, x, khat, prec)

    if tail_dtype == jnp.bfloat16:
        st_b = jax.tree.map(jnp.copy, state)
        _, ys_hi = chained3("highest")(state)
        state, ys_bf = chained3("bf16")(st_b)
        scale = jnp.max(jnp.abs(ys_hi))
        rel = float(jnp.max(jnp.abs(ys_bf - ys_hi)) / scale)
        del ys_hi, ys_bf
        print(f"divergence bf16 vs highest tail DFTs (3 calls): "
              f"{rel:.3e} rel", flush=True)
        assert rel < 1e-2, "bf16 tail DFTs left the ~1e-3 tier"

    # --- same-window slope A/B, threading the donated state through arms
    for prec in ("highest", "bf16"):
        wall, state = slope_time_threaded(
            lambda st, xs, kh, prec=prec: farm2.farm2_stream(
                cfg, st, xs, tail_mac=mac, head_khat=kh,
                tail_dft_precision=prec,
            ),
            state, x, aux=khat,
        )
        print(f"tail_dft={prec:8s}: full {wall*1e3:7.2f} ms  "
              f"xrt/voice={audio/wall:7.1f} "
              f"rt_voices={audio/wall*voices:7.0f}", flush=True)


if __name__ == "__main__":
    main()
