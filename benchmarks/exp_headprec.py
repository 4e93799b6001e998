"""Experiment: head meta-DFT precision A/B, ONE window.

VERDICT r2 suggested Precision.HIGH on the compute-bound HEAD DFTs (the
tail measurement doesn't transfer).  The earlier "no speedup" note was
taken on the stacked head path; with the combined 2n-segment kernel now
~38% of the V=128 farm call this re-measures, same window:

  * combined head path, khat-served, HIGHEST (production)
  * combined head path, khat-served, HIGH (3-pass bf16)
  * full khat-served farm2_stream (pallas tail), HIGHEST vs HIGH

and prints the HIGH-vs-HIGHEST output divergence (the farm's contract is
1e-5 abs on unit-scale audio; HIGH is only shippable if parity holds).

Usage: python -m benchmarks.exp_headprec [--voices N] [--bf16] [--cpu]
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

    rng = np.random.default_rng(11)
    irs = (rng.standard_normal((voices, ir_seconds * SR)) * 0.002
           ).astype(np.float32)
    dtype = jnp.bfloat16 if "--bf16" in sys.argv else jnp.float32
    cfg, state = farm2.farm2_init(irs, block, ir_seconds * SR,
                                  tail_dtype=dtype)
    p = cfg.period
    t = 2 * p
    audio = t * block / SR
    x = jnp.asarray(rng.standard_normal((t, voices, block)).astype(np.float32))
    n = cfg.head.seg_count
    hist0 = jnp.zeros((voices, n - 1, 2, block), jnp.float32)
    mac = "jnp" if jax.devices()[0].platform != "tpu" else "pallas"
    print(f"V={voices} n={n} p={p} T={t} mac={mac} tail={np.dtype(dtype).name}", flush=True)

    # ONE pristine heads copy for the parity outputs: the timing arms
    # THREAD (mutate) `state`, so per-arm copies taken inside the loop
    # would sit at different stream positions and the divergence would
    # measure stream position, not precision (the r03 log's 7.6e-1
    # "divergence" was exactly that artifact)
    heads_parity = jax.tree.map(jnp.copy, (state.head, state.tail0))
    outs = {}
    for prec in ("highest", "high", "bf16"):
        khat = jax.jit(
            functools.partial(farm2.farm2_head_khat, cfg, dft_precision=prec),
            static_argnums=(1,),
        )(state, t)
        precision = farm2._PRECISIONS[prec]

        def combined(st, xs, kh, precision=precision):
            st_h, st_t0 = st
            st_h2, st_t02, y, _hist = farm2._heads_fused(
                cfg, st_h, st_t0, jnp.swapaxes(xs, 0, 1), hist0,
                suppress_flags=jnp.zeros((voices,), jnp.int32), precision=precision, khat=kh,
            )
            return (st_h2, st_t02), y

        # keep the head output ON DEVICE: the divergence is fetched as a
        # scalar at the end (bulk device->host fetches crawl via the relay);
        # no donation in this jit, so the shared pristine copy is safe
        outs[prec] = jax.jit(combined)(heads_parity, x, khat)[1]
        wall_h, _ = slope_time_threaded(
            combined, jax.tree.map(jnp.copy, (state.head, state.tail0)),
            x, aux=khat,
        )
        # THREAD the multi-GB farm state through the arms instead of
        # copying per arm (timing needs no pristine state; an f32 V=128
        # state exists twice otherwise and OOMs the 16 GB chip)
        wall_f, state = slope_time_threaded(
            lambda st, xs, kh, prec=prec: farm2.farm2_stream(
                cfg, st, xs, tail_mac=mac, dft_precision=prec, head_khat=kh
            ),
            state, x, aux=khat,
        )
        print(f"prec={prec:8s}: heads {wall_h*1e3:7.2f} ms   "
              f"full {wall_f*1e3:7.2f} ms  "
              f"rt_voices={audio/wall_f*voices:7.0f}", flush=True)

    scale = float(jnp.maximum(jnp.max(jnp.abs(outs["highest"])), 1e-30))
    div = float(jnp.max(jnp.abs(outs["high"] - outs["highest"])))
    div_bf = float(jnp.max(jnp.abs(outs["bf16"] - outs["highest"])))
    print(f"head output divergence high vs highest: "
          f"{div:.3e} abs, {div / scale:.3e} rel; bf16 vs highest: "
          f"{div_bf / scale:.3e} rel", flush=True)


if __name__ == "__main__":
    main()
