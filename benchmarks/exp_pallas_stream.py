"""Experiment: grid-streaming Pallas kernel at the 30 s IR config on TPU.

``--packed``: bf16-packed IR table (half the streamed bytes).

Parity (first blocks vs direct convolution) + per-block device latency via
the two-point slope over T1/T2-block calls.

Usage: python -m benchmarks.exp_pallas_stream [--seconds N] [--packed] [--cpu]
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

import jax.numpy as jnp

SR = 48000


def main():
    seconds = 30
    for i, a in enumerate(sys.argv):
        if a == "--seconds":
            seconds = int(sys.argv[i + 1])
    b = 128

    from fft_convolution_tpu.serving import PallasStreamingConvolver

    rng = np.random.default_rng(0)
    ir = (rng.standard_normal(seconds * SR) * 0.005).astype(np.float32)
    t0 = time.perf_counter()
    storage = "bf16_packed" if "--packed" in sys.argv else "float32"
    conv = PallasStreamingConvolver(ir, b, len(ir), storage=storage)
    print(f"init {time.perf_counter()-t0:.1f}s  N={conv.cfg.seg_count} "
          f"chunk={conv._chunk} storage={storage}", flush=True)

    # parity gate: first 4096 samples vs direct convolution
    n_check = 4096
    x = rng.standard_normal(b * 32).astype(np.float32)
    t0 = time.perf_counter()
    y = conv.process(x)
    print(f"first call (compile+run): {time.perf_counter()-t0:.1f}s", flush=True)
    exp = np.convolve(
        x[:n_check].astype(np.float64), ir[:n_check].astype(np.float64)
    )[:n_check]
    err = np.abs(y[:n_check] - exp).max()
    rel = err / max(np.abs(exp).max(), 1e-30)
    print(f"parity: {err:.3e} abs, {rel:.3e} rel", flush=True)
    assert rel < (5e-3 if storage == "bf16_packed" else 1e-4)

    # latency: slope over T1 vs T2 block calls (chained by engine state)
    def timed(t_blocks, reps=3):
        xs = rng.standard_normal(b * t_blocks).astype(np.float32)
        conv.process(xs)  # warm/compile
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            y = conv.process(xs)
            _ = float(y[-1])  # y is host np already
            best = min(best, time.perf_counter() - t0)
        return best

    t1n, t2n = 64, 512
    w1 = timed(t1n)
    w2 = timed(t2n)
    per_block = (w2 - w1) / (t2n - t1n)
    print(f"per-block: {per_block*1e6:.1f} us (raw {w1*1e3:.1f}/{w2*1e3:.1f} ms "
          f"over {t1n}/{t2n} blocks)", flush=True)


if __name__ == "__main__":
    main()
