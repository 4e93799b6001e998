"""Parity + timing of uniform vs two-stage convolution.

Port of the reference example (``examples/compare_partitioned.rs:9-68``):
128,000-sample sinusoid IR (~2.9 s @ 44.1 kHz), block = 64, 1000 blocks;
prints per-engine wall time and the max_abs_diff parity figure, and writes
both outputs as WAVs.

Run: ``python examples/compare_partitioned.py [--cpu]``
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SAMPLE_RATE = 44100


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="force the JAX CPU backend")
    ap.add_argument("--outdir", default=".", help="where to write WAVs")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from fft_convolution_tpu import FFTConvolver, TwoStageFFTConvolver
    from fft_convolution_tpu.utils.audio import generate_sinusoid, save_wav

    block_size = 64
    n_blocks = 1000
    response_len = 128_000

    response = generate_sinusoid(response_len, 1000.0, SAMPLE_RATE, 0.1)
    convolver_a = FFTConvolver(response, block_size, len(response))
    convolver_b = TwoStageFFTConvolver(response, block_size, len(response))
    input = generate_sinusoid(n_blocks * block_size, 1300.0, SAMPLE_RATE, 0.1)

    # warm the compiles (same shapes as the timed run) so timing matches the
    # reference's steady-state loop — the Rust crate has no JIT to warm
    convolver_a.process(input); convolver_a.reset()
    convolver_b.process(input); convolver_b.reset()

    t0 = time.perf_counter()
    output_a = convolver_a.process(input)
    print(f"Uniform took = {(time.perf_counter() - t0) * 1000.0:.2f} ms")

    t0 = time.perf_counter()
    output_b = convolver_b.process(input)
    print(f"Partitioned took = {(time.perf_counter() - t0) * 1000.0:.2f} ms")

    max_abs_diff = float(np.abs(output_a - output_b).max())
    print(f"max_abs_diff = {max_abs_diff}")

    save_wav(os.path.join(args.outdir, "output_a.wav"), output_a, SAMPLE_RATE)
    print(f"Saved: {os.path.join(args.outdir, 'output_a.wav')}")
    save_wav(os.path.join(args.outdir, "output_b.wav"), output_b, SAMPLE_RATE)
    print(f"Saved: {os.path.join(args.outdir, 'output_b.wav')}")


if __name__ == "__main__":
    main()
