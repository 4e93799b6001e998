"""Regenerate the recorded golden for the compare_partitioned workload.

The workload is the reference example verbatim
(``examples/compare_partitioned.rs:9-26``): a 128,000-sample 1 kHz sinusoid
IR convolved with 64,000 samples of a 1.3 kHz sinusoid at 44.1 kHz
(block 64 x 1000 blocks).  The golden is the direct convolution computed in
float64 (scipy-free: one FFT-based np.convolve), cast to float32 for
storage — both engines must match it within the reference's 1000-block
stream tolerance of 1e-5 (``src/tests.rs:126``).

Usage: python tests/golden/make_golden.py
"""

import pathlib

import numpy as np


def sinusoid(n: int, freq: float, sr: float, gain: float) -> np.ndarray:
    """float64 sinusoid matching ``examples/util/mod.rs:7-19`` (cast f32)."""
    i = np.arange(n, dtype=np.float64)
    return (gain * np.sin(2.0 * np.pi * freq * i / sr)).astype(np.float32)


def main() -> None:
    sr = 44100
    ir = sinusoid(128_000, 1000.0, sr, 0.1)
    x = sinusoid(64 * 1000, 1300.0, sr, 0.1)
    y = np.convolve(x.astype(np.float64), ir.astype(np.float64))[: len(x)]
    out = pathlib.Path(__file__).parent / "compare_partitioned.npz"
    np.savez_compressed(out, y=y.astype(np.float32))
    print(f"wrote {out} ({out.stat().st_size} bytes), "
          f"max|y|={np.abs(y).max():.6f}")


if __name__ == "__main__":
    main()
