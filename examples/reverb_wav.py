"""End-to-end WAV reverb: load (or synthesize) audio, convolve with an IR,
write the wet mix — the deployment-shaped demo around the native WAV codec
and the streaming engine.

Usage:
  python examples/reverb_wav.py [--in dry.wav] [--ir ir.wav] [--out wet.wav]
         [--engine uniform|two_stage] [--block 128] [--cpu]

Without ``--in``/``--ir`` a synthetic drum loop and exponentially decaying
noise reverb are generated, so the demo is self-contained.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def synth_drums(sr: int, seconds: float):
    import numpy as np

    n = int(sr * seconds)
    out = np.zeros(n, np.float32)
    rng = np.random.default_rng(7)
    for beat in range(int(seconds * 4)):
        at = int(beat * sr / 4)
        dur = min(2000, n - at)
        env = np.exp(-np.arange(dur) / (sr * 0.01 if beat % 4 else sr * 0.05))
        tone = np.sin(2 * np.pi * (60 if beat % 4 == 0 else 180)
                      * np.arange(dur) / sr)
        noise = rng.standard_normal(dur) * (0.4 if beat % 2 else 0.05)
        out[at:at + dur] += ((tone + noise) * env * 0.5).astype(np.float32)
    return np.clip(out, -1, 1)


def synth_reverb_ir(sr: int, seconds: float):
    import numpy as np

    n = int(sr * seconds)
    rng = np.random.default_rng(8)
    ir = rng.standard_normal(n).astype(np.float32)
    ir *= np.exp(-np.arange(n) / (sr * seconds / 6)).astype(np.float32)
    ir[0] = 1.0  # direct sound
    return (ir / np.abs(ir).sum() * 8).astype(np.float32)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="inp", default=None)
    ap.add_argument("--ir", default=None)
    ap.add_argument("--out", default="wet.wav")
    ap.add_argument("--engine", default="two_stage",
                    choices=["uniform", "two_stage"])
    ap.add_argument("--block", type=int, default=128)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from fft_convolution_tpu import FFTConvolver, TwoStageFFTConvolver
    from fft_convolution_tpu.utils.audio import load_wav, save_wav

    sr = 48000
    if args.inp:
        dry, sr = load_wav(args.inp)
    else:
        dry = synth_drums(sr, 4.0)
    if args.ir:
        ir, _ = load_wav(args.ir)
        ir = ir.astype(np.float32)
    else:
        ir = synth_reverb_ir(sr, 3.0)

    cls = FFTConvolver if args.engine == "uniform" else TwoStageFFTConvolver
    conv = cls(ir, args.block, len(ir))
    conv.process(dry)  # warm the compile
    conv.reset()

    t0 = time.perf_counter()
    wet = conv.process(dry)
    dt = time.perf_counter() - t0
    print(f"{args.engine}: {len(dry)/sr:.2f} s audio with a {len(ir)/sr:.2f} s IR "
          f"in {dt*1e3:.1f} ms ({len(dry)/sr/dt:.0f}x realtime incl. host I/O)")

    mix = np.clip(0.7 * dry + 0.6 * wet[: len(dry)], -1, 1)
    save_wav(args.out, mix, sr)
    print(f"Saved: {args.out}")


if __name__ == "__main__":
    main()
