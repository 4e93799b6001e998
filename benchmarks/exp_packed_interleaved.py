"""Experiment: settle the packed-vs-f32 serving crossover (VERDICT r4 #5).

The r03/r04 grid-streamer orderings DISAGREED (packed won at N=11264 in
r03, lost in r04; exp_packed_crossover is window-unstable even with slope
hygiene) because each storage was measured in its own window on a
time-shared chip.  Here the two storages are INTERLEAVED inside every
window — f32(c1), packed(c1), f32(c2), packed(c2) back to back, best-of-3
each — so contention hits both nearly equally, and the PER-WINDOW slope
ordering is the signal.  Several windows spaced minutes apart give the
consistency check; the decision rule is the per-window sign of
(packed - f32), not any cross-window magnitude.

Covers both serving kernels that storage="auto" routes:
  * pallas_engine per-block step (VMEM-resident)
  * pallas_stream grid streamer (HBM-streamed tables) — the unstable one

Usage: python -m benchmarks.exp_packed_interleaved [--cpu]
       [--windows W] [--pause S]
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import jax.numpy as jnp

SR = 48000
BLOCK = 128


def _best3(run):
    run()
    b = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        b = min(b, time.perf_counter() - t0)
    return b


def interleaved_slopes(runs_f32, runs_pk, c1, c2, windows, pause, label):
    """Per-window interleaved two-point slopes for both storages.

    ``runs_*[c]`` is a nullary chained runner.  Returns a list of
    (slope_f32, slope_pk) per window (invalid windows — negative deltas —
    are recorded as None and excluded from the verdict)."""
    # warm all four programs before the first window
    for r in (runs_f32[c1], runs_pk[c1], runs_f32[c2], runs_pk[c2]):
        r()
    out = []
    for w in range(windows):
        if w:
            time.sleep(pause)
        tf1 = _best3(runs_f32[c1])
        tp1 = _best3(runs_pk[c1])
        tf2 = _best3(runs_f32[c2])
        tp2 = _best3(runs_pk[c2])
        sf = (tf2 - tf1) / (c2 - c1)
        sp = (tp2 - tp1) / (c2 - c1)
        ok = sf > 0 and sp > 0
        out.append((sf, sp) if ok else None)
        print(f"  {label} window {w}: f32 {sf*1e6:8.2f} us  "
              f"packed {sp*1e6:8.2f} us  "
              f"{'packed wins' if ok and sp < sf else 'f32 wins' if ok else 'INVALID (negative delta)'}",
              flush=True)
    valid = [o for o in out if o is not None]
    if valid:
        wins = sum(1 for sf, sp in valid if sp < sf)
        print(f"  {label} verdict: packed wins {wins}/{len(valid)} valid "
              f"windows; median f32 "
              f"{np.median([sf for sf, _ in valid])*1e6:.2f} us, packed "
              f"{np.median([sp for _, sp in valid])*1e6:.2f} us", flush=True)
    return out


def main() -> None:
    windows, pause = 5, 60.0
    for i, a in enumerate(sys.argv):
        if a == "--windows":
            windows = int(sys.argv[i + 1])
        if a == "--pause":
            pause = float(sys.argv[i + 1])
    if jax.devices()[0].platform != "tpu":
        pause = 0.0

    from fft_convolution_tpu.models import uniform
    from fft_convolution_tpu.ops import pallas_engine, pallas_stream

    interp = jax.devices()[0].platform != "tpu"
    rng = np.random.default_rng(5)

    # ---- per-block engine step (VMEM-resident) --------------------------
    c1, c2 = 64, 512
    x1 = jnp.asarray(rng.standard_normal((c1, BLOCK)).astype(np.float32))
    x2 = jnp.asarray(rng.standard_normal((c2, BLOCK)).astype(np.float32))
    print("== pallas_engine per-block step, interleaved ==", flush=True)
    for secs in (5, 10):
        ir = (rng.standard_normal(secs * SR) * 0.01).astype(np.float32)
        cfg = uniform.make_config(BLOCK, len(ir))
        if not pallas_engine.fits_vmem_packed(cfg):
            continue
        _, ust = uniform.init(ir, BLOCK, len(ir))
        runs = {}
        for packed in (False, True):
            if not packed and not pallas_engine.fits_vmem(cfg):
                runs[packed] = None
                continue
            build = (pallas_engine.from_uniform_packed if packed
                     else pallas_engine.from_uniform)
            consts, pstate = build(cfg, ust)
            step = (pallas_engine.block_step_packed if packed
                    else pallas_engine.block_step)

            @jax.jit
            def chain(st, xs, _step=step, _c=consts):
                def body(s, xb):
                    s2, y = _step(cfg, _c, s, xb, interpret=interp)
                    return s2, jnp.sum(y)

                sf, sums = jax.lax.scan(body, st, xs)
                return sf, jnp.sum(sums)

            def mk(xs, _chain=chain, _st=pstate):
                def run():
                    _, v = _chain(_st, xs)
                    _ = float(v)
                return run

            runs[packed] = {c1: mk(x1), c2: mk(x2)}
        if runs.get(False) is None:
            print(f"N={cfg.seg_count} ({secs}s): f32 over-VMEM — packed "
                  f"is capacity-only here", flush=True)
            continue
        print(f"N={cfg.seg_count} ({secs}s):", flush=True)
        sl = interleaved_slopes(runs[False], runs[True], c1, c2,
                                windows, pause, f"engine N={cfg.seg_count}")
        # per-block slopes: divide by 1 (chain is per block already)
        del sl

    # ---- grid streamer (HBM tables) — the unstable one ------------------
    print("== pallas_stream grid streamer, T=64-block calls, interleaved ==",
          flush=True)
    gc1, gc2 = 2, 10
    t_call = 64
    xs = jnp.asarray(rng.standard_normal((t_call, BLOCK)).astype(np.float32))
    for secs in (5, 10, 20, 30):
        ir = (rng.standard_normal(secs * SR) * 0.01).astype(np.float32)
        cfg0 = uniform.make_config(BLOCK, len(ir))
        chunk = min(512, cfg0.seg_count)
        n = pallas_stream.padded_seg_count(cfg0.seg_count, chunk)
        cfg = uniform.make_config(BLOCK, n * BLOCK)
        _, ust = uniform.init(ir, BLOCK, n * BLOCK)
        runs = {}
        for packed in (False, True):
            build = (pallas_stream.build_consts_packed if packed
                     else pallas_stream.build_consts)
            consts = build(ust.segments_ir, n, BLOCK)
            state0 = pallas_stream.zero_state(n, BLOCK)

            @functools.partial(jax.jit, static_argnums=(2,))
            def chain(c_, st, length, _cfg=cfg, _chunk=chunk):
                def body(s, _):
                    s2, y = pallas_stream.stream(
                        _cfg, c_, s, xs, chunk=_chunk, interpret=interp
                    )
                    return s2, jnp.sum(y)

                sf, sums = jax.lax.scan(body, st, None, length=length)
                return sf, jnp.sum(sums)

            def mk(length, _chain=chain, _c=consts, _st=state0):
                def run():
                    _, v = _chain(_c, _st, length)
                    _ = float(v)
                return run

            runs[packed] = {gc1: mk(gc1), gc2: mk(gc2)}
        print(f"N={n} ({secs}s):", flush=True)
        interleaved_slopes(runs[False], runs[True], gc1, gc2,
                           windows, pause, f"grid N={n}")


if __name__ == "__main__":
    main()
