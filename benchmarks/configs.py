"""The five benchmark configurations from BASELINE.json.

Each config returns ``(name, run)`` where ``run()`` measures the workload on
the current backend and returns a dict of metrics.  All timed regions use
the chained-dependency + scalar-fetch methodology (see bench.py): the relay
fronting the TPU neither blocks reliably nor fetches quickly, so a 4-byte
scalar that data-depends on everything is the only trustworthy fence.

Run all: ``python -m benchmarks.run_all`` (add ``--cpu`` for the CPU backend).
"""

from __future__ import annotations

import functools
import time

SR = 48000


def _chain_time(fn, state, x, chain=4, reps=3):
    """Device wall time of one ``fn(state, x)`` stream.

    Two-point slope methodology: the relay fronting this TPU costs ~25 ms
    fixed per dispatch+fetch, so a single chained run mostly measures the
    link.  Timing scans of ``c1`` and ``c2`` chained iterations and taking
    ``(T(c2) - T(c1)) / (c2 - c1)`` cancels every per-call constant exactly,
    leaving pure device time per iteration.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    del chain
    c1, c2 = 2, 18

    def build(length):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def chained(st, xs):
            # donated state: the scan carry ping-pongs in place (multi-GB
            # farm states would otherwise exist in triplicate and OOM)
            def body(s, _):
                s2, y = fn(s, xs)
                return s2, jnp.sum(y)
            sf, sums = jax.lax.scan(body, st, None, length=length)
            return sf, jnp.sum(sums)
        return chained

    run1, run2 = build(c1), build(c2)

    def timed(run, st):
        st, v = run(st, x)   # warm (compile)
        _ = float(v)
        best = float("inf")
        for _i in range(reps):
            t0 = time.perf_counter()
            st, v = run(st, x)
            _ = float(v)
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(run1, jax.tree.map(jnp.copy, state))
    t2 = timed(run2, jax.tree.map(jnp.copy, state))
    return max((t2 - t1) / (c2 - c1), 1e-9)


def config1_mono_parity():
    """Mono FFTConvolver, block=128, 1 s 48 kHz IR — CPU-parity semantics of
    examples/compare_partitioned.rs (reference config 1)."""
    import jax.numpy as jnp
    import numpy as np

    from fft_convolution_tpu.models import uniform

    rng = np.random.default_rng(0)
    ir = (rng.standard_normal(SR) * 0.02).astype(np.float32)
    cfg, state = uniform.init(ir, 128, len(ir))
    t = 1024
    x = jnp.asarray(rng.standard_normal((t, 128)).astype(np.float32))
    wall = _chain_time(functools.partial(uniform.process_stream, cfg), state, x)
    audio = t * 128 / SR
    return {"xrt": audio / wall, "us_per_block": wall / t * 1e6}


def config2_stereo():
    """Stereo uniform convolution, block=256, 5 s hall IR — a 2-voice farm."""
    import jax.numpy as jnp
    import numpy as np

    from fft_convolution_tpu.parallel import farm

    rng = np.random.default_rng(1)
    irs = (rng.standard_normal((2, 5 * SR)) * 0.01).astype(np.float32)
    cfg, state = farm.farm_init(jnp.asarray(irs), 256, 5 * SR)
    t = 512
    x = jnp.asarray(rng.standard_normal((t, 2, 256)).astype(np.float32))
    wall = _chain_time(functools.partial(farm.farm_stream, cfg), state, x)
    audio = t * 256 / SR
    return {"xrt": audio / wall, "us_per_block": wall / t * 1e6}


def config3_two_stage_30s():
    """Two-stage non-uniform partitions, head=128, 30 s cathedral IR.
    (Garcia's formula picks the optimal tail size; the 4096 in BASELINE.json
    is advisory — we keep the reference's closed form.)"""
    import jax.numpy as jnp
    import numpy as np

    from fft_convolution_tpu.models import two_stage

    rng = np.random.default_rng(2)
    ir = (rng.standard_normal(30 * SR) * 0.005).astype(np.float32)
    cfg, state = two_stage.init(ir, 128, len(ir))
    t = 2 * cfg.period
    x = jnp.asarray(rng.standard_normal((t, 128)).astype(np.float32))
    wall = _chain_time(
        functools.partial(two_stage.process_stream_aligned, cfg), state, x
    )
    audio = t * 128 / SR
    return {"xrt": audio / wall, "us_per_block": wall / t * 1e6,
            "tail_block": cfg.tail_block}


def config4_crossfade_morph():
    """Crossfade A/B morph: both engines + the sample-accurate mixer every
    block (2x compute by design, src/crossfade_convolver.rs:66-78), measured
    on the fused single-program stream path while a fade is in progress
    (worst case: hold + ramp + mixer all active).  The host-side morph
    trigger (RT-safe update of the inactive engine) is timed separately."""
    import jax.numpy as jnp
    import numpy as np

    from fft_convolution_tpu import CrossfadeConvolver, FFTConvolver
    from fft_convolution_tpu.api_crossfade import _jit_fused_stream
    from fft_convolution_tpu.models import crossfade

    rng = np.random.default_rng(3)
    block = 128
    ir_a = (rng.standard_normal(SR) * 0.02).astype(np.float32)
    ir_b = (rng.standard_normal(SR) * 0.02).astype(np.float32)
    inner = FFTConvolver(ir_a, block, SR)
    # fade longer than the whole timed region so every measured sample is
    # mid-ramp (hold + raised-cosine mixer + both engines active)
    cc = CrossfadeConvolver(inner, SR, block, 10 * SR)
    cc.update(ir_b)
    assert cc.is_crossfading()

    t = 256
    x = jnp.asarray(rng.standard_normal((t, block)).astype(np.float32))
    fused = _jit_fused_stream(cc.convolver_a.cfg, cc.cf_cfg)

    def run(op, xs):
        sa, sb, cf = op
        sa, sb, cf, y = fused(sa, sb, cf, xs)
        return (sa, sb, cf), y

    state0 = (cc.convolver_a.state, cc.convolver_b.state, cc.cf_state)
    wall = _chain_time(run, state0, x, chain=4)
    audio = t * block / SR

    # morph trigger latency: jitted update of the inactive engine
    t0 = time.perf_counter()
    for _ in range(5):
        cc.convolver_b.update(ir_a)
    update_ms = (time.perf_counter() - t0) / 5 * 1e3
    return {"xrt": audio / wall, "us_per_block": wall / t * 1e6,
            "morph_update_ms": update_ms}


def config5_reverb_farm(voices: int = 1024, ir_seconds: int = 60):
    """Batched reverb farm: vmap over ``voices`` channels with distinct long
    IRs on one chip, using the two-stage farm (parallel/farm2.py — the
    production engine for 60 s IRs).  Per-voice state is the IR + segment
    spectra (~16L bytes ≈ 46 MB at 60 s/48 kHz), so one 16 GB chip holds a
    slice of the 1024; the voice axis shards over chips for the rest
    (farm.shard_farm — zero steady-state collectives).  Reports aggregate
    realtime voices/chip."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fft_convolution_tpu.parallel import farm2

    block = 128
    hbm = 15e9 if jax.devices()[0].platform == "tpu" else 2e9
    # state ~16L/voice, doubled by the chained-timing scan carry, plus the
    # sliced-tail doubled-IR transient, the time-DFT intermediates of the
    # head stages, and XLA temporaries -> 100L measured-safe budget
    per_voice = 100 * ir_seconds * SR
    voices = int(min(voices, max(1, hbm // per_voice)))

    rng = np.random.default_rng(4)
    irs = (rng.standard_normal((voices, ir_seconds * SR)) * 0.002).astype(np.float32)
    cfg, state = farm2.farm2_init(irs, block, ir_seconds * SR)
    t = 2 * cfg.period
    x = jnp.asarray(rng.standard_normal((t, voices, block)).astype(np.float32))
    wall = _chain_time(functools.partial(farm2.farm2_stream, cfg), state, x, chain=2)
    audio = t * block / SR
    xrt = audio / wall
    return {"voices": voices, "xrt_per_voice": xrt,
            "realtime_voices": round(xrt * voices),
            "tail_block": cfg.tail_block,
            "us_per_block_all_voices": wall / t * 1e6}


ALL = {
    "mono_block128_1s": config1_mono_parity,
    "stereo_block256_5s": config2_stereo,
    "two_stage_30s": config3_two_stage_30s,
    "crossfade_morph": config4_crossfade_morph,
    "reverb_farm": config5_reverb_farm,
}
