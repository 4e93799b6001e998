"""Experiment: farm2_update at production voice counts — wall time and
compiled peak-memory behavior of the batched RT-safe IR swap
(``src/fft_convolver.rs:174-213`` semantics scaled to a fleet).

The rebuild is a voice-chunked donated scan: the doubled periodic table
is rewritten in place, and each chunk's IR slice is cut from ``new_irs``
inside the scan body, so the transient should be one chunk's spectra
(~0.1 GB), NOT a farm-sized temp.  This AOT-compiles the exact donated
update program, prints ``memory_analysis`` (temp = the transient on top
of the live state), and slope-times execution on the device.

Usage: python -m benchmarks.exp_update [--voices N] [--bf16] [--cpu]
"""

from __future__ import annotations

import functools
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
    voices = 32
    for i, a in enumerate(sys.argv):
        if a == "--voices":
            voices = int(sys.argv[i + 1])
    dtype = jnp.bfloat16 if "--bf16" in sys.argv else jnp.float32

    from fft_convolution_tpu.parallel import farm2

    rng = np.random.default_rng(7)
    ir_len = 60 * SR
    irs = (rng.standard_normal((voices, ir_len)) * 0.002).astype(np.float32)
    # hbm_budget_bytes=None: this experiment probes AT scale on purpose —
    # the eager guard's model (farm2_bytes_per_voice) is calibrated on the
    # JNP corr core and overestimates the production Pallas path (V=128
    # f32 measured running in r04 while the model says 17.7 GB)
    cfg, state = farm2.farm2_init(irs, 128, ir_len, tail_dtype=dtype,
                                  hbm_budget_bytes=None)
    new_irs = jnp.asarray(
        (rng.standard_normal((voices, ir_len)) * 0.002).astype(np.float32)
    )

    upd = functools.partial(farm2.farm2_update, cfg)

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(2,))
    def chained(st, ni, length):
        def body(s, _):
            return upd(s, ni), 0.0

        sf, _ = jax.lax.scan(body, st, None, length=length)
        # packed bf16 tables are rank-2 uint32 (ops/packing.py)
        probe = sf.tail.segments_ir.reshape(-1)[0]
        return sf, probe.astype(jnp.float32)

    lowered = chained.lower(state, new_irs, 1)
    mem = lowered.compile().memory_analysis()
    print(
        f"V={voices} dtype={np.dtype(dtype).name} update memory: "
        f"temp={mem.temp_size_in_bytes/1e9:.3f}G "
        f"arg={mem.argument_size_in_bytes/1e9:.3f}G "
        f"alias={mem.alias_size_in_bytes/1e9:.3f}G",
        flush=True,
    )

    # slope-time: chained donated updates, one scalar fetch per run
    def run(length, st):
        st, v = chained(st, new_irs, length)
        _ = float(v)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            st, v = chained(st, new_irs, length)
            _ = float(v)
            best = min(best, time.perf_counter() - t0)
        return best, st

    if "--no-rebuild" in sys.argv:
        # isolation mode for the big-K runs: the full-rebuild timing's
        # executable/temp pressure next to the live 9.7 GB state starved
        # the K>=32 per-voice programs (temp ~50 MB/voice) on the
        # time-shared chip — skip it and quote the rebuild wall from the
        # K=1 log of the same sweep
        wall = float("nan")
        print(f"V={voices} dtype={np.dtype(dtype).name} update: skipped "
              "(--no-rebuild; ratio base = the K=1 log's rebuild wall)",
              flush=True)
    else:
        t1, state = run(1, state)
        t2, state = run(3, state)
        wall = max((t2 - t1) / 2, 1e-9)
        print(
            f"V={voices} dtype={np.dtype(dtype).name} update: "
            f"{wall*1e3:.2f} ms ({wall*1e6/voices:.1f} us/voice)",
            flush=True,
        )
    # free the rebuild executable's donated-alias reservations and the
    # full new-IR slab before the per-voice part: at V=128 the live state
    # is ~10-11 GB, and keeping the 1.5 GB new_irs + the rebuild
    # executable alongside the K>1 executables OOM'd the chip (the
    # K=8 RESOURCE_EXHAUSTED in the first r05 sweep attempt)
    chained.clear_cache()
    max_k = voices
    for i, a in enumerate(sys.argv):
        if a == "--k":
            max_k = int(sys.argv[i + 1])
    new_irs_k = jnp.array(new_irs[:max_k])   # fresh buffer, not a view
    del new_irs
    jax.clear_caches()

    # per-voice (subset) update: one client swaps one IR without paying
    # the farm rebuild — farm2_update_voices at K = 1 and 8, plus the
    # incremental khat slab recompute the wrapper patches caches with
    updv = functools.partial(farm2.farm2_update_voices, cfg)

    def build_chainedv():
        @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(3,))
        def chainedv(st, vi, ni, length):
            def body(s, _):
                return updv(s, vi, ni), 0.0

            sf, _ = jax.lax.scan(body, st, None, length=length)
            probe = sf.tail.segments_ir.reshape(-1)[0]
            return sf, probe.astype(jnp.float32)

        return chainedv

    chainedv = build_chainedv()
    # one K per run by default: a second K retraces a new multi-GB-aliased
    # executable next to the live state, which OOM'd the V=128 chip
    ks = [1]
    for i, a in enumerate(sys.argv):
        if a == "--k":
            ks = [int(sys.argv[i + 1])]
    for k in ks:
        if k > voices:
            continue
        vi = jnp.asarray(np.arange(k), jnp.int32)
        ni = new_irs_k[:k]
        # one K per process (the r04 f32 log's K=2 retrace OOM was a
        # same-process harness limit) — so the memory analysis is per-K too
        memv = chainedv.lower(state, vi, ni, 1).compile().memory_analysis()
        print(
            f"V={voices} dtype={np.dtype(dtype).name} update_voices K={k} "
            f"memory: temp={memv.temp_size_in_bytes/1e9:.3f}G",
            flush=True,
        )

        def runv(length, st):
            st, v = chainedv(st, vi, ni, length)
            _ = float(v)
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                st, v = chainedv(st, vi, ni, length)
                _ = float(v)
                best = min(best, time.perf_counter() - t0)
            return best, st

        t1, state = runv(2, state)
        t2, state = runv(10, state)
        wv = max((t2 - t1) / 8, 1e-9)
        ratio = ("" if wall != wall else
                 f" ({wall/max(wv, 1e-12):.0f}x cheaper than the full "
                 "rebuild)")
        print(
            f"V={voices} dtype={np.dtype(dtype).name} update_voices K={k}: "
            f"{wv*1e3:.3f} ms{ratio}",
            flush=True,
        )

    # khat slab patch vs full khat rebuild (t = 2 periods, the serving T)
    t_call = 2 * cfg.period
    kh_full = jax.jit(functools.partial(farm2.farm2_head_khat, cfg),
                      static_argnums=(1,))
    kh_sub = jax.jit(functools.partial(farm2.farm2_head_khat_voices, cfg),
                     static_argnums=(1,))
    vi1 = jnp.asarray([0], jnp.int32)

    def tkhat(fn, *args):
        r = fn(*args)
        _ = float(jax.tree.leaves(r)[0].reshape(-1)[0])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r = fn(*args)
            _ = float(jax.tree.leaves(r)[0].reshape(-1)[0])
            best = min(best, time.perf_counter() - t0)
        return best

    tf = tkhat(kh_full, state, t_call)
    ts = tkhat(kh_sub, state, t_call, vi1)
    print(
        f"V={voices} khat: full {tf*1e3:.2f} ms vs K=1 slab {ts*1e3:.2f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
