"""Diagnose per-iteration copies in the chained CHRONO tail program.

exp_config3's valid windows showed the chrono tail LOSING to the
glue-carrying conv core at q=4 — physically impossible unless the
compiled chain moves extra bytes (suspect: the scan-carried [h_cap,2,B]
hist buffer copying per iteration instead of aliasing in place).  This
AOT-compiles the exact chained chrono-tail program (and the ring-conv
one for contrast), prints memory_analysis, and greps fusion/copy lines
touching hist-sized operands.  Compile-only — one relay compile, no
execution.

Usage: python -m benchmarks.exp_chrono_hlo [--cpu] [--periods Q]
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

SR = 48000


def main() -> None:
    q = 4
    for i, a in enumerate(sys.argv):
        if a == "--periods":
            q = int(sys.argv[i + 1])

    from fft_convolution_tpu.models import two_stage, uniform
    from fft_convolution_tpu.ops.fft import next_power_of_two

    rng = np.random.default_rng(2)
    ir = (rng.standard_normal(30 * SR) * 0.005).astype(np.float32)
    cfg, state = two_stage.init(ir, 128, len(ir))
    tcfg, tstate = cfg.tail, state.tail
    n, b = tcfg.seg_count, tcfg.block_size
    m = next_power_of_two(n - 1 + q)
    h_cap = next_power_of_two(m + 22 * q)
    print(f"tail: N={n} B={b} q={q} m={m} h_cap={h_cap}", flush=True)

    x = jnp.asarray(rng.standard_normal((q, b)).astype(np.float32))
    kh = jax.jit(functools.partial(uniform.stream_khat, tcfg),
                 static_argnums=(1,))(tstate, q)
    st_c, hist0, pos0 = uniform.ring_to_chrono(tcfg, tstate, h_cap)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def chain_chrono(carry, xs, khat):
        def body(cr, _):
            s, h, p = cr
            s2, h2, p2, y = uniform.stream_conv_chrono_unguarded(
                tcfg, s, h, p, xs, kern_hat=khat
            )
            return (s2, h2, p2), jnp.sum(y)

        cf, sums = jax.lax.scan(body, carry, None, length=8)
        return cf, jnp.sum(sums)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def chain_ring(st, xs, khat):
        def body(s, _):
            s2, y = uniform.process_stream(tcfg, s, xs, kern_hat=khat)
            return s2, jnp.sum(y)

        sf, sums = jax.lax.scan(body, st, None, length=8)
        return sf, jnp.sum(sums)

    # the FULL aligned stream with the chrono tail — exp_config3's 4p rows
    # measured THIS program ~0.26 ms slower than its components (isolated
    # chrono tail 0.071 + heads ~0.2), which is one h_cap-row hist pass:
    # suspect the hist fails to alias in place inside the bigger program
    t_full = q * cfg.period
    xf = jnp.asarray(
        rng.standard_normal((t_full, cfg.head_block)).astype(np.float32))
    khats = jax.jit(functools.partial(two_stage.stream_khats, cfg),
                    static_argnums=(1, 2))(state, t_full, True)
    st_f, chrono_f = two_stage.tail_to_chrono(cfg, state, h_cap)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def chain_full(carry, xs, khs):
        def body(cr, _):
            s, chr_ = cr
            s2, chr2, y = two_stage.process_stream_aligned(
                cfg, s, xs, khats=khs, tail_chrono=chr_)
            return (s2, chr2), jnp.sum(y)

        cf, sums = jax.lax.scan(body, carry, None, length=8)
        return cf, jnp.sum(sums)

    for name, fn, args in (
        ("chrono", chain_chrono, ((st_c, hist0, pos0), x, kh)),
        ("ring  ", chain_ring, (tstate, x, kh)),
        ("full-aligned-chrono", chain_full, ((st_f, chrono_f), xf, khats)),
    ):
        compiled = fn.lower(*args).compile()
        mem = compiled.memory_analysis()
        print(f"{name}: temp={mem.temp_size_in_bytes/1e6:.1f}M "
              f"arg={mem.argument_size_in_bytes/1e6:.1f}M "
              f"alias={mem.alias_size_in_bytes/1e6:.1f}M", flush=True)
        markers = [f"{h_cap},2,{b}", f"{h_cap},{b}",
                   f"{2 * n},", f"{n},2,{b}", f"{m},2,{b}", f"{m},{b}"]
        txt = compiled.as_text()
        hits = 0
        for line in txt.splitlines():
            ls = line.strip()
            if ("copy" in ls or "dynamic-update-slice" in ls
                    or "dynamic_update_slice" in ls) and any(
                    mk in ls.replace(" ", "") for mk in markers):
                print("   ", ls[:240], flush=True)
                hits += 1
                if hits > 24:
                    print("    ... (truncated)", flush=True)
                    break


if __name__ == "__main__":
    main()
