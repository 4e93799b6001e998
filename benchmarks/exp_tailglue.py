"""Experiment: how much of the conv-core tail call is ring-rebuild GLUE?

The r04 mining (exp_cost_single) shows the single-voice conv tail's
remaining cost clustering in hist/byd flips, the rebuild roll, and the
seg2/ext concats.  This times, same-window:

  A. the full tail stream (uniform.process_stream with kern_hat —
     ext build + meta MAC + inverse + OLA + ring rebuild), vs
  B. the MAC-only core (causal_conv_time + irdft + OLA on a PRE-BUILT
     chronological ext, khat-served — no ring ops at all).

A − B bounds what a chronological sliding-window history (no flips, no
roll, append-only) could save — the data that motivated building it.

  C. (r05) the CHRONO stream (uniform.stream_conv_chrono_unguarded —
     that sliding-window history, shipped): C − B is the RESIDUAL glue;
     VERDICT r4 #1's done-bar is residual glue <= 25 % of the call.

Usage: python -m benchmarks.exp_tailglue [--cpu] [--periods Q]
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
    q = 8
    for i, a in enumerate(sys.argv):
        if a == "--periods":
            q = int(sys.argv[i + 1])

    from bench import slope_timed
    from fft_convolution_tpu.models import two_stage, uniform
    from fft_convolution_tpu.ops.fft import (causal_conv_time, irdft_block,
                                             next_power_of_two)

    rng = np.random.default_rng(2)
    ir = (rng.standard_normal(30 * SR) * 0.005).astype(np.float32)
    cfg, state = two_stage.init(ir, 128, len(ir))
    tcfg, tstate = cfg.tail, state.tail
    n, b = tcfg.seg_count, tcfg.block_size
    m = next_power_of_two(n - 1 + q)
    print(f"tail: N={n} B={b} q={q} m={m}", flush=True)

    x = jnp.asarray(rng.standard_normal((q, b)).astype(np.float32))
    kh = jax.jit(functools.partial(uniform.stream_khat, tcfg),
                 static_argnums=(1,))(tstate, q)

    # A: the full stream (state-chained)
    def build_full(c):
        @jax.jit
        def chain(st, xs, khat):
            def body(s, _):
                s2, y = uniform.process_stream(tcfg, s, xs, kern_hat=khat)
                return s2, jnp.sum(y)

            sf, sums = jax.lax.scan(body, st, None, length=c)
            return sf, jnp.sum(sums)

        def run():
            _, v = chain(tstate, x, kh)
            _ = float(v)

        return run

    # B: MAC-only on a pre-built ext (chained through a scalar into ext so
    # the device must run every iteration)
    from fft_convolution_tpu.ops.fft import rdft_block

    ext0 = jnp.zeros((m, 2, b), jnp.float32)
    specs = jax.jit(functools.partial(rdft_block, fft_size=tcfg.fft_size))(x)
    ext0 = ext0.at[n - 1: n - 1 + q].set(specs)
    overlap0 = jnp.zeros((b,), jnp.float32)

    def build_mac(c):
        @jax.jit
        def chain(ext, ov, khat):
            def body(carry, _):
                e, o, acc = carry
                convs = causal_conv_time(e, tstate.segments_ir, q,
                                         kern_hat=khat)
                outs = irdft_block(convs, tcfg.fft_size)
                tails = jnp.concatenate([o[None], outs[:-1, b:]], axis=0)
                y = outs[:, :b] + tails
                s = jnp.sum(y)
                # chain: perturb ext by the scalar so iterations depend
                e2 = e + s * 1e-30
                return (e2, outs[-1, b:], acc + s), None

            (ef, of, acc), _ = jax.lax.scan(
                body, (ext, ov, jnp.zeros((), jnp.float32)), None, length=c
            )
            return acc

        def run():
            v = chain(ext0, overlap0, kh)
            _ = float(v)

        return run

    # C: the shipped chrono stream (state-chained; buffer sized for the
    # whole chain — the wrapper's host-routed compaction costs ~2 %
    # amortized and cannot run inside a lax.scan).  Sizing must cover the
    # SLICE at the last iteration (h_cap >= m + iters*q), not just the
    # writes — an undersized buffer clamps the dynamic-slice start and
    # silently times a misaligned program.
    c1, c2 = 2, 18
    h_cap = next_power_of_two(m + (c2 + 4) * q)
    st_c, hist0, pos0 = uniform.ring_to_chrono(tcfg, tstate, h_cap)

    def build_chrono(c):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def chain(carry, xs, khat):
            def body(cr, _):
                s, h, p = cr
                s2, h2, p2, y = uniform.stream_conv_chrono_unguarded(
                    tcfg, s, h, p, xs, kern_hat=khat
                )
                return (s2, h2, p2), jnp.sum(y)

            cf, sums = jax.lax.scan(body, carry, None, length=c)
            return cf, jnp.sum(sums)

        def run():
            # donation consumes the whole carry — every leaf must be a
            # fresh copy per run (a reused donated array raises); the
            # copies are a per-run constant the slope cancels
            carry = jax.tree.map(jnp.copy, (st_c, hist0, pos0))
            _, v = chain(carry, x, kh)
            _ = float(v)

        return run

    full, _ = slope_timed(build_full, c1, c2, "full", min_slope_s=1e-5,
                          samples=2, sample_pause_s=15.0)
    mac, _ = slope_timed(build_mac, c1, c2, "mac-only", min_slope_s=1e-5,
                         samples=2, sample_pause_s=15.0)
    chrono, _ = slope_timed(build_chrono, c1, c2, "chrono", min_slope_s=1e-5,
                            samples=2, sample_pause_s=15.0)
    print(f"q={q}: full {full*1e3:7.3f} ms  mac-only {mac*1e3:7.3f} ms  "
          f"glue(bound) {max(full-mac, 0)*1e3:7.3f} ms "
          f"({100*max(full-mac,0)/max(full,1e-12):.0f}% of the tail call)",
          flush=True)
    print(f"q={q}: chrono {chrono*1e3:7.3f} ms  residual glue "
          f"{max(chrono-mac, 0)*1e3:7.3f} ms "
          f"({100*max(chrono-mac,0)/max(chrono,1e-12):.0f}% of the chrono "
          f"call; done-bar <= 25%)",
          flush=True)


if __name__ == "__main__":
    main()
