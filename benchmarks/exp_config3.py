"""Experiment: the 30 s two-stage config's per-block cost vs stream length,
in ONE process / one relay window (same-window A/B — the chip is
time-shared, cross-run numbers move tens of percent).

run_all's config3 streams T = 2 periods (tail_block=16384 -> period=128
blocks).  The main tail is a batched uniform stream whose meta-DFT
amortizes over the number of tail blocks in the call — at T=2p that meta
dimension is 2, the degenerate worst case.  This measures T = 2p / 4p / 8p
to see how much of the r3 run_all figure (2,118x, one window) is stream
length vs contention.

Usage: python -m benchmarks.exp_config3 [--cpu]
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

from benchmarks.configs import SR, _chain_time
from fft_convolution_tpu.models import two_stage
from fft_convolution_tpu.utils.layouts import pin_m_minor


def main() -> None:
    rng = np.random.default_rng(2)
    ir = (rng.standard_normal(30 * SR) * 0.005).astype(np.float32)
    cfg, state = two_stage.init(ir, 128, len(ir))
    print(f"tail_block={cfg.tail_block} period={cfg.period} blocks", flush=True)

    from fft_convolution_tpu.models import uniform

    mults = (2, 4, 8, 16, 32)
    for i, a in enumerate(sys.argv):
        if a == "--mults":
            mults = tuple(int(x) for x in sys.argv[i + 1].split(","))
    for mult in mults:
        t = mult * cfg.period
        x = jnp.asarray(rng.standard_normal((t, 128)).astype(np.float32))
        audio = t * 128 / SR
        # A/B the big-tail core same-window: policy khats (scan tail below
        # the q*N >= TAIL_CONV_RATIO*m threshold, ratio 5 as shipped) vs a
        # FORCED tail khat (conv-core tail)
        variants = (("policy", False), ("conv-tail", True), ("chrono", None),
                    ("chrono-st", None))
        if "--static-only" in sys.argv:
            variants = (("chrono", None), ("chrono-st", None))
        for name, force in variants:
            st0 = jax.tree.map(jnp.copy, state)
            if name.startswith("chrono"):
                # CHRONO sliding-window tail (glue-free conv core every T).
                # The chained-timing scan cannot host-route compaction, so
                # the buffer is sized for the whole chain (18 iters +
                # warmups); the production wrapper compacts every
                # (h_cap - N)/q calls — one h_cap-row pass, ~2 % amortized.
                # Size for the SLICE too: the m-row window ending at
                # pos + T must stay in bounds at the last iteration
                # (h_cap >= m + iters*q) — an undersized buffer clamps the
                # dynamic-slice start and silently times a misaligned
                # program (the first run of this script did exactly that
                # at 2p/8p).
                q = t // cfg.period
                n_t = cfg.tail.seg_count
                m = uniform.next_power_of_two(n_t - 1 + q)
                h_cap = uniform.next_power_of_two(m + 22 * q)
                khats = pin_m_minor(jax.jit(
                    functools.partial(two_stage.stream_khats, cfg),
                    static_argnums=(1, 2))(st0, t, True))
                st_c, chrono = jax.jit(functools.partial(
                    two_stage.tail_to_chrono, cfg, h_cap=h_cap))(st0)

                assume = name == "chrono-st"  # statically-clean fused smalls

                def run_chrono(carry, xs, kh, _asm=assume):
                    st, chr_ = carry
                    st, chr_, y = two_stage.process_stream_aligned(
                        cfg, st, xs, khats=kh, tail_chrono=chr_,
                        assume_clean_small=_asm)
                    return (st, chr_), y

                wall = _chain_time(run_chrono, (st_c, chrono), x,
                                   aux=khats, samples=2, sample_pause_s=10.0)
            else:
                khats = pin_m_minor(jax.jit(
                    functools.partial(two_stage.stream_khats, cfg),
                    static_argnums=(1,))(st0, t))
                if force:
                    if "tail" in khats:
                        print(f"T={mult}p: policy already conv — skip forced",
                              flush=True)
                        continue
                    khats["tail"] = pin_m_minor(jax.jit(
                        functools.partial(uniform.stream_khat, cfg.tail),
                        static_argnums=(1,),
                    )(st0.tail, t // cfg.period))
                wall = _chain_time(
                    lambda st, xs, kh: two_stage.process_stream_aligned(
                        cfg, st, xs, khats=kh),
                    st0, x, aux=khats, samples=2, sample_pause_s=10.0,
                )
            print(f"T={mult}p ({t:4d} blk) {name:9s}: "
                  f"{wall * 1e3:7.3f} ms/stream  "
                  f"xRT {audio / wall:7.0f}  {wall / t * 1e6:6.2f} us/blk",
                  flush=True)


if __name__ == "__main__":
    main()
