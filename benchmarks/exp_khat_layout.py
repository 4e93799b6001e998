"""Experiment: kill the per-call tail-khat relayout copy (VERDICT r4 #4's
"khat params relayout" remainder, CLAUDE.md ~2.2% x2 on the farm).

The compiled aligned-chrono stream relayouts the tail khat planes
{1,0}->{0,1} on EVERY call (results/r05/exp_chrono_hlo_q4_pair.log:
``copy.1185/1187, op_name=khs['tail'][0/1]`` — 2 x 8.4 MB at the 30 s
config): the khat crosses the jit boundary as a parameter in default
row-major layout, while the inverse meta-DFT wants the contracted m axis
minor.  The khat is input-independent between IR updates, so the fix is
to pay the relayout ONCE at build: ``jax.device_put`` the planes into the
m-minor Format (``jax.experimental.layout``) and let every stream call
read them directly.

This A/Bs the full aligned chrono stream at q in {2, 8} with default vs
pinned khat layouts (same window), and greps both compiled chains for
khat-metadata copies to confirm the mechanism.

Usage: python -m benchmarks.exp_khat_layout [--cpu] [--mults 2,8]
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
from fft_convolution_tpu.models import two_stage, uniform
from fft_convolution_tpu.utils.layouts import pin_m_minor


def main() -> None:
    rng = np.random.default_rng(2)
    ir = (rng.standard_normal(30 * SR) * 0.005).astype(np.float32)
    cfg, state = two_stage.init(ir, 128, len(ir))
    print(f"tail_block={cfg.tail_block} period={cfg.period} blocks",
          flush=True)

    mults = (2, 8)
    for i, a in enumerate(sys.argv):
        if a == "--mults":
            mults = tuple(int(x) for x in sys.argv[i + 1].split(","))

    for mult in mults:
        t = mult * cfg.period
        q = t // cfg.period
        x = jnp.asarray(rng.standard_normal((t, 128)).astype(np.float32))
        audio = t * 128 / SR
        n_t = cfg.tail.seg_count
        m = uniform.next_power_of_two(n_t - 1 + q)
        h_cap = uniform.next_power_of_two(m + 22 * q)
        khats = jax.jit(functools.partial(two_stage.stream_khats, cfg),
                        static_argnums=(1, 2))(state, t, True)
        st_c, chrono = jax.jit(functools.partial(
            two_stage.tail_to_chrono, cfg, h_cap=h_cap))(state)

        def run_chrono(carry, xs, kh):
            st, chr_ = carry
            st, chr_, y = two_stage.process_stream_aligned(
                cfg, st, xs, khats=kh, tail_chrono=chr_)
            return (st, chr_), y

        # khat-copy census of the compiled 2-iteration chain, per variant
        def census(kh):
            @functools.partial(jax.jit, donate_argnums=(0,))
            def chain2(carry, xs, ax):
                def body(c, _):
                    c2, y = run_chrono(c, xs, ax)
                    return c2, jnp.sum(y)
                cf, s = jax.lax.scan(body, carry, None, length=2)
                return cf, jnp.sum(s)

            txt = chain2.lower(
                (jax.tree.map(jnp.copy, st_c),
                 jax.tree.map(jnp.copy, chrono)), x, kh
            ).compile().as_text()
            n_copies = sum(
                1 for line in txt.splitlines()
                if " copy(" in line and "khs" in line
            )
            return n_copies

        for name, kh in (("default", khats),
                         ("m-minor", pin_m_minor(khats))):
            nc = census(kh)
            wall = _chain_time(
                run_chrono,
                (jax.tree.map(jnp.copy, st_c), jax.tree.map(jnp.copy, chrono)),
                x, aux=kh, samples=2, sample_pause_s=10.0)
            print(f"T={mult}p ({t:4d} blk) khat={name:8s}: "
                  f"{wall * 1e3:7.3f} ms/stream  xRT {audio / wall:7.0f}  "
                  f"{wall / t * 1e6:6.2f} us/blk  khat-copies={nc}",
                  flush=True)


if __name__ == "__main__":
    main()
