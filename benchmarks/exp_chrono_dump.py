"""Dump the full compiled HLO of the chained full-aligned-chrono program
to a file for offline copy-hunting (see exp_chrono_hlo.py).

Usage: python -m benchmarks.exp_chrono_dump [--cpu] [--periods Q] [out.txt]
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
    out = "/tmp/chrono_full_hlo.txt"
    for i, a in enumerate(sys.argv):
        if a == "--periods":
            q = int(sys.argv[i + 1])
        if a.endswith(".txt"):
            out = a

    from fft_convolution_tpu.models import two_stage, uniform
    from fft_convolution_tpu.ops.fft import next_power_of_two

    rng = np.random.default_rng(2)
    ir = (rng.standard_normal(30 * SR) * 0.005).astype(np.float32)
    cfg, state = two_stage.init(ir, 128, len(ir))
    n = cfg.tail.seg_count
    m = next_power_of_two(n - 1 + q)
    h_cap = next_power_of_two(m + 22 * q)

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

    compiled = chain_full.lower((st_f, chrono_f), xf, khats).compile()
    mem = compiled.memory_analysis()
    print(f"temp={mem.temp_size_in_bytes/1e6:.1f}M "
          f"arg={mem.argument_size_in_bytes/1e6:.1f}M "
          f"alias={mem.alias_size_in_bytes/1e6:.1f}M", flush=True)
    with open(out, "w") as f:
        f.write(compiled.as_text())
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
