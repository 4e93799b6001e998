"""Diagnose layout-conversion copies in the farm2 chained program.

The 131-voice config-5 OOM showed HLO temps equal to full copies of the
big-tail table/ring (plus remat-compressed twins).  This AOT-compiles the
exact chained-scan program at a tiny voice count and prints every `copy`
whose operand is table/ring-sized, so layout experiments are cheap (no
execution, one relay compile).

Usage: python -m benchmarks.exp_layout [V]
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

SR = 48000


def main():
    v = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    from fft_convolution_tpu.parallel import farm2

    rng = np.random.default_rng(4)
    irs = (rng.standard_normal((v, 60 * SR)) * 0.002).astype(np.float32)
    cfg, state = farm2.farm2_init(irs, 128, 60 * SR)
    t = 2 * cfg.period
    x = jnp.asarray(rng.standard_normal((t, v, 128)).astype(np.float32))

    fn = functools.partial(farm2.farm2_stream, cfg)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def chained(st, xs):
        def body(s, _):
            s2, y = fn(s, xs)
            return s2, jnp.sum(y)

        sf, sums = jax.lax.scan(body, st, None, length=2)
        return sf, jnp.sum(sums)

    lowered = chained.lower(state, x)
    compiled = lowered.compile()
    mem = compiled.memory_analysis()
    print(f"V={v} temp={mem.temp_size_in_bytes/1e9:.3f}G "
          f"arg={mem.argument_size_in_bytes/1e9:.3f}G "
          f"out={mem.output_size_in_bytes/1e9:.3f}G "
          f"alias={mem.alias_size_in_bytes/1e9:.3f}G", flush=True)

    n_t = cfg.tail.seg_count
    rows = 2 * n_t + 16
    big_markers = [f"[{rows},", f"[{n_t},", f"[2,{rows},", f"[2,{n_t},"]
    txt = compiled.as_text()
    for line in txt.splitlines():
        ls = line.strip()
        if any(m in ls for m in big_markers) and (
            " copy(" in ls or ls.startswith("copy") or "remat" in ls
        ):
            print(ls[:400], flush=True)


if __name__ == "__main__":
    main()
