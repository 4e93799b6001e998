"""Mine the compiled SINGLE-VOICE aligned two-stage stream's per-op cost
estimates (the farm counterpart is benchmarks/exp_cost).

AOT-compiles the khat-served chained ``process_stream_aligned`` program at
a chosen BASELINE shape and ranks HLO ops by the TPU compiler's
``estimated_cycles`` annotation — the decomposition tool behind the r04
conv-tail and direct-meta passes.

Usage: python -m benchmarks.exp_cost_single [--config flagship|config3]
       [--periods Q] [--top K]
"""

from __future__ import annotations

import functools
import re
import sys

import jax
import jax.numpy as jnp
import numpy as np

SR = 48000


def main() -> None:
    config, top, q = "config3", 30, 8
    for i, a in enumerate(sys.argv):
        if a == "--config":
            config = sys.argv[i + 1]
        if a == "--top":
            top = int(sys.argv[i + 1])
        if a == "--periods":
            q = int(sys.argv[i + 1])

    from fft_convolution_tpu.models import two_stage

    rng = np.random.default_rng(2)
    if config == "flagship":
        ir = (rng.standard_normal(10 * SR) * 0.01).astype(np.float32)
        block, t_override = 128, 3968
    else:
        ir = (rng.standard_normal(30 * SR) * 0.005).astype(np.float32)
        block, t_override = 128, None
    cfg, state = two_stage.init(ir, block, len(ir))
    t = t_override if t_override else q * cfg.period
    x = jnp.asarray(rng.standard_normal((t, block)).astype(np.float32))
    khats = jax.jit(functools.partial(two_stage.stream_khats, cfg),
                    static_argnums=(1,))(state, t)
    print(f"{config}: tail_block={cfg.tail_block} T={t} "
          f"conv_tail={two_stage.tail_uses_conv_core(cfg, t)}", flush=True)

    @jax.jit
    def chained(st, xs, kh):
        def body(s, _):
            s2, y = two_stage.process_stream_aligned(cfg, s, xs, khats=kh)
            return s2, jnp.sum(y)

        sf, sums = jax.lax.scan(body, st, None, length=2)
        return sf, jnp.sum(sums)

    compiled = chained.lower(state, x, khats).compile()
    txt = compiled.as_text()
    pat = re.compile(r'"estimated_cycles":"?(\d+)"?')
    rows = []
    for line in txt.splitlines():
        m = pat.search(line)
        if not m:
            continue
        cyc = int(m.group(1))
        head = line.strip().split(" = ")[0][-40:]
        op = line.strip()
        kind = re.search(r"= \S+ (\w+)\(", op)
        name = re.search(r'op_name="([^"]+)"', op)
        src = re.search(r"source_line=(\d+)", op)
        sfile = re.search(r'source_file="[^"]*/(\w+\.py)"', op)
        where = ""
        if name:
            where = name.group(1)[-70:]
        if sfile and src:
            where += f" [{sfile.group(1)}:{src.group(1)}]"
        rows.append((cyc, head,
                     (kind.group(1) if kind else "?") + "  " + where))
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    print(f"ops={len(rows)} total_estimated_cycles={total} "
          f"(2 chained calls)", flush=True)
    cum = 0
    for cyc, head, kind in rows[:top]:
        cum += cyc
        print(f"{cyc:>12d} {100*cyc/total:5.1f}% cum {100*cum/total:5.1f}%  "
              f"{head:<42s} {kind}", flush=True)


if __name__ == "__main__":
    main()
