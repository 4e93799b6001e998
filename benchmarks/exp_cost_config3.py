"""Mine the compiled config-3 aligned two-stage stream's per-op costs.

r05's exp_head_window showed the heads' meta-DFT pipeline is ~4 µs of the
8p call — NOT the ~0.25 ms excess over the algorithmic floor.  This AOT-
compiles the exact chained 8p program (chrono tail + pinned khats, as the
wrapper ships it) and ranks HLO ops by the TPU compiler's
``estimated_cycles`` annotation to name where the call actually goes —
the same decomposition tool as ``exp_cost`` (farm variant).

Usage: python -m benchmarks.exp_cost_config3 [--mult Q] [--top K]
"""

from __future__ import annotations

import functools
import re
import sys

import jax
import jax.numpy as jnp
import numpy as np

SR = 48000


def main():
    mult, top = 8, 40
    for i, a in enumerate(sys.argv):
        if a == "--mult":
            mult = int(sys.argv[i + 1])
        if a == "--top":
            top = int(sys.argv[i + 1])

    from fft_convolution_tpu.models import two_stage, uniform
    from fft_convolution_tpu.utils.layouts import pin_m_minor

    rng = np.random.default_rng(2)
    ir = (rng.standard_normal(30 * SR) * 0.005).astype(np.float32)
    cfg, state = two_stage.init(ir, 128, len(ir))
    t = mult * cfg.period
    x = jnp.asarray(rng.standard_normal((t, 128)).astype(np.float32))

    q = t // cfg.period
    n_t = cfg.tail.seg_count
    m = uniform.next_power_of_two(n_t - 1 + q)
    h_cap = uniform.next_power_of_two(m + 6 * q)
    khats = pin_m_minor(jax.jit(
        functools.partial(two_stage.stream_khats, cfg),
        static_argnums=(1, 2))(state, t, True))
    st_c, chrono = jax.jit(functools.partial(
        two_stage.tail_to_chrono, cfg, h_cap=h_cap))(state)

    assume = "--assume" in sys.argv  # statically-clean fused small streams

    @functools.partial(jax.jit, donate_argnums=(0,))
    def chained(carry, xs, kh):
        def body(c, _):
            st, chr_ = c
            st, chr_, y = two_stage.process_stream_aligned(
                cfg, st, xs, khats=kh, tail_chrono=chr_,
                assume_clean_small=assume)
            return (st, chr_), jnp.sum(y)

        cf, sums = jax.lax.scan(body, carry, None, length=2)
        return cf, jnp.sum(sums)

    compiled = chained.lower((st_c, chrono), x, khats).compile()
    txt = compiled.as_text()
    if "--dump-copies" in sys.argv:
        # full HLO lines of the copy/bitcast ops — names what the mined
        # unattributed %copy.* entries actually move (shape + operand)
        for line in txt.splitlines():
            if re.search(r"%copy[.\d]* = ", line):
                print(line.strip()[:360], flush=True)
        return
    pat = re.compile(r'"estimated_cycles":"?(\d+)"?')
    rows = []
    for line in txt.splitlines():
        mm = pat.search(line)
        if not mm:
            continue
        cyc = int(mm.group(1))
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
    clock_ghz = 0.94  # v5e nominal; estimates are relative anyway
    print(f"T={mult}p ops={len(rows)} total_estimated_cycles={total} "
          f"(~{total / clock_ghz / 1e6 / 2:.3f} ms/call at {clock_ghz} GHz, "
          f"2 chained calls)", flush=True)
    cum = 0
    for cyc, head, kind in rows[:top]:
        cum += cyc
        print(f"{cyc:>12d} {100*cyc/total:5.1f}% cum {100*cum/total:5.1f}%  "
              f"{head:<42s} {kind}", flush=True)


if __name__ == "__main__":
    main()
