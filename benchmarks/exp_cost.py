"""Mine the compiled farm2 stream's per-op cost estimates.

AOT-compiles the exact chained farm2_stream program (khat-served, like
production) and ranks HLO ops by the TPU compiler's ``estimated_cycles``
annotation — the decomposition tool that found the lane-axis-reverse
relayouts and the amplified row reads in earlier rounds (git history).

Usage: python -m benchmarks.exp_cost [--voices N] [--bf16] [--no-khat]
       [--top K]
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
    voices, top = 32, 30
    for i, a in enumerate(sys.argv):
        if a == "--voices":
            voices = int(sys.argv[i + 1])
        if a == "--top":
            top = int(sys.argv[i + 1])
    dtype = jnp.bfloat16 if "--bf16" in sys.argv else jnp.float32

    from fft_convolution_tpu.parallel import farm2

    rng = np.random.default_rng(4)
    irs = (rng.standard_normal((voices, 60 * SR)) * 0.002).astype(np.float32)
    cfg, state = farm2.farm2_init(irs, 128, 60 * SR, tail_dtype=dtype)
    t = 2 * cfg.period
    x = jnp.asarray(rng.standard_normal((t, voices, 128)).astype(np.float32))
    mac = "pallas" if jax.devices()[0].platform == "tpu" else "jnp"
    khat = None
    if "--no-khat" not in sys.argv:
        kh_jit = jax.jit(functools.partial(farm2.farm2_head_khat, cfg),
                         static_argnums=(1,))
        if "--pin" in sys.argv:
            # pin the producer's output to the default (row-major) layout:
            # the consumer jit specializes on the arrival layout, and the
            # mined kh[0]/kh[1] relayout copies suggest the producer emits
            # a transposed layout the stream's reshape+einsum path can't
            # consume directly
            from jax.experimental.layout import Format, Layout
            from jax.sharding import SingleDeviceSharding

            fmt = Format(Layout((0, 1, 2, 3)),
                         SingleDeviceSharding(jax.devices()[0]))
            kh_jit = jax.jit(functools.partial(farm2.farm2_head_khat, cfg),
                             static_argnums=(1,),
                             out_shardings=(fmt, fmt))
        khat = kh_jit(state, t)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def chained(st, xs, kh):
        def body(s, _):
            s2, y = farm2.farm2_stream(cfg, s, xs, tail_mac=mac, head_khat=kh)
            return s2, jnp.sum(y)

        sf, sums = jax.lax.scan(body, st, None, length=2)
        return sf, jnp.sum(sums)

    compiled = chained.lower(state, x, khat).compile()
    txt = compiled.as_text()
    # ops annotated like ...,"estimated_cycles":"12345",... (value QUOTED)
    pat = re.compile(r'"estimated_cycles":"?(\d+)"?')
    if "--dump-kh" in sys.argv:
        # full HLO lines touching the khat params — shows the layout the
        # consumer relayouts them into (the kh[0]/kh[1] copies)
        for line in txt.splitlines():
            if "kh[" in line or re.search(r"%copy[.\d]* = ", line):
                print(line.strip()[:400], flush=True)

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
        src = re.search(r'source_line=(\d+)', op)
        sfile = re.search(r'source_file="[^"]*/(\w+\.py)"', op)
        where = ""
        if name:
            where = name.group(1)[-70:]
        if sfile and src:
            where += f" [{sfile.group(1)}:{src.group(1)}]"
        rows.append((cyc, head, (kind.group(1) if kind else "?") + "  " + where))
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    print(f"V={voices} dtype={np.dtype(dtype).name} "
          f"khat={'--no-khat' not in sys.argv} ops={len(rows)} "
          f"total_estimated_cycles={total} (2 chained calls)", flush=True)
    cum = 0
    for cyc, head, kind in rows[:top]:
        cum += cyc
        print(f"{cyc:>12d} {100*cyc/total:5.1f}% cum {100*cum/total:5.1f}%  "
              f"{head:<42s} {kind}", flush=True)


if __name__ == "__main__":
    main()
