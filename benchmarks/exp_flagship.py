"""Experiment: flagship aligned-stream A/B in ONE process / one relay
window — the chip behind the relay is time-shared, so cross-run numbers
move tens of percent and only same-window comparisons are trustworthy.

Times the chained two-stage aligned stream (block=128, 10 s IR,
T=2048 blocks) in three configurations back to back:
  * khat-served, fused head+tail0 front end (production)
  * khat-served, separate small streams (fuse_small=False)
  * no khat, separate (the r2 baseline program)

Usage: python -m benchmarks.exp_flagship [--cpu]
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


def slope(run, state, x, aux, c1=2, c2=18, reps=3):
    def build(length):
        @jax.jit
        def chained(st, xs, kh):
            def body(s, _):
                s2, y = run(s, xs, kh)
                return s2, jnp.sum(y)

            sf, sums = jax.lax.scan(body, st, None, length=length)
            return sf, jnp.sum(sums)

        return chained

    r1, r2 = build(c1), build(c2)

    def best(r):
        _, v = r(state, x, aux)
        _ = float(v)
        b = float("inf")
        for _i in range(reps):
            t0 = time.perf_counter()
            _, v = r(state, x, aux)
            _ = float(v)
            b = min(b, time.perf_counter() - t0)
        return b

    t1, t2 = best(r1), best(r2)
    return max((t2 - t1) / (c2 - c1), 1e-9)


def main():
    from fft_convolution_tpu.models import two_stage
    from fft_convolution_tpu.utils.layouts import pin_m_minor

    rng = np.random.default_rng(0)
    ir = (rng.standard_normal(10 * SR) * 0.01).astype(np.float32)
    cfg, state = two_stage.init(ir, 128, len(ir))
    # default fills the combined kernel's meta-DFT: T + 2n - 1 = 4095 of
    # the m = 4096 meta (T=2048 pads 47% of every meta pass with zeros)
    t = 3968
    for i, a in enumerate(sys.argv):
        if a == "--t":
            t = int(sys.argv[i + 1])
    x = jnp.asarray(rng.standard_normal((t, 128)).astype(np.float32))
    khats = pin_m_minor(jax.jit(
        functools.partial(two_stage.stream_khats, cfg),
        static_argnums=(1,))(state, t))

    variants = [
        ("khat+fused   ", lambda s, xs, kh: two_stage.process_stream_aligned(
            cfg, s, xs, khats=kh), khats),
        ("khat+separate", lambda s, xs, kh: two_stage.process_stream_aligned(
            cfg, s, xs, khats=kh, fuse_small=False), khats),
        ("plain        ", lambda s, xs, kh: two_stage.process_stream_aligned(
            cfg, s, xs, fuse_small=False), None),
    ]
    audio = t * 128 / SR
    for name, run, aux in variants:
        w = slope(run, state, x, aux)
        print(f"{name}: {w*1e3:8.3f} ms/stream  xRT {audio/w:8.0f}  "
              f"{w/t*1e6:6.3f} us/blk", flush=True)

    # chrono tail (r05): the glue-free sliding-window big tail — the
    # wrapper's production aligned path.  Carried (state, chrono) pair in
    # the chain; buffer sized for the whole chain (compaction is
    # host-routed in production, ~2% amortized).
    from fft_convolution_tpu.models import uniform

    q = t // cfg.period
    khats_c = pin_m_minor(jax.jit(
        functools.partial(two_stage.stream_khats, cfg),
        static_argnums=(1, 2))(state, t, True))
    # slice-inclusive sizing: h_cap >= m + iters*q or the dynamic-slice
    # start clamps and the chain times a misaligned program
    m_c = uniform.next_power_of_two(cfg.tail.seg_count - 1 + q)
    h_cap = uniform.next_power_of_two(m_c + 22 * q)
    st_c, chrono = jax.jit(functools.partial(
        two_stage.tail_to_chrono, cfg, h_cap=h_cap))(state)

    def run_chrono(carry, xs, kh):
        s, chr_ = carry
        s, chr_, y = two_stage.process_stream_aligned(
            cfg, s, xs, khats=kh, tail_chrono=chr_)
        return (s, chr_), y

    w = slope(run_chrono, (st_c, chrono), x, khats_c)
    print(f"khat+chrono  : {w*1e3:8.3f} ms/stream  xRT {audio/w:8.0f}  "
          f"{w/t*1e6:6.3f} us/blk", flush=True)

    # variant 4: khat params device_put into the CONSUMER's preferred
    # layout (AUTO in_shardings + AOT compile) once per IR epoch — the
    # compiled stream relayout-copies the default-layout khats every call
    # (~2.2% each at farm scale; producer pinning measured not to help
    # because the copy is consumer-side).  jax.jit in_shardings accepts
    # Format(Layout.AUTO) only through the lower()/compile() AOT path.
    from jax.experimental.layout import Format, Layout

    def build_auto(length):
        def chained(st, xs, kh):
            def body(s, _):
                s2, y = two_stage.process_stream_aligned(cfg, s, xs,
                                                         khats=kh)
                return s2, jnp.sum(y)

            sf, sums = jax.lax.scan(body, st, None, length=length)
            return sf, jnp.sum(sums)

        auto = jax.tree.map(lambda _: Format(Layout.AUTO), khats)
        sds = functools.partial(jax.tree.map,
                                lambda l: jax.ShapeDtypeStruct(l.shape, l.dtype))
        comp = (jax.jit(chained, in_shardings=(None, None, auto))
                .lower(sds(state), sds(x), sds(khats)).compile())
        kh2 = jax.tree.map(jax.device_put, khats, comp.input_formats[0][2])
        return comp, kh2

    (r1, kh1), (r2, kh2) = build_auto(2), build_auto(18)

    def best(r, kh):
        _, v = r(state, x, kh)
        _ = float(v)
        b = float("inf")
        for _i in range(3):
            t0 = time.perf_counter()
            _, v = r(state, x, kh)
            _ = float(v)
            b = min(b, time.perf_counter() - t0)
        return b

    w = max((best(r2, kh2) - best(r1, kh1)) / 16, 1e-9)
    print(f"khat+fused+lay: {w*1e3:6.3f} ms/stream  xRT {audio/w:8.0f}  "
          f"{w/t*1e6:6.3f} us/blk", flush=True)


if __name__ == "__main__":
    main()
