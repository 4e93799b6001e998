"""Experiment: what actually bounds farm voices past V=206? (VERDICT r4 #4)

The per-voice model (`farm2_bytes_per_voice`) carries a ~23 MB/voice
"tail corr-core temp" calibrated on the JNP core's OOM dumps — but the
production TPU path runs the single-pass Pallas MAC, whose window reads
live in VMEM.  If that transient is gone, packed capacity is bounded by
the state itself (~40 MB/voice) and V can rise well past 206.

Head-side storage, for the record, is ~2.7 MB/voice at this shape
(tables+rings 1.0 + khat 1.05 + period buffers 0.66) = under 4 % of the
packed per-voice footprint — heads do NOT bound capacity; the VERDICT r4
#4 question resolves to measuring the tail transient honestly.

Method: AOT-compile the EXACT chained production program (packed bf16
storage, tail_mac="pallas", bf16 head transforms, khat-served, q=2) from
ShapeDtypeStructs — no device memory needed — and print
``memory_analysis`` per V.  The struct builder is validated leaf-by-leaf
against a real V=8 init before use.  ``--run V`` additionally inits a
real farm at that V and executes one stream call on the device.

Usage: python -m benchmarks.exp_farm_capacity [--cpu] [--run V]
       [--voices 206,240,272,304]
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
HBM = 15.75 * 2**30


def state_struct(cfg, v: int, packed: bool):
    """ShapeDtypeStruct pytree of a farm2 state at ``v`` voices — shape
    logic mirrors farm2_init; validated against a real init by main()."""
    from fft_convolution_tpu.models import two_stage, uniform

    b = cfg.head_block
    tb = cfg.tail_block
    n = cfg.head.seg_count
    n_t = cfg.tail.seg_count
    rows = 2 * n_t + uniform.CORR_EXTRA_ROWS
    f32, i32, u32 = jnp.float32, jnp.int32, jnp.uint32
    S = jax.ShapeDtypeStruct

    def head_stage():
        return uniform.UniformState(
            segments=S((v, n, 2, b), f32),
            segments_ir=S((v, n, 2, b), f32),
            overlap=S((v, b), f32),
            input_buffer=S((v, b), f32),
            pre_multiplied=S((v, 2, b), f32),
            current=S((v,), i32),
            input_fill=S((v,), i32),
            active_segs=S((v,), i32),
        )

    tail = uniform.UniformState(
        segments=(S((n_t, v * tb), u32) if packed
                  else S((2, n_t, v * tb), f32)),
        segments_ir=(S((rows, v * tb), u32) if packed
                     else S((2, rows, v * tb), f32)),
        overlap=S((v, tb), f32),
        input_buffer=S((v, tb), f32),
        pre_multiplied=S((2, v * tb), f32),
        current=S((), i32),
        input_fill=S((), i32),
        active_segs=S((), i32),
    )
    vt = lambda: S((v, tb), f32)  # noqa: E731
    return two_stage.TwoStageState(
        head=head_stage(), tail0=head_stage(), tail=tail,
        tail_output0=vt(), tail_precalc0=vt(),
        tail_output=vt(), tail_precalc=vt(),
        tail_input=vt(),
        tail_fill=S((v,), i32), precalc_pos=S((v,), i32),
    )


def main() -> None:
    voices_list = [206, 240, 272, 304]
    run_v = 0
    for i, a in enumerate(sys.argv):
        if a == "--voices":
            voices_list = [int(x) for x in sys.argv[i + 1].split(",")]
        if a == "--run":
            run_v = int(sys.argv[i + 1])

    from fft_convolution_tpu.models import two_stage
    from fft_convolution_tpu.parallel import farm2

    block = 128
    ir_len = 60 * SR
    on_tpu = jax.devices()[0].platform == "tpu"
    mac = "pallas" if on_tpu else "jnp"
    prec = "bf16"
    q = 2

    # a tiny REAL init pins cfg and validates the struct builder
    rng = np.random.default_rng(4)
    v0 = 8
    irs0 = (rng.standard_normal((v0, ir_len)) * 0.002).astype(np.float32)
    cfg, st0 = farm2.farm2_init(irs0, block, ir_len,
                                tail_dtype=jnp.bfloat16,
                                hbm_budget_bytes=None)
    ref = jax.tree.map(lambda l: (l.shape, str(l.dtype)), st0)
    got = jax.tree.map(lambda s: (s.shape, str(s.dtype)),
                       state_struct(cfg, v0, packed=True))
    assert jax.tree.all(jax.tree.map(lambda a, b: a == b, ref, got)), (
        "state_struct drifted from farm2_init:\n"
        f"{jax.tree.map(lambda a, b: (a, b) if a != b else None, ref, got)}"
    )
    t = q * cfg.period
    khat0 = jax.jit(functools.partial(farm2.farm2_head_khat, cfg,
                                      dft_precision=prec),
                    static_argnums=(1,))(st0, t)
    khat_struct_v0 = jax.tree.map(
        lambda l: jax.ShapeDtypeStruct(l.shape, l.dtype), khat0
    )
    del st0, khat0

    def chained(st, xs, kh):
        def body(s, _):
            s2, y = farm2.farm2_stream(cfg, s, xs, tail_mac=mac,
                                       dft_precision=prec, head_khat=kh)
            return s2, jnp.sum(y)

        sf, sums = jax.lax.scan(body, st, None, length=2)
        return sf, jnp.sum(sums)

    fn = jax.jit(chained, donate_argnums=(0,))

    print(f"shape: block={block} ir={ir_len} tb={cfg.tail_block} "
          f"n_t={cfg.tail.seg_count} q={q} mac={mac} packed bf16 heads={prec}",
          flush=True)
    model_pv = farm2.farm2_bytes_per_voice(block, ir_len, t, tail_item=2)
    print(f"model per-voice (farm2_bytes_per_voice, packed q=2): "
          f"{model_pv / 1e6:.1f} MB -> fits {int(15.5e9 // model_pv)}",
          flush=True)

    for v in voices_list:
        st_s = state_struct(cfg, v, packed=True)
        x_s = jax.ShapeDtypeStruct((t, v, block), jnp.float32)
        kh_s = jax.tree.map(
            lambda l: jax.ShapeDtypeStruct((v,) + l.shape[1:], l.dtype),
            khat_struct_v0,
        )
        try:
            mem = fn.lower(st_s, x_s, kh_s).compile().memory_analysis()
        except Exception as e:  # compile-time OOM is a result here
            print(f"V={v}: compile failed: {str(e)[:200]}", flush=True)
            continue
        total = (mem.temp_size_in_bytes + mem.argument_size_in_bytes
                 + mem.output_size_in_bytes - mem.alias_size_in_bytes)
        print(
            f"V={v}: args={mem.argument_size_in_bytes/1e9:.2f}G "
            f"temp={mem.temp_size_in_bytes/1e9:.2f}G "
            f"alias={mem.alias_size_in_bytes/1e9:.2f}G "
            f"out={mem.output_size_in_bytes/1e9:.2f}G "
            f"peak~{total/1e9:.2f}G of {HBM/1e9:.2f}G "
            f"({'FITS' if total <= HBM else 'OVER'}; "
            f"state/voice={mem.argument_size_in_bytes/v/1e6:.1f}M "
            f"temp/voice={mem.temp_size_in_bytes/v/1e6:.1f}M)",
            flush=True,
        )

    if run_v and on_tpu:
        import time

        print(f"--run {run_v}: real init + one stream call", flush=True)
        irs = (rng.standard_normal((run_v, ir_len)) * 0.002).astype(np.float32)
        cfg2, state = farm2.farm2_init(irs, block, ir_len,
                                       tail_dtype=jnp.bfloat16,
                                       hbm_budget_bytes=None)
        khat = jax.jit(functools.partial(farm2.farm2_head_khat, cfg2,
                                         dft_precision=prec),
                       static_argnums=(1,))(state, t)
        x = jnp.asarray(
            rng.standard_normal((t, run_v, block)).astype(np.float32)
        )
        t0 = time.perf_counter()
        state, s = fn(state, x, khat)
        print(f"V={run_v}: one chained call OK (probe {float(s):.3e}) "
              f"in {time.perf_counter() - t0:.1f}s incl. compile", flush=True)
        t0 = time.perf_counter()
        state, s = fn(state, x, khat)
        _ = float(s)
        print(f"V={run_v}: warm call {time.perf_counter() - t0:.3f}s",
              flush=True)


if __name__ == "__main__":
    main()
