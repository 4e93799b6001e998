"""Pallas fused block-step kernel vs the jnp engine (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from fft_convolution_tpu.models import uniform
from fft_convolution_tpu.ops import pallas_engine


def test_fused_block_step_matches_jnp():
    rng = np.random.default_rng(30)
    b, n_blocks = 128, 12
    ir = rng.standard_normal(b * 5).astype(np.float32) * 0.1
    cfg, state = uniform.init(ir, b, len(ir))
    consts, pstate = pallas_engine.from_uniform(cfg, state)
    assert pallas_engine.fits_vmem(cfg)

    x = rng.standard_normal((n_blocks, b)).astype(np.float32)
    jstate = state
    for t in range(n_blocks):
        jstate, y_ref = uniform.process_block(cfg, jstate, jnp.asarray(x[t]))
        pstate, y = pallas_engine.block_step(
            cfg, consts, pstate, jnp.asarray(x[t]), interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(y_ref), atol=1e-5, err_msg=f"block {t}"
        )

    # state interop: convert back and continue on the jnp path
    back = pallas_engine.to_uniform(cfg, pstate, jstate)
    np.testing.assert_allclose(
        np.asarray(back.segments), np.asarray(jstate.segments), atol=1e-4
    )
    assert int(back.current) == int(jstate.current)
    s1, y1 = uniform.process_block(cfg, back, jnp.asarray(x[0]))
    s2, y2 = uniform.process_block(cfg, jstate, jnp.asarray(x[0]))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


def test_fused_block_step_ring_wraparound():
    """More blocks than segments: the ring must wrap identically."""
    rng = np.random.default_rng(31)
    b = 64
    ir = rng.standard_normal(b * 3).astype(np.float32) * 0.1
    cfg, state = uniform.init(ir, b, len(ir))
    consts, pstate = pallas_engine.from_uniform(cfg, state)
    x = rng.standard_normal(b * 10).astype(np.float32)

    ys = []
    for t in range(10):
        pstate, y = pallas_engine.block_step(
            cfg, consts, pstate, jnp.asarray(x[t * b:(t + 1) * b]), interpret=True
        )
        ys.append(np.asarray(y))
    got = np.concatenate(ys)
    exp = np.convolve(x.astype(np.float64), ir.astype(np.float64))[: len(x)]
    np.testing.assert_allclose(got, exp, atol=1e-5)


def test_vmem_budget_check():
    cfg_small = uniform.make_config(128, 48000)
    assert pallas_engine.fits_vmem(cfg_small)
    cfg_huge = uniform.make_config(128, 48000 * 60)
    assert not pallas_engine.fits_vmem(cfg_huge)


def test_pallas_serving_convolver():
    """Public serving wrapper: process/update/reset/clone contracts."""
    import pytest

    from fft_convolution_tpu.serving import PallasFFTConvolver
    from fft_convolution_tpu import FFTConvolver

    rng = np.random.default_rng(32)
    b = 128
    ir = rng.standard_normal(b * 4).astype(np.float32) * 0.1
    ir2 = rng.standard_normal(b * 2).astype(np.float32) * 0.1
    x = rng.standard_normal(b * 8).astype(np.float32)

    p = PallasFFTConvolver(ir, b, len(ir))
    ref = FFTConvolver(ir, b, len(ir))
    for t in range(4):
        yb = p.process(x[t * b:(t + 1) * b])
        yr = ref.process(x[t * b:(t + 1) * b])
        np.testing.assert_allclose(yb, yr, atol=1e-5)

    p.update(ir2)
    ref.update(ir2)
    for t in range(4, 8):
        yb = p.process(x[t * b:(t + 1) * b])
        yr = ref.process(x[t * b:(t + 1) * b])
        np.testing.assert_allclose(yb, yr, atol=1e-5)

    with pytest.raises(ValueError):
        p.process(x[:b - 1])
    with pytest.raises(ValueError):
        p.update(np.ones(len(ir) + 1, np.float32))
    with pytest.raises(ValueError):
        PallasFFTConvolver(np.ones(10, np.float32), 128, 48000 * 60)

    p.reset()
    snap = p.snapshot()
    y1 = p.process(x[:b])
    p.restore(snap)
    y2 = p.process(x[:b])
    np.testing.assert_array_equal(y1, y2)


def test_pallas_two_stage_serving():
    """Fused head+tail0 serving engine vs the reference-faithful
    TwoStageFFTConvolver, block by block across several tail periods."""
    from fft_convolution_tpu import TwoStageFFTConvolver
    from fft_convolution_tpu.serving import PallasTwoStageConvolver

    rng = np.random.default_rng(33)
    b = 64
    ir = rng.standard_normal(9000).astype(np.float32) * 0.05
    x = rng.standard_normal(b * 80).astype(np.float32)

    ref = TwoStageFFTConvolver(ir, b, len(ir))
    fused = PallasTwoStageConvolver(ir, b, len(ir))
    assert fused.cfg.tail is not None
    for t in range(80):
        blk = x[t * b:(t + 1) * b]
        y_ref = ref.process(blk)
        y = fused.process(blk)
        np.testing.assert_allclose(y, y_ref, atol=2e-5, err_msg=f"block {t}")

    # reset repeatability
    fused.reset()
    ys1 = [fused.process(x[t * b:(t + 1) * b]) for t in range(10)]
    fused.reset()
    ys2 = [fused.process(x[t * b:(t + 1) * b]) for t in range(10)]
    np.testing.assert_array_equal(np.concatenate(ys1), np.concatenate(ys2))


def test_pallas_two_stage_short_ir_rejected():
    import pytest

    from fft_convolution_tpu.serving import PallasTwoStageConvolver

    with pytest.raises(ValueError):
        PallasTwoStageConvolver(np.ones(64, np.float32), 64, 64)


def test_pallas_two_stage_clone_independent():
    """clone() is a value copy: advancing the twin must not perturb the
    original's stream (the Convolution: Clone parity surface)."""
    from fft_convolution_tpu.serving import PallasTwoStageConvolver

    rng = np.random.default_rng(34)
    b = 64
    ir = rng.standard_normal(9000).astype(np.float32) * 0.05
    x = rng.standard_normal(b * 20).astype(np.float32)

    a = PallasTwoStageConvolver(ir, b, len(ir))
    for t in range(5):
        a.process(x[t * b:(t + 1) * b])
    twin = a.clone()
    # drive the twin ahead with different input
    for t in range(5):
        twin.process(x[(10 + t) * b:(11 + t) * b])
    # the original continues exactly like an unperturbed run
    ref = PallasTwoStageConvolver(ir, b, len(ir))
    for t in range(5):
        ref.process(x[t * b:(t + 1) * b])
    for t in range(5, 10):
        blk = x[t * b:(t + 1) * b]
        np.testing.assert_array_equal(a.process(blk), ref.process(blk))


def test_pallas_two_stage_vmem_guard():
    """An oversized fused working set raises the descriptive ValueError
    instead of an opaque Mosaic alloc failure."""
    import pytest

    from fft_convolution_tpu.ops.pallas_two_stage import fits_vmem
    from fft_convolution_tpu.serving import PallasTwoStageConvolver

    assert fits_vmem(64, 64, 64)
    assert not fits_vmem(4096, 1024, 4096)
    # head ring of 2048 x 1024 floats x many tables blows the 12 MB budget
    with pytest.raises(ValueError, match="VMEM"):
        PallasTwoStageConvolver(
            np.ones(2_100_000, np.float32) * 1e-4, 1024, 2_100_000
        )


def test_pallas_streaming_convolver_matches_engine():
    """Grid-streaming long-IR serving engine vs the reference-faithful
    FFTConvolver, across multiple calls (ring persistence + wraparound) and
    a live update()."""
    from fft_convolution_tpu import FFTConvolver
    from fft_convolution_tpu.serving import PallasStreamingConvolver

    rng = np.random.default_rng(40)
    b = 128
    ir = rng.standard_normal(b * 21 - 37).astype(np.float32) * 0.1
    ir_b = rng.standard_normal(b * 10).astype(np.float32) * 0.1
    x = rng.standard_normal(b * 80).astype(np.float32)

    conv = PallasStreamingConvolver(ir, b, len(ir), chunk=8)
    n = conv.cfg.seg_count
    assert n % 8 == 0 and n >= 21
    # the documented padded-max equivalent
    ref = FFTConvolver(ir, b, n * b)

    # multi-call streaming (> 2 ring periods)
    for lo, hi in [(0, 30), (30, 31), (31, 80)]:
        y = conv.process(x[lo * b:hi * b])
        y_ref = ref.process(x[lo * b:hi * b])
        np.testing.assert_allclose(y, y_ref, atol=2e-5, err_msg=f"{lo}:{hi}")

    # live update keeps ring history, zeroes overlap
    conv.update(ir_b)
    ref.update(np.pad(ir_b, (0, n * b - len(ir_b))))  # same active count
    y = conv.process(x[:16 * b])
    y_ref = ref.process(x[:16 * b])
    np.testing.assert_allclose(y, y_ref, atol=2e-5)

    # reset repeatability
    conv.reset()
    y1 = conv.process(x[:8 * b])
    conv.reset()
    y2 = conv.process(x[:8 * b])
    np.testing.assert_array_equal(y1, y2)


def test_pallas_packed_serving_convolver():
    """storage="bf16_packed": ring + IR table at bf16 (half the step's
    DMA), output within bf16 tolerance of the f32 engine; update/reset
    contracts intact.  The packed word unpack is exercised on hardware by
    bench.py's parity gates; this is the interpret-mode contract."""
    import numpy as np
    import pytest

    from fft_convolution_tpu import FFTConvolver
    from fft_convolution_tpu.serving import PallasFFTConvolver

    rng = np.random.default_rng(44)
    b = 128
    ir = rng.standard_normal(b * 24).astype(np.float32) * 0.1
    x = rng.standard_normal(b * 64).astype(np.float32)

    conv = PallasFFTConvolver(ir, b, len(ir), storage="bf16_packed")
    ref = FFTConvolver(ir, b, len(ir))
    y = np.concatenate([conv.process(x[i * b:(i + 1) * b])
                        for i in range(64)])
    y_ref = ref.process(x)
    scale = np.abs(y_ref).max()
    # bf16 carries ~3 significant digits; the summed history terms land
    # around 1e-3 relative of the output scale
    np.testing.assert_allclose(y / scale, y_ref / scale, atol=5e-3)

    # update keeps ring history (bf16), zeroes overlap — vs an f32 ref
    # fed the same stream
    ir_b = rng.standard_normal(b * 24).astype(np.float32) * 0.1
    conv.update(ir_b)
    ref.update(ir_b)
    y2 = np.concatenate([conv.process(x[i * b:(i + 1) * b])
                         for i in range(24)])
    y2_ref = ref.process(x[: 24 * b])
    scale = np.abs(y2_ref).max()
    np.testing.assert_allclose(y2 / scale, y2_ref / scale, atol=5e-3)

    # reset repeatability (bit-exact between runs of the same program)
    conv.reset()
    r1 = np.concatenate([conv.process(x[i * b:(i + 1) * b])
                         for i in range(4)])
    conv.reset()
    r2 = np.concatenate([conv.process(x[i * b:(i + 1) * b])
                         for i in range(4)])
    np.testing.assert_array_equal(r1, r2)

    with pytest.raises(ValueError):
        PallasFFTConvolver(ir, b, len(ir), storage="int8")


def test_pallas_streaming_packed_matches_f32():
    """storage="bf16_packed" on the grid-streaming convolver: half the
    streamed table bytes, output at bf16 tolerance of the f32 kernel;
    update/reset/multi-call contracts intact."""
    import numpy as np
    import pytest

    from fft_convolution_tpu.serving import PallasStreamingConvolver

    rng = np.random.default_rng(46)
    b = 128
    ir = rng.standard_normal(b * 21 - 37).astype(np.float32) * 0.1
    ir_b = rng.standard_normal(b * 10).astype(np.float32) * 0.1
    x = rng.standard_normal(b * 48).astype(np.float32)

    conv = PallasStreamingConvolver(ir, b, len(ir), chunk=8,
                                    storage="bf16_packed")
    ref = PallasStreamingConvolver(ir, b, len(ir), chunk=8)

    for lo, hi in [(0, 20), (20, 48)]:
        y = conv.process(x[lo * b:hi * b])
        y_ref = ref.process(x[lo * b:hi * b])
        scale = max(np.abs(y_ref).max(), 1e-30)
        np.testing.assert_allclose(y / scale, y_ref / scale, atol=5e-3,
                                   err_msg=f"{lo}:{hi}")

    conv.update(ir_b)
    ref.update(ir_b)
    y = conv.process(x[:16 * b])
    y_ref = ref.process(x[:16 * b])
    scale = max(np.abs(y_ref).max(), 1e-30)
    np.testing.assert_allclose(y / scale, y_ref / scale, atol=5e-3)

    conv.reset()
    y1 = conv.process(x[:8 * b])
    conv.reset()
    y2 = conv.process(x[:8 * b])
    np.testing.assert_array_equal(y1, y2)

    twin = conv.clone()
    np.testing.assert_array_equal(twin.process(x[:8 * b]),
                                  conv.process(x[:8 * b]))

    with pytest.raises(ValueError):
        PallasStreamingConvolver(ir, b, len(ir), storage="fp8")


def test_serving_storage_auto_policy():
    """storage='auto': the fused engine picks f32 wherever it fits VMEM
    (exact tables; packed only buys capacity there), packed where only
    packed fits; the grid streamer always packs — interleaved same-window
    A/Bs showed packed winning the median at every measured N
    (results/r05/exp_packed_interleaved.log, PACKED_MIN_SEGS = 0)."""
    from fft_convolution_tpu import serving

    rng = np.random.default_rng(80)
    sr = 48000
    ir_small = (rng.standard_normal(2 * sr) * 0.01).astype(np.float32)
    c = serving.PallasFFTConvolver(ir_small, 128, len(ir_small),
                                   storage="auto")
    assert not c._packed
    ir_big = (rng.standard_normal(16 * sr) * 0.01).astype(np.float32)
    cfg_big = uniform.make_config(128, len(ir_big))
    assert not pallas_engine.fits_vmem(cfg_big)        # f32 can't
    assert pallas_engine.fits_vmem_packed(cfg_big)     # packed can
    c2 = serving.PallasFFTConvolver(ir_big, 128, len(ir_big),
                                    storage="auto")
    assert c2._packed

    s_small = serving.PallasStreamingConvolver(ir_small, 128, len(ir_small),
                                               storage="auto")
    assert s_small._packed
    s_big = serving.PallasStreamingConvolver(ir_small, 128, 30 * sr,
                                             storage="auto")
    assert s_big._packed and \
        s_big.cfg.seg_count >= s_big.PACKED_MIN_SEGS

    import pytest
    with pytest.raises(ValueError, match="storage"):
        serving.PallasFFTConvolver(ir_small, 128, len(ir_small),
                                   storage="f16")
