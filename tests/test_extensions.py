"""Extension surface: implemented counterparts of the reference's todo!()s
(clearly marked as extensions), checkpointing, profiling recorder."""

import numpy as np
import pytest

from fft_convolution_tpu import CrossfadeConvolver, FFTConvolver, TwoStageFFTConvolver
from fft_convolution_tpu.utils import checkpoint
from fft_convolution_tpu.utils.profiling import LatencyRecorder


def test_two_stage_update_extension_matches_fresh_engine():
    """After update_extension the steady-state output must equal a fresh
    engine of the new IR (transient pending-tail outputs flushed first)."""
    rng = np.random.default_rng(40)
    ir_a = rng.standard_normal(9000).astype(np.float32) * 0.05
    ir_b = rng.standard_normal(7000).astype(np.float32) * 0.05
    block = 64

    c = TwoStageFFTConvolver(ir_a, block, 9000)
    x = rng.standard_normal(block * 400).astype(np.float32)
    c.process(x[: block * 100])
    c.update_extension(ir_b)

    fresh = TwoStageFFTConvolver(ir_b, block, 9000)
    # flush: input history differs (kept, like the uniform update) and the
    # precalculated tails restart — outputs converge once both engines have
    # seen ir_b-only history: after max_len samples
    flush = block * 200
    c.process(x[block * 100 : block * 100 + flush])
    fresh.process(x[block * 100 : block * 100 + flush])
    y1 = c.process(x[block * 100 + flush :])
    y2 = fresh.process(x[block * 100 + flush :])
    np.testing.assert_allclose(y1, y2, atol=1e-5)


def test_two_stage_update_extension_contract():
    c = TwoStageFFTConvolver(np.ones(1000, np.float32), 64, 1000)
    with pytest.raises(ValueError):
        c.update_extension(np.ones(1001, np.float32))
    with pytest.raises(NotImplementedError):
        c.update(np.ones(10, np.float32))  # reference surface unchanged


def test_crossfade_reset_extension():
    rng = np.random.default_rng(41)
    ir = rng.standard_normal(256).astype(np.float32) * 0.1
    inner = FFTConvolver(ir, 64, 256)
    cc = CrossfadeConvolver(inner, 256, 64, 128)
    x = rng.standard_normal(64 * 8).astype(np.float32)

    pieces_a = [cc.process(x[i * 64 : (i + 1) * 64]) for i in range(8)]
    cc.reset_extension()
    pieces_b = [cc.process(x[i * 64 : (i + 1) * 64]) for i in range(8)]
    np.testing.assert_allclose(
        np.concatenate(pieces_a), np.concatenate(pieces_b), atol=1e-6
    )
    with pytest.raises(NotImplementedError):
        cc.reset()  # reference surface unchanged


def test_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(42)
    ir = rng.standard_normal(500).astype(np.float32) * 0.1
    x = rng.standard_normal(1024).astype(np.float32)
    c = FFTConvolver(ir, 128, 500)
    c.process(x[:512])

    path = str(tmp_path / "engine.npz")
    checkpoint.save(path, c.snapshot())
    y1 = c.process(x[512:])

    c2 = FFTConvolver(ir, 128, 500)
    c2.restore(checkpoint.load(path, c2.snapshot()))
    y2 = c2.process(x[512:])
    np.testing.assert_array_equal(y1, y2)


def test_checkpoint_shape_mismatch(tmp_path):
    c = FFTConvolver(np.ones(100, np.float32), 64, 100)
    path = str(tmp_path / "e.npz")
    checkpoint.save(path, c.snapshot())
    other = FFTConvolver(np.ones(100, np.float32), 128, 100)
    with pytest.raises(ValueError):
        checkpoint.load(path, other.snapshot())


def test_latency_recorder():
    rec = LatencyRecorder(block_size=128, sample_rate=48000.0)
    for _ in range(10):
        with rec.measure():
            pass
    rep = rec.report()
    assert rep["n_blocks"] == 10
    assert rep["p99_ms"] >= rep["p50_ms"] >= 0
    assert rep["xrt_median"] > 0
