"""Two-stage convolver tests — ports of the reference suite plus extras.

Reference tests reproduced:
* ``test_fft_twostage_convolver_passthrough`` (``src/fft_convolver.rs:528-540``)
* ``twostage_equal``                          (``src/tests.rs:148-175``)
* ``reset_twostagefftconvolver``              (``src/tests.rs:218-257``)
"""

import numpy as np
import pytest

from fft_convolution_tpu import FFTConvolver, TwoStageFFTConvolver
from fft_convolution_tpu.models.two_stage import compute_tail_block_size
from fft_convolution_tpu.ops.fft import generate_sinusoid

SAMPLE_RATE = 44100.0


def test_tail_block_size_formula():
    """García's closed form with FFT_K = 1.5 (``src/fft_convolver.rs:514-526``)."""
    # block 64, N=12000: kn = 69.26, b = -kn + sqrt(kn^2 + 768000) -> 810 -> 1024
    assert compute_tail_block_size(64, 12000) == 1024
    # clamp at head then next_power_of_two
    assert compute_tail_block_size(1024, 1024) == 1024
    # large case used by the flagship benchmark (10 s @ 48 kHz, head 128)
    assert compute_tail_block_size(128, 480000) == 8192


def test_passthrough():
    response = np.zeros(1024, np.float32)
    response[0] = 1.0
    convolver = TwoStageFFTConvolver(response, 1024, len(response))
    output = convolver.process(np.ones(1024, np.float32))
    np.testing.assert_allclose(output, 1.0, atol=1e-6)


def test_twostage_equal():
    """TwoStage(block 64) == uniform FFTConvolver(block 32) on a 12,000-sample
    IR over 1000 blocks (``src/tests.rs:148-175``)."""
    block_size = 64
    num_input_blocks = 1000
    response = generate_sinusoid(12000, 1000.0, SAMPLE_RATE, 0.1)
    convolver_a = FFTConvolver(response, block_size // 2, len(response))
    convolver_b = TwoStageFFTConvolver(response, block_size, len(response))
    input = generate_sinusoid(num_input_blocks * block_size, 1300.0, SAMPLE_RATE, 0.1)
    out_a = convolver_a.process(input)
    out_b = convolver_b.process(input)
    np.testing.assert_allclose(out_a, out_b, atol=1e-5)


def test_golden_direct_convolution():
    """Two-stage output vs direct convolution golden."""
    rng = np.random.default_rng(5)
    ir = rng.standard_normal(5000).astype(np.float32) * 0.05
    x = rng.standard_normal(64 * 40).astype(np.float32)
    c = TwoStageFFTConvolver(ir, 64, len(ir))
    y = c.process(x)
    expected = np.convolve(x.astype(np.float64), ir.astype(np.float64))[: len(x)]
    np.testing.assert_allclose(y, expected, atol=1e-5)


def test_reset_repeatable():
    """(``src/tests.rs:218-257``)"""
    block_size = 64
    n_blocks = 1000
    response = generate_sinusoid(12000, 1000.0, SAMPLE_RATE, 0.1)
    convolver = TwoStageFFTConvolver(response, block_size, len(response))
    input = generate_sinusoid(n_blocks * block_size, 1300.0, SAMPLE_RATE, 0.1)
    out_a = convolver.process(input)
    convolver.reset()
    out_b = convolver.process(input)
    np.testing.assert_allclose(out_a, out_b, atol=1e-5)


def test_subblock_chunking():
    """Sub-head-block process() calls must match block-aligned streaming
    (the reference while-loop, ``src/fft_convolver.rs:427-494``)."""
    rng = np.random.default_rng(6)
    ir = rng.standard_normal(4000).astype(np.float32) * 0.05
    x = rng.standard_normal(64 * 32).astype(np.float32)
    ref = TwoStageFFTConvolver(ir, 64, len(ir))
    y_ref = ref.process(x)

    odd = TwoStageFFTConvolver(ir, 64, len(ir))
    sizes = [1, 63, 64, 30, 34, 17, 47] + [64] * 28
    assert sum(sizes) == 64 * 32 and all(0 < s <= 64 for s in sizes)
    pieces, pos = [], 0
    for s in sizes:
        pieces.append(odd.process(x[pos : pos + s]))
        pos += s
    np.testing.assert_allclose(np.concatenate(pieces), y_ref, atol=1e-5)


def test_update_unimplemented():
    """Surface parity: update is ``todo!()`` upstream (``src/fft_convolver.rs:408-410``)."""
    c = TwoStageFFTConvolver(np.ones(64, np.float32), 64, 64)
    with pytest.raises(NotImplementedError):
        c.update(np.ones(64, np.float32))


def test_short_ir_no_tail_stages():
    """IR shorter than the tail block: tail stages absent, still exact."""
    rng = np.random.default_rng(7)
    ir = rng.standard_normal(100).astype(np.float32) * 0.1
    x = rng.standard_normal(512).astype(np.float32)
    c = TwoStageFFTConvolver(ir, 64, len(ir))
    y = c.process(x)
    expected = np.convolve(x.astype(np.float64), ir.astype(np.float64))[:512]
    np.testing.assert_allclose(y, expected, atol=1e-5)
