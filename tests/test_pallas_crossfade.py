"""Fused A/B crossfade kernel + serving wrapper vs the generic jnp path.

The serving-path morph story (``src/crossfade_convolver.rs:66-78`` over the
hot loop ``src/fft_convolver.rs:215-295``): one shared-ring Pallas kernel
runs both engines per block; parity reference is the generic
``CrossfadeConvolver`` over the jnp ``FFTConvolver`` with the same
hold/ramp configuration (max_buffer_size = block_size).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fft_convolution_tpu.models import crossfade, uniform
from fft_convolution_tpu.ops import pallas_crossfade


def _mk(rng, n):
    return (rng.standard_normal(n) * 0.1).astype(np.float32)


def test_xfade_kernel_matches_two_jnp_engines():
    """ya/yb from the fused kernel == two independent jnp engines fed the
    same input (the shared-ring refactor must be output-invisible)."""
    rng = np.random.default_rng(50)
    b, n_blocks = 128, 12
    ir_a = _mk(rng, b * 5)
    ir_b = _mk(rng, b * 5 - 33)

    cfg, sa = uniform.init(ir_a, b, len(ir_a))
    _, sb = uniform.init(np.pad(ir_b, (0, len(ir_a) - len(ir_b))), b,
                         len(ir_a))
    consts, pstate = pallas_crossfade.from_uniform(cfg, sa, sb)
    # from_uniform takes engine A's ring; give B the same table source
    consts = consts._replace(
        b2_re=jnp.concatenate([sb.segments_ir[:, 0]] * 2, axis=0),
        b2_im=jnp.concatenate([sb.segments_ir[:, 1]] * 2, axis=0),
    )
    assert pallas_crossfade.fits_vmem(cfg)

    x = rng.standard_normal((n_blocks, b)).astype(np.float32)
    for t in range(n_blocks):
        xb = jnp.asarray(x[t])
        sa, ya_ref = uniform.process_block(cfg, sa, xb)
        sb, yb_ref = uniform.process_block(cfg, sb, xb)
        pstate, ya, yb = pallas_crossfade.block_step(
            cfg, consts, pstate, xb, interpret=True
        )
        np.testing.assert_allclose(np.asarray(ya), np.asarray(ya_ref),
                                   atol=1e-5, err_msg=f"A block {t}")
        np.testing.assert_allclose(np.asarray(yb), np.asarray(yb_ref),
                                   atol=1e-5, err_msg=f"B block {t}")


def test_xfade_vmem_budget():
    assert pallas_crossfade.fits_vmem(uniform.make_config(128, 48000))
    assert not pallas_crossfade.fits_vmem(
        uniform.make_config(128, 48000 * 30)
    )


def _ref_crossfade(ir, b, max_len, fade):
    from fft_convolution_tpu import FFTConvolver
    from fft_convolution_tpu.api_crossfade import CrossfadeConvolver

    return CrossfadeConvolver(FFTConvolver(ir, b, max_len),
                              max_response_length=max_len,
                              max_buffer_size=b, crossfade_samples=fade)


def test_pallas_crossfade_serving_matches_generic():
    """Block-by-block parity with the generic wrapper over the jnp engine:
    steady state, live update (hold + ramp across block boundaries), a
    mid-fade pending update, and post-fade steady state.

    Updates are padded to the full initialized length on both paths so the
    jnp engine keeps the same active segment count as the kernel's padded
    tables (update with a SHORTER IR shrinks the jnp ring — a transient
    the reference itself only pins down for single-segment IRs,
    ``src/tests.rs:18-59``)."""
    from fft_convolution_tpu.serving import PallasCrossfadeConvolver

    rng = np.random.default_rng(51)
    b = 128
    max_len = b * 6
    fade = 3 * b  # fade spans several blocks
    ir1 = np.pad(_mk(rng, b * 4), (0, max_len - b * 4))
    ir2 = np.pad(_mk(rng, b * 3), (0, max_len - b * 3))
    ir3 = np.pad(_mk(rng, b * 5), (0, max_len - b * 5))
    x = rng.standard_normal(b * 40).astype(np.float32)

    p = PallasCrossfadeConvolver(ir1, b, max_len, crossfade_samples=fade)
    ref = _ref_crossfade(ir1, b, max_len, fade)

    def run(lo, hi, tag):
        for t in range(lo, hi):
            blk = x[t * b:(t + 1) * b]
            yp = p.process(blk)
            yr = ref.process(blk)
            np.testing.assert_allclose(yp, yr, atol=2e-5,
                                       err_msg=f"{tag} block {t}")

    run(0, 5, "steady A")
    p.update(ir2)
    ref.update(ir2)
    assert p.is_crossfading() and ref.is_crossfading()
    run(5, 8, "fading")
    # mid-fade update parks in the single pending slot on both paths
    p.update(ir3)
    ref.update(ir3)
    assert p.response_pending and ref.response_pending
    run(8, 20, "pending swap + second fade")
    assert not p.is_crossfading() and not ref.is_crossfading()
    run(20, 24, "steady C")


def test_pallas_crossfade_contracts():
    from fft_convolution_tpu.serving import PallasCrossfadeConvolver

    rng = np.random.default_rng(52)
    b = 128
    ir = _mk(rng, b * 3)
    p = PallasCrossfadeConvolver(ir, b, len(ir), crossfade_samples=b)

    with pytest.raises(ValueError):
        p.process(np.zeros(b - 1, np.float32))
    with pytest.raises(ValueError):
        p.update(np.ones(len(ir) + 1, np.float32))
    with pytest.raises(NotImplementedError):
        p.reset()  # todo!() upstream (src/crossfade_convolver.rs:80-82)
    with pytest.raises(ValueError, match="VMEM"):
        PallasCrossfadeConvolver(np.ones(10, np.float32), 128,
                                 48000 * 30, crossfade_samples=128)

    # clone independence + snapshot/restore repeatability
    x = rng.standard_normal(b * 6).astype(np.float32)
    for t in range(2):
        p.process(x[t * b:(t + 1) * b])
    twin = p.clone()
    snap = p.snapshot()
    twin.update(_mk(rng, b * 2))
    twin.process(x[2 * b:3 * b])
    y1 = p.process(x[2 * b:3 * b])
    p.restore(snap)
    y2 = p.process(x[2 * b:3 * b])
    np.testing.assert_array_equal(y1, y2)

    # reset_extension returns to a power-on state
    p.reset_extension()
    assert not p.is_crossfading()
    ya = [p.process(x[t * b:(t + 1) * b]) for t in range(3)]
    p.reset_extension()
    yb = [p.process(x[t * b:(t + 1) * b]) for t in range(3)]
    np.testing.assert_array_equal(np.concatenate(ya), np.concatenate(yb))


def test_pallas_crossfade_hold_then_ramp_sample_exact():
    """The mixed output during the hold phase equals pure engine-A output
    sample-for-sample, and the first post-hold block starts ramping —
    the Crossfader state machine (``src/crossfade_convolver.rs:242-278``)
    composed with the fused kernel."""
    from fft_convolution_tpu.serving import PallasCrossfadeConvolver

    rng = np.random.default_rng(53)
    b = 128
    ir1 = _mk(rng, b * 2)
    ir2 = np.zeros(b * 2, np.float32)  # B silent: any B leakage is visible
    x = rng.standard_normal(b * 6).astype(np.float32)

    p = PallasCrossfadeConvolver(ir1, b, len(ir1), crossfade_samples=2 * b)
    q = PallasCrossfadeConvolver(ir1, b, len(ir1), crossfade_samples=2 * b)
    y_plain = [q.process(x[t * b:(t + 1) * b]) for t in range(6)]

    p.process(x[:b])
    p.update(ir2)
    # hold_samples == block_size: the next block is pure A (old side)
    y_hold = p.process(x[b:2 * b])
    np.testing.assert_allclose(y_hold, y_plain[1], atol=1e-6)
    # the block after starts the ramp: must diverge from pure A
    y_ramp = p.process(x[2 * b:3 * b])
    assert np.abs(y_ramp - y_plain[2]).max() > 1e-4
    # after the fade completes, output is silent (engine B)
    for t in range(3, 6):
        y = p.process(x[t * b:(t + 1) * b])
    assert not p.is_crossfading()
    np.testing.assert_allclose(y, np.zeros(b), atol=1e-5)
