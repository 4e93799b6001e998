"""The meta-DFT's direct-vs-4-step paths (ops/fft._cdft4_axis2).

Small meta sizes (m <= _DIRECT_META_MAX) run as one direct complex basis
matmul; larger ones as the Bailey 4-step. Both must agree across the
boundary, including the out_rows row-window slicing and the folded scale
— the conv-core tail routing and the two-stage side passes depend on
exact interchangeability (a khat built by either path serves streams run
by either).
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp

from fft_convolution_tpu.ops.fft import (_DIRECT_META_MAX, _cdft4_axis2,
                                         _split_factors)


def _naive_cdft(re, im, m, sign, scale=1.0):
    k = np.arange(m)
    ang = 2.0 * np.pi * np.outer(k, k) / m
    c = np.cos(ang)
    s = sign * np.sin(ang)
    zr = re.astype(np.float64)
    zi = im.astype(np.float64)
    out_re = np.einsum("ki,...il->...kl", c, zr) - np.einsum(
        "ki,...il->...kl", s, zi)
    out_im = np.einsum("ki,...il->...kl", s, zr) + np.einsum(
        "ki,...il->...kl", c, zi)
    return scale * out_re, scale * out_im


def test_direct_meta_matches_naive_and_4step():
    rng = np.random.default_rng(90)
    lanes = 128
    for m, sign in ((64, -1.0), (_DIRECT_META_MAX, 1.0)):
        re = rng.standard_normal((3, m, lanes)).astype(np.float32)
        im = rng.standard_normal((3, m, lanes)).astype(np.float32)
        scale = 1.0 / m if sign > 0 else 1.0
        got_re, got_im = jax.jit(functools.partial(
            _cdft4_axis2, m=m, sign=sign, scale=scale
        ))(jnp.asarray(re), jnp.asarray(im))
        exp_re, exp_im = _naive_cdft(re, im, m, sign, scale)
        tol = 2e-4 * max(np.abs(exp_re).max(), 1.0)
        np.testing.assert_allclose(np.asarray(got_re), exp_re, atol=tol)
        np.testing.assert_allclose(np.asarray(got_im), exp_im, atol=tol)

        # forcing the 4-step via explicit factors must agree with direct
        f_re, f_im = jax.jit(functools.partial(
            _cdft4_axis2, m=m, sign=sign, scale=scale,
            factors=_split_factors(m),
        ))(jnp.asarray(re), jnp.asarray(im))
        np.testing.assert_allclose(np.asarray(got_re), np.asarray(f_re),
                                   atol=tol)
        np.testing.assert_allclose(np.asarray(got_im), np.asarray(f_im),
                                   atol=tol)


def test_direct_meta_out_rows_window():
    """out_rows slices the output row window identically on both paths,
    including windows that straddle the 4-step's k1-block boundaries."""
    rng = np.random.default_rng(91)
    m, lanes = 128, 64
    re = jnp.asarray(rng.standard_normal((m, lanes)).astype(np.float32))
    im = jnp.asarray(rng.standard_normal((m, lanes)).astype(np.float32))
    full_re, full_im = jax.jit(functools.partial(
        _cdft4_axis2, m=m, sign=-1.0))(re, im)
    for r0, cnt in ((0, m), (17, 40), (m - 9, 9), (63, 2)):
        w_re, w_im = jax.jit(functools.partial(
            _cdft4_axis2, m=m, sign=-1.0, out_rows=(r0, cnt)))(re, im)
        np.testing.assert_array_equal(
            np.asarray(w_re), np.asarray(full_re)[r0: r0 + cnt])
        np.testing.assert_array_equal(
            np.asarray(w_im), np.asarray(full_im)[r0: r0 + cnt])
        f_re, f_im = jax.jit(functools.partial(
            _cdft4_axis2, m=m, sign=-1.0, out_rows=(r0, cnt),
            factors=_split_factors(m)))(re, im)
        tol = 2e-4 * max(float(jnp.abs(full_re).max()), 1.0)
        np.testing.assert_allclose(np.asarray(w_re), np.asarray(f_re),
                                   atol=tol)


def test_boundary_sizes_route_consistently():
    """A khat built at m just above the direct ceiling uses the 4-step on
    both build and consume sides (routing keys only on m)."""
    from fft_convolution_tpu.models import uniform

    rng = np.random.default_rng(92)
    ir = rng.standard_normal(4096 * 40).astype(np.float32) * 0.02
    cfg, state = uniform.init(ir, 4096, len(ir))   # N=40, big block
    # q chosen so m = npo2(39 + q) crosses the 256 boundary: q=218 -> 256
    # (direct), q=220 -> m=512 would need CORR... keep within a plain
    # stream call instead: t picks the meta size directly
    for t in (8, 32):
        kh = jax.jit(functools.partial(uniform.stream_khat, cfg),
                     static_argnums=(1,))(state, t)
        x = jnp.asarray(rng.standard_normal((t, 4096)).astype(np.float32))
        run = jax.jit(functools.partial(uniform.process_stream, cfg))
        s1, y1 = run(state, x)
        s2, y2 = run(state, x, kern_hat=kh)
        scale = max(float(jnp.abs(y1).max()), 1.0)
        np.testing.assert_allclose(np.asarray(y2), np.asarray(y1),
                                   atol=1e-5 * scale)


def test_causal_conv_multi_matches_per_kernel_calls():
    """causal_conv_multi (shared forward + lane-stacked inverse + folded
    lane-0 conj corrections) must reproduce per-kernel causal_conv_time
    calls exactly — including lane 0, the packed DC/Nyquist lane whose
    correction rides the stacked inverse as an extra lane block."""
    from fft_convolution_tpu.ops.fft import (causal_conv_khat,
                                             causal_conv_multi,
                                             causal_conv_time)

    rng = np.random.default_rng(93)
    b = 128
    n, t = 16, 48
    m = 128  # >= t + 2n - 1, power of two
    ext = rng.standard_normal((n + t, 2, b)).astype(np.float32) * 0.3
    ext = jnp.asarray(np.concatenate(
        [ext, np.zeros((m - n - t, 2, b), np.float32)], axis=0))
    kerns = [
        jnp.asarray(rng.standard_normal((2 * n, 2, b)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((n, 2, b)).astype(np.float32)),
    ]
    windows = [(n, t), (0, n + t)]

    multi = jax.jit(functools.partial(causal_conv_multi, m=m,
                                      windows=windows))(ext, kerns)
    for kern, (r0, cnt), got in zip(kerns, windows, multi):
        want = jax.jit(functools.partial(causal_conv_time, m=m, row0=r0,
                                         t_out=cnt))(ext, kern)
        scale = max(float(jnp.abs(want).max()), 1.0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5 * scale)

    # precomputed khats route identically to raw kernels
    khats = [causal_conv_khat(k, m) for k in kerns]
    multi_h = jax.jit(functools.partial(causal_conv_multi, m=m,
                                        windows=windows))(ext, khats)
    for a, c in zip(multi, multi_h):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a), atol=1e-5)

    # tuple (plane-separated) ext form
    multi_t = jax.jit(functools.partial(causal_conv_multi, m=m,
                                        windows=windows))(
        (ext[:, 0], ext[:, 1]), kerns)
    for a, c in zip(multi, multi_t):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a), atol=1e-5)
