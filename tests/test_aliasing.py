"""Donation/aliasing safety (SURVEY.md §5: JAX is functional — the race
analogue worth checking is buffer aliasing under donation).

A state pytree whose leaves share one device buffer breaks
``donate_argnums`` (one buffer cannot be donated twice — hit in production
with the two-stage init's shared zeros, fixed in commit dfded71).  These
tests pin the invariant for every engine's initial state and exercise a
donated chained scan per engine.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from fft_convolution_tpu.models import two_stage, uniform
from fft_convolution_tpu.parallel import farm, farm2


def _buffer_ids(pytree):
    ids = []
    for leaf in jax.tree.leaves(pytree):
        # unsafe_buffer_pointer identifies the device buffer
        try:
            ids.append(leaf.unsafe_buffer_pointer())
        except Exception:
            ids.append(id(leaf))
    return ids


def _assert_no_aliasing(pytree, name):
    ids = _buffer_ids(pytree)
    assert len(ids) == len(set(ids)), f"{name}: state leaves share device buffers"


def test_engine_states_unaliased():
    rng = np.random.default_rng(60)
    ir = rng.standard_normal(9000).astype(np.float32) * 0.05
    _, u_state = uniform.init(ir, 64, len(ir))
    _assert_no_aliasing(u_state, "uniform")
    _, t_state = two_stage.init(ir, 64, len(ir))
    _assert_no_aliasing(t_state, "two_stage")
    irs = rng.standard_normal((3, 2000)).astype(np.float32) * 0.05
    _, f_state = farm.farm_init(jnp.asarray(irs), 64, 2000)
    _assert_no_aliasing(f_state, "farm")
    _, f2_state = farm2.farm2_init(irs, 64, 2000)
    _assert_no_aliasing(f2_state, "farm2")


def test_donated_chained_scan_per_engine():
    """Donating each engine's state into a chained scan must work (this is
    exactly the serving/benchmark pattern) and produce the same audio as the
    undonated path."""
    rng = np.random.default_rng(61)
    ir = rng.standard_normal(4000).astype(np.float32) * 0.05
    x = jnp.asarray(rng.standard_normal((64, 64)).astype(np.float32))

    for name, init_fn, stream_fn in [
        ("uniform", lambda: uniform.init(ir, 64, len(ir)),
         uniform.process_stream),
        ("two_stage", lambda: two_stage.init(ir, 64, len(ir)),
         two_stage.process_stream),
    ]:
        cfg, state = init_fn()

        @functools.partial(jax.jit, donate_argnums=(0,))
        def chained(st, xs, cfg=cfg, stream_fn=stream_fn):
            def body(s, _):
                s2, y = stream_fn(cfg, s, xs)
                return s2, jnp.sum(y)
            sf, sums = jax.lax.scan(body, st, None, length=3)
            return sf, sums

        _, sums_donated = chained(jax.tree.map(jnp.copy, state), x)

        s = state
        sums_plain = []
        for _ in range(3):
            s, y = jax.jit(functools.partial(stream_fn, cfg))(s, x)
            sums_plain.append(float(jnp.sum(y)))
        np.testing.assert_allclose(
            np.asarray(sums_donated), np.asarray(sums_plain), rtol=1e-5,
            err_msg=name,
        )
