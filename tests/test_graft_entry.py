"""Driver entry points stay healthy: single-chip compile and the full
(dp, sp) multi-chip dryrun on the 8-virtual-device CPU mesh."""

import jax


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out[1].shape == (128,)


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
