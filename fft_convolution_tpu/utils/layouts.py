"""Device-layout pinning for call-invariant parameters.

The compiled aligned streams consume kernel meta-spectra (khats) with the
contracted m axis MINOR — but a khat crossing the jit boundary as a
parameter arrives in default row-major layout, so XLA inserts a relayout
copy of every plane on EVERY call (2 x 8.4 MB at the 30 s config:
``results/r05/exp_chrono_hlo_q4_pair.log`` ``copy.1185/1187``; the farm's
head khat pays the same ~2.2% x2 — CLAUDE.md).  Khats are
input-independent between IR updates, so the relayout belongs at BUILD
time: ``jax.device_put`` the planes into the m-minor Format once and let
every stream call read them directly.

Measured on TPU by ``benchmarks/exp_khat_layout``, same window, 30 s
config, chrono tail: 2-period calls 0.230 -> 0.155 ms/stream (-33 %),
8-period 0.539 -> 0.504 (-6.5 %).  CPU backends ignore layouts, so
pinning is a no-op there.
"""

from __future__ import annotations

import jax


def pin_m_minor(tree):
    """``device_put`` every rank>=2 float array in ``tree`` into the
    layout with its LAST-BUT-ONE axis minor (the khat planes are
    ``[..., m, B]``; stream consumers contract m), preserving each
    leaf's existing sharding (sharded-farm khats stay sharded).
    Non-array / rank<2 leaves pass through untouched.  Returns a new
    pytree; the inputs' buffers are unchanged."""
    from jax.experimental.layout import Format, Layout

    def pin(x):
        if x is None or not hasattr(x, "ndim") or x.ndim < 2:
            return x
        mtm = tuple(range(x.ndim - 2)) + (x.ndim - 1, x.ndim - 2)
        return jax.device_put(x, Format(Layout(major_to_minor=mtm),
                                        x.sharding))

    return jax.tree.map(pin, tree)
