"""Checkpoint / resume for engine state.

The reference's nearest analogue is ``Clone`` + ``reset()`` (state is a
plain value, SURVEY.md §5).  Here every engine's state is a pytree, so a
checkpoint is a flat dict of arrays; this module persists wrapper snapshots
(including host-side shadows like the chunker fill) to a single ``.npz``.
"""

from __future__ import annotations

import jax
import numpy as np


def save(path: str, snapshot) -> None:
    """Persist an engine ``snapshot()`` (any pytree of arrays + ints)."""
    leaves, _treedef = jax.tree.flatten(snapshot)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    np.savez(path, **arrays)


def load(path: str, like) -> object:
    """Restore a snapshot saved by :func:`save`.  ``like`` is a template
    snapshot (e.g. ``engine.snapshot()``) providing the tree structure —
    shapes and dtypes are validated leaf by leaf."""
    data = np.load(path)
    leaves, treedef = jax.tree.flatten(like)
    restored = []
    for i, leaf in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        ref = np.asarray(leaf)
        if arr.shape != ref.shape or arr.dtype != ref.dtype:
            raise ValueError(
                f"checkpoint leaf {i}: expected {ref.shape}/{ref.dtype}, "
                f"got {arr.shape}/{arr.dtype}"
            )
        restored.append(arr if ref.ndim or isinstance(leaf, np.ndarray)
                        else arr[()])
    return jax.tree.unflatten(treedef, restored)
