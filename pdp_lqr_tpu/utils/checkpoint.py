"""Checkpoint / resume for solver state.

The reference's closest concept is factorization caching across ADMM
iterations (the *_without_factorization API, lqr_solver.hpp:65-70);
persistent checkpointing does not exist there.  Here every piece of
solver state (ADMMState, any backend's factor cache) is an immutable
pytree of arrays, so checkpointing is a flat npz round-trip — no
framework dependency, works for warm-starting an MPC loop across
process restarts or migrating a batch between hosts.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import numpy as np


def save_pytree(path, tree: Any) -> None:
    """Serialize a pytree of arrays to ``path`` (.npz)."""
    leaves, treedef = jax.tree.flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    np.savez(path, treedef=np.frombuffer(
        repr(treedef).encode(), dtype=np.uint8), **arrays)


def load_pytree(path, like: Any) -> Any:
    """Restore a pytree saved by ``save_pytree``.

    ``like`` provides the tree structure (e.g. a freshly-initialized
    state of the same shape); leaf values are replaced from the file.
    """
    data = np.load(path)
    leaves, treedef = jax.tree.flatten(like)
    stored_treedef = bytes(data["treedef"]).decode()
    if stored_treedef != repr(treedef):
        raise ValueError(
            "checkpoint tree structure does not match `like`:\n"
            f"  stored:   {stored_treedef}\n  expected: {treedef!r}"
        )
    n = len(leaves)
    loaded = [data[f"leaf_{i}"] for i in range(n)]
    for a, b in zip(leaves, loaded):
        if np.shape(a) != b.shape:
            raise ValueError(
                f"checkpoint leaf shape {b.shape} != expected {np.shape(a)}"
            )
    return jax.tree.unflatten(treedef, [jax.numpy.asarray(x) for x in loaded])
