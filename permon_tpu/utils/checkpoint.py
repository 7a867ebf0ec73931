"""Checkpoint / resume of factorizations and solver state.

The reference has no checkpointing; its closest mechanisms are
QPTFetiPrepareReuseCP (cache the factorized coarse problem across repeated
solves, qptransform.c:1213-1251) and QPDump (-qp_dump writes A, b to binary
files).  This module provides the real thing for the TPU build: any pytree
of arrays (Cholesky factors, SMALXE outer state, solver results, whole QP
dataclasses) can be saved to a single .npz and restored, so long-running
contact/time-stepping campaigns can resume without re-factorizing.

Arrays are pulled to host as numpy; structure (dataclass types, static
fields) is rebuilt from a treedef produced at save time via
jax.tree_util.tree_flatten, serialized by fully-qualified type name.
For production multi-host checkpointing, orbax-checkpoint is the drop-in
upgrade — the API here intentionally matches save(path, tree)/load(path).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np


def _flatten(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return [np.asarray(x) for x in leaves], treedef


def save(path: str, tree: Any) -> None:
    """Save a pytree of arrays to ``path`` (.npz).  The tree structure is
    stored alongside the leaves so :func:`load` restores the same pytree
    shape (with jnp arrays as leaves)."""
    import pickle

    leaves, treedef = _flatten(tree)
    payload = {f"leaf_{i}": leaf for i, leaf in enumerate(leaves)}
    payload["treedef"] = np.frombuffer(pickle.dumps(treedef), dtype=np.uint8)
    tmp = path + ".tmp.npz"  # savez appends .npz unless already present
    np.savez_compressed(tmp, **payload)
    os.replace(tmp, path)


def load(path: str) -> Any:
    """Restore a pytree saved by :func:`save`; leaves come back as jnp
    arrays on the default device."""
    import pickle

    import jax.numpy as jnp

    with np.load(path, allow_pickle=False) as data:
        treedef = pickle.loads(data["treedef"].tobytes())
        n = len([k for k in data.files if k.startswith("leaf_")])
        leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def dump_qp(path: str, qp) -> None:
    """QPDump analog: save the QP's data (A as dense, b, constraints)."""
    save(path, qp)


def load_qp(path: str):
    return load(path)
