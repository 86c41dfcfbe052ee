"""Pytree persistence (pickle-based, plus an orbax-free safe default).

Parity reference: mythos/input/tree.py:11-29.
"""

from __future__ import annotations

import pickle
from pathlib import Path

import jax

from mythos_tpu.utils.types import PathOrStr, PyTree


def save_pytree(data: PyTree, filename: PathOrStr) -> None:
    """Save a pytree as (leaves, treedef) via pickle."""
    leaves, treedef = jax.tree_util.tree_flatten(data)
    with Path(filename).open("wb") as f:
        pickle.dump((leaves, treedef), f)


def load_pytree(filename: PathOrStr) -> PyTree:
    """Load a pytree previously saved with save_pytree."""
    with Path(filename).open("rb") as f:
        leaves, treedef = pickle.load(f)  # noqa: S301 - we only load files we write
    return jax.tree_util.tree_unflatten(treedef, leaves)
