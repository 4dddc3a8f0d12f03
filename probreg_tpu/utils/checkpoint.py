"""Checkpoint / resume of registration state (SURVEY.md §5).

Registration state is a small pytree (a Transformation + scalars); the
reference has no persistence and resumes implicitly via ``tf_init_params``
(cpd.py:129, filterreg.py:151). Here any result pytree round-trips through
an ``.npz`` file, and helpers convert a saved rigid result back into
``tf_init_params`` for warm-starting a new registration.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np


def save_state(path: str, state: Any) -> None:
    """Save any pytree of arrays/scalars to ``path`` (.npz)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    np.savez(
        path,
        __treedef__=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )


def load_leaves(path: str):
    """Load the saved leaves (caller re-assembles with its own structure)."""
    data = np.load(path)
    n = sum(1 for k in data.files if k.startswith("leaf_"))
    return [data[f"leaf_{i}"] for i in range(n)]


def load_state(path: str, like: Any) -> Any:
    """Load a pytree saved by :func:`save_state`, shaped like ``like``."""
    leaves = load_leaves(path)
    treedef = jax.tree_util.tree_structure(like)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def rigid_tf_init_params(transformation) -> Dict:
    """tf_init_params dict to resume CPD/FilterReg from a rigid result."""
    out = {"rot": np.asarray(transformation.rot),
           "t": np.asarray(transformation.t)}
    if hasattr(transformation, "scale"):
        out["scale"] = float(np.asarray(transformation.scale))
    return out
