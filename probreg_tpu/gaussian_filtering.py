"""Permutohedral filtering facade (parity with reference gaussian_filtering.py).

The reference wraps its C++ `_permutohedral_lattice` and transposes to the
column layout (gaussian_filtering.py:8-17). Here the lattice is pure JAX
(:mod:`probreg_tpu.ops.permutohedral`) and arrays stay row-major (N, d).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .ops import permutohedral as ph


class Permutohedral:
    """Drop-in for the reference Permutohedral facade.

    Args:
        p: (N, d) feature positions.
        with_blur: apply the lattice blur stage (reference default True).
    """

    def __init__(self, p, with_blur: bool = True):
        self._with_blur = with_blur
        self._lattice = ph.build(jnp.asarray(p, jnp.float32), with_blur)

    def get_lattice_size(self) -> int:
        return int(self._lattice.size)

    def filter(self, v, start: int = 0):
        v = jnp.asarray(v, jnp.float32)
        squeeze = v.ndim == 1
        if squeeze:
            v = v[:, None]
        out = ph.filter(self._lattice, v, start=int(start),
                        with_blur=self._with_blur)
        return np.asarray(out[:, 0] if squeeze else out)
