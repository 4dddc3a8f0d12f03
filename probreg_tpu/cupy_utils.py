"""Drop-in stand-in for the reference's ``probreg.cupy_utils``.

The reference's GPU story is one raw CUDA pairwise-sqdist kernel plus cupy
wrappers (reference cupy_utils.py:5-46, used only by CPD with
``use_cuda=True``). In this framework the accelerator backend is JAX/XLA —
every path already runs on the attached TPU — so these functions simply
delegate to the MXU kernels in :mod:`probreg_tpu.ops.pairwise`, keeping
code written against the reference's module importable unchanged.

(The reference kernel also hard-codes a dim-3 stride — cupy_utils.py:15 —
so it silently breaks on 2-D clouds; the delegating versions here are
dimension-generic.)
"""

from __future__ import annotations

import jax.numpy as jnp

from .ops import pairwise
from .utils import math_utils as _mu


def squard_norm_outer_kernel(x, y):  # [sic] — reference's name, cupy_utils.py:5
    """Pairwise squared-distance matrix |x_i - y_j|^2.

    The reference exposes this as a raw ``cupy.ElementwiseKernel`` object
    (cupy_utils.py:5-22) that callers invoke like a function over broadcast
    index grids; here it is a plain function over the two point arrays,
    computed on the MXU (and dimension-generic, unlike the reference's
    hard-coded dim-3 stride)."""
    return pairwise.sqdist(jnp.asarray(x), jnp.asarray(y))


def squared_kernel_sum(x, y):
    """Mean pairwise squared distance / D (reference cupy_utils.py:25-34)."""
    return _mu.squared_kernel_sum(jnp.asarray(x), jnp.asarray(y))


def rbf_kernel(x, y, beta):
    """RBF Gram matrix exp(-|x-y|^2 / (2 beta^2)) (cupy_utils.py:37-46)."""
    return pairwise.rbf_kernel(jnp.asarray(x), jnp.asarray(y), beta)
