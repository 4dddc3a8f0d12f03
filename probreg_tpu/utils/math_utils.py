"""Math utilities (parity with reference probreg/math_utils.py).

The reference delegates to its ``_math`` C++ extension; here everything is
jax.numpy on top of :mod:`probreg_tpu.ops.pairwise` (XLA fuses the kernel maps
into the MXU distance matmul).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import pairwise


class Normalizer:
    """Shift/scale normalizer (reference math_utils.py:9-25)."""

    def __init__(self, scale: float = 1.0, centroid=0.0):
        self._scale = scale
        self._centroid = centroid

    @classmethod
    def fit(cls, *clouds) -> "Normalizer":
        """Estimate centroid/scale from one or more point clouds."""
        allpts = jnp.concatenate([jnp.asarray(c) for c in clouds], axis=0)
        centroid = jnp.mean(allpts, axis=0)
        scale = jnp.maximum(jnp.max(jnp.linalg.norm(allpts - centroid, axis=1)), 1e-12)
        return cls(scale, centroid)

    def normalize(self, x):
        return (jnp.asarray(x) - self._centroid) / self._scale

    def denormalize(self, x):
        return jnp.asarray(x) * self._scale + self._centroid


def squared_kernel_sum(x: jax.Array, y: jax.Array) -> jax.Array:
    """Mean pairwise squared distance / D — the CPD sigma2 initializer.

    Reference: math_utils.py:28-29 (sum / (M * D * N)). Computed in closed
    form (ops/pairwise.sqdist_sum) so it is O(M+N), not O(M*N).
    """
    x, y = jnp.asarray(x), jnp.asarray(y)
    # float() the denominator: as a Python int it gets weak-typed to int32
    # inside jit and M * D * N overflows already at M = N = 64k.
    return pairwise.sqdist_sum(x, y) / float(x.shape[0] * x.shape[1] * y.shape[0])


def squared_kernel_sum_np(x, y) -> float:
    """Host-side closed-form :func:`squared_kernel_sum` (pure numpy).

    Used by entry points that need sigma2_0 BEFORE the single jitted
    dispatch (CLAUDE.md: init scalars must never be eager device ops).
    Centered on the joint centroid for f64 stability; the mean pairwise
    sqdist is invariant to that shift.
    """
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    m, d = x.shape
    n = y.shape[0]
    cen = (x.sum(0) + y.sum(0)) / (m + n)
    xh, yh = x - cen, y - cen
    return float(((xh ** 2).sum() * n + (yh ** 2).sum() * m
                  - 2.0 * float(xh.sum(0) @ yh.sum(0))) / (m * d * n))


def masked_squared_kernel_sum_t(ys_t, xs_t, smask, tmask) -> jax.Array:
    """squared_kernel_sum over masked transposed clouds, in closed form.

    Ragged-batch padding: the sums run over valid points only and the
    normalizer uses the true counts — exactly squared_kernel_sum of the
    unpadded pair. O(M+N), shared by the cpd / filterreg masked E-steps.
    """
    dim = ys_t.shape[0]
    m = jnp.sum(smask)
    n = jnp.sum(tmask)
    ssum = ys_t @ smask
    tsum = xs_t @ tmask
    s2 = jnp.sum(jnp.sum(ys_t * ys_t, axis=0) * smask)
    t2 = jnp.sum(jnp.sum(xs_t * xs_t, axis=0) * tmask)
    return (s2 * n + t2 * m - 2.0 * ssum @ tsum) / (m * dim * n)


def compute_rmse(source: jax.Array, target) -> jax.Array:
    """Mean nearest-neighbor distance from source to target.

    Reference: math_utils.py:32-33 takes a prebuilt cKDTree; here the second
    argument is simply the target point array (brute-force NN on the MXU).
    """
    d2 = pairwise.nearest_sqdist(jnp.asarray(source), jnp.asarray(target))
    return jnp.mean(jnp.sqrt(d2))


def rbf_kernel(x, y, beta: float):
    return pairwise.rbf_kernel(x, y, beta)


def tps_kernel(x, y):
    """Dimension-dispatching TPS kernel (reference math_utils.py:40-47)."""
    x, y = jnp.asarray(x), jnp.asarray(y)
    assert x.shape[1] == y.shape[1], "x and y must have same dimensions."
    if x.shape[1] == 2:
        return pairwise.tps_kernel_2d(x, y)
    if x.shape[1] == 3:
        return pairwise.tps_kernel_3d(x, y)
    raise ValueError("Invalid dimension of x: %d." % x.shape[1])


def inverse_multiquadric_kernel(x, y, c: float = 1.0):
    return pairwise.inverse_multiquadric_kernel(x, y, c)
