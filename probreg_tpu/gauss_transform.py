"""Gauss transform facade (parity with reference gauss_transform.py).

The reference switches between a python O(MN) direct path and the C++ IFGT
(gauss_transform.py:39-44). On TPU the exact tiled evaluation IS the fast
path (ops/gausstransform.py): the kernel-matrix blocks are MXU matmuls and
the whole transform streams in VMEM-sized tiles, so no eps-approximation
(IFGT truncation) is needed at probreg's scales. The class keeps the
reference's constructor signature (h, eps, sw_h) for drop-in compatibility;
``eps``/``sw_h`` are accepted and unused.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from .ops import gausstransform as gto


def _gauss_transform_direct(source, target, weights, h):
    """sum_j w_j exp(-|t_i - s_j|^2 / h^2) — reference gauss_transform.py:10-18."""
    return np.asarray(gto.gauss_transform(
        jnp.asarray(source, jnp.float32), jnp.asarray(target, jnp.float32),
        jnp.asarray(weights, jnp.float32), float(h)))


class Direct:
    """Exact Gauss transform with a fixed source (gauss_transform.py:28-34)."""

    def __init__(self, source, h):
        self._source = jnp.asarray(source, jnp.float32)
        self._h = float(h)

    def compute(self, target, weights):
        return np.asarray(gto.gauss_transform(
            self._source, jnp.asarray(target, jnp.float32),
            jnp.asarray(weights, jnp.float32), self._h))


class GaussTransform:
    """Calculate Gauss Transform (drop-in for reference gauss_transform.py:27-60).

    Args:
        source: Source data.
        h: Bandwidth parameter of the Gaussian.
        eps: IFGT target error (only used with method='ifgt').
        sw_h: Accepted for compatibility (the reference switches Direct/IFGT
            on h < sw_h; here 'exact' is the default — it is the fast path
            on TPU — and 'ifgt' is opt-in).
        method: 'exact' (default) or 'ifgt'
            (:class:`probreg_tpu.ops.ifgt.Ifgt`).
    """

    def __init__(self, source, h: float, eps: float = 1.0e-4,
                 sw_h: float = 0.01, method: str = "exact"):
        del sw_h
        if method == "ifgt":
            from .ops.ifgt import Ifgt

            # Ifgt exposes .compute(target, weights) like Direct. Do NOT
            # touch its _source/_h: the instance stores the CENTERED
            # cloud (overwriting it with the raw one desynchronized the
            # coefficients from the cluster geometry — review follow-up).
            self._impl = Ifgt(np.asarray(source), h, eps)
        else:
            self._impl = Direct(source, h)
        self._m = np.asarray(source).shape[0]

    def compute(self, target, weights: Optional[np.ndarray] = None):
        if weights is None:
            weights = np.ones(self._m)
        weights = np.asarray(weights)
        if weights.ndim == 1:
            # Host array like the 2-D path below (and the C++ class this
            # facade mirrors): leaking the device array made every
            # numpy op downstream a separate ~33 ms tunnel fetch.
            return np.asarray(self._impl.compute(target, weights))
        if weights.ndim == 2:
            if isinstance(self._impl, Direct):
                # (C, M) row-wise transforms, like the reference loop
                # (gauss_transform.py:57-58) but batched in one call.
                out = gto.gauss_transform(
                    self._impl._source, jnp.asarray(target, jnp.float32),
                    jnp.asarray(weights.T, jnp.float32), self._impl._h)
                return np.asarray(out).T
            return np.stack(
                [np.asarray(self._impl.compute(target, w)) for w in weights])
        raise ValueError("weights.ndim must be 1 or 2.")
