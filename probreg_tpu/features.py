"""Feature generators: GMM, one-class SVM, FPFH (parity with reference features.py).

TPU-first redesign: the reference delegates to sklearn (GaussianMixture,
OneClassSVM; features.py:54-100) and Open3D C++ (FPFH; features.py:28-51).
Here all three run natively in JAX:

* :class:`GMM` — spherical Gaussian mixture fit by k-means++-style seeding +
  Lloyd iterations + EM, all inside one jitted program.
* :class:`OneClassSVM` — the nu-one-class dual QP solved by projected
  gradient on the box-constrained simplex (bisection projection), fully
  vectorized; weights scaled to libsvm's convention (sum = nu * n).
* :class:`FPFH` — native 33-bin Fast Point Feature Histograms
  (:mod:`probreg_tpu.ops.fpfh`).
"""

from __future__ import annotations

import abc
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .ops.pairwise import sqdist
from .utils import interop


class Feature(abc.ABC):
    @abc.abstractmethod
    def init(self):
        pass

    @abc.abstractmethod
    def compute(self, data):
        ...

    def annealing(self):
        pass

    def __call__(self, data):
        return self.compute(data)


# --------------------------------------------------------------------------
# Spherical GMM (EM) in JAX
# --------------------------------------------------------------------------

def np_prng_key(seed: int) -> np.ndarray:
    """threefry2x32 key data as plain numpy — no eager device op.

    Bitwise-identical to ``jax.random.PRNGKey(seed)`` (verified against
    choice/split), but constructing it costs zero device round-trips
    (CLAUDE.md: every eager jnp op through the remote-TPU transport is an
    RTT). jax.random functions accept raw uint32 (2,) keys directly.
    """
    seed = int(seed)
    return np.asarray([(seed >> 32) & 0xFFFFFFFF, seed & 0xFFFFFFFF],
                      np.uint32)


@partial(jax.jit, static_argnames=("k", "kmeans_iters", "em_iters"))
def _fit_spherical_gmm(key, x, k, kmeans_iters=10, em_iters=40, smask=None):
    """``smask``: optional (N,) validity mask for ragged-batch padding —
    padded points never seed a center, carry zero responsibility, and the
    mixing-weight normalizer is the true count (k must be <= every true
    count in the batch for the maskless-size seeding draw)."""
    n, d = x.shape
    masked = smask is not None
    n_eff = jnp.sum(smask) if masked else n
    # Seed centers: random distinct-ish subset (valid points only if masked).
    if masked:
        idx = jax.random.choice(key, n, (k,), replace=False,
                                p=smask / n_eff)
    else:
        idx = jax.random.choice(key, n, (k,), replace=False)
    mu = x[idx]

    def lloyd(mu, _):
        d2 = sqdist(x, mu)                     # (n, k)
        assign = jnp.argmin(d2, axis=1)
        onehot = jax.nn.one_hot(assign, k, dtype=x.dtype)
        if masked:
            onehot = onehot * smask[:, None]
        counts = jnp.maximum(onehot.sum(0), 1.0)
        mu_new = (onehot.T @ x) / counts[:, None]
        return mu_new, None

    mu, _ = jax.lax.scan(lloyd, mu, None, length=kmeans_iters)

    pi = jnp.full((k,), 1.0 / k, x.dtype)
    if masked:
        xbar = smask @ x / n_eff
        var0 = jnp.sum(
            smask[:, None] * (x - xbar[None, :]) ** 2) / (n_eff * d)
    else:
        var0 = jnp.mean(jnp.var(x, axis=0))
    var = jnp.full((k,), var0, x.dtype)

    def em(carry, _):
        mu, var, pi = carry
        d2 = sqdist(x, mu)
        log_p = -0.5 * d2 / var - 0.5 * d * jnp.log(2.0 * jnp.pi * var) + jnp.log(pi)
        log_r = log_p - jax.scipy.special.logsumexp(log_p, axis=1, keepdims=True)
        r = jnp.exp(log_r)                      # (n, k)
        if masked:
            r = r * smask[:, None]
        nk = jnp.maximum(r.sum(0), 1e-10)
        mu_new = (r.T @ x) / nk[:, None]
        d2_new = sqdist(x, mu_new)
        var_new = jnp.maximum((r * d2_new).sum(0) / (d * nk), 1e-12)
        pi_new = nk / n_eff
        return (mu_new, var_new, pi_new), None

    (mu, var, pi), _ = jax.lax.scan(em, (mu, var, pi), None, length=em_iters)
    return mu, pi


class GMM(Feature):
    """Spherical GMM mixture extraction (reference features.py:54-69)."""

    def __init__(self, n_gmm_components: int = 800, seed: int = 0,
                 em_iters: int = 40):
        self._n_gmm_components = n_gmm_components
        self._seed = seed
        self._em_iters = em_iters
        self._counter = 0

    def init(self):
        # Fresh randomness each outer annealing round, like sklearn refits.
        self._counter += 1

    def compute(self, data):
        x = jnp.asarray(data, jnp.float32)
        k = min(self._n_gmm_components, x.shape[0])
        key = np_prng_key(self._seed + self._counter)
        mu, pi = _fit_spherical_gmm(key, x, k, em_iters=self._em_iters)
        return mu, pi

    # Fused-registration hooks (l2dist_regs traces the fit INSIDE the
    # whole-round program so fit(source)+fit(target)+BFGS is one dispatch).
    def fused_static(self, n):
        return (min(self._n_gmm_components, n), self._em_iters)

    def fused_dynamic(self):
        return (np_prng_key(self._seed + self._counter),)

    @staticmethod
    def fused_fit(x, static, dynamic, smask=None):
        k, em_iters = static
        (key,) = dynamic
        return _fit_spherical_gmm(key, x, k, em_iters=em_iters, smask=smask)


# --------------------------------------------------------------------------
# One-class SVM dual in JAX
# --------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("iters",))
def _fit_ocsvm_dual(x, gamma, nu, iters=300, smask=None):
    """Solve min 1/2 a^T K a  s.t. 0 <= a_i <= 1/(nu n), sum a = 1.

    Projected gradient with a box-simplex projection by bisection.
    Returns alpha scaled to libsvm's convention (sum = nu * n).
    ``smask``: optional validity mask (ragged-batch padding) — padded
    points are zeroed out of K and pinned at alpha = 0 by the masked
    projection; all normalizers use the true count.
    """
    n = x.shape[0]
    masked = smask is not None
    n_eff = jnp.sum(smask) if masked else n
    k = jnp.exp(-gamma * sqdist(x, x))
    if masked:
        k = k * smask[:, None] * smask[None, :]
    c = 1.0 / (nu * n_eff)
    pmask = smask if masked else jnp.ones((n,), x.dtype)

    def project(v):
        # Exact one-shot projection onto {0 <= a <= c, sum a = 1}: tau solves
        # s(tau) = sum_i clip(v_i - tau, 0, c) = 1. s is piecewise linear and
        # nonincreasing with breakpoints at {v_i} and {v_i - c}; evaluate s at
        # ALL 2n breakpoints in parallel (one (2n, n) clip+reduce — same
        # O(n^2) cost as the PG step's matvec) and interpolate the crossing
        # segment. Replaces a 50-step sequential bisection whose latency
        # chain dominated the whole dual solve on TPU. When masked, padded
        # entries are excluded from every sum and end at exactly 0.
        b = jnp.concatenate([v, v - c])
        s = jnp.sum(pmask[None, :] * jnp.clip(v[None, :] - b[:, None],
                                              0.0, c), axis=1)
        valid = s >= 1.0  # s(min v - c) = c n >= 1 for nu <= 1; s(max v) = 0
        b_lo = jnp.max(jnp.where(valid, b, -jnp.inf))
        s_lo = jnp.sum(pmask * jnp.clip(v - b_lo, 0.0, c))
        b_hi = jnp.min(jnp.where(valid, jnp.inf, b))
        s_hi = jnp.sum(pmask * jnp.clip(v - b_hi, 0.0, c))
        tau = b_lo + (s_lo - 1.0) * (b_hi - b_lo) / jnp.maximum(
            s_lo - s_hi, 1e-30)
        return pmask * jnp.clip(v - tau, 0.0, c)

    eta = 1.0 / jnp.max(jnp.sum(jnp.abs(k), axis=1))  # 1 / ||K||_inf
    alpha = project(jnp.full((n,), 1.0 / n_eff, x.dtype) * pmask)

    def pg(alpha, _):
        g = k @ alpha
        return project(alpha - eta * g), None

    alpha, _ = jax.lax.scan(pg, alpha, None, length=iters)
    return alpha * (nu * n_eff)


class OneClassSVM(Feature):
    """One-class SVM mixture extraction (reference features.py:72-100).

    The mixture means are the support vectors, the weights the dual
    coefficients scaled by z = (2 pi sigma^2)^(d/2) (features.py:95-97);
    gamma anneals by ``delta`` each outer round (features.py:99-100).
    """

    def __init__(self, dim: int, sigma: float, gamma: float = 0.5,
                 nu: float = 0.05, delta: float = 10.0):
        self._dim = dim
        self._sigma = sigma
        self._gamma = gamma
        self._nu = nu
        self._delta = delta

    def init(self):
        pass

    def compute(self, data):
        x = jnp.asarray(data, jnp.float32)
        alpha = _fit_ocsvm_dual(
            x, np.float32(self._gamma),
            float(self._nu))
        z = np.power(2.0 * np.pi * self._sigma ** 2, self._dim * 0.5)
        sv = alpha > 1e-8
        # Static-shape friendly: keep all points; zero weights drop out of
        # the Gauss transform. (The reference returns only support vectors.)
        return x, alpha * z * sv

    def annealing(self):
        self._gamma *= self._delta

    # Fused-registration hooks (see GMM.fused_fit).
    def fused_static(self, n):
        return ()

    def fused_dynamic(self):
        # Plain numpy scalars: an eager jnp.asarray is a device_put — a
        # full tunnel RTT each, paid once per annealing round (CLAUDE.md;
        # GMM.fused_dynamic follows the same rule).
        z = np.power(2.0 * np.pi * self._sigma ** 2, self._dim * 0.5)
        return (np.float32(self._gamma), np.float32(self._nu),
                np.float32(z))

    @staticmethod
    def fused_fit(x, static, dynamic, smask=None):
        del static
        gamma, nu, z = dynamic
        alpha = _fit_ocsvm_dual(x, gamma, nu, smask=smask)
        return x, alpha * z * (alpha > 1e-8)


class FPFH(Feature):
    """Fast Point Feature Histograms, 33-D (reference features.py:28-51).

    The reference calls Open3D's C++ pipeline; here the histograms are
    computed natively (:mod:`probreg_tpu.ops.fpfh`) with radius-style
    k-nearest neighborhoods on the MXU.
    """

    def __init__(self, radius_normal: float = 0.1, radius_feature: float = 0.5,
                 max_nn_normal: int = 30, max_nn_feature: int = 100):
        self._radius_normal = radius_normal
        self._radius_feature = radius_feature
        self._max_nn_normal = max_nn_normal
        self._max_nn_feature = max_nn_feature

    def init(self):
        pass

    def estimate_normals(self, points):
        """Normals for an (N, 3) cloud (reference features.py:43-44 mutates
        the Open3D PointCloud in place; here the normals are returned)."""
        from .ops import fpfh as fpfh_ops

        return fpfh_ops.estimate_normals(
            jnp.asarray(interop.as_points(points), jnp.float32),
            radius=self._radius_normal, max_nn=self._max_nn_normal)

    def compute(self, data):
        from .ops import fpfh as fpfh_ops

        return fpfh_ops.fpfh(
            jnp.asarray(data, jnp.float32),
            radius_normal=self._radius_normal,
            radius_feature=self._radius_feature,
            max_nn_normal=self._max_nn_normal,
            max_nn_feature=self._max_nn_feature,
        )
