"""L2-distance cost functions for GMMReg / SVR (parity with cost_functions.py).

TPU-first redesign: the reference hand-derives the analytic gradient through
two GaussTransform passes and a 36-partial dR/dq table
(cost_functions.py:33-65, se3_op.py:62-120). Here the scalar objective is
written once in jnp and ``jax.value_and_grad`` differentiates through the
whole pipeline (quaternion -> rotation -> transform -> mixture L2) — exact
gradients, one fused XLA program per evaluation, no hand chain rule.

The reference-shaped ``compute_l2_dist`` (value + gradient w.r.t. the moved
means) is kept for API parity.
"""

from __future__ import annotations

import abc
from functools import partial
from typing import Tuple, Type

import jax
import jax.numpy as jnp
import numpy as np

from . import transformation as tf
from .ops.pairwise import sqdist
from .utils import se3_op as so


def _l2_overlap(mu_source, phi_source, mu_target, phi_target, sigma):
    """-sum_ij phi_s_i phi_t_j N(mu_s_i - mu_t_j; 2 sigma^2) / z.

    Matches compute_l2_dist's f (cost_functions.py:33-41): the Gaussian has
    bandwidth sqrt(2) sigma and the z = (2 pi sigma^2)^(d/2) normalizer.
    """
    d = mu_source.shape[1]
    z = (2.0 * jnp.pi * sigma ** 2) ** (d * 0.5)
    k = jnp.exp(-sqdist(mu_source, mu_target) / (2.0 * sigma ** 2))
    return -(phi_source @ k @ phi_target) / z


_l2_overlap_vg = jax.jit(jax.value_and_grad(_l2_overlap))


def compute_l2_dist(mu_source, phi_source, mu_target, phi_target, sigma):
    """Reference-shaped (f, df/d mu_source) pair (cost_functions.py:33-41).

    One jitted dispatch (trace cached module-level): building
    value_and_grad fresh and running it eagerly cost a tunnel round trip
    per primitive op (review finding).
    """
    f, g = _l2_overlap_vg(
        jnp.asarray(mu_source), jnp.asarray(phi_source),
        jnp.asarray(mu_target), jnp.asarray(phi_target),
        jnp.asarray(sigma))
    return f, g


class CostFunction(abc.ABC):
    def __init__(self, tf_type: Type[tf.Transformation]):
        self._tf_type = tf_type

    @abc.abstractmethod
    def to_transformation(self, theta):
        ...

    @abc.abstractmethod
    def initial(self):
        ...

    @abc.abstractmethod
    def __call__(self, theta, *args) -> Tuple[float, np.ndarray]:
        ...


@jax.jit
def _rigid_obj(theta, mu_source, phi_source, mu_target, phi_target, sigma):
    rot = so.quat2mat(theta[:4])
    t_mu = mu_source @ rot.T + theta[4:7]
    return _l2_overlap(t_mu, phi_source, mu_target, phi_target, sigma)


_rigid_vg = jax.jit(jax.value_and_grad(_rigid_obj))


class RigidCostFunction(CostFunction):
    """Quaternion+translation 7-vector rigid cost (cost_functions.py:44-65)."""

    def __init__(self):
        self._tf_type = tf.RigidTransformation

    def objective(self, theta, mu_source, phi_source, mu_target, phi_target,
                  sigma):
        """Pure-jnp scalar objective (for fully-jitted optimizers)."""
        return _rigid_obj(theta, mu_source, phi_source, mu_target,
                          phi_target, sigma)

    # Stateless pure objective + per-instance extra args: lets optimizers
    # cache one jitted program per cost-function CLASS (a bound method would
    # defeat the jit cache on every new instance).
    pure_objective = staticmethod(_rigid_obj)

    def extra_args(self):
        return ()

    def to_transformation(self, theta):
        # Host-side numpy: theta arrives as a fetched optimizer result; eager
        # jnp ops here would each cost a device round-trip (CLAUDE.md rules).
        theta = np.asarray(theta, np.float64)
        rot = so.quat2mat_np(theta[:4]).astype(np.float32)
        return self._tf_type(rot, theta[4:7].astype(np.float32))

    def initial(self):
        x0 = np.zeros(7)
        x0[0] = 1.0
        return x0

    @staticmethod
    def initial_multistart(n_starts: int) -> np.ndarray:
        """(S, 7) rotation starts: identity, then 180/90/-90 deg about each
        axis — the coarse orientation grid that covers BFGS basins the
        identity start misses at large rotations. The restarts run vmapped
        in the same dispatch; device time scales with the slowest start."""
        h = np.sqrt(0.5)
        quats = [(1.0, 0, 0, 0)]
        for axis in range(3):
            v = [0.0, 0.0, 0.0]
            v[axis] = 1.0
            quats.append((0.0, *v))                       # 180 deg
        for axis in range(3):
            v = [0.0, 0.0, 0.0]
            v[axis] = h
            quats.append((h, *v))                          # +90 deg
            quats.append((-h, *v))                         # -90 deg
        x0s = np.zeros((len(quats), 7))
        x0s[:, :4] = np.asarray(quats)
        if n_starts > len(quats):
            raise ValueError(f"n_starts <= {len(quats)}")
        return x0s[:n_starts]

    @staticmethod
    def initial_multistart_rots(n_starts: int, dim: int = 3) -> np.ndarray:
        """(S, D, D) rotation-matrix view of the orientation grid, shared by
        the CPD/FilterReg/GMMTree/BCPD n_starts restarts. 3-D: identity +
        180/90/-90 deg about each axis (<=10). 2-D: n_starts angles evenly
        spaced on the circle starting at identity."""
        if dim == 2:
            angs = 2.0 * np.pi * np.arange(n_starts) / n_starts
            return np.stack([
                np.asarray([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]],
                           np.float32) for a in angs])
        quats = RigidCostFunction.initial_multistart(n_starts)[:, :4]
        return np.stack([np.asarray(so.quat2mat_np(q), np.float32)
                         for q in quats])

    def __call__(self, theta, *args):
        mu_source, phi_source, mu_target, phi_target, sigma = args
        f, g = _rigid_vg(
            jnp.asarray(theta, jnp.float32), jnp.asarray(mu_source),
            jnp.asarray(phi_source), jnp.asarray(mu_target),
            jnp.asarray(phi_target), jnp.asarray(sigma, jnp.float32))
        return float(f), np.asarray(g, np.float64)


@partial(jax.jit, static_argnames=("dim",))
def _tps_obj(theta, control_pts, mu_source, phi_source, mu_target, phi_target,
             sigma, alpha, beta, *, dim, basis=None, kernel=None):
    n_a = dim * (dim + 1)
    a = theta[:n_a].reshape(dim + 1, dim)
    v = theta[n_a:].reshape(-1, dim)
    tps = tf.TPSTransformation(a, v, control_pts)
    if basis is None:
        # Theta-independent machinery (SVD null-space projection + two
        # TPS kernel builds): the fused-BFGS programs hoist it via
        # pure_prepare — recomputing it on EVERY function/gradient
        # evaluation dominated TPS solves (review finding).
        basis, kernel = tps.prepare(mu_source)
    t_mu = tps.transform_basis(basis)
    bending = jnp.trace(v.T @ kernel @ v)
    f1 = _l2_overlap(t_mu, phi_source, t_mu, phi_source, sigma)
    f2 = _l2_overlap(t_mu, phi_source, mu_target, phi_target, sigma)
    # L2 dist up to a constant: s.s - 2 s.t  (= -f1 + 2 f2 with f = -overlap)
    return alpha * (-f1 + 2.0 * f2) + beta * bending


_tps_vg = jax.jit(jax.value_and_grad(_tps_obj), static_argnames=("dim",))


class TPSCostFunction(CostFunction):
    """TPS (A, V) cost with bending energy (cost_functions.py:68-102)."""

    def __init__(self, control_pts, alpha: float = 1.0, beta: float = 0.1):
        self._tf_type = tf.TPSTransformation
        self._alpha = alpha
        self._beta = beta
        self._control_pts = control_pts

    def objective(self, theta, mu_source, phi_source, mu_target, phi_target,
                  sigma):
        """Pure-jnp scalar objective (for fully-jitted optimizers)."""
        return self.pure_objective(
            theta, mu_source, phi_source, mu_target, phi_target, sigma,
            *self.extra_args())

    @staticmethod
    def pure_objective(theta, mu_source, phi_source, mu_target, phi_target,
                       sigma, control_pts, alpha, beta, basis=None,
                       kernel=None):
        return _tps_obj(theta, control_pts, mu_source, phi_source, mu_target,
                        phi_target, sigma, alpha, beta,
                        dim=int(control_pts.shape[1]), basis=basis,
                        kernel=kernel)

    @staticmethod
    def pure_prepare(mu_source, control_pts, alpha, beta):
        """Hoist the theta-independent TPS basis/kernel ONCE per solve:
        appended to the extra args, they short-circuit the per-evaluation
        prepare() inside _tps_obj."""
        dim = control_pts.shape[1]
        tps = tf.TPSTransformation(
            jnp.zeros((dim + 1, dim), jnp.float32),
            jnp.zeros((control_pts.shape[0], dim), jnp.float32),
            control_pts)
        basis, kernel = tps.prepare(mu_source)
        return (control_pts, alpha, beta, basis, kernel)

    def extra_args(self):
        # Scalars as numpy: an eager jnp.asarray is a device_put (one
        # tunnel RTT each) per fused round; the jit dispatch transfers
        # numpy for free (CLAUDE.md). control_pts passes through as-is —
        # it is usually already a device array (feature_gen.compute
        # output) and converting would round-trip it.
        return (self._control_pts, np.float32(self._alpha),
                np.float32(self._beta))

    def to_transformation(self, theta):
        # Host-side numpy reshapes (see RigidCostFunction.to_transformation);
        # TPSTransformation converts to device arrays once at construction.
        control_pts = np.asarray(self._control_pts, np.float32)
        dim = control_pts.shape[1]
        n_a = dim * (dim + 1)
        theta = np.asarray(theta, np.float32)
        a = theta[:n_a].reshape(dim + 1, dim)
        v = theta[n_a:].reshape(-1, dim)
        return self._tf_type(a, v, control_pts)

    def initial(self):
        dim = np.asarray(self._control_pts).shape[1]
        a = np.r_[np.zeros((1, dim)), np.identity(dim)]
        v = np.zeros((np.asarray(self._control_pts).shape[0] - dim - 1, dim))
        return np.r_[a, v].flatten()

    def __call__(self, theta, *args):
        mu_source, phi_source, mu_target, phi_target, sigma = args
        control_pts = jnp.asarray(self._control_pts, jnp.float32)
        dim = int(control_pts.shape[1])
        f, g = _tps_vg(
            jnp.asarray(theta, jnp.float32), control_pts,
            jnp.asarray(mu_source), jnp.asarray(phi_source),
            jnp.asarray(mu_target), jnp.asarray(phi_target),
            jnp.asarray(sigma, jnp.float32),
            jnp.asarray(self._alpha, jnp.float32),
            jnp.asarray(self._beta, jnp.float32), dim=dim)
        return float(f), np.asarray(g, np.float64)
