"""Transformation models as JAX pytrees.

Parity with reference probreg/transformation.py (Rigid, Affine, NonRigid,
Combined, TPS, DeformableKinematic), redesigned TPU-first: every model is a
registered pytree whose ``_transform`` is pure jax.numpy, so a transformation
can live inside ``lax.while_loop`` EM state, be ``vmap``-ed over batches of
clouds, and be checkpointed as a plain pytree.

``transform`` is the host-friendly wrapper (accepts numpy / Open3D containers
at the boundary, reference transformation.py:23-26); ``_transform`` is the
traced path.
"""

from __future__ import annotations

import abc

import jax
import jax.numpy as jnp
import numpy as np

from ..config import config
from ..ops import pairwise
from ..utils import dualquat as dq
from ..utils import interop


class Transformation(abc.ABC):
    """ABC matching reference transformation.py:18-30."""

    def transform(self, points, array_type=None):
        pts = interop.as_points(points, dtype=config.dtype)
        out = self._transform(jnp.asarray(pts))
        return interop.maybe_o3_roundtrip(out, points)

    @abc.abstractmethod
    def _transform(self, points: jax.Array) -> jax.Array:
        ...


def _f(x, like=None):
    # Host values stay HOST numpy: a transform built from fetched optimizer
    # results (e.g. cost_functions.to_transformation) would otherwise be
    # re-uploaded, and reading res.rot back would cost a full tunnel round
    # trip (~33 ms) for a 3x3 that was already on the host. numpy leaves
    # are valid pytree leaves — jit uploads them at dispatch; tracers and
    # device arrays pass through jnp.asarray unchanged.
    if isinstance(x, (np.ndarray, np.generic, float, int, list, tuple)):
        return np.asarray(x, dtype=config.dtype)
    return jnp.asarray(x, dtype=config.dtype)


@jax.tree_util.register_pytree_node_class
class RigidTransformation(Transformation):
    """x -> scale * R x + t (reference transformation.py:33-60)."""

    def __init__(self, rot=None, t=None, scale=1.0, xp=None, dim: int = 3):
        # ``xp`` accepted for reference API compatibility; ignored (JAX only).
        del xp
        if rot is None:
            rot = np.eye(dim, dtype=config.dtype)
        if t is None:
            t = np.zeros(dim, dtype=config.dtype)
        self.rot = _f(rot)
        self.t = _f(t)
        self.scale = _f(scale)

    def _transform(self, points):
        return self.scale * points @ self.rot.T + self.t

    def inverse(self) -> "RigidTransformation":
        return RigidTransformation(
            self.rot.T, -(self.rot.T @ self.t) / self.scale, 1.0 / self.scale
        )

    def __mul__(self, other: "RigidTransformation") -> "RigidTransformation":
        return RigidTransformation(
            self.rot @ other.rot,
            self.t + self.scale * self.rot @ other.t,
            self.scale * other.scale,
        )

    def tree_flatten(self):
        return (self.rot, self.t, self.scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.rot, obj.t, obj.scale = children
        return obj

    def __repr__(self):
        return f"RigidTransformation(rot={self.rot}, t={self.t}, scale={self.scale})"


@jax.tree_util.register_pytree_node_class
class AffineTransformation(Transformation):
    """x -> B x + t (reference transformation.py:63-78)."""

    def __init__(self, b=None, t=None, xp=None, dim: int = 3):
        del xp
        # Host numpy defaults: an eager jnp.eye/zeros is a device_put
        # (~33 ms tunnel RTT) at construction AND a device fetch on every
        # .b/.t read-back (CLAUDE.md; RigidTransformation does the same).
        if b is None:
            b = np.eye(dim, dtype=config.dtype)
        if t is None:
            t = np.zeros(dim, dtype=config.dtype)
        self.b = _f(b)
        self.t = _f(t)

    def _transform(self, points):
        return points @ self.b.T + self.t

    def tree_flatten(self):
        return (self.b, self.t), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.b, obj.t = children
        return obj


@jax.tree_util.register_pytree_node_class
class NonRigidTransformation(Transformation):
    """x -> x + G(Y, Y; beta) W — motion-coherence displacement field.

    Reference transformation.py:81-102. The RBF Gram matrix ``g`` is built
    once from the (static) source points; ``w`` is the EM-updated weight
    matrix. Both are pytree leaves so the EM loop stays inside jit.
    """

    def __init__(self, w, points=None, beta: float = 2.0, xp=None, g=None):
        del xp
        if g is None:
            g = pairwise.rbf_kernel(_f(points), _f(points), beta)
        self.g = _f(g)
        if w is None:
            # Zero displacement field, (M, D) like the points (an (M, 0)
            # placeholder crashed _transform with a broadcast error —
            # review finding).
            if points is None:
                raise ValueError(
                    "NonRigidTransformation(w=None) needs points= to "
                    "shape the zero displacement field")
            w = np.zeros(np.asarray(points).shape, config.dtype)
        self.w = _f(w)

    def _transform(self, points):
        return points + self.g @ self.w

    def tree_flatten(self):
        return (self.g, self.w), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.g, obj.w = children
        return obj


@jax.tree_util.register_pytree_node_class
class LowRankNonRigidTransformation(Transformation):
    """Nonrigid displacement with a low-rank Gram factor: x -> x + U zc.

    Same model as :class:`NonRigidTransformation` (reference
    transformation.py:81-102) but G(Y, Y; beta) is held as its rank-K
    Nystrom eigenfactors ``(u, lam)`` and the weight matrix as the spectral
    displacement coefficients ``zc = diag(lam) U^T W`` (K, D) — the
    displacement G W == U zc without ever forming W (ops/lowrank.py
    explains why that is also the numerically stable choice). O(M K)
    memory, one skinny matmul to apply. Like the dense model, the
    displacement field is defined at the source points only.
    """

    def __init__(self, zc, u, lam):
        self.zc = _f(zc)
        self.u = _f(u)
        self.lam = _f(lam)

    def _transform(self, points):
        return points + self.u @ self.zc

    def tree_flatten(self):
        return (self.zc, self.u, self.lam), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.zc, obj.u, obj.lam = children
        return obj


@jax.tree_util.register_pytree_node_class
class CombinedTransformation(Transformation):
    """x -> rigid(x + v): BCPD's combined rigid+scale+nonrigid model.

    Reference transformation.py:105-121.
    """

    def __init__(self, rot=None, t=None, scale=1.0, v=0.0, dim: int = 3):
        self.rigid_trans = RigidTransformation(rot, t, scale, dim=dim)
        self.v = _f(v)

    def _transform(self, points):
        return self.rigid_trans._transform(points + self.v)

    def tree_flatten(self):
        return (self.rigid_trans, self.v), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.rigid_trans, obj.v = children
        return obj


@jax.tree_util.register_pytree_node_class
class TPSTransformation(Transformation):
    """Thin-plate-spline transformation (reference transformation.py:124-160).

    ``prepare`` builds the TPS basis with the null-space projection of the
    control-point design matrix (SVD-orthogonalized, transformation.py:141-153).
    """

    def __init__(self, a, v, control_pts, kernel="auto"):
        self.a = _f(a)
        self.v = _f(v)
        self.control_pts = _f(control_pts)
        self._kernel = kernel

    def _kfn(self, x, y):
        if callable(self._kernel):
            return self._kernel(x, y)
        if x.shape[1] == 2:
            return pairwise.tps_kernel_2d(x, y)
        return pairwise.tps_kernel_3d(x, y)

    def prepare(self, landmarks):
        landmarks = _f(landmarks)
        control_pts = self.control_pts
        m, d = landmarks.shape
        n = control_pts.shape[0]
        pm = jnp.concatenate([jnp.ones((m, 1), landmarks.dtype), landmarks], axis=1)
        pn = jnp.concatenate([jnp.ones((n, 1), landmarks.dtype), control_pts], axis=1)
        u, _, _ = jnp.linalg.svd(pn, full_matrices=True)
        pp = u[:, d + 1:]
        kk = self._kfn(control_pts, control_pts)
        uu = self._kfn(landmarks, control_pts)
        basis = jnp.concatenate([pm, uu @ pp], axis=1)
        kernel = pp.T @ kk @ pp
        return basis, kernel

    def transform_basis(self, basis):
        return basis @ jnp.concatenate([self.a, self.v], axis=0)

    def _transform(self, points):
        basis, _ = self.prepare(points)
        return self.transform_basis(basis)

    def tree_flatten(self):
        return (self.a, self.v, self.control_pts), self._kernel

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.a, obj.v, obj.control_pts = children
        obj._kernel = aux
        return obj


@jax.tree_util.register_pytree_node_class
class DeformableKinematicModel(Transformation):
    """Dual-quaternion blended skinning model (transformation.py:163-212).

    The reference requires the optional ``dq3d`` package; here dual
    quaternions are plain (n, 8) arrays (:mod:`probreg_tpu.utils.dualquat`)
    and the per-point blend is one vectorized gather + DLB.
    """

    class SkinningWeight:
        """Per-point (pair of node ids, pair of weights).

        Reference keeps a numpy structured array (transformation.py:171-194);
        here two dense arrays: ``pair`` (P, 2) int32, ``val`` (P, 2) float.
        """

        def __init__(self, pair, val):
            self.pair = np.asarray(pair, dtype=np.int32)
            self.val = np.asarray(val, dtype=np.float32)

        def __len__(self):
            return self.pair.shape[0]

        @property
        def n_nodes(self):
            return int(self.pair.max()) + 1

        def pairs_set(self):
            import itertools

            return itertools.permutations(range(self.n_nodes), 2)

        def in_pair(self, pair):
            return np.argwhere((self.pair == np.asarray(pair)).all(1)).flatten()

    @classmethod
    def make_weight(cls, pairs, vals):
        return cls.SkinningWeight(pairs, vals)

    def __init__(self, dualquats, weights):
        # dualquats: (n_nodes, 8) array or list of 8-vectors. Stacked on
        # host when given as a list (eager jnp ops cost tunnel RTTs).
        self.dualquats = _f(np.stack([np.asarray(q) for q in dualquats])
                            if not hasattr(dualquats, "ndim") else dualquats)
        self.weights = weights

    def _transform(self, points):
        pair = jnp.asarray(self.weights.pair)
        val = jnp.asarray(self.weights.val, dtype=points.dtype)
        q0 = self.dualquats[pair[:, 0]]
        q1 = self.dualquats[pair[:, 1]]
        blended = dq.dlb2(val[:, 0], q0, val[:, 1], q1)
        return dq.transform_point(blended, points)

    def tree_flatten(self):
        return (self.dualquats,), self.weights

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        (obj.dualquats,) = children
        obj.weights = aux
        return obj
