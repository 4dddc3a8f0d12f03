import jax
import jax.numpy as jnp
import numpy as np

from probreg_tpu import se3_op as so
from probreg_tpu import transformation as tf


def test_rigid_transform_inverse_compose(rng):
    rot = np.asarray(so.euler2mat(0.1, -0.2, 0.3))
    t = rng.normal(size=3).astype(np.float32)
    trans = tf.RigidTransformation(rot, t, 1.3)
    pts = rng.random((20, 3)).astype(np.float32)
    out = np.asarray(trans.transform(pts))
    assert np.allclose(out, 1.3 * pts @ rot.T + t, atol=1e-5)
    back = np.asarray(trans.inverse().transform(out))
    assert np.allclose(back, pts, atol=1e-4)
    comp = trans * trans.inverse()
    assert np.allclose(np.asarray(comp.rot), np.eye(3), atol=1e-5)
    assert np.allclose(np.asarray(comp.t), 0.0, atol=1e-4)
    assert np.isclose(float(comp.scale), 1.0, atol=1e-5)


def test_rigid_is_pytree():
    trans = tf.RigidTransformation()
    leaves, treedef = jax.tree_util.tree_flatten(trans)
    assert len(leaves) == 3
    rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
    assert np.allclose(np.asarray(rebuilt.rot), np.eye(3))

    @jax.jit
    def apply(tr, pts):
        return tr._transform(pts)

    pts = jnp.ones((4, 3))
    assert apply(trans, pts).shape == (4, 3)


def test_affine(rng):
    b = rng.normal(size=(3, 3)).astype(np.float32)
    t = rng.normal(size=3).astype(np.float32)
    trans = tf.AffineTransformation(b, t)
    pts = rng.random((10, 3)).astype(np.float32)
    assert np.allclose(np.asarray(trans.transform(pts)), pts @ b.T + t, atol=1e-5)


def test_nonrigid_zero_weights_is_identity(rng):
    pts = rng.random((15, 3)).astype(np.float32)
    trans = tf.NonRigidTransformation(np.zeros((15, 3), np.float32), pts, beta=2.0)
    assert np.allclose(np.asarray(trans.transform(pts)), pts, atol=1e-6)


def test_combined(rng):
    rot = np.asarray(so.euler2mat(0.0, 0.0, 0.5))
    v = rng.normal(size=(10, 3)).astype(np.float32) * 0.01
    trans = tf.CombinedTransformation(rot, np.zeros(3), 1.0, v)
    pts = rng.random((10, 3)).astype(np.float32)
    assert np.allclose(np.asarray(trans.transform(pts)), (pts + v) @ rot.T, atol=1e-5)


def test_tps_identity_params(rng):
    ctrl = rng.random((8, 3)).astype(np.float32)
    a = np.r_[np.zeros((1, 3)), np.eye(3)].astype(np.float32)
    v = np.zeros((8 - 3 - 1, 3), np.float32)
    trans = tf.TPSTransformation(a, v, ctrl)
    pts = rng.random((12, 3)).astype(np.float32)
    out = np.asarray(trans.transform(pts))
    assert np.allclose(out, pts, atol=1e-4)


def test_deformable_kinematic_identity(rng):
    from probreg_tpu.utils import dualquat as dq

    n = 6
    pairs = np.stack([np.zeros(n, np.int32), np.ones(n, np.int32)], axis=1)
    vals = np.full((n, 2), 0.5, np.float32)
    weights = tf.DeformableKinematicModel.make_weight(pairs, vals)
    quats = jnp.stack([dq.identity(), dq.identity()])
    model = tf.DeformableKinematicModel(quats, weights)
    pts = rng.random((n, 3)).astype(np.float32)
    assert np.allclose(np.asarray(model.transform(pts)), pts, atol=1e-5)


def test_deformable_kinematic_rigid_motion(rng):
    """All weights on one node carrying a pure rotation+translation."""
    from probreg_tpu.utils import dualquat as dq

    n = 5
    tw = jnp.array([0.0, 0.0, 0.3, 0.1, -0.2, 0.05], jnp.float32)
    node = dq.from_twist(tw)
    pairs = np.stack([np.zeros(n, np.int32), np.ones(n, np.int32)], axis=1)
    vals = np.stack([np.ones(n, np.float32), np.zeros(n, np.float32)], axis=1)
    weights = tf.DeformableKinematicModel.make_weight(pairs, vals)
    model = tf.DeformableKinematicModel(jnp.stack([node, dq.identity()]), weights)
    pts = rng.random((n, 3)).astype(np.float32)
    rot, t = so.twist_trans(tw)
    expected = pts @ np.asarray(rot).T + np.asarray(t)
    assert np.allclose(np.asarray(model.transform(pts)), expected, atol=1e-5)
