"""DeformableKinematicFilterReg (reference filterreg.py:199-266, experimental).

The reference requires the optional dq3d package and ships no test; here the
dual-quaternion skinning is native (utils/dualquat.py) and tested.
"""

import numpy as np
import pytest

from probreg_tpu import filterreg
from probreg_tpu.models import transformation as tf


def make_two_segment_cloud(rng, n=80):
    """Points along a bar in x: left half near node 0, right half node 1."""
    pts = np.stack([
        np.linspace(-1.0, 1.0, n),
        0.1 * rng.standard_normal(n),
        0.1 * rng.standard_normal(n),
    ], axis=1).astype(np.float32)
    # Skinning: blend weight by x position between the two nodes.
    wr = np.clip((pts[:, 0] + 1.0) / 2.0, 0.0, 1.0).astype(np.float32)
    pairs = np.tile(np.array([[0, 1]], np.int32), (n, 1))
    vals = np.stack([1.0 - wr, wr], axis=1).astype(np.float32)
    weights = tf.DeformableKinematicModel.SkinningWeight(pairs, vals)
    return pts, weights


def test_deformable_kinematic_filterreg_translation(rng):
    src, weights = make_two_segment_cloud(rng)
    # Target: small rigid-ish bend — translate the right half up.
    shift = np.zeros_like(src)
    wr = np.clip((src[:, 0] + 1.0) / 2.0, 0.0, 1.0)
    shift[:, 1] = 0.15 * wr
    tgt = src + shift

    # sigma2 at point-spacing scale (like the reference, this class takes an
    # explicit sigma2; too-large values over-smooth the virtual targets).
    reg = filterreg.DeformableKinematicFilterReg(src, weights, 0.002)
    res = reg.registration(tgt, maxiter=20, tol=1e-6)
    moved = np.asarray(res.transformation.transform(src))
    before = float(np.linalg.norm(src - tgt))
    after = float(np.linalg.norm(moved - tgt))
    assert after < 0.1 * before, (before, after)


def test_deformable_kinematic_model_transform(rng):
    src, weights = make_two_segment_cloud(rng, n=20)
    from probreg_tpu.utils import dualquat as dq
    import jax.numpy as jnp

    # Node 0 identity; node 1 translates +0.2 in y.
    q0 = dq.identity()
    q1 = dq.from_rot_trans(jnp.asarray([1.0, 0, 0, 0]), jnp.asarray([0.0, 0.2, 0.0]))
    model = tf.DeformableKinematicModel(jnp.stack([q0, q1]), weights)
    moved = np.asarray(model.transform(src))
    wr = np.clip((src[:, 0] + 1.0) / 2.0, 0.0, 1.0)
    np.testing.assert_allclose(moved[:, 1] - src[:, 1], 0.2 * wr, atol=0.02)
    np.testing.assert_allclose(moved[:, 0], src[:, 0], atol=0.02)
