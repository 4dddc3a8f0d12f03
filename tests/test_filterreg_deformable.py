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


def test_deformable_recovers_per_node_twists(rng):
    """Round-3 quality gate: build the target from KNOWN per-node dual
    quaternions through the same skinning model; registration must recover
    each node's rotation and translation (not just shrink the residual).
    Also pins the whole-EM runner path: one XLA program per registration."""
    import jax.numpy as jnp

    from probreg_tpu.utils import dualquat as dq

    src, weights = make_two_segment_cloud(rng, n=240)
    gt0 = dq.from_twist(jnp.asarray([0.0, 0.0, 0.0, 0.0, 0.0, 0.0]))
    gt1 = dq.from_twist(jnp.asarray([0.0, 0.0, 0.18, 0.02, 0.1, -0.03]))
    gt = jnp.stack([gt0, gt1])
    model_gt = tf.DeformableKinematicModel(gt, weights)
    tgt = np.asarray(model_gt.transform(src))

    calls = []
    orig = filterreg._run_em_deformable

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    filterreg._run_em_deformable = spy
    try:
        reg = filterreg.DeformableKinematicFilterReg(src, weights, 0.002)
        res = reg.registration(tgt, maxiter=40, tol=1e-8)
    finally:
        filterreg._run_em_deformable = orig
    assert calls == [1], "whole-EM runner must be dispatched exactly once"

    qr_rec, t_rec = dq.to_rot_trans(res.transformation.dualquats)
    qr_gt, t_gt = dq.to_rot_trans(gt)
    for k in range(2):
        qk = np.asarray(qr_rec[k])
        gk = np.asarray(qr_gt[k])
        if float(np.dot(qk, gk)) < 0:
            qk = -qk
        assert np.abs(qk - gk).max() < 0.02, (k, qk, gk)
        assert np.abs(np.asarray(t_rec[k]) - np.asarray(t_gt[k])).max() \
            < 0.02, (k, t_rec[k], t_gt[k])
    # And the cloud-level residual collapses.
    moved = np.asarray(res.transformation.transform(src))
    assert np.linalg.norm(moved - tgt) < 0.05 * np.linalg.norm(src - tgt)


def test_deformable_host_loop_matches_runner(rng):
    """The eager host loop (taken when callbacks are present) and the
    whole-EM runner must agree on the same problem."""
    src, weights = make_two_segment_cloud(rng, n=80)
    shift = np.zeros_like(src)
    wr = np.clip((src[:, 0] + 1.0) / 2.0, 0.0, 1.0)
    shift[:, 1] = 0.15 * wr
    tgt = src + shift

    reg1 = filterreg.DeformableKinematicFilterReg(src, weights, 0.002)
    res1 = reg1.registration(tgt, maxiter=15, tol=1e-8)
    seen = []
    reg2 = filterreg.DeformableKinematicFilterReg(src, weights, 0.002)
    reg2.set_callbacks([lambda tr: seen.append(tr)])
    res2 = reg2.registration(tgt, maxiter=15, tol=1e-8)
    assert len(seen) > 0  # callbacks force the host loop
    m1 = np.asarray(res1.transformation.transform(src))
    m2 = np.asarray(res2.transformation.transform(src))
    np.testing.assert_allclose(m1, m2, atol=1e-4)
