"""GMMTree e2e (no reference test exists for gmmtree — coverage gap closed).

Recovery tolerances chosen like the reference's other e2e tests.
"""

import numpy as np
import pytest

from probreg_tpu import gmmtree
from probreg_tpu.utils import se3_op


def test_gmmtree_rigid_recovery(horse_cloud):
    src = np.asarray(horse_cloud, dtype=np.float32)
    ang = np.deg2rad([5.0, -3.0, 4.0])
    rot = np.asarray(se3_op.euler2mat(*ang), np.float32)
    tgt = src @ rot.T
    res = gmmtree.registration_gmmtree(src, tgt, maxiter=30, tol=1e-6)
    rec = np.asarray(se3_op.mat2euler(res.transformation.rot))
    np.testing.assert_allclose(rec, ang, atol=5e-2)
    np.testing.assert_allclose(np.asarray(res.transformation.t), 0.0, atol=5e-3)


def test_gmmtree_build_structure(horse_cloud):
    src = np.asarray(horse_cloud, dtype=np.float32)
    gt = gmmtree.GMMTree(src, tree_level=2)
    pi, mu, cov = gt._nodes
    assert pi.shape == (72,)  # 8 + 64
    # Each level's weights describe (at most) the whole cloud.
    pi_np = np.asarray(pi)
    assert pi_np[:8].sum() <= 1.0 + 1e-3
    assert pi_np[8:72].sum() <= 1.0 + 1e-3
    assert pi_np[:8].sum() > 0.5  # most points survive pruning
    # Level-0 means live inside the cloud bounding box (loose).
    lo, hi = src.min(0) - 0.05, src.max(0) + 0.05
    live = pi_np[:8] > 0
    assert np.all((np.asarray(mu)[:8][live] >= lo) & (np.asarray(mu)[:8][live] <= hi))


def test_gmmtree_callback_path(horse_cloud):
    src = np.asarray(horse_cloud, dtype=np.float32)[::3]
    ang = np.deg2rad([4.0, 0.0, -3.0])
    rot = np.asarray(se3_op.euler2mat(*ang), np.float32)
    tgt = src @ rot.T
    seen = []
    res = gmmtree.registration_gmmtree(
        src, tgt, maxiter=10, tol=1e-9, callbacks=[lambda t: seen.append(t)])
    assert len(seen) >= 1
    rec = np.asarray(se3_op.mat2euler(res.transformation.rot))
    np.testing.assert_allclose(rec, ang, atol=1e-1)
