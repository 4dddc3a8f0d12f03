"""GMMReg / SVR e2e (reference tests/test_svr.py: rot atol 1e-1, trans 1e-2)."""

import numpy as np
import pytest

from probreg_tpu import l2dist_regs
from probreg_tpu.utils import se3_op


@pytest.fixture(scope="module")
def rigid_clouds(horse_cloud):
    src = np.asarray(horse_cloud, dtype=np.float32)
    ang = np.deg2rad([8.0, -4.0, 6.0])
    rot = np.asarray(se3_op.euler2mat(*ang), np.float32)
    return src, src @ rot.T, ang


def test_svr_rigid(rigid_clouds):
    src, tgt, ang = rigid_clouds
    res = l2dist_regs.registration_svr(src, tgt)
    rec = np.asarray(se3_op.mat2euler(res.rot))
    np.testing.assert_allclose(rec, ang, atol=1e-1)
    np.testing.assert_allclose(np.asarray(res.t), 0.0, atol=1e-2)


def test_gmmreg_rigid(rigid_clouds):
    src, tgt, ang = rigid_clouds
    res = l2dist_regs.registration_gmmreg(src, tgt, n_gmm_components=200)
    rec = np.asarray(se3_op.mat2euler(res.rot))
    np.testing.assert_allclose(rec, ang, atol=1e-1)
    np.testing.assert_allclose(np.asarray(res.t), 0.0, atol=1e-2)


def test_svr_nonrigid_2d_smoke():
    src = np.loadtxt("/root/reference/examples/fish_source.txt").astype(np.float32)
    tgt = np.loadtxt("/root/reference/examples/fish_target.txt").astype(np.float32)
    res = l2dist_regs.registration_svr(src, tgt, "nonrigid",
                                       opt_maxiter=30)
    moved = np.asarray(res.transform(src))
    before = float(np.mean(np.min(
        ((src[:, None] - tgt[None]) ** 2).sum(-1), axis=1)))
    after = float(np.mean(np.min(
        ((moved[:, None] - tgt[None]) ** 2).sum(-1), axis=1)))
    assert after < before, (before, after)
