"""TPU-native ICP (the baseline the reference outsources to Open3D:
examples/icp_test.py, README.md:139)."""

import numpy as np

from probreg_tpu import icp
from probreg_tpu.utils import se3_op


def test_icp_recovers_small_rotation(horse_cloud):
    src = np.asarray(horse_cloud, dtype=np.float32)
    ang = np.deg2rad([4.0, -2.0, 6.0])
    rot = np.asarray(se3_op.euler2mat(*ang), np.float32)
    tgt = src @ rot.T
    res = icp.registration_icp(src, tgt, maxiter=60, tol=1e-10)
    rec = np.asarray(se3_op.mat2euler(res.transformation.rot))
    np.testing.assert_allclose(rec, ang, atol=1e-3)
    np.testing.assert_allclose(np.asarray(res.transformation.t), 0.0,
                               atol=1e-4)
    assert float(res.rmse) < 1e-3


def test_trimmed_icp_survives_outliers(horse_cloud):
    rng = np.random.default_rng(0)
    src = np.asarray(horse_cloud, dtype=np.float32)
    ang = np.deg2rad([3.0, 0.0, 5.0])
    rot = np.asarray(se3_op.euler2mat(*ang), np.float32)
    tgt = src @ rot.T
    # 10% gross outliers appended to the target.
    n_out = src.shape[0] // 10
    outliers = rng.uniform(-0.3, 0.3, (n_out, 3)).astype(np.float32)
    tgt_noisy = np.concatenate([tgt, outliers])
    res = icp.registration_icp(src, tgt_noisy, maxiter=60, tol=1e-10,
                               trim_fraction=0.15)
    rec = np.asarray(se3_op.mat2euler(res.transformation.rot))
    np.testing.assert_allclose(rec, ang, atol=2e-2)


def test_icp_callbacks_fire_per_iteration(horse_cloud):
    src = np.asarray(horse_cloud, dtype=np.float32)[::4]
    rot = np.asarray(se3_op.euler2mat(*np.deg2rad([2.0, 1.0, 3.0])),
                     np.float32)
    tgt = src @ rot.T
    seen = []
    res = icp.registration_icp(src, tgt, maxiter=7, tol=0.0,
                               callbacks=[lambda tr: seen.append(tr)])
    assert len(seen) == 7
    assert int(res.n_iter) == 7


def test_icp_maxiter_zero_with_callbacks(horse_cloud):
    """Regression (round-3 advisor, low): maxiter=0 with callbacks used to
    raise UnboundLocalError on rmse; it must return the initial transform
    like the no-callback path."""
    import numpy as np

    src = np.asarray(horse_cloud, np.float32)
    res = icp.registration_icp(src, src, maxiter=0,
                               callbacks=[lambda tr: None])
    assert int(res.n_iter) == 0
    np.testing.assert_allclose(np.asarray(res.transformation.rot), np.eye(3))
