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

def test_icp_trimmed_topk_matches_quantile_semantics(rng):
    """The sort-free top_k trim must still reject gross outliers and
    recover the pose (the quantile full-sort cost ~0.3 s/iter at 200k on
    TPU — review finding)."""
    from probreg_tpu import icp, se3_op as so

    src = rng.random((400, 3)).astype(np.float32)
    rot = np.asarray(so.euler2mat(0.0, 0.0, 0.15))
    tgt = (src @ rot.T + 0.02).astype(np.float32)
    # 15% outliers appended to the SOURCE: untrimmed ICP is dragged off.
    src_o = np.concatenate(
        [src, rng.uniform(2.0, 3.0, size=(60, 3)).astype(np.float32)])
    res = icp.registration_icp(src_o, tgt, maxiter=60, tol=0.0,
                               trim_fraction=0.2)
    ang = float(so.rotation_angle(np.asarray(res.transformation.rot), rot))
    assert ang < 5e-3, ang


def test_icp_nearest_t_exact(rng):
    """Double-chunked transposed NN matches brute force (incl. chunk
    remainders)."""
    from probreg_tpu import icp

    src = rng.random((130, 3)).astype(np.float32)
    tgt = rng.random((257, 3)).astype(np.float32)
    d2, idx = icp._nearest_t(src.T, tgt.T, block=128, src_block=64)
    ref = ((src[:, None] - tgt[None]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(d2), ref.min(1), rtol=1e-4,
                               atol=1e-5)
    assert (np.asarray(idx) == ref.argmin(1)).all()
