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


def test_fused_icp_matches_xla_loop(horse_cloud):
    """The single-launch whole-ICP kernel (ops/em_pallas._icp_kernel,
    interpret mode here) must match the streaming XLA while_loop: same
    hard correspondences -> same Kabsch updates -> same trajectory."""
    import jax.numpy as jnp

    from probreg_tpu.ops import em_pallas

    src = np.asarray(horse_cloud, dtype=np.float32)[::3]
    ang = np.deg2rad([5.0, -3.0, 7.0])
    rot = np.asarray(se3_op.euler2mat(*ang), np.float32)
    tgt = (src @ rot.T + np.float32(0.03)).astype(np.float32)

    rot_x, t_x, rmse_x, it_x = icp._run_icp(
        jnp.asarray(src), jnp.asarray(tgt), jnp.eye(3, dtype=jnp.float32),
        jnp.zeros(3, jnp.float32), maxiter=25, tol=1e-9, trim_fraction=0.0)
    rot_f, t_f, rmse_f, it_f = em_pallas.run_icp_fused(
        src, tgt, maxiter=25, tol=1e-9, interpret=True)
    np.testing.assert_allclose(np.asarray(rot_f), np.asarray(rot_x),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(t_f), np.asarray(t_x), atol=2e-5)
    assert abs(float(rmse_f) - float(rmse_x)) < 1e-5
    # Iteration counts may differ: the kernel's Horn solve reaches an
    # exact fixed point (delta-rmse == 0 -> stop) while the XLA path's
    # SVD jitters in the last bits above a 1e-9 tol; the CONVERGED
    # transforms agree (asserted above).
    assert 2 <= int(it_f) <= int(it_x)


def test_fused_icp_warm_start_and_recovery(horse_cloud):
    """Fused ICP honors rot0/t0 and recovers a known transform from a
    warm start that the identity start cannot reach (20-deg rotation with
    translation; plain ICP from identity stalls in a local minimum for
    some clouds — the warm start pins the CONTRACT, not luck)."""
    from probreg_tpu.ops import em_pallas

    src = np.asarray(horse_cloud, dtype=np.float32)[::3]
    ang = np.deg2rad([0.0, 0.0, 20.0])
    rot = np.asarray(se3_op.euler2mat(*ang), np.float32)
    tgt = (src @ rot.T + np.float32(0.05)).astype(np.float32)
    rot_near = np.asarray(se3_op.euler2mat(0.0, 0.0, np.deg2rad(18.0)),
                        np.float32)
    rot_f, t_f, rmse_f, _ = em_pallas.run_icp_fused(
        src, tgt, rot0=rot_near, t0=np.full(3, 0.05, np.float32),
        maxiter=50, tol=1e-10, interpret=True)
    np.testing.assert_allclose(np.asarray(rot_f), rot, atol=1e-3)
    assert float(rmse_f) < 1e-3


def test_fused_icp_masked_equals_unpadded(horse_cloud):
    """Ragged-batch masks: the masked fused ICP on zero-padded clouds must
    equal the unpadded fused ICP (padded source rows carry no
    correspondence weight; padded target columns are never matched)."""
    import jax.numpy as jnp

    from probreg_tpu.ops import em_pallas

    src = np.asarray(horse_cloud, dtype=np.float32)[::5]
    rot = np.asarray(se3_op.euler2mat(*np.deg2rad([4.0, -2.0, 5.0])),
                     np.float32)
    tgt = (src @ rot.T + np.float32(0.02)).astype(np.float32)
    m, n = src.shape[0], tgt.shape[0]
    pad_m, pad_n = 37, 81                     # deliberately odd paddings
    src_p = np.concatenate([src, np.zeros((pad_m, 3), np.float32)])
    tgt_p = np.concatenate([tgt, np.zeros((pad_n, 3), np.float32)])
    smask = np.concatenate([np.ones(m, np.float32),
                            np.zeros(pad_m, np.float32)])
    tmask = np.concatenate([np.ones(n, np.float32),
                            np.zeros(pad_n, np.float32)])

    rot_u, t_u, rmse_u, it_u = em_pallas.run_icp_fused(
        src, tgt, maxiter=20, tol=1e-9, interpret=True)
    rot_p, t_p, rmse_p, it_p = em_pallas.run_icp_fused(
        src_p, tgt_p, smask=jnp.asarray(smask), tmask=jnp.asarray(tmask),
        maxiter=20, tol=1e-9, interpret=True)
    np.testing.assert_allclose(np.asarray(rot_p), np.asarray(rot_u),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_p), np.asarray(t_u), atol=1e-5)
    # Converged rmse is rounding-dominated (~1e-5 here); the masked
    # centroid sums in a different f32 order, so last-bit d2 differences
    # show up at the 1e-6 level.
    assert abs(float(rmse_p) - float(rmse_u)) < 1e-5


def test_registration_icp_batch_ragged(horse_cloud):
    """Public batch entry: ragged list of pairs, every pair recovers its
    own transform (CPU path loops per pair; the TPU path runs the masked
    fused kernel — equivalence pinned by the masked test above)."""
    base = np.asarray(horse_cloud, dtype=np.float32)
    angs = [np.deg2rad([3.0, 0.0, 4.0]), np.deg2rad([-2.0, 5.0, 0.0]),
            np.deg2rad([0.0, -3.0, -5.0])]
    srcs = [base[::3], base[::4], base[::5]]
    rots = [np.asarray(se3_op.euler2mat(*a), np.float32) for a in angs]
    tgts = [s @ r.T for s, r in zip(srcs, rots)]
    results = icp.registration_icp_batch(srcs, tgts, maxiter=60, tol=1e-10)
    assert len(results) == 3
    for res, a in zip(results, angs):
        rec = np.asarray(se3_op.mat2euler(res.transformation.rot))
        np.testing.assert_allclose(rec, a, atol=2e-3)
