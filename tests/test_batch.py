"""Batch registration (new capability vs the reference: B pairs, one program)."""

import numpy as np

import _fixtures

from probreg_tpu import bcpd, cpd, filterreg, gmmtree, l2dist_regs
from probreg_tpu.utils import se3_op


def nn_rmse(a, b):
    d2 = ((a[:, None] - b[None]) ** 2).sum(-1)
    return float(np.sqrt(d2.min(axis=1).mean()))


def test_batch_rigid_registration(horse_cloud, rng):
    src = np.asarray(horse_cloud, dtype=np.float32)[::2]
    angs = [np.deg2rad([5.0, -3.0, 4.0]), np.deg2rad([-6.0, 2.0, -8.0]),
            np.deg2rad([0.0, 0.0, 12.0])]
    sources = np.stack([src] * 3)
    targets = np.stack([src @ np.asarray(se3_op.euler2mat(*a), np.float32).T
                        for a in angs])
    results = cpd.registration_cpd_batch(sources, targets, maxiter=60,
                                         tol=1e-5)
    assert len(results) == 3
    for res, ang in zip(results, angs):
        rec = np.asarray(se3_op.mat2euler(res.transformation.rot))
        np.testing.assert_allclose(rec, ang, atol=1e-2)
        np.testing.assert_allclose(np.asarray(res.transformation.t), 0.0,
                                   atol=1e-3)


def test_batch_matches_single(horse_cloud):
    src = np.asarray(horse_cloud, dtype=np.float32)[::3]
    ang = np.deg2rad([4.0, 1.0, -5.0])
    tgt = src @ np.asarray(se3_op.euler2mat(*ang), np.float32).T
    batch = cpd.registration_cpd_batch(src[None], tgt[None], maxiter=40,
                                       tol=1e-6)[0]
    single = cpd.registration_cpd(src, tgt, maxiter=40, tol=1e-6)
    # On TPU the single path may take the fused Pallas kernel (Horn
    # rotation solve) while the batch path is the vmapped XLA program
    # (SVD): identical math, ~1e-3 f32 path divergence.
    np.testing.assert_allclose(
        np.asarray(batch.transformation.rot),
        np.asarray(single.transformation.rot), atol=5e-3)


def test_cpd_multistart_large_rotation(horse_cloud):
    """n_starts > 1: EM restarts over the orientation grid recover rotations
    far outside the identity start's basin (new capability vs reference)."""
    src = np.asarray(horse_cloud, dtype=np.float32)[::2]
    ang = np.deg2rad([0.0, 0.0, 120.0])
    tgt = src @ np.asarray(se3_op.euler2mat(*ang), np.float32).T
    # Identity start fails at 120 deg...
    res0 = cpd.registration_cpd(src, tgt, maxiter=80, tol=1e-6)
    rec0 = np.asarray(se3_op.mat2euler(res0.transformation.rot))
    assert np.abs(rec0 - ang).max() > 0.5
    # ...the 10-start grid recovers it, single and batch.
    res = cpd.registration_cpd(src, tgt, maxiter=80, tol=1e-6, n_starts=10)
    rec = np.asarray(se3_op.mat2euler(res.transformation.rot))
    np.testing.assert_allclose(rec, ang, atol=1e-2)
    batch = cpd.registration_cpd_batch(src[None], tgt[None], maxiter=80,
                                       tol=1e-6, n_starts=10)[0]
    rec_b = np.asarray(se3_op.mat2euler(batch.transformation.rot))
    np.testing.assert_allclose(rec_b, ang, atol=1e-2)


def test_cpd_multistart_ragged(horse_cloud):
    """n_starts composes with ragged batches (both live in _run_em_t)."""
    src = np.asarray(horse_cloud, dtype=np.float32)
    angs = [np.deg2rad([0.0, 0.0, 120.0]), np.deg2rad([5.0, -3.0, 4.0])]
    sources = [src[::2], src[::3]]
    targets = [s @ np.asarray(se3_op.euler2mat(*a), np.float32).T
               for s, a in zip(sources, angs)]
    results = cpd.registration_cpd_batch(sources, targets, maxiter=80,
                                         tol=1e-6, n_starts=10)
    for res, ang in zip(results, angs):
        rec = np.asarray(se3_op.mat2euler(res.transformation.rot))
        np.testing.assert_allclose(rec, ang, atol=1e-2)


def test_cpd_multistart_noise_outliers(horse_cloud, rng):
    """Multistart selection (min final sigma2) must still pick the right
    basin with measurement noise and uniform outliers in the target."""
    src = np.asarray(horse_cloud, dtype=np.float32)[::2]
    ang = np.deg2rad([0.0, 0.0, 120.0])
    tgt = src @ np.asarray(se3_op.euler2mat(*ang), np.float32).T
    tgt = tgt + 0.002 * rng.standard_normal(tgt.shape).astype(np.float32)
    lo, hi = tgt.min(0), tgt.max(0)
    outliers = (lo + (hi - lo) * rng.random((40, 3))).astype(np.float32)
    tgt = np.concatenate([tgt, outliers])
    res = cpd.registration_cpd(src, tgt, w=0.2, maxiter=80, tol=1e-6,
                               n_starts=10)
    rec = np.asarray(se3_op.mat2euler(res.transformation.rot))
    np.testing.assert_allclose(rec, ang, atol=5e-2)


def test_cpd_multistart_2d():
    """2-D clouds get an evenly-spaced circle grid instead of the 3-D one."""
    src = _fixtures.fish_source()
    a = np.deg2rad(140.0)
    rot = np.asarray([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]],
                     np.float32)
    tgt = src @ rot.T
    res = cpd.registration_cpd(src, tgt, maxiter=80, tol=1e-6, n_starts=8)
    np.testing.assert_allclose(np.asarray(res.transformation.rot), rot,
                               atol=1e-3)


def test_filterreg_multistart_large_rotation(horse_cloud):
    src = np.asarray(horse_cloud, dtype=np.float32)[::2]
    ang = np.deg2rad([0.0, 0.0, 120.0])
    tgt = src @ np.asarray(se3_op.euler2mat(*ang), np.float32).T
    res = filterreg.registration_filterreg(src, tgt, maxiter=80, tol=1e-6,
                                           n_starts=10)
    rec = np.asarray(se3_op.mat2euler(res.transformation.rot))
    np.testing.assert_allclose(rec, ang, atol=2e-1)
    batch = filterreg.registration_filterreg_batch(
        src[None], tgt[None], maxiter=80, tol=1e-6, n_starts=10)[0]
    rec_b = np.asarray(se3_op.mat2euler(batch.transformation.rot))
    np.testing.assert_allclose(rec_b, ang, atol=2e-1)


def test_gmmtree_multistart_large_rotation(horse_cloud):
    src = np.asarray(horse_cloud, dtype=np.float32)
    ang = np.deg2rad([0.0, 0.0, 120.0])
    tgt = src @ np.asarray(se3_op.euler2mat(*ang), np.float32).T
    res = gmmtree.registration_gmmtree(src, tgt, maxiter=40, tol=1e-6,
                                       n_starts=10)
    rec = np.asarray(se3_op.mat2euler(res.transformation.rot))
    np.testing.assert_allclose(rec, ang, atol=5e-2)
    batch = gmmtree.registration_gmmtree_batch(
        src[None], tgt[None], maxiter=40, tol=1e-6, n_starts=10)[0]
    rec_b = np.asarray(se3_op.mat2euler(batch.transformation.rot))
    np.testing.assert_allclose(rec_b, ang, atol=5e-2)


def test_bcpd_multistart_large_rotation(horse_cloud):
    src = np.asarray(horse_cloud, dtype=np.float32)[::2]
    ang = np.deg2rad([0.0, 0.0, 120.0])
    tgt = src @ np.asarray(se3_op.euler2mat(*ang), np.float32).T
    base = nn_rmse(src, tgt)
    res = bcpd.registration_bcpd(src, tgt, maxiter=100, tol=0.0, lmd=10.0,
                                 n_starts=10)
    assert nn_rmse(np.asarray(res.transform(src)), tgt) < 0.25 * base
    batch = bcpd.registration_bcpd_batch(src[None], tgt[None], maxiter=100,
                                         tol=0.0, lmd=10.0, n_starts=10)[0]
    assert nn_rmse(np.asarray(batch.transform(src)), tgt) < 0.25 * base


def test_filterreg_multistart_ragged(horse_cloud):
    src = np.asarray(horse_cloud, dtype=np.float32)
    angs = [np.deg2rad([0.0, 0.0, 120.0]), np.deg2rad([5.0, -3.0, 4.0])]
    sources = [src[::2], src[::3]]
    targets = [s @ np.asarray(se3_op.euler2mat(*a), np.float32).T
               for s, a in zip(sources, angs)]
    results = filterreg.registration_filterreg_batch(
        sources, targets, maxiter=80, tol=1e-6, n_starts=10)
    for res, ang in zip(results, angs):
        rec = np.asarray(se3_op.mat2euler(res.transformation.rot))
        np.testing.assert_allclose(rec, ang, atol=2e-1)


def test_gmmtree_multistart_ragged(horse_cloud):
    src = np.asarray(horse_cloud, dtype=np.float32)
    angs = [np.deg2rad([0.0, 0.0, 120.0]), np.deg2rad([5.0, -3.0, 4.0])]
    sources = [src, src[::2]]
    targets = [s @ np.asarray(se3_op.euler2mat(*a), np.float32).T
               for s, a in zip(sources, angs)]
    results = gmmtree.registration_gmmtree_batch(
        sources, targets, maxiter=40, tol=1e-6, n_starts=10)
    for res, ang in zip(results, angs):
        rec = np.asarray(se3_op.mat2euler(res.transformation.rot))
        np.testing.assert_allclose(rec, ang, atol=5e-2)


def test_bcpd_multistart_ragged(horse_cloud):
    src = np.asarray(horse_cloud, dtype=np.float32)
    angs = [np.deg2rad([0.0, 0.0, 120.0]), np.deg2rad([8.0, -4.0, 6.0])]
    sources = [src[::2], src[::3]]
    targets = [s @ np.asarray(se3_op.euler2mat(*a), np.float32).T
               for s, a in zip(sources, angs)]
    results = bcpd.registration_bcpd_batch(sources, targets, maxiter=100,
                                           tol=0.0, lmd=10.0, n_starts=10)
    for res, s, t in zip(results, sources, targets):
        assert np.asarray(res.v).shape == s.shape
        moved = np.asarray(res.transform(s))
        assert nn_rmse(moved, t) < 0.3 * nn_rmse(s, t)


def test_batch_ragged_rigid(horse_cloud):
    """Pairs with different point counts in one program (masked padding)."""
    src = np.asarray(horse_cloud, dtype=np.float32)
    angs = [np.deg2rad([5.0, -3.0, 4.0]), np.deg2rad([0.0, 0.0, 12.0]),
            np.deg2rad([-6.0, 2.0, -8.0])]
    sources = [src[::2], src[::3], src[::5]]
    targets = [s @ np.asarray(se3_op.euler2mat(*a), np.float32).T
               for s, a in zip(sources, angs)]
    results = cpd.registration_cpd_batch(sources, targets, maxiter=60,
                                         tol=1e-5)
    assert len(results) == 3
    for res, ang in zip(results, angs):
        rec = np.asarray(se3_op.mat2euler(res.transformation.rot))
        np.testing.assert_allclose(rec, ang, atol=1e-2)
        np.testing.assert_allclose(np.asarray(res.transformation.t), 0.0,
                                   atol=1e-3)


def test_batch_ragged_masked_matches_unpadded(horse_cloud):
    """Padding must be EXACTLY inert: a padded pair == the unpadded single
    registration (also exercises w>0, whose outlier constant uses the true
    per-pair counts, not the padded shapes)."""
    src_small = np.asarray(horse_cloud, dtype=np.float32)[::4]
    src_big = np.asarray(horse_cloud, dtype=np.float32)
    ang = np.deg2rad([4.0, 1.0, -5.0])
    rot = np.asarray(se3_op.euler2mat(*ang), np.float32)
    for w in (0.0, 0.2):
        # Batch the small pair alongside a big one to force real padding.
        results = cpd.registration_cpd_batch(
            [src_small, src_big], [src_small @ rot.T, src_big @ rot.T],
            w=w, maxiter=40, tol=1e-6)
        single = cpd.registration_cpd_batch(
            src_small[None], (src_small @ rot.T)[None],
            w=w, maxiter=40, tol=1e-6)[0]
        np.testing.assert_allclose(
            np.asarray(results[0].transformation.rot),
            np.asarray(single.transformation.rot), atol=1e-4)
        np.testing.assert_allclose(
            float(results[0].sigma2), float(single.sigma2),
            rtol=1e-3, atol=1e-7)


def test_batch_ragged_affine(horse_cloud):
    src = np.asarray(horse_cloud, dtype=np.float32)
    amat = np.asarray([[1.05, 0.04, 0.0], [-0.03, 0.97, 0.02],
                       [0.01, 0.0, 1.02]], np.float32)
    sources = [src[::2], src[::3]]
    targets = [s @ amat.T for s in sources]
    results = cpd.registration_cpd_batch(sources, targets,
                                         tf_type_name="affine",
                                         maxiter=60, tol=1e-6)
    for res in results:
        np.testing.assert_allclose(np.asarray(res.transformation.b), amat,
                                   atol=1e-2)


def test_batch_filterreg_pt2pt(horse_cloud):
    src = np.asarray(horse_cloud, dtype=np.float32)[::2]
    angs = [np.deg2rad([5.0, -3.0, 4.0]), np.deg2rad([0.0, 0.0, 10.0])]
    sources = np.stack([src] * 2)
    targets = np.stack([src @ np.asarray(se3_op.euler2mat(*a), np.float32).T
                        for a in angs])
    results = filterreg.registration_filterreg_batch(
        sources, targets, maxiter=50, tol=1e-5)
    assert len(results) == 2
    for res, ang in zip(results, angs):
        rec = np.asarray(se3_op.mat2euler(res.transformation.rot))
        np.testing.assert_allclose(rec, ang, atol=2e-1)
        np.testing.assert_allclose(np.asarray(res.transformation.t), 0.0,
                                   atol=1e-2)


def test_batch_filterreg_matches_single(horse_cloud):
    src = np.asarray(horse_cloud, dtype=np.float32)[::3]
    ang = np.deg2rad([4.0, 1.0, -5.0])
    tgt = src @ np.asarray(se3_op.euler2mat(*ang), np.float32).T
    batch = filterreg.registration_filterreg_batch(
        src[None], tgt[None], maxiter=40, tol=1e-6)[0]
    single = filterreg.registration_filterreg(src, tgt, maxiter=40, tol=1e-6)
    np.testing.assert_allclose(
        np.asarray(batch.transformation.rot),
        np.asarray(single.transformation.rot), atol=5e-3)


def test_batch_filterreg_pt2pl(horse_cloud):
    from tests.test_filterreg import estimate_normals_pca

    src = np.asarray(horse_cloud, dtype=np.float32)[::2]
    angs = [np.deg2rad([5.0, -3.0, 4.0]), np.deg2rad([0.0, 0.0, 8.0])]
    sources = np.stack([src] * 2)
    targets = np.stack([src @ np.asarray(se3_op.euler2mat(*a), np.float32).T
                        for a in angs])
    normals = np.stack([estimate_normals_pca(t) for t in targets])
    results = filterreg.registration_filterreg_batch(
        sources, targets, target_normals=normals, objective_type="pt2pl",
        maxiter=50, tol=1e-6)
    for res, ang in zip(results, angs):
        rec = np.asarray(se3_op.mat2euler(res.transformation.rot))
        np.testing.assert_allclose(rec, ang, atol=2e-1)
        np.testing.assert_allclose(np.asarray(res.transformation.t), 0.0,
                                   atol=1e-2)


def test_batch_filterreg_ragged(horse_cloud):
    src = np.asarray(horse_cloud, dtype=np.float32)
    angs = [np.deg2rad([5.0, -3.0, 4.0]), np.deg2rad([0.0, 0.0, 10.0])]
    sources = [src[::2], src[::3]]
    targets = [s @ np.asarray(se3_op.euler2mat(*a), np.float32).T
               for s, a in zip(sources, angs)]
    results = filterreg.registration_filterreg_batch(
        sources, targets, maxiter=50, tol=1e-5)
    for res, ang in zip(results, angs):
        rec = np.asarray(se3_op.mat2euler(res.transformation.rot))
        np.testing.assert_allclose(rec, ang, atol=2e-1)


def test_batch_filterreg_ragged_masked_matches_unpadded(horse_cloud):
    src_small = np.asarray(horse_cloud, dtype=np.float32)[::4]
    src_big = np.asarray(horse_cloud, dtype=np.float32)
    ang = np.deg2rad([4.0, 1.0, -5.0])
    rot = np.asarray(se3_op.euler2mat(*ang), np.float32)
    for w in (0.0, 0.2):
        ragged = filterreg.registration_filterreg_batch(
            [src_small, src_big], [src_small @ rot.T, src_big @ rot.T],
            w=w, maxiter=40, tol=1e-6)
        plain = filterreg.registration_filterreg_batch(
            src_small[None], (src_small @ rot.T)[None],
            w=w, maxiter=40, tol=1e-6)[0]
        np.testing.assert_allclose(
            np.asarray(ragged[0].transformation.rot),
            np.asarray(plain.transformation.rot), atol=1e-4)
        np.testing.assert_allclose(
            float(ragged[0].sigma2), float(plain.sigma2),
            rtol=1e-3, atol=1e-7)


def test_batch_filterreg_ragged_pt2pl(horse_cloud):
    from tests.test_filterreg import estimate_normals_pca

    src = np.asarray(horse_cloud, dtype=np.float32)
    angs = [np.deg2rad([5.0, -3.0, 4.0]), np.deg2rad([0.0, 0.0, 8.0])]
    sources = [src[::2], src[::3]]
    targets = [s @ np.asarray(se3_op.euler2mat(*a), np.float32).T
               for s, a in zip(sources, angs)]
    normals = [estimate_normals_pca(t) for t in targets]
    results = filterreg.registration_filterreg_batch(
        sources, targets, target_normals=normals, objective_type="pt2pl",
        maxiter=50, tol=1e-6)
    for res, ang in zip(results, angs):
        rec = np.asarray(se3_op.mat2euler(res.transformation.rot))
        np.testing.assert_allclose(rec, ang, atol=2e-1)


def test_batch_gmmtree(horse_cloud):
    src = np.asarray(horse_cloud, dtype=np.float32)
    angs = [np.deg2rad([5.0, -3.0, 4.0]), np.deg2rad([0.0, 0.0, 8.0])]
    sources = np.stack([src] * 2)
    targets = np.stack([src @ np.asarray(se3_op.euler2mat(*a), np.float32).T
                        for a in angs])
    results = gmmtree.registration_gmmtree_batch(sources, targets,
                                                 maxiter=30, tol=1e-6)
    assert len(results) == 2
    for res, ang in zip(results, angs):
        rec = np.asarray(se3_op.mat2euler(res.transformation.rot))
        np.testing.assert_allclose(rec, ang, atol=5e-2)
        np.testing.assert_allclose(np.asarray(res.transformation.t), 0.0,
                                   atol=5e-3)


def test_batch_gmmtree_matches_single(horse_cloud):
    src = np.asarray(horse_cloud, dtype=np.float32)
    ang = np.deg2rad([5.0, -3.0, 4.0])
    tgt = src @ np.asarray(se3_op.euler2mat(*ang), np.float32).T
    batch = gmmtree.registration_gmmtree_batch(src[None], tgt[None],
                                               maxiter=30, tol=1e-6)[0]
    single = gmmtree.registration_gmmtree(src, tgt, maxiter=30, tol=1e-6)
    np.testing.assert_allclose(
        np.asarray(batch.transformation.rot),
        np.asarray(single.transformation.rot), atol=5e-3)


def test_batch_gmmtree_ragged(horse_cloud):
    src = np.asarray(horse_cloud, dtype=np.float32)
    angs = [np.deg2rad([5.0, -3.0, 4.0]), np.deg2rad([0.0, 0.0, 8.0])]
    sources = [src, src[::2]]
    targets = [s @ np.asarray(se3_op.euler2mat(*a), np.float32).T
               for s, a in zip(sources, angs)]
    results = gmmtree.registration_gmmtree_batch(sources, targets,
                                                 maxiter=30, tol=1e-6)
    for res, ang in zip(results, angs):
        rec = np.asarray(se3_op.mat2euler(res.transformation.rot))
        np.testing.assert_allclose(rec, ang, atol=5e-2)
        np.testing.assert_allclose(np.asarray(res.transformation.t), 0.0,
                                   atol=5e-3)


def test_batch_gmmtree_ragged_masked_matches_unpadded(horse_cloud):
    """A padded pair must produce exactly the unpadded registration (the
    masked leaf init draws the same indices: same key, same valid range)."""
    src_small = np.asarray(horse_cloud, dtype=np.float32)[::4]
    src_big = np.asarray(horse_cloud, dtype=np.float32)
    ang = np.deg2rad([4.0, 1.0, -5.0])
    rot = np.asarray(se3_op.euler2mat(*ang), np.float32)
    ragged = gmmtree.registration_gmmtree_batch(
        [src_small, src_big], [src_small @ rot.T, src_big @ rot.T],
        maxiter=30, tol=1e-6)[0]
    plain = gmmtree.registration_gmmtree_batch(
        src_small[None], (src_small @ rot.T)[None], maxiter=30, tol=1e-6)[0]
    np.testing.assert_allclose(
        np.asarray(ragged.transformation.rot),
        np.asarray(plain.transformation.rot), atol=1e-3)


def test_batch_bcpd(horse_cloud):
    src = np.asarray(horse_cloud, dtype=np.float32)[::2]
    angs = [np.deg2rad([8.0, -4.0, 6.0]), np.deg2rad([0.0, 0.0, 10.0])]
    sources = np.stack([src] * 2)
    targets = np.stack([src @ np.asarray(se3_op.euler2mat(*a), np.float32).T
                        for a in angs])
    results = bcpd.registration_bcpd_batch(sources, targets, maxiter=100,
                                           tol=0.0, lmd=10.0)
    assert len(results) == 2
    for res, tgt in zip(results, targets):
        moved = np.asarray(res.transform(src))
        assert nn_rmse(moved, tgt) < 0.5 * nn_rmse(src, tgt)


def test_batch_bcpd_ragged(horse_cloud):
    src = np.asarray(horse_cloud, dtype=np.float32)
    angs = [np.deg2rad([8.0, -4.0, 6.0]), np.deg2rad([0.0, 0.0, 10.0])]
    sources = [src[::2], src[::3]]
    targets = [s @ np.asarray(se3_op.euler2mat(*a), np.float32).T
               for s, a in zip(sources, angs)]
    results = bcpd.registration_bcpd_batch(sources, targets, maxiter=100,
                                           tol=0.0, lmd=10.0)
    assert len(results) == 2
    for res, s, t in zip(results, sources, targets):
        assert np.asarray(res.v).shape == s.shape  # sliced to true size
        moved = np.asarray(res.transform(s))
        assert nn_rmse(moved, t) < 0.5 * nn_rmse(s, t)


def test_batch_bcpd_ragged_masked_matches_unpadded_early(horse_cloud):
    """Mask inertness: before the VI trajectory chaos decorrelates runs
    (~15 iterations, see below), a padded pair must track the unpadded one."""
    src_small = np.asarray(horse_cloud, dtype=np.float32)[::4]
    src_big = np.asarray(horse_cloud, dtype=np.float32)
    ang = np.deg2rad([4.0, 1.0, -5.0])
    rot = np.asarray(se3_op.euler2mat(*ang), np.float32)
    ragged = bcpd.registration_bcpd_batch(
        [src_small, src_big], [src_small @ rot.T, src_big @ rot.T],
        maxiter=10, tol=0.0, lmd=10.0)[0]
    plain = bcpd.registration_bcpd_batch(
        src_small[None], (src_small @ rot.T)[None],
        maxiter=10, tol=0.0, lmd=10.0)[0]
    np.testing.assert_allclose(
        np.asarray(ragged.transform(src_small)),
        np.asarray(plain.transform(src_small)), atol=1e-3)


def test_batch_bcpd_ragged_lowrank(horse_cloud):
    src = _fixtures.fish_source()
    tgt = _fixtures.fish_target()
    # Different sizes per pair; rank-40 masked Nystrom factors. (A 2x
    # decimated fish does not register with these hyperparams in ANY path,
    # single or batch — a 70-point prefix does.)
    sources, targets = [src, src[:70]], [tgt, tgt[:70]]
    results = bcpd.registration_bcpd_batch(
        sources, targets, maxiter=50, tol=1e-6, rank=40)
    for res, s, t in zip(results, sources, targets):
        moved = np.asarray(res.transform(s))
        assert nn_rmse(moved, t) < 0.25 * nn_rmse(s, t)


def test_batch_bcpd_lowrank_quality_fish():
    """Batch low-rank BCPD in the regime tests/test_lowrank.py validates.

    (Pointwise batch==single agreement is not testable for BCPD: the VI
    iteration's scale/v trade-off is chaotic in f32 — 1e-7 kernel-order
    differences between batched and unbatched XLA programs decorrelate the
    trajectories after ~15 iterations — so quality is the criterion, as in
    the reference's own convergence test, bcpd.py:95-99.)"""

    src = _fixtures.fish_source()
    tgt = _fixtures.fish_target()
    res = bcpd.registration_bcpd_batch(src[None], tgt[None], maxiter=50,
                                       tol=1e-6, rank=40)[0]
    moved = np.asarray(res.transform(src))
    assert nn_rmse(moved, tgt) < 0.2 * nn_rmse(src, tgt)


def test_batch_l2dist_annealing_rounds(horse_cloud):
    """maxiter > 1 unrolls the reference's sigma-annealing rounds into the
    batch program: combined ~17-degree rotations that a single round leaves
    ~10 degrees off converge in 3 rounds (matches the single-pair path)."""
    src = np.asarray(horse_cloud, dtype=np.float32)[::2]
    ang = np.deg2rad([-0.4, 11.7, 13.0])
    tgt = src @ np.asarray(se3_op.euler2mat(*ang), np.float32).T
    res = l2dist_regs.registration_svr_batch(src[None], tgt[None],
                                             maxiter=3)[0]
    rec = np.asarray(se3_op.mat2euler(res.rot))
    np.testing.assert_allclose(rec, ang, atol=2e-2)
    res = l2dist_regs.registration_gmmreg_batch(src[None], tgt[None],
                                                n_gmm_components=150,
                                                maxiter=3)[0]
    rec = np.asarray(se3_op.mat2euler(res.rot))
    np.testing.assert_allclose(rec, ang, atol=2e-2)


def test_batch_l2dist_ragged(horse_cloud):
    src = np.asarray(horse_cloud, dtype=np.float32)
    angs = [np.deg2rad([6.0, -2.0, 3.0]), np.deg2rad([0.0, 0.0, 10.0])]
    sources = [src[::2], src[::3]]
    targets = [s @ np.asarray(se3_op.euler2mat(*a), np.float32).T
               for s, a in zip(sources, angs)]
    for results in (
        l2dist_regs.registration_gmmreg_batch(sources, targets,
                                              n_gmm_components=100),
        l2dist_regs.registration_svr_batch(sources, targets),
    ):
        for res, ang in zip(results, angs):
            rec = np.asarray(se3_op.mat2euler(res.rot))
            np.testing.assert_allclose(rec, ang, atol=1e-1)
            np.testing.assert_allclose(np.asarray(res.t), 0.0, atol=1e-2)


def test_batch_gmmreg_ragged_small_target(horse_cloud):
    """Regression: the shared GMM component cap must respect the smallest
    cloud on EITHER side — a target smaller than k used to get padded
    origin points drawn as centers, silently corrupting that pair."""
    src = np.asarray(horse_cloud, dtype=np.float32)
    ang = np.deg2rad([5.0, -3.0, 4.0])
    rot = np.asarray(se3_op.euler2mat(*ang), np.float32)
    small = src[::16]  # ~60 points, far below n_gmm_components
    results = l2dist_regs.registration_gmmreg_batch(
        [src[::2], small], [src[::2] @ rot.T, small @ rot.T],
        n_gmm_components=200)
    for res in results:
        rec = np.asarray(se3_op.mat2euler(res.rot))
        np.testing.assert_allclose(rec, ang, atol=1e-1)


def test_batch_l2dist_ragged_multistart(horse_cloud):
    src = np.asarray(horse_cloud, dtype=np.float32)
    angs = [np.deg2rad([0.0, 0.0, 120.0]), np.deg2rad([6.0, -2.0, 3.0])]
    sources = [src[::2], src[::3]]
    targets = [s @ np.asarray(se3_op.euler2mat(*a), np.float32).T
               for s, a in zip(sources, angs)]
    for results in (
        l2dist_regs.registration_gmmreg_batch(sources, targets,
                                              n_gmm_components=100,
                                              n_starts=10),
        l2dist_regs.registration_svr_batch(sources, targets, n_starts=10),
    ):
        for res, ang in zip(results, angs):
            rec = np.asarray(se3_op.mat2euler(res.rot))
            np.testing.assert_allclose(rec, ang, atol=1e-1)


def test_batch_svr_ragged_masked_matches_unpadded(horse_cloud):
    """SVR's dual solve is deterministic, so a padded pair must reproduce
    the unpadded registration (the masked simplex projection pins padded
    alphas at exactly 0). GMM can't be tested this way: its masked seeding
    draws different centers than the unmasked one."""
    src_small = np.asarray(horse_cloud, dtype=np.float32)[::4]
    src_big = np.asarray(horse_cloud, dtype=np.float32)
    ang = np.deg2rad([4.0, 1.0, -5.0])
    rot = np.asarray(se3_op.euler2mat(*ang), np.float32)
    ragged = l2dist_regs.registration_svr_batch(
        [src_small, src_big], [src_small @ rot.T, src_big @ rot.T])[0]
    plain = l2dist_regs.registration_svr_batch(
        src_small[None], (src_small @ rot.T)[None])[0]
    np.testing.assert_allclose(np.asarray(ragged.rot),
                               np.asarray(plain.rot), atol=1e-3)


def test_gmmreg_nonrigid_fish():
    src = _fixtures.fish_source()
    tgt = _fixtures.fish_target()
    res = l2dist_regs.registration_gmmreg(src, tgt, "nonrigid",
                                          n_gmm_components=40)
    moved = np.asarray(res.transform(src))

    def nn(a, b):
        d2 = ((a[:, None] - b[None]) ** 2).sum(-1)
        return float(np.sqrt(d2.min(1).mean()))

    assert nn(moved, tgt) < nn(src, tgt)


def test_batch_l2dist_gmmreg_and_svr(horse_cloud):
    src = np.asarray(horse_cloud, dtype=np.float32)[::2]
    angs = [np.deg2rad([6.0, -2.0, 3.0]), np.deg2rad([0.0, 0.0, 10.0])]
    sources = np.stack([src] * 2)
    targets = np.stack([src @ np.asarray(se3_op.euler2mat(*a), np.float32).T
                        for a in angs])

    for results in (
        l2dist_regs.registration_gmmreg_batch(sources, targets,
                                              n_gmm_components=150),
        l2dist_regs.registration_svr_batch(sources, targets),
    ):
        assert len(results) == 2
        for res, ang in zip(results, angs):
            rec = np.asarray(se3_op.mat2euler(res.rot))
            np.testing.assert_allclose(rec, ang, atol=1e-1)
            np.testing.assert_allclose(np.asarray(res.t), 0.0, atol=1e-2)
