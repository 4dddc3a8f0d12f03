"""FilterReg e2e: recover a known rigid transform (reference test_filterreg.py).

Reference tolerances: rot 2e-1, trans 1e-2 (test_filterreg.py:15-29); the
pt2pl variant is skipped in the reference — exercised here.
"""

import numpy as np
import pytest

from probreg_tpu import filterreg
from probreg_tpu.utils import se3_op


@pytest.fixture(scope="module")
def clouds(horse_cloud):
    src = np.asarray(horse_cloud, dtype=np.float32)
    ang = np.deg2rad([10.0, -5.0, 8.0])
    rot = np.asarray(se3_op.euler2mat(*ang), np.float32)
    tgt = src @ rot.T
    normals = estimate_normals_pca(tgt)
    return src, tgt, ang, normals


def estimate_normals_pca(pts, k=12):
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d2, axis=1)[:, :k]
    nbrs = pts[idx]
    ctr = nbrs.mean(axis=1, keepdims=True)
    cov = np.einsum("nki,nkj->nij", nbrs - ctr, nbrs - ctr)
    _, vecs = np.linalg.eigh(cov)
    normals = vecs[:, :, 0].astype(np.float32)
    # Consistent orientation (outward): sign flips cancel the *smoothed*
    # normals NX in the E-step otherwise (Open3D's orient_normals_* step
    # in the reference examples serves the same purpose).
    out = pts - pts.mean(0)
    sign = np.sign((normals * out).sum(1, keepdims=True))
    sign[sign == 0] = 1.0
    return normals * sign


def test_filterreg_rigid_pt2pt_dense(clouds):
    src, tgt, ang, _ = clouds
    res = filterreg.registration_filterreg(src, tgt, maxiter=50, tol=1e-5)
    rec = np.asarray(se3_op.mat2euler(res.transformation.rot))
    np.testing.assert_allclose(rec, ang, atol=2e-1)
    np.testing.assert_allclose(np.asarray(res.transformation.t), 0.0, atol=1e-2)


def test_filterreg_rigid_pt2pt_lattice(clouds):
    src, tgt, ang, _ = clouds
    res = filterreg.registration_filterreg(
        src, tgt, maxiter=50, tol=1e-5, estep_method="lattice")
    rec = np.asarray(se3_op.mat2euler(res.transformation.rot))
    np.testing.assert_allclose(rec, ang, atol=2e-1)
    np.testing.assert_allclose(np.asarray(res.transformation.t), 0.0, atol=1e-2)


def test_filterreg_rigid_pt2pl(clouds):
    src, tgt, ang, normals = clouds
    res = filterreg.registration_filterreg(
        src, tgt, target_normals=normals, objective_type="pt2pl",
        maxiter=50, tol=1e-6)
    rec = np.asarray(se3_op.mat2euler(res.transformation.rot))
    np.testing.assert_allclose(rec, ang, atol=2e-1)
    np.testing.assert_allclose(np.asarray(res.transformation.t), 0.0, atol=1e-2)


def test_filterreg_update_sigma2(clouds):
    src, tgt, ang, _ = clouds
    res = filterreg.registration_filterreg(
        src, tgt, update_sigma2=True, maxiter=50, tol=1e-5)
    rec = np.asarray(se3_op.mat2euler(res.transformation.rot))
    np.testing.assert_allclose(rec, ang, atol=2e-1)
    assert float(res.sigma2) > 0.0


def test_filterreg_callbacks_and_host_loop(clouds):
    src, tgt, ang, _ = clouds
    seen = []
    res = filterreg.registration_filterreg(
        src, tgt, maxiter=10, tol=1e-9, callbacks=[lambda t: seen.append(t)])
    assert len(seen) >= 1
    rec = np.asarray(se3_op.mat2euler(res.transformation.rot))
    np.testing.assert_allclose(rec, ang, atol=2e-1)


def test_filterreg_large_pairs_fallback_matches_fast(horse_cloud):
    """Beyond transposed_em_max_pairs the rigid fast path (which holds the
    full M x N kernel matrix) must give way to the streaming host loop with
    equivalent results."""
    from probreg_tpu import config as cfg

    src = np.asarray(horse_cloud, dtype=np.float32)[::4]
    rot = np.asarray(se3_op.euler2mat(*np.deg2rad([0.0, 0.0, 8.0])), np.float32)
    tgt = src @ rot.T
    res_fast = filterreg.registration_filterreg(src, tgt, maxiter=30, tol=1e-6)
    old = cfg.config.transposed_em_max_pairs
    cfg.config.transposed_em_max_pairs = 10
    try:
        res_stream = filterreg.registration_filterreg(src, tgt, maxiter=30,
                                                      tol=1e-6)
    finally:
        cfg.config.transposed_em_max_pairs = old
    np.testing.assert_allclose(
        np.asarray(res_stream.transformation.rot),
        np.asarray(res_fast.transformation.rot), atol=1e-3)
