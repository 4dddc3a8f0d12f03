"""Feature generators: JAX GMM vs sklearn, OCSVM dual sanity, FPFH invariance."""

import numpy as np
import pytest

from probreg_tpu import features as ft


def test_gmm_matches_sklearn_moments(rng):
    pts = np.concatenate([
        rng.normal(size=(150, 3)) * 0.2,
        rng.normal(size=(150, 3)) * 0.2 + np.array([3.0, 0, 0]),
    ]).astype(np.float32)
    g = ft.GMM(n_gmm_components=8)
    g.init()
    mu, pi = g.compute(pts)
    mu, pi = np.asarray(mu), np.asarray(pi)
    np.testing.assert_allclose(pi.sum(), 1.0, atol=1e-5)
    # Mixture mean reproduces the data mean.
    np.testing.assert_allclose(pi @ mu, pts.mean(0), atol=0.05)
    # Two well-separated blobs: component means land near one of them.
    d_blob = np.minimum(
        np.linalg.norm(mu - pts[:150].mean(0), axis=1),
        np.linalg.norm(mu - pts[150:].mean(0), axis=1))
    assert np.all(d_blob < 1.0)


def test_ocsvm_dual_constraints(rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    f = ft.OneClassSVM(3, sigma=1.0, gamma=0.5, nu=0.1)
    f.init()
    sv, w = f.compute(pts)
    w = np.asarray(w)
    z = (2.0 * np.pi) ** 1.5
    alpha = w / z
    nu_n = 0.1 * 100
    # libsvm convention: 0 <= alpha_i <= 1, sum = nu * n.
    np.testing.assert_allclose(alpha.sum(), nu_n, rtol=1e-3)
    assert alpha.min() >= -1e-6
    assert alpha.max() <= 1.0 + 1e-4
    # nu lower-bounds the fraction of support vectors.
    assert (alpha > 1e-6).sum() >= nu_n - 1


def test_fpfh_rotation_invariance(rng):
    from probreg_tpu.utils import se3_op

    theta = rng.uniform(0, np.pi, 200)
    phi = rng.uniform(0, 2 * np.pi, 200)
    r = 0.5 * (1.0 + 0.2 * np.sin(3 * theta))
    pts = np.stack([
        r * np.sin(theta) * np.cos(phi), r * np.sin(theta) * np.sin(phi),
        r * np.cos(theta)], 1).astype(np.float32)
    rot = np.asarray(se3_op.euler2mat(0.3, -0.2, 0.5), np.float32)
    f = ft.FPFH(radius_normal=0.3, radius_feature=0.6)
    h1 = np.asarray(f.compute(pts))
    h2 = np.asarray(f.compute(pts @ rot.T))
    assert h1.shape == (200, 33)
    # FPFH is rotation invariant (up to binning edges + normal sign flips).
    rel = np.abs(h1 - h2).sum(1) / np.maximum(np.abs(h1).sum(1), 1e-9)
    assert np.median(rel) < 0.35, np.median(rel)


def test_fpfh_separates_geometry(rng):
    # Plane vs sphere patches should have different histograms.
    xs, ys = np.meshgrid(np.linspace(0, 1, 10), np.linspace(0, 1, 10))
    plane = np.stack([xs.ravel(), ys.ravel(), np.zeros(100)], 1).astype(np.float32)
    theta = rng.uniform(0, np.pi, 100)
    phi = rng.uniform(0, 2 * np.pi, 100)
    sphere = np.stack([
        np.sin(theta) * np.cos(phi), np.sin(theta) * np.sin(phi),
        np.cos(theta)], 1).astype(np.float32) * 0.5
    f = ft.FPFH(radius_normal=0.3, radius_feature=0.6)
    hp = np.asarray(f.compute(plane)).mean(0)
    hs = np.asarray(f.compute(sphere)).mean(0)
    assert np.abs(hp - hs).sum() / np.abs(hp).sum() > 0.1


def test_fpfh_estimate_normals_plane(rng):
    """Normals of a flat plane must be +-z (reference features.py:43-44
    delegates to Open3D; this is the native equivalent)."""
    from probreg_tpu import features

    g = np.linspace(0, 1, 15)
    xx, yy = np.meshgrid(g, g)
    pts = np.stack([xx, yy, np.zeros_like(xx)], -1).reshape(-1, 3)
    pts = pts.astype(np.float32)
    nrm = np.asarray(features.FPFH(radius_normal=0.3).estimate_normals(pts))
    assert np.abs(np.abs(nrm[:, 2]) - 1.0).max() < 1e-3


def test_cupy_utils_compat(rng):
    """probreg.cupy_utils drop-in: JAX-backed, dimension-generic."""
    from probreg_tpu import cupy_utils
    from probreg_tpu.utils import math_utils as mu

    x = rng.normal(size=(20, 2)).astype(np.float32)
    y = rng.normal(size=(30, 2)).astype(np.float32)
    np.testing.assert_allclose(
        float(cupy_utils.squared_kernel_sum(x, y)),
        float(mu.squared_kernel_sum(x, y)))
    g = np.asarray(cupy_utils.rbf_kernel(x, y, 0.7))
    d2 = ((x[:, None] - y[None]) ** 2).sum(-1)
    # Reference convention (cupy_utils.py:46): beta enters linearly.
    np.testing.assert_allclose(g, np.exp(-d2 / (2 * 0.7)), atol=1e-5)

def test_fpfh_robust_to_duplicate_points(rng):
    """Coincident neighbors must be skipped (Open3D does): a duplicate
    point's 1/dist weight otherwise reached ~1e10 and swamped the
    descriptor (review finding)."""
    from probreg_tpu.ops import fpfh as fpfh_ops

    pts = rng.random((120, 3)).astype(np.float32)
    pts_dup = np.concatenate([pts, pts[:1]])     # exact duplicate of row 0
    f = np.asarray(fpfh_ops.fpfh(pts_dup, radius_feature=2.0))
    assert np.isfinite(f).all()
    # The duplicate rows' descriptors stay in a sane range (they were
    # ~1e12 before the fix; regular rows are O(100) per block).
    assert np.abs(f[0]).max() < 1e4 and np.abs(f[-1]).max() < 1e4


def test_fpfh_neighbor_term_scale_invariant(rng):
    """The neighbor term renormalizes per 11-bin block (Open3D), so
    uniformly rescaling a cloud (with the radii) must not change the
    self/neighbor balance (review finding: a 1/dist mean made it depend
    on the absolute scale)."""
    from probreg_tpu.ops import fpfh as fpfh_ops

    pts = rng.random((150, 3)).astype(np.float32)
    f1 = np.asarray(fpfh_ops.fpfh(pts, radius_normal=0.3,
                                  radius_feature=1.0))
    f2 = np.asarray(fpfh_ops.fpfh(10.0 * pts, radius_normal=3.0,
                                  radius_feature=10.0))
    # f32 angle binning flips a handful of boundary votes at the new
    # scale; the DESCRIPTOR BALANCE must be unchanged (99%+ of entries
    # tight). Pre-fix, the neighbor term scaled by 1/10 wholesale.
    close = np.isclose(f1, f2, rtol=1e-3, atol=1e-2)
    assert close.mean() > 0.99, close.mean()
    assert np.median(np.abs(f1 - f2)) < 1e-2


def test_gauss_transform_high_dim_uses_dense_path(monkeypatch):
    """>8-D clouds (33-D FPFH feature spaces) must take the dense path —
    the culled kernel packs points into 8-sublane strips and would crash
    at trace time (review finding)."""
    import jax

    from probreg_tpu import config as cfgmod
    from probreg_tpu.ops import gausstransform as gto

    rng = np.random.default_rng(0)
    src = rng.random((300, 33)).astype(np.float32)
    wts = rng.random((300,)).astype(np.float32)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(cfgmod.config, "culled_estep_min_pairs", 1)
    called = {}
    import probreg_tpu.ops.estep_pallas as ep

    def boom(*a, **k):
        called["culled"] = True
        raise AssertionError("culled kernel must not be reached")

    monkeypatch.setattr(ep, "gauss_transform_culled", boom)
    out = gto.gauss_transform(src, src, wts, 1.0)
    assert out.shape == (300,) and "culled" not in called
