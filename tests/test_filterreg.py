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
    # use_pallas=False: this test specifically compares the transposed XLA
    # fast path to the streaming host loop (the fused Pallas kernel has its
    # own equivalence tests in test_em_pallas).
    res_fast = filterreg.registration_filterreg(src, tgt, maxiter=30,
                                                tol=1e-6, use_pallas=False)
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


def _reference_filterreg_replica(src, tgt, n_iters, sigma2, w=0.0):
    """Float64 replica of reference filterreg.py:78-182 with the EXACT
    Gaussian kernel in place of the permutohedral approximation (the
    lattice only approximates K_ij = exp(-|fx_i - fy_j|^2/2); our dense
    default computes K exactly, so the replica does too). M-step is the
    weighted Kabsch of kabsch.cc:6-56."""
    src = src.astype(np.float64)
    tgt = tgt.astype(np.float64)
    m, dim = src.shape
    n = tgt.shape[0]
    rot, t = np.eye(dim), np.zeros(dim)
    traj = []
    for _ in range(n_iters):
        t_src = src @ rot.T + t
        d2 = ((t_src[:, None] - tgt[None]) ** 2).sum(-1)
        k = np.exp(-d2 / (2.0 * sigma2))
        m0 = k.sum(1)
        m1 = k @ tgt
        c = w / (1 - w) * n / m * (2.0 * np.pi * sigma2) ** (dim / 2) \
            if w > 0 else 0.0
        mask = (m0 > 0).astype(np.float64)
        m0s = np.maximum(m0, np.finfo(np.float32).eps)
        m1m0 = m1 / m0s[:, None]
        drxdx = mask * np.sqrt(m0 / (m0 + c) / sigma2)
        # weighted Kabsch (kabsch.cc): centroids with weights drxdx, H
        # accumulated with squared weights, SVD with det-sign fix.
        wsum = drxdx.sum()
        mc = (t_src * drxdx[:, None]).sum(0) / wsum
        tc = (m1m0 * drxdx[:, None]).sum(0) / wsum
        w2 = drxdx ** 2
        hh = ((t_src - mc) * w2[:, None]).T @ (m1m0 - tc) / w2.sum()
        u, _, vh = np.linalg.svd(hh)
        s = np.ones(dim); s[-1] = np.linalg.det(vh.T @ u.T)
        dr = (vh.T * s) @ u.T
        dt = tc - dr @ mc
        rot = dr @ rot
        t = t @ dr.T + dt
        traj.append((rot.copy(), t.copy()))
    return traj


def test_filterreg_matches_reference_replica(horse_cloud):
    """Per-iteration (rot, t) of the jitted transposed loop matches a
    float64 replica of the reference's dense math within f32 tolerance."""
    src = np.asarray(horse_cloud, dtype=np.float32)[::2]
    ang = np.deg2rad([6.0, -3.0, 4.0])
    rot0 = np.asarray(se3_op.euler2mat(*ang), np.float32)
    tgt = (src @ rot0.T).astype(np.float32)
    sigma2 = 0.01
    ref = _reference_filterreg_replica(src, tgt, 5, sigma2)
    for i in (2, 5):
        # Runs the default path: on TPU that is the fused Pallas kernel,
        # whose Horn+RQI solve matches the XLA path to ~1e-6 per iteration.
        res = filterreg.registration_filterreg(
            src, tgt, sigma2=sigma2, maxiter=i, tol=0.0)
        rot_ref, t_ref = ref[i - 1]
        np.testing.assert_allclose(
            np.asarray(res.transformation.rot), rot_ref, atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(res.transformation.t), t_ref, atol=2e-4)


def test_filterreg_fpfh_feature_estep(horse_cloud):
    """Feature-space (FPFH) E-step recovers a known rigid transform
    (probreg_tpu/filterreg.py feature path; reference filterreg.py:121-133
    has this path but never tests it). Also asserts the feature run stays
    within a modest factor of the identity-feature (dense) run."""
    from probreg_tpu import features

    src = np.asarray(horse_cloud, dtype=np.float32)[::3]
    ang = np.deg2rad([8.0, -4.0, 6.0])
    rot = np.asarray(se3_op.euler2mat(*ang), np.float32)
    tgt = src @ rot.T

    fpfh = features.FPFH(radius_normal=0.02, radius_feature=0.05)
    calls = []
    orig = filterreg._run_em_rigid_feature

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    filterreg._run_em_rigid_feature = spy
    try:
        res_f = filterreg.registration_filterreg(
            src, tgt, objective_type="pt2pt", feature_fn=fpfh, maxiter=40,
            tol=1e-6)
    finally:
        filterreg._run_em_rigid_feature = orig
    # Round-3: the pure-JAX FPFH pipeline is traced INTO the EM loop —
    # one dispatch per registration, not one per iteration.
    assert calls == [1]
    rec_f = np.asarray(se3_op.mat2euler(res_f.transformation.rot))
    np.testing.assert_allclose(rec_f, ang, atol=2e-1)
    np.testing.assert_allclose(
        np.asarray(res_f.transformation.t), 0.0, atol=1e-2)

    res_d = filterreg.registration_filterreg(
        src, tgt, objective_type="pt2pt", maxiter=40, tol=1e-6)
    rec_d = np.asarray(se3_op.mat2euler(res_d.transformation.rot))
    err_f = np.abs(rec_f - ang).max()
    err_d = np.abs(rec_d - ang).max()
    # Graceful degradation: the 33-D feature E-step may lose a little
    # accuracy vs the dense geometric E-step, but not blow up.
    assert err_f <= max(5.0 * err_d, 5e-2)


def test_streaming_runner_matches_fast_path(horse_cloud):
    """The large-N streaming whole-EM runner (moments via
    gto.filterreg_moments, no (M, N) materialization) must match the
    VMEM-budgeted fast path on the same inputs."""
    from probreg_tpu.config import config

    src = np.asarray(horse_cloud, dtype=np.float32)[::2]
    ang = np.deg2rad([5.0, -3.0, 7.0])
    rot = np.asarray(se3_op.euler2mat(*ang), np.float32)
    tgt = src @ rot.T

    res_fast = filterreg.registration_filterreg(src, tgt, maxiter=40,
                                                tol=1e-9)
    orig = config.transposed_em_max_pairs
    config.transposed_em_max_pairs = 0  # force the streaming runner
    try:
        res_str = filterreg.registration_filterreg(src, tgt, maxiter=40,
                                                   tol=1e-9)
    finally:
        config.transposed_em_max_pairs = orig
    np.testing.assert_allclose(np.asarray(res_str.transformation.rot),
                               np.asarray(res_fast.transformation.rot),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(res_str.transformation.t),
                               np.asarray(res_fast.transformation.t),
                               atol=5e-4)


def test_filterreg_lattice_runner_matches_host_loop(clouds):
    # No callbacks -> the jitted whole-EM lattice runner; with callbacks ->
    # the per-iteration host loop. Same math, same blur switch: the
    # recovered transforms must agree to f32 loop tolerance.
    src, tgt, ang, _ = clouds
    res_j = filterreg.registration_filterreg(
        src, tgt, maxiter=20, tol=0.0, estep_method="lattice")
    seen = []
    res_h = filterreg.registration_filterreg(
        src, tgt, maxiter=20, tol=0.0, estep_method="lattice",
        callbacks=[lambda tr: seen.append(tr)])
    assert len(seen) == 20
    np.testing.assert_allclose(np.asarray(res_j.transformation.rot),
                               np.asarray(res_h.transformation.rot),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(res_j.transformation.t),
                               np.asarray(res_h.transformation.t), atol=1e-4)

def test_mstep_zero_m0_rows_no_nan():
    """Exact-zero m0 rows with w=0 (c=0) must not NaN the M-step: the
    culled/streaming Gauss transforms return EXACT zeros for source rows
    far from every target (review finding — the 0/0 guard existed only in
    _mstep_from_moments_t)."""
    import jax.numpy as jnp

    t_src = jnp.asarray(np.random.default_rng(0).random((6, 3)), jnp.float32)
    m0 = jnp.asarray([0.5, 0.0, 0.8, 0.0, 0.3, 0.9], jnp.float32)
    m1 = m0[:, None] * (t_src + 0.01)
    m2 = m0 * 1.1
    nx = m0[:, None] * jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    c = jnp.asarray(0.0, jnp.float32)
    for out in (filterreg.rigid_mstep_pt2pt(
                    t_src, m0, m1, m2, jnp.eye(3), jnp.zeros(3), 0.05, c),
                filterreg.rigid_mstep_pt2pl(
                    t_src, m0, m1, m2, nx, jnp.eye(3), jnp.zeros(3),
                    0.05, c)):
        rot, t, s2, q = out
        assert np.isfinite(np.asarray(rot)).all()
        assert np.isfinite(np.asarray(t)).all()
        assert np.isfinite(float(s2)) and np.isfinite(float(q))


def test_multistart_respects_size_guard(monkeypatch):
    """n_starts > 1 vmaps dense (M, N) kernels; above the fast-path bound
    it must raise clearly, not reach the device (review finding)."""
    from probreg_tpu import config as cfg

    rng = np.random.default_rng(1)
    src = rng.random((60, 3)).astype(np.float32)
    monkeypatch.setattr(cfg.config, "transposed_em_max_pairs", 1000)
    with pytest.raises(ValueError, match="transposed_em_max_pairs"):
        filterreg.registration_filterreg(src, src, n_starts=4)


def test_rigid_filterreg_set_source_infers_dim(clouds):
    """Constructing with source=None and set_source(2-D cloud) later must
    re-run the dimensionality inference (review finding: stale 3x3
    identity crashed the runner)."""
    rng = np.random.default_rng(2)
    src2d = rng.random((80, 2)).astype(np.float32)
    ang = np.deg2rad(7.0)
    rot = np.array([[np.cos(ang), -np.sin(ang)],
                    [np.sin(ang), np.cos(ang)]], np.float32)
    tgt2d = src2d @ rot.T
    f = filterreg.RigidFilterReg()
    f.set_source(src2d)
    res = f.registration(tgt2d, maxiter=40, tol=1e-6)
    assert np.asarray(res.transformation.rot).shape == (2, 2)
    assert np.allclose(np.asarray(res.transformation.rot), rot, atol=5e-2)


def test_chunked_auto_sigma2_single_compile(clouds):
    """The chunked callback path resolves the auto start temperature ONCE:
    every chunk must run the SAME compiled program (auto_sigma2 static arg
    constant — review finding: it toggled, doubling compiles)."""
    source, target, _, _ = clouds
    seen = []
    orig = filterreg._run_em_rigid

    def spy(*args, **kwargs):
        seen.append(kwargs.get("auto_sigma2"))
        return orig(*args, **kwargs)

    filterreg._run_em_rigid, saved = spy, orig
    try:
        calls = []
        res = filterreg.registration_filterreg(
            source, target, maxiter=8, tol=0.0,
            callbacks=[lambda t: calls.append(1)], callback_chunk=4)
    finally:
        filterreg._run_em_rigid = saved
    assert len(seen) >= 2 and all(a is False for a in seen), seen
    assert len(calls) == 8
    assert np.isfinite(np.asarray(res.transformation.rot)).all()
