"""Low-rank (Nystrom) kernel paths: factor accuracy, Woodbury solve vs the
dense solve, and nonrigid-CPD / BCPD registration parity with the dense path.

The reference has no low-rank option (its nonrigid CPD materializes the
M x M Gram, cpd.py:284-303; BCPD inverts M x M, bcpd.py:114,130) — this is
the scaling capability SURVEY.md sec. 7.8 calls for.
"""

import jax.numpy as jnp
import numpy as np

import _fixtures

from probreg_tpu import bcpd, cpd
from probreg_tpu.ops import lowrank, pairwise


def nn_rmse(a, b):
    d2 = ((a[:, None] - b[None]) ** 2).sum(-1)
    return float(np.sqrt(d2.min(axis=1).mean()))


def _fish():
    src = _fixtures.fish_source()
    tgt = _fixtures.fish_target()
    return src, tgt


def test_nystrom_factor_accuracy(rng):
    pts = rng.normal(size=(200, 3)).astype(np.float32)
    g = np.asarray(pairwise.rbf_kernel(pts, pts, 2.0))
    u, lam = lowrank.lowrank_rbf(jnp.asarray(pts), 2.0, 60)
    g_lr = np.asarray(u) * np.asarray(lam) @ np.asarray(u).T
    rel = np.linalg.norm(g - g_lr) / np.linalg.norm(g)
    assert rel < 1e-2
    # U orthonormal, eigenvalues nonnegative descending.
    np.testing.assert_allclose(
        np.asarray(u).T @ np.asarray(u), np.eye(60), atol=1e-4)
    lam = np.asarray(lam)
    assert (lam >= 0).all() and (np.diff(lam) <= 1e-5).all()


def test_woodbury_solve_matches_dense(rng):
    m, k, d = 150, 150, 3
    pts = rng.normal(size=(m, d)).astype(np.float32)
    # Full-rank factors: the Woodbury path must reproduce the dense solve.
    u, lam = lowrank.lowrank_rbf(jnp.asarray(pts), 1.5, k)
    g = np.asarray(u) * np.asarray(lam) @ np.asarray(u).T
    dvec = rng.uniform(0.1, 1.0, size=m).astype(np.float32)
    c = 0.37
    rhs = rng.normal(size=(m, d)).astype(np.float32)
    expect = np.linalg.solve(c * np.eye(m) + dvec[:, None] * g, rhs)
    got = np.asarray(lowrank.woodbury_solve(
        u, lam, jnp.asarray(dvec), c, jnp.asarray(rhs)))
    np.testing.assert_allclose(got, expect, atol=2e-4)


def test_regularized_sigma_matches_dense(rng):
    m, k = 120, 120
    pts = rng.normal(size=(m, 3)).astype(np.float32)
    u, lam = lowrank.lowrank_imq(jnp.asarray(pts), 1.0, k)
    g = np.asarray(u) * np.asarray(lam) @ np.asarray(u).T
    nu = rng.uniform(0.1, 1.0, size=m).astype(np.float32)
    c, lmd = 0.8, 2.0
    sigma_dense = np.linalg.solve(lmd * np.eye(m) + c * g * nu[None, :], g)
    s_core, sigma_diag = lowrank.regularized_sigma(
        u, lam, jnp.asarray(nu), c, lmd)
    sigma_lr = np.asarray(u) @ np.asarray(s_core) @ np.asarray(u).T / lmd
    np.testing.assert_allclose(sigma_lr, sigma_dense, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(sigma_diag), np.diag(sigma_dense), atol=2e-4)


def test_nonrigid_cpd_lowrank_matches_dense_fish():
    src, tgt = _fish()
    res_d = cpd.registration_cpd(src, tgt, tf_type_name="nonrigid", maxiter=40)
    res_l = cpd.registration_cpd(
        src, tgt, tf_type_name="nonrigid", maxiter=40, rank=40)
    moved_d = np.asarray(res_d.transformation.transform(src))
    moved_l = np.asarray(res_l.transformation.transform(src))
    # Both must register well, and the low-rank result must track the dense.
    assert nn_rmse(moved_l, tgt) < 0.3 * nn_rmse(src, tgt)
    assert float(np.abs(moved_l - moved_d).max()) < 5e-2


def test_constrained_lowrank_runs_fish():
    src, tgt = _fish()
    idx = np.arange(0, len(src), 7)
    res = cpd.registration_cpd(
        src, tgt, tf_type_name="nonrigid_constrained", maxiter=30, rank=40,
        idx_source=idx, idx_target=idx, alpha=1e-8)
    moved = np.asarray(res.transformation.transform(src))
    assert nn_rmse(moved, tgt) < 0.5 * nn_rmse(src, tgt)


def test_bcpd_lowrank_matches_dense_fish():
    src, tgt = _fish()
    res_d = bcpd.registration_bcpd(src, tgt, maxiter=50, tol=1e-6)
    res_l = bcpd.registration_bcpd(src, tgt, maxiter=50, tol=1e-6, rank=40)
    moved_d = np.asarray(res_d.transform(src))
    moved_l = np.asarray(res_l.transform(src))
    # The rank-40 prior is a different (approximate) G, so the recovered
    # fields agree on average but not pointwise; quality must match dense.
    base = nn_rmse(src, tgt)
    assert nn_rmse(moved_l, tgt) < 0.2 * base
    assert nn_rmse(moved_l, tgt) < 1.5 * nn_rmse(moved_d, tgt)
    assert float(np.abs(moved_l - moved_d).mean()) < 5e-2


def test_bcpd_lowrank_callback_path_matches_jit():
    src, tgt = _fish()
    seen = []
    res_cb = bcpd.registration_bcpd(
        src, tgt, maxiter=10, tol=0.0, rank=30,
        callbacks=[lambda t: seen.append(t)])
    assert len(seen) == 10
    res_jit = bcpd.registration_bcpd(src, tgt, maxiter=10, tol=0.0, rank=30)
    np.testing.assert_allclose(
        np.asarray(res_cb.transform(src)), np.asarray(res_jit.transform(src)),
        atol=1e-3)


def test_nonrigid_lowrank_large_m_smoke():
    # M x M dense Gram would be 16M floats here; low-rank stays O(M K).
    # Surface grid with a smooth bending deformation (the motion-coherence
    # model's regime; a uniform random cloud is not).
    g = np.linspace(0.0, 1.0, 64)
    xx, yy = np.meshgrid(g, g)
    src = np.stack(
        [xx, yy, 0.3 * np.sin(2 * np.pi * xx) * np.cos(2 * np.pi * yy)],
        axis=-1).reshape(-1, 3).astype(np.float32)
    disp = 0.08 * np.stack(
        [np.sin(np.pi * yy), np.cos(np.pi * xx), np.sin(np.pi * (xx + yy))],
        axis=-1).reshape(-1, 3).astype(np.float32)
    tgt = src + disp
    res = cpd.registration_cpd(
        src, tgt, tf_type_name="nonrigid", maxiter=20, rank=50)
    moved = np.asarray(res.transformation.transform(src))
    assert nn_rmse(moved, tgt) < 0.3 * nn_rmse(src, tgt)


def test_nonrigid_lowrank_fast_path_matches_step_path():
    """The transposed blocked whole-EM runner (_run_em_nonrigid_lowrank_t,
    the default when rank is set) matches the per-step path (forced via a
    callback) and its own blocked variant bit-for-bit-ish."""
    from probreg_tpu import config as cfg

    src, tgt = _fish()
    res_fast = cpd.registration_cpd(
        src, tgt, tf_type_name="nonrigid", maxiter=20, tol=0.0, rank=30)
    res_step = cpd.registration_cpd(
        src, tgt, tf_type_name="nonrigid", maxiter=20, tol=0.0, rank=30,
        callbacks=[lambda t: None])
    mf = np.asarray(res_fast.transformation.transform(src))
    ms = np.asarray(res_step.transformation.transform(src))
    np.testing.assert_allclose(mf, ms, atol=1e-4)
    # Blocked E-step (block < N, non-divisor) == single-shot.
    old = cfg.config.estep_chunk
    cfg.config.estep_chunk = 13
    try:
        res_blk = cpd.registration_cpd(
            src, tgt, tf_type_name="nonrigid", maxiter=20, tol=0.0, rank=30)
    finally:
        cfg.config.estep_chunk = old
    np.testing.assert_allclose(
        np.asarray(res_blk.transformation.transform(src)), mf, atol=1e-4)
