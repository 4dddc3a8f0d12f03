"""BCPD e2e — coverage the reference lacks entirely (SURVEY.md §4)."""

import numpy as np

import _fixtures
import pytest

from probreg_tpu import bcpd
from probreg_tpu.utils import se3_op


def nn_rmse(a, b):
    d2 = ((a[:, None] - b[None]) ** 2).sum(-1)
    return float(np.sqrt(d2.min(axis=1).mean()))


def test_bcpd_rigid_recovery(horse_cloud):
    """BCPD's combined model may split a rigid motion between the rigid part
    and the coherent field v; registration quality is the nn criterion the
    algorithm itself optimizes (reference bcpd.py:95-99)."""
    src = np.asarray(horse_cloud, dtype=np.float32)[::2]
    ang = np.deg2rad([8.0, -4.0, 6.0])
    rot = np.asarray(se3_op.euler2mat(*ang), np.float32)
    tgt = src @ rot.T
    # Dense cloud: strengthen the coherence prior (lmd) so the rigid
    # component, not the v field, explains the motion.
    res = bcpd.registration_bcpd(src, tgt, maxiter=100, tol=0.0, lmd=10.0)
    moved = np.asarray(res.transform(src))
    assert nn_rmse(moved, tgt) < 0.5 * nn_rmse(src, tgt)


def test_bcpd_nonrigid_fish():
    src = _fixtures.fish_source()
    tgt = _fixtures.fish_target()
    res = bcpd.registration_bcpd(src, tgt, maxiter=50, tol=1e-6)
    moved = np.asarray(res.transform(src))
    assert nn_rmse(moved, tgt) < 0.5 * nn_rmse(src, tgt)
    # Combined transform: nonrigid displacement must be non-trivial.
    assert float(np.abs(np.asarray(res.v)).max()) > 1e-4


def test_bcpd_callback_path_matches_jit(horse_cloud):
    src = np.asarray(horse_cloud, dtype=np.float32)[::4]
    ang = np.deg2rad([5.0, 0.0, -3.0])
    rot = np.asarray(se3_op.euler2mat(*ang), np.float32)
    tgt = src @ rot.T
    seen = []
    res_cb = bcpd.registration_bcpd(src, tgt, maxiter=15, tol=0.0,
                                    callbacks=[lambda t: seen.append(t)])
    assert len(seen) == 15
    res_jit = bcpd.registration_bcpd(src, tgt, maxiter=15, tol=0.0)
    np.testing.assert_allclose(
        np.asarray(res_cb.rigid_trans.rot), np.asarray(res_jit.rigid_trans.rot),
        atol=2e-3)


def _reference_bcpd_replica(src, tgt, n_iters, lmd=2.0, k=1e20, w=0.0):
    """Line-by-line float64 replica of reference probreg/bcpd.py:53-155."""
    import scipy.special as spsp

    src = src.astype(np.float64)
    tgt = tgt.astype(np.float64)
    m, dim = src.shape
    n = tgt.shape[0]
    d2g = ((src[:, None] - src[None]) ** 2).sum(-1)
    gmat = 1.0 / np.sqrt(d2g + 1.0)
    gmat_inv = np.linalg.inv(gmat)
    sigma2 = ((src[:, None] - tgt[None]) ** 2).sum() / (m * dim * n)
    sigma_mat = np.identity(m)
    alpha = 1.0 / m
    rot, t, scale, v_hat = np.eye(dim), np.zeros(dim), 1.0, np.zeros_like(src)
    traj = []
    for _ in range(n_iters):
        t_source = scale * (src + v_hat) @ rot.T + t
        pmat = ((tgt[None] - t_source[:, None]) ** 2).sum(-1)
        pmat = np.exp(-pmat / (2 * sigma2)) / (2 * np.pi * sigma2) ** (dim / 2)
        pmat = pmat.T
        pmat *= np.exp(-scale ** 2 / (2 * sigma2) * np.diag(sigma_mat) * dim)
        pmat *= (1 - w) * alpha
        den = w / n + pmat.sum(axis=1)
        den[den == 0] = np.finfo(np.float32).eps
        pmat = pmat.T / den
        nu_d = pmat.sum(0)
        nu = pmat.sum(1)
        n_p = nu.sum()
        px = pmat @ tgt
        x_hat = px / np.maximum(nu, 1e-300)[:, None]
        s2s2 = scale ** 2 / (sigma2 ** 2)
        sigma_mat = np.linalg.inv(lmd * gmat_inv + s2s2 * np.diag(nu))
        residual = ((x_hat - t) / scale) @ rot - src
        v_hat = s2s2 * (sigma_mat @ (nu[:, None] * residual))
        u_hat = src + v_hat
        alpha = np.exp(spsp.psi(k + nu) - spsp.psi(k * m + n_p))
        x_m = nu @ x_hat / n_p
        sigma2_m = (nu * np.diag(sigma_mat)).sum() / n_p
        u_m = nu @ u_hat / n_p
        u_hm = u_hat - u_m
        s_xu = ((x_hat - x_m) * nu[:, None]).T @ u_hm / n_p
        s_uu = (u_hm * nu[:, None]).T @ u_hm / n_p + sigma2_m * np.eye(dim)
        phi, _, psih = np.linalg.svd(s_xu)
        c = np.ones(dim); c[-1] = np.linalg.det(phi @ psih)
        rot_new = (phi * c) @ psih
        scale_new = np.trace(rot_new @ s_xu) / np.trace(s_uu)
        t_new = x_m - scale_new * rot_new @ u_m
        # reference bcpd.py:151: y_hat with the PREVIOUS transform
        y_hat = scale * (src + v_hat) @ rot.T + t
        s1 = (nu_d * (tgt ** 2).sum(1)).sum()
        s2v = (px * y_hat).sum()
        s3 = (nu * (y_hat ** 2).sum(1)).sum()
        sigma2 = (s1 - 2 * s2v + s3) / (n_p * dim) + scale_new ** 2 * sigma2_m
        rot, t, scale = rot_new, t_new, scale_new
        traj.append((scale, sigma2))
    return traj


def test_bcpd_matches_reference_replica():
    """Per-iteration (scale, sigma2) trajectory matches a float64
    line-by-line replica of the reference within f32 tolerance."""
    src = _fixtures.fish_source()
    tgt = _fixtures.fish_target()
    ref_traj = _reference_bcpd_replica(src, tgt, 5)

    bc = bcpd.CombinedBCPD(src)
    res = bc._initialize(tgt)
    for i in range(5):
        t_source = res.transformation._transform(bc._source)
        est = bc.expectation_step(
            t_source, tgt, res.transformation.rigid_trans.scale,
            res.alpha, res.sigma_mat, res.sigma2, 0.0)
        res = bc.maximization_step(tgt, res.transformation.rigid_trans, est,
                                   res.sigma2)
        scale_ref, sigma2_ref = ref_traj[i]
        np.testing.assert_allclose(
            float(res.transformation.rigid_trans.scale), scale_ref,
            rtol=2e-3)
        np.testing.assert_allclose(float(res.sigma2), sigma2_ref, rtol=5e-3)


def test_bcpd_blocked_estep_matches_single():
    """Forcing estep_chunk below N must stream the E-step over column
    blocks with identical results (new capability: the reference holds the
    full M x N posterior, bcpd.py:57-70)."""
    from probreg_tpu import config as cfg

    src = _fixtures.fish_source()
    tgt = _fixtures.fish_target()
    res_full = bcpd.registration_bcpd(src, tgt, maxiter=15, tol=0.0)
    old = cfg.config.estep_chunk
    cfg.config.estep_chunk = 17  # not a divisor of N: exercises padding
    try:
        res_blk = bcpd.registration_bcpd(src, tgt, maxiter=15, tol=0.0)
    finally:
        cfg.config.estep_chunk = old
    np.testing.assert_allclose(
        np.asarray(res_blk.transform(src)), np.asarray(res_full.transform(src)),
        atol=1e-4)
