"""GMMReg / SVR e2e (reference tests/test_svr.py: rot atol 1e-1, trans 1e-2)."""

import numpy as np

import _fixtures
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


def test_fused_fit_matches_eager_compute(rigid_clouds):
    """fused_fit (traced inside the whole-round program) must reproduce the
    eager Feature.compute exactly — same key/params, same mixture."""
    import jax.numpy as jnp

    from probreg_tpu import features as ft

    src, _, _ = rigid_clouds
    x = jnp.asarray(src, jnp.float32)

    gmm = ft.GMM(64, em_iters=10)
    gmm.init()
    mu_e, phi_e = gmm.compute(x)
    mu_f, phi_f = ft.GMM.fused_fit(
        x, gmm.fused_static(x.shape[0]), gmm.fused_dynamic())
    np.testing.assert_allclose(np.asarray(mu_e), np.asarray(mu_f), atol=1e-6)
    np.testing.assert_allclose(np.asarray(phi_e), np.asarray(phi_f), atol=1e-6)

    svm = ft.OneClassSVM(3, sigma=0.5)
    mu_e, phi_e = svm.compute(x)
    mu_f, phi_f = ft.OneClassSVM.fused_fit(
        x, svm.fused_static(x.shape[0]), svm.fused_dynamic())
    np.testing.assert_allclose(np.asarray(mu_e), np.asarray(mu_f), atol=1e-6)
    np.testing.assert_allclose(np.asarray(phi_e), np.asarray(phi_f), atol=1e-5)


def test_fused_round_matches_eager_round(rigid_clouds):
    """The fused one-dispatch round and the eager 3-dispatch round are the
    same program; the recovered optima must agree."""
    import jax.numpy as jnp

    src, tgt, ang = rigid_clouds
    fused = l2dist_regs.RigidGMMReg(src, n_gmm_components=200)
    res_f = fused.registration(tgt)
    rec_f = np.asarray(se3_op.mat2euler(res_f.rot))

    # Replay the round eagerly: same feature key (counter=1), separate
    # dispatches through the cached per-class optimizer program. The
    # rigid registration runs in the shared-centroid frame, so the
    # replay must center identically (rotations are frame invariant;
    # the BFGS trajectory is not).
    cen = ((np.asarray(src, np.float64).mean(0) * len(tgt)
            + np.asarray(tgt, np.float64).mean(0) * len(src))
           / (len(src) + len(tgt)))
    src_c = (np.asarray(src, np.float64) - cen).astype(np.float32)
    tgt_c = (np.asarray(tgt, np.float64) - cen).astype(np.float32)
    eager = l2dist_regs.RigidGMMReg(src_c, n_gmm_components=200)
    eager._feature_gen.init()
    mu_s, phi_s = eager._feature_gen.compute(src_c)
    mu_t, phi_t = eager._feature_gen.compute(tgt_c)
    opt = eager._jax_optimizer(50, 1.0e-3)
    rx, _ = opt(jnp.asarray(eager._cost_fn.initial(), jnp.float32),
                mu_s, phi_s, mu_t, phi_t,
                jnp.asarray(eager._sigma, jnp.float32))
    res_e = eager._cost_fn.to_transformation(np.asarray(rx, np.float64))
    rec_e = np.asarray(se3_op.mat2euler(res_e.rot))

    np.testing.assert_allclose(rec_f, ang, atol=1e-1)
    np.testing.assert_allclose(rec_f, rec_e, atol=1e-3)
    np.testing.assert_allclose(np.asarray(res_f.t), np.asarray(res_e.t),
                               atol=1e-3)


def test_svr_nonrigid_2d_smoke():
    src = _fixtures.fish_source()
    tgt = _fixtures.fish_target()
    res = l2dist_regs.registration_svr(src, tgt, "nonrigid",
                                       opt_maxiter=30)
    moved = np.asarray(res.transform(src))
    before = float(np.mean(np.min(
        ((src[:, None] - tgt[None]) ** 2).sum(-1), axis=1)))
    after = float(np.mean(np.min(
        ((moved[:, None] - tgt[None]) ** 2).sum(-1), axis=1)))
    assert after < before, (before, after)


def test_multistart_recovers_large_rotation(rigid_clouds):
    """Identity-start BFGS falls into a local minimum at 150 deg; the
    vmapped orientation-grid restarts (n_starts) recover it."""
    src, _, _ = rigid_clouds
    ang = np.asarray([0.0, 0.0, np.deg2rad(150.0)])
    rot = np.asarray(se3_op.euler2mat(*ang), np.float32)
    tgt = src @ rot.T

    multi = l2dist_regs.registration_gmmreg(src, tgt, n_gmm_components=150,
                                            n_starts=10)
    err_multi = float(np.asarray(
        se3_op.rotation_angle(multi.rot, rot)))
    assert err_multi < np.deg2rad(5.0), err_multi

    single = l2dist_regs.registration_gmmreg(src, tgt, n_gmm_components=150)
    err_single = float(np.asarray(
        se3_op.rotation_angle(single.rot, rot)))
    assert err_single > err_multi
