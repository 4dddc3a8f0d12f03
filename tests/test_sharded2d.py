"""2-D mesh (source x target sharded) CPD tests on the virtual 8-device mesh.

The 2-D path's posterior normalizer den_j spans every source shard
(psum over the m-axis) — these tests pin the VERDICT round-2 requirement:
2x4-mesh results match the 1-D mesh and the single-device registration.
"""

import jax
import numpy as np
import pytest

from probreg_tpu import cpd
from probreg_tpu.parallel import sharded, sharded2d
from probreg_tpu.utils import se3_op

if jax.device_count() < 8:
    # The 2-D (m, n) mesh needs 8 devices; the real-chip suite run has
    # exactly one (the virtual mesh comes from conftest's CPU flags).
    pytest.skip("2-D mesh tests need >= 8 devices",
                allow_module_level=True)


@pytest.fixture
def mesh2d():
    return sharded2d.make_mesh_2d(2, 4)


@pytest.fixture
def rigid_pair(horse_cloud, rng):
    src = np.asarray(horse_cloud, np.float32)
    rot = np.asarray(se3_op.euler2mat(*rng.uniform(0.0, np.pi / 6, 3)),
                     np.float32)
    t_gt = np.array([0.02, -0.01, 0.03], np.float32)
    tgt = (src @ rot.T + t_gt).astype(np.float32)
    return src, tgt, rot, t_gt


def test_make_mesh_2d_shapes():
    m = sharded2d.make_mesh_2d()
    assert len(m.axis_names) == 2
    assert m.shape["m"] * m.shape["n"] == 8
    m24 = sharded2d.make_mesh_2d(2, 4)
    assert (m24.shape["m"], m24.shape["n"]) == (2, 4)
    with pytest.raises(ValueError):
        sharded2d.make_mesh_2d(3, 4)


@pytest.mark.parametrize("kind", ["rigid", "affine"])
def test_2d_matches_single_device_and_1d(mesh2d, rigid_pair, kind):
    src, tgt, rot, t_gt = rigid_pair
    res_1dev = cpd.registration_cpd(src, tgt, kind, maxiter=30, tol=1e-6)
    res_1d = sharded.registration_cpd_sharded(
        src, tgt, kind, maxiter=30, tol=1e-6, mesh=sharded.make_mesh())
    res_2d = sharded2d.registration_cpd_2d(
        src, tgt, kind, maxiter=30, tol=1e-6, mesh=mesh2d)
    lin = "rot" if kind == "rigid" else "b"
    np.testing.assert_allclose(
        np.asarray(getattr(res_2d.transformation, lin)),
        np.asarray(getattr(res_1dev.transformation, lin)), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(res_2d.transformation.t),
        np.asarray(res_1dev.transformation.t), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(getattr(res_2d.transformation, lin)),
        np.asarray(getattr(res_1d.transformation, lin)), atol=1e-5)
    np.testing.assert_allclose(
        float(res_2d.sigma2), float(res_1dev.sigma2),
        rtol=1e-3, atol=1e-8)


def test_2d_recovers_transform_uneven_sizes(mesh2d, rigid_pair):
    # m=901, n=700: both axes pad (901 % 2 != 0, 700 % 4 == 0 but m != n).
    src, tgt, rot, t_gt = rigid_pair
    src, tgt = src[:901], tgt[:700]
    res = sharded2d.registration_cpd_2d(
        src, tgt, "rigid", w=0.1, maxiter=40, mesh=mesh2d)
    ang = float(se3_op.rotation_angle(
        np.asarray(res.transformation.rot), rot))
    assert ang < 5e-2
    assert np.allclose(np.asarray(res.transformation.t), t_gt, atol=5e-3)


def test_2d_nonrigid_lowrank_matches_single(mesh2d, rng):
    n = 256
    src = rng.random((n, 3)).astype(np.float32)
    tgt = (src + 0.05 * np.sin(3.0 * src[:, :1])).astype(np.float32)
    res_1dev = cpd.registration_cpd(src, tgt, "nonrigid", rank=24,
                                    beta=1.0, lmd=1.0, maxiter=25, tol=1e-9)
    res_2d = sharded2d.registration_cpd_2d(
        src, tgt, "nonrigid", rank=24, beta=1.0, lmd=1.0, maxiter=25,
        tol=1e-9, mesh=mesh2d)
    moved_1 = np.asarray(res_1dev.transformation.transform(src))
    moved_2 = np.asarray(res_2d.transformation.transform(src))
    np.testing.assert_allclose(moved_2, moved_1, atol=1e-4)
    rmse = np.sqrt(((moved_2 - tgt) ** 2).sum(1)).mean()
    rmse0 = np.sqrt(((src - tgt) ** 2).sum(1)).mean()
    assert rmse < 0.2 * rmse0


def test_2d_nonrigid_dense_rejected(mesh2d, rng):
    src = rng.random((64, 3)).astype(np.float32)
    with pytest.raises(ValueError):
        sharded2d.registration_cpd_2d(src, src, "nonrigid", mesh=mesh2d)


def test_registration_cpd_sharded_dispatches_2d(mesh2d, rigid_pair):
    src, tgt, rot, _ = rigid_pair
    res = sharded.registration_cpd_sharded(
        src, tgt, "rigid", maxiter=30, mesh=mesh2d)
    ang = float(se3_op.rotation_angle(
        np.asarray(res.transformation.rot), rot))
    assert ang < 1e-2


def test_2d_culled_stash_matches_dense(mesh2d, rigid_pair):
    """Per-device single-exp stash E-step with the den psum'd over the
    m-axis (interpret-mode kernels) == the dense 2-D path and the
    single-device registration."""
    src, tgt, rot, t_gt = rigid_pair
    res_dense = sharded2d.registration_cpd_2d(
        src, tgt, "rigid", maxiter=30, tol=1e-6, mesh=mesh2d,
        use_culled=False)
    res_culled = sharded2d.registration_cpd_2d(
        src, tgt, "rigid", maxiter=30, tol=1e-6, mesh=mesh2d,
        use_culled=True, culled_interpret=True, culled_tile=128)
    np.testing.assert_allclose(np.asarray(res_culled.transformation.rot),
                               np.asarray(res_dense.transformation.rot),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(res_culled.transformation.t),
                               np.asarray(res_dense.transformation.t),
                               atol=5e-4)
    ang = float(se3_op.rotation_angle(
        np.asarray(res_culled.transformation.rot), rot))
    assert ang < 1e-2


def test_2d_culled_lowrank_unpermutes(mesh2d, rng):
    """Morton-sorted culled low-rank 2-D: the returned transformation's U
    rows must be back in the CALLER's source order (transform positional)."""
    n = 256
    src = rng.random((n, 3)).astype(np.float32)
    tgt = (src + 0.05 * np.sin(3.0 * src[:, :1])).astype(np.float32)
    res_d = sharded2d.registration_cpd_2d(
        src, tgt, "nonrigid", rank=24, beta=1.0, lmd=1.0, maxiter=25,
        tol=1e-9, mesh=mesh2d, use_culled=False)
    res_c = sharded2d.registration_cpd_2d(
        src, tgt, "nonrigid", rank=24, beta=1.0, lmd=1.0, maxiter=25,
        tol=1e-9, mesh=mesh2d, use_culled=True, culled_interpret=True,
        culled_tile=128)
    m_d = np.asarray(res_d.transformation.transform(src))
    m_c = np.asarray(res_c.transformation.transform(src))
    # Same field evaluated in the caller's order (Nystrom landmark draw
    # differs between orderings, so compare registration quality + order
    # coherence rather than bitwise).
    rmse_d = np.sqrt(((m_d - tgt) ** 2).sum(1)).mean()
    rmse_c = np.sqrt(((m_c - tgt) ** 2).sum(1)).mean()
    rmse0 = np.sqrt(((src - tgt) ** 2).sum(1)).mean()
    assert rmse_c < 0.2 * rmse0
    assert rmse_c < 2.0 * rmse_d + 1e-4
    # Row alignment: per-point displacements must be smooth functions of
    # the ORIGINAL points (scrambled rows would decorrelate them).
    d_c = m_c - src
    d_true = tgt - src
    corr = np.corrcoef(d_c.ravel(), d_true.ravel())[0, 1]
    assert corr > 0.95, corr


# --------------------------------------------------------------------------
# FilterReg on the 2-D mesh
# --------------------------------------------------------------------------

def test_2d_filterreg_pt2pt_matches_single(mesh2d, rigid_pair):
    from probreg_tpu import filterreg
    from probreg_tpu.parallel import sharded as sh

    src, tgt, rot, t_gt = rigid_pair
    res_1dev = filterreg.registration_filterreg(
        src, tgt, maxiter=30, tol=1e-6, sigma2_decay=0.9)
    res_1d = sh.registration_filterreg_sharded(
        src, tgt, maxiter=30, tol=1e-6, sigma2_decay=0.9,
        mesh=sh.make_mesh())
    res_2d = sharded2d.registration_filterreg_2d(
        src, tgt, maxiter=30, tol=1e-6, sigma2_decay=0.9, mesh=mesh2d)
    np.testing.assert_allclose(np.asarray(res_2d.transformation.rot),
                               np.asarray(res_1dev.transformation.rot),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(res_2d.transformation.t),
                               np.asarray(res_1dev.transformation.t),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(res_2d.transformation.rot),
                               np.asarray(res_1d.transformation.rot),
                               atol=1e-5)
    ang = float(se3_op.rotation_angle(
        np.asarray(res_2d.transformation.rot), rot))
    assert ang < 2e-2


def test_2d_filterreg_pt2pl_uneven(mesh2d, rigid_pair):
    """pt2pl on the 2-D mesh with padding on both axes; PCA surface
    normals like the flat pt2pl test (test_filterreg.py)."""
    from test_filterreg import estimate_normals_pca

    from probreg_tpu import filterreg

    src, tgt, rot, t_gt = rigid_pair
    src = src[:901]
    tgt = (src @ rot.T + t_gt).astype(np.float32)
    nrm_t = estimate_normals_pca(tgt)
    res_flat = filterreg.registration_filterreg(
        src, tgt, target_normals=nrm_t, objective_type="pt2pl",
        maxiter=30, tol=1e-6)
    res_2d = sharded2d.registration_filterreg_2d(
        src, tgt, target_normals=nrm_t, objective_type="pt2pl",
        maxiter=30, tol=1e-6, mesh=mesh2d)
    np.testing.assert_allclose(np.asarray(res_2d.transformation.rot),
                               np.asarray(res_flat.transformation.rot),
                               atol=1e-4)
    ang = float(se3_op.rotation_angle(
        np.asarray(res_2d.transformation.rot), rot))
    assert ang < 5e-2


def test_registration_filterreg_sharded_dispatches_2d(mesh2d, rigid_pair):
    from probreg_tpu.parallel import sharded as sh

    src, tgt, rot, t_gt = rigid_pair
    res = sh.registration_filterreg_sharded(
        src[:512], tgt[:512], maxiter=20, mesh=mesh2d)
    ang = float(se3_op.rotation_angle(
        np.asarray(res.transformation.rot), rot))
    assert ang < 5e-2


# --------------------------------------------------------------------------
# BCPD (low-rank) on the 2-D mesh
# --------------------------------------------------------------------------

def _nn_rmse(a, b):
    d2 = ((a[:, None] - b[None]) ** 2).sum(-1)
    return float(np.sqrt(d2.min(axis=1).mean()))


def test_2d_bcpd_matches_single_device(mesh2d, rigid_pair):
    from probreg_tpu import bcpd

    src, tgt, rot, t_gt = rigid_pair
    src = src[:600]
    tgt = (src @ rot.T + t_gt).astype(np.float32)
    res_1dev = bcpd.registration_bcpd(src, tgt, maxiter=40, tol=0.0,
                                      lmd=10.0, rank=32)
    res_2d = sharded2d.registration_bcpd_2d(src, tgt, maxiter=40, tol=0.0,
                                            lmd=10.0, rank=32, mesh=mesh2d)
    m1 = np.asarray(res_1dev.transform(src))
    m2 = np.asarray(res_2d.transform(src))
    base = _nn_rmse(src, tgt)
    assert _nn_rmse(m2, tgt) < 0.5 * base
    # Same VI math, different reduction order: the trajectories agree to
    # f32 collective-reduction tolerance.
    assert abs(_nn_rmse(m2, tgt) - _nn_rmse(m1, tgt)) < 0.1 * base


def test_2d_bcpd_uneven_padding(mesh2d, rigid_pair):
    from probreg_tpu.parallel import sharded as sh

    src, tgt, rot, t_gt = rigid_pair
    src_u = src[:601]                      # pads the m axis (601 % 2 != 0)
    tgt_u = (src_u @ rot.T + t_gt).astype(np.float32)[:555]  # pads n
    res = sharded2d.registration_bcpd_2d(src_u, tgt_u, maxiter=40, tol=0.0,
                                         lmd=10.0, rank=32, mesh=mesh2d)
    moved = np.asarray(res.transform(src_u))
    assert _nn_rmse(moved, tgt_u) < 0.5 * _nn_rmse(src_u, tgt_u)
    # Dispatch from the 1-D entry point (requires rank on a 2-D mesh).
    res_d = sh.registration_bcpd_sharded(src_u, tgt_u, maxiter=20,
                                         lmd=10.0, rank=32, mesh=mesh2d)
    assert _nn_rmse(np.asarray(res_d.transform(src_u)), tgt_u) \
        < 0.7 * _nn_rmse(src_u, tgt_u)
    with pytest.raises(ValueError):
        sh.registration_bcpd_sharded(src_u, tgt_u, mesh=mesh2d, rank=None)

def test_2d_bcpd_tf_only_warm_start_matches_single_device(mesh2d,
                                                          rigid_pair):
    """A raw-frame pose warm start WITHOUT a displacement field must mean
    the same transform (x = s R y + t, v_raw = 0) on both entry points —
    the single-device path used to start at s R (y - centroid) + t for
    off-center clouds (review finding)."""
    from probreg_tpu import bcpd

    src, tgt, rot, t_gt = rigid_pair
    src = (src[:600] + np.array([3.0, -2.0, 5.0],
                                np.float32))   # far off-center
    tgt = (src @ rot.T + t_gt).astype(np.float32)
    warm = {"rot": rot, "t": t_gt}
    res_1dev = bcpd.registration_bcpd(src, tgt, maxiter=8, tol=0.0,
                                      lmd=10.0, rank=32,
                                      tf_init_params=dict(warm))
    res_2d = sharded2d.registration_bcpd_2d(src, tgt, maxiter=8, tol=0.0,
                                            lmd=10.0, rank=32, mesh=mesh2d,
                                            tf_init_params=dict(warm))
    m1 = np.asarray(res_1dev.transform(src))
    m2 = np.asarray(res_2d.transform(src))
    base = _nn_rmse(src, tgt)
    # Both start AT the true pose: neither may wander off it in 8 warm
    # iterations, and the two trajectories must agree.
    assert _nn_rmse(m1, tgt) < 0.05 * base
    assert _nn_rmse(m2, tgt) < 0.05 * base
    assert abs(_nn_rmse(m2, tgt) - _nn_rmse(m1, tgt)) < 0.02 * base
