"""Coarse-to-fine pyramid registration tests.

The pyramid must match the flat registration's quality (it ends on the
same full-resolution clouds) while running its full-resolution iterations
warm-started. Reference anchor: the manual downsampling the reference
makes its users do, /root/reference/examples/utils.py:20,51-52.
"""

import numpy as np
import pytest

from probreg_tpu import cpd, pyramid
from probreg_tpu import se3_op as so
from probreg_tpu import transformation as tf


def _dense_cloud(rng, n=20000):
    """Blobby closed surface with ~n points (dense enough for 3 levels)."""
    from probreg_tpu.utils.datagen import blobby_surface

    return blobby_surface(n, seed=int(rng.integers(0, 2 ** 31)))


@pytest.fixture
def dense_pair(rng):
    source = _dense_cloud(rng)
    rot = np.asarray(so.euler2mat(*rng.uniform(0.0, np.pi / 6, 3)))
    t_gt = np.array([0.05, -0.03, 0.08], np.float32)
    target = np.asarray(
        tf.RigidTransformation(rot, t_gt).transform(source))
    return source, target, rot, t_gt


def test_auto_voxel_sizes_schedule(dense_pair):
    source, target, _, _ = dense_pair
    sizes = pyramid.auto_voxel_sizes(source, target, levels=3,
                                     coarse_points=1500, factor=4.0)
    assert len(sizes) == 3
    assert sizes[-1] == 0.0
    assert sizes[0] > sizes[1] > 0.0
    coarse = pyramid.build_pyramid(source, sizes)[0]
    # Auto-fit should land within ~2x of the requested coarse size.
    assert 500 <= coarse.shape[0] <= 5000


def test_auto_voxel_sizes_small_cloud_runs_flat(rng):
    src = rng.random((100, 3)).astype(np.float32)
    assert pyramid.auto_voxel_sizes(src, src, levels=3,
                                    coarse_points=3000) == [0.0]


def test_pyramid_rigid_matches_flat_quality(dense_pair):
    source, target, rot_gt, t_gt = dense_pair
    res = pyramid.registration_cpd_pyramid(
        source, target, "rigid", levels=3, coarse_points=1500, tol=1e-4)
    angle = float(so.rotation_angle(np.asarray(res.transformation.rot), rot_gt))
    assert angle < 1e-3
    assert np.allclose(np.asarray(res.transformation.t), t_gt, atol=1e-4)
    assert np.isclose(float(res.transformation.scale), 1.0, atol=1e-3)


def test_pyramid_affine(dense_pair, rng):
    source = dense_pair[0][:8000]
    b = np.eye(3, dtype=np.float32) + 0.08 * rng.normal(size=(3, 3)).astype(np.float32)
    t_gt = 0.04 * rng.normal(size=3).astype(np.float32)
    target = source @ b.T + t_gt
    res = pyramid.registration_cpd_pyramid(
        source, target, "affine", levels=2, coarse_points=1500)
    assert np.allclose(np.asarray(res.transformation.b), b, atol=1e-2)
    assert np.allclose(np.asarray(res.transformation.t), t_gt, atol=1e-2)


def test_pyramid_explicit_voxel_sizes_and_level_maxiters(dense_pair):
    source, target, rot_gt, _ = dense_pair
    res = pyramid.registration_cpd_pyramid(
        source, target, "rigid", voxel_sizes=[0.15, 0.0],
        level_maxiters=[50, 10])
    angle = float(so.rotation_angle(np.asarray(res.transformation.rot), rot_gt))
    # Only 10 polish iterations at full resolution — this checks the
    # explicit-knob plumbing, not converged precision (that's the
    # matches-flat-quality test above).
    assert angle < 2e-3


def test_pyramid_rejects_nonrigid_and_managed_kwargs(dense_pair):
    source, target, _, _ = dense_pair
    with pytest.raises(ValueError):
        pyramid.registration_cpd_pyramid(source, target, "nonrigid")
    with pytest.raises(ValueError):
        pyramid.registration_cpd_pyramid(
            source, target, "rigid", tf_init_params={"rot": np.eye(3)})


def test_pyramid_filterreg(dense_pair):
    source, target, rot_gt, t_gt = dense_pair
    res = pyramid.registration_filterreg_pyramid(
        source[:6000], np.asarray(
            tf.RigidTransformation(rot_gt, t_gt).transform(source[:6000])),
        levels=2, coarse_points=1500, maxiter=60, sigma2_decay=0.9)
    angle = float(so.rotation_angle(np.asarray(res.transformation.rot), rot_gt))
    assert angle < 2e-2
    assert np.allclose(np.asarray(res.transformation.t), t_gt, atol=1e-2)


def test_sigma2_init_flat_entry(dense_pair):
    """sigma2_init is also a public registration_cpd kwarg (warm start)."""
    source, target, rot_gt, _ = dense_pair
    src = source[:3000]
    tgt = target[:3000]
    res0 = cpd.registration_cpd(src, tgt)
    res = cpd.registration_cpd(
        src, tgt,
        tf_init_params={"rot": np.asarray(res0.transformation.rot),
                        "t": np.asarray(res0.transformation.t)},
        sigma2_init=float(np.asarray(res0.sigma2)) * 4.0)
    angle = float(so.rotation_angle(np.asarray(res.transformation.rot), rot_gt))
    assert angle < 1e-2


def test_pyramid_nonrigid_lowrank(rng):
    """Low-rank nonrigid pyramid: the coarse displacement field is
    interpolated down and projected onto each finer level's Nystrom basis;
    quality must match the flat low-rank registration."""
    n = 6000
    source = _dense_cloud(rng, n)
    target = (source + 0.12 * np.sin(1.5 * source[:, ::-1])).astype(np.float32)

    flat = cpd.registration_cpd(source, target, "nonrigid", rank=40,
                                beta=1.0, lmd=2.0, maxiter=40)
    moved_f = np.asarray(flat.transformation.transform(source))
    rmse_flat = np.sqrt(((moved_f - target) ** 2).sum(1)).mean()

    res = pyramid.registration_cpd_pyramid(
        source, target, "nonrigid", rank=40, beta=1.0, lmd=2.0,
        levels=2, coarse_points=1200, maxiter=40)
    moved = np.asarray(res.transformation.transform(source))
    rmse = np.sqrt(((moved - target) ** 2).sum(1)).mean()
    rmse0 = np.sqrt(((source - target) ** 2).sum(1)).mean()
    # The pyramid must at least MATCH the flat run — measured it beats it
    # ~3x here (0.041 vs 0.124; the coarse level converges where the flat
    # start temperature stalls) — and make real progress on the residual.
    assert rmse < 0.5 * rmse0
    assert rmse <= rmse_flat + 1e-4


def test_pyramid_nonrigid_requires_rank(rng):
    src = rng.random((100, 3)).astype(np.float32)
    with pytest.raises(ValueError):
        pyramid.registration_cpd_pyramid(src, src, "nonrigid")


def test_nonrigid_v_init_warm_start(rng):
    """v_init + sigma2_init (the pyramid's warm-start pair) project an
    initial displacement field onto the Nystrom basis and start EM in the
    annealed regime: 5 warm iterations must land orders of magnitude
    tighter than 5 cold ones (measured 1.3e-4 vs 0.24 mean residual).
    v_init alone is inert — the diffuse first E-step at the default
    start temperature overwrites any field."""
    n = 500
    src = rng.random((n, 3)).astype(np.float32)
    disp = 0.1 * np.sin(2.0 * src[:, ::-1]).astype(np.float32)
    tgt = src + disp
    warm = cpd.registration_cpd(src, tgt, "nonrigid", rank=40, beta=1.0,
                                lmd=2.0, maxiter=5, v_init=disp,
                                sigma2_init=1e-3)
    cold = cpd.registration_cpd(src, tgt, "nonrigid", rank=40, beta=1.0,
                                lmd=2.0, maxiter=5)
    mw = np.asarray(warm.transformation.transform(src))
    mc = np.asarray(cold.transformation.transform(src))
    rw = np.sqrt(((mw - tgt) ** 2).sum(1)).mean()
    rc = np.sqrt(((mc - tgt) ** 2).sum(1)).mean()
    r0 = np.sqrt(((src - tgt) ** 2).sum(1)).mean()
    assert rw < 0.05 * r0
    assert rw < 0.1 * rc


def test_pyramid_sharded_mesh(dense_pair):
    """mesh= pyramid: every level runs through the sharded runner with the
    same warm starts; results match the single-device pyramid."""
    from probreg_tpu import parallel

    source, target, rot_gt, t_gt = dense_pair
    src, tgt = source[:30000], target[:30000]
    res_flat = pyramid.registration_cpd_pyramid(
        src, tgt, "rigid", levels=2, coarse_points=1500, tol=1e-6)
    res_mesh = pyramid.registration_cpd_pyramid(
        src, tgt, "rigid", levels=2, coarse_points=1500, tol=1e-6,
        mesh=parallel.make_mesh())
    np.testing.assert_allclose(np.asarray(res_mesh.transformation.rot),
                               np.asarray(res_flat.transformation.rot),
                               atol=1e-4)
    ang = float(so.rotation_angle(
        np.asarray(res_mesh.transformation.rot), rot_gt))
    assert ang < 1e-3
    assert np.allclose(np.asarray(res_mesh.transformation.t), t_gt,
                       atol=1e-4)
    with pytest.raises(ValueError):
        pyramid.registration_cpd_pyramid(
            src, tgt, "nonrigid", rank=16, mesh=parallel.make_mesh())


def _nn_rmse(a, b):
    d2 = ((a[:, None] - b[None]) ** 2).sum(-1)
    return float(np.sqrt(d2.min(axis=1).mean()))


def test_pyramid_bcpd_matches_flat_quality(rng):
    """BCPD pyramid: rigid params + interpolated v field + variance carried
    down in raw coordinates; quality must match the flat VI run (scored by
    the NN criterion the algorithm itself optimizes, reference
    bcpd.py:95-99)."""
    from probreg_tpu import bcpd

    source = _dense_cloud(rng, 4000)
    rot = np.asarray(so.euler2mat(*np.deg2rad([8.0, -4.0, 6.0])), np.float32)
    defo = (0.02 * np.sin(3.0 * source[:, :1])
            * np.array([[1.0, 0.5, -0.3]])).astype(np.float32)
    target = ((source + defo) @ rot.T).astype(np.float32)
    base = _nn_rmse(source, target)

    flat = bcpd.registration_bcpd(source, target, maxiter=50, tol=0.0,
                                  lmd=10.0, rank=48)
    rmse_flat = _nn_rmse(np.asarray(flat.transform(source)), target)

    res = pyramid.registration_bcpd_pyramid(
        source, target, maxiter=50, tol=0.0, lmd=10.0, rank=48,
        levels=2, coarse_points=1000)
    rmse = _nn_rmse(np.asarray(res.transform(source)), target)
    # The blobby surface under an 8-deg rotation is a hard BCPD case (the
    # combined model splits the motion); the flat run itself lands ~0.55x
    # identity here. The pyramid's contract is matching the FLAT result.
    assert rmse < 0.7 * base
    # 1.3x: the post-convergence VI trajectory is chaotic in f32
    # (BENCHMARKS.md) — op-order changes (e.g. the centered sqdist used
    # by the displacement interp) legitimately move both runs a few
    # percent around the optimum.
    assert rmse <= 1.3 * rmse_flat + 1e-5


def test_bcpd_warm_start_resumes_converged_state(rng):
    """Warm-starting registration_bcpd with a converged run's output (in
    raw coordinates) must immediately reproduce that run's quality — the
    best-visited tracking scores the warm state before any VI update."""
    from probreg_tpu import bcpd

    source = _dense_cloud(rng, 1500)
    rot = np.asarray(so.euler2mat(*np.deg2rad([6.0, 3.0, -5.0])), np.float32)
    target = (source @ rot.T + np.float32(0.02)).astype(np.float32)

    full = bcpd.registration_bcpd(source, target, maxiter=50, tol=0.0,
                                  lmd=10.0, rank=48)
    rmse_full = _nn_rmse(np.asarray(full.transform(source)), target)
    rt = full.rigid_trans
    warm = bcpd.registration_bcpd(
        source, target, maxiter=3, tol=0.0, lmd=10.0, rank=48,
        tf_init_params={"rot": np.asarray(rt.rot), "t": np.asarray(rt.t),
                        "scale": float(np.asarray(rt.scale))},
        v_init=np.asarray(full.v), sigma2_init=1e-5)
    rmse_warm = _nn_rmse(np.asarray(warm.transform(source)), target)
    cold = bcpd.registration_bcpd(source, target, maxiter=3, tol=0.0,
                                  lmd=10.0, rank=48)
    rmse_cold = _nn_rmse(np.asarray(cold.transform(source)), target)
    assert rmse_warm <= rmse_full + 1e-6
    assert rmse_warm < rmse_cold


def test_bcpd_pyramid_rejections(rng):
    from probreg_tpu import bcpd, pyramid as pyr

    src = rng.random((100, 3)).astype(np.float32)
    with pytest.raises(ValueError):
        pyr.registration_bcpd_pyramid(src, src, v_init=np.zeros((100, 3)))
    with pytest.raises(ValueError):
        pyr.registration_bcpd_pyramid(src, src, callbacks=[print])
    with pytest.raises(ValueError):
        bcpd.registration_bcpd(src, src, n_starts=4, sigma2_init=0.1)
    with pytest.raises(ValueError):
        bcpd.registration_bcpd(src, src, callbacks=[print],
                               sigma2_init=0.1)


def test_pyramid_gmmtree(dense_pair):
    from probreg_tpu import gmmtree  # noqa: F401  (entry exists)

    source, target, rot_gt, t_gt = dense_pair
    source = source[:6000]
    target = np.asarray(
        tf.RigidTransformation(rot_gt, t_gt).transform(source))
    res = pyramid.registration_gmmtree_pyramid(
        source, target, levels=2, coarse_points=1500, maxiter=20)
    angle = float(so.rotation_angle(np.asarray(res.transformation.rot),
                                    rot_gt))
    assert angle < 5e-2
    assert np.allclose(np.asarray(res.transformation.t), t_gt, atol=5e-2)


def test_pyramid_icp(dense_pair):
    source, target, rot_gt, t_gt = dense_pair
    source = source[:6000]
    rot_small = np.asarray(so.euler2mat(*np.deg2rad([6.0, -4.0, 8.0])),
                           np.float32)
    target = source @ rot_small.T + t_gt
    res = pyramid.registration_icp_pyramid(
        source, target, levels=2, coarse_points=1500, maxiter=40)
    angle = float(so.rotation_angle(np.asarray(res.transformation.rot),
                                    rot_small))
    assert angle < 5e-3  # measured 3.6e-3 on real-TPU f32, ~1e-4 on CPU
    assert np.allclose(np.asarray(res.transformation.t), t_gt, atol=1e-3)


def test_pyramid_gmmtree_icp_reject_managed_kwargs(dense_pair):
    source, target = dense_pair[0][:500], dense_pair[1][:500]
    with pytest.raises(ValueError, match="managed by the pyramid"):
        pyramid.registration_gmmtree_pyramid(
            source, target, tf_init_params={"rot": np.eye(3)})
    with pytest.raises(ValueError, match="managed by the pyramid"):
        pyramid.registration_icp_pyramid(
            source, target, tf_init_params={"rot": np.eye(3)})


def test_bcpd_pyramid_dispatch_chunk(rng):
    # dispatch_chunk slices each level into warm-resumed programs carrying
    # the FULL final VI iterate (tf, v, sigma2, alpha, diag(Sigma)); only
    # the per-program best-visited-state selection can differ, so the
    # final registration quality must match the unchunked run.
    from probreg_tpu.utils.datagen import blobby_surface

    src = blobby_surface(3000, seed=5).astype(np.float32)
    rot = np.asarray(so.euler2mat(*np.deg2rad([8.0, -4.0, 6.0])), np.float32)
    defo = (0.02 * np.sin(3.0 * src[:, :1])
            * np.array([[1.0, 0.5, -0.3]])).astype(np.float32)
    tgt = ((src + defo) @ rot.T).astype(np.float32)

    def nn_rmse(a, b):
        d2 = ((a[:, None] - b[None]) ** 2).sum(-1)
        return float(np.sqrt(d2.min(1).mean()))

    full = pyramid.registration_bcpd_pyramid(
        src, tgt, maxiter=30, tol=0.0, lmd=10.0, rank=16, levels=2,
        coarse_points=800)
    chunked = pyramid.registration_bcpd_pyramid(
        src, tgt, maxiter=30, tol=0.0, lmd=10.0, rank=16, levels=2,
        coarse_points=800, dispatch_chunk=7)
    r_full = nn_rmse(np.asarray(full.transform(src)), tgt)
    r_chunk = nn_rmse(np.asarray(chunked.transform(src)), tgt)
    base = nn_rmse(src, tgt)
    assert r_chunk < 0.6 * base
    assert r_chunk < 2.0 * r_full + 1e-3


def test_cpd_pyramid_dispatch_chunk(dense_pair):
    # CPD's result is its final EM iterate, so sliced dispatch resumes
    # exactly: same recovered transform as the single-program run.
    source, target, rot_gt, t_gt = dense_pair
    source, target = source[:5000], np.asarray(
        tf.RigidTransformation(rot_gt, t_gt).transform(source[:5000]))
    full = pyramid.registration_cpd_pyramid(
        source, target, "rigid", levels=2, coarse_points=1000, tol=0.0)
    chunked = pyramid.registration_cpd_pyramid(
        source, target, "rigid", levels=2, coarse_points=1000, tol=0.0,
        dispatch_chunk=7)
    np.testing.assert_allclose(np.asarray(chunked.transformation.rot),
                               np.asarray(full.transformation.rot),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(chunked.transformation.t),
                               np.asarray(full.transformation.t), atol=1e-5)


def test_bcpd_pyramid_on_2d_mesh(rng):
    # mesh= routes every level through registration_bcpd_2d with the same
    # raw-frame carries; quality must match the single-device pyramid.
    import jax

    from probreg_tpu.parallel import sharded2d
    from probreg_tpu.utils.datagen import blobby_surface

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices (CPU runs force 8 virtual)")
    src = blobby_surface(2500, seed=11).astype(np.float32)
    rot = np.asarray(so.euler2mat(*np.deg2rad([8.0, -4.0, 6.0])), np.float32)
    defo = (0.02 * np.sin(3.0 * src[:, :1])
            * np.array([[1.0, 0.5, -0.3]])).astype(np.float32)
    tgt = ((src + defo) @ rot.T).astype(np.float32)

    def nn_rmse(a, b):
        d2 = ((a[:, None] - b[None]) ** 2).sum(-1)
        return float(np.sqrt(d2.min(1).mean()))

    mesh = sharded2d.make_mesh_2d(2, 4)
    single = pyramid.registration_bcpd_pyramid(
        src, tgt, maxiter=30, tol=0.0, lmd=10.0, rank=16, levels=2,
        coarse_points=800)
    meshed = pyramid.registration_bcpd_pyramid(
        src, tgt, maxiter=30, tol=0.0, lmd=10.0, rank=16, levels=2,
        coarse_points=800, mesh=mesh)
    base = nn_rmse(src, tgt)
    r_single = nn_rmse(np.asarray(single.transform(src)), tgt)
    r_mesh = nn_rmse(np.asarray(meshed.transform(src)), tgt)
    assert r_mesh < 0.7 * base
    assert r_mesh < 1.5 * r_single + 1e-3

    with pytest.raises(ValueError, match="dispatch_chunk"):
        pyramid.registration_bcpd_pyramid(
            src, tgt, rank=16, mesh=mesh, dispatch_chunk=5)
    with pytest.raises(ValueError, match="rank"):
        pyramid.registration_bcpd_pyramid(src, tgt, mesh=mesh)


def test_dispatch_chunk_all_families(dense_pair):
    # FilterReg / GMMTree / ICP sliced dispatch resumes exactly (last
    # iterate + tf carry; FilterReg also resumes the annealed sigma2).
    source = dense_pair[0][:4000]
    rot = np.asarray(so.euler2mat(*np.deg2rad([6.0, -4.0, 8.0])),
                     np.float32)
    t_gt = np.array([0.03, -0.02, 0.04], np.float32)
    target = source @ rot.T + t_gt

    full_f = pyramid.registration_filterreg_pyramid(
        source, target, levels=2, coarse_points=1000, tol=0.0)
    sl_f = pyramid.registration_filterreg_pyramid(
        source, target, levels=2, coarse_points=1000, tol=0.0,
        dispatch_chunk=4)
    np.testing.assert_allclose(np.asarray(sl_f.transformation.rot),
                               np.asarray(full_f.transformation.rot),
                               atol=1e-5)

    full_i = pyramid.registration_icp_pyramid(
        source, target, levels=2, coarse_points=1000, tol=0.0)
    sl_i = pyramid.registration_icp_pyramid(
        source, target, levels=2, coarse_points=1000, tol=0.0,
        dispatch_chunk=7)
    np.testing.assert_allclose(np.asarray(sl_i.transformation.rot),
                               np.asarray(full_i.transformation.rot),
                               atol=1e-5)

    sl_g = pyramid.registration_gmmtree_pyramid(
        source, target, levels=2, coarse_points=1000, maxiter=20,
        dispatch_chunk=6)
    angle = float(so.rotation_angle(np.asarray(sl_g.transformation.rot),
                                    rot))
    assert angle < 5e-2
    with pytest.raises(ValueError, match="n_starts"):
        pyramid.registration_gmmtree_pyramid(
            source, target, dispatch_chunk=5, n_starts=4)


def test_filterreg_pyramid_on_mesh(dense_pair):
    # mesh= FilterReg pyramid: 1-axis and 2-axis meshes, tf + sigma2
    # carries through the sharded runners; quality matches single-device.
    import jax

    from probreg_tpu.parallel import sharded, sharded2d

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices (CPU runs force 8 virtual)")
    source = dense_pair[0][:4000]
    rot = np.asarray(so.euler2mat(*np.deg2rad([6.0, -4.0, 8.0])),
                     np.float32)
    t_gt = np.array([0.03, -0.02, 0.04], np.float32)
    target = source @ rot.T + t_gt

    kw = dict(levels=2, coarse_points=1000, tol=0.0, sigma2_decay=0.9)
    for mesh in (sharded.make_mesh(), sharded2d.make_mesh_2d(2, 4)):
        res = pyramid.registration_filterreg_pyramid(
            source, target, mesh=mesh, **kw)
        angle = float(so.rotation_angle(
            np.asarray(res.transformation.rot), rot))
        assert angle < 1e-2, (mesh.axis_names, angle)
        assert np.allclose(np.asarray(res.transformation.t), t_gt,
                           atol=1e-2)
    with pytest.raises(ValueError, match="dispatch_chunk"):
        pyramid.registration_filterreg_pyramid(
            source, target, mesh=sharded.make_mesh(), dispatch_chunk=5)


def test_pyramid_level_maxiter_zero(dense_pair):
    # A 0 entry in level_maxiters runs one maxiter=0 program (the
    # warm-start state) instead of crashing on a skipped level.
    source = dense_pair[0][:1500]
    rot = np.asarray(so.euler2mat(*np.deg2rad([4.0, -2.0, 6.0])),
                     np.float32)
    target = source @ rot.T
    res = pyramid.registration_icp_pyramid(
        source, target, voxel_sizes=[0.2, 0.0], level_maxiters=[0, 40])
    angle = float(so.rotation_angle(np.asarray(res.transformation.rot),
                                    rot))
    assert angle < 5e-3  # measured 1.3e-3 on real-TPU f32
    res2 = pyramid.registration_filterreg_pyramid(
        source, target, voxel_sizes=[0.2, 0.0], level_maxiters=[0, 40],
        sigma2_decay=0.9, tol=0.0)
    angle2 = float(so.rotation_angle(np.asarray(res2.transformation.rot),
                                     rot))
    assert angle2 < 5e-2


def test_cpd_pyramid_n_starts_recovers_large_rotation(dense_pair):
    """n_starts applies to the COARSEST level only: the orientation search
    runs once on the small level, finer levels polish the carried pose.
    A 150-deg rotation is unrecoverable from the identity start (the
    n_starts=1 pyramid lands in the wrong basin) but the multistart
    pyramid must land at ground truth — tight final accuracy proves the
    fine level received the carry (10-25 polish iterations from identity
    could not reach it)."""
    source = dense_pair[0][:5000]
    rot_gt = np.asarray(so.euler2mat(0.0, 0.0, np.deg2rad(150.0)),
                        np.float32)
    t_gt = np.array([0.03, -0.02, 0.04], np.float32)
    target = source @ rot_gt.T + t_gt

    res = pyramid.registration_cpd_pyramid(
        source, target, "rigid", n_starts=4, levels=2, coarse_points=1000,
        tol=0.0)
    angle = float(so.rotation_angle(np.asarray(res.transformation.rot),
                                    rot_gt))
    assert angle < 1e-3
    assert np.allclose(np.asarray(res.transformation.t), t_gt, atol=1e-3)

    cold = pyramid.registration_cpd_pyramid(
        source, target, "rigid", levels=2, coarse_points=1000, tol=0.0)
    angle_cold = float(so.rotation_angle(
        np.asarray(cold.transformation.rot), rot_gt))
    assert angle_cold > 0.5  # identity start cannot recover 150 deg


def test_cpd_pyramid_n_starts_coarsest_level_only(dense_pair, monkeypatch):
    """Contract: level 0 gets the multistart, every finer level gets the
    warm carry instead (n_starts and tf_init_params are mutually
    exclusive in registration_cpd)."""
    from probreg_tpu import cpd as _cpd

    calls = []
    orig = _cpd.registration_cpd

    def spy(src, tgt, *args, **kwargs):
        calls.append({"n_starts": kwargs.get("n_starts", 1),
                      "tf_init": kwargs.get("tf_init_params")})
        return orig(src, tgt, *args, **kwargs)

    monkeypatch.setattr(_cpd, "registration_cpd", spy)
    source = dense_pair[0][:3000]
    rot_gt = np.asarray(so.euler2mat(0.0, 0.0, np.deg2rad(150.0)),
                        np.float32)
    target = source @ rot_gt.T
    pyramid.registration_cpd_pyramid(
        source, target, "rigid", n_starts=4, levels=2, coarse_points=800,
        tol=0.0)
    assert len(calls) == 2
    assert calls[0]["n_starts"] == 4 and not calls[0]["tf_init"]
    assert calls[1]["n_starts"] == 1 and calls[1]["tf_init"]


def test_cpd_pyramid_n_starts_with_dispatch_chunk(dense_pair):
    """The multistart coarsest level runs as one program; dispatch_chunk
    still slices the finer levels (previously this combination crashed
    with 'mutually exclusive')."""
    source = dense_pair[0][:3000]
    rot_gt = np.asarray(so.euler2mat(0.0, 0.0, np.deg2rad(150.0)),
                        np.float32)
    target = source @ rot_gt.T
    res = pyramid.registration_cpd_pyramid(
        source, target, "rigid", n_starts=4, levels=2, coarse_points=800,
        tol=0.0, dispatch_chunk=7)
    angle = float(so.rotation_angle(np.asarray(res.transformation.rot),
                                    rot_gt))
    assert angle < 1e-3
    with pytest.raises(ValueError, match="rigid"):
        pyramid.registration_cpd_pyramid(
            source, target, "affine", n_starts=4)


def test_filterreg_pyramid_n_starts(dense_pair, monkeypatch):
    """FilterReg pyramid multistart: coarsest level only (it previously
    re-multistarted EVERY level, silently discarding the warm carry)."""
    from probreg_tpu import filterreg as _frg

    calls = []
    orig = _frg.registration_filterreg

    def spy(src, tgt, *args, **kwargs):
        calls.append({"n_starts": kwargs.get("n_starts", 1),
                      "tf_init": kwargs.get("tf_init_params")})
        return orig(src, tgt, *args, **kwargs)

    monkeypatch.setattr(_frg, "registration_filterreg", spy)
    source = dense_pair[0][:4000]
    rot_gt = np.asarray(so.euler2mat(0.0, 0.0, np.deg2rad(150.0)),
                        np.float32)
    target = source @ rot_gt.T
    res = pyramid.registration_filterreg_pyramid(
        source, target, n_starts=4, levels=2, coarse_points=1000,
        maxiter=60, sigma2_decay=0.9, tol=0.0)
    angle = float(so.rotation_angle(np.asarray(res.transformation.rot),
                                    rot_gt))
    assert angle < 2e-2
    assert len(calls) == 2
    assert calls[0]["n_starts"] == 4 and not calls[0]["tf_init"]
    assert calls[1]["n_starts"] == 1 and calls[1]["tf_init"]


def test_bcpd_pyramid_n_starts(rng):
    """BCPD pyramid multistart (previously raised ValueError at the second
    level): the coarse orientation search composes with the warm-started
    finer levels."""
    from probreg_tpu.utils.datagen import blobby_surface

    src = blobby_surface(1500, seed=7).astype(np.float32)
    rot_gt = np.asarray(so.euler2mat(0.0, 0.0, np.deg2rad(150.0)),
                        np.float32)
    defo = (0.01 * np.sin(3.0 * src[:, :1])
            * np.array([[1.0, 0.5, -0.3]])).astype(np.float32)
    tgt = ((src + defo) @ rot_gt.T).astype(np.float32)

    res = pyramid.registration_bcpd_pyramid(
        src, tgt, maxiter=40, tol=0.0, lmd=10.0, rank=24, levels=2,
        coarse_points=600, n_starts=4)
    base = _nn_rmse(src, tgt)
    rmse = _nn_rmse(np.asarray(res.transform(src)), tgt)
    assert rmse < 0.7 * base
    # The rigid component must be in the RIGHT basin. Without multistart
    # the combined model leaves rot near identity and fakes the 150-deg
    # rotation with the nonrigid field (measured angle error 2.7 rad);
    # the orientation search recovers the true pose to ~0.45 rad (BCPD's
    # v field legitimately absorbs the remaining residual).
    rot_est = np.asarray(res.rigid_trans.rot)
    angle = float(so.rotation_angle(rot_est, rot_gt))
    assert angle < 0.7

    cold = pyramid.registration_bcpd_pyramid(
        src, tgt, maxiter=40, tol=0.0, lmd=10.0, rank=24, levels=2,
        coarse_points=600)
    angle_cold = float(so.rotation_angle(
        np.asarray(cold.rigid_trans.rot), rot_gt))
    assert angle_cold > 2.0  # wrong basin without the orientation search


def test_cpd_pyramid_n_starts_with_mesh(dense_pair):
    """mesh= + n_starts: the coarsest level runs the single-device
    multistart (the sharded runner has no multistart path), finer levels
    shard with the carried pose."""
    from probreg_tpu import parallel

    source = dense_pair[0][:4000]
    rot_gt = np.asarray(so.euler2mat(0.0, 0.0, np.deg2rad(150.0)),
                        np.float32)
    target = source @ rot_gt.T
    res = pyramid.registration_cpd_pyramid(
        source, target, "rigid", n_starts=4, levels=2, coarse_points=800,
        tol=0.0, mesh=parallel.make_mesh())
    angle = float(so.rotation_angle(np.asarray(res.transformation.rot),
                                    rot_gt))
    assert angle < 1e-3


def test_bcpd_pyramid_chunked_tol_stops_and_keeps_best(rng, monkeypatch):
    """With tol > 0 and dispatch_chunk, a converged level stops at a chunk
    boundary (no-improvement monitor) instead of dispatching every
    remaining chunk, and the level result is the best state across ALL
    chunks — the forced >=2-iteration resumes walk the chaotic
    post-convergence VI trajectory, so the last chunk's state can be
    worse than an earlier chunk's (observed at 200k on v5e: identity-level
    rmse without this)."""
    from probreg_tpu import bcpd as _bcpd
    from probreg_tpu.utils.datagen import blobby_surface

    calls = []
    orig = _bcpd._registration_bcpd_impl

    def spy(*args, **kwargs):
        calls.append(kwargs.get("maxiter"))
        return orig(*args, **kwargs)

    monkeypatch.setattr(_bcpd, "_registration_bcpd_impl", spy)

    src = blobby_surface(2000, seed=13).astype(np.float32)
    rot = np.asarray(so.euler2mat(*np.deg2rad([6.0, -3.0, 4.0])), np.float32)
    tgt = (src @ rot.T).astype(np.float32)

    # tol=3e-3: wide enough that the boundary |rmse - rmse_prev| stop
    # fires robustly across op-order changes (the criterion under test
    # is the MECHANISM, not a specific trajectory's noise floor).
    res = pyramid.registration_bcpd_pyramid(
        src, tgt, maxiter=40, tol=3e-3, lmd=10.0, rank=24, levels=2,
        coarse_points=700, dispatch_chunk=4)
    n_chunked_calls = len(calls)
    base = _nn_rmse(src, tgt)
    rmse = _nn_rmse(np.asarray(res.transform(src)), tgt)
    full = pyramid.registration_bcpd_pyramid(
        src, tgt, maxiter=40, tol=3e-3, lmd=10.0, rank=24, levels=2,
        coarse_points=700)
    rmse_full = _nn_rmse(np.asarray(full.transform(src)), tgt)
    assert rmse < 0.6 * base
    assert rmse < 1.3 * rmse_full + 1e-4, (rmse, rmse_full)
    # Early stop fired: strictly fewer programs than the full budget
    # (40/4 + polish(>=10 -> 13)/4 ~ 14 programs without the stop). The
    # boundary-rmse trajectory is backend-dependent (real-TPU f32 wanders
    # slightly more), so the strict count is asserted on CPU only.
    import jax

    full_programs = -(-40 // 4) + -(-max(40 // 3, 10) // 4)
    if jax.default_backend() == "cpu":
        assert n_chunked_calls < full_programs, (n_chunked_calls,
                                                 full_programs)
    else:
        assert n_chunked_calls <= full_programs


def test_bcpd_pyramid_n_starts_with_2d_mesh(rng):
    """mesh= + n_starts for BCPD: the coarsest level runs the
    single-device multistart, finer levels ride the 2-axis mesh with the
    carried pose/field."""
    import jax

    from probreg_tpu.parallel import sharded2d
    from probreg_tpu.utils.datagen import blobby_surface

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices (CPU runs force 8 virtual)")
    src = blobby_surface(1500, seed=7).astype(np.float32)
    rot_gt = np.asarray(so.euler2mat(0.0, 0.0, np.deg2rad(150.0)),
                        np.float32)
    tgt = (src @ rot_gt.T).astype(np.float32)
    res = pyramid.registration_bcpd_pyramid(
        src, tgt, maxiter=40, tol=0.0, lmd=10.0, rank=24, levels=2,
        coarse_points=600, n_starts=4, mesh=sharded2d.make_mesh_2d(2, 4))
    angle = float(so.rotation_angle(np.asarray(res.rigid_trans.rot),
                                    rot_gt))
    rmse = _nn_rmse(np.asarray(res.transform(src)), tgt)
    base = _nn_rmse(src, tgt)
    assert rmse < 0.7 * base
    assert angle < 0.7  # right basin (see test_bcpd_pyramid_n_starts)

def test_level_maxiters_survives_degenerate_auto_schedule(rng):
    """auto_voxel_sizes collapses to ONE level when there is nothing to
    downsample; a user who sized level_maxiters to the `levels` they
    requested must not crash on that data-dependent collapse (review
    finding). The collapsed single level gets the coarse (full) budget."""
    src = _dense_cloud(rng, n=800)          # < coarse_points -> flat
    rot = np.asarray(so.euler2mat(0.0, 0.0, 0.1))
    tgt = np.asarray(tf.RigidTransformation(rot, np.zeros(3)).transform(src))
    res = pyramid.registration_cpd_pyramid(
        src, tgt, "rigid", levels=3, level_maxiters=[40, 20, 10])
    ang = float(so.rotation_angle(np.asarray(res.transformation.rot), rot))
    assert ang < 1e-3
    # An explicit voxel_sizes schedule still requires an exact match.
    with pytest.raises(ValueError, match="level_maxiters"):
        pyramid.registration_cpd_pyramid(
            src, tgt, "rigid", voxel_sizes=[0.05, 0.0],
            level_maxiters=[40, 20, 10])


def test_interp_displacement_bandwidth_is_scale_aware():
    """voxel=0 carries (equal-resolution levels) must use a bandwidth in
    the CLOUD's units: an absolute h=1.0 flattened the field for
    small-extent clouds (review finding)."""
    rng = np.random.default_rng(5)
    # Millimeter-scale cloud (extent ~0.1) with a displacement field that
    # VARIES across the cloud; a flat kernel smears it to its mean.
    pts = rng.uniform(0.0, 0.1, size=(400, 3)).astype(np.float32)
    disp = np.stack([np.sin(20.0 * pts[:, 0]),
                     np.cos(20.0 * pts[:, 1]),
                     pts[:, 2] * 5.0], axis=1).astype(np.float32)
    out = pyramid._interp_displacement(pts, disp, pts, 0.0)
    err = float(np.abs(out - disp).max())
    smear = float(np.abs(disp - disp.mean(0)).max())
    # The old absolute h=1.0 returned ~the field mean (err ~= smear).
    assert err < 0.3 * smear, (err, smear)


def test_filterreg_pyramid_mesh_rejects_unsupported_kwargs(rng):
    """kwargs valid on the single-device path but not implemented by the
    sharded runner must fail with a clear upfront ValueError, not a
    TypeError from inside the first sharded level (review finding)."""
    from probreg_tpu import parallel

    src = _dense_cloud(rng, n=5000)
    with pytest.raises(ValueError, match="does not support"):
        pyramid.registration_filterreg_pyramid(
            src, src, mesh=parallel.make_mesh(), estep_method="lattice")

def test_bcpd_pyramid_multistart_carries_sigma2(rng):
    """The multistart coarsest level must hand its WINNER's variance to the
    next level — dropping it (review finding) re-ran the dense
    start-temperature annealing the pyramid exists to skip."""
    from probreg_tpu import bcpd as _bcpd

    src = _dense_cloud(rng, n=6000)
    rot = np.asarray(so.euler2mat(0.0, 0.0, np.deg2rad(120.0)))
    tgt = np.asarray(tf.RigidTransformation(rot, np.zeros(3)).transform(src))

    seen = []
    orig = _bcpd._registration_bcpd_impl

    def spy(*args, **kwargs):
        seen.append(dict(kwargs))
        return orig(*args, **kwargs)

    _bcpd._registration_bcpd_impl, saved = spy, orig
    try:
        pyramid.registration_bcpd_pyramid(
            src, tgt, maxiter=20, tol=0.0, rank=16, lmd=1e3, levels=2,
            coarse_points=800, n_starts=4)
    finally:
        _bcpd._registration_bcpd_impl = saved
    assert seen[0].get("n_starts") == 4
    finer = [kw for kw in seen[1:] if kw.get("n_starts", 1) == 1]
    assert finer, seen
    s2 = finer[0].get("sigma2_init")
    assert s2 is not None and np.isfinite(s2) and s2 > 0.0, s2
