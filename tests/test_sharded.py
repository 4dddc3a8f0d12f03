"""Distributed tier (SURVEY.md §4): 8-virtual-device CPU mesh.

Asserts the sharded E-step psum equals the single-device result and that the
sharded EM recovers a known rigid transform.
"""

import jax
import jax.numpy as jnp
import numpy as np

import _fixtures
import pytest

from probreg_tpu import cpd
from probreg_tpu.ops import estep as estep_ops
from probreg_tpu.parallel import sharded
from probreg_tpu.utils import se3_op


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh (8 virtual CPU devices)")
    return sharded.make_mesh()


def test_sharded_estep_matches_single_device(mesh, rng):
    m, n, d = 120, 203, 3  # n deliberately not divisible by 8
    src = rng.normal(size=(m, d)).astype(np.float32)
    tgt = rng.normal(size=(n, d)).astype(np.float32)
    sigma2 = jnp.asarray(0.5, jnp.float32)

    ref = estep_ops.estep_xla(src, tgt, sigma2, w=0.1)
    tgt_sh, mask_sh, n_true = sharded.shard_points(tgt, mesh)
    assert n_true == n
    mom = sharded.estep_sharded(jnp.asarray(src), tgt_sh, mask_sh, sigma2, 0.1, n, mesh)

    np.testing.assert_allclose(np.asarray(mom.pt1)[:n], np.asarray(ref.pt1), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mom.p1), np.asarray(ref.p1), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mom.px), np.asarray(ref.px), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(mom.n_p), float(ref.n_p), rtol=1e-5)
    np.testing.assert_allclose(float(mom.xx), float(ref.xx), rtol=1e-5)


def test_sharded_rigid_registration_recovers_transform(mesh, horse_cloud):
    src = np.asarray(horse_cloud, dtype=np.float32)
    ang = np.deg2rad([10.0, -5.0, 8.0])
    rot = se3_op.euler2mat(*ang)
    tgt = src @ np.asarray(rot).T

    res = sharded.registration_cpd_sharded(src, tgt, "rigid", maxiter=50, tol=1e-4)
    rec = np.asarray(se3_op.mat2euler(res.transformation.rot))
    np.testing.assert_allclose(rec, ang, atol=2e-2)
    np.testing.assert_allclose(np.asarray(res.transformation.t), 0.0, atol=1e-3)

    # Matches the unsharded path.
    ref = cpd.registration_cpd(src, tgt, "rigid", maxiter=50, tol=1e-4)
    np.testing.assert_allclose(
        np.asarray(res.transformation.rot), np.asarray(ref.transformation.rot), atol=1e-4
    )


def test_sharded_nonrigid_runs(mesh, rng):
    src = rng.normal(size=(60, 2)).astype(np.float32) * 0.3
    tgt = src + 0.05 * np.sin(src[:, :1] * 3.0)
    res = sharded.registration_cpd_sharded(src, tgt, "nonrigid", maxiter=20, tol=1e-6)
    moved = np.asarray(res.transformation._transform(jnp.asarray(src)))
    before = np.linalg.norm(src - tgt)
    after = np.linalg.norm(moved - tgt)
    assert after < 0.5 * before


def test_sharded_nonrigid_lowrank_matches_single(mesh, rng):
    from probreg_tpu import cpd

    src = rng.normal(size=(60, 2)).astype(np.float32) * 0.3
    tgt = src + 0.05 * np.sin(src[:, :1] * 3.0)
    res_sh = sharded.registration_cpd_sharded(
        src, tgt, "nonrigid", maxiter=20, tol=1e-6, rank=20)
    res_single = cpd.registration_cpd(
        src, tgt, tf_type_name="nonrigid", maxiter=20, tol=1e-6, rank=20)
    moved_sh = np.asarray(res_sh.transformation._transform(jnp.asarray(src)))
    moved_single = np.asarray(
        res_single.transformation._transform(jnp.asarray(src)))
    # psum'd moments == single-device moments up to f32 reduction order.
    np.testing.assert_allclose(moved_sh, moved_single, atol=1e-4)
    assert np.linalg.norm(moved_sh - tgt) < 0.5 * np.linalg.norm(src - tgt)


def test_sharded_filterreg_matches_single(mesh, horse_cloud):
    from probreg_tpu import filterreg
    import numpy as np

    src = np.asarray(horse_cloud, dtype=np.float32)
    ang = np.deg2rad([6.0, -3.0, 5.0])
    rot = np.asarray(se3_op.euler2mat(*ang), np.float32)
    tgt = src @ rot.T
    res_sh = sharded.registration_filterreg_sharded(src, tgt, maxiter=30,
                                                    tol=1e-5)
    rec = np.asarray(se3_op.mat2euler(res_sh.transformation.rot))
    np.testing.assert_allclose(rec, ang, atol=2e-1)
    res_single = filterreg.registration_filterreg(src, tgt, maxiter=30,
                                                  tol=1e-5)
    np.testing.assert_allclose(
        np.asarray(res_sh.transformation.rot),
        np.asarray(res_single.transformation.rot), atol=1e-4)


def test_sharded_filterreg_pt2pl_sigma2_init(mesh, rng):
    """pt2pl on the mesh uses the point-spacing sigma2 init (review fix)."""
    import numpy as np
    from probreg_tpu import filterreg

    theta = rng.uniform(0, np.pi, 300)
    phi = rng.uniform(0, 2 * np.pi, 300)
    r = 0.5 * (1.0 + 0.2 * np.sin(3 * theta))
    src = np.stack([r * np.sin(theta) * np.cos(phi),
                    r * np.sin(theta) * np.sin(phi),
                    r * np.cos(theta)], 1).astype(np.float32)
    ang = np.deg2rad([6.0, -3.0, 4.0])
    rot = np.asarray(se3_op.euler2mat(*ang), np.float32)
    tgt = src @ rot.T
    d2 = ((tgt[:, None] - tgt[None]) ** 2).sum(-1)
    idx = np.argsort(d2, axis=1)[:, :10]
    nb = tgt[idx]
    ctr = nb.mean(1, keepdims=True)
    cov = np.einsum("nki,nkj->nij", nb - ctr, nb - ctr)
    _, vecs = np.linalg.eigh(cov)
    normals = vecs[:, :, 0]
    out = tgt - tgt.mean(0)
    sign = np.sign((normals * out).sum(1, keepdims=True))
    sign[sign == 0] = 1
    normals = (normals * sign).astype(np.float32)

    res = sharded.registration_filterreg_sharded(
        src, tgt, target_normals=normals, objective_type="pt2pl",
        maxiter=40, tol=1e-6)
    rec = np.asarray(se3_op.mat2euler(res.transformation.rot))
    np.testing.assert_allclose(rec, ang, atol=1e-1)


def test_batch_sharded_matches_unsharded(mesh, rng):
    """Data-parallel batch axis: sharded over the virtual mesh == plain
    vmapped batch, including non-divisible batch padding."""
    from probreg_tpu import cpd as cpd_mod

    b, m = 5, 40  # b=5 not divisible by 8 devices -> exercises padding
    rots = [np.asarray(se3_op.euler2mat(0.0, 0.0, a), np.float32)
            for a in np.linspace(0.05, 0.3, b)]
    srcs = rng.normal(size=(b, m, 3)).astype(np.float32) * 0.3
    tgts = np.stack([s @ r.T for s, r in zip(srcs, rots)])
    res_sh = sharded.registration_cpd_batch_sharded(
        srcs, tgts, maxiter=30, tol=1e-6, mesh=mesh)
    res_plain = cpd_mod.registration_cpd_batch(srcs, tgts, maxiter=30, tol=1e-6)
    assert len(res_sh) == b
    for a, c, r in zip(res_sh, res_plain, rots):
        np.testing.assert_allclose(
            np.asarray(a.transformation.rot), np.asarray(c.transformation.rot),
            atol=1e-5)
        np.testing.assert_allclose(np.asarray(a.transformation.rot), r,
                                   atol=1e-2)


def test_batch_sharded_ragged_matches_unsharded(mesh, rng):
    """RAGGED data-parallel batch: lists of different-size clouds sharded
    over the mesh == the plain masked ragged batch == per-pair results."""
    from probreg_tpu import cpd as cpd_mod

    sizes = [(40, 55), (32, 40), (48, 61)]
    rots = [np.asarray(se3_op.euler2mat(0.0, 0.0, a), np.float32)
            for a in np.linspace(0.05, 0.25, len(sizes))]
    srcs = [rng.normal(size=(m, 3)).astype(np.float32) * 0.3
            for m, _ in sizes]
    tgts = [np.concatenate([s @ r.T,
                            rng.normal(size=(n - s.shape[0], 3))
                            .astype(np.float32) * 0.3 @ r.T])
            for s, r, (_, n) in zip(srcs, rots, sizes)]
    res_sh = sharded.registration_cpd_batch_sharded(
        srcs, tgts, maxiter=30, tol=1e-6, mesh=mesh)
    res_plain = cpd_mod.registration_cpd_batch(
        srcs, tgts, maxiter=30, tol=1e-6, use_pallas=False)
    assert len(res_sh) == len(sizes)
    for a, c in zip(res_sh, res_plain):
        np.testing.assert_allclose(
            np.asarray(a.transformation.rot),
            np.asarray(c.transformation.rot), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(a.sigma2), np.asarray(c.sigma2), rtol=1e-4)


def test_sharded_bcpd_matches_single(mesh):
    """Sharded BCPD VI (psum'd moments, pmin'd NN-RMSE) == single device,
    for both the dense and the low-rank Sigma paths."""
    from probreg_tpu import bcpd as bcpd_mod

    src = _fixtures.fish_source()
    tgt = _fixtures.fish_target()
    for rank in (None, 30):
        kw = {} if rank is None else {"rank": rank}
        res_sh = sharded.registration_bcpd_sharded(
            src, tgt, maxiter=15, tol=0.0, mesh=mesh, **kw)
        res_single = bcpd_mod.registration_bcpd(
            src, tgt, maxiter=15, tol=0.0, **kw)
        np.testing.assert_allclose(
            np.asarray(res_sh.transform(src)),
            np.asarray(res_single.transform(src)), atol=2e-3)


def test_sharded_gmmtree_matches_single(mesh, horse_cloud):
    """Sharded tree-descent E-step (psum'd node moments) == single device."""
    from probreg_tpu import gmmtree as gt_mod

    src = np.asarray(horse_cloud, dtype=np.float32)
    ang = np.deg2rad([5.0, -3.0, 4.0])
    rot = np.asarray(se3_op.euler2mat(*ang), np.float32)
    tgt = src @ rot.T
    res_sh = sharded.registration_gmmtree_sharded(src, tgt, maxiter=30,
                                                  tol=1e-6)
    res_single = gt_mod.registration_gmmtree(src, tgt, maxiter=30, tol=1e-6)
    np.testing.assert_allclose(
        np.asarray(res_sh.transformation.rot),
        np.asarray(res_single.transformation.rot), atol=1e-4)
    rec = np.asarray(se3_op.mat2euler(res_sh.transformation.rot))
    np.testing.assert_allclose(rec, ang, atol=5e-2)


def test_sharded_svr_matches_single(mesh, horse_cloud):
    """Row-sharded OCSVM dual is deterministic: sharded SVR ~= single device
    and both recover the ground-truth rotation."""
    from probreg_tpu import l2dist_regs as l2

    src = np.asarray(horse_cloud, dtype=np.float32)
    ang = np.deg2rad([8.0, -4.0, 6.0])
    rot = np.asarray(se3_op.euler2mat(*ang), np.float32)
    tgt = src @ rot.T
    res_sh = sharded.registration_svr_sharded(src, tgt)
    rec = np.asarray(se3_op.mat2euler(res_sh.rot))
    np.testing.assert_allclose(rec, ang, atol=1e-1)
    res_single = l2dist_regs_ref = l2.registration_svr(src, tgt)
    np.testing.assert_allclose(
        np.asarray(res_sh.rot), np.asarray(res_single.rot), atol=1e-2)


def test_sharded_gmmreg_recovers_rotation(mesh, horse_cloud):
    """Mesh GMM fit (psum'd EM moments) + replicated BFGS recovers the
    ground truth (seeding differs from single device, so compare to truth)."""
    src = np.asarray(horse_cloud, dtype=np.float32)
    ang = np.deg2rad([8.0, -4.0, 6.0])
    rot = np.asarray(se3_op.euler2mat(*ang), np.float32)
    tgt = src @ rot.T
    res = sharded.registration_gmmreg_sharded(src, tgt, n_gmm_components=200)
    rec = np.asarray(se3_op.mat2euler(res.rot))
    np.testing.assert_allclose(rec, ang, atol=1e-1)
    np.testing.assert_allclose(np.asarray(res.t), 0.0, atol=1e-2)

def test_bcpd_sharded_applies_hw_guard(monkeypatch):
    """registration_bcpd_sharded on a small (1-device-class) mesh is the
    flat whole-VI dispatch the hardware guard exists to refuse; it must
    raise above the per-device bound, not fault the chip (review
    finding)."""
    import jax

    from probreg_tpu import config as cfg
    from probreg_tpu.parallel import sharded as sh

    rng = np.random.default_rng(0)
    src = rng.random((40, 3)).astype(np.float32)
    monkeypatch.setattr(cfg.config, "bcpd_guard_max_pairs", 100)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    with pytest.raises(ValueError, match="bcpd_guard_max_pairs"):
        sh.registration_bcpd_sharded(src, src, maxiter=20, rank=8)


def test_sharded_entries_reject_2d_mesh():
    """Entries with no 2-D path must reject a 2-axis mesh instead of
    silently wasting every n-axis replica (review finding)."""
    from probreg_tpu.parallel import sharded as sh, sharded2d as s2d

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices for the 2-axis mesh (single-chip "
                    "TPU run)")
    rng = np.random.default_rng(1)
    src = rng.random((50, 3)).astype(np.float32)
    mesh2d = s2d.make_mesh_2d(2, 4)
    for fn in (sh.registration_gmmtree_sharded,
               sh.registration_gmmreg_sharded,
               sh.registration_svr_sharded):
        with pytest.raises(ValueError, match="1-axis"):
            fn(src, src, mesh=mesh2d)


def test_sharded_feature_wrapper_delegates_attribute_writes():
    """RigidSVR._estimate_sigma writes _sigma/_gamma onto the (possibly
    wrapped) feature generator; the sharded wrapper must forward those to
    the base it computes with (review finding: stale kernel width after
    set_source), and must NOT advertise the fused_fit fast path."""
    from probreg_tpu import features as ft
    from probreg_tpu.parallel import sharded as sh

    base = ft.OneClassSVM(3, sigma=1.0, gamma=0.5, nu=0.1)
    w = sh._ShardedOneClassSVM(base, sh.make_mesh(), "devices")
    w._sigma = 2.5
    w._gamma = 0.08
    assert base._sigma == 2.5 and base._gamma == 0.08
    assert w._nu == base._nu          # reads delegate too
    assert not hasattr(w, "fused_fit")
