"""Large-coordinate-offset robustness: every family registers clouds at
UTM/mm-scale coordinate magnitudes (|x| ~ 1e4-1e5).

The f64 reference handles such data for free; in f32 the expanded-form
pairwise distances lose ~|x|^2 * eps to cancellation — measured before
the shared-centroid centering fixes: CPD returned NaN, ICP diverged
(1.9 rad), FilterReg/GMMTree degraded 40-100x, nonrigid CPD NaN'd, and
the L2 BFGS solves (origin-anchored rotations) failed outright at a 1e4
offset. The runners now center internally (cpd._run_em_t and twins);
BCPD was already safe via its default normalization.
"""

import numpy as np
import pytest

from probreg_tpu import se3_op as so


OFFSET = 1.0e4


@pytest.fixture
def offset_pair(rng):
    from probreg_tpu.utils.datagen import blobby_surface

    base = blobby_surface(1500, seed=17).astype(np.float32)
    src = (base + OFFSET).astype(np.float32)
    c = src.mean(0)
    rot = np.asarray(so.euler2mat(*np.deg2rad([2.0, -1.0, 8.0])))
    tgt = ((src - c) @ rot.T + c + 0.02).astype(np.float32)
    return src, tgt, rot


def _rot_err(res_rot, rot):
    return float(so.rotation_angle(np.asarray(res_rot), rot))


def test_cpd_rigid_at_offset(offset_pair):
    from probreg_tpu import cpd

    src, tgt, rot = offset_pair
    res = cpd.registration_cpd(src, tgt, maxiter=60, tol=1e-6)
    assert _rot_err(res.transformation.rot, rot) < 5e-3


def test_cpd_nonrigid_lowrank_at_offset(offset_pair):
    from probreg_tpu import cpd

    src, _, _ = offset_pair
    c = src.mean(0)
    tgt = (src + 0.08 * np.sin(2.0 * (src - c)[:, ::-1])).astype(np.float32)
    res = cpd.registration_cpd(src, tgt, "nonrigid", rank=32, maxiter=40)
    moved = np.asarray(res.transformation.transform(src))
    r0 = np.sqrt(((src - tgt) ** 2).sum(1)).mean()
    r1 = np.sqrt(((moved - tgt) ** 2).sum(1)).mean()
    assert np.isfinite(r1) and r1 < 0.3 * r0


def test_filterreg_at_offset(offset_pair):
    from probreg_tpu import filterreg

    src, tgt, rot = offset_pair
    res = filterreg.registration_filterreg(src, tgt, maxiter=60,
                                           sigma2_decay=0.9)
    assert _rot_err(res.transformation.rot, rot) < 2e-2


def test_icp_at_offset(offset_pair):
    from probreg_tpu import icp

    src, tgt, rot = offset_pair
    res = icp.registration_icp(src, tgt, maxiter=60)
    assert _rot_err(res.transformation.rot, rot) < 5e-3


def test_gmmtree_at_offset(offset_pair):
    from probreg_tpu import gmmtree

    src, tgt, rot = offset_pair
    res = gmmtree.registration_gmmtree(src, tgt)
    assert _rot_err(res.transformation.rot, rot) < 2e-2


def test_svr_gmmreg_at_offset(offset_pair):
    from probreg_tpu import l2dist_regs

    src, tgt, rot = offset_pair
    e_svr = _rot_err(l2dist_regs.registration_svr(src, tgt).rot, rot)
    assert e_svr < 2e-2, e_svr
    # GMMReg's random-restart GMM fit lands ~0.14 rad on this fixture at
    # the ORIGIN too; the offset contract is "no worse than origin".
    e_gmm = _rot_err(l2dist_regs.registration_gmmreg(src, tgt).rot, rot)
    assert e_gmm < 0.3, e_gmm


def test_bcpd_at_offset(offset_pair):
    from probreg_tpu import bcpd

    src, tgt, rot = offset_pair
    res = bcpd.registration_bcpd(src, tgt, maxiter=40, rank=32, lmd=1e3)
    moved = np.asarray(res.transform(src))
    d2 = ((moved[:, None] - tgt[None]) ** 2).sum(-1)
    base = ((src[:, None] - tgt[None]) ** 2).sum(-1)
    assert np.sqrt(d2.min(1).mean()) < 0.5 * np.sqrt(base.min(1).mean())


def test_pyramid_at_offset(rng):
    from probreg_tpu import pyramid
    from probreg_tpu.utils.datagen import blobby_surface

    base = blobby_surface(12000, seed=18).astype(np.float32)
    src = (base + OFFSET).astype(np.float32)
    c = src.mean(0)
    rot = np.asarray(so.euler2mat(*np.deg2rad([2.0, -1.0, 8.0])))
    tgt = ((src - c) @ rot.T + c + 0.02).astype(np.float32)
    res = pyramid.registration_cpd_pyramid(src, tgt, "rigid", levels=2,
                                           coarse_points=1500, tol=1e-6)
    assert _rot_err(res.transformation.rot, rot) < 5e-3


def test_multistart_at_offset(rng):
    """The orientation grid rotates about the CENTROID, so the global
    search works on offset clouds (an about-origin grid start flings the
    cloud ~1e4 away)."""
    from probreg_tpu import cpd
    from probreg_tpu.utils.datagen import blobby_surface

    base = blobby_surface(1200, seed=19).astype(np.float32)
    src = (base + OFFSET).astype(np.float32)
    c = src.mean(0)
    rot = np.asarray(so.euler2mat(0.0, 0.0, np.deg2rad(150.0)))
    tgt = ((src - c) @ rot.T + c).astype(np.float32)
    res = cpd.registration_cpd(src, tgt, n_starts=6, maxiter=60, tol=1e-6)
    assert _rot_err(res.transformation.rot, rot) < 1e-2

def test_generic_loop_paths_at_offset(offset_pair):
    """The generic _run_em loop (callback mode, dense nonrigid,
    constrained CPD) centers too — it routed through raw-coordinate
    moments and returned a silently wrong pose (>100 deg) at a 1e4
    offset while the fast path was fine (review finding)."""
    from probreg_tpu import cpd

    src, tgt, rot = offset_pair
    calls = []
    res = cpd.registration_cpd(src, tgt, maxiter=60, tol=1e-6,
                               callbacks=[lambda t: calls.append(1)])
    assert calls
    assert _rot_err(res.transformation.rot, rot) < 5e-3

    # Dense nonrigid (rank=None) on a small slice.
    s = src[:400]
    c = s.mean(0)
    t = (s + 0.05 * np.sin(2.0 * (s - c)[:, ::-1])).astype(np.float32)
    rn = cpd.registration_cpd(s, t, "nonrigid", maxiter=40)
    moved = np.asarray(rn.transformation.transform(s))
    r0 = np.sqrt(((s - t) ** 2).sum(1)).mean()
    r1 = np.sqrt(((moved - t) ** 2).sum(1)).mean()
    assert np.isfinite(r1) and r1 < 0.3 * r0

    # Constrained nonrigid with a few known correspondences.
    rc = cpd.registration_cpd(s, t, "nonrigid_constrained", maxiter=40,
                              idx_source=np.arange(10),
                              idx_target=np.arange(10), alpha=1e-6)
    moved_c = np.asarray(rc.transformation.transform(s))
    r2 = np.sqrt(((moved_c - t) ** 2).sum(1)).mean()
    assert np.isfinite(r2) and r2 < 0.3 * r0
