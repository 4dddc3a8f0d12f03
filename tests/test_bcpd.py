"""BCPD e2e — coverage the reference lacks entirely (SURVEY.md §4)."""

import numpy as np
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
    src = np.loadtxt("/root/reference/examples/fish_source.txt").astype(np.float32)
    tgt = np.loadtxt("/root/reference/examples/fish_target.txt").astype(np.float32)
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
