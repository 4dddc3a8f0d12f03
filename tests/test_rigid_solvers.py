"""Weighted Kabsch / pt2pl GN vs analytic oracles.

Mirrors reference tests/test_point_to_plane.py (plane grid rotated 10 deg)
plus Kabsch recovery tests the reference lacks.
"""

import numpy as np

from probreg_tpu.ops import rigid_solvers as rs
from probreg_tpu.utils import se3_op as so


def test_weighted_kabsch_recovers_rotation(rng):
    src = rng.normal(size=(100, 3)).astype(np.float32)
    ang = np.deg2rad([4.0, -7.0, 11.0])
    rot = np.asarray(so.euler2mat(*ang), np.float32)
    t = np.array([0.05, -0.02, 0.1], np.float32)
    tgt = src @ rot.T + t
    w = rng.random(100).astype(np.float32) + 0.1
    r, tt = rs.weighted_kabsch(src, tgt, w)
    np.testing.assert_allclose(np.asarray(r), rot, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tt), t, atol=1e-5)


def test_weighted_kabsch_ignores_zero_weight_outliers(rng):
    src = rng.normal(size=(50, 3)).astype(np.float32)
    rot = np.asarray(so.euler2mat(0.1, 0.0, 0.2), np.float32)
    tgt = src @ rot.T
    tgt[:10] += 100.0  # corrupted rows
    w = np.ones(50, np.float32)
    w[:10] = 0.0
    r, t = rs.weighted_kabsch(src, tgt, w)
    np.testing.assert_allclose(np.asarray(r), rot, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t), 0.0, atol=1e-4)


def test_weighted_kabsch_zero_total_weight_identity(rng):
    src = rng.normal(size=(10, 3)).astype(np.float32)
    r, t = rs.weighted_kabsch(src, src + 1.0, np.zeros(10, np.float32))
    np.testing.assert_allclose(np.asarray(r), np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t), 0.0, atol=1e-6)


def test_weighted_kabsch_2d(rng):
    src = rng.normal(size=(60, 2)).astype(np.float32)
    ang = 0.3
    rot = np.array([[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]],
                   np.float32)
    tgt = src @ rot.T + np.array([0.2, -0.1], np.float32)
    r, t = rs.weighted_kabsch(src, tgt, np.ones(60, np.float32))
    np.testing.assert_allclose(np.asarray(r), rot, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t), [0.2, -0.1], atol=1e-5)


def test_pt2pl_twist_on_rotated_plane(rng):
    """Reference tests/test_point_to_plane.py:10-38: plane z=-0.5 rotated
    10 deg about x (out-of-plane, so pt2pl observes it)."""
    xs, ys = np.meshgrid(np.linspace(-0.5, 0.5, 5), np.linspace(-0.5, 0.5, 5))
    model = np.stack(
        [xs.ravel(), ys.ravel(), np.full(25, -0.5)], axis=1).astype(np.float32)
    ang = np.deg2rad(10.0)
    rot = np.asarray(so.euler2mat(ang, 0.0, 0.0), np.float32)
    target = model @ rot.T
    normals = np.tile(np.array([0.0, 0.0, 1.0], np.float32), (25, 1)) @ rot.T
    tw, q = rs.twist_for_pt2pl(model, target, normals, np.ones(25, np.float32))
    r, t = so.twist_mul(tw, np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
    np.testing.assert_allclose(np.asarray(r) @ rot.T, np.eye(3), atol=5e-2)
    np.testing.assert_allclose(np.asarray(t), 0.0, atol=5e-1)
