"""Open3D interop paths, exercised against a stub ``open3d`` module.

The image has no open3d, so the optional-dependency branches in
utils/interop.py (PointCloud / Vector3dVector conversion, the
Vector3dVector round-trip of Transformation.transform — reference
cpd.py:444 and transformation.py:23-26) were untested. A minimal stub with
the same duck-typed surface covers them without the real package.
"""

import importlib
import sys
import types

import numpy as np
import pytest

from probreg_tpu.utils import interop


def _make_stub():
    o3 = types.ModuleType("open3d")
    geometry = types.ModuleType("open3d.geometry")
    utility = types.ModuleType("open3d.utility")

    class Vector3dVector:
        """array-convertible container like open3d.utility.Vector3dVector."""

        def __init__(self, arr):
            self._arr = np.asarray(arr, dtype=np.float64)

        def __array__(self, dtype=None, copy=None):
            return self._arr.astype(dtype) if dtype else self._arr

        def __len__(self):
            return len(self._arr)

    class PointCloud:
        def __init__(self, pts=None, normals=None):
            self.points = Vector3dVector(
                np.zeros((0, 3)) if pts is None else pts)
            self.normals = Vector3dVector(
                np.zeros((0, 3)) if normals is None else normals)

    geometry.PointCloud = PointCloud
    utility.Vector3dVector = Vector3dVector
    o3.geometry = geometry
    o3.utility = utility
    return o3


@pytest.fixture
def o3_stub():
    had = sys.modules.get("open3d")
    sys.modules["open3d"] = _make_stub()
    importlib.reload(interop)
    try:
        yield sys.modules["open3d"]
    finally:
        if had is None:
            del sys.modules["open3d"]
        else:
            sys.modules["open3d"] = had
        importlib.reload(interop)


def test_as_points_pointcloud(o3_stub, rng):
    pts = rng.normal(size=(10, 3))
    pc = o3_stub.geometry.PointCloud(pts)
    out = interop.as_points(pc)
    assert out.dtype == np.float32
    np.testing.assert_allclose(out, pts.astype(np.float32))
    # Vector3dVector converts too.
    out2 = interop.as_points(o3_stub.utility.Vector3dVector(pts))
    np.testing.assert_allclose(out2, pts.astype(np.float32))


def test_as_normals_pointcloud(o3_stub, rng):
    pts = rng.normal(size=(7, 3))
    nrm = rng.normal(size=(7, 3))
    pc = o3_stub.geometry.PointCloud(pts, nrm)
    np.testing.assert_allclose(
        interop.as_normals(pc), nrm.astype(np.float32))
    assert interop.as_normals(None) is None


def test_transform_roundtrips_vector3dvector(o3_stub, rng):
    from probreg_tpu.models import transformation as tf

    pts = rng.normal(size=(5, 3))
    vec = o3_stub.utility.Vector3dVector(pts)
    t = tf.RigidTransformation(np.eye(3), np.array([1.0, 0.0, 0.0]))
    out = t.transform(vec)
    # Reference transformation.py:23-26: Vector3dVector in -> Vector3dVector out.
    assert isinstance(out, o3_stub.utility.Vector3dVector)
    np.testing.assert_allclose(
        np.asarray(out), pts + np.array([1.0, 0.0, 0.0]), atol=1e-6)


def test_registration_accepts_pointclouds(o3_stub, horse_cloud):
    from probreg_tpu import cpd
    from probreg_tpu.utils import se3_op

    src = np.asarray(horse_cloud, dtype=np.float32)[::4]
    rot = np.asarray(se3_op.euler2mat(*np.deg2rad([0.0, 0.0, 10.0])), np.float32)
    tgt = src @ rot.T
    res = cpd.registration_cpd(
        o3_stub.geometry.PointCloud(src), o3_stub.geometry.PointCloud(tgt),
        maxiter=50)
    got = np.rad2deg(np.asarray(se3_op.mat2euler(np.asarray(res.transformation.rot))))
    np.testing.assert_allclose(got, [0.0, 0.0, 10.0], atol=0.5)
