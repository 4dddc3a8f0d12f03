"""ICP baseline vs the probabilistic registrations (reference
examples/icp_test.py + README.md:135-144 timing table).

The reference's ICP baseline is Open3D's registration_icp; here the
baseline is the package's own TPU-native ICP (probreg_tpu.icp — one
while_loop program, MXU nearest neighbors), so the comparison runs without
Open3D. Open3D is used instead when it happens to be installed.
"""

import time

import numpy as np
import utils

from probreg_tpu import cpd, filterreg, icp
from probreg_tpu.utils import se3_op as so

source, target = utils.prepare_source_and_target_rigid_3d(
    utils.DATA_DIR + "/bunny.pcd", n_random=0,
    orientation=np.deg2rad([0.0, 0.0, 10.0]))


def timed(name, fn):
    fn()  # compile
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    rot = out.transformation.rot if hasattr(out, "transformation") else out.rot
    deg = np.rad2deg(np.asarray(so.mat2euler(np.asarray(rot))))
    print(f"{name:22s} {dt * 1e3:8.2f} ms   recovered {deg.round(3)}")
    return out


try:
    import open3d as o3

    def run_o3_icp():
        s = o3.geometry.PointCloud(o3.utility.Vector3dVector(source))
        t = o3.geometry.PointCloud(o3.utility.Vector3dVector(target))
        reg = o3.pipelines.registration.registration_icp(
            s, t, 0.05, np.identity(4),
            o3.pipelines.registration.TransformationEstimationPointToPoint())
        import types

        return types.SimpleNamespace(rot=np.asarray(reg.transformation[:3, :3]))

    timed("ICP (Open3D)", run_o3_icp)
except ImportError:
    timed("ICP (probreg_tpu)", lambda: icp.registration_icp(
        source, target, maxiter=100, tol=1e-8))

timed("CPD rigid", lambda: cpd.registration_cpd(source, target))
timed("FilterReg pt2pt", lambda: filterreg.registration_filterreg(
    source, target))
