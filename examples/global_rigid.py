"""Global rigid registration via n_starts: recover LARGE rotations.

Local registration (EM from the identity) fails beyond roughly 60-90
degrees. Every probreg_tpu family takes ``n_starts``: up to 10 restarts on
a coarse orientation grid (identity + 180/90/-90 degrees about each axis),
all run vmapped in ONE dispatch, best final criterion wins. The reference
has no restart mechanism in any algorithm.
"""

import numpy as np
import utils

from probreg_tpu import bcpd, cpd, filterreg, gmmtree, l2dist_regs, se3_op


def nn_rmse(a, b):
    d2 = ((a[:, None] - b[None]) ** 2).sum(-1)
    return float(np.sqrt(d2.min(axis=1).mean()))


def main():
    source = utils.prepare_source_and_target_rigid_3d(
        utils.DATA_DIR + "/bunny.pcd", orientation=np.zeros(3),
        voxel_size=0.005)[0]
    source = np.asarray(source, np.float32)
    ang = np.deg2rad([0.0, 0.0, 150.0])
    rot = np.asarray(se3_op.euler2mat(*ang), np.float32)
    target = source @ rot.T
    base = nn_rmse(source, target)

    def geo_deg(rec):
        rec = np.asarray(rec)
        return np.rad2deg(np.arccos(np.clip(
            (np.trace(rec.T @ rot) - 1.0) / 2.0, -1.0, 1.0)))

    res = cpd.registration_cpd(source, target, maxiter=80, tol=1e-6,
                               n_starts=10)
    print(f"cpd       n_starts=10: {geo_deg(res.transformation.rot):7.3f} deg err")
    res = filterreg.registration_filterreg(source, target, maxiter=80,
                                           tol=1e-6, n_starts=10)
    print(f"filterreg n_starts=10: {geo_deg(res.transformation.rot):7.3f} deg err")
    res = gmmtree.registration_gmmtree(source, target, maxiter=40, tol=1e-6,
                                       n_starts=10)
    print(f"gmmtree   n_starts=10: {geo_deg(res.transformation.rot):7.3f} deg err")
    res = l2dist_regs.registration_gmmreg(source, target,
                                          n_gmm_components=200, n_starts=10)
    print(f"gmmreg    n_starts=10: {geo_deg(res.rot):7.3f} deg err")
    res = bcpd.registration_bcpd(source, target, maxiter=100, tol=0.0,
                                 lmd=10.0, n_starts=10)
    ratio = nn_rmse(np.asarray(res.transform(source)), target) / base
    print(f"bcpd      n_starts=10: {ratio:7.3f} rmse ratio (combined model)")


if __name__ == "__main__":
    main()
