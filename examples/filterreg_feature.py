"""Feature-space (FPFH) FilterReg (reference examples/filterreg_feature.py).

Uses the native JAX FPFH instead of Open3D's.
"""
import numpy as np
import utils
from probreg_tpu import features, filterreg
from probreg_tpu.utils import se3_op as so

source, target = utils.prepare_source_and_target_rigid_3d(
    utils.DATA_DIR + "/bunny.pcd", n_random=0, voxel_size=0.01,
    orientation=np.deg2rad([0.0, 0.0, 10.0]))
fpfh = features.FPFH(radius_normal=0.02, radius_feature=0.05)
tf_param, _, _ = filterreg.registration_filterreg(
    source, target, objective_type="pt2pt", feature_fn=fpfh)
print("result:", np.rad2deg(np.asarray(so.mat2euler(tf_param.rot))),
      np.asarray(tf_param.t))
