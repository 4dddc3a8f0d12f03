"""Rigid CPD on the bunny (reference examples/cpd_rigid.py)."""
import numpy as np
import utils
from probreg_tpu import cpd
from probreg_tpu.utils import se3_op as so

source, target = utils.prepare_source_and_target_rigid_3d(
    utils.DATA_DIR + "/bunny.pcd", n_random=0,
    orientation=np.deg2rad([0.0, 0.0, 10.0]))
tf_param, _, _ = cpd.registration_cpd(source, target)
print("result:", np.rad2deg(np.asarray(so.mat2euler(tf_param.rot))),
      float(tf_param.scale), np.asarray(tf_param.t))
