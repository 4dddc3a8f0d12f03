"""Rigid FilterReg on the bunny (reference examples/filterreg_rigid.py)."""
import numpy as np
import utils
from probreg_tpu import filterreg
from probreg_tpu.utils import se3_op as so

source, target = utils.prepare_source_and_target_rigid_3d(
    utils.DATA_DIR + "/bunny.pcd", n_random=0,
    orientation=np.deg2rad([0.0, 0.0, 10.0]))
tf_param, _, _ = filterreg.registration_filterreg(source, target)
print("result:", np.rad2deg(np.asarray(so.mat2euler(tf_param.rot))),
      np.asarray(tf_param.t))
