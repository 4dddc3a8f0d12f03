"""Rigid SVR (reference examples/svr_rigid.py)."""
import numpy as np
import utils
from probreg_tpu import l2dist_regs
from probreg_tpu.utils import se3_op as so

source, target = utils.prepare_source_and_target_rigid_3d(
    utils.DATA_DIR + "/bunny.pcd", n_random=0,
    orientation=np.deg2rad([0.0, 0.0, 10.0]))
tf_param = l2dist_regs.registration_svr(source, target)
print("result:", np.rad2deg(np.asarray(so.mat2euler(tf_param.rot))),
      np.asarray(tf_param.t))
