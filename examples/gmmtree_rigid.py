"""GMMTree rigid registration (reference examples/gmmtree_rigid.py)."""
import numpy as np
import utils
from probreg_tpu import gmmtree
from probreg_tpu.utils import se3_op as so

source, target = utils.prepare_source_and_target_rigid_3d(
    utils.DATA_DIR + "/bunny.pcd", n_random=0,
    orientation=np.deg2rad([0.0, 0.0, 10.0]))
tf_param, _ = gmmtree.registration_gmmtree(source, target)
print("result:", np.rad2deg(np.asarray(so.mat2euler(tf_param.rot))),
      np.asarray(tf_param.t))
