"""Point-to-plane FilterReg (reference examples/filterreg_rigid_pt2pl.py).

The reference hand-tunes sigma2=0.01 for its room-scale cloud; the TPU
framework auto-initializes sigma2 at point-spacing scale for pt2pl.
"""
import numpy as np
import utils
from probreg_tpu import filterreg
from probreg_tpu.utils import se3_op as so

source, target, normals = utils.prepare_source_and_target_rigid_3d(
    utils.DATA_DIR + "/bunny.pcd", n_random=0,
    orientation=np.deg2rad([0.0, 0.0, 10.0]), normals=True)
tf_param, _, _ = filterreg.registration_filterreg(
    source, target, target_normals=normals, objective_type="pt2pl")
print("result:", np.rad2deg(np.asarray(so.mat2euler(tf_param.rot))),
      np.asarray(tf_param.t))
