"""Affine 3-D CPD (reference examples/cpd_affine3d_cuda.py, sans cupy —
the JAX backend targets whatever accelerator is attached)."""
import numpy as np
import utils
from probreg_tpu import cpd

source, target = utils.prepare_source_and_target_rigid_3d(
    utils.DATA_DIR + "/bunny.pcd", n_random=0,
    orientation=np.deg2rad([0.0, 0.0, 10.0]))
tf_param, _, _ = cpd.registration_cpd(source, target, tf_type_name="affine")
print("result: b=\n", np.asarray(tf_param.b), "\nt=", np.asarray(tf_param.t))
