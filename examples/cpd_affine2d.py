"""Affine CPD on the 2D fish (reference examples/cpd_affine2d.py)."""
import numpy as np
import utils
from probreg_tpu import cpd

source, target = utils.prepare_source_and_target_nonrigid_2d(
    utils.DATA_DIR + "/fish_source.txt", utils.DATA_DIR + "/fish_target.txt")
tf_param, _, _ = cpd.registration_cpd(source, target, tf_type_name="affine")
print("result: b=\n", np.asarray(tf_param.b), "\nt=", np.asarray(tf_param.t))
