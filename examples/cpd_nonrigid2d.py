"""Nonrigid CPD on the 2D fish (reference examples/cpd_nonrigid2d.py)."""
import numpy as np
import utils
from probreg_tpu import cpd

source, target = utils.prepare_source_and_target_nonrigid_2d(
    utils.DATA_DIR + "/fish_source.txt", utils.DATA_DIR + "/fish_target.txt")
tf_param, _, _ = cpd.registration_cpd(source, target, tf_type_name="nonrigid")
moved = np.asarray(tf_param.transform(source))
print("mean displacement:", np.abs(moved - source).mean())
