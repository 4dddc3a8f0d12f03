"""BCPD on the 2D fish (reference examples/bcpd_nonrigid.py)."""
import numpy as np
import utils
from probreg_tpu import bcpd

source, target = utils.prepare_source_and_target_nonrigid_2d(
    utils.DATA_DIR + "/fish_source.txt", utils.DATA_DIR + "/fish_target.txt")
tf_param = bcpd.registration_bcpd(source, target)
moved = np.asarray(tf_param.transform(source))
d2 = ((moved[:, None] - target[None]) ** 2).sum(-1)
print("nn-rmse after:", float(np.sqrt(d2.min(1).mean())))
