"""Nonrigid (TPS) SVR on the 2D fish (reference examples/svr_nonrigid2d.py)."""
import numpy as np
import utils
from probreg_tpu import l2dist_regs

source, target = utils.prepare_source_and_target_nonrigid_2d(
    utils.DATA_DIR + "/fish_source.txt", utils.DATA_DIR + "/fish_target.txt")
tf_param = l2dist_regs.registration_svr(source, target, "nonrigid")
moved = np.asarray(tf_param.transform(source))
d2 = ((moved[:, None] - target[None]) ** 2).sum(-1)
print("nn-rmse after:", float(np.sqrt(d2.min(1).mean())))
