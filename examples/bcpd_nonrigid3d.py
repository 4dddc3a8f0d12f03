"""Nonrigid 3-D registration on the face dataset (reference
examples/cpd_nonrigid3d_cuda.py uses face-x/face-y with cupy)."""
import numpy as np
import utils
from probreg_tpu import bcpd

source, target = utils.prepare_source_and_target_nonrigid_3d(
    utils.DATA_DIR + "/face-x.txt", utils.DATA_DIR + "/face-y.txt",
    voxel_size=5.0)
tf_param = bcpd.registration_bcpd(source, target, maxiter=50)
moved = np.asarray(tf_param.transform(source))
d2 = ((moved[:, None] - target[None]) ** 2).sum(-1)
print("nn-rmse after:", float(np.sqrt(d2.min(1).mean())))
