"""2-D rigid FilterReg on the fish (reference examples/filterreg_rigid2d.py)."""
import numpy as np
import utils
from probreg_tpu import filterreg

source, target = utils.prepare_source_and_target_nonrigid_2d(
    utils.DATA_DIR + "/fish_source.txt", utils.DATA_DIR + "/fish_target.txt")
ang = np.deg2rad(15.0)
rot = np.array([[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]])
target = source @ rot.T
tf_param, _, _ = filterreg.registration_filterreg(
    source, target, sigma2=None, update_sigma2=True)
print("result angle (deg):",
      np.rad2deg(np.arctan2(np.asarray(tf_param.rot)[1, 0],
                            np.asarray(tf_param.rot)[0, 0])))
