"""Algorithm timing on the bunny config (reference examples/time_measurement.py)."""
from timeit import default_timer as timer

import numpy as np
import utils
from probreg_tpu import cpd, filterreg, gmmtree, l2dist_regs

threshold = 0.001
max_iteration = 100

source, target = utils.prepare_source_and_target_rigid_3d(
    utils.DATA_DIR + "/bunny.pcd", n_random=0,
    orientation=np.deg2rad([0.0, 0.0, 10.0]))

for name, fn in [
    ("CPD", lambda: cpd.registration_cpd(
        source, target, maxiter=max_iteration, tol=threshold)),
    ("SVR", lambda: l2dist_regs.registration_svr(
        source, target, opt_maxiter=max_iteration, opt_tol=threshold)),
    ("GMMTree", lambda: gmmtree.registration_gmmtree(
        source, target, maxiter=max_iteration, tol=threshold)),
    ("FilterReg", lambda: filterreg.registration_filterreg(
        source, target, sigma2=None, maxiter=max_iteration, tol=threshold)),
]:
    fn()  # warmup/compile
    start = timer()
    fn()
    print("%s: " % name, timer() - start)
