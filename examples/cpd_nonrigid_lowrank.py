"""Low-rank nonrigid CPD + BCPD at a cloud size the dense Gram cannot reach.

No reference counterpart: the reference materializes the M x M Gram matrix
for nonrigid CPD (cpd.py:284-303) and inverts M x M for BCPD
(bcpd.py:114,130), so ~10k+ points are out of reach. The ``rank=`` option
(ops/lowrank.py) holds G as rank-K Nystrom eigenfactors — O(M K) memory —
and registers a 16k-point deformed surface here.
"""
import numpy as np
import utils  # noqa: F401  (sets up sys.path / backend)
from probreg_tpu import bcpd, cpd

g = np.linspace(0.0, 1.0, 128)
xx, yy = np.meshgrid(g, g)
source = np.stack(
    [xx, yy, 0.3 * np.sin(2 * np.pi * xx) * np.cos(2 * np.pi * yy)],
    axis=-1).reshape(-1, 3).astype(np.float32)
disp = 0.08 * np.stack(
    [np.sin(np.pi * yy), np.cos(np.pi * xx), np.sin(np.pi * (xx + yy))],
    axis=-1).reshape(-1, 3).astype(np.float32)
target = source + disp

tf_param, _, _ = cpd.registration_cpd(
    source, target, tf_type_name="nonrigid", maxiter=20, rank=60)
moved = np.asarray(tf_param.transform(source))
print("cpd  M=%d residual: %.5f (initial %.5f)"
      % (len(source), np.abs(moved - target).mean(), np.abs(disp).mean()))

tf_param = bcpd.registration_bcpd(source, target, maxiter=20, rank=60)
moved = np.asarray(tf_param.transform(source))
print("bcpd M=%d residual: %.5f" % (len(source), np.abs(moved - target).mean()))
