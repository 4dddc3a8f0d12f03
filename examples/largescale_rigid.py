"""Large-scale rigid registration (100k+ points) on one TPU chip.

Demonstrates the round-2 scaling machinery end-to-end: the entry point
Morton-sorts once, the EM loop runs the fraction-adaptive tile-culled
E-step (ops/estep_pallas.estep_auto), and no (M, N) matrix is ever
materialized. The same call sharded over a mesh is
examples/cpd_rigid_sharded.py.
"""

import time

import numpy as np
import utils  # noqa: F401  (puts the repo root on sys.path)

from probreg_tpu import cpd, filterreg
from probreg_tpu.utils import se3_op as so

rng = np.random.default_rng(0)
n = 150_000
source = rng.uniform(-1.0, 1.0, (n, 3)).astype(np.float32)
rot = np.asarray(so.euler2mat(*np.deg2rad([3.0, -2.0, 5.0])), np.float32)
target = (source @ rot.T).astype(np.float32)

t0 = time.perf_counter()
res = cpd.registration_cpd(source, target, maxiter=40, tol=1e-8)
dt = time.perf_counter() - t0
err = float(np.asarray(so.rotation_angle(res.transformation.rot, rot)))
print(f"rigid CPD {n:,} pts, 40 iters: {dt:.1f}s  rot_angle_err={err:.2e}")

t0 = time.perf_counter()
res = filterreg.registration_filterreg(source, target, maxiter=40, tol=1e-8,
                                       sigma2_decay=0.9)
dt = time.perf_counter() - t0
rec = np.rad2deg(np.asarray(so.mat2euler(res.transformation.rot)))
print(f"rigid FilterReg (streaming): {dt:.1f}s  recovered {rec.round(3)}")

# Coarse-to-fine (round 3): the same problem through the pyramid — the
# full-resolution iterations run warm-started in the culled regime
# (examples/pyramid_rigid.py has the standalone version).
from probreg_tpu import pyramid  # noqa: E402

t0 = time.perf_counter()
res = pyramid.registration_cpd_pyramid(source, target, "rigid", levels=3)
dt = time.perf_counter() - t0
err = float(np.asarray(so.rotation_angle(res.transformation.rot, rot)))
print(f"rigid CPD pyramid {n:,} pts: {dt:.1f}s  rot_angle_err={err:.2e}")
