"""Deforming-sequence tracking with tracking.NonrigidTracker.

A surface deforms smoothly over T frames; the tracker registers the fixed
TEMPLATE (frame 0) onto every new frame with warm-started BCPD, carrying
the FULL final VI iterate between frames (rigid params, displacement
field, variance, mixing weights, Sigma diagonal). The reference has no
sequence API — its users re-run registration_bcpd cold per pair
(reference bcpd.py:159), paying the start-temperature annealing every
frame. Here only frame 1 pays it.

Run on the TPU (default backend); CPU works but is slower:
    cd examples && python tracking_nonrigid.py
"""

import os
import time

import numpy as np
import utils  # noqa: F401  (puts the repo root on sys.path)

from probreg_tpu import bcpd, tracking

rng = np.random.default_rng(5)
n = int(os.environ.get("TRACKING_N", 5_000))
n_frames = int(os.environ.get("TRACKING_FRAMES", 10))

from probreg_tpu.utils.datagen import blobby_surface  # noqa: E402

template = blobby_surface(n, seed=5).astype(np.float32)
frames = []
for k in range(1, n_frames):
    a = 0.015 * k
    defo = (a * np.sin(2.5 * template[:, :1] + 0.1 * k)
            * np.array([[1.0, 0.6, -0.4]])).astype(np.float32)
    frames.append((template + defo).astype(np.float32))


def nn_rmse(a, b, m=2000):
    sa = a[:: max(1, a.shape[0] // m)]
    sb = b[:: max(1, b.shape[0] // m)]
    d2 = ((sa[:, None] - sb[None]) ** 2).sum(-1)
    return float(np.sqrt(d2.min(1).mean()))


kw = dict(maxiter=20, tol=1e-6, lmd=10.0, rank=48)

trk = tracking.NonrigidTracker(**kw)
trk.update(template)
t0 = time.perf_counter()
warm = []
for f in frames:
    res = trk.update(f)
    warm.append(nn_rmse(np.asarray(res.transform(template)), f))
t_warm = time.perf_counter() - t0

t0 = time.perf_counter()
cold = []
for f in frames:
    res = bcpd.registration_bcpd(template, f, maxiter=50, tol=1e-6,
                                 lmd=10.0, rank=48)
    cold.append(nn_rmse(np.asarray(res.transform(template)), f))
t_cold = time.perf_counter() - t0

base = [nn_rmse(template, f) for f in frames]
print(f"warm tracker : {t_warm:.2f}s  mean nn-rmse {np.mean(warm):.4f}")
print(f"cold per-pair: {t_cold:.2f}s  mean nn-rmse {np.mean(cold):.4f}")
print(f"identity     :        mean nn-rmse {np.mean(base):.4f}")
