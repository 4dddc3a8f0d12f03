"""Guarded single-chip BCPD validation at huge N (round-4 verdict item 2).

Runs `pyramid.registration_bcpd_pyramid` with NO mesh and NO explicit
dispatch_chunk — the hardware-safety guard (config.bcpd_guard_max_pairs)
auto-slices every large level into few-iteration device programs, which
is the designed-safe path for the tunnel-fault regime (CLAUDE.md: three
unguarded 1M attempts crashed the v5e worker in round 3).

Fixture matches the published 100k-700k BENCHMARKS.md rows: blobby
surface, sinusoidal deformation + 8/-4/6 deg rotation, rank=64,
tol=1e-4, 4 levels; quality scored as 2k-subsample NN-RMSE before/after
(the subsample metric reads ~2x the full-target criterion — calibration
in BENCHMARKS.md).

Usage: python benchmarks/bench_bcpd_guarded.py [N]   (default 1_000_000)
Run detached (nohup, exact-PID kill): sustained foreground runs through
the tunnel are exactly what this validates against.
"""

import json
import os
import sys
import time

import numpy as np


def nn_rmse_sub(a, b, k=2000, seed=0):
    rng = np.random.default_rng(seed)
    ia = rng.choice(a.shape[0], min(k, a.shape[0]), replace=False)
    ib = rng.choice(b.shape[0], min(k, b.shape[0]), replace=False)
    aa, bb = a[ia], b[ib]
    d2 = ((aa[:, None, :] - bb[None, :, :]) ** 2).sum(-1)
    return float(np.sqrt(d2.min(1)).mean())


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    import jax

    from probreg_tpu import config, pyramid, se3_op as so
    from probreg_tpu.utils.datagen import blobby_surface

    config.enable_compilation_cache("/root/repo/.jax_cache")
    # Root-cause probes (round-5): flip the suspect subsystems one at a
    # time without touching library defaults.
    if os.environ.get("PROBREG_BCPD_NO_CULL"):
        config.config.use_culled_estep = False
    if os.environ.get("PROBREG_BCPD_STASH_MB"):
        config.config.bcpd_stash_max_bytes = (
            int(os.environ["PROBREG_BCPD_STASH_MB"]) << 20)
    if os.environ.get("PROBREG_BCPD_CHUNK"):
        config.config.bcpd_guard_chunk = int(
            os.environ["PROBREG_BCPD_CHUNK"])
    print(f"backend={jax.default_backend()} n={n} "
          f"culled={config.config.use_culled_estep} "
          f"stash_bytes={config.config.bcpd_stash_max_bytes} "
          f"chunk={config.config.bcpd_guard_chunk}", flush=True)

    src = blobby_surface(n, seed=2).astype(np.float32)
    rot = np.asarray(so.euler2mat(*np.deg2rad([8.0, -4.0, 6.0])),
                     np.float32)
    defo = (0.02 * np.sin(3.0 * src[:, :1])
            * np.array([[1.0, 0.5, -0.3]])).astype(np.float32)
    tgt = ((src + defo) @ rot.T).astype(np.float32)

    before = nn_rmse_sub(src, tgt)
    print(f"nn-rmse before: {before:.4f}", flush=True)

    kw = dict(maxiter=50, tol=1e-4, rank=64, levels=4)
    t0 = time.time()
    res = pyramid.registration_bcpd_pyramid(src, tgt, **kw)
    moved = np.asarray(res.transform(src))
    wall = time.time() - t0
    after = nn_rmse_sub(moved, tgt)
    print(json.dumps({
        "metric": f"bcpd_guarded_{n // 1000}k_s", "value": round(wall, 1),
        "unit": "s", "nn_rmse_before": round(before, 4),
        "nn_rmse_after": round(after, 4),
    }), flush=True)


if __name__ == "__main__":
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))  # repo root
    main()
