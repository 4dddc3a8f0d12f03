"""Benchmark: rigid CPD registration vs the reference's headline number.

Mirrors /root/reference/examples/time_measurement.py: bunny.pcd, voxel 0.005,
noise 1e-3, 10-degree z rotation, maxiter=100, tol=1e-3. The reference's CPD
time on this config is 0.0381122 s (README.md:140, 1 CPU thread).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is the speedup factor (baseline_time / our_time, >1 = faster).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_CPD_S = 0.0381122  # /root/reference/README.md:140

BUNNY = os.path.join(os.path.dirname(__file__), "data", "bunny.pcd")
if not os.path.exists(BUNNY):
    BUNNY = "/root/reference/examples/bunny.pcd"


def prepare_clouds():
    from probreg_tpu.utils import io as pio

    rng = np.random.default_rng(3)
    src = pio.read_point_cloud(BUNNY)
    src = pio.voxel_down_sample(src, 0.005)
    tgt = src.copy()
    rng.shuffle(tgt)
    tgt = tgt + 1e-3 * rng.standard_normal(tgt.shape)
    ang = np.deg2rad(10.0)
    rot = np.array(
        [[np.cos(ang), -np.sin(ang), 0.0],
         [np.sin(ang), np.cos(ang), 0.0],
         [0.0, 0.0, 1.0]]
    )
    tgt = tgt @ rot.T
    return src.astype(np.float32), tgt.astype(np.float32)


def main():
    import jax

    from probreg_tpu import cpd

    src, tgt = prepare_clouds()

    def run():
        res = cpd.registration_cpd(src, tgt, "rigid", maxiter=100, tol=0.001)
        jax.block_until_ready(res.transformation.rot)
        return res

    res = run()  # warmup: compile
    # Sanity: recovered rotation ~10 deg about z.
    from probreg_tpu.utils import se3_op

    ang = np.asarray(se3_op.mat2euler(res.transformation.rot))
    if abs(np.rad2deg(ang[2]) - 10.0) > 1.0:
        print(f"WARNING: bench recovered z-angle {np.rad2deg(ang[2]):.3f} deg",
              file=sys.stderr)

    n_rep = 10
    times = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    t = float(np.median(times))

    print(json.dumps({
        "metric": "cpd_rigid_bunny_registration_time",
        "value": t,
        "unit": "s",
        "vs_baseline": BASELINE_CPD_S / t,
    }))


if __name__ == "__main__":
    main()
