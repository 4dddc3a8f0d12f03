"""Batch L2-dist registration: B cloud pairs in ONE compiled program.

New capability vs the reference (its l2dist_regs registers one pair per
process): `registration_gmmreg_batch` / `registration_svr_batch` vmap the
whole fit+BFGS round over a stacked (B, N, D) batch — one dispatch, B
transformations. This is the TPU serving shape: amortizes dispatch latency
and keeps the MXU busy across pairs.
"""

import time

import numpy as np
import utils

from probreg_tpu import l2dist_regs, se3_op


def main():
    source = utils.prepare_source_and_target_rigid_3d(
        utils.DATA_DIR + "/bunny.pcd", orientation=np.zeros(3),
        voxel_size=0.005)[0]
    source = np.asarray(source, np.float32)

    rng = np.random.default_rng(0)
    B = 16
    angs = rng.uniform(-np.pi / 12, np.pi / 12, size=(B, 3))
    sources = np.stack([source] * B)
    targets = np.stack([
        source @ np.asarray(se3_op.euler2mat(*a), np.float32).T for a in angs
    ])

    for name, fn, kw in (
        ("gmmreg", l2dist_regs.registration_gmmreg_batch,
         dict(n_gmm_components=200, n_starts=4)),
        # maxiter=2 annealing rounds: combined rotations near the +-15 deg
        # sampling edge need a second (annealed) round, as in the
        # single-pair path's outer loop.
        ("svr", l2dist_regs.registration_svr_batch, dict(maxiter=2)),
    ):
        fn(sources, targets, **kw)  # compile
        start = time.perf_counter()
        results = fn(sources, targets, **kw)
        elapsed = time.perf_counter() - start
        errs = [
            np.rad2deg(np.max(np.abs(np.asarray(se3_op.mat2euler(r.rot)) - a)))
            for r, a in zip(results, angs)
        ]
        print(f"{name}_batch: B={B}  {1e3 * elapsed:.1f} ms total "
              f"({1e3 * elapsed / B:.2f} ms/pair)  "
              f"max angle err {max(errs):.3f} deg")


if __name__ == "__main__":
    main()
