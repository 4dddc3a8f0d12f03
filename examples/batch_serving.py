"""Batch serving: every algorithm family registering B pairs in ONE program.

New capability vs the reference (one pair per call everywhere): each family
exposes a ``registration_*_batch`` entry point that vmaps the whole
registration (EM / VI / tree descent / fit+BFGS) over a stacked (B, N, D)
batch — a single XLA dispatch returns B transformations. This is the TPU
serving shape: it amortizes dispatch latency and keeps the MXU busy.
"""

import time

import numpy as np
import utils

from probreg_tpu import bcpd, cpd, filterreg, gmmtree, icp, l2dist_regs, se3_op


def nn_rmse(a, b):
    d2 = ((a[:, None] - b[None]) ** 2).sum(-1)
    return float(np.sqrt(d2.min(axis=1).mean()))


def main():
    source = utils.prepare_source_and_target_rigid_3d(
        utils.DATA_DIR + "/bunny.pcd", orientation=np.zeros(3),
        voxel_size=0.005)[0]
    source = np.asarray(source, np.float32)

    rng = np.random.default_rng(0)
    B = 8
    angs = rng.uniform(-np.pi / 18, np.pi / 18, size=(B, 3))
    sources = np.stack([source] * B)
    targets = np.stack([
        source @ np.asarray(se3_op.euler2mat(*a), np.float32).T for a in angs
    ])

    def run(name, fn, result_rot, **kw):
        warm = fn(sources, targets, **kw)  # compile
        # Force a host fetch before timing: the remote-TPU transport starts
        # in a pipelined mode where block_until_ready returns early; the
        # first fetch switches it to sync (see CLAUDE.md).
        tr0 = getattr(warm[0], "transformation", warm[0])
        np.asarray(tr0.transform(sources[0][:1]))
        start = time.perf_counter()
        results = fn(sources, targets, **kw)
        elapsed = time.perf_counter() - start
        if result_rot is None:  # nonrigid-ish: report rmse ratio
            quality = max(
                nn_rmse(np.asarray(r.transform(source)), t) / nn_rmse(source, t)
                for r, t in zip(results, targets))
            qual_str = f"worst rmse ratio {quality:.3f}"
        else:
            errs = [
                np.rad2deg(np.max(np.abs(
                    np.asarray(se3_op.mat2euler(result_rot(r))) - a)))
                for r, a in zip(results, angs)
            ]
            qual_str = f"max angle err {max(errs):.3f} deg"
        print(f"{name:18s} B={B}  {1e3 * elapsed:7.1f} ms total "
              f"({1e3 * elapsed / B:6.2f} ms/pair)  {qual_str}")

    run("icp", icp.registration_icp_batch,
        lambda r: r.transformation.rot, maxiter=30, tol=1e-9)
    run("cpd", cpd.registration_cpd_batch,
        lambda r: r.transformation.rot, maxiter=50, tol=1e-5)
    run("filterreg", filterreg.registration_filterreg_batch,
        lambda r: r.transformation.rot, maxiter=50, tol=1e-5)
    run("gmmtree", gmmtree.registration_gmmtree_batch,
        lambda r: r.transformation.rot, maxiter=30, tol=1e-6)
    run("gmmreg", l2dist_regs.registration_gmmreg_batch,
        lambda r: r.rot, n_gmm_components=200)
    run("svr", l2dist_regs.registration_svr_batch, lambda r: r.rot)
    run("bcpd", bcpd.registration_bcpd_batch, None,
        maxiter=100, tol=0.0, lmd=10.0)


if __name__ == "__main__":
    main()
