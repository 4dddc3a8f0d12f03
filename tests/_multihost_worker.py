"""Worker process for the multi-host distributed test (test_multihost.py).

Each process: CPU backend with 2 local virtual devices, joins the
coordination service via parallel.initialize_distributed, runs a sharded
rigid CPD over the 4 global devices, and writes the recovered transform.
"""

import os
import sys


def main():
    proc_id = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    outdir = sys.argv[4]

    import jax

    # The axon TPU plugin ignores JAX_PLATFORMS (CLAUDE.md); force via config
    # before any backend initialization.
    jax.config.update("jax_platforms", "cpu")

    from probreg_tpu import parallel

    parallel.initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=proc_id,
        initialization_timeout=60,
    )

    import numpy as np

    assert jax.process_count() == nproc
    assert jax.device_count() == nproc * jax.local_device_count()

    from probreg_tpu.utils import se3_op

    rng = np.random.default_rng(3)
    src = rng.uniform(-1.0, 1.0, (300, 3)).astype(np.float32)
    ang = np.deg2rad([5.0, -3.0, 9.0])
    rot = np.asarray(se3_op.euler2mat(*ang), np.float32)
    t_true = np.asarray([0.02, -0.01, 0.03], np.float32)
    tgt = src @ rot.T + t_true

    mesh = parallel.make_mesh()  # all 4 global devices
    res = parallel.registration_cpd_sharded(src, tgt, "rigid", maxiter=60,
                                            tol=1e-6, mesh=mesh)
    out_rot = np.asarray(jax.device_get(res.transformation.rot))
    out_t = np.asarray(jax.device_get(res.transformation.t))

    # 2-D (m, n) mesh across the SAME processes: the cross-device posterior
    # normalizer psums over an m-axis that spans process boundaries.
    mesh2d = parallel.make_mesh_2d(2, 2)
    res2d = parallel.registration_cpd_2d(src, tgt, "rigid", maxiter=60,
                                         tol=1e-6, mesh=mesh2d)
    rot2d = np.asarray(jax.device_get(res2d.transformation.rot))
    t2d = np.asarray(jax.device_get(res2d.transformation.t))

    # FilterReg + low-rank BCPD on the same cross-process 2-D mesh: the
    # FilterReg M-step psum_m and BCPD's den psum_m / Woodbury K x K psums
    # all cross the process boundary. BCPD needs a structured cloud (the
    # VI collapses to its initial state on uniform noise), so these cases
    # use the blobby surface fixture generator.
    from probreg_tpu.utils.datagen import blobby_surface

    src_b = blobby_surface(400, seed=7).astype(np.float32)
    tgt_b = (src_b @ rot.T + 0.02).astype(np.float32)
    res2df = parallel.registration_filterreg_2d(src_b, tgt_b, maxiter=50,
                                                tol=1e-6, sigma2_decay=0.9,
                                                mesh=mesh2d)
    rot2df = np.asarray(jax.device_get(res2df.transformation.rot))
    res2db = parallel.registration_bcpd_2d(src_b, tgt_b, maxiter=30,
                                           tol=0.0, lmd=10.0, rank=16,
                                           mesh=mesh2d)
    rot2db = np.asarray(jax.device_get(res2db.rigid_trans.rot))
    moved2db = np.asarray(res2db.transform(src_b))

    np.savez(os.path.join(outdir, f"proc{proc_id}.npz"),
             rot=out_rot, t=out_t, rot2d=rot2d, t2d=t2d,
             rot2df=rot2df, rot2db=rot2db, moved2db=moved2db,
             src_b=src_b, tgt_b=tgt_b,
             ang=ang, t_true=t_true,
             nproc=jax.process_count(), ndev=jax.device_count())
    print(f"proc {proc_id} ok", flush=True)


if __name__ == "__main__":
    main()
