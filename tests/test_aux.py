"""Aux subsystems: checkpoint/resume, iteration timing, interop, io."""

import numpy as np

from probreg_tpu import cpd
from probreg_tpu.utils import checkpoint, profiling, se3_op


def test_checkpoint_roundtrip_and_resume(tmp_path, horse_cloud):
    src = np.asarray(horse_cloud, dtype=np.float32)[::2]
    ang = np.deg2rad([6.0, 0.0, 4.0])
    rot = np.asarray(se3_op.euler2mat(*ang), np.float32)
    tgt = src @ rot.T

    res = cpd.registration_cpd(src, tgt, maxiter=10, tol=0.0)
    path = str(tmp_path / "state.npz")
    checkpoint.save_state(path, res)
    back = checkpoint.load_state(path, res)
    np.testing.assert_allclose(
        np.asarray(back.transformation.rot), np.asarray(res.transformation.rot))

    # Resume from the saved transform: should converge at least as well as
    # running the remaining iterations from scratch.
    params = checkpoint.rigid_tf_init_params(res.transformation)
    res2 = cpd.registration_cpd(src, tgt, maxiter=40, tol=1e-6,
                                tf_init_params=params)
    rec = np.asarray(se3_op.mat2euler(res2.transformation.rot))
    np.testing.assert_allclose(rec, ang, atol=1e-2)


def test_iteration_timer(horse_cloud):
    src = np.asarray(horse_cloud, dtype=np.float32)[::4]
    tgt = src.copy()
    timer = profiling.IterationTimer()
    cpd.registration_cpd(src, tgt, maxiter=5, tol=0.0, callbacks=[timer])
    assert len(timer.laps) == 5
    assert timer.total > 0.0


def test_time_fn():
    import jax.numpy as jnp

    t = profiling.time_fn(lambda x: jnp.sum(x * x), jnp.ones(1000),
                          n_warmup=1, n_iter=3)
    assert t >= 0.0
