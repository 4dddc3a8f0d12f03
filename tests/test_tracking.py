"""RigidTracker: warm-started sequence registration."""

import numpy as np
import pytest

from probreg_tpu import tracking
from probreg_tpu import se3_op as so


def _sequence(rng, n=1200, n_frames=8, step_deg=2.0, step_t=0.02):
    """Rigidly drifting cloud; returns (frames, true world poses)."""
    from probreg_tpu.utils.datagen import blobby_surface

    base = blobby_surface(n, seed=int(rng.integers(0, 2 ** 31)))
    frames = [base]
    poses = [(np.eye(3), np.zeros(3))]
    for _ in range(n_frames - 1):
        d_rot = np.asarray(so.euler2mat(
            *np.deg2rad(rng.uniform(-step_deg, step_deg, 3))))
        d_t = rng.uniform(-step_t, step_t, 3)
        r, t = poses[-1]
        r_new, t_new = d_rot @ r, d_rot @ t + d_t
        poses.append((r_new, t_new))
        frames.append((base @ r_new.T + t_new).astype(np.float32))
    return frames, poses


@pytest.mark.parametrize("algorithm", ["cpd", "filterreg", "icp"])
def test_tracker_frame_to_frame(rng, algorithm):
    frames, poses = _sequence(rng)
    kw = {"maxiter": 40, "tol": 1e-8}
    if algorithm == "filterreg":
        kw["sigma2_decay"] = 0.9
    trk = tracking.RigidTracker(algorithm=algorithm, **kw)
    for f in frames:
        pose = trk.update(f)
    r_true, t_true = poses[-1]
    err = float(np.asarray(so.rotation_angle(
        np.asarray(pose.rot), r_true.astype(np.float32))))
    assert err < 2e-2, err
    np.testing.assert_allclose(np.asarray(pose.t), t_true, atol=2e-2)
    assert trk.n_frames == len(frames)


def test_tracker_keyframe_no_drift(rng):
    frames, poses = _sequence(rng, n_frames=6)
    trk = tracking.RigidTracker(mode="keyframe", maxiter=40, tol=1e-8)
    for f in frames:
        pose = trk.update(f)
    r_true, t_true = poses[-1]
    err = float(np.asarray(so.rotation_angle(
        np.asarray(pose.rot), r_true.astype(np.float32))))
    assert err < 1e-2, err
    np.testing.assert_allclose(np.asarray(pose.t), t_true, atol=1e-2)


def test_tracker_reset_and_guards(rng):
    frames, _ = _sequence(rng, n=300, n_frames=2)
    trk = tracking.RigidTracker(maxiter=10)
    with pytest.raises(RuntimeError):
        _ = trk.pose
    trk.update(frames[0])
    np.testing.assert_allclose(np.asarray(trk.pose.rot), np.eye(3))
    trk.update(frames[1])
    trk.reset()
    assert trk.n_frames == 0
    with pytest.raises(ValueError):
        tracking.RigidTracker(algorithm="nope")
    with pytest.raises(ValueError):
        tracking.RigidTracker(mode="nope")


def test_tracker_filterreg_default_kwargs_sigma2_bounded(rng):
    # Without annealing, registration_filterreg echoes its input sigma2;
    # the tracker must not compound the inflation (2^k growth diverged
    # the pose before the fix).
    frames, poses = _sequence(rng, n=800, n_frames=6)
    trk = tracking.RigidTracker(algorithm="filterreg", maxiter=30,
                                tol=1e-8)
    for f in frames:
        pose = trk.update(f)
    assert trk._sigma2 is not None and trk._sigma2 < 10.0
    r_true, t_true = poses[-1]
    err = float(np.asarray(so.rotation_angle(
        np.asarray(pose.rot), r_true.astype(np.float32))))
    assert err < 5e-2, err


def test_tracker_keyframe_n_starts(rng):
    # The docstring recommends keyframe + n_starts; n_starts must apply
    # to the first solve only (it is incompatible with warm starts).
    frames, poses = _sequence(rng, n=600, n_frames=4)
    trk = tracking.RigidTracker(mode="keyframe", maxiter=30, tol=1e-8,
                                n_starts=4)
    for f in frames:
        pose = trk.update(f)
    r_true, _ = poses[-1]
    err = float(np.asarray(so.rotation_angle(
        np.asarray(pose.rot), r_true.astype(np.float32))))
    assert err < 5e-2, err
