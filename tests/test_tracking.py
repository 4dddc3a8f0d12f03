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


def test_nonrigid_tracker_deforming_sequence(rng):
    """12-frame deforming sequence: the warm-started template tracker
    recovers each frame's deformation at a small per-frame budget, and is
    faster AND tighter than re-running BCPD cold per pair at the same
    budget (the full-VI-state warm start skips the start-temperature
    regime; cold solves burn the budget annealing)."""
    import time

    from probreg_tpu import bcpd, tracking
    from probreg_tpu.utils.datagen import blobby_surface

    template = blobby_surface(800, seed=3).astype(np.float32)
    frames = []
    for k in range(1, 13):
        # Temporally coherent deformation: amplitude grows and the phase
        # drifts slowly (a tracker presumes frame-to-frame coherence).
        a = 0.02 * k
        defo = (a * np.sin(2.5 * template[:, :1] + 0.1 * k)
                * np.array([[1.0, 0.6, -0.4]])).astype(np.float32)
        frames.append((template + defo).astype(np.float32))

    kw = dict(maxiter=16, tol=1e-6, lmd=10.0, rank=32)
    trk = tracking.NonrigidTracker(**kw)
    trk.update(template)
    # Cold comparison = per-pair re-registration at the FULL default
    # budget: the reference's usage pattern (re-run registration_bcpd per
    # pair, reference bcpd.py:159) and what it takes to match warm
    # quality from the start temperature. Warm and cold solves are
    # INTERLEAVED so background load (xdist workers) hits both equally.
    bcpd.registration_bcpd(template, frames[0], maxiter=50, tol=1e-6,
                           lmd=10.0, rank=32)  # compile outside the clock
    warm_rmse, cold_rmse = [], []
    t_warm = t_cold = 0.0
    for f in frames:
        t0 = time.perf_counter()
        res = trk.update(f)
        t_warm += time.perf_counter() - t0
        warm_rmse.append(_nn_rmse(np.asarray(res.transform(template)), f))
        t0 = time.perf_counter()
        res = bcpd.registration_bcpd(template, f, maxiter=50, tol=1e-6,
                                     lmd=10.0, rank=32)
        t_cold += time.perf_counter() - t0
        cold_rmse.append(_nn_rmse(np.asarray(res.transform(template)), f))
    assert trk.n_frames == 13

    base = [_nn_rmse(template, f) for f in frames]
    # Warm tracking recovers the deformation on every frame once the carry
    # is established (frame 1 is necessarily a cold solve — and its
    # deformation is a fraction of the later frames'). Per-frame bar is
    # 0.7x: the BCPD result is the best state VISITED on a chaotic f32 VI
    # trajectory (bcpd.py), so any rounding-level change (e.g. the round-5
    # residual-form sigma2) legitimately shifts single frames by ~20%; the
    # tight quality claim is the 0.45x AGGREGATE bar below.
    assert all(w < 0.7 * b
               for w, b in zip(warm_rmse[1:], base[1:])), (warm_rmse, base)
    assert np.mean(warm_rmse[1:]) < 0.45 * np.mean(base[1:]), (
        warm_rmse, base)
    # ...approaching full-budget (50-iteration) cold quality with a 16-
    # iteration budget, at a fraction of the wall time (the VI never
    # revisits the start-temperature regime). 1.5x margin: both RMSE
    # means sit on chaotic best-visited f32 trajectories (measured 1.2-
    # 1.35x across rounding-level code changes).
    assert np.mean(warm_rmse) < 1.5 * np.mean(cold_rmse) + 1e-4
    # Wall-time advantage is asserted on CPU: on the remote-TPU harness
    # BOTH loops are dominated by the ~33 ms/dispatch tunnel RTT at this
    # tiny frame size, so the device-time saving the warm start buys is
    # invisible (and scheduling noise flips the comparison).
    import jax

    if jax.default_backend() == "cpu":
        assert t_warm < t_cold, (t_warm, t_cold)


def _nn_rmse(a, b):
    d2 = ((a[:, None] - b[None]) ** 2).sum(-1)
    return float(np.sqrt(d2.min(axis=1).mean()))


def test_keyframe_auto_rekey_partial_view_rotation(rng):
    """Keyframe mode on a long PARTIAL-VIEW rotating sequence (a fixed
    camera sees the +x half of a rotating object): overlap between the
    fixed keyframe and new frames shrinks with angle, so the keyframe
    solve degrades and the quality monitor must re-key. With auto
    re-keying the composed world pose stays near ground truth across 192
    degrees; without it the track diverges (measured: drifts to ~pi)."""
    from probreg_tpu import se3_op as so
    from probreg_tpu import tracking
    from probreg_tpu.utils.datagen import blobby_surface

    cloud = blobby_surface(1600, seed=9).astype(np.float32)
    step = np.deg2rad(12.0)
    n_frames = 16   # 192 deg total
    frames = []
    rots = []
    for k in range(1, n_frames + 1):
        rot = np.asarray(so.euler2mat(0.0, 0.0, step * k), np.float32)
        rots.append(rot)
        f = (cloud @ rot.T).astype(np.float32)
        frames.append(f[f[:, 0] > np.median(f[:, 0])])
    f0 = cloud[cloud[:, 0] > np.median(cloud[:, 0])]

    trk = tracking.RigidTracker(mode="keyframe", maxiter=40, tol=1e-6,
                                w=0.3)
    trk.update(f0)
    for f in frames:
        pose = trk.update(f)
    err = float(so.rotation_angle(np.asarray(pose.rot), rots[-1]))
    assert trk.n_rekeys >= 1
    assert err < 0.25, (err, trk.n_rekeys)

    # Without re-keying the same sequence diverges (sanity: the feature
    # matters) — the fixed keyframe's overlap with late frames vanishes.
    trk0 = tracking.RigidTracker(mode="keyframe", maxiter=40, tol=1e-6,
                                 w=0.3, rekey_rmse=None)
    trk0.update(f0)
    for f in frames:
        pose0 = trk0.update(f)
    err0 = float(so.rotation_angle(np.asarray(pose0.rot), rots[-1]))
    assert err0 > 1.0
    assert trk0.n_rekeys == 0

def test_nonrigid_tracker_rejects_reserved_kwargs():
    """The tracker drives callbacks/return_last/warm-state kwargs itself;
    passing them at construction must fail clearly, not crash mid-update
    with a duplicate-keyword TypeError (review finding)."""
    for bad in ("callbacks", "callback_chunk", "return_last",
                "tf_init_params", "v_init", "sigma2_init"):
        with pytest.raises(ValueError, match="NonrigidTracker"):
            tracking.NonrigidTracker(**{bad: object()})


def test_nonrigid_tracker_n_starts_first_solve_only(rng):
    """n_starts applies to the first registered frame only; later frames
    must (a) not crash on the warm-start incompatibility and (b) keep the
    orientation the multistart found (the multistart path returns no VI
    state, so the pose itself must seed the next frame)."""
    from probreg_tpu import bcpd as _bcpd
    from probreg_tpu.utils.datagen import blobby_surface

    template = blobby_surface(500, seed=7).astype(np.float32)
    rot = np.asarray(so.euler2mat(0.0, 0.0, np.deg2rad(150.0)))
    frames = [(template @ rot.T).astype(np.float32),
              (template @ rot.T + 0.01).astype(np.float32)]

    seen = []
    orig = _bcpd._registration_bcpd_impl

    def spy(*args, **kwargs):
        seen.append(dict(kwargs))
        return orig(*args, **kwargs)

    _bcpd._registration_bcpd_impl, saved = spy, orig
    try:
        trk = tracking.NonrigidTracker(maxiter=50, tol=1e-6, rank=16,
                                       lmd=1e3, n_starts=6)
        trk.update(template)
        res1 = trk.update(frames[0])
        res2 = trk.update(frames[1])
    finally:
        _bcpd._registration_bcpd_impl = saved
    assert seen[0].get("n_starts") == 6
    assert "n_starts" not in seen[1]
    # Frame 2 warm-starts from frame 1's recovered pose (not identity).
    p = seen[1].get("tf_init_params")
    assert p is not None and np.allclose(p["rot"], np.asarray(
        res1.rigid_trans.rot))
    # Quality: the orientation search must beat the identity-start solve
    # (which stalls near the 150-degree local minimum) and the carry must
    # hold frame 2 at frame-1 quality. NN-RMSE is the right criterion for
    # a nonrigid solver (the rotation/deformation split is ambiguous).
    base = _nn_rmse(template, frames[0])
    r1 = _nn_rmse(np.asarray(res1.transform(template)), frames[0])
    r2 = _nn_rmse(np.asarray(res2.transform(template)), frames[1])
    assert r1 < 0.6 * base, (r1, base)
    assert r2 < 1.25 * r1 + 1e-3, (r2, r1)
