"""Edge-case sweep across all registration families.

The reference has no robustness tests; these guard the numerical-guard
paths (eps floors, masks, degenerate geometry) listed in SURVEY.md §5.
"""

import numpy as np
import pytest

from probreg_tpu import bcpd, cpd, filterreg, gmmtree, l2dist_regs


def tiny_cloud(rng, n=6, d=3):
    return (rng.normal(size=(n, d)) * 0.3).astype(np.float32)


def test_cpd_rigid_tiny_cloud(rng):
    src = tiny_cloud(rng)
    res = cpd.registration_cpd(src, src.copy(), maxiter=10)
    assert np.isfinite(np.asarray(res.transformation.rot)).all()


def test_cpd_identical_clouds_is_identity(rng):
    src = tiny_cloud(rng, n=50)
    res = cpd.registration_cpd(src, src.copy(), maxiter=30, tol=1e-9)
    np.testing.assert_allclose(
        np.asarray(res.transformation.rot), np.eye(3), atol=1e-3)
    np.testing.assert_allclose(np.asarray(res.transformation.t), 0.0,
                               atol=1e-4)


def test_cpd_high_outlier_weight(rng):
    src = tiny_cloud(rng, n=80)
    tgt = np.concatenate([src, rng.uniform(-2, 2, (40, 3)).astype(np.float32)])
    res = cpd.registration_cpd(src, tgt, w=0.8, maxiter=30)
    assert np.isfinite(np.asarray(res.transformation.rot)).all()
    assert np.isfinite(float(res.sigma2))


def test_cpd_2d(rng):
    src = tiny_cloud(rng, n=60, d=2)
    ang = 0.15
    rot = np.array([[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]],
                   np.float32)
    res = cpd.registration_cpd(src, src @ rot.T, maxiter=50, tol=1e-6)
    np.testing.assert_allclose(np.asarray(res.transformation.rot), rot,
                               atol=1e-2)


def test_cpd_collinear_points(rng):
    # Degenerate geometry: points on a line; must not NaN.
    t = np.linspace(0, 1, 40, dtype=np.float32)
    src = np.stack([t, 2 * t, -t], 1)
    src += 1e-3 * rng.standard_normal(src.shape).astype(np.float32)
    res = cpd.registration_cpd(src, src.copy(), maxiter=10)
    assert np.isfinite(np.asarray(res.transformation.rot)).all()


def test_cpd_mismatched_sizes(rng):
    src = tiny_cloud(rng, n=30)
    tgt = tiny_cloud(rng, n=77)
    res = cpd.registration_cpd(src, tgt, maxiter=10)
    assert np.isfinite(np.asarray(res.transformation.rot)).all()


def test_filterreg_far_apart_clouds(rng):
    # No overlap at all: m0 ~ 0 everywhere; must not NaN (kabsch guard).
    src = tiny_cloud(rng, n=40)
    tgt = tiny_cloud(rng, n=40) + 100.0
    res = filterreg.registration_filterreg(src, tgt, sigma2=1e-4, maxiter=5)
    assert np.isfinite(np.asarray(res.transformation.rot)).all()


def test_filterreg_w_outliers(rng):
    src = tiny_cloud(rng, n=60)
    tgt = np.concatenate([src, rng.uniform(-2, 2, (30, 3)).astype(np.float32)])
    res = filterreg.registration_filterreg(src, tgt, w=0.5, maxiter=20)
    assert np.isfinite(np.asarray(res.transformation.rot)).all()


def test_bcpd_tiny(rng):
    src = tiny_cloud(rng, n=12)
    res = bcpd.registration_bcpd(src, src.copy(), maxiter=5)
    assert np.isfinite(np.asarray(res.rigid_trans.rot)).all()


def test_gmmtree_small_cloud(rng):
    # Fewer points than leaves (64): pruning must handle empty nodes.
    src = tiny_cloud(rng, n=40)
    res = gmmtree.registration_gmmtree(src, src.copy(), maxiter=5)
    assert np.isfinite(np.asarray(res.transformation.rot)).all()


def test_svr_small_cloud(rng):
    src = tiny_cloud(rng, n=25)
    res = l2dist_regs.registration_svr(src, src.copy(), opt_maxiter=10)
    assert np.isfinite(np.asarray(res.rot)).all()


def test_gmmreg_components_clamp(rng):
    # n_gmm_components > 0.8*n triggers the reference's clamp path.
    src = tiny_cloud(rng, n=20)
    res = l2dist_regs.registration_gmmreg(src, src.copy(),
                                          n_gmm_components=800)
    assert np.isfinite(np.asarray(res.rot)).all()


def test_nonrigid_lowrank_with_outliers(rng):
    """Low-rank nonrigid CPD with outlier weight w>0 stays finite and
    improves alignment despite injected clutter."""
    g = np.linspace(0, 1, 20)
    xx, yy = np.meshgrid(g, g)
    src = np.stack([xx, yy], -1).reshape(-1, 2).astype(np.float32)
    disp = 0.08 * np.stack(
        [np.sin(np.pi * yy), np.cos(np.pi * xx)], -1).reshape(-1, 2)
    tgt = src + disp.astype(np.float32)
    clutter = rng.uniform(-0.5, 1.5, size=(60, 2)).astype(np.float32)
    tgt_noisy = np.concatenate([tgt, clutter], axis=0)
    res = cpd.registration_cpd(
        src, tgt_noisy, tf_type_name="nonrigid", w=0.2, maxiter=30,
        beta=0.5, rank=30)
    moved = np.asarray(res.transformation.transform(src))
    assert np.isfinite(moved).all()
    before = np.abs(src - tgt).mean()
    after = np.abs(moved - tgt).mean()
    assert after < before


def test_nonrigid_lowrank_rank_exceeds_m(rng):
    """rank > M clamps to M and still works (full-rank Nystrom)."""
    src = tiny_cloud(rng, n=12, d=3)
    tgt = src + 0.02
    res = cpd.registration_cpd(
        src, tgt, tf_type_name="nonrigid", maxiter=10, rank=100)
    assert np.isfinite(np.asarray(res.transformation.transform(src))).all()


def test_bcpd_lowrank_with_outliers(rng):
    src = tiny_cloud(rng, n=40)
    tgt = np.concatenate(
        [src + 0.01, rng.uniform(-1, 1, size=(10, 3)).astype(np.float32)])
    res = bcpd.registration_bcpd(src, tgt, w=0.1, maxiter=20, rank=20)
    assert np.isfinite(np.asarray(res.transform(src))).all()


def test_bcpd_huge_n_guard_raises(rng, monkeypatch):
    """Above config.bcpd_guard_max_pairs a long unmeshed whole-VI dispatch
    must raise the safety error (1M-class BCPD faulted v5e workers) —
    never reach the device."""
    import jax

    from probreg_tpu import config as cfg

    src = tiny_cloud(rng, n=30)
    monkeypatch.setattr(cfg.config, "bcpd_guard_max_pairs", 100)
    monkeypatch.setattr(cfg.config, "use_culled_estep", False)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    with pytest.raises(ValueError, match="bcpd_guard_max_pairs"):
        bcpd.registration_bcpd(src, src, maxiter=20, rank=8)
    # Short programs (maxiter <= bcpd_guard_chunk) stay allowed: they are
    # what the pyramid's auto-applied dispatch_chunk emits.
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    res = bcpd.registration_bcpd(src, src, maxiter=20, rank=8)
    assert np.isfinite(np.asarray(res.transform(src))).all()


def test_bcpd_pyramid_guard_auto_chunks(rng, monkeypatch):
    """The BCPD pyramid auto-applies dispatch_chunk above the guard
    threshold instead of raising — a 1M request completes (slower)."""
    import jax

    from probreg_tpu import config as cfg, pyramid

    calls = []
    from probreg_tpu import bcpd as _bcpd

    orig = _bcpd._registration_bcpd_impl

    def spy(*args, **kwargs):
        calls.append(kwargs.get("maxiter"))
        return orig(*args, **kwargs)

    monkeypatch.setattr(_bcpd, "_registration_bcpd_impl", spy)
    monkeypatch.setattr(cfg.config, "bcpd_guard_max_pairs", 1000)
    monkeypatch.setattr(cfg.config, "use_culled_estep", False)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    src = tiny_cloud(rng, n=120)
    tgt = src + 0.01
    res = pyramid.registration_bcpd_pyramid(
        src, tgt, maxiter=12, tol=0.0, rank=8, levels=2, coarse_points=20)
    assert np.isfinite(np.asarray(res.transform(src))).all()
    # Every dispatched program was capped at bcpd_guard_chunk iterations.
    assert calls and all(mi <= cfg.config.bcpd_guard_chunk for mi in calls)


def test_bcpd_multistart_guard(rng, monkeypatch):
    """The hardware guard also covers the n_starts > 1 dispatch (an
    n_starts-fold HEAVIER unmeshed whole-VI program; review finding)."""
    import jax

    from probreg_tpu import config as cfg

    src = tiny_cloud(rng, n=30)
    monkeypatch.setattr(cfg.config, "bcpd_guard_max_pairs", 100)
    monkeypatch.setattr(cfg.config, "use_culled_estep", False)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    with pytest.raises(ValueError, match="multistart"):
        bcpd.registration_bcpd(src, src, maxiter=20, rank=8, n_starts=4)


def test_bcpd_pyramid_guard_rejects_oversize_chunk(rng, monkeypatch):
    """A user dispatch_chunk above bcpd_guard_chunk fails BEFORE any level
    runs (the mid-run _registration_jit guard would otherwise discard the
    completed coarse levels; review finding)."""
    import jax

    from probreg_tpu import config as cfg, pyramid

    monkeypatch.setattr(cfg.config, "bcpd_guard_max_pairs", 1000)
    monkeypatch.setattr(cfg.config, "use_culled_estep", False)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    src = tiny_cloud(rng, n=120)
    with pytest.raises(ValueError, match="bcpd_guard_chunk"):
        pyramid.registration_bcpd_pyramid(
            src, src + 0.01, maxiter=12, rank=8, levels=2,
            coarse_points=20, dispatch_chunk=8)


def test_pyramid_multistart_rejects_callbacks(rng):
    """n_starts + callbacks fails at the pyramid entry with a clear
    message, not deep inside the level-0 registration (review finding)."""
    from probreg_tpu import pyramid

    src = tiny_cloud(rng, n=60)
    with pytest.raises(ValueError, match="callbacks"):
        pyramid.registration_cpd_pyramid(
            src, src + 0.01, "rigid", n_starts=4, callbacks=[print])
    with pytest.raises(ValueError, match="callbacks"):
        pyramid.registration_filterreg_pyramid(
            src, src + 0.01, n_starts=4, callbacks=[print])


def test_nonrigid_tracker_inflation_without_floor(rng):
    """sigma2_floor_frac=0 disables only the floor; the documented
    sigma2_inflation still applies (review finding)."""
    from probreg_tpu import tracking

    trk = tracking.NonrigidTracker(maxiter=4, tol=0.0, rank=8,
                                   sigma2_inflation=3.0,
                                   sigma2_floor_frac=0.0)
    src = tiny_cloud(rng, n=40)
    trk.update(src)
    trk.update(src + 0.01)
    s2_carry = trk._warm["sigma2_init"]
    captured = {}

    from probreg_tpu import bcpd as _bcpd

    real = _bcpd._registration_bcpd_impl

    def spy(*a, **k):
        captured["sigma2_init"] = k.get("sigma2_init")
        return real(*a, **k)

    _bcpd._registration_bcpd_impl = spy
    try:
        trk.update(src + 0.02)
    finally:
        _bcpd._registration_bcpd_impl = real
    assert captured["sigma2_init"] == pytest.approx(3.0 * s2_carry)

def test_bcpd_batch_paths_guarded(rng, monkeypatch):
    """The hardware guard covers EVERY BCPD dispatch surface: the vmapped
    dense batch, the ragged batch and the multistart batch are unslicable
    whole-VI programs whose TOTAL pair count must be bounded (review
    finding: they previously bypassed the guard entirely)."""
    import jax

    from probreg_tpu import config as cfg

    src = tiny_cloud(rng, n=30)
    monkeypatch.setattr(cfg.config, "bcpd_guard_max_pairs", 2000)
    monkeypatch.setattr(cfg.config, "use_culled_estep", False)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # Dense batch: B * M * N = 4 * 900 > 2000 even though M * N = 900 is
    # itself under the bound.
    with pytest.raises(ValueError, match="bcpd_guard_max_pairs"):
        bcpd.registration_bcpd_batch([src] * 4, [src] * 4, maxiter=3,
                                     rank=8)
    # Ragged batch (padded sizes count).
    with pytest.raises(ValueError, match="bcpd_guard_max_pairs"):
        bcpd.registration_bcpd_batch([src, src[:20], src], [src] * 3,
                                     maxiter=3, rank=8)
    # Multistart batch: the orientation grid multiplies the load.
    with pytest.raises(ValueError, match="bcpd_guard_max_pairs"):
        bcpd.registration_bcpd_batch([src] * 2, [src] * 2, maxiter=3,
                                     rank=8, n_starts=2)
    # Under the bound everything still runs (on CPU here).
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    out = bcpd.registration_bcpd_batch([src] * 2, [src] * 2, maxiter=3,
                                       rank=8)
    assert len(out) == 2
