"""Closed-form symmetric 3x3 eigensolver vs jnp.linalg.eigh.

ops/sym3 replaces the iterative eigh in gmmtree's hot paths (28 ms on
v5e for a (72, 3, 3) batch — it dominated every registration).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from probreg_tpu.ops import sym3


def _batches(rng):
    r = rng.standard_normal((64, 3, 3)).astype(np.float32)
    spd = r @ np.swapaxes(r, 1, 2) + 0.1 * np.eye(3, dtype=np.float32)
    aniso = spd * np.array([1e-3, 1.0, 1e3])[:, None, None][
        np.zeros(64, int)]
    # covariance-like scales (gmmtree nodes ~ 1e-4..1e-2 variances)
    covlike = spd * 1e-3
    # rank-deficient: outer products (planar/linear node covariances)
    v = rng.standard_normal((64, 3)).astype(np.float32)
    rank1 = np.einsum("bi,bj->bij", v, v)
    iso = np.eye(3, dtype=np.float32)[None] * rng.uniform(
        0.5, 2.0, (64, 1, 1)).astype(np.float32)
    # near-degenerate: two close eigenvalues
    d = np.zeros((64, 3, 3), np.float32)
    d[:, 0, 0] = 1.0
    d[:, 1, 1] = 1.0 + 1e-6
    d[:, 2, 2] = 2.0
    qm, _ = np.linalg.qr(rng.standard_normal((64, 3, 3)))
    near = np.einsum("bij,bjk,blk->bil", qm, d, qm).astype(np.float32)
    return {"spd": spd, "aniso": aniso, "covlike": covlike,
            "rank1": rank1, "iso": iso, "near_degenerate": near}


@pytest.mark.parametrize("name", ["spd", "aniso", "covlike", "rank1",
                                  "iso", "near_degenerate"])
def test_eigh3_matches_lapack(name, rng):
    a = _batches(rng)[name]
    w_ref = np.linalg.eigvalsh(a)
    w, v = sym3.eigh3(jnp.asarray(a))
    w, v = np.asarray(w), np.asarray(v)
    scale = np.abs(w_ref).max(axis=-1, keepdims=True) + 1e-12
    # ascending eigenvalues within 1e-5 of the spectral radius
    np.testing.assert_allclose(w / scale, w_ref / scale, atol=2e-5)
    # columns orthonormal
    vtv = np.einsum("bji,bjk->bik", v, v)
    np.testing.assert_allclose(vtv, np.eye(3)[None].repeat(64, 0),
                               atol=2e-5)
    # eigen residual |A v - w v| small relative to spectral radius
    av = np.einsum("bij,bjk->bik", a, v)
    wv = v * w[:, None, :]
    assert np.abs(av - wv).max() / scale.max() < 5e-4


def test_eigvalsh3_only(rng):
    a = _batches(rng)["covlike"]
    np.testing.assert_allclose(
        np.asarray(sym3.eigvalsh3(jnp.asarray(a))), np.linalg.eigvalsh(a),
        atol=2e-5 * float(np.abs(a).max()) + 1e-7)
