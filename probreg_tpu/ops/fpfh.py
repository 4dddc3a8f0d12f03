"""Fast Point Feature Histograms (33-D), native JAX.

The reference's FPFH feature delegates to Open3D's C++ pipeline
(features.py:28-51: estimate_normals + compute_fpfh_feature). This is a
TPU-native implementation of the same descriptor (Rusu et al., ICRA 2009):

1. normals by PCA over radius-limited k-nearest neighborhoods,
2. per-pair Darboux-frame angles (alpha, phi, theta),
3. 3 x 11-bin SPFH histograms,
4. FPFH_i = SPFH_i + mean_j SPFH_j / ||p_i - p_j||.

Neighborhoods are brute-force top-k over the pairwise distance matrix —
MXU-shaped and exact; fine for probreg-scale clouds (the reference caps
neighborhoods at max_nn=30/100 anyway).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import sym3 as _sym3
from .pairwise import sqdist

_NBINS = 11


def _knn(points, k, radius):
    """(idx (N,k), valid (N,k)) nearest neighbors within radius, self excluded."""
    d2 = sqdist(points, points)
    n = points.shape[0]
    d2 = d2 + jnp.eye(n, dtype=d2.dtype) * 1e30  # exclude self
    k = min(k, n - 1)
    neg, idx = jax.lax.top_k(-d2, k)
    dist2 = -neg
    valid = dist2 <= radius * radius
    return idx, valid, jnp.sqrt(jnp.maximum(dist2, 1e-20))


def _normals(points, idx, valid):
    """PCA normals over (masked) neighborhoods, consistently oriented."""
    nbrs = points[idx]                                   # (N, k, D)
    w = valid[..., None].astype(points.dtype)
    # Open3D's radius search returns the query point itself, so its PCA
    # is over {self} u nbrs: include self in BOTH the mean and the
    # scatter (adding the self term around the neighbors-only centroid
    # tilted normals at surface edges — review finding).
    cnt = w.sum(1) + 1.0
    ctr = ((nbrs * w).sum(1) + points) / cnt
    diff = (nbrs - ctr[:, None, :]) * w
    cov = jnp.einsum("nki,nkj->nij", diff, diff)
    self_diff = points - ctr
    cov = cov + jnp.einsum("ni,nj->nij", self_diff, self_diff)
    # Closed-form 3x3 eigh (ops/sym3): jnp.linalg.eigh is iterative and
    # ~ms-scale even for small batches on TPU; per-point normal PCA is
    # (N, 3, 3). Column 0 = smallest-eigenvalue vector, same convention.
    _, vecs = _sym3.eigh3(cov)
    normals = vecs[:, :, 0]
    # Orient outward from the centroid (deterministic; Open3D orients
    # toward a direction/viewpoint).
    out = points - jnp.mean(points, axis=0)
    sign = jnp.sign(jnp.sum(normals * out, axis=1, keepdims=True))
    sign = jnp.where(sign == 0, 1.0, sign)
    return normals * sign


def _pair_angles(p, n_p, q, n_q):
    """Darboux-frame angle triplet for point pairs, batched over (..., 3).

    Includes PCL/Open3D's source-target swap (ComputePairFeatures): the
    point whose normal is better aligned with the connecting line acts
    as the frame source, with the direction negated — omitting it binned
    ~half of all pairs differently than the reference (review finding).
    """
    d = q - p
    dist = jnp.linalg.norm(d, axis=-1, keepdims=True)
    dn = d / jnp.maximum(dist, 1e-12)
    dot_p = jnp.sum(n_p * dn, axis=-1, keepdims=True)
    dot_q = jnp.sum(n_q * dn, axis=-1, keepdims=True)
    swap = jnp.abs(dot_p) < jnp.abs(dot_q)
    u = jnp.where(swap, n_q, n_p)
    nt = jnp.where(swap, n_p, n_q)
    dn = jnp.where(swap, -dn, dn)
    v = jnp.cross(dn, u)
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    w = jnp.cross(u, v)
    f1 = jnp.sum(v * nt, axis=-1)                        # alpha in [-1, 1]
    f2 = jnp.sum(u * dn, axis=-1)                        # phi   in [-1, 1]
    f3 = jnp.arctan2(jnp.sum(w * nt, axis=-1), jnp.sum(u * nt, axis=-1))
    return f1, f2, f3


def _spfh(points, normals, idx, valid):
    """(N, 33) simplified histograms; each valid neighbor votes its 3 bins."""
    p = points[:, None, :]
    q = points[idx]
    f1, f2, f3 = _pair_angles(p, normals[:, None, :], q, normals[idx])
    b1 = jnp.clip(((f1 + 1.0) * 0.5 * _NBINS).astype(jnp.int32), 0, _NBINS - 1)
    b2 = jnp.clip(((f2 + 1.0) * 0.5 * _NBINS).astype(jnp.int32), 0, _NBINS - 1)
    b3 = jnp.clip(((f3 + jnp.pi) / (2.0 * jnp.pi) * _NBINS).astype(jnp.int32),
                  0, _NBINS - 1)
    vmask = valid.astype(points.dtype)
    h1 = (jax.nn.one_hot(b1, _NBINS, dtype=points.dtype) * vmask[..., None]).sum(1)
    h2 = (jax.nn.one_hot(b2, _NBINS, dtype=points.dtype) * vmask[..., None]).sum(1)
    h3 = (jax.nn.one_hot(b3, _NBINS, dtype=points.dtype) * vmask[..., None]).sum(1)
    cnt = jnp.maximum(vmask.sum(1, keepdims=True), 1.0)
    return jnp.concatenate([h1, h2, h3], axis=1) * (100.0 / cnt)


@partial(jax.jit, static_argnames=("max_nn_normal", "max_nn_feature"))
def _fpfh_impl(points, radius_normal, radius_feature, max_nn_normal,
               max_nn_feature, normals=None):
    if normals is None:
        idx_n, valid_n, _ = _knn(points, max_nn_normal, radius_normal)
        normals = _normals(points, idx_n, valid_n)
    idx_f, valid_f, dist_f = _knn(points, max_nn_feature, radius_feature)
    # Open3D skips coincident neighbors: a duplicate point's 1/dist
    # weight otherwise reaches ~1e10 and swamps the descriptor (review
    # finding). Excluded from the SPFH votes too (pair features are
    # undefined at d = 0).
    valid_f = valid_f & (dist_f > 1e-6)
    spfh = _spfh(points, normals, idx_f, valid_f)
    # FPFH_i = SPFH_i + neighbor term: the 1/dist-weighted SPFH_j sum,
    # renormalized per 11-bin block to sum 100 (Open3D's convention —
    # dividing by the neighbor count instead made the self/neighbor
    # balance depend on the cloud's absolute scale; review finding).
    wgt = valid_f.astype(points.dtype) / jnp.maximum(dist_f, 1e-12)
    nbr_hist = jnp.einsum("nk,nkb->nb", wgt, spfh[idx_f])
    blocks = nbr_hist.reshape(-1, 3, _NBINS)
    bsum = blocks.sum(axis=2, keepdims=True)
    blocks = jnp.where(bsum > 0.0, blocks * (100.0 / jnp.maximum(
        bsum, 1e-30)), 0.0)
    return spfh + blocks.reshape(-1, 3 * _NBINS)


def fpfh(points, radius_normal: float = 0.1, radius_feature: float = 0.5,
         max_nn_normal: int = 30, max_nn_feature: int = 100, normals=None):
    """33-D FPFH descriptors for an (N, 3) cloud.

    ``normals``: optional precomputed (N, 3) unit normals — mirrors
    Open3D's ``compute_fpfh_feature``, which consumes whatever normals
    the cloud already carries. Omit to estimate them here
    (:func:`estimate_normals` semantics)."""
    points = jnp.asarray(points, jnp.float32)
    if normals is not None:
        normals = jnp.asarray(normals, jnp.float32)
    return _fpfh_impl(points, jnp.asarray(radius_normal, jnp.float32),
                      jnp.asarray(radius_feature, jnp.float32),
                      int(max_nn_normal), int(max_nn_feature),
                      normals=normals)


@partial(jax.jit, static_argnames=("max_nn",))
def _normals_impl(points, radius, max_nn):
    idx, valid, _ = _knn(points, max_nn, radius)
    return _normals(points, idx, valid)


def estimate_normals(points, radius: float = 0.1, max_nn: int = 30):
    """Per-point normals from radius-limited kNN PCA (smallest eigenvector).

    Native equivalent of the Open3D call the reference wraps at
    features.py:43-44; sign is made deterministic inside ``_normals``.
    ONE jitted dispatch (the eager chain paid a tunnel round trip per op
    — review finding).
    """
    points = jnp.asarray(points, jnp.float32)
    return _normals_impl(points, jnp.asarray(radius, jnp.float32),
                         int(max_nn))
