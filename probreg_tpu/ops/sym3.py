"""Closed-form symmetric 3x3 eigendecomposition (batched, TPU-friendly).

``jnp.linalg.eigh`` lowers to an iterative QR/Jacobi routine that costs
~28 ms on a v5e EVEN for a (72, 3, 3) batch (measured round 5) — it was
the dominant term of every GMMTree registration and of the vmapped batch
path. Symmetric 3x3 eigenvalues have an exact trigonometric (Cardano)
form and eigenvectors follow from cross products plus a projected 2x2
solve (the robust ordering of Eberly, "A Robust Eigensolver for 3x3
Symmetric Matrices"): a handful of VPU ops per matrix, no iteration.

Conventions match ``jnp.linalg.eigh``: eigenvalues ASCENDING, the j-th
eigenvector in column ``[..., :, j]``. Eigenvector SIGNS and the basis
within degenerate eigenspaces are arbitrary (as with any eigensolver);
gmmtree's consumers use them only as an orthonormal weighting basis.

Accuracy: eigenvalues to ~1e-6 relative of the spectral radius;
eigenvectors orthonormal to f32 rounding with the residual |A v - lam v|
at the same scale (pinned vs jnp.linalg.eigh in tests/test_sym3.py,
including isotropic, near-degenerate and rank-deficient batches).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_TINY = 1e-30


def eigvalsh3(a):
    """Ascending eigenvalues of a batch of symmetric 3x3 matrices."""
    a = jnp.asarray(a)
    a00 = a[..., 0, 0]
    a11 = a[..., 1, 1]
    a22 = a[..., 2, 2]
    a01 = 0.5 * (a[..., 0, 1] + a[..., 1, 0])
    a02 = 0.5 * (a[..., 0, 2] + a[..., 2, 0])
    a12 = 0.5 * (a[..., 1, 2] + a[..., 2, 1])

    q = (a00 + a11 + a22) / 3.0
    d0, d1, d2 = a00 - q, a11 - q, a22 - q
    p2 = (d0 * d0 + d1 * d1 + d2 * d2
          + 2.0 * (a01 * a01 + a02 * a02 + a12 * a12))
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    ps = jnp.where(p > _TINY, p, 1.0)
    # det(B) / 2 with B = (A - q I) / p.
    b00, b11, b22 = d0 / ps, d1 / ps, d2 / ps
    b01, b02, b12 = a01 / ps, a02 / ps, a12 / ps
    detb = (b00 * (b11 * b22 - b12 * b12)
            - b01 * (b01 * b22 - b12 * b02)
            + b02 * (b01 * b12 - b11 * b02))
    r = jnp.clip(0.5 * detb, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    two_pi_3 = 2.0943951023931953
    lam_hi = q + 2.0 * p * jnp.cos(phi)
    lam_lo = q + 2.0 * p * jnp.cos(phi + two_pi_3)
    lam_mid = 3.0 * q - lam_hi - lam_lo
    iso = p <= _TINY
    lam_hi = jnp.where(iso, q, lam_hi)
    lam_mid = jnp.where(iso, q, lam_mid)
    lam_lo = jnp.where(iso, q, lam_lo)
    return jnp.stack([lam_lo, lam_mid, lam_hi], axis=-1)


def _cross(u, v):
    return jnp.stack([
        u[..., 1] * v[..., 2] - u[..., 2] * v[..., 1],
        u[..., 2] * v[..., 0] - u[..., 0] * v[..., 2],
        u[..., 0] * v[..., 1] - u[..., 1] * v[..., 0],
    ], axis=-1)


def _normalize(v, fallback):
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    ok = n2 > _TINY
    v = jnp.where(ok, v / jnp.sqrt(jnp.where(ok, n2, 1.0)), fallback)
    return v


def eigh3(a):
    """(eigenvalues ascending, eigenvectors in columns) for symmetric 3x3.

    Batched over leading dims. Same contract as ``jnp.linalg.eigh`` up to
    eigenvector sign / degenerate-subspace basis choice.
    """
    a = jnp.asarray(a)
    w = eigvalsh3(a)                                        # (..., 3)
    lam2 = w[..., 2]

    # v2 (largest eigenvalue): the two largest-cross-product rows of
    # A - lam2 I span its null space's complement.
    rows = a - lam2[..., None, None] * jnp.eye(3, dtype=a.dtype)
    r0, r1, r2 = rows[..., 0, :], rows[..., 1, :], rows[..., 2, :]
    c01 = _cross(r0, r1)
    c12 = _cross(r1, r2)
    c20 = _cross(r2, r0)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    n20 = jnp.sum(c20 * c20, axis=-1)
    best12 = n12 >= jnp.maximum(n01, n20)
    best20 = jnp.logical_and(~best12, n20 >= n01)
    v2 = jnp.where(best12[..., None], c12,
                   jnp.where(best20[..., None], c20, c01))
    ex = jnp.zeros_like(v2).at[..., 0].set(1.0)
    v2 = _normalize(v2, ex)

    # Orthonormal complement (u, t) of v2 (branch on the largest |comp|).
    ax = jnp.abs(v2[..., 0])
    az = jnp.abs(v2[..., 2])
    pick_x = ax >= az
    helper = jnp.where(
        pick_x[..., None],
        jnp.zeros_like(v2).at[..., 2].set(1.0),
        jnp.zeros_like(v2).at[..., 0].set(1.0))
    u = _normalize(_cross(v2, helper), ex)
    t = _cross(v2, u)

    # Projected 2x2 eigenproblem for the SMALLEST eigenvalue lam0.
    lam0 = w[..., 0]
    au = jnp.einsum("...ij,...j->...i", a, u)
    at = jnp.einsum("...ij,...j->...i", a, t)
    m00 = jnp.sum(u * au, axis=-1) - lam0
    m01 = jnp.sum(u * at, axis=-1)
    m11 = jnp.sum(t * at, axis=-1) - lam0
    # (M - lam0 I) c = 0: pick the larger row for stability.
    row0 = jnp.abs(m00) >= jnp.abs(m11)
    cu = jnp.where(row0, -m01, m11)
    ct = jnp.where(row0, m00, -m01)
    cn2 = cu * cu + ct * ct
    degen = cn2 <= _TINY                                    # M ~ lam0 I
    cu = jnp.where(degen, 1.0, cu)
    ct = jnp.where(degen, 0.0, ct)
    v0 = cu[..., None] * u + ct[..., None] * t
    v0 = _normalize(v0, u)
    v1 = _cross(v2, v0)

    vecs = jnp.stack([v0, v1, v2], axis=-1)                 # cols = vecs
    # Rayleigh-quotient refinement: the f32 trigonometric eigenvalues
    # carry ~1e-4-relative error near multiple roots (acos conditioning);
    # v^T A v from the computed vectors is quadratically accurate in the
    # vector error and lands at ~1e-6 relative (measured vs LAPACK).
    av = jnp.einsum("...ij,...jk->...ik", a, vecs)
    w = jnp.einsum("...ik,...ik->...k", vecs, av)
    return w, vecs
