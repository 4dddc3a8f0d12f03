"""Low-rank (Nystrom) kernel factorizations and Woodbury solves.

The reference materializes the full M x M Gram matrix for nonrigid CPD
(reference cpd.py:284-303 solves ((p1.G)+lmd s2 I) W = rhs) and explicitly
inverts M x M matrices for BCPD (reference bcpd.py:114,130-131). Both are
O(M^2) memory / O(M^3) compute — the reference's weakest scaling axis
(SURVEY.md 3.4). Here the smooth kernels (RBF / inverse multiquadric) are
factored once as G ~= U diag(lam) U^T with U orthonormal (M x K), after
which every per-iteration solve collapses to a K x K system via the
Woodbury identity:

    (c I + diag(d) U L U^T)^-1 r
        = (r - diag(d) U (c I_K + L U^T diag(d) U)^-1 L U^T r) / c

This is the classical low-rank CPD variant (Myronenko & Song, TPAMI 2010,
sec. 4; BCPD++ uses the same device for its Sigma update). TPU-wise the
apply is two (M, K) matmuls — MXU-friendly skinny GEMMs — instead of an
O(M^3) factorization that XLA would run on the VPU.

Landmark choice is a deterministic uniform stride: for the smooth, rapidly
mixing kernels used here the Nystrom error is governed by fill distance,
and a stride over (arbitrarily ordered) cloud points behaves like a uniform
random subset without spending a host RNG round-trip.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import pairwise

_EPS = 1e-7


def nystrom_eig(points: jax.Array, kernel_fn, rank: int,
                oversample: float = 2.0, valid=None, max_landmarks=None):
    """Rank-``rank`` eigenfactorization G ~= U diag(lam) U^T of a Gram matrix.

    ``kernel_fn(a, b) -> (len(a), len(b))`` must be a PSD kernel map.
    Returns ``(u, lam)`` with ``u`` (M, rank) orthonormal and ``lam`` (rank,)
    nonnegative, sorted descending.

    ``oversample``: use ceil(oversample * rank) landmarks and truncate the
    SVD back to ``rank`` — halves the Nystrom error of plain rank-K
    landmarking (measured on RBF/normal clouds) for an O(K^2) -> O((2K)^2)
    one-time cost.

    Cost: O(M K) kernel evals + O(M K^2) for the thin SVD; never forms the
    M x M matrix.
    """
    m = points.shape[0]
    rank = min(int(rank), m)
    ell = min(int(np.ceil(rank * oversample)), m)
    if max_landmarks is not None:
        # Ragged batches: ell is a shared static, so cap it by the batch's
        # smallest TRUE count — a traced stride over fewer valid points than
        # ell would emit duplicate landmarks (singular K_kk, degraded
        # factors). The smallest pair then gets exactly its unpadded
        # landmark set; larger pairs get (at most) slightly fewer landmarks.
        ell = min(ell, int(max_landmarks))
    if valid is None:
        idx = jnp.round(jnp.linspace(0, m - 1, ell)).astype(jnp.int32)
    else:
        # Ragged padding: valid points come first (utils.interop.pad_ragged),
        # so a traced-stride over [0, m_valid) picks only valid landmarks.
        m_valid = jnp.sum(valid)
        # maximum(. , 0): an all-padding (empty) batch entry would give
        # idx = -1 and silently gather the last pad row as every landmark
        # (review finding).
        idx = jnp.round(jnp.linspace(0.0, 1.0, ell)
                        * jnp.maximum(m_valid - 1.0, 0.0)).astype(jnp.int32)
    landmarks = points[idx]
    kmk = kernel_fn(points, landmarks)                     # (M, L)
    kkk = kernel_fn(landmarks, landmarks)                  # (L, L)
    e, v = jnp.linalg.eigh(kkk)
    # Floor tiny/negative eigenvalues: duplicate landmarks or numerically
    # flat kernels make K_kk rank-deficient; the floored directions get a
    # negligible weight in phi rather than an exploding one.
    e = jnp.maximum(e, _EPS * jnp.max(e))
    phi = kmk @ (v / jnp.sqrt(e)[None, :])                 # (M, L), G ~= phi phi^T
    if valid is not None:
        # Zero padded rows BEFORE the SVD: the factors then approximate the
        # valid block of G exactly, with u identically zero on padded rows.
        phi = phi * valid[:, None]
    u, s, _ = jnp.linalg.svd(phi, full_matrices=False)
    return u[:, :rank], (s * s)[:rank]


@partial(jax.jit, static_argnames=("rank",))
def lowrank_rbf(points: jax.Array, beta: float, rank: int):
    """Low-rank factors of the RBF Gram matrix exp(-|x-y|^2 / (2 beta^2))."""
    return nystrom_eig(points, lambda a, b: pairwise.rbf_kernel(a, b, beta), rank)


@partial(jax.jit, static_argnames=("rank", "max_landmarks"))
def lowrank_imq(points: jax.Array, c: float, rank: int, valid=None,
                max_landmarks=None):
    """Low-rank factors of the inverse-multiquadric Gram matrix (BCPD's G)."""
    return nystrom_eig(
        points, lambda a, b: pairwise.inverse_multiquadric_kernel(a, b, c),
        rank, valid=valid, max_landmarks=max_landmarks)


def woodbury_coeffs(u: jax.Array, lam: jax.Array, d: jax.Array, c, rhs: jax.Array):
    """Spectral coefficients zc = diag(lam) U^T X of the Woodbury solution.

    X solves (c I + diag(d) U diag(lam) U^T) X = rhs; substituting
    Z = U^T X gives the K x K system (c I + C diag(lam)) Z = U^T rhs with
    C = U^T diag(d) U, and zc = diag(lam) Z. The displacement field the
    nonrigid M-step needs is exactly G X = U zc — X itself is never formed.
    This matters numerically: the explicit back-substitution
    X = (rhs - diag(d) U zc) / c subtracts two huge near-equal terms when
    ``d`` carries the constrained variant's 1/alpha-weighted prior rows
    (reference cpd.py:377: sigma2/alpha ~ 1e8 in float32 — catastrophic
    cancellation); the Z system never takes that difference.
    """
    k = lam.shape[0]
    udu = (u * d[:, None]).T @ u                           # (K, K) U^T diag(d) U
    mk = c * jnp.eye(k, dtype=u.dtype) + udu * lam[None, :]
    z = jnp.linalg.solve(mk, u.T @ rhs)                    # (K, D)
    return lam[:, None] * z


def woodbury_solve(u: jax.Array, lam: jax.Array, d: jax.Array, c, rhs: jax.Array):
    """Solve (c I + diag(d) U diag(lam) U^T) X = rhs for (M, D) rhs.

    Only a K x K dense solve materializes. Prefer :func:`woodbury_coeffs`
    when only G X is needed (see its cancellation note).
    """
    zc = woodbury_coeffs(u, lam, d, c, rhs)
    return (rhs - d[:, None] * (u @ zc)) / c


def regularized_sigma(u: jax.Array, lam: jax.Array, nu: jax.Array, c, lmd):
    """Low-rank core of Sigma = (lmd I + c G diag(nu))^-1 G for BCPD.

    With G ~= U L U^T, Sigma ~= (1/lmd) U S U^T where
    S = L - c M^-1 L C L,  C = U^T diag(nu) U,  M = lmd I + c L C.
    Returns ``(s_core, sigma_diag)``: the symmetrized (K, K) core and
    diag(Sigma) (M,) — everything BCPD's VI update consumes
    (reference bcpd.py:130-136 builds the full M x M Sigma instead).
    """
    k = lam.shape[0]
    cmat = (u * nu[:, None]).T @ u                         # (K, K)
    mk = lmd * jnp.eye(k, dtype=u.dtype) + c * lam[:, None] * cmat
    s_core = jnp.diag(lam) - c * jnp.linalg.solve(
        mk, lam[:, None] * cmat * lam[None, :])
    s_core = 0.5 * (s_core + s_core.T)
    sigma_diag = jnp.sum((u @ s_core) * u, axis=1) / lmd
    return s_core, sigma_diag
