"""Large-N BCPD sigma2 accuracy vs a float64 streamed oracle.

Round-4 found the VI sigma2 update (reference bcpd.py:152-155, the
expanded ``s1 - 2 s2 + s3`` form) goes NEGATIVE from f32 catastrophic
cancellation at >= ~500k points (NaN-poisoned the whole VI state at
700k); round 4 floored it. Round 5 re-derived it in residual form
(``e1 = sum p d2`` accumulated in the E-step where d2 is live, plus an
O(residual) v-update correction — bcpd._vi_mstep_t docstring). This
tier pins that fix: at N = 500k (and a slow 1M case) the f32 update
must match a float64 streamed oracle to <= 1e-4 relative.

The cancellation is driven by the O(N)-term sums over the TARGET cloud
(each term ~ p_mn |x_n|^2), so a small source (M = 400) against a 500k-
point target exercises exactly the failing regime at CPU-feasible cost.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from probreg_tpu import bcpd as bm


def _make_clouds(n, m=400, noise=2e-3, seed=0):
    """O(1)-normalized source/target as registration_bcpd produces them."""
    rng = np.random.default_rng(seed)
    # Smooth surface (torus-ish) so the posterior is non-degenerate.
    u = rng.uniform(0, 2 * np.pi, n)
    v = rng.uniform(0, 2 * np.pi, n)
    pts = np.stack([
        (1.0 + 0.35 * np.cos(v)) * np.cos(u),
        (1.0 + 0.35 * np.cos(v)) * np.sin(u),
        0.35 * np.sin(v),
    ], axis=1)
    tgt = pts + rng.normal(0, noise, (n, 3))
    src = pts[rng.choice(n, m, replace=False)] \
        + rng.normal(0, noise, (m, 3))
    sc = float(np.sqrt((tgt * tgt).sum(1).mean()))
    return (src / sc).astype(np.float32), (tgt / sc).astype(np.float32)


def _imq_gram(src, beta=1.0):
    d2 = ((src[:, None, :] - src[None, :, :]) ** 2).sum(-1)
    return 1.0 / np.sqrt(d2 / (2 * beta ** 2) + 1.0)


def _oracle_sigma2(src, tgt, gmat, lmd, k, sigma2, sdiag, alpha, v0,
                   w=0.0, block=65536):
    """One VI iteration in float64, streamed over target blocks, using the
    reference's expanded-form sigma2 (harmless in f64: reference
    bcpd.py:152-155). Mirrors _run_bcpd's identity-rigid start."""
    src = src.astype(np.float64)
    tgt = tgt.astype(np.float64)
    m, dim = src.shape
    n = tgt.shape[0]
    rot, t, scale = np.eye(dim), np.zeros(dim), 1.0
    y = (src + v0.astype(np.float64)) @ rot.T * scale + t   # t_source
    row = (1.0 - w) * alpha.astype(np.float64) \
        * np.exp(-(scale ** 2) / (2 * sigma2) * sdiag.astype(np.float64)
                 * dim)
    nu = np.zeros(m)
    px = np.zeros((m, dim))
    s1 = 0.0
    n_p = 0.0
    for lo in range(0, n, block):
        x = tgt[lo:lo + block]
        d2 = ((y[:, None, :] - x[None, :, :]) ** 2).sum(-1)
        g = np.exp(-d2 / (2 * sigma2)) / (2 * np.pi * sigma2) ** (dim / 2)
        p = g * row[:, None]
        den = w / n + p.sum(0)
        den = np.where(den == 0.0, np.finfo(np.float64).eps, den)
        p = p / den
        nu += p.sum(1)
        px += p @ x
        s1 += (p.sum(0) * (x * x).sum(1)).sum()
    n_p = max(nu.sum(), np.finfo(np.float64).eps)
    x_hat = px / np.maximum(nu, np.finfo(np.float64).eps)[:, None]
    s2s2 = scale ** 2 / sigma2 ** 2
    # Mirror _vi_mstep_t: the residual is taken about the bare source
    # (ys_t), not source + v0.
    residual = ((x_hat - t) / scale) @ rot - src
    shifted = lmd * np.eye(m) + s2s2 * gmat.astype(np.float64) * nu[None, :]
    sigma_mat = np.linalg.solve(shifted, gmat.astype(np.float64))
    sigma_mat = 0.5 * (sigma_mat + sigma_mat.T)
    sigma_diag = np.diag(sigma_mat)
    v_new = s2s2 * (sigma_mat @ (nu[:, None] * residual))
    u_hat = src + v_new
    x_m = nu @ x_hat / n_p
    sigma2_m = (nu * sigma_diag).sum() / n_p
    u_m = nu @ u_hat / n_p
    u_hm = u_hat - u_m
    s_xu = ((x_hat - x_m) * nu[:, None]).T @ u_hm / n_p
    s_uu = (u_hm * nu[:, None]).T @ u_hm / n_p \
        + sigma2_m * np.eye(dim)
    phi, _, psih = np.linalg.svd(s_xu)
    c = np.ones(dim)
    c[-1] = np.linalg.det(phi @ psih)
    rot_new = (phi * c) @ psih
    scale_new = np.trace(rot_new @ s_xu) / np.trace(s_uu)
    # Expanded form, safe in f64; y_hat with the PREVIOUS rigid transform
    # (reference bcpd.py:151).
    y_hat = scale * (src + v_new) @ rot.T + t
    s2v = (px * y_hat).sum()
    s3 = (nu * (y_hat * y_hat).sum(1)).sum()
    return (s1 - 2 * s2v + s3) / (n_p * dim) + scale_new ** 2 * sigma2_m


def _f32_sigma2(src, tgt, gmat, lmd, k, sigma2, sdiag, alpha, v0, w=0.0):
    """One f32 VI iteration through the production path (_run_bcpd,
    maxiter=1); the raw final iterate's sigma2 rides the `last` slot."""
    res = bm._run_bcpd(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(gmat),
        jnp.asarray(lmd, jnp.float32), jnp.asarray(k, jnp.float32),
        jnp.asarray(sigma2, jnp.float32),
        w=w, maxiter=1, tol=0.0, block=65536,
        init_params=(np.eye(3, dtype=np.float32),
                     np.zeros(3, dtype=np.float32),
                     np.float32(1.0), v0.T, alpha, sdiag))
    last = res[5]
    return float(last[4])


# lmd is set LARGE so the v update (an M x M f32 solve whose conditioning
# is a separate concern, tested elsewhere) stays near zero and the test
# isolates the sigma2 REDUCTION — the quantity the round-5 fix changed.
# (Measured: the E-step accumulations themselves agree with f64 to ~1e-7
# rel at 500k; at lmd <= 1e5 the f32-vs-f64 SOLVE difference dominates.)
_LMD, _K = 1e14, 1e20


@pytest.mark.parametrize("sigma2", [1e-2, 1e-3])
def test_sigma2_residual_form_matches_f64_oracle_500k(sigma2):
    src, tgt = _make_clouds(500_000)
    m = src.shape[0]
    gmat = _imq_gram(src).astype(np.float32)
    rng = np.random.default_rng(1)
    sdiag = np.full(m, 1e-4, np.float32)
    alpha = np.full(m, 1.0 / m, np.float32)
    v0 = rng.normal(0, 1e-3, (m, 3)).astype(np.float32)

    got = _f32_sigma2(src, tgt, gmat, _LMD, _K, sigma2, sdiag, alpha, v0)
    want = _oracle_sigma2(src, tgt, gmat, _LMD, _K, sigma2, sdiag, alpha,
                          v0)
    assert want > 0
    assert abs(got - want) / want <= 1e-4, (got, want)


@pytest.mark.slow
def test_sigma2_residual_form_matches_f64_oracle_1m():
    src, tgt = _make_clouds(1_000_000)
    m = src.shape[0]
    gmat = _imq_gram(src).astype(np.float32)
    rng = np.random.default_rng(1)
    sdiag = np.full(m, 1e-4, np.float32)
    alpha = np.full(m, 1.0 / m, np.float32)
    v0 = rng.normal(0, 1e-3, (m, 3)).astype(np.float32)
    sigma2 = 1e-3

    got = _f32_sigma2(src, tgt, gmat, _LMD, _K, sigma2, sdiag, alpha, v0)
    want = _oracle_sigma2(src, tgt, gmat, _LMD, _K, sigma2, sdiag, alpha,
                          v0)
    assert want > 0
    assert abs(got - want) / want <= 1e-4, (got, want)
