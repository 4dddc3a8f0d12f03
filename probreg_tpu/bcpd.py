"""Bayesian Coherent Point Drift (variational inference, combined transform).

Parity with reference probreg/bcpd.py, redesigned TPU-first:

* The reference's ``kron``-expanded products (bcpd.py:70, 133-135) are
  algebraic identities for plain matmuls — ``kron(P, I_D) x.ravel()`` is just
  ``P @ X`` — so the O(M N D^2) memory blowup disappears.
* The E-step streams over target blocks like the CPD E-step and returns only
  psum-able moments (nu_d is reduced to the s1 scalar it feeds), never
  holding the M x N posterior.
* The whole VI loop runs as one jitted ``lax.while_loop`` (M x M inverse,
  D x D SVD, digamma are all jnp ops); convergence is the nearest-neighbor
  RMSE criterion of the reference (bcpd.py:95-99) via the brute-force MXU
  nearest-neighbor instead of a cKDTree.
"""

from __future__ import annotations

import abc
from collections import namedtuple
from functools import partial
from typing import Any, Callable, List

import jax
import jax.numpy as jnp
import numpy as np

from . import config as _config
from .log import log
from .ops import lowrank as _lowrank
from .models import transformation as tf
from .ops import pairwise
from .utils import interop
from .utils import math_utils as mu

EstepResult = namedtuple("EstepResult", ["nu_d", "nu", "n_p", "px", "x_hat"])
MstepResult = namedtuple(
    "MstepResult", ["transformation", "u_hat", "sigma_mat", "alpha", "sigma2"])
MstepResult.__doc__ = """Result of Maximization step.

    Attributes:
        transformation (tf.Transformation): Transformation from source to target.
        u_hat (numpy.ndarray): A parameter used in next Estep.
        sigma_mat (numpy.ndarray): A parameter used in next Estep.
        alpha (float): A parameter used in next Estep.
        sigma2 (float): Variance of Gaussian distribution.
"""

_EPS = float(np.finfo(np.float32).eps)


def _as_jnp(x):
    return jnp.asarray(interop.as_points(x, dtype=_config.config.dtype))


def _hw_guard(total_pairs, maxiter, what, hint):
    """Hardware-safety guard (config.bcpd_guard_max_pairs): 1M-class
    unmeshed whole-VI programs faulted the v5e worker three times
    (BENCHMARKS.md round-4 fault audit). Above the validated per-program
    pair count, refuse any dispatch that cannot be bounded to
    ``bcpd_guard_chunk`` iterations — never fault the device.

    ``maxiter=None`` marks a program that cannot be sliced at all
    (vmapped batch / multistart): refused above the bound regardless of
    iteration count, since the per-dispatch work is already
    ``total_pairs``-heavy.
    """
    guard = int(getattr(_config.config, "bcpd_guard_max_pairs", 0) or 0)
    if not guard or jax.default_backend() != "tpu":
        return
    chunk = int(_config.config.bcpd_guard_chunk)
    sliceable_ok = maxiter is not None and int(maxiter) <= chunk
    if total_pairs > guard and not sliceable_ok:
        raise ValueError(
            f"BCPD {what} totals {total_pairs} source*target pairs per "
            "device program, above the single-chip-validated size "
            f"(config.bcpd_guard_max_pairs = {guard}); whole-VI programs "
            f"this large have faulted TPU workers. {hint} Or raise "
            "config.bcpd_guard_max_pairs to override.")


def bcpd_estep(t_source, target, scale, alpha, sigma_mat_diag, sigma2, w=0.0,
               with_rmse=False):
    """BCPD E-step moments (reference bcpd.py:53-72), dense-block version.

    pmat_mj = (1-w) alpha_m exp(-|x_j - y_m|^2 / 2s2) / (2 pi s2)^(D/2)
              * exp(-scale^2/(2 s2) * Sigma_mm * D)
    den_j   = w / N + sum_m pmat_mj

    ``with_rmse`` additionally returns the source->target NN-RMSE
    convergence criterion from the same d2 matrix (the reference pays a
    separate cKDTree query per iteration, bcpd.py:95).
    """
    dim = t_source.shape[1]
    n = target.shape[0]
    d2 = pairwise.sqdist(t_source, target)                 # (M, N)
    rmse = jnp.mean(jnp.sqrt(jnp.min(d2, axis=1))) if with_rmse else None
    row = (1.0 - w) * alpha * jnp.exp(
        -(scale ** 2) / (2.0 * sigma2) * sigma_mat_diag * dim)
    g = jnp.exp(-d2 / (2.0 * sigma2)) / (2.0 * jnp.pi * sigma2) ** (dim * 0.5)
    pmat = g * row[:, None]
    den = w / n + jnp.sum(pmat, axis=0)
    den = jnp.where(den == 0.0, _EPS, den)
    pmat = pmat / den[None, :]

    nu_d = jnp.sum(pmat, axis=0)                           # (N,)
    nu = jnp.sum(pmat, axis=1)                             # (M,)
    px = pmat @ target                                     # (M, D)
    x_hat = px / jnp.maximum(nu, _EPS)[:, None]
    res = EstepResult(nu_d, nu, jnp.maximum(jnp.sum(nu), _EPS), px, x_hat)
    return (res, rmse) if with_rmse else res


def combined_mstep(source, target, rot, t, scale, estep_res, gmat, lmd, k,
                   sigma2_p):
    """CombinedBCPD M-step (reference bcpd.py:125-155), kron-free.

    The reference computes Sigma = inv(lmd G^-1 + s2s2 diag(nu)) with an
    explicit G^-1 (bcpd.py:114,130-131). The IMQ Gram matrix has condition
    number ~5e10 on real clouds, so in float32 that inverse is garbage;
    the algebraically identical Sigma = inv(lmd I + s2s2 G diag(nu)) G
    only inverts the well-conditioned shifted matrix.

    ``gmat`` may also be a ``(u, lam)`` Nystrom factor tuple; then Sigma is
    never materialized (its K x K core + diagonal are enough) and the
    returned ``sigma_mat`` slot carries diag(Sigma).
    """
    nu_d, nu, n_p, px, x_hat = estep_res
    dim = source.shape[1]
    m = source.shape[0]
    # Matches reference bcpd.py:130 (sigma2_p**2). This is only
    # well-behaved on O(1)-scale clouds — which is why registration_bcpd
    # normalizes by default; see its docstring.
    s2s2 = scale ** 2 / (sigma2_p ** 2)
    # inverse rigid: (x - t) / scale @ rot
    residual = ((x_hat - t) / scale) @ rot - source
    if isinstance(gmat, (tuple, list)):
        umat, lam = gmat
        s_core, sigma_diag = _lowrank.regularized_sigma(umat, lam, nu, s2s2, lmd)
        v_hat = (s2s2 / lmd) * (
            umat @ (s_core @ (umat.T @ (nu[:, None] * residual))))
        sigma_out = sigma_diag
    else:
        shifted = lmd * jnp.eye(m, dtype=source.dtype) + s2s2 * gmat * nu[None, :]
        sigma_mat = jnp.linalg.solve(shifted, gmat)
        sigma_mat = 0.5 * (sigma_mat + sigma_mat.T)
        sigma_diag = jnp.diag(sigma_mat)
        v_hat = s2s2 * (sigma_mat @ (nu[:, None] * residual))
        sigma_out = sigma_mat
    u_hat = source + v_hat
    alpha = jnp.exp(jax.scipy.special.digamma(k + nu)
                    - jax.scipy.special.digamma(k * m + n_p))
    x_m = nu @ x_hat / n_p
    sigma2_m = jnp.sum(nu * sigma_diag) / n_p
    u_m = nu @ u_hat / n_p
    u_hm = u_hat - u_m
    s_xu = ((x_hat - x_m) * nu[:, None]).T @ u_hm / n_p
    s_uu = (u_hm * nu[:, None]).T @ u_hm / n_p \
        + sigma2_m * jnp.eye(dim, dtype=source.dtype)
    phi, _, psih = jnp.linalg.svd(s_xu, full_matrices=True)
    c = jnp.ones(dim, source.dtype).at[-1].set(jnp.linalg.det(phi @ psih))
    rot_new = (phi * c) @ psih
    tr_rsxu = jnp.trace(rot_new @ s_xu)
    scale_new = tr_rsxu / jnp.trace(s_uu)
    t_new = x_m - scale_new * rot_new @ u_m
    # Reference parity (bcpd.py:151): y_hat is evaluated with the PREVIOUS
    # rigid transform (rot/t/scale args), not the just-updated one; only the
    # scale_new**2 * sigma2_m term uses the new scale (bcpd.py:155).
    y_hat = scale * (source + v_hat) @ rot.T + t
    s1 = jnp.sum(nu_d * jnp.sum(target * target, axis=1))
    s2 = jnp.sum(px * y_hat)
    s3 = jnp.sum(nu * jnp.sum(y_hat * y_hat, axis=1))
    # Same f32 eps floor as _vi_mstep_t: the s1 - 2 s2 + s3 cancellation
    # can go NEGATIVE at large N (observed at 700k) and a negative sigma2
    # NaN-poisons every later iterate — this path serves the callback /
    # chunked-callback loops, which lacked the round-4 fix.
    sigma2 = jnp.maximum(
        (s1 - 2.0 * s2 + s3) / (n_p * dim) + scale_new ** 2 * sigma2_m,
        _EPS)
    return (tf.CombinedTransformation(rot_new, t_new, scale_new, v_hat),
            u_hat, sigma_out, alpha, sigma2)


@partial(jax.jit, static_argnames=("w", "k"))
def _bcpd_chunk(source, target, transf, sigma_mat, alpha, sigma2, gmat,
                lmd, kparam, *, w, k):
    """K VI iterations in one program, emitting per-iteration history
    (transformation, nn-rmse). See utils/chunked.py; state layout matches
    the eager _registration_loop (carry must be type-stable: v is (M, D),
    alpha is (M,))."""

    def body(carry, _):
        tr, sm, al, s2 = carry
        t_source = tr._transform(source)
        diag = jnp.diag(sm) if sm.ndim == 2 else sm
        est = bcpd_estep(t_source, target, tr.rigid_trans.scale, al, diag,
                         s2, w)
        out = MstepResult(*combined_mstep(
            source, target, tr.rigid_trans.rot, tr.rigid_trans.t,
            tr.rigid_trans.scale, est, gmat, lmd, kparam, s2))
        rmse = mu.compute_rmse(t_source, target)
        return ((out.transformation, out.sigma_mat, out.alpha, out.sigma2),
                (out.transformation, rmse))

    carry, hist = jax.lax.scan(body, (transf, sigma_mat, alpha, sigma2),
                               None, length=k)
    return carry, hist


def _vi_mstep_t(ys_t, rot, t, scale, sigma2, gmat, lmd, k, px_t, nu, s1,
                m_eff=None, e1=None, t_src_t=None, v_prev_t=None):
    """CombinedBCPD M-step in transposed (D, M) layout, from psum-able
    E-step moments (px_t, nu, s1). Shared by the single-device VI loop and
    the sharded runner (parallel/sharded.py). ``gmat`` dense or (u, lam).
    ``m_eff``: true source count when padded (ragged batch) — feeds the
    Dirichlet digamma normalizer; everything else is inert to padding
    because padded rows have nu = 0.

    sigma2 update — two forms:

    * **Residual form** (``e1`` given): ``e1 = sum_mn p_mn |x_n - y_m|^2``
      accumulated in the E-step where d2 is live (a sum of NONNEGATIVE
      residual-scale terms — numerically stable at any N), corrected for
      the v update the reference applies between E and sigma2
      (reference bcpd.py:151 evaluates y_hat with v_NEW but the PREVIOUS
      rigid transform):  with delta_m = scale * rot @ (v_new - v_prev)_m,

        sum p |x - y_hat|^2 = e1 - 2 sum_m (px_m - nu_m y_m) . delta_m
                                 + sum_m nu_m |delta_m|^2

      — every term is O(residual), so no catastrophic cancellation.
      Requires ``t_src_t`` (the (D, M) transformed source the E-step saw)
      and ``v_prev_t`` (the (D, M) displacement field it used).
    * **Expanded form** (``e1 is None``): the reference's
      ``s1 - 2 s2 + s3`` (bcpd.py:152-155) — sums of O(n_p |x|^2) f32
      terms whose true difference is the tiny converged residual; above
      ~500k points the rounding noise exceeds it (observed NEGATIVE at
      700k, round 4). Kept for callers that only have channel moments.

    Both forms keep the f32 eps floor as a backstop."""
    dim, m = ys_t.shape
    if m_eff is None:
        m_eff = m
    low_rank = isinstance(gmat, (tuple, list))
    n_p = jnp.maximum(jnp.sum(nu), _EPS)
    x_hat_t = px_t / jnp.maximum(nu, _EPS)[None, :]             # (D, M)
    s2s2 = scale ** 2 / (sigma2 ** 2)
    residual_t = rot.T @ ((x_hat_t - t[:, None]) / scale) - ys_t
    if low_rank:
        umat, lam = gmat
        s_core, sigma_diag_new = _lowrank.regularized_sigma(
            umat, lam, nu, s2s2, lmd)
        v_new_t = (s2s2 / lmd) * (
            ((residual_t * nu[None, :]) @ umat) @ s_core) @ umat.T
    else:
        shifted = lmd * jnp.eye(m, dtype=ys_t.dtype) \
            + s2s2 * gmat * nu[None, :]
        sigma_mat = jnp.linalg.solve(shifted, gmat)
        sigma_mat = 0.5 * (sigma_mat + sigma_mat.T)
        sigma_diag_new = jnp.diag(sigma_mat)
        v_new_t = s2s2 * jax.lax.dot_general(
            residual_t * nu[None, :], sigma_mat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)                # (D, M)
    u_hat_t = ys_t + v_new_t
    alpha_new = jnp.exp(jax.scipy.special.digamma(k + nu)
                        - jax.scipy.special.digamma(k * m_eff + n_p))
    x_m = x_hat_t @ nu / n_p                                    # (D,)
    sigma2_m = jnp.sum(nu * sigma_diag_new) / n_p
    u_m = u_hat_t @ nu / n_p
    u_hm = u_hat_t - u_m[:, None]
    s_xu = jax.lax.dot_general(
        (x_hat_t - x_m[:, None]) * nu[None, :], u_hm,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)                    # (D, D)
    s_uu = jax.lax.dot_general(
        u_hm * nu[None, :], u_hm, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST) / n_p \
        + sigma2_m * jnp.eye(dim, dtype=ys_t.dtype)
    s_xu = s_xu / n_p
    phi, _, psih = jnp.linalg.svd(s_xu, full_matrices=True)
    cdet = jnp.ones(dim, ys_t.dtype).at[-1].set(
        jnp.linalg.det(phi @ psih))
    rot_new = (phi * cdet) @ psih
    scale_new = jnp.trace(rot_new @ s_xu) / jnp.trace(s_uu)
    t_new = x_m - scale_new * rot_new @ u_m
    if e1 is not None:
        # Residual form (see docstring): every term is O(residual)-scale.
        delta_t = scale * (rot @ (v_new_t - v_prev_t))       # (D, M)
        r_t = px_t - nu[None, :] * t_src_t                   # (D, M)
        numer = (e1 - 2.0 * jnp.sum(r_t * delta_t)
                 + jnp.sum(nu * jnp.sum(delta_t * delta_t, axis=0)))
    else:
        # Reference parity (bcpd.py:151): y_hat with the PREVIOUS transform.
        y_hat_t = scale * rot @ (ys_t + v_new_t) + t[:, None]
        s2v = jnp.sum(px_t * y_hat_t)
        s3 = jnp.sum(nu * jnp.sum(y_hat_t * y_hat_t, axis=0))
        numer = s1 - 2.0 * s2v + s3
    # f32 eps floor as a backstop (residual form: guards the tiny negative
    # the correction terms can produce at machine precision; expanded
    # form: guards the large-N catastrophic cancellation, see docstring).
    sigma2_new = jnp.maximum(
        numer / (n_p * dim) + scale_new ** 2 * sigma2_m,
        _EPS)
    return (rot_new, t_new, scale_new, v_new_t, sigma_diag_new, alpha_new,
            sigma2_new)


@partial(jax.jit, static_argnames=("w", "block", "use_culled",
                                   "culled_interpret"))
def _run_bcpd(source, target, gmat, lmd, k, sigma2_0, *, w, maxiter, tol,
              block=None, smask=None, tmask=None, use_culled=False,
              culled_interpret=False, init_params=None):
    """Whole-VI while_loop in transposed (D, M) layout for the hot E-step.

    (M, 3)-layout ops inside TPU loops cost ~0.25 ms each in lane relayouts
    (see cpd.py); the E-step here mirrors cpd._estep_t: one (C, N) x (M, N)
    matmul yields nu / px / the s1 channel, and the v_hat update rides the
    symmetric Sigma as a lane-major matmul. The M x M solve keeps its
    natural layout (it dominates asymptotically regardless).

    ``gmat`` is either the dense (M, M) IMQ Gram matrix, or a ``(u, lam)``
    tuple of its rank-K Nystrom eigenfactors (ops/lowrank.py) — then the
    Sigma update (reference bcpd.py:130-131, two M x M inverses) collapses
    to one K x K solve and diag(Sigma) / Sigma-matvecs cost O(M K).

    When N exceeds ``config.estep_chunk`` the E-step streams over target
    column blocks (each posterior column's normalizer is a sum over M, so
    it is complete within its block) — peak memory O(M * block) instead of
    the O(M * N) posterior (which the reference also materializes,
    bcpd.py:57-70).

    ``init_params``: optional ``(rot0, t0, scale0, v0_t)`` warm start (in
    the SAME coordinate frame as ``source``/``target``; ``v0_t`` is the
    transposed (D, M) displacement field, or None for zeros). Used by the
    coarse-to-fine pyramid (pyramid.py) — the warm-started first E-step
    runs at the carried ``sigma2_0`` instead of the dense start
    temperature.
    """
    use_culled = use_culled and smask is None and tmask is None
    m, dim = source.shape
    n = target.shape[0]
    masked = smask is not None
    m_eff = jnp.sum(smask) if masked else m
    n_eff = jnp.sum(tmask) if masked else n
    ys_t = source.T                                        # (D, M)
    xs_t = target.T                                        # (D, N)
    x2 = jnp.sum(xs_t * xs_t, axis=0, keepdims=True)       # (1, N)
    # Channels: [x (D); ones; |x|^2] -> rows of the moment matmul give
    # px_t (D, M), nu (M), and sum_j p_ij |x_j|^2 whose total is s1.
    v_chan = jnp.concatenate(
        [xs_t, jnp.ones((1, n), xs_t.dtype), x2], axis=0)  # (D+2, N)
    if block is None:
        block = int(_config.config.estep_chunk)
    block = max(min(int(block), n), 1)
    blocked = n > block
    if blocked:
        pad = (-n) % block
        base_mask = tmask[None, :] if masked \
            else jnp.ones((1, n), xs_t.dtype)
        cmask = jnp.concatenate(
            [base_mask, jnp.zeros((1, pad), xs_t.dtype)], axis=1)
        if pad:
            xs_p = jnp.concatenate(
                [xs_t, jnp.zeros((dim, pad), xs_t.dtype)], axis=1)
            v_p = jnp.concatenate(
                [v_chan, jnp.zeros((dim + 2, pad), v_chan.dtype)], axis=1)
        else:
            xs_p, v_p = xs_t, v_chan
        nb = (n + pad) // block
        xs_blocks = xs_p.reshape(dim, nb, block).transpose(1, 0, 2)
        v_blocks = v_p.reshape(dim + 2, nb, block).transpose(1, 0, 2)
        m_blocks = cmask.reshape(1, nb, block).transpose(1, 0, 2)

    def _estep_cols(t_src_t, y2, row, sigma2, xs_b, v_b, mask_b):
        """Moments, per-source-row min-d2 and the residual-form
        e1 = sum p * d2 of one (M, B) posterior block (d2 is live here —
        see _vi_mstep_t's sigma2 docstring)."""
        x2b = jnp.sum(xs_b * xs_b, axis=0, keepdims=True)
        xy = jax.lax.dot_general(
            t_src_t, xs_b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        d2 = jnp.maximum(y2 + x2b - 2.0 * xy, 0.0)
        dmin = jnp.min(jnp.where(mask_b > 0, d2, jnp.inf), axis=1)
        g = jnp.exp(-d2 / (2.0 * sigma2)) \
            / (2.0 * jnp.pi * sigma2) ** (dim * 0.5) * mask_b
        pmat = g * row[:, None]
        den = w / n_eff + jnp.sum(pmat, axis=0, keepdims=True)
        den = jnp.where(den == 0.0, _EPS, den)
        pmat = pmat / den
        mom = jax.lax.dot_general(
            v_b, pmat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)                # (D+2, M)
        e1_b = jnp.sum(pmat * d2)
        return mom, dmin, e1_b

    def body(state):
        (rot, t, scale, v_hat_t, sigma_diag, alpha, sigma2, _, rmse_prev,
         i, best) = state
        t_src_t = scale * rot @ (ys_t + v_hat_t) + t[:, None]   # (D, M)

        # --- E-step (bcpd_estep in transposed layout)
        y2 = jnp.sum(t_src_t * t_src_t, axis=0)[:, None]        # (M, 1)
        row = (1.0 - w) * alpha * jnp.exp(
            -(scale ** 2) / (2.0 * sigma2) * sigma_diag * dim)
        if masked:
            row = row * smask
        if use_culled:
            # Tile-culled E-step (ops/estep_pallas.bcpd_estep_culled):
            # rowlog folds the alpha / Sigma-diag / normalizer factors into
            # the exponent; the caller Morton-sorted both clouds.
            from .ops import estep_pallas as _ep

            rowlog = jnp.where(
                row > 0.0,
                jnp.log(jnp.maximum(row, 1e-38))
                - dim * 0.5 * jnp.log(2.0 * jnp.pi * sigma2),
                -1e30)
            _, mom, minrow, e1 = _ep.bcpd_estep_culled(
                t_src_t.T, target, rowlog, v_chan, w / n_eff, sigma2,
                interpret=culled_interpret)
        elif blocked:
            def eblk(carry, blk):
                mom_acc, min_acc, e1_acc = carry
                xs_b, v_b, mask_b = blk
                mom_b, dmin, e1_b = _estep_cols(
                    t_src_t, y2, row, sigma2, xs_b, v_b, mask_b)
                return (mom_acc + mom_b, jnp.minimum(min_acc, dmin),
                        e1_acc + e1_b), None

            init = (jnp.zeros((dim + 2, m), source.dtype),
                    jnp.full((m,), jnp.inf, source.dtype),
                    jnp.zeros((), source.dtype))
            (mom, minrow, e1), _ = jax.lax.scan(
                eblk, init, (xs_blocks, v_blocks, m_blocks))
        else:
            mom, minrow, e1 = _estep_cols(
                t_src_t, y2, row, sigma2, xs_t, v_chan,
                tmask[None, :] if masked
                else jnp.ones((1, n), xs_t.dtype))
        if masked:
            rmse = jnp.sum(
                jnp.where(smask > 0, jnp.sqrt(minrow), 0.0)) / m_eff
        else:
            rmse = jnp.mean(jnp.sqrt(minrow))
        px_t = mom[:dim]                                        # (D, M)
        nu = mom[dim]                                           # (M,)
        s1 = jnp.sum(mom[dim + 1])

        (rot_new, t_new, scale_new, v_new_t, sigma_diag_new, alpha_new,
         sigma2_new) = _vi_mstep_t(
            ys_t, rot, t, scale, sigma2, gmat, lmd, k, px_t, nu, s1,
            m_eff=m_eff if masked else None,
            e1=e1, t_src_t=t_src_t, v_prev_t=v_hat_t)
        # Track the best state VISITED (by the loop's own NN-RMSE
        # criterion): the VI trajectory keeps trading scale against v after
        # convergence (chaotic in f32), so the LAST iterate can be worse
        # than one it already passed through. `rmse` scores the incoming
        # (rot, t, scale, v) state.
        b_rot, b_t, b_scale, b_v, b_s2, b_rmse = best
        better = rmse < b_rmse
        best = (jnp.where(better, rot, b_rot), jnp.where(better, t, b_t),
                jnp.where(better, scale, b_scale),
                jnp.where(better, v_hat_t, b_v),
                jnp.where(better, sigma2, b_s2),
                jnp.minimum(rmse, b_rmse))
        return (rot_new, t_new, scale_new, v_new_t, sigma_diag_new,
                alpha_new, sigma2_new, rmse, state[7], i + 1, best)

    def cond(state):
        _, _, _, _, _, _, _, rmse, rmse_prev, i, _ = state
        return jnp.logical_and(
            i < maxiter,
            jnp.logical_or(i < 2, jnp.abs(rmse - rmse_prev) >= tol),
        )

    alpha0 = smask / m_eff if masked \
        else jnp.full((m,), 1.0 / m, source.dtype)
    inf = jnp.asarray(jnp.inf, source.dtype)
    alpha_i = sdiag_i = None
    if init_params is None:
        rot0 = jnp.eye(dim, dtype=source.dtype)
        t0 = jnp.zeros(dim, source.dtype)
        scale0 = jnp.asarray(1.0, source.dtype)
        v0_t = jnp.zeros_like(ys_t)
    else:
        # 6-tuple: a sliced-dispatch resume also carries the VI's mixing
        # weights and Sigma diagonal (either may be None).
        if len(init_params) == 6:
            rot0, t0, scale0, v0_t, alpha_i, sdiag_i = init_params
        else:
            rot0, t0, scale0, v0_t = init_params
        rot0 = jnp.asarray(rot0, source.dtype)
        t0 = jnp.asarray(t0, source.dtype)
        scale0 = jnp.asarray(scale0, source.dtype)
        v0_t = (jnp.zeros_like(ys_t) if v0_t is None
                else jnp.asarray(v0_t, source.dtype))
    if alpha_i is not None:
        alpha0 = jnp.asarray(alpha_i, source.dtype)
    sdiag0 = jnp.ones((m,), source.dtype) if sdiag_i is None \
        else jnp.asarray(sdiag_i, source.dtype)
    best0 = (rot0, t0, scale0, v0_t, sigma2_0, inf)
    state = (
        rot0, t0, scale0, v0_t,
        sdiag0, alpha0, sigma2_0,
        inf, inf, jnp.asarray(0), best0,
    )
    state = jax.lax.while_loop(cond, body, state)
    rot, t, scale, v_hat_t, sigma_diag, alpha, sigma2, _ = state[:8]
    b_rot, b_t, b_scale, b_v, b_s2, b_rmse = state[10]

    # The last iterate was never scored; score it once and keep whichever
    # of (last, best-visited) has the lower NN-RMSE.
    t_src_t = scale * rot @ (ys_t + v_hat_t) + t[:, None]
    y2 = jnp.sum(t_src_t * t_src_t, axis=0)[:, None]
    row1 = jnp.ones((m,), source.dtype)
    if use_culled:
        from .ops import estep_pallas as _ep

        rowlog1 = jnp.zeros((m,), source.dtype) \
            - dim * 0.5 * jnp.log(2.0 * jnp.pi * sigma2_0)
        _, _, minrow, _ = _ep.bcpd_estep_culled(
            t_src_t.T, target, rowlog1, v_chan, w / n_eff, sigma2_0,
            interpret=culled_interpret)
    elif blocked:
        def dblk(carry, blk):
            xs_b, v_b, mask_b = blk
            _, dmin, _ = _estep_cols(t_src_t, y2, row1, sigma2_0, xs_b,
                                     v_b, mask_b)
            return jnp.minimum(carry, dmin), None

        minrow, _ = jax.lax.scan(
            dblk, jnp.full((m,), jnp.inf, source.dtype),
            (xs_blocks, v_blocks, m_blocks))
    else:
        _, minrow, _ = _estep_cols(
            t_src_t, y2, row1, sigma2_0, xs_t, v_chan,
            tmask[None, :] if masked else jnp.ones((1, n), xs_t.dtype))
    if masked:
        rmse_last = jnp.sum(
            jnp.where(smask > 0, jnp.sqrt(minrow), 0.0)) / m_eff
    else:
        rmse_last = jnp.mean(jnp.sqrt(minrow))
    use_last = rmse_last <= b_rmse
    # The raw final iterate (NOT the best-of selection below): a sliced-
    # dispatch restart must continue the VI trajectory from here — during
    # the start-temperature phase the best-visited state is still ~the
    # initial one, so restarting from it would never progress. Its own
    # NN-RMSE rides along so the sliced driver can apply the SAME
    # |rmse - rmse_prev| < tol trajectory stop across chunk boundaries.
    last = (rot, t, scale, v_hat_t, sigma2, sigma_diag, alpha, rmse_last)
    rot = jnp.where(use_last, rot, b_rot)
    t = jnp.where(use_last, t, b_t)
    scale = jnp.where(use_last, scale, b_scale)
    v_hat_t = jnp.where(use_last, v_hat_t, b_v)
    sigma2 = jnp.where(use_last, sigma2, b_s2)
    rmse = jnp.minimum(rmse_last, b_rmse)
    return (tf.CombinedTransformation(rot, t, scale, v_hat_t.T),
            sigma_diag, alpha, sigma2, rmse, last)


class BayesianCoherentPointDrift(abc.ABC):
    """Abstract BCPD (reference bcpd.py:31-100)."""

    def __init__(self, source=None):
        self._source = None if source is None else _as_jnp(source)
        self._tf_type = None
        self._callbacks: List[Callable] = []

    def set_source(self, source):
        self._source = _as_jnp(source)

    def set_callbacks(self, callbacks):
        self._callbacks.extend(callbacks)

    @abc.abstractmethod
    def _initialize(self, target) -> MstepResult:
        ...

    def expectation_step(self, t_source, target, scale, alpha, sigma_mat,
                         sigma2, w=0.0) -> EstepResult:
        """Reference-shaped E-step (bcpd.py:53-72)."""
        sigma_mat = jnp.asarray(sigma_mat)
        diag = jnp.diag(sigma_mat) if sigma_mat.ndim == 2 else sigma_mat
        return bcpd_estep(
            _as_jnp(t_source), _as_jnp(target), jnp.asarray(scale),
            jnp.asarray(alpha), diag, jnp.asarray(sigma2), float(w))

    @abc.abstractmethod
    def maximization_step(self, target, *args, **kwargs) -> MstepResult:
        """Subclass M-step (reference bcpd.py:74-76; CombinedBCPD adds the
        current rigid transform to the signature, bcpd.py:119)."""
        ...

    def registration(self, target, w: float = 0.0, maxiter: int = 50,
                     tol: float = 0.001,
                     callback_chunk: int = 1,
                     tf_init_params=None, v_init=None,
                     sigma2_init=None, extra_init=None,
                     want_last=False) -> tf.Transformation:
        """``callback_chunk``: VI iterations per device dispatch in callback
        mode; callbacks still fire once per iteration from the fetched chunk
        history (utils/chunked.py). Ignored without callbacks.

        ``tf_init_params`` ({'rot', 't', 'scale'}), ``v_init`` ((M, D)
        displacement field) and ``sigma2_init`` warm-start the VI loop in
        the instance's coordinate frame (the pyramid converts from raw
        coordinates before calling)."""
        assert self._tf_type is not None, "transformation type is None."
        target = _as_jnp(target)
        if not self._callbacks:
            return self._registration_jit(
                target, w, maxiter, tol, tf_init_params=tf_init_params,
                v_init=v_init, sigma2_init=sigma2_init,
                extra_init=extra_init, want_last=want_last)
        if tf_init_params or v_init is not None or sigma2_init is not None \
                or extra_init is not None:
            raise ValueError("warm starts are only supported on the jitted "
                             "(no-callback) path")
        m = int(self._source.shape[0])
        n = int(jnp.shape(target)[0])
        if (jax.default_backend() == "tpu"
                and m * n > int(_config.config.transposed_em_max_pairs)):
            # The callback loop materializes several dense (M, N) arrays
            # per iteration (bcpd_estep) — sizes the jitted path streams
            # fine would exhaust HBM here (and HBM-heavy runs are a
            # documented tunnel-fault trigger).
            raise ValueError(
                f"BCPD with callbacks materializes the dense (M, N) "
                f"posterior; M*N = {m}*{n} exceeds "
                f"config.transposed_em_max_pairs = "
                f"{int(_config.config.transposed_em_max_pairs)}. Run "
                "without callbacks (the jitted path streams target "
                "blocks), or register voxel-downsampled clouds for "
                "visualization.")
        return self._registration_loop(target, w, maxiter, tol,
                                       callback_chunk=int(callback_chunk))

    @abc.abstractmethod
    def _registration_jit(self, target, w, maxiter, tol,
                          tf_init_params=None, v_init=None,
                          sigma2_init=None, extra_init=None,
                          want_last=False):
        ...

    @abc.abstractmethod
    def _registration_loop(self, target, w, maxiter, tol, callback_chunk=1):
        ...


class CombinedBCPD(BayesianCoherentPointDrift):
    """BCPD with the combined rigid+scale+nonrigid transform (bcpd.py:103-156).

    Args:
        source: Source point cloud.
        lmd: Motion-coherence regularization weight.
        k: Dirichlet concentration (large k = uniform mixing weights).
        gamma: Initial sigma2 scaling.
        rank: When set, hold the IMQ Gram matrix as rank-K Nystrom
            eigenfactors and run the Sigma update through a K x K Woodbury
            solve (ops/lowrank.py) — O(M K) memory/solve instead of the
            reference's two M x M inverses per iteration (bcpd.py:114,130).
    """

    def __init__(self, source=None, lmd=2.0, k=1.0e20, gamma=1.0, rank=None):
        super().__init__(source)
        self._tf_type = tf.CombinedTransformation
        self.lmd = lmd
        self.k = k
        self.gamma = gamma
        self.rank = rank

    def _gram(self):
        if self.rank is None:
            return mu.inverse_multiquadric_kernel(self._source, self._source)
        return tuple(_lowrank.lowrank_imq(self._source, 1.0, int(self.rank)))

    def _initialize(self, target) -> MstepResult:
        m, dim = self._source.shape
        self.gmat = self._gram()
        sigma2 = self.gamma * mu.squared_kernel_sum(self._source, target)
        sigma_mat0 = (jnp.eye(m, dtype=self._source.dtype) if self.rank is None
                      else jnp.ones((m,), self._source.dtype))
        return MstepResult(
            self._tf_type(jnp.eye(dim), jnp.zeros(dim)), None,
            sigma_mat0, 1.0 / m, sigma2)

    def maximization_step(self, target, rigid_trans, estep_res,
                          sigma2_p=None) -> MstepResult:
        out = combined_mstep(
            self._source, _as_jnp(target), rigid_trans.rot, rigid_trans.t,
            rigid_trans.scale, estep_res, self.gmat,
            jnp.asarray(self.lmd, self._source.dtype),
            jnp.asarray(self.k, self._source.dtype), jnp.asarray(sigma2_p))
        return MstepResult(*out)

    def _registration_jit(self, target, w, maxiter, tol,
                          tf_init_params=None, v_init=None,
                          sigma2_init=None, extra_init=None,
                          want_last=False):
        m = int(self._source.shape[0])
        n = int(jnp.shape(target)[0])
        _hw_guard(
            m * n, maxiter, f"at M*N = {m}*{n}",
            "Use registration_bcpd_pyramid(mesh=<2-axis mesh>, rank=...) "
            "or registration_bcpd_pyramid(dispatch_chunk="
            f"{int(_config.config.bcpd_guard_chunk)}) (bounded "
            "per-program device time).")
        use_culled = (
            jax.default_backend() == "tpu"
            and _config.config.use_culled_estep
            and m * n >= _config.config.culled_estep_min_pairs
            and self.rank is not None  # dense gmat dominates otherwise
            # Round-5 fault isolation: the row-weighted stash kernel is
            # the 1M single-chip crash culprit — a guarded 1M run with it
            # OFF (streaming E-step, 1-iteration programs) completed
            # fault-free in 1058 s where the same run with it ON faulted
            # the v5e worker at ~8.5 min (and twice in round 3). Above
            # the validated source size the streaming scan is the safe
            # default (BENCHMARKS.md round-5 probe).
            and m <= _config.config.bcpd_culled_max_points)
        perm_s = None
        orig_source = self._source
        if use_culled:
            # One-time Morton sort (ops/spatial.py) so tile culling fires;
            # the IMQ Gram / Nystrom factors are built from the SORTED
            # source below, and v_hat rows are unsorted before returning.
            from .ops.spatial import morton_order_np

            src_np = np.asarray(self._source)
            tgt_np = np.asarray(target)
            perm_s = morton_order_np(src_np)
            self._source = jnp.asarray(src_np[perm_s])
            target = jnp.asarray(tgt_np[morton_order_np(tgt_np)])
        # Always materialize the FULL 6-tuple of arrays: a None leaf (or
        # init_params=None entirely) is a different pytree structure, so a
        # cold first chunk and a warm resumed chunk would compile TWO
        # whole-VI programs — halving the compile savings sliced dispatch
        # exists for. Identity/uniform defaults are what _run_bcpd would
        # synthesize anyway, and they are permutation-invariant (the
        # Morton perm_s below only matters for caller-supplied fields).
        p = dict(tf_init_params or {})
        dim = int(self._source.shape[1])
        m = int(self._source.shape[0])
        if v_init is None:
            v0 = np.zeros((dim, m), np.float64)
        else:
            v0 = np.asarray(v_init, np.float64)
            if perm_s is not None:
                v0 = v0[perm_s]
            v0 = v0.T                                       # (D, M)
        alpha0, sdiag0 = extra_init if extra_init is not None \
            else (None, None)
        if alpha0 is None:
            alpha0 = np.full((m,), 1.0 / m, np.float64)
        elif perm_s is not None:
            alpha0 = np.asarray(alpha0, np.float64)[perm_s]
        if sdiag0 is None:
            sdiag0 = np.ones((m,), np.float64)
        elif perm_s is not None:
            sdiag0 = np.asarray(sdiag0, np.float64)[perm_s]
        init_params = (np.asarray(p.get("rot", np.eye(dim)), np.float64),
                       np.asarray(p.get("t", np.zeros(dim)), np.float64),
                       np.float64(p.get("scale", 1.0)), v0, alpha0, sdiag0)
        try:
            # Only the Gram/Nystrom factor is needed here; _initialize
            # would additionally allocate an (M, M) eye (1.6 GB at 20k
            # dense, discarded unread) and dispatch a squared_kernel_sum
            # whose result the line below recomputes — each eager op is a
            # full tunnel RTT (CLAUDE.md).
            self.gmat = self._gram()
            # Same eps clamp as the in-loop sigma2 floor: a sliced-dispatch
            # resume re-feeds the previous chunk's sigma2, which may have
            # collapsed to ~0 after convergence.
            sigma2 = (self.gamma * mu.squared_kernel_sum(self._source, target)
                      if sigma2_init is None else max(float(sigma2_init),
                                                      _EPS))
            transf, _, _, sigma2_out, rmse, last = _run_bcpd(
                self._source, target, self.gmat,
                jnp.asarray(self.lmd, self._source.dtype),
                jnp.asarray(self.k, self._source.dtype),
                jnp.asarray(sigma2, self._source.dtype),
                w=float(w), maxiter=int(maxiter), tol=float(tol),
                block=int(_config.config.estep_chunk),
                use_culled=bool(use_culled), init_params=init_params)
            self._final_sigma2 = sigma2_out
            # The returned (best-visited) state's NN-RMSE, in THIS frame:
            # sliced dispatch compares it across chunks to keep the global
            # best (the unchunked program tracks it across all iterations).
            self._best_rmse = rmse
        finally:
            self._source = orig_source
            if perm_s is not None:
                # _initialize built gmat from the SORTED source; rebuild it
                # for the restored row order so later public maximization /
                # expectation calls see consistent rows.
                self.gmat = self._gram()
        if perm_s is not None:
            # v rows back to the caller's source order.
            rt = transf.rigid_trans
            v = jnp.zeros_like(transf.v).at[perm_s].set(transf.v)
            transf = tf.CombinedTransformation(rt.rot, rt.t, rt.scale, v)
        # Keep the raw FINAL iterate (vs the best-of result above) so a
        # sliced-dispatch caller can resume the VI trajectory mid-flight.
        # Only materialized on request: the unsort scatters are eager
        # dispatches and the buffers pin O(M) HBM per instance otherwise.
        # PACKED into one flat device array: the consumers
        # (_last_state_kwargs, _rmse_info) need every field on the host,
        # and each separate np.asarray fetch costs a full tunnel RTT on
        # remote-TPU harnesses — 8 fetches made warm frame-to-frame
        # tracking SLOWER than cold solves (measured round 4). One
        # concatenate dispatch + one fetch instead.
        self._last_flat = None
        self._last_mdim = None
        self._last_host = None   # invalidate the cached fetch
        if want_last:
            (rot_l, t_l, scale_l, v_l_t, s2_l, sdiag_l, alpha_l,
             rmse_l) = last
            v_l = v_l_t.T
            if perm_s is not None:
                v_l = jnp.zeros_like(v_l).at[perm_s].set(v_l)
                sdiag_l = jnp.zeros_like(sdiag_l).at[perm_s].set(sdiag_l)
                alpha_l = jnp.zeros_like(alpha_l).at[perm_s].set(alpha_l)
            ml, dl = v_l.shape
            self._last_flat = jnp.concatenate([
                jnp.ravel(rot_l), jnp.ravel(t_l),
                jnp.reshape(scale_l, (1,)), jnp.ravel(v_l),
                jnp.reshape(s2_l, (1,)), jnp.ravel(alpha_l),
                jnp.ravel(sdiag_l), jnp.reshape(rmse_l, (1,)),
                jnp.reshape(rmse, (1,))])
            self._last_mdim = (ml, dl)
        return transf

    def _registration_loop(self, target, w, maxiter, tol, callback_chunk=1):
        res = self._initialize(target)
        if callback_chunk > 1:
            return self._registration_loop_chunked(
                target, res, w, maxiter, tol, callback_chunk)
        rmse = None
        for i in range(maxiter):
            t_source = res.transformation._transform(self._source)
            est = self.expectation_step(
                t_source, target, res.transformation.rigid_trans.scale,
                res.alpha, res.sigma_mat, res.sigma2, w)
            res = self.maximization_step(
                target, res.transformation.rigid_trans, est, res.sigma2)
            for c in self._callbacks:
                c(res.transformation)
            tmp_rmse = float(mu.compute_rmse(t_source, target))
            log.debug("Iteration: {}, Criteria: {}".format(i, tmp_rmse))
            if rmse is not None and abs(rmse - tmp_rmse) < tol:
                break
            rmse = tmp_rmse
        return res.transformation

    def _registration_loop_chunked(self, target, res, w, maxiter, tol,
                                   chunk):
        """Callback loop at one dispatch per ``chunk`` iterations (see
        utils/chunked.py); identical per-iteration callback/convergence
        semantics as the eager loop above."""
        from .utils import chunked

        m, dim = self._source.shape
        # Promote the scalar-shaped initial state to the steady-state pytree
        # structure (scan carries must be type-stable): v (M, D), alpha (M,).
        rt0 = res.transformation.rigid_trans
        tr0 = tf.CombinedTransformation(
            rt0.rot, rt0.t, rt0.scale,
            jnp.zeros((m, dim), self._source.dtype))
        al0 = res.alpha
        if jnp.ndim(al0) == 0:
            al0 = jnp.full((m,), al0, self._source.dtype)
        state0 = (tr0, res.sigma_mat, al0,
                  jnp.asarray(res.sigma2, self._source.dtype))
        lmd = jnp.asarray(self.lmd, self._source.dtype)
        kp = jnp.asarray(self.k, self._source.dtype)
        prev = {"rmse": None}

        def chunk_fn(st, kk):
            return _bcpd_chunk(self._source, target, st[0], st[1], st[2],
                               st[3], self.gmat, lmd, kp, w=float(w), k=kk)

        def handle(i, hist, j):
            trs, rmses = hist
            tr_j = chunked.slice_tree(trs, j)
            for c in self._callbacks:
                c(tr_j)
            tmp_rmse = float(rmses[j])
            log.debug("Iteration: {}, Criteria: {}".format(i, tmp_rmse))
            stop = prev["rmse"] is not None \
                and abs(prev["rmse"] - tmp_rmse) < tol
            prev["rmse"] = tmp_rmse
            return stop, tr_j

        out = chunked.run_chunked(chunk_fn, state0, int(maxiter),
                                  int(chunk), handle)
        return out if out is not None else res.transformation


def registration_bcpd(
    source,
    target,
    w: float = 0.0,
    maxiter: int = 50,
    tol: float = 0.001,
    callbacks: List[Callable] = [],
    normalize: bool = True,
    callback_chunk: int = 1,
    tf_init_params=None,
    v_init=None,
    sigma2_init=None,
    **kwargs: Any,
) -> tf.Transformation:
    """BCPD registration — drop-in for reference bcpd.py:159-185.

    Args:
        source: Source point cloud (ndarray or open3d PointCloud).
        target: Target point cloud.
        w: Weight of the uniform outlier distribution.
        maxiter: Maximum VI iterations.
        tol: Tolerance on the nearest-neighbor RMSE criterion.
        callbacks: Called with the current Transformation each iteration
            (receives the transform in normalized coordinates when
            ``normalize`` is on).
        callback_chunk: VI iterations per device dispatch in callback
            mode; callbacks still fire once per iteration (utils/chunked.py).
        normalize: Register in coordinates rescaled so the initial EM
            temperature sigma2_0 = squared_kernel_sum is exactly 1, then
            denormalize the result. The BCPD hyperparameters (IMQ kernel
            c=1, lmd=2, the sigma2_p**2 in the Sigma update) are only
            well-behaved near that regime — the reference works on its
            fish example (sigma2_0 = 1.08) and collapses on the 0.1-scale
            horse; this makes the algorithm scale-invariant. Set False for
            raw reference behavior. For dense clouds a larger ``lmd``
            (e.g. 10) strengthens the motion-coherence prior and speeds
            convergence of the rigid component.
        tf_init_params / v_init / sigma2_init: Warm start in RAW
            coordinates — {'rot','t','scale'} rigid params, the (M, D)
            nonrigid displacement field, and the starting variance. Used
            by :func:`probreg_tpu.pyramid.registration_bcpd_pyramid` to
            carry the coarse level's solution down; each is converted to
            the normalized frame internally.

    Returns:
        tf.Transformation: Estimated CombinedTransformation.
    """
    transf, _ = _registration_bcpd_impl(
        source, target, w=w, maxiter=maxiter, tol=tol, callbacks=callbacks,
        normalize=normalize, callback_chunk=callback_chunk,
        tf_init_params=tf_init_params, v_init=v_init,
        sigma2_init=sigma2_init, **kwargs)
    return transf


def _fetch_last_host(bc):
    """The packed final-VI-state vector as host float64 (cached: one
    device->host transfer per registration, shared by _last_state_kwargs
    and _rmse_info). None when the executed path did not track it."""
    flat = getattr(bc, "_last_flat", None)
    if flat is None:
        return None
    host = getattr(bc, "_last_host", None)
    if host is None:
        host = np.asarray(flat, np.float64)
        bc._last_host = host
    return host


def _rmse_info(bc):
    """{'best': best-visited NN-RMSE, 'last': final iterate's NN-RMSE} as
    host floats (None entries when the executed path does not track them).
    Normalized-frame, but chunks of one sliced level share the
    normalization, so cross-chunk comparisons are sound: 'best' drives the
    global best-across-chunks result selection, 'last' the cross-boundary
    |rmse - rmse_prev| < tol trajectory stop."""
    host = _fetch_last_host(bc)
    if host is None:
        return {"best": None, "last": None}
    return {"last": float(host[-2]), "best": float(host[-1])}


def _last_state_kwargs(bc, centroid, scale):
    """Raw-frame warm-start kwargs from the runner's final VI iterate
    (None when the executed path does not track it, e.g. callback loops).
    Frame math mirrors the denormalization in _registration_bcpd_impl.
    Reads the PACKED state (one host transfer, see _registration_jit)."""
    host = _fetch_last_host(bc)
    if host is None:
        return None
    m, dim = bc._last_mdim
    d2 = dim * dim
    rot = host[:d2].reshape(dim, dim)
    t = host[d2:d2 + dim]
    sc = host[d2 + dim]
    off = d2 + dim + 1
    v = host[off:off + m * dim].reshape(m, dim)
    off += m * dim
    s2 = host[off]
    off += 1
    alpha = host[off:off + m]
    sdiag = host[off + m:off + 2 * m]
    return {
        "tf_init_params": {
            "rot": rot,
            "t": scale * t + centroid,
            "scale": float(sc),
        },
        "v_init": scale * v - centroid,
        "sigma2_init": float(s2) * scale ** 2,
        # Opaque VI-state carries (valid only when re-fed with the SAME
        # source/target pair): mixing weights + diag(Sigma) in raw units.
        "_alpha_init": alpha,
        "_sdiag_init": sdiag * scale ** 2,
    }


def _registration_bcpd_impl(
    source, target, *, w, maxiter, tol, callbacks, normalize,
    callback_chunk, tf_init_params=None, v_init=None, sigma2_init=None,
    return_last=False, _alpha_init=None, _sdiag_init=None,
    **kwargs: Any,
):
    """registration_bcpd body; additionally returns the final RAW-frame
    sigma2 (None on paths that do not track it) for the pyramid carry.

    ``return_last``: additionally return the raw-frame FINAL VI iterate as
    a kwargs dict ({tf_init_params, v_init, sigma2_init}, or None on paths
    that do not track it) — feeding it back continues the trajectory
    mid-flight (sliced dispatch), unlike the best-visited result state.
    """
    src = np.asarray(interop.as_points(source), dtype=np.float64)
    tgt = np.asarray(interop.as_points(target), dtype=np.float64)
    warm = (tf_init_params or v_init is not None
            or sigma2_init is not None)
    n_starts = int(kwargs.pop("n_starts", 1))
    if n_starts > 1:
        if callbacks or not normalize:
            raise ValueError("n_starts > 1 requires the normalized "
                             "no-callback path")
        if warm:
            raise ValueError("n_starts > 1 is incompatible with warm "
                             "starts (the orientation grid replaces them)")
        # The multistart dispatch is n_starts whole-VI loops vmapped into
        # ONE unslicable program; guard on the raw pair count (the grid
        # multiplies the load n_starts-fold on top).
        _hw_guard(
            src.shape[0] * tgt.shape[0], None,
            f"multistart at M*N = {src.shape[0]}*{tgt.shape[0]}",
            "Use registration_bcpd_pyramid(n_starts=...) — the "
            "orientation search runs on the small coarsest level.")
        results, s2_raws = _registration_bcpd_multistart_batch(
            [src], [tgt], w=w, maxiter=maxiter, tol=tol,
            n_starts=n_starts, **kwargs)
        s2_raw = float(s2_raws[0])
        return (results[0], s2_raw, None, None) if return_last \
            else (results[0], s2_raw)
    if not normalize:
        bc = CombinedBCPD(src, **kwargs)
        bc.set_callbacks(callbacks)
        extra = None if _alpha_init is None and _sdiag_init is None \
            else (_alpha_init, _sdiag_init)
        res = bc.registration(tgt, w, maxiter, tol,
                              callback_chunk=callback_chunk,
                              tf_init_params=tf_init_params, v_init=v_init,
                              sigma2_init=sigma2_init, extra_init=extra,
                              want_last=return_last)
        s2f = getattr(bc, "_final_sigma2", None)
        if not return_last:
            return res, s2f
        return (res, s2f,
                _last_state_kwargs(bc, np.zeros(src.shape[1]), 1.0),
                _rmse_info(bc))

    centroid = np.concatenate([src, tgt], axis=0).mean(axis=0)
    skc = mu.squared_kernel_sum_np(src, tgt)
    scale = max(np.sqrt(skc), 1e-12)
    # Warm start raw -> normalized frame. With y_n = (y - c)/sc the raw
    # transform s R (y + v) + t becomes s R (y_n + v_n) + t_n with
    # v_n = (v + c)/sc, t_n = (t - c)/sc (the exact inverse of the
    # denormalization below); variances scale by 1/sc^2.
    tf_init_n = None
    if tf_init_params:
        tf_init_n = dict(tf_init_params)
        if "t" in tf_init_n:
            tf_init_n["t"] = (np.asarray(tf_init_n["t"], np.float64)
                              - centroid) / scale
    if v_init is None and tf_init_params:
        # A raw-frame pose with no displacement field means v_raw = 0,
        # which in the normalized frame is v_n = centroid/scale — NOT
        # v_n = 0, which would compose to s R (y - centroid) + t, a
        # different transform (off by (s R - I) @ centroid) whenever the
        # cloud sits away from the origin. Matches registration_bcpd_2d.
        v_init_n = np.broadcast_to(centroid / scale, src.shape)
    elif v_init is None:
        v_init_n = None
    else:
        v_init_n = (np.asarray(v_init, np.float64) + centroid) / scale
    sigma2_init_n = None if sigma2_init is None \
        else float(sigma2_init) / scale ** 2
    extra_n = None
    if _alpha_init is not None or _sdiag_init is not None:
        extra_n = (_alpha_init,
                   None if _sdiag_init is None
                   else np.asarray(_sdiag_init, np.float64) / scale ** 2)
    bc = CombinedBCPD((src - centroid) / scale, **kwargs)
    bc.set_callbacks(callbacks)
    res = bc.registration((tgt - centroid) / scale, w, maxiter, tol,
                          callback_chunk=callback_chunk,
                          tf_init_params=tf_init_n, v_init=v_init_n,
                          sigma2_init=sigma2_init_n, extra_init=extra_n,
                          want_last=return_last)
    # Denormalize: y -> s R (y + v_raw) + t_raw with
    # v_raw = scale * v_hat - centroid, t_raw = scale * t_hat + centroid.
    rt = res.rigid_trans
    v_raw = scale * res.v - centroid
    t_raw = scale * rt.t + centroid
    sigma2_raw = getattr(bc, "_final_sigma2", None)
    if sigma2_raw is not None:
        sigma2_raw = float(sigma2_raw) * scale ** 2
    out = tf.CombinedTransformation(rt.rot, t_raw, rt.scale, v_raw)
    if not return_last:
        return out, sigma2_raw
    return (out, sigma2_raw, _last_state_kwargs(bc, centroid, scale),
            _rmse_info(bc))


def _run_bcpd_multistart(source, target, gamma, lmd, k, rots0, *, w,
                         maxiter, tol, rank, block, smask=None, tmask=None,
                         min_m=None):
    """VI restarts over the orientation grid: rotate the SOURCE by each grid
    rotation (the IMQ Gram matrix is rotation-invariant, so it is computed
    once), run the VI loop vmapped, select by the final NN-RMSE the loop
    already tracks, and compose the winner back into the original frame:
    T(R0 y) = s(R R0)(y + R0^T v) + t. Optional masks: ragged padding."""
    if rank is None:
        gmat = mu.inverse_multiquadric_kernel(source, source)
    else:
        gmat = tuple(_lowrank.lowrank_imq(source, 1.0, rank, valid=smask,
                                          max_landmarks=min_m))

    def run(rot0):
        src_r = source @ rot0.T
        if smask is None:
            sigma2_0 = gamma * mu.squared_kernel_sum(src_r, target)
        else:
            sigma2_0 = gamma * mu.masked_squared_kernel_sum_t(
                src_r.T, target.T, smask, tmask)
        transf, _, _, s2, rmse, _ = _run_bcpd(
            src_r, target, gmat, lmd, k, sigma2_0,
            w=w, maxiter=maxiter, tol=tol, block=block,
            smask=smask, tmask=tmask)
        rt = transf.rigid_trans
        return rt.rot @ rot0, rt.t, rt.scale, transf.v @ rot0, s2, rmse

    rot, t, scale, v, s2, rmse = jax.vmap(run)(rots0)
    i = jnp.argmin(jnp.where(jnp.isnan(rmse), jnp.inf, rmse))
    # Also return the WINNER's final sigma2: the pyramid/tracker carry it
    # as the next warm start's temperature — dropping it forced the level
    # above a multistart to re-run the dense start-temperature annealing.
    return tf.CombinedTransformation(rot[i], t[i], scale[i], v[i]), s2[i]


@partial(jax.jit, static_argnames=("w", "maxiter", "tol", "rank", "block"))
def _run_bcpd_multistart_batch(sources, targets, gamma, lmd, k, rots0, *,
                               w, maxiter, tol, rank, block):
    run = partial(_run_bcpd_multistart, gamma=gamma, lmd=lmd, k=k,
                  rots0=rots0, w=w, maxiter=maxiter, tol=tol, rank=rank,
                  block=block)
    return jax.vmap(lambda s, t: run(s, t))(sources, targets)


@partial(jax.jit, static_argnames=("w", "maxiter", "tol", "rank", "block",
                                   "min_m"))
def _run_bcpd_multistart_ragged_batch(sources, targets, smasks, tmasks,
                                      gamma, lmd, k, rots0, *, w, maxiter,
                                      tol, rank, block, min_m=None):
    run = partial(_run_bcpd_multistart, gamma=gamma, lmd=lmd, k=k,
                  rots0=rots0, w=w, maxiter=maxiter, tol=tol, rank=rank,
                  block=block, min_m=min_m)
    return jax.vmap(
        lambda s, t, sm, tm: run(s, t, smask=sm, tmask=tm))(
        sources, targets, smasks, tmasks)


@partial(jax.jit, static_argnames=("w", "maxiter", "tol", "rank", "block",
                                   "min_m"))
def _run_bcpd_ragged_batch(sources, targets, smasks, tmasks, sigma2_0s,
                           lmd, k, *, w, maxiter, tol, rank, block,
                           min_m=None):
    def run(src, tgt, sm, tm, s0):
        if rank is None:
            gmat = mu.inverse_multiquadric_kernel(src, src)
        else:
            gmat = tuple(_lowrank.lowrank_imq(src, 1.0, rank, valid=sm,
                                              max_landmarks=min_m))
        transf, *_ = _run_bcpd(
            src, tgt, gmat, lmd, k, s0,
            w=w, maxiter=maxiter, tol=tol, block=block, smask=sm, tmask=tm)
        return transf

    return jax.vmap(run)(sources, targets, smasks, tmasks, sigma2_0s)


@partial(jax.jit, static_argnames=("w", "maxiter", "tol", "rank", "block"))
def _run_bcpd_batch(sources, targets, lmd, k, gamma, *, w, maxiter, tol,
                    rank, block):
    def run(src, tgt):
        if rank is None:
            gmat = mu.inverse_multiquadric_kernel(src, src)
        else:
            gmat = tuple(_lowrank.lowrank_imq(src, 1.0, rank))
        sigma2 = gamma * mu.squared_kernel_sum(src, tgt)
        transf, *_ = _run_bcpd(
            src, tgt, gmat, lmd, k, sigma2,
            w=w, maxiter=maxiter, tol=tol, block=block)
        return transf

    return jax.vmap(run)(sources, targets)


def registration_bcpd_batch(
    sources,
    targets,
    w: float = 0.0,
    maxiter: int = 50,
    tol: float = 0.001,
    lmd: float = 2.0,
    k: float = 1.0e20,
    gamma: float = 1.0,
    rank=None,
    normalize: bool = True,
    n_starts: int = 1,
) -> List[tf.Transformation]:
    """Register B cloud pairs with BCPD in ONE compiled program.

    New capability vs the reference (single pair per call): ``sources``
    (B, M, D) and ``targets`` (B, N, D) run the whole VI loop vmapped —
    one dispatch, B ``CombinedTransformation`` results. Per-pair
    normalization (see :func:`registration_bcpd`) happens host-side on the
    tiny centroid/scale statistics; everything else is one XLA program.

    Ragged batches: ``sources`` / ``targets`` may be Python lists of clouds
    with different point counts per pair — zero-padded and run through a
    masked E-step (padded points carry no posterior mass; the Dirichlet /
    outlier normalizers and the Nystrom landmarks use true counts). Each
    returned transformation's ``v`` field is sliced back to its true size.

    Returns a list of ``tf.CombinedTransformation``.
    """
    ragged = isinstance(sources, (list, tuple)) \
        or isinstance(targets, (list, tuple))
    if n_starts > 1 and not ragged:
        if not normalize:
            raise ValueError("n_starts > 1 requires the normalized path")
        return _registration_bcpd_multistart_batch(
            sources, targets, w=w, maxiter=maxiter, tol=tol,
            n_starts=n_starts, lmd=lmd, k=k, gamma=gamma, rank=rank)[0]
    if ragged:
        if n_starts > 1 and not normalize:
            raise ValueError("n_starts > 1 requires the normalized path")
        return _registration_bcpd_ragged(
            list(sources), list(targets), w=w, maxiter=maxiter, tol=tol,
            lmd=lmd, k=k, gamma=gamma, rank=rank, normalize=normalize,
            n_starts=n_starts)
    src = np.asarray(interop.as_points(sources), dtype=np.float64)
    tgt = np.asarray(interop.as_points(targets), dtype=np.float64)
    b, m, dim = src.shape
    n = tgt.shape[1]
    _hw_guard(
        b * m * n, None, f"batch (B={b}, M*N={m}*{n})",
        "Register pairs individually via registration_bcpd_pyramid, or "
        "split the batch.")
    if normalize:
        centroid = (src.sum(axis=1) + tgt.sum(axis=1)) / (m + n)   # (B, D)
        src_h = src - centroid[:, None]
        tgt_h = tgt - centroid[:, None]
        skc = ((src_h ** 2).sum(axis=(1, 2)) * n
               + (tgt_h ** 2).sum(axis=(1, 2)) * m
               - 2.0 * np.einsum("bd,bd->b", src_h.sum(axis=1),
                                 tgt_h.sum(axis=1))) / (m * dim * n)
        scale = np.maximum(np.sqrt(skc), 1e-12)                     # (B,)
        src_n = src_h / scale[:, None, None]
        tgt_n = tgt_h / scale[:, None, None]
    else:
        centroid = np.zeros((b, dim))
        scale = np.ones((b,))
        src_n, tgt_n = src, tgt
    dt = _config.config.dtype
    transf = _run_bcpd_batch(
        jnp.asarray(src_n, dt), jnp.asarray(tgt_n, dt),
        jnp.asarray(lmd, dt), jnp.asarray(k, dt), jnp.asarray(gamma, dt),
        w=float(w), maxiter=int(maxiter), tol=float(tol),
        rank=None if rank is None else int(rank),
        block=int(_config.config.estep_chunk))
    rot = np.asarray(transf.rigid_trans.rot)
    tvec = np.asarray(transf.rigid_trans.t)
    s = np.asarray(transf.rigid_trans.scale)
    v = np.asarray(transf.v)
    return [
        tf.CombinedTransformation(
            rot[i], scale[i] * tvec[i] + centroid[i], s[i],
            scale[i] * v[i] - centroid[i])
        for i in range(b)
    ]


def _registration_bcpd_multistart_batch(sources, targets, *, w, maxiter,
                                        tol, n_starts, lmd=2.0, k=1.0e20,
                                        gamma=1.0, rank=None):
    """Normalized multistart BCPD over a (stacked or listed) equal-size
    batch: one dispatch runs B pairs x S orientation-grid starts."""
    from . import cost_functions as cf

    src = np.stack([np.asarray(interop.as_points(s), np.float64)
                    for s in sources]) if isinstance(sources, (list, tuple)) \
        else np.asarray(interop.as_points(sources), np.float64)
    tgt = np.stack([np.asarray(interop.as_points(t), np.float64)
                    for t in targets]) if isinstance(targets, (list, tuple)) \
        else np.asarray(interop.as_points(targets), np.float64)
    b, m, dim = src.shape
    n = tgt.shape[1]
    if dim != 3:
        raise ValueError("n_starts > 1 supports 3-D clouds only")
    _hw_guard(
        b * int(n_starts) * m * n, None,
        f"multistart batch (B={b}, n_starts={n_starts}, M*N={m}*{n})",
        "Register pairs individually via registration_bcpd_pyramid, or "
        "split the batch.")
    centroid = (src.sum(axis=1) + tgt.sum(axis=1)) / (m + n)
    src_h = src - centroid[:, None]
    tgt_h = tgt - centroid[:, None]
    skc = ((src_h ** 2).sum(axis=(1, 2)) * n
           + (tgt_h ** 2).sum(axis=(1, 2)) * m
           - 2.0 * np.einsum("bd,bd->b", src_h.sum(axis=1),
                             tgt_h.sum(axis=1))) / (m * dim * n)
    scale = np.maximum(np.sqrt(skc), 1e-12)
    dt = _config.config.dtype
    rots0 = jnp.asarray(
        cf.RigidCostFunction.initial_multistart_rots(int(n_starts)), dt)
    transf, s2_n = _run_bcpd_multistart_batch(
        jnp.asarray(src_h / scale[:, None, None], dt),
        jnp.asarray(tgt_h / scale[:, None, None], dt),
        jnp.asarray(gamma, dt), jnp.asarray(lmd, dt), jnp.asarray(k, dt),
        rots0, w=float(w), maxiter=int(maxiter), tol=float(tol),
        rank=None if rank is None else int(rank),
        block=int(_config.config.estep_chunk))
    rot = np.asarray(transf.rigid_trans.rot)
    tvec = np.asarray(transf.rigid_trans.t)
    s = np.asarray(transf.rigid_trans.scale)
    v = np.asarray(transf.v)
    results = [
        tf.CombinedTransformation(
            rot[i], scale[i] * tvec[i] + centroid[i], s[i],
            scale[i] * v[i] - centroid[i])
        for i in range(b)
    ]
    # Winner sigma2 back in raw units — the pyramid/tracker warm carry.
    return results, np.asarray(s2_n, np.float64) * scale ** 2


def _registration_bcpd_ragged(sources, targets, *, w, maxiter, tol, lmd, k,
                              gamma, rank, normalize, n_starts=1):
    """Ragged-batch BCPD: per-pair normalization on host, masked VI on
    device (one dispatch), denormalize + slice v back to true sizes.
    ``n_starts > 1``: masked orientation-grid restarts per pair."""
    srcs = [np.asarray(interop.as_points(s), dtype=np.float64)
            for s in sources]
    tgts = [np.asarray(interop.as_points(t), dtype=np.float64)
            for t in targets]
    dim = srcs[0].shape[1]
    cents, scales, sig0s = [], [], []
    for sr, tg in zip(srcs, tgts):
        m, n = sr.shape[0], tg.shape[0]
        if normalize:
            c0 = np.concatenate([sr, tg], axis=0).mean(axis=0)
        else:
            c0 = np.zeros(dim)
        sh, th = sr - c0, tg - c0
        skc = ((sh ** 2).sum() * n + (th ** 2).sum() * m
               - 2.0 * float(sh.sum(0) @ th.sum(0))) / (m * dim * n)
        sc = max(np.sqrt(skc), 1e-12) if normalize else 1.0
        cents.append(c0)
        scales.append(sc)
        # sigma2_0 = gamma * squared_kernel_sum of the (normalized) pair;
        # exactly gamma when normalize (that's what the rescale enforces).
        sig0s.append(gamma if normalize else gamma * skc)
    dt = _config.config.dtype
    src_p, smask = interop.pad_ragged(
        [(sr - c0) / sc for sr, c0, sc in zip(srcs, cents, scales)], dt)
    tgt_p, tmask = interop.pad_ragged(
        [(tg - c0) / sc for tg, c0, sc in zip(tgts, cents, scales)], dt)
    min_m = min(sr.shape[0] for sr in srcs)
    if rank is not None and int(rank) > min_m:
        raise ValueError(
            "rank=%d exceeds the smallest source cloud (%d points) in the "
            "ragged batch" % (int(rank), min_m))
    _hw_guard(
        src_p.shape[0] * max(1, int(n_starts))
        * src_p.shape[1] * tgt_p.shape[1], None,
        f"ragged batch (B={src_p.shape[0]}, padded M*N="
        f"{src_p.shape[1]}*{tgt_p.shape[1]})",
        "Register pairs individually via registration_bcpd_pyramid, or "
        "split the batch.")
    if n_starts > 1:
        from . import cost_functions as cf

        rots0 = jnp.asarray(
            cf.RigidCostFunction.initial_multistart_rots(
                int(n_starts), src_p.shape[-1]), dt)
        transf, _ = _run_bcpd_multistart_ragged_batch(
            jnp.asarray(src_p), jnp.asarray(tgt_p),
            jnp.asarray(smask), jnp.asarray(tmask),
            jnp.asarray(gamma, dt), jnp.asarray(lmd, dt),
            jnp.asarray(k, dt), rots0,
            w=float(w), maxiter=int(maxiter), tol=float(tol),
            rank=None if rank is None else int(rank),
            block=int(_config.config.estep_chunk),
            min_m=None if rank is None else min_m)
    else:
        transf = _run_bcpd_ragged_batch(
            jnp.asarray(src_p), jnp.asarray(tgt_p),
            jnp.asarray(smask), jnp.asarray(tmask),
            jnp.asarray(np.asarray(sig0s), dt),
            jnp.asarray(lmd, dt), jnp.asarray(k, dt),
            w=float(w), maxiter=int(maxiter), tol=float(tol),
            rank=None if rank is None else int(rank),
            block=int(_config.config.estep_chunk),
            min_m=None if rank is None else min_m)
    rot = np.asarray(transf.rigid_trans.rot)
    tvec = np.asarray(transf.rigid_trans.t)
    s = np.asarray(transf.rigid_trans.scale)
    v = np.asarray(transf.v)
    return [
        tf.CombinedTransformation(
            rot[i], scales[i] * tvec[i] + cents[i], s[i],
            scales[i] * v[i, : srcs[i].shape[0]] - cents[i])
        for i in range(len(srcs))
    ]
