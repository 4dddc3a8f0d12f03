"""Coherent Point Drift (rigid / affine / nonrigid / constrained-nonrigid).

Parity with reference probreg/cpd.py, redesigned TPU-first:

* The EM loop is a ``lax.while_loop`` over a pytree state, so an entire
  registration is ONE compiled XLA program (reference: python loop over
  numpy/cupy ops, cpd.py:106-120).
* The E-step never materializes the M x N posterior
  (:mod:`probreg_tpu.ops.estep`); M-steps consume psum-able moments so the
  same code path shards over a device mesh
  (:mod:`probreg_tpu.parallel.sharded`).
* M-steps are tiny D x D linear-algebra kernels (SVD with det-sign fix,
  reference cpd.py:160-192; linear solves, cpd.py:219-303).
* The EM core is *functional*: module-level step functions + a module-level
  jitted runner, so XLA's compile cache is shared across instances and
  repeated ``registration_cpd`` calls are compile-free.
"""

from __future__ import annotations

import abc
from collections import namedtuple
from functools import partial
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import config as _config
from .log import log
from .models import transformation as tf
from .ops import estep as estep_ops
from .ops import lowrank
from .ops.estep import EstepMoments
from .utils import interop
from .utils import math_utils as mu

EstepResult = namedtuple("EstepResult", ["pt1", "p1", "px", "n_p"])
MstepResult = namedtuple("MstepResult", ["transformation", "sigma2", "q"])
MstepResult.__doc__ = """Result of Maximization step.

    Attributes:
        transformation (tf.Transformation): Transformation from source to target.
        sigma2 (float): Variance of Gaussian distribution.
        q (float): Result of likelihood.
"""

_F32_EPS = float(np.finfo(np.float32).eps)


def _fused_dims_ok(m, n):
    # VMEM-shape gate for the single-launch whole-EM kernels: the
    # m*n bound alone is defeated by skewed shapes (ops/em_pallas.
    # fused_dims_ok — review finding).
    from .ops.em_pallas import fused_dims_ok

    return fused_dims_ok(m, n)


def _as_jnp(x):
    return jnp.asarray(interop.as_points(x, dtype=_config.config.dtype))


# --------------------------------------------------------------------------
# M-steps (pure functions of the E-step moments)
# --------------------------------------------------------------------------

def rigid_maximization_step(source, mom: EstepMoments, update_scale=True) -> MstepResult:
    """Weighted-mean centering + D x D SVD with det-sign fix (cpd.py:160-192).

    ``tr_xp1x`` uses the identity sum_j pt1_j x_j == colsum(px), which reduces
    it to ``xx - n_p |mu_x|^2`` — no pt1 vector needed (sharding-friendly).
    ``update_scale`` may be a traced boolean.
    """
    p1, px, n_p, xx = mom.p1, mom.px, mom.n_p, mom.xx
    dim = source.shape[1]
    us = jnp.asarray(update_scale)
    mu_x = jnp.sum(px, axis=0) / n_p
    mu_y = source.T @ p1 / n_p
    source_hat = source - mu_y
    a = px.T @ source_hat - jnp.outer(mu_x, p1 @ source_hat)
    u, _, vh = jnp.linalg.svd(a, full_matrices=True)
    c = jnp.ones(dim, a.dtype).at[-1].set(jnp.linalg.det(u @ vh))
    rot = (u * c) @ vh
    tr_atr = jnp.trace(a.T @ rot)
    tr_yp1y = jnp.sum(p1 * jnp.sum(source_hat * source_hat, axis=1))
    scale = jnp.where(us, tr_atr / tr_yp1y, 1.0)
    t = mu_x - scale * rot @ mu_y
    tr_xp1x = xx - n_p * jnp.sum(mu_x * mu_x)
    # Deviation from reference cpd.py:188 in the fixed-scale branch (which
    # keeps a single -tr_atr cross term so sigma2 floors at tr_yp1y/(n_p*dim)
    # and never anneals): use the CPD-paper estimate with the full -2*tr_atr.
    sigma2 = jnp.where(
        us,
        (tr_xp1x - scale * tr_atr) / (n_p * dim),
        (tr_xp1x - 2.0 * scale * tr_atr + tr_yp1y) / (n_p * dim),
    )
    sigma2 = jnp.maximum(sigma2, _F32_EPS)
    q = (tr_xp1x - 2.0 * scale * tr_atr + scale**2 * tr_yp1y) / (2.0 * sigma2)
    q = q + dim * n_p * 0.5 * jnp.log(sigma2)
    return MstepResult(tf.RigidTransformation(rot, t, scale), sigma2, q)


def affine_maximization_step(source, mom: EstepMoments) -> MstepResult:
    """Linear solve yp1y^T B^T = a^T (reference cpd.py:219-244)."""
    p1, px, n_p, xx = mom.p1, mom.px, mom.n_p, mom.xx
    dim = source.shape[1]
    mu_x = jnp.sum(px, axis=0) / n_p
    mu_y = source.T @ p1 / n_p
    source_hat = source - mu_y
    a = px.T @ source_hat - jnp.outer(mu_x, p1 @ source_hat)
    yp1y = (source_hat.T * p1) @ source_hat
    b = jnp.linalg.solve(yp1y.T, a.T).T
    t = mu_x - b @ mu_y
    tr_xp1x = xx - n_p * jnp.sum(mu_x * mu_x)
    tr_ab = jnp.trace(a @ b.T)
    sigma2 = jnp.maximum((tr_xp1x - tr_ab) / (n_p * dim), _F32_EPS)
    q = (tr_xp1x - tr_ab) / (2.0 * sigma2) + dim * n_p * 0.5 * jnp.log(sigma2)
    return MstepResult(tf.AffineTransformation(b, t), sigma2, q)


def nonrigid_maximization_step(source, mom: EstepMoments, g, lmd, sigma2_p) -> MstepResult:
    """Solve ((p1 . G) + lmd s2 I) W = PX - p1 . Y (reference cpd.py:284-303)."""
    p1, px, n_p, xx = mom.p1, mom.px, mom.n_p, mom.xx
    dim = source.shape[1]
    m = source.shape[0]
    lhs = (p1 * g).T + lmd * sigma2_p * jnp.eye(m, dtype=g.dtype)
    rhs = px - (source.T * p1).T
    w = jnp.linalg.solve(lhs, rhs)
    t = source + g @ w
    tr_pxt = jnp.sum(px * t)
    tr_tpt = jnp.sum(p1 * jnp.sum(t * t, axis=1))
    # Floor like the rigid path (line ~90): on clean 1:1 clouds sigma2
    # anneals to f32 cancellation scale and can come out <= 0, NaN-ing the
    # next E-step's exp (and the lmd*sigma2*I regularizer with it).
    sigma2 = jnp.maximum((xx - 2.0 * tr_pxt + tr_tpt) / (n_p * dim),
                         _F32_EPS)
    return MstepResult(tf.NonRigidTransformation(w, g=g), sigma2, sigma2)


def nonrigid_lowrank_maximization_step(
    source, mom: EstepMoments, u, lam, lmd, sigma2_p,
    d_extra=None, rhs_extra=None,
) -> MstepResult:
    """Low-rank nonrigid M-step: the reference's M x M solve (cpd.py:297)
    done through the rank-K Woodbury identity (ops/lowrank.py).

    With G ~= U L U^T, ((d . G) + lmd s2 I) W = rhs costs one K x K solve
    plus skinny matmuls — O(M K (K + D)) instead of O(M^3), O(M K) memory.
    ``d_extra``/``rhs_extra`` carry the constrained variant's prior terms
    (reference cpd.py:377-404): d = p1 + s2a p1_tilde, rhs += s2a rhs_tilde.
    """
    p1, px, n_p, xx = mom.p1, mom.px, mom.n_p, mom.xx
    dim = source.shape[1]
    d = p1 if d_extra is None else p1 + d_extra
    rhs = px - source * p1[:, None]
    if rhs_extra is not None:
        rhs = rhs + rhs_extra
    zc = lowrank.woodbury_coeffs(u, lam, d, lmd * sigma2_p, rhs)
    t = source + u @ zc
    tr_pxt = jnp.sum(px * t)
    tr_tpt = jnp.sum(p1 * jnp.sum(t * t, axis=1))
    sigma2 = jnp.maximum((xx - 2.0 * tr_pxt + tr_tpt) / (n_p * dim),
                         _F32_EPS)
    return MstepResult(tf.LowRankNonRigidTransformation(zc, u, lam), sigma2, sigma2)


def constrained_nonrigid_maximization_step(
    source, mom: EstepMoments, g, lmd, sigma2_p, alpha, p1_tilde, px_tilde
) -> MstepResult:
    """Reference cpd.py:377-404 with prior reliability alpha."""
    p1, px, n_p, xx = mom.p1, mom.px, mom.n_p, mom.xx
    dim = source.shape[1]
    m = source.shape[0]
    s2a = sigma2_p / alpha
    lhs = (p1 * g).T + s2a * (p1_tilde * g).T + lmd * sigma2_p * jnp.eye(m, dtype=g.dtype)
    rhs = px - (source.T * p1).T + s2a * (px_tilde - (source.T * p1_tilde).T)
    w = jnp.linalg.solve(lhs, rhs)
    t = source + g @ w
    tr_pxt = jnp.sum(px * t)
    tr_tpt = jnp.sum(p1 * jnp.sum(t * t, axis=1))
    # Floor like the rigid path (line ~90): on clean 1:1 clouds sigma2
    # anneals to f32 cancellation scale and can come out <= 0, NaN-ing the
    # next E-step's exp (and the lmd*sigma2*I regularizer with it).
    sigma2 = jnp.maximum((xx - 2.0 * tr_pxt + tr_tpt) / (n_p * dim),
                         _F32_EPS)
    return MstepResult(tf.NonRigidTransformation(w, g=g), sigma2, sigma2)


# --------------------------------------------------------------------------
# Transposed-layout fast path (rigid / affine)
# --------------------------------------------------------------------------
#
# A (M, 3) point array occupies 3 of 128 VPU lanes; on TPU every op touching
# that layout inside the EM loop costs ~0.25 ms in relayout overhead (~100x
# the actual compute at probreg sizes). The fast path keeps points as (D, M)
# — lanes = points — for the whole loop: transform is a (D,D)x(D,M) matmul,
# the E-step distance matrix contracts the sublane dim on the MXU, and the
# px/p1 moments come from one (D+1, N)x(M, N)^T matmul (the appended
# ones-row yields p1 for free). Measured on v5e at bunny size: 0.002 ms/iter
# vs 0.3 ms/iter for the (M, 3) layout.

def _estep_t(t_src_t, xs_t, xs_ext, x2, sigma2, w, kmask=None, m_eff=None,
             n_eff=None):
    """Transposed E-step: returns (pt1 (N,), p1 (M,), px_t (D, M), n_p, xx).

    ``kmask``/``m_eff``/``n_eff``: ragged-batch padding — padded rows and
    columns are zeroed out of the kernel matrix (they then carry no
    posterior mass anywhere downstream) and the outlier constant uses the
    true counts.
    """
    dim, m = t_src_t.shape
    n = xs_t.shape[1]
    if m_eff is None:
        m_eff, n_eff = m, n
    eps = jnp.asarray(jnp.finfo(jnp.float32).eps, t_src_t.dtype)
    c = estep_ops.outlier_constant(sigma2, w, m_eff, n_eff, dim)
    y2 = jnp.sum(t_src_t * t_src_t, axis=0)[:, None]       # (M, 1)
    xy = jax.lax.dot_general(
        t_src_t, xs_t, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)               # (M, N)
    g = jnp.exp(-jnp.maximum(y2 + x2 - 2.0 * xy, 0.0) / (2.0 * sigma2))
    if kmask is not None:
        g = g * kmask
    den_raw = jnp.sum(g, axis=0, keepdims=True)            # (1, N)
    den = jnp.where(den_raw == 0.0, eps, den_raw) + c
    pt1 = (den_raw / den)[0]
    pmat = g / den
    pxp = jax.lax.dot_general(
        xs_ext, pmat, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)               # (D+1, M)
    px_t, p1 = pxp[:dim], pxp[dim]
    n_p = jnp.sum(p1)
    xx = jnp.sum(pt1 * x2[0])
    return pt1, p1, px_t, n_p, xx


def _rigid_mstep_t(ys_t, p1, px_t, n_p, xx, update_scale):
    """rigid_maximization_step in (D, M) layout (same math, lane-friendly)."""
    dim = ys_t.shape[0]
    us = jnp.asarray(update_scale)
    mu_x = jnp.sum(px_t, axis=1) / n_p
    mu_y = ys_t @ p1 / n_p
    src_hat = ys_t - mu_y[:, None]
    a = jax.lax.dot_general(
        px_t, src_hat, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST) \
        - jnp.outer(mu_x, src_hat @ p1)
    u, _, vh = jnp.linalg.svd(a, full_matrices=True)
    c = jnp.ones(dim, a.dtype).at[-1].set(jnp.linalg.det(u @ vh))
    rot = (u * c) @ vh
    tr_atr = jnp.trace(a.T @ rot)
    tr_yp1y = jnp.sum(p1 * jnp.sum(src_hat * src_hat, axis=0))
    scale = jnp.where(us, tr_atr / tr_yp1y, 1.0)
    t = mu_x - scale * rot @ mu_y
    tr_xp1x = xx - n_p * jnp.sum(mu_x * mu_x)
    sigma2 = jnp.where(
        us,
        (tr_xp1x - scale * tr_atr) / (n_p * dim),
        (tr_xp1x - 2.0 * scale * tr_atr + tr_yp1y) / (n_p * dim))
    sigma2 = jnp.maximum(sigma2, _F32_EPS)
    q = (tr_xp1x - 2.0 * scale * tr_atr + scale ** 2 * tr_yp1y) / (2.0 * sigma2)
    q = q + dim * n_p * 0.5 * jnp.log(sigma2)
    return rot, t, scale, sigma2, q


def _affine_mstep_t(ys_t, p1, px_t, n_p, xx):
    """affine_maximization_step in (D, M) layout."""
    dim = ys_t.shape[0]
    mu_x = jnp.sum(px_t, axis=1) / n_p
    mu_y = ys_t @ p1 / n_p
    src_hat = ys_t - mu_y[:, None]
    a = jax.lax.dot_general(
        px_t, src_hat, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST) \
        - jnp.outer(mu_x, src_hat @ p1)
    yp1y = jax.lax.dot_general(
        src_hat * p1[None, :], src_hat, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    b = jnp.linalg.solve(yp1y.T, a.T).T
    t = mu_x - b @ mu_y
    tr_xp1x = xx - n_p * jnp.sum(mu_x * mu_x)
    tr_ab = jnp.trace(a @ b.T)
    sigma2 = jnp.maximum((tr_xp1x - tr_ab) / (n_p * dim), _F32_EPS)
    q = (tr_xp1x - tr_ab) / (2.0 * sigma2) + dim * n_p * 0.5 * jnp.log(sigma2)
    return b, t, sigma2, q


@partial(jax.jit, static_argnames=("kind", "w",
                                   "update_scale", "default_init"))
def _run_em_t(source, target, init=None, *, kind, w, maxiter, tol,
              update_scale=True, default_init=True, smask=None, tmask=None,
              sigma2_init=None):
    """Whole-EM while_loop in transposed layout (rigid / affine).

    Everything — the (D, M) relayout, the sigma2_0 / q0 initialization, the
    loop — is ONE jit call: a registration is a single host->device dispatch
    (each eager op costs a full RTT through remote-TPU transports).

    ``smask``/``tmask``: optional (M,)/(N,) validity masks (ragged-batch
    padding). Padded rows/columns carry no posterior mass and every
    normalizer uses the true counts — EXACTLY the unpadded registration.

    ``sigma2_init``: warm-start variance override (coarse-to-fine pyramid,
    pyramid.py); None keeps the closed-form squared_kernel_sum default.
    """
    ys_t = source.T
    xs_t = target.T
    dim, m = ys_t.shape
    n = xs_t.shape[1]
    masked = smask is not None
    # Shared-centroid centering (in-program, EM is translation
    # invariant): the expanded-form f32 sqdist in every E-step loses
    # ~|x|^2 * eps to cancellation, which at UTM/mm-scale coordinates
    # (|x| ~ 1e4+) exceeds real point distances — measured: CPD NaNs and
    # ICP diverges at a 1e4 offset the f64 reference shrugs off. The
    # subtraction itself is exact to the result's ulp, so centered
    # arithmetic restores O(1)-coordinate accuracy; the recovered
    # translation converts back below.
    if masked:
        m_eff, n_eff = jnp.sum(smask), jnp.sum(tmask)
        cen = ((ys_t @ smask + xs_t @ tmask)
               / jnp.maximum(m_eff + n_eff, 1.0))
    else:
        m_eff, n_eff = None, n
        cen = (jnp.sum(ys_t, axis=1) + jnp.sum(xs_t, axis=1)) / (m + n)
    ys_t = ys_t - cen[:, None]
    xs_t = xs_t - cen[:, None]
    kmask = smask[:, None] * tmask[None, :] if masked else None
    if default_init:
        lin0 = jnp.eye(dim, dtype=source.dtype)
        t0 = jnp.zeros(dim, dtype=source.dtype)
        scale0 = jnp.asarray(1.0, source.dtype)
    else:
        # init is one packed (D*D + D + 1,) vector: a single H2D transfer.
        lin0 = init[: dim * dim].reshape(dim, dim)
        t0 = init[dim * dim: dim * dim + dim]
        scale0 = init[dim * dim + dim]
        # Raw-frame warm start -> centered frame: x - c = s L (y - c)
        # + (t + s L c - c).
        t0 = t0 + scale0 * lin0 @ cen - cen
    # sigma2_0 = squared_kernel_sum in closed form (O(M+N), math_utils.py:28),
    # from the CENTERED arrays (the closed form shares the cancellation).
    if masked:
        sigma2_0 = mu.masked_squared_kernel_sum_t(ys_t, xs_t, smask, tmask)
    else:
        sy = jnp.sum(ys_t, axis=1)
        sx = jnp.sum(xs_t, axis=1)
        sigma2_0 = (n * jnp.sum(ys_t * ys_t) + m * jnp.sum(xs_t * xs_t)
                    - 2.0 * sy @ sx) / (m * dim * n)
    if sigma2_init is not None:
        sigma2_0 = jnp.maximum(
            jnp.asarray(sigma2_init, source.dtype), _F32_EPS)
    q0 = 1.0 + n_eff * dim * 0.5 * jnp.log(sigma2_0)
    x2 = jnp.sum(xs_t * xs_t, axis=0, keepdims=True)       # (1, N)
    xs_ext = jnp.concatenate(
        [xs_t, jnp.ones((1, n), xs_t.dtype)], axis=0)      # (D+1, N)

    def step(lin, t, scale, sigma2):
        t_src = scale * lin @ ys_t + t[:, None]
        _, p1, px_t, n_p, xx = _estep_t(
            t_src, xs_t, xs_ext, x2, sigma2, w,
            kmask, m_eff, n_eff if masked else None)
        if kind == "rigid":
            return _rigid_mstep_t(ys_t, p1, px_t, n_p, xx, update_scale)

        b, t_new, s2, q = _affine_mstep_t(ys_t, p1, px_t, n_p, xx)
        return b, t_new, jnp.asarray(1.0, ys_t.dtype), s2, q

    def cond(state):
        _, _, _, _, q, q_prev, i = state
        return jnp.logical_and(
            i < maxiter,
            jnp.logical_or(i == 0, jnp.abs(q - q_prev) >= tol))

    def body(state):
        lin, t, scale, sigma2, q, _, i = state
        lin, t, scale, sigma2, q_new = step(lin, t, scale, sigma2)
        return (lin, t, scale, sigma2, q_new, q, i + 1)

    state = (lin0, t0, scale0, sigma2_0, q0,
             jnp.asarray(jnp.inf, q0.dtype), jnp.asarray(0))
    lin, t, scale, sigma2, q, _, _ = jax.lax.while_loop(cond, body, state)
    # Centered -> raw frame: x = s L y + (t_c + c - s L c).
    t = t + cen - scale * lin @ cen
    return lin, t, scale, sigma2, q


@partial(jax.jit, static_argnames=("w", "block"))
def _run_em_nonrigid_lowrank_t(source, target, u, lam, lmd, *, w, maxiter,
                               tol, block=None, zc_init_t=None,
                               sigma2_init=None):
    """Whole-EM low-rank nonrigid loop, transposed layout + blocked E-step.

    ``zc_init_t`` (D, K) / ``sigma2_init``: warm starts (coarse-to-fine
    pyramid — the coarse displacement field projected onto this level's
    Nystrom basis, and the coarse converged variance).

    Same math as _nonrigid_lowrank_step (Woodbury K x K solve,
    ops/lowrank.py) but lane-major like _run_em_t — points stay (D, M)
    so no per-iteration relayouts — and the E-step streams over target
    column blocks past ``block`` (each posterior column's normalizer is
    complete within its block), so peak memory is O(M * block) at any N.
    Convergence matches the reference nonrigid loop: |d sigma2| < tol.
    """
    ys_t = source.T                                        # (D, M)
    xs_t = target.T                                        # (D, N)
    dim, m = ys_t.shape
    n = xs_t.shape[1]
    k = lam.shape[0]
    # Shared-centroid centering (see _run_em_t): the displacement field
    # and its Nystrom coordinates are translation invariant, so nothing
    # converts back — only the E-step arithmetic gains O(1)-coordinate
    # accuracy.
    cen = (jnp.sum(ys_t, axis=1) + jnp.sum(xs_t, axis=1)) / (m + n)
    ys_t = ys_t - cen[:, None]
    xs_t = xs_t - cen[:, None]
    eps = jnp.asarray(jnp.finfo(jnp.float32).eps, source.dtype)
    if sigma2_init is not None:
        sigma2_0 = jnp.maximum(
            jnp.asarray(sigma2_init, source.dtype), _F32_EPS)
    else:
        sy = jnp.sum(ys_t, axis=1)
        sx = jnp.sum(xs_t, axis=1)
        sigma2_0 = (n * jnp.sum(ys_t * ys_t) + m * jnp.sum(xs_t * xs_t)
                    - 2.0 * sy @ sx) / (m * dim * n)
    x2 = jnp.sum(xs_t * xs_t, axis=0, keepdims=True)       # (1, N)
    xs_ext = jnp.concatenate(
        [xs_t, jnp.ones((1, n), xs_t.dtype)], axis=0)      # (D+1, N)
    eye_k = jnp.eye(k, dtype=source.dtype)

    if block is None:
        block = int(_config.config.estep_chunk)
    block = max(min(int(block), n), 1)
    blocked = n > block
    if blocked:
        pad = (-n) % block
        cmask = jnp.concatenate(
            [jnp.ones((1, n), xs_t.dtype), jnp.zeros((1, pad), xs_t.dtype)],
            axis=1)
        xs_p = (jnp.concatenate(
            [xs_t, jnp.zeros((dim, pad), xs_t.dtype)], axis=1)
            if pad else xs_t)
        xe_p = (jnp.concatenate(
            [xs_ext, jnp.zeros((dim + 1, pad), xs_t.dtype)], axis=1)
            if pad else xs_ext)
        x2_p = (jnp.concatenate(
            [x2, jnp.zeros((1, pad), xs_t.dtype)], axis=1) if pad else x2)
        nb = (n + pad) // block
        xs_blocks = xs_p.reshape(dim, nb, block).transpose(1, 0, 2)
        xe_blocks = xe_p.reshape(dim + 1, nb, block).transpose(1, 0, 2)
        x2_blocks = x2_p.reshape(1, nb, block).transpose(1, 0, 2)
        m_blocks = cmask.reshape(1, nb, block).transpose(1, 0, 2)

    def _estep_cols(t_src_t, y2, sigma2, c, xs_b, xe_b, x2_b, mask_b):
        xy = jax.lax.dot_general(
            t_src_t, xs_b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)           # (M, B)
        g = jnp.exp(-jnp.maximum(y2 + x2_b - 2.0 * xy, 0.0)
                    / (2.0 * sigma2)) * mask_b
        den_raw = jnp.sum(g, axis=0, keepdims=True)
        den = jnp.where(den_raw == 0.0, eps, den_raw) + c
        pt1 = mask_b * den_raw / den                       # (1, B)
        pmat = g / den
        pxp = jax.lax.dot_general(
            xe_b, pmat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)           # (D+1, M)
        return pxp, jnp.sum(pt1 * x2_b)

    def body(state):
        zc_t, sigma2, q, _, i = state
        t_src_t = ys_t + jax.lax.dot_general(
            zc_t, u, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)           # (D, M)
        y2 = jnp.sum(t_src_t * t_src_t, axis=0)[:, None]
        c = estep_ops.outlier_constant(sigma2, w, m, n, dim)
        if blocked:
            def eblk(carry, blk):
                pxp_acc, xx_acc = carry
                pxp_b, xx_b = _estep_cols(t_src_t, y2, sigma2, c, *blk)
                return (pxp_acc + pxp_b, xx_acc + xx_b), None

            init = (jnp.zeros((dim + 1, m), source.dtype),
                    jnp.asarray(0.0, source.dtype))
            (pxp, xx), _ = jax.lax.scan(
                eblk, init, (xs_blocks, xe_blocks, x2_blocks, m_blocks))
        else:
            pxp, xx = _estep_cols(
                t_src_t, y2, sigma2, c, xs_t, xs_ext, x2,
                jnp.ones((1, n), xs_t.dtype))
        px_t, p1 = pxp[:dim], pxp[dim]                     # (D, M), (M,)
        n_p = jnp.sum(p1)

        # M-step: Woodbury coefficients in transposed layout.
        cc = lmd * sigma2
        rhs_t = px_t - ys_t * p1[None, :]                  # (D, M)
        udu = (u * p1[:, None]).T @ u                      # (K, K)
        mk = cc * eye_k + udu * lam[None, :]
        ru = jax.lax.dot_general(
            rhs_t, u, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)           # (D, K)
        # Z = mk^-1 (U^T rhs); transposed: Z_t = solve(mk, ru^T)^T.
        z_t = jnp.linalg.solve(mk, ru.T).T                 # (D, K)
        zc_t_new = z_t * lam[None, :]
        t_t = ys_t + jax.lax.dot_general(
            zc_t_new, u, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        tr_pxt = jnp.sum(px_t * t_t)
        tr_tpt = jnp.sum(p1 * jnp.sum(t_t * t_t, axis=0))
        sigma2_new = jnp.maximum(
            (xx - 2.0 * tr_pxt + tr_tpt) / (n_p * dim), _F32_EPS)
        return (zc_t_new, sigma2_new, sigma2_new, q, i + 1)

    def cond(state):
        _, _, q, q_prev, i = state
        return jnp.logical_and(
            i < maxiter,
            jnp.logical_or(i == 0, jnp.abs(q - q_prev) >= tol))

    zc0_t = (jnp.zeros((dim, k), source.dtype) if zc_init_t is None
             else jnp.asarray(zc_init_t, source.dtype))
    state = (zc0_t, sigma2_0,
             jnp.asarray(jnp.inf, sigma2_0.dtype),
             jnp.asarray(jnp.inf, sigma2_0.dtype), jnp.asarray(0))
    zc_t, sigma2, q, _, _ = jax.lax.while_loop(cond, body, state)
    return zc_t, sigma2, q


# --------------------------------------------------------------------------
# Functional EM step per transform type (module-level => stable jit cache)
# --------------------------------------------------------------------------

def _rigid_step(source, target, transf, sigma2, aux, w, assume_sorted=False,
                use_pallas=None):
    t_source = transf._transform(source)
    mom = estep_ops.estep(t_source, target, sigma2, w,
                          use_pallas=use_pallas,
                          assume_sorted=assume_sorted)
    return rigid_maximization_step(source, mom, aux["update_scale"])


def _affine_step(source, target, transf, sigma2, aux, w,
                 assume_sorted=False, use_pallas=None):
    t_source = transf._transform(source)
    mom = estep_ops.estep(t_source, target, sigma2, w,
                          use_pallas=use_pallas,
                          assume_sorted=assume_sorted)
    return affine_maximization_step(source, mom)


# Morton-presorted variants (stable module-level identities for the jit
# cache). registration() pre-sorts source/target ONCE and switches to
# these, so the tile-culled E-step (ops/estep_pallas.estep_auto) skips its
# per-iteration argsort — a TPU sort of a 200k cloud costs ~0.3 s/iter,
# which otherwise eats the culling gains. Only rigid/affine qualify: their
# M-steps consume the moments purely through row reductions, so a
# consistent permutation of source/target changes nothing downstream.
_rigid_step_sorted = partial(_rigid_step, assume_sorted=True)
_affine_step_sorted = partial(_affine_step, assume_sorted=True)
# ONLY rigid/affine qualify for the sorted swap. Nonrigid (dense and
# low-rank) must NOT be listed here: NonRigidCPD caches its Gram/Nystrom
# factors in self._tf_obj at set_source time (base _initialize does not
# rebuild them from a swapped source), and NonRigidTransformation.transform
# is positional (points + g @ w with g/w rows in EM order) — a Morton-sorted
# EM would both run against a misaligned Gram and hand the caller a
# transformation whose displacement rows are scrambled relative to their
# original source order. Constrained CPD likewise stays unsorted: its prior
# vectors are row-aligned with the caller's source. At the culled-path scale
# (M >= ~4k) the nonrigid M-step's M x M solve dominates the E-step anyway,
# so rigid/affine are also where the culling gain lives.
_SORTED_STEPS = {
    _rigid_step: _rigid_step_sorted,
    _affine_step: _affine_step_sorted,
}
# use_pallas=False pins the E-step to the XLA scan on the generic EM path
# too (callback loops, the sorted culled branch): without these the pin
# only governed the fused fast paths, and a user opting out of Pallas
# kernels still got estep_small / the culled stash kernel (review
# finding). Module-level partials keep the jit-cache identity stable.
_rigid_step_xla = partial(_rigid_step, use_pallas=False)
_affine_step_xla = partial(_affine_step, use_pallas=False)
_XLA_STEPS = {
    _rigid_step: _rigid_step_xla,
    _affine_step: _affine_step_xla,
}


def _nonrigid_step(source, target, transf, sigma2, aux, w,
                   assume_sorted=False):
    t_source = transf._transform(source)
    mom = estep_ops.estep(t_source, target, sigma2, w,
                          assume_sorted=assume_sorted)
    return nonrigid_maximization_step(source, mom, transf.g, aux["lmd"], sigma2)


def _constrained_step(source, target, transf, sigma2, aux, w):
    t_source = transf._transform(source)
    mom = estep_ops.estep(t_source, target, sigma2, w)
    return constrained_nonrigid_maximization_step(
        source, mom, transf.g, aux["lmd"], sigma2,
        aux["alpha"], aux["p1_tilde"], aux["px_tilde"],
    )


def _nonrigid_lowrank_step(source, target, transf, sigma2, aux, w,
                           assume_sorted=False):
    t_source = transf._transform(source)
    mom = estep_ops.estep(t_source, target, sigma2, w,
                          assume_sorted=assume_sorted)
    return nonrigid_lowrank_maximization_step(
        source, mom, transf.u, transf.lam, aux["lmd"], sigma2)


def _constrained_lowrank_step(source, target, transf, sigma2, aux, w):
    t_source = transf._transform(source)
    mom = estep_ops.estep(t_source, target, sigma2, w)
    s2a = sigma2 / aux["alpha"]
    rhs_extra = s2a * (aux["px_tilde"] - source * aux["p1_tilde"][:, None])
    return nonrigid_lowrank_maximization_step(
        source, mom, transf.u, transf.lam, aux["lmd"], sigma2,
        d_extra=s2a * aux["p1_tilde"], rhs_extra=rhs_extra)



@partial(jax.jit, static_argnames=("step_fn", "w"))
def _run_em(source, target, tf0, sigma2_0, q0, aux, *, step_fn, w, maxiter, tol):
    """Whole-EM ``lax.while_loop`` — one XLA program per registration.

    Convergence semantics match the reference loop (cpd.py:110-119):
    stop when |q_i - q_{i-1}| < tol, at most ``maxiter`` E/M pairs.
    """

    def cond(state):
        _, _, q, q_prev, i = state
        return jnp.logical_and(
            i < maxiter,
            jnp.logical_or(i == 0, jnp.abs(q - q_prev) >= tol),
        )

    def body(state):
        transf, sigma2, q, _, i = state
        new = step_fn(source, target, transf, sigma2, aux, w)
        return (new.transformation, new.sigma2, new.q, q, i + 1)

    state = (tf0, sigma2_0, q0, jnp.asarray(jnp.inf, q0.dtype), jnp.asarray(0))
    transf, sigma2, q, _, _ = jax.lax.while_loop(cond, body, state)
    return MstepResult(transf, sigma2, q)


@partial(jax.jit, static_argnames=("step_fn", "w"))
def _em_step_once(source, target, transf, sigma2, aux, *, step_fn, w):
    return step_fn(source, target, transf, sigma2, aux, w)


@partial(jax.jit, static_argnames=("step_fn", "w", "k"))
def _em_chunk(source, target, transf, sigma2, aux, *, step_fn, w, k):
    """K EM steps in one program, emitting per-iteration history.

    Callback mode pays one dispatch round trip per iteration (~33 ms on a
    remote TPU); scanning K steps and fetching the stacked (transform,
    sigma2, q) history cuts that to one round trip per K iterations with
    identical per-iteration callback semantics (utils/chunked.py).
    """

    def body(carry, _):
        tr, s2 = carry
        res = step_fn(source, target, tr, s2, aux, w)
        return ((res.transformation, res.sigma2),
                (res.transformation, res.sigma2, res.q))

    carry, hist = jax.lax.scan(body, (transf, sigma2), None, length=k)
    return carry, hist


# --------------------------------------------------------------------------
# OO surface (drop-in for the reference classes)
# --------------------------------------------------------------------------

class CoherentPointDrift(abc.ABC):
    """Abstract CPD: E-step here, M-step in transform-specific subclasses.

    Mirrors reference cpd.py:29-120. ``use_cuda`` is accepted for drop-in
    compatibility and ignored (the JAX backend targets whatever accelerator
    is attached — TPU here).
    """

    _STEP: Callable = None  # module-level step function (stable jit identity)

    def __init__(self, source=None, use_cuda: bool = False,
                 use_pallas: Optional[bool] = None,
                 sigma2_init: Optional[float] = None):
        del use_cuda
        self._source = None if source is None else _as_jnp(source)
        self._tf_type = None
        self._callbacks: List[Callable] = []
        self._use_pallas = use_pallas
        # Warm-start variance (coarse-to-fine pyramid, pyramid.py): overrides
        # the squared_kernel_sum sigma2_0 so full-resolution EM starts in the
        # annealed (tile-culled) regime instead of the dense start regime.
        self._sigma2_init = sigma2_init

    def set_source(self, source):
        self._source = _as_jnp(source)

    def set_callbacks(self, callbacks):
        self._callbacks.extend(callbacks)

    # ------------------------------------------------------------------ API
    def expectation_step(self, t_source, target, sigma2, w: float = 0.0) -> EstepResult:
        """Reference-shaped E-step (cpd.py:71-88) built from the moments."""
        mom = estep_ops.estep(
            _as_jnp(t_source), _as_jnp(target), jnp.asarray(sigma2), float(w), self._use_pallas
        )
        return EstepResult(mom.pt1, mom.p1, mom.px, mom.n_p)

    def maximization_step(self, target, estep_res, sigma2_p=None) -> MstepResult:
        mom = self._moments_from_estep(estep_res, _as_jnp(target))
        if sigma2_p is not None:
            sigma2_p = jnp.asarray(sigma2_p)
        return self._mstep(self._source, mom, sigma2_p)

    @staticmethod
    def _moments_from_estep(estep_res, target) -> EstepMoments:
        pt1, p1, px, n_p = estep_res
        xx = jnp.sum(pt1 * jnp.sum(target * target, axis=1))
        return EstepMoments(pt1, p1, px, n_p, xx)

    # ------------------------------------------------------ jit EM machinery
    @abc.abstractmethod
    def _initial_tf(self) -> tf.Transformation:
        ...

    @abc.abstractmethod
    def _mstep(self, source, mom: EstepMoments, sigma2_p) -> MstepResult:
        """Pure-jnp M-step from moments (public maximization_step path)."""

    def _step_aux(self) -> Dict:
        """Extra pytree operands threaded to the step function."""
        return {}

    def _step_fn(self) -> Callable:
        """Module-level step function (stable jit identity)."""
        return type(self)._STEP

    def _initialize(self, target) -> MstepResult:
        dim = self._source.shape[1]
        if self._sigma2_init is not None:
            # Same eps clamp as the fast paths (_run_em_t): sigma2_init=0
            # would otherwise produce q0 = -inf and a 0-div first E-step.
            sigma2 = jnp.maximum(
                jnp.asarray(self._sigma2_init, _config.config.dtype),
                _F32_EPS)
        else:
            sigma2 = mu.squared_kernel_sum(self._source, target)
        q = 1.0 + target.shape[0] * dim * 0.5 * jnp.log(sigma2)
        return MstepResult(self._initial_tf(), sigma2, q)

    def registration(self, target, w: float = 0.0, maxiter: int = 50,
                     tol: float = 0.001,
                     callback_chunk: int = 1) -> MstepResult:
        """Run the EM registration.

        Args:
            callback_chunk: In callback mode, EM iterations per device
                dispatch (K). Callbacks still fire once per iteration with
                that iteration's transform (replayed from the fetched chunk
                history), but the loop pays one round trip per K iterations
                instead of per iteration. Ignored without callbacks (the
                whole EM is a single program there).
        """
        assert self._tf_type is not None, "transformation type is None."
        target = _as_jnp(target)
        if getattr(self, "_n_starts", 1) > 1 and self._callbacks:
            # The callback loop has no multistart; silently dropping the
            # orientation search would return a wrong-basin pose.
            raise ValueError("n_starts > 1 requires the no-callback path")
        if not self._callbacks:
            fast = self._registration_fast(target, w, maxiter, tol)
            if fast is not None:
                return fast
        # Shared-centroid centering for the generic loop (the fast-path
        # runners center internally; this path serves callback mode,
        # dense nonrigid and constrained CPD — verified >100 deg wrong at
        # a 1e4 coordinate offset without it). Nonrigid transforms and
        # the constrained priors (built from the centered target in
        # _initialize) are translation invariant; rigid/affine initial
        # params convert in and every emitted transform converts back.
        cen = ((jnp.sum(self._source, axis=0) + jnp.sum(target, axis=0))
               / (self._source.shape[0] + target.shape[0]))
        target = target - cen[None, :]
        centered_source = self._source - cen[None, :]

        def _tf_to(tr, sign):
            # sign=+1: raw -> centered; sign=-1: centered -> raw.
            if isinstance(tr, tf.RigidTransformation):
                shift = tr.scale * (tr.rot @ cen) - cen
                return tf.RigidTransformation(tr.rot, tr.t + sign * shift,
                                              tr.scale)
            if isinstance(tr, tf.AffineTransformation):
                shift = tr.b @ cen - cen
                return tf.AffineTransformation(tr.b, tr.t + sign * shift)
            return tr

        source = centered_source
        step_fn = self._step_fn()
        if getattr(self, "_use_pallas", None) is False:
            # The pin means "no Pallas kernels" everywhere, including the
            # small-problem kernel and the Morton-sorted culled branch
            # below (which IS a Pallas kernel).
            step_fn = _XLA_STEPS.get(step_fn, step_fn)
            sorted_step = None
        else:
            sorted_step = _SORTED_STEPS.get(step_fn)
        if (not self._callbacks
                and sorted_step is not None
                and jax.default_backend() == "tpu"
                and _config.config.use_culled_estep
                and source.shape[0] * target.shape[0]
                >= _config.config.culled_estep_min_pairs):
            # One-time Morton sort enables tile culling in the E-step with
            # no per-iteration sort (see _rigid_step_sorted note). Only
            # order-invariant families (rigid/affine) are in _SORTED_STEPS,
            # so results are unaffected by the permutation. The sort happens
            # BEFORE _initialize/_step_aux so anything derived from the
            # source shares its permutation.
            from .ops.spatial import morton_order

            source = source[morton_order(source)]
            target = target[morton_order(target)]
            step_fn = sorted_step
        orig_source = self._source
        self._source = source
        try:
            res = self._initialize(target)
            aux = self._step_aux()
        finally:
            self._source = orig_source
        res = res._replace(transformation=_tf_to(res.transformation, +1.0))
        if self._callbacks:
            from .utils import chunked

            state = {"q": float(res.q), "res": res}

            def chunk_fn(st, kk):
                return _em_chunk(source, target, st[0], st[1], aux,
                                 step_fn=step_fn, w=float(w), k=kk)

            def handle(i, hist, j):
                trs, s2s, qs = hist
                out_c = MstepResult(chunked.slice_tree(trs, j), s2s[j],
                                    qs[j])
                out = out_c._replace(
                    transformation=_tf_to(out_c.transformation, -1.0))
                for c in self._callbacks:
                    c(out.transformation)
                log.debug("Iteration: {}, Criteria: {}".format(i, out.q))
                stop = abs(float(out.q) - state["q"]) < tol
                state["q"] = float(out.q)
                state["res"] = out
                return stop, out

            out = chunked.run_chunked(
                chunk_fn, (res.transformation, res.sigma2), int(maxiter),
                int(callback_chunk), handle)
            return out if out is not None \
                else res._replace(
                    transformation=_tf_to(res.transformation, -1.0))
        out = _run_em(
            source, target, res.transformation, res.sigma2, res.q, aux,
            step_fn=step_fn, w=float(w), maxiter=int(maxiter), tol=float(tol),
        )
        return out._replace(transformation=_tf_to(out.transformation, -1.0))

    def _registration_fast(self, target, w, maxiter, tol):
        """Transposed-layout whole-EM path; None if unsupported here."""
        return None


class RigidCPD(CoherentPointDrift):
    """Rigid CPD (reference cpd.py:123-192)."""

    _STEP = staticmethod(_rigid_step)

    def __init__(self, source=None, update_scale: bool = True,
                 tf_init_params: Optional[Dict] = None, use_cuda: bool = False,
                 use_pallas: Optional[bool] = None, n_starts: int = 1,
                 sigma2_init: Optional[float] = None):
        super().__init__(source, use_cuda, use_pallas, sigma2_init)
        self._tf_type = tf.RigidTransformation
        self._update_scale = update_scale
        self._tf_init_params = dict(tf_init_params or {})
        self._tf_init_params.pop("xp", None)
        # n_starts > 1: vmapped EM restarts over a coarse orientation grid,
        # best final sigma2 wins — recovers rotations the identity start
        # cannot (new capability vs the reference; cf. l2dist n_starts).
        self._n_starts = int(n_starts)

    def _initial_tf(self):
        dim = self._source.shape[1]
        if not self._tf_init_params:
            return tf.RigidTransformation(dim=dim)
        return tf.RigidTransformation(**self._tf_init_params, dim=dim)

    def _step_aux(self):
        return {"update_scale": jnp.asarray(self._update_scale)}

    def _mstep(self, source, mom: EstepMoments, sigma2_p) -> MstepResult:
        return rigid_maximization_step(source, mom, self._update_scale)

    def _registration_fast(self, target, w, maxiter, tol):
        # Init params as host numpy: they ride the single jit dispatch
        # instead of costing eager-op round trips (painful on remote TPU).
        dim = self._source.shape[1]
        p = self._tf_init_params
        m, n = self._source.shape[0], target.shape[0]
        if m * n > _config.config.transposed_em_max_pairs:
            # _run_em_t materializes the (M, N) posterior; fall back to the
            # streaming-E-step loop (generic _run_em path).
            if self._n_starts > 1:
                # The streaming path has no multistart; silently dropping
                # the orientation search would return a wrong-basin pose.
                raise ValueError(
                    "n_starts > 1 requires M*N <= "
                    f"config.transposed_em_max_pairs ({m}*{n} given); "
                    "use registration_cpd_pyramid(n_starts=...) — the "
                    "orientation search runs on the small coarsest level")
            return None
        if self._n_starts > 1:
            if p:
                raise ValueError("n_starts > 1 and tf_init_params are "
                                 "mutually exclusive")
            inits = _multistart_inits(self._n_starts, dim)
            # sigma2_init composes with the search: every restart anneals
            # from the caller's temperature (it was silently dropped
            # before — review finding).
            s2w = (None if self._sigma2_init is None
                   else jnp.asarray(self._sigma2_init,
                                    _config.config.dtype))
            lin, t, scale, sigma2, q = _run_em_t_multistart_jit(
                self._source, target, jnp.asarray(inits),
                w=float(w), maxiter=int(maxiter), tol=float(tol),
                update_scale=bool(self._update_scale), sigma2_init=s2w)
            return MstepResult(tf.RigidTransformation(lin, t, scale),
                               sigma2, q)
        s2i = (None if self._sigma2_init is None
               else jnp.asarray(self._sigma2_init, _config.config.dtype))
        if (not p and s2i is None and dim == 3
                and _config.config.use_fused_em
                and self._use_pallas is not False
                and m * n <= _config.config.fused_em_max_pairs
                and _fused_dims_ok(m, n)
                and jax.default_backend() == "tpu"):
            from .ops import em_pallas

            rot, t, scale, sigma2, q = em_pallas.run_em_rigid_fused(
                self._source, target, w=float(w), maxiter=int(maxiter),
                tol=float(tol), update_scale=bool(self._update_scale))
            return MstepResult(tf.RigidTransformation(rot, t, scale),
                               sigma2, q)
        if not p:
            lin, t, scale, sigma2, q = _run_em_t(
                self._source, target,
                kind="rigid", w=float(w), maxiter=int(maxiter),
                tol=float(tol), update_scale=bool(self._update_scale),
                sigma2_init=s2i)
        else:
            init = np.concatenate([
                np.asarray(p.get("rot", np.eye(dim)), np.float32).ravel(),
                np.asarray(p.get("t", np.zeros(dim)), np.float32),
                np.atleast_1d(np.float32(p.get("scale", 1.0)))])
            lin, t, scale, sigma2, q = _run_em_t(
                self._source, target, init,
                kind="rigid", w=float(w), maxiter=int(maxiter),
                tol=float(tol), update_scale=bool(self._update_scale),
                default_init=False, sigma2_init=s2i)
        return MstepResult(tf.RigidTransformation(lin, t, scale), sigma2, q)


class AffineCPD(CoherentPointDrift):
    """Affine CPD (reference cpd.py:195-244)."""

    _STEP = staticmethod(_affine_step)

    def __init__(self, source=None, tf_init_params: Optional[Dict] = None,
                 use_cuda: bool = False, use_pallas: Optional[bool] = None,
                 sigma2_init: Optional[float] = None):
        super().__init__(source, use_cuda, use_pallas, sigma2_init)
        self._tf_type = tf.AffineTransformation
        self._tf_init_params = dict(tf_init_params or {})
        self._tf_init_params.pop("xp", None)

    def _initial_tf(self):
        dim = self._source.shape[1]
        if not self._tf_init_params:
            return tf.AffineTransformation(dim=dim)
        return tf.AffineTransformation(**self._tf_init_params, dim=dim)

    def _mstep(self, source, mom: EstepMoments, sigma2_p) -> MstepResult:
        return affine_maximization_step(source, mom)

    def _registration_fast(self, target, w, maxiter, tol):
        dim = self._source.shape[1]
        p = self._tf_init_params
        m, n = self._source.shape[0], target.shape[0]
        if m * n > _config.config.transposed_em_max_pairs:
            return None  # see RigidCPD._registration_fast
        s2i = (None if self._sigma2_init is None
               else jnp.asarray(self._sigma2_init, _config.config.dtype))
        if (not p and s2i is None and dim == 3
                and _config.config.use_fused_em
                and self._use_pallas is not False
                and m * n <= _config.config.fused_em_max_pairs
                and _fused_dims_ok(m, n)
                and jax.default_backend() == "tpu"):
            from .ops import em_pallas

            b, t, sigma2, q = em_pallas.run_em_affine_fused(
                self._source, target, w=float(w), maxiter=int(maxiter),
                tol=float(tol))
            return MstepResult(tf.AffineTransformation(b, t), sigma2, q)
        if not p:
            lin, t, _, sigma2, q = _run_em_t(
                self._source, target,
                kind="affine", w=float(w), maxiter=int(maxiter),
                tol=float(tol), update_scale=False, sigma2_init=s2i)
        else:
            init = np.concatenate([
                np.asarray(p.get("b", np.eye(dim)), np.float32).ravel(),
                np.asarray(p.get("t", np.zeros(dim)), np.float32),
                np.ones(1, np.float32)])
            lin, t, _, sigma2, q = _run_em_t(
                self._source, target, init,
                kind="affine", w=float(w), maxiter=int(maxiter),
                tol=float(tol), update_scale=False, default_init=False,
                sigma2_init=s2i)
        return MstepResult(tf.AffineTransformation(lin, t), sigma2, q)


class NonRigidCPD(CoherentPointDrift):
    """Nonrigid (motion-coherence) CPD (reference cpd.py:247-303).

    ``rank``: when set, G(Y, Y; beta) is held as its rank-K Nystrom
    eigenfactors and the M-step solve runs through the Woodbury identity
    (ops/lowrank.py) — O(M K) memory instead of the reference's O(M^2)
    dense Gram matrix. This is the low-rank CPD of Myronenko & Song
    (TPAMI 2010, sec. 4); K ~ 50-100 suffices for smooth deformations.
    """

    _STEP = staticmethod(_nonrigid_step)

    def __init__(self, source=None, beta: float = 2.0, lmd: float = 2.0,
                 use_cuda: bool = False, use_pallas: Optional[bool] = None,
                 rank: Optional[int] = None,
                 sigma2_init: Optional[float] = None, v_init=None):
        super().__init__(source, use_cuda, use_pallas, sigma2_init)
        self._tf_type = tf.NonRigidTransformation
        self._beta = beta
        self._lmd = lmd
        self._rank = rank
        # v_init: (M, D) initial displacement field at the source points
        # (coarse-to-fine pyramid: the coarse field interpolated here).
        # Low-rank only: it is projected onto the Nystrom basis by least
        # squares; the dense model would need an M x M Gram solve.
        if v_init is not None and rank is None:
            raise ValueError("v_init requires rank= (low-rank nonrigid)")
        self._v_init = None if v_init is None else jnp.asarray(
            v_init, _config.config.dtype)
        self._tf_obj: Optional[tf.Transformation] = None
        if self._source is not None:
            self._make_tf_obj()

    def _make_tf_obj(self):
        w0 = jnp.zeros_like(self._source)
        if self._rank is None:
            self._tf_obj = tf.NonRigidTransformation(w0, self._source, self._beta)
        else:
            u, lam = lowrank.lowrank_rbf(
                self._source, float(self._beta), int(self._rank))
            if self._v_init is not None:
                zc0 = jnp.linalg.lstsq(u, self._v_init)[0]     # (K, D)
            else:
                zc0 = jnp.zeros((u.shape[1], self._source.shape[1]), u.dtype)
            self._tf_obj = tf.LowRankNonRigidTransformation(zc0, u, lam)

    def set_source(self, source):
        super().set_source(source)
        self._make_tf_obj()

    def _initial_tf(self):
        return self._tf_obj

    def _step_aux(self):
        return {"lmd": jnp.asarray(self._lmd, _config.config.dtype)}

    def _step_fn(self):
        return _nonrigid_step if self._rank is None else _nonrigid_lowrank_step

    def _mstep(self, source, mom: EstepMoments, sigma2_p) -> MstepResult:
        if self._rank is None:
            return nonrigid_maximization_step(
                source, mom, self._tf_obj.g, self._lmd, sigma2_p)
        return nonrigid_lowrank_maximization_step(
            source, mom, self._tf_obj.u, self._tf_obj.lam, self._lmd, sigma2_p)

    def _registration_fast(self, target, w, maxiter, tol):
        if self._rank is None:
            return None
        u, lam = self._tf_obj.u, self._tf_obj.lam
        s2i = (None if self._sigma2_init is None
               else jnp.asarray(self._sigma2_init, _config.config.dtype))
        zc_init_t = None if self._v_init is None else self._tf_obj.zc.T
        zc_t, sigma2, q = _run_em_nonrigid_lowrank_t(
            self._source, target, u, lam,
            jnp.asarray(self._lmd, _config.config.dtype),
            w=float(w), maxiter=int(maxiter), tol=float(tol),
            block=int(_config.config.estep_chunk),
            zc_init_t=zc_init_t, sigma2_init=s2i)
        return MstepResult(
            tf.LowRankNonRigidTransformation(zc_t.T, u, lam), sigma2, q)


class ConstrainedNonRigidCPD(CoherentPointDrift):
    """Extended CPD with correspondence priors (reference cpd.py:306-404).

    Prior terms p1_tilde / px_tilde are built once from the index pairs; the
    prior's reliability is ``alpha``.
    """

    _STEP = staticmethod(_constrained_step)

    def __init__(self, source=None, beta: float = 2.0, lmd: float = 2.0,
                 alpha: float = 1e-8, use_cuda: bool = False,
                 idx_source=None, idx_target=None, use_pallas: Optional[bool] = None,
                 rank: Optional[int] = None):
        super().__init__(source, use_cuda, use_pallas)
        self._tf_type = tf.NonRigidTransformation
        self._beta = beta
        self._lmd = lmd
        self._rank = rank
        self.alpha = alpha
        self.idx_source = idx_source
        self.idx_target = idx_target
        self._tf_obj: Optional[tf.Transformation] = None
        self.p1_tilde = None
        self.px_tilde = None
        if self._source is not None:
            self._make_tf_obj()

    def _make_tf_obj(self):
        w0 = jnp.zeros_like(self._source)
        if self._rank is None:
            self._tf_obj = tf.NonRigidTransformation(w0, self._source, self._beta)
        else:
            u, lam = lowrank.lowrank_rbf(
                self._source, float(self._beta), int(self._rank))
            zc0 = jnp.zeros((u.shape[1], self._source.shape[1]), u.dtype)
            self._tf_obj = tf.LowRankNonRigidTransformation(zc0, u, lam)

    def set_source(self, source):
        super().set_source(source)
        self._make_tf_obj()

    def _initial_tf(self):
        return self._tf_obj

    def _initialize(self, target):
        # Prior moments: p_tilde is one-hot over known correspondences
        # (reference cpd.py:365-375) — built without the dense M x N matrix.
        m = self._source.shape[0]
        p1_tilde = jnp.zeros((m,), self._source.dtype)
        px_tilde = jnp.zeros_like(self._source)
        if self.idx_source is not None and self.idx_target is not None:
            idx_s = jnp.asarray(self.idx_source)
            idx_t = jnp.asarray(self.idx_target)
            p1_tilde = p1_tilde.at[idx_s].add(1.0)
            px_tilde = px_tilde.at[idx_s].add(target[idx_t])
        self.p1_tilde, self.px_tilde = p1_tilde, px_tilde
        return super()._initialize(target)

    def _step_aux(self):
        return {
            "lmd": jnp.asarray(self._lmd, _config.config.dtype),
            "alpha": jnp.asarray(self.alpha, _config.config.dtype),
            "p1_tilde": self.p1_tilde,
            "px_tilde": self.px_tilde,
        }

    def _step_fn(self):
        return _constrained_step if self._rank is None else _constrained_lowrank_step

    def _mstep(self, source, mom: EstepMoments, sigma2_p) -> MstepResult:
        if self._rank is None:
            return constrained_nonrigid_maximization_step(
                source, mom, self._tf_obj.g, self._lmd, sigma2_p,
                self.alpha, self.p1_tilde, self.px_tilde,
            )
        s2a = sigma2_p / jnp.asarray(self.alpha, _config.config.dtype)
        rhs_extra = s2a * (self.px_tilde - source * self.p1_tilde[:, None])
        return nonrigid_lowrank_maximization_step(
            source, mom, self._tf_obj.u, self._tf_obj.lam, self._lmd, sigma2_p,
            d_extra=s2a * self.p1_tilde, rhs_extra=rhs_extra)


@partial(jax.jit, static_argnames=("kind", "w", "update_scale"))
def _run_em_t_batch(sources, targets, *, kind, w, maxiter, tol,
                    update_scale=True):
    run = partial(_run_em_t, kind=kind, w=w, maxiter=maxiter, tol=tol,
                  update_scale=update_scale)
    return jax.vmap(run)(sources, targets)


def _multistart_inits(n_starts: int, dim: int) -> np.ndarray:
    """(S, D*D+D+1) packed (rot, t, scale) EM starts on the shared coarse
    orientation grid (cost_functions.initial_multistart_rots; 3-D: identity
    + 180/90/-90 deg about each axis, 2-D: evenly spaced circle)."""
    from . import cost_functions as cf

    rots = cf.RigidCostFunction.initial_multistart_rots(n_starts, dim)
    out = np.zeros((len(rots), dim * dim + dim + 1), np.float32)
    out[:, : dim * dim] = rots.reshape(len(rots), -1)
    out[:, -1] = 1.0
    return out


def _run_em_t_multistart(source, target, inits, *, w, maxiter, tol,
                         update_scale, smask=None, tmask=None,
                         sigma2_init=None):
    run = partial(_run_em_t, kind="rigid", w=w, maxiter=maxiter, tol=tol,
                  update_scale=update_scale, default_init=False,
                  smask=smask, tmask=tmask, sigma2_init=sigma2_init)
    # Orientation-grid starts rotate about the shared CENTROID (raw-frame
    # t = c - s L c), not the origin: identical for centered clouds, and
    # the only sane start for clouds at UTM/mm-scale offsets (an
    # about-origin grid rotation flings the cloud away).
    dim = source.shape[1]
    if smask is not None:
        cen = ((smask @ source + tmask @ target)
               / jnp.maximum(jnp.sum(smask) + jnp.sum(tmask), 1.0))
    else:
        cen = ((jnp.sum(source, axis=0) + jnp.sum(target, axis=0))
               / (source.shape[0] + target.shape[0]))

    def recenter(x0):
        lin0 = x0[: dim * dim].reshape(dim, dim)
        s0 = x0[dim * dim + dim]
        t0 = x0[dim * dim: dim * dim + dim] + cen - s0 * lin0 @ cen
        return jnp.concatenate([x0[: dim * dim], t0, x0[-1:]])

    lin, t, scale, sigma2, q = jax.vmap(
        lambda x0: run(source, target, recenter(x0)))(inits)
    # Select by final sigma2: the EM variance IS the alignment residual and
    # is directly comparable across restarts on the same pair. (q mixes
    # n_p and log-sigma2 terms whose sign flips with the data scale.)
    i = jnp.argmin(sigma2)
    return lin[i], t[i], scale[i], sigma2[i], q[i]


@partial(jax.jit, static_argnames=("w", "update_scale"))
def _run_em_t_multistart_jit(source, target, inits, *, w, maxiter, tol,
                             update_scale, sigma2_init=None):
    return _run_em_t_multistart(source, target, inits, w=w, maxiter=maxiter,
                                tol=tol, update_scale=update_scale,
                                sigma2_init=sigma2_init)


@partial(jax.jit, static_argnames=("w", "update_scale"))
def _run_em_t_multistart_batch(sources, targets, inits, *, w, maxiter, tol,
                               update_scale):
    run = partial(_run_em_t_multistart, w=w, maxiter=maxiter, tol=tol,
                  update_scale=update_scale)
    return jax.vmap(lambda s, t: run(s, t, inits))(sources, targets)


@partial(jax.jit, static_argnames=("w", "update_scale"))
def _run_em_t_multistart_ragged_batch(sources, targets, smasks, tmasks,
                                      inits, *, w, maxiter, tol,
                                      update_scale):
    run = partial(_run_em_t_multistart, w=w, maxiter=maxiter, tol=tol,
                  update_scale=update_scale)
    return jax.vmap(
        lambda s, t, sm, tm: run(s, t, inits, smask=sm, tmask=tm))(
        sources, targets, smasks, tmasks)


@partial(jax.jit, static_argnames=("kind", "w", "update_scale"))
def _run_em_t_ragged_batch(sources, targets, smasks, tmasks, *, kind, w,
                           maxiter, tol, update_scale=True):
    def run(src, tgt, sm, tm):
        return _run_em_t(src, tgt, kind=kind, w=w, maxiter=maxiter, tol=tol,
                         update_scale=update_scale, smask=sm, tmask=tm)

    return jax.vmap(run)(sources, targets, smasks, tmasks)


def registration_cpd_batch(
    sources,
    targets,
    tf_type_name: str = "rigid",
    w: float = 0.0,
    maxiter: int = 50,
    tol: float = 0.001,
    update_scale: bool = True,
    n_starts: int = 1,
    use_pallas: Optional[bool] = None,
):
    """Register B cloud pairs in one compiled program (vmap over the batch).

    New capability vs the reference (single-pair only): ``sources`` (B, M, D)
    and ``targets`` (B, N, D) are registered simultaneously — the batched EM
    runs until every pair converges (per-pair tolerance masking via vmap of
    the while_loop). Ideal for TPU serving: one dispatch, B results.

    Ragged batches: ``sources`` / ``targets`` may also be Python lists of
    clouds with DIFFERENT point counts per pair. They are zero-padded to the
    batch maximum and registered through a masked E-step that is exactly
    equivalent to registering each pair unpadded (padded points carry no
    posterior mass; the outlier constant and sigma2_0 use true counts).

    Returns a list of ``MstepResult`` (rigid or affine transformations).
    """
    if tf_type_name not in ("rigid", "affine"):
        raise ValueError("batch registration supports 'rigid' and 'affine'")
    ragged = isinstance(sources, (list, tuple)) \
        or isinstance(targets, (list, tuple))
    if n_starts > 1:
        if tf_type_name != "rigid":
            raise ValueError("n_starts > 1 supports rigid batches only")
        if ragged:
            src_p, smask = interop.pad_ragged(
                list(sources), _config.config.dtype)
            tgt_p, tmask = interop.pad_ragged(
                list(targets), _config.config.dtype)
            inits = _multistart_inits(int(n_starts), int(src_p.shape[-1]))
            lin, t, scale, sigma2, q = _run_em_t_multistart_ragged_batch(
                jnp.asarray(src_p), jnp.asarray(tgt_p),
                jnp.asarray(smask), jnp.asarray(tmask), jnp.asarray(inits),
                w=float(w), maxiter=int(maxiter), tol=float(tol),
                update_scale=bool(update_scale))
            nb = src_p.shape[0]
        else:
            sources = jnp.asarray(
                interop.as_points(sources, dtype=_config.config.dtype))
            targets = jnp.asarray(
                interop.as_points(targets, dtype=_config.config.dtype))
            inits = _multistart_inits(int(n_starts), int(sources.shape[-1]))
            lin, t, scale, sigma2, q = _run_em_t_multistart_batch(
                sources, targets, jnp.asarray(inits), w=float(w),
                maxiter=int(maxiter), tol=float(tol),
                update_scale=bool(update_scale))
            nb = sources.shape[0]
        return [
            MstepResult(tf.RigidTransformation(lin[b], t[b], scale[b]),
                        sigma2[b], q[b])
            for b in range(nb)
        ]
    def _fused_ok(m, n, dim):
        return (dim == 3 and _config.config.use_fused_em
                and use_pallas is not False
                and m * n <= _config.config.fused_em_max_pairs
                and _fused_dims_ok(m, n)
                and jax.default_backend() == "tpu")

    def _unpack_fused(lin, t, sigma2):
        # lin = scale*R for rigid (scale=1 when update_scale=False).
        if tf_type_name == "rigid":
            scale = jnp.sqrt(jnp.maximum(
                jnp.sum(lin * lin, axis=(1, 2)) / 3.0, 1e-30))
            return lin / scale[:, None, None], t, scale
        return lin, t, jnp.ones_like(sigma2)

    if ragged:
        src_p, smask = interop.pad_ragged(list(sources), _config.config.dtype)
        tgt_p, tmask = interop.pad_ragged(list(targets), _config.config.dtype)
        nb = src_p.shape[0]
        if _fused_ok(src_p.shape[1], tgt_p.shape[1], src_p.shape[2]):
            from .ops import em_pallas

            lin, t, sigma2, q = em_pallas.run_em_cpd_fused_batch(
                jnp.asarray(src_p), jnp.asarray(tgt_p),
                jnp.asarray(smask), jnp.asarray(tmask),
                kind=tf_type_name, w=float(w), maxiter=int(maxiter),
                tol=float(tol), update_scale=bool(update_scale), masked=True)
            lin, t, scale = _unpack_fused(lin, t, sigma2)
        else:
            lin, t, scale, sigma2, q = _run_em_t_ragged_batch(
                jnp.asarray(src_p), jnp.asarray(tgt_p),
                jnp.asarray(smask), jnp.asarray(tmask),
                kind=tf_type_name, w=float(w), maxiter=int(maxiter),
                tol=float(tol), update_scale=bool(update_scale))
        out = []
        for b in range(nb):
            if tf_type_name == "rigid":
                transf = tf.RigidTransformation(lin[b], t[b], scale[b])
            else:
                transf = tf.AffineTransformation(lin[b], t[b])
            out.append(MstepResult(transf, sigma2[b], q[b]))
        return out
    sources = jnp.asarray(interop.as_points(sources, dtype=_config.config.dtype))
    targets = jnp.asarray(interop.as_points(targets, dtype=_config.config.dtype))
    if _fused_ok(sources.shape[1], targets.shape[1], sources.shape[2]):
        from .ops import em_pallas

        lin, t, sigma2, q = em_pallas.run_em_cpd_fused_batch(
            sources, targets, kind=tf_type_name, w=float(w),
            maxiter=int(maxiter), tol=float(tol),
            update_scale=bool(update_scale))
        lin, t, scale = _unpack_fused(lin, t, sigma2)
    else:
        lin, t, scale, sigma2, q = _run_em_t_batch(
            sources, targets, kind=tf_type_name, w=float(w),
            maxiter=int(maxiter), tol=float(tol),
            update_scale=bool(update_scale))
    out = []
    for b in range(sources.shape[0]):
        if tf_type_name == "rigid":
            transf = tf.RigidTransformation(lin[b], t[b], scale[b])
        else:
            transf = tf.AffineTransformation(lin[b], t[b])
        out.append(MstepResult(transf, sigma2[b], q[b]))
    return out


def registration_cpd(
    source,
    target,
    tf_type_name: str = "rigid",
    w: float = 0.0,
    maxiter: int = 50,
    tol: float = 0.001,
    callbacks: List[Callable] = [],
    use_cuda: bool = False,
    callback_chunk: int = 1,
    **kwargs: Any,
) -> MstepResult:
    """CPD registration — drop-in equivalent of reference cpd.py:407-456.

    Args:
        source: Source point cloud (ndarray or open3d PointCloud).
        target: Target point cloud.
        tf_type_name: 'rigid', 'affine', 'nonrigid' or 'nonrigid_constrained'.
        w: Weight of the uniform (outlier) distribution, 0 <= w < 1.
        maxiter: Maximum EM iterations.
        tol: Convergence tolerance on the likelihood q.
        callbacks: Called with the current Transformation each iteration.
        use_cuda: Ignored (JAX targets the attached accelerator).
        callback_chunk: EM iterations per device dispatch in callback mode;
            callbacks still fire per iteration (see registration()).

    Keyword Args:
        n_starts (int): Rigid only — vmapped EM restarts over a coarse
            orientation grid (up to 10), best final sigma2 wins. Recovers
            large rotations the identity start cannot (new vs reference).

    Returns:
        MstepResult: (transformation, sigma2, q).
    """
    if tf_type_name == "rigid":
        cpd = RigidCPD(source, use_cuda=use_cuda, **kwargs)
    elif tf_type_name == "affine":
        cpd = AffineCPD(source, use_cuda=use_cuda, **kwargs)
    elif tf_type_name == "nonrigid":
        cpd = NonRigidCPD(source, use_cuda=use_cuda, **kwargs)
    elif tf_type_name == "nonrigid_constrained":
        cpd = ConstrainedNonRigidCPD(source, use_cuda=use_cuda, **kwargs)
    else:
        raise ValueError("Unknown transformation type %s" % tf_type_name)
    cpd.set_callbacks(callbacks)
    return cpd.registration(target, w, maxiter, tol,
                            callback_chunk=callback_chunk)
