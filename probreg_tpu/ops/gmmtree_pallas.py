"""Fused per-level GMM-tree build EM (one Pallas launch per tree level).

The XLA build (gmmtree._build, reference gmmtree.cc:98-123) runs up to 50
EM iterations per level, each ~30 tiny ops (pdf grid, responsibilities,
segment-sums, scatters, a full-level log-likelihood pass) — at bunny-size
clouds the whole build is kernel-launch-serialization-bound: measured
146 ms for a single jitted build on v5e while its FLOPs are microseconds.

This kernel runs one LEVEL's entire EM while_loop in VMEM. The key shape:
a Gaussian's weighted log-density is linear in the 10 point moment
features f(x) = [1, x, vec_sym(x x^T)], so

* the full (K, N) grid of log(pi_k pdf_k(x_p)) is ONE MXU matmul
  C(16, K)^T-contracted-with-F(16, N): C packs
  [mu^T inv mu - 2 log(pi norm), -2 inv mu, vec_sym(inv)] per node —
  the mixture weight and normalizer ride the constant channel, so no
  per-node broadcast is ever needed; and
* the M-step moments (m0, m1, m2) are the lane-contracting matmul
  F(16, N) gamma(K, N) -> (16, K) — the same features, both directions
  MXU-shaped (the stash moment kernels' dot pattern).

3x3 inverse/det are closed-form adjugates; the hierarchy constraint
(each point sees only the 8 children of its parent) is a sublane-iota
comparison mask; the hard child tracked for the next level is a
max + min-index-of-max pair of sublane reductions (equals jnp.argmax's
first-max tie rule, restricted to the point's own children).

Semantics match gmmtree._build's level loop exactly: responsibilities and
the tracked child use the level's FIXED parent map; the convergence
criterion is the full-level log-likelihood of the UPDATED parameters; the
m0 >= lambda_d death rule and the eps floors are identical
(reference gmmtree.cc:84-97,125-163).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1.0e-15
_NEG_BIG = -60.0            # exp(-0.5 * 120) == 0 in f32: a dead node's
#                             folded log(pi norm) term (pi or norm == 0)
_BIGI = 1 << 30          # int literal: jnp constants would be captured
N_NODE = 8


def fused_build_ok(n, max_level):
    """True iff every level's VMEM-resident grids fit on a v5e.

    The deepest level's (Kp, Np) f32 grids (pdf, responsibilities, the
    tie-break candidates) dominate; budget ~6 live copies against a
    ~12 MB working set of the 16 MB VMEM.
    """
    kp = -(-(N_NODE ** max_level) // 128) * 128
    np_ = -(-n // 128) * 128
    return kp * np_ * 4 * 6 <= 12 << 20


def _pdf_coeffs(state):
    """C (16, Kp) packing the log-density's moment-feature coefficients.

    state rows: 0 pi, 1-3 mu, 4-9 cov [c00, c01, c02, c11, c12, c22].
    qf' = f(x) . c(k) = (x-mu)^T inv (x-mu) - 2 log(pi norm), so
    pi_k pdf_k(x) = exp(-0.5 qf'). Matches gmmtree._log_pdf_terms:
    det < eps -> node dead (its qf' constant term is +BIG -> exact 0).
    """
    pi = state[0:1]
    mu0, mu1, mu2 = state[1:2], state[2:3], state[3:4]
    c00, c01, c02 = state[4:5], state[5:6], state[6:7]
    c11, c12, c22 = state[7:8], state[8:9], state[9:10]
    adj00 = c11 * c22 - c12 * c12
    adj01 = -(c01 * c22 - c02 * c12)
    adj02 = c01 * c12 - c02 * c11
    adj11 = c00 * c22 - c02 * c02
    adj12 = -(c00 * c12 - c01 * c02)
    adj22 = c00 * c11 - c01 * c01
    det = c00 * adj00 + c01 * adj01 + c02 * adj02
    valid = det >= _EPS
    inv_det = 1.0 / jnp.where(valid, det, 1.0)
    i00 = jnp.where(valid, adj00 * inv_det, 1.0)
    i01 = jnp.where(valid, adj01 * inv_det, 0.0)
    i02 = jnp.where(valid, adj02 * inv_det, 0.0)
    i11 = jnp.where(valid, adj11 * inv_det, 1.0)
    i12 = jnp.where(valid, adj12 * inv_det, 0.0)
    i22 = jnp.where(valid, adj22 * inv_det, 1.0)
    lin0 = -2.0 * (i00 * mu0 + i01 * mu1 + i02 * mu2)
    lin1 = -2.0 * (i01 * mu0 + i11 * mu1 + i12 * mu2)
    lin2 = -2.0 * (i02 * mu0 + i12 * mu1 + i22 * mu2)
    # log(pi * norm) = log pi - 0.5 log det - 1.5 log(2 pi); dead when
    # pi == 0 or det invalid.
    alive = jnp.logical_and(valid, pi > 0.0)
    logpn = jnp.where(
        alive,
        jnp.log(jnp.maximum(pi, _EPS))
        - 0.5 * jnp.log(jnp.maximum(det, _EPS))
        - 1.5 * jnp.log(2.0 * jnp.pi),
        _NEG_BIG)
    a0 = (-0.5 * (lin0 * mu0 + lin1 * mu1 + lin2 * mu2)) - 2.0 * logpn
    zeros = jnp.zeros_like(a0)
    return jnp.concatenate(
        [a0, lin0, lin1, lin2, i00, 2.0 * i01, 2.0 * i02, i11, 2.0 * i12,
         i22, zeros, zeros, zeros, zeros, zeros, zeros], axis=0)  # (16, Kp)


def _level_em_kernel(consts_ref, fmat_ref, smask_ref, parent_ref,
                     state0_ref, state_ref, cur_ref, diag_ref):
    """consts (SMEM, 4): [lambda_s, lambda_d, n_eff, maxiter]."""
    lambda_s = consts_ref[0]
    lambda_d = consts_ref[1]
    n_eff = consts_ref[2]
    maxiter = consts_ref[3]

    fmat = fmat_ref[:]                      # (16, Np): moment features
    smask = smask_ref[:]                    # (1, Np)
    parent = parent_ref[:]                  # (1, Np) int32, FIXED all level
    np_ = fmat.shape[1]
    kp = state0_ref.shape[1]
    kid = jax.lax.broadcasted_iota(jnp.int32, (kp, np_), 0)     # sublanes
    child = ((kid // N_NODE) == parent).astype(jnp.float32)     # (Kp, Np)

    def grids(state):
        cmat = _pdf_coeffs(state)
        qf = jax.lax.dot_general(
            cmat, fmat, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)                # (Kp, Np)
        return jnp.exp(-0.5 * qf)                               # pi * pdf

    def level_ll(u):
        ll = jnp.log(jnp.maximum(jnp.sum(u, axis=0, keepdims=True), _EPS))
        return jnp.sum(ll * smask)

    def body(carry):
        state, cur, q, q_prev, it = carry
        u = grids(state)
        g = u * child
        den = jnp.sum(g, axis=0, keepdims=True)                 # (1, Np)
        gamma = jnp.where(den > _EPS, g / jnp.maximum(den, _EPS), 0.0)
        gamma = gamma * smask
        # Hard child for the next level (first-max tie rule like
        # jnp.argmax over the child axis; restricted to the point's own
        # children so an all-dead row keeps its first child, as the XLA
        # path's argmax over the (P, 8) gamma does).
        gmx = jnp.max(gamma, axis=0, keepdims=True)
        cand = jnp.where(
            jnp.logical_and(gamma >= gmx, child > 0.0), kid,
            jnp.full_like(kid, _BIGI))
        cur_new = jnp.min(cand, axis=0, keepdims=True)          # (1, Np)
        # Moments: rows 0 m0, 1-3 m1, 4-9 m2 (vec_sym).
        mom = jax.lax.dot_general(
            fmat, gamma, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)                # (16, Kp)
        m0 = mom[0:1]
        keep = m0 >= lambda_d
        m0s = jnp.maximum(m0, _EPS)
        pi_new = jnp.where(keep, m0 / n_eff, 0.0)
        mu_new = jnp.where(keep, mom[1:4] / m0s, 0.0)
        mu_a, mu_b, mu_c = mu_new[0:1], mu_new[1:2], mu_new[2:3]
        ones_k = jnp.ones_like(m0)
        zeros_k = jnp.zeros_like(m0)
        eye6 = jnp.concatenate(
            [ones_k, zeros_k, zeros_k, ones_k, zeros_k, ones_k], axis=0)
        mumu = jnp.concatenate(
            [mu_a * mu_a, mu_a * mu_b, mu_a * mu_c, mu_b * mu_b,
             mu_b * mu_c, mu_c * mu_c], axis=0)
        cov_new = jnp.where(keep, mom[4:10] / m0s - mumu, eye6)
        state_new = jnp.concatenate(
            [pi_new, mu_new, cov_new, jnp.zeros((6, kp), jnp.float32)],
            axis=0)
        q_new = level_ll(grids(state_new))
        return (state_new, cur_new, q_new, q, it + 1.0)

    def cond(carry):
        _, _, q, q_prev, it = carry
        return jnp.logical_and(
            it < maxiter,
            jnp.logical_or(it < 0.5, jnp.abs(q - q_prev) >= lambda_s))

    carry0 = (state0_ref[:], jnp.zeros((1, np_), jnp.int32),
              jnp.float32(0.0), jnp.float32(jnp.inf), jnp.float32(0.0))
    state, cur, q, _, it = jax.lax.while_loop(cond, body, carry0)
    state_ref[:] = state
    cur_ref[:] = cur
    diag_ref[0, 0] = q
    diag_ref[0, 1] = it
    diag_ref[0, 2] = jnp.float32(0.0)
    diag_ref[0, 3] = jnp.float32(0.0)


@functools.partial(
    jax.jit,
    static_argnames=("lambda_s", "lambda_d", "maxiter", "interpret"))
def level_em(points, smask, pi_l, mu_l, cov_l, parent_local, n_eff, *,
             lambda_s, lambda_d, maxiter=50, interpret=False):
    """One tree level's build EM as a single kernel launch.

    Args:
        points: (N, 3) CENTERED points (the caller centers, like _build).
        smask: (N,) 0/1 validity (all ones when unmasked).
        pi_l / mu_l / cov_l: this level's (K,), (K, 3), (K, 3, 3) inits.
        parent_local: (N,) int32 — each point's parent index LOCAL to the
            previous level (all zeros for level 0).
        n_eff: true point count (scalar; the pi normalizer).

    Returns (pi_l, mu_l, cov_l, child_local) with child_local (N,) int32
    local to THIS level.
    """
    n = points.shape[0]
    k = pi_l.shape[0]
    np_ = -(-n // 128) * 128
    kp = -(-k // 128) * 128

    sm = jnp.zeros((np_,), jnp.float32).at[:n].set(
        jnp.asarray(smask, jnp.float32))
    x = jnp.zeros((3, np_), jnp.float32).at[:, :n].set(points.T)
    # Masked/padded points: zero feature COLUMN (their u values are then
    # a harmless exp(quadratic-only); gamma and the log-likelihood both
    # multiply by smask, and zero features null their moment columns).
    x = x * sm[None, :]
    x0, x1, x2 = x[0:1], x[1:2], x[2:3]
    fmat = jnp.concatenate(
        [sm[None, :], x0, x1, x2, x0 * x0, x0 * x1, x0 * x2, x1 * x1,
         x1 * x2, x2 * x2, jnp.zeros((6, np_), jnp.float32)], axis=0)

    cov6 = jnp.stack([cov_l[:, 0, 0], cov_l[:, 0, 1], cov_l[:, 0, 2],
                      cov_l[:, 1, 1], cov_l[:, 1, 2], cov_l[:, 2, 2]])
    state0 = jnp.zeros((16, kp), jnp.float32)
    state0 = state0.at[0, :k].set(jnp.asarray(pi_l, jnp.float32))
    state0 = state0.at[1:4, :k].set(jnp.asarray(mu_l, jnp.float32).T)
    state0 = state0.at[4:10, :k].set(cov6.astype(jnp.float32))
    # Padded nodes keep pi = 0: dead in the pdf grid, never win the
    # argmax (their child mask is 0 for every real parent anyway once
    # kid // 8 exceeds the previous level's size).

    parent = jnp.zeros((1, np_), jnp.int32).at[0, :n].set(
        jnp.asarray(parent_local, jnp.int32))

    consts = jnp.stack([
        jnp.asarray(lambda_s, jnp.float32),
        jnp.asarray(lambda_d, jnp.float32),
        jnp.asarray(n_eff, jnp.float32),
        jnp.asarray(float(maxiter), jnp.float32),
    ])

    state, cur, diag = pl.pallas_call(
        _level_em_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((16, kp), jnp.float32),
            jax.ShapeDtypeStruct((1, np_), jnp.int32),
            jax.ShapeDtypeStruct((1, 4), jnp.float32),
        ],
        interpret=interpret,
    )(consts, fmat, sm[None, :], parent, state0)

    pi_out = state[0, :k]
    mu_out = state[1:4, :k].T
    c6 = state[4:10, :k]
    cov_out = jnp.stack([
        jnp.stack([c6[0], c6[1], c6[2]], axis=-1),
        jnp.stack([c6[1], c6[3], c6[4]], axis=-1),
        jnp.stack([c6[2], c6[4], c6[5]], axis=-1),
    ], axis=-2)
    return pi_out, mu_out, cov_out, cur[0, :n]
