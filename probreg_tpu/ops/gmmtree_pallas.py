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


# --------------------------------------------------------------------------
# Fused whole-registration kernel (tree descent + twist M-step in VMEM)
# --------------------------------------------------------------------------
#
# gmmtree._run_registration is already one XLA program, but its ~35 ops per
# EM iteration serialize in-program (same launch-bound regime as the build:
# ~28 ms for 20 bunny iterations). This kernel runs the ENTIRE loop in one
# launch: the all-nodes pdf grid is the same moment-feature matmul as the
# build kernel's; the per-level descent is mask/reduce over the grid with
# the complexity gather done as a (1, T) x (T, N) matmul; the twist
# normal equations assemble from per-node channel rows and solve by the
# pt2pl kernel's Schur-over-3x3-cofactor method; the update composes via
# the exact Rodrigues (matches se3_op.twist_mul). Reference semantics:
# gmmtree.cc:175-215 (descent), gmmtree.py:64-96 (M-step, target-frame
# convention). One deliberate deviation: the XLA path clamps the pdf
# exponent at 0 (gmmtree.py _estep_t_factory) — a guard against ~1e-6
# NEGATIVE Mahalanobis rounding; unclamped, exp(5e-7)-level differences
# are far below the descent's argmax margins.

def _reg_kernel(consts_ref, ys_ref, cmask_ref, c16_ref, parentb_ref,
                cplx_ref, nm_ref, nn9_ref, lmd3_ref, cof_ref, sk_ref,
                tmat0_ref, tmat_ref, out_ref, *, max_level):
    """consts (SMEM, 4): [maxiter, tol, lambda_c, unused]."""
    maxiter = consts_ref[0]
    tol = consts_ref[1]
    lambda_c = consts_ref[2]
    eps = jnp.float32(1.1920929e-07)

    ys = ys_ref[:]                 # (8, Np) target rows [x, 1, 0...]
    cmask = cmask_ref[:]           # (1, Np)
    c16 = c16_ref[:]               # (16, Tp) pdf coeffs (pi/norm folded)
    parentb = parentb_ref[:]       # (Tp, Np) int32 parent-of-node bcast
    cplx = cplx_ref[:]             # (1, Tp)
    nm = nm_ref[:]                 # (3, Tp) node means (centered)
    nn9 = nn9_ref[:]               # (9, Tp) eigvecs: rows 3j+i = nn[t,i,j]
    lmd3 = lmd3_ref[:]             # (3, Tp) eigenvalues (floored)
    tp = c16.shape[1]
    np_ = ys.shape[1]
    tid = jax.lax.broadcasted_iota(jnp.int32, (tp, np_), 0)
    eye3 = jnp.eye(3, dtype=jnp.float32)

    def body(carry):
        tmat, q_prev_unused, q_cur, it = carry
        x_t = jax.lax.dot_general(
            tmat, ys, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)[:3]          # (3, Np)
        x0, x1, x2 = x_t[0:1], x_t[1:2], x_t[2:3]
        fmat = jnp.concatenate(
            [jnp.ones_like(x0), x0, x1, x2, x0 * x0, x0 * x1, x0 * x2,
             x1 * x1, x1 * x2, x2 * x2,
             jnp.zeros((6, np_), jnp.float32)], axis=0)       # (16, Np)
        qf = jax.lax.dot_general(
            c16, fmat, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)              # (Tp, Np)
        wpdf = jnp.exp(-0.5 * qf)                             # pi * pdf

        parent = jnp.full((1, np_), -1, jnp.int32)
        gmax = jnp.zeros((1, np_), jnp.float32)
        stopped = jnp.zeros((1, np_), jnp.float32)
        search = jnp.zeros((1, np_), jnp.int32)
        for _ in range(max_level):
            mask = (parentb == parent).astype(jnp.float32)
            g = wpdf * mask
            den = jnp.sum(g, axis=0, keepdims=True)
            g = jnp.where(den > _EPS, g / jnp.maximum(den, _EPS), 0.0)
            new_g = jnp.max(g, axis=0, keepdims=True)
            cand = jnp.where(
                jnp.logical_and(g >= new_g, mask > 0.0), tid,
                jnp.full_like(tid, _BIGI))
            new_search = jnp.min(cand, axis=0, keepdims=True)
            on = stopped > 0.5
            search = jnp.where(on, search, new_search)
            gmax = jnp.where(on, gmax, new_g)
            onehot = (tid == search).astype(jnp.float32)
            cpts = jax.lax.dot_general(
                cplx, onehot, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # (1, Np)
            stopped = jnp.maximum(
                stopped, (cpts <= lambda_c).astype(jnp.float32))
            parent = jnp.where(stopped > 0.5, parent, search)

        onehot = (tid == search).astype(jnp.float32)
        w = onehot * gmax * cmask                             # (Tp, Np)
        mom = jax.lax.dot_general(
            fmat, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)              # (16, Tp)
        m0 = mom[0:1]
        keep = (m0 >= eps).astype(jnp.float32)
        m0s = jnp.maximum(m0, eps)
        s = mom[1:4] / m0s                                    # (3, Tp)

        # Twist normal equations (gmmtree._mstep_core): rows of A_t are
        # scaled eigenvectors [cross(s, v_j); v_j], b_t,j = v_j.(mu - s).
        # The three eigendirection blocks concatenate along LANES so ata
        # and atb are single dots (Mosaic supports only constant
        # accumulators — `acc + dot` loops fail to lower).
        gj_list = []
        bj_list = []
        dmu = nm - s                                          # (3, Tp)
        for j in range(3):
            scale_j = jnp.sqrt(m0s / jnp.maximum(lmd3[j:j + 1], eps))
            v0 = nn9[3 * j + 0:3 * j + 1] * scale_j
            v1 = nn9[3 * j + 1:3 * j + 2] * scale_j
            v2 = nn9[3 * j + 2:3 * j + 3] * scale_j
            bj = (v0 * dmu[0:1] + v1 * dmu[1:2] + v2 * dmu[2:3]) * keep
            cx = (s[1:2] * v2 - s[2:3] * v1) * keep
            cy = (s[2:3] * v0 - s[0:1] * v2) * keep
            cz = (s[0:1] * v1 - s[1:2] * v0) * keep
            # One (8, Tp) block per eigendirection with b folded into
            # row 6: Mosaic's lane-concat wants identical sublane
            # offsets (separate (1, Tp) b rows carried offsets 0/3/6 and
            # failed to lower), and folding b means ata8's column 6 IS
            # A^T b — one dot yields the whole normal system.
            gj = jnp.concatenate(
                [cx, cy, cz, v0 * keep, v1 * keep, v2 * keep, bj,
                 jnp.zeros((1, tp), jnp.float32)], axis=0)
            gj_list.append(gj)
            bj_list.append(bj)
        gcat = jnp.concatenate(gj_list, axis=1)               # (8, 3 Tp)
        ata8 = jax.lax.dot_general(
            gcat, gcat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)              # (8, 8)
        atb8 = jnp.dot(ata8, jnp.eye(8, dtype=jnp.float32)[6:7].T,
                       preferred_element_type=jnp.float32)    # (8, 1)
        # 6x6 solve by Schur complement over two cofactor 3x3 inverses
        # (the pt2pl fused kernel's method, incl. its eye8-projection
        # block extraction); the XLA twin adds the same absolute 1e-8
        # ridge before jnp.linalg.solve.
        eye8 = jnp.eye(8, dtype=jnp.float32)
        p1m = eye8[0:3]
        p2m = eye8[3:6]
        lam = jnp.float32(1e-8)
        amat = jnp.dot(jnp.dot(p1m, ata8,
                               preferred_element_type=jnp.float32), p1m.T,
                       preferred_element_type=jnp.float32) + lam * eye3
        bmat3 = jnp.dot(jnp.dot(p1m, ata8,
                                preferred_element_type=jnp.float32), p2m.T,
                        preferred_element_type=jnp.float32)
        cmat = jnp.dot(jnp.dot(p2m, ata8,
                               preferred_element_type=jnp.float32), p2m.T,
                       preferred_element_type=jnp.float32) + lam * eye3
        b1 = jnp.dot(p1m, atb8, preferred_element_type=jnp.float32)
        b2 = jnp.dot(p2m, atb8, preferred_element_type=jnp.float32)
        from . import em_pallas as _em

        ainv = _em._inv3_sym(amat, cof_ref[:])
        ainv_b = jnp.dot(ainv, bmat3, preferred_element_type=jnp.float32)
        smat = cmat - jax.lax.dot_general(
            bmat3, ainv_b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        sinv = _em._inv3_sym(smat, cof_ref[:])
        rhs2 = b2 - jax.lax.dot_general(
            bmat3, jnp.dot(ainv, b1, preferred_element_type=jnp.float32),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        u2 = jnp.dot(sinv, rhs2, preferred_element_type=jnp.float32)
        u1 = jnp.dot(
            ainv, b1 - jnp.dot(bmat3, u2,
                               preferred_element_type=jnp.float32),
            preferred_element_type=jnp.float32)               # (3, 1) rot

        resid = (gcat[0:1] * u1[0, 0] + gcat[1:2] * u1[1, 0]
                 + gcat[2:3] * u1[2, 0] + gcat[3:4] * u2[0, 0]
                 + gcat[4:5] * u2[1, 0] + gcat[5:6] * u2[2, 0]
                 - gcat[6:7])
        q_new = jnp.sum(resid * resid)

        # Exact Rodrigues on the rotation part (se3_op.twist_trans).
        twd2 = jnp.sum(u1 * u1)
        twd = jnp.sqrt(jnp.maximum(twd2, jnp.float32(1e-30)))
        ntw = u1 / twd
        skewm = _em._unflatten_rows(
            jnp.dot(ntw.T, sk_ref[:],
                    preferred_element_type=jnp.float32), 3, 3)
        cth = jnp.cos(twd)
        sth = jnp.sin(twd)
        nnt = jnp.dot(ntw, ntw.T, preferred_element_type=jnp.float32)
        dr = cth * eye3 + (1.0 - cth) * nnt + sth * skewm
        dr = jnp.where(twd2 < jnp.float32(1e-12), eye3, dr)

        old_rt = tmat[:3, :]                                  # (3, 8)
        new_rt = jnp.dot(dr, old_rt, preferred_element_type=jnp.float32)
        col3 = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1) == 3, 1.0, 0.0)
        dt_pad = jnp.dot(u2, col3, preferred_element_type=jnp.float32)
        tmat_new = jnp.concatenate(
            [new_rt + dt_pad, jnp.eye(8, dtype=jnp.float32)[3:]], axis=0)
        return (tmat_new, q_cur, q_new, it + 1.0)

    def cond(carry):
        _, q_prev, q, it = carry
        return jnp.logical_and(
            it < maxiter,
            jnp.logical_or(it < 0.5, jnp.abs(q - q_prev) >= tol))

    carry0 = (tmat0_ref[:], jnp.float32(3.4e38), jnp.float32(3.4e38),
              jnp.float32(0.0))
    tmat, _, q, it = jax.lax.while_loop(cond, body, carry0)
    tmat_ref[:] = tmat
    out_ref[0, 0] = q
    out_ref[0, 1] = it
    out_ref[0, 2] = jnp.float32(0.0)
    out_ref[0, 3] = jnp.float32(0.0)


def fused_reg_ok(n, max_level):
    """VMEM gate for the fused registration kernel's (Tp, Np) grids."""
    import numpy as _np

    n_total = int((N_NODE * (N_NODE ** max_level - 1)) // (N_NODE - 1))
    tp = -(-n_total // 128) * 128
    np_ = -(-n // 128) * 128
    return tp * np_ * 4 * 6 <= 10 << 20


@functools.partial(
    jax.jit,
    static_argnames=("max_level", "lambda_c", "maxiter", "tol",
                     "interpret"))
def run_gmmtree_reg_fused(target, pi, mu, cov, rot0, t0, tmask=None, *,
                          max_level, lambda_c, maxiter, tol,
                          interpret=False):
    """Whole GMMTree registration as ONE kernel launch.

    Mirrors gmmtree._run_registration exactly (same centering, same
    hoisted eigendecompositions with the 1e-7 eigenvalue floor, same
    convergence): returns (rot, t, q) in the raw target frame.
    """
    from .. import gmmtree as _gt

    n = target.shape[0]
    n_total = pi.shape[0]
    from . import sym3 as _sym3

    lmd_nodes, nn_nodes = _sym3.eigh3(cov)
    lmd_nodes = jnp.maximum(lmd_nodes, jnp.float32(1e-7))
    cen = _gt._tree_centroid(target, mu, tmask)
    mu_c = mu - cen[None, :]
    xs0 = target - cen[None, :]
    t0 = t0 + rot0 @ cen - cen

    inv, norm, _ = _gt._log_pdf_terms(
        jnp.asarray(cov, jnp.float32))
    cplx_v = _gt._complexity(cov)
    pinorm = jnp.asarray(pi, jnp.float32) * norm
    logpn = jnp.where(pinorm > 0.0,
                      jnp.log(jnp.maximum(pinorm, 1e-38)), _NEG_BIG)
    msi = jnp.einsum("tij,tj->ti", inv, mu_c)                 # (T, 3)
    mcm = jnp.einsum("ti,ti->t", msi, mu_c)                   # (T,)
    a0 = mcm - 2.0 * logpn
    quad = jnp.stack([inv[:, 0, 0], 2.0 * inv[:, 0, 1], 2.0 * inv[:, 0, 2],
                      inv[:, 1, 1], 2.0 * inv[:, 1, 2], inv[:, 2, 2]])

    tp = -(-n_total // 128) * 128
    np_ = -(-n // 128) * 128
    c16 = jnp.zeros((16, tp), jnp.float32)
    c16 = c16.at[0, :n_total].set(a0)
    c16 = c16.at[1:4, :n_total].set(-2.0 * msi.T)
    c16 = c16.at[4:10, :n_total].set(quad)
    # Padded nodes: dead (constant +BIG exponent term).
    c16 = c16.at[0, n_total:].set(-2.0 * _NEG_BIG)

    parent_of = jnp.concatenate([
        jnp.arange(n_total, dtype=jnp.int32) // N_NODE - 1,
        jnp.full((tp - n_total,), -2, jnp.int32)])
    parentb = jnp.broadcast_to(parent_of[:, None], (tp, np_))
    cplx = jnp.zeros((1, tp), jnp.float32).at[0, :n_total].set(cplx_v)
    nm = jnp.zeros((3, tp), jnp.float32).at[:, :n_total].set(mu_c.T)
    nn9 = jnp.zeros((9, tp), jnp.float32)
    for j in range(3):
        for i in range(3):
            nn9 = nn9.at[3 * j + i, :n_total].set(nn_nodes[:, i, j])
    lmd3 = jnp.ones((3, tp), jnp.float32).at[:, :n_total].set(lmd_nodes.T)

    ys = jnp.zeros((8, np_), jnp.float32)
    ys = ys.at[:3, :n].set(xs0.T)
    ys = ys.at[3, :n].set(1.0)
    cmask = jnp.zeros((1, np_), jnp.float32).at[0, :n].set(
        1.0 if tmask is None else jnp.asarray(tmask, jnp.float32))

    tmat0 = jnp.eye(8, dtype=jnp.float32)
    tmat0 = tmat0.at[:3, :3].set(rot0)
    tmat0 = tmat0.at[:3, 3].set(t0)
    consts = jnp.stack([
        jnp.asarray(float(maxiter), jnp.float32),
        jnp.asarray(float(tol), jnp.float32),
        jnp.asarray(lambda_c, jnp.float32),
        jnp.asarray(0.0, jnp.float32),
    ])

    from . import em_pallas as _em

    tmat, out = pl.pallas_call(
        functools.partial(_reg_kernel, max_level=max_level),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 11,
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, 8), jnp.float32),
            jax.ShapeDtypeStruct((1, 4), jnp.float32),
        ],
        interpret=interpret,
    )(consts, ys, cmask, c16, parentb, cplx, nm, nn9, lmd3,
      jnp.asarray(_em._COF_T), jnp.asarray(_em._SK_T), tmat0)

    rot, t = tmat[:3, :3], tmat[:3, 3]
    t = t + cen - rot @ cen
    return rot, t, out[0, 0]
