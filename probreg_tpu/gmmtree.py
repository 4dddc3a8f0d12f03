"""GMMTree registration: EM against a hierarchical (octree-of-Gaussians) GMM.

Parity with reference probreg/gmmtree.py + probreg/cc/gmmtree.{h,cc},
redesigned TPU-first: the C++ stores the 8-ary tree in a flat NodeParam
array with closed-form child/level indexing (gmmtree.cc:42-44) and walks it
with per-point OpenMP loops + critical-section accumulation. Here the tree
is three dense tensors (pi (T,), mu (T, 3), cov (T, 3, 3)); the per-level
build E-step and the per-point registration descent are fully vectorized
gathers over those tensors, and moment accumulation is
``jax.ops.segment_sum`` — no critical sections, no scalar loops.

Tree layout (identical to the C++): node j's children are
(j+1)*8 ... (j+1)*8+7; level l spans [8(8^l - 1)/7, 8(8^(l+1) - 1)/7).
"""

from __future__ import annotations

from collections import namedtuple
from functools import partial
from typing import Any, Callable, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from . import config as _config
from .log import log
from .models import transformation as tf
from .ops import sym3 as _sym3
from .utils import interop
from .utils import se3_op as so

N_NODE = 8
_EPS = 1.0e-15

EstepResult = namedtuple("EstepResult", ["moments"])
MstepResult = namedtuple("MstepResult", ["transformation", "q"])
MstepResult.__doc__ = """Result of Maximization step.

    Attributes:
        transformation (tf.Transformation): Transformation from source to target.
        q (float): Result of likelihood.
"""


def _level_start(l: int) -> int:
    """First node index of level l (gmmtree.cc:44)."""
    return N_NODE * (N_NODE ** l - 1) // (N_NODE - 1)


def _n_total(max_level: int) -> int:
    return _level_start(max_level)


def _log_pdf_terms(cov):
    """(inv, logdet-normalizer, valid) for batched 3x3 covariances."""
    det = jnp.linalg.det(cov)
    valid = det >= _EPS
    safe = jnp.where(valid[:, None, None], cov,
                     jnp.eye(cov.shape[-1], dtype=cov.dtype))
    inv = jnp.linalg.inv(safe)
    dim = cov.shape[-1]
    norm = 1.0 / (jnp.sqrt(jnp.maximum(det, _EPS))
                  * (2.0 * jnp.pi) ** (dim * 0.5))
    return inv, jnp.where(valid, norm, 0.0), valid


def _pdf(points, mu, inv, norm):
    """Batched gaussian pdf: points (P, 3) against nodes (P, K, ...)."""
    d = points[:, None, :] - mu                            # (P, K, 3)
    ep = -0.5 * jnp.einsum("pki,pkij,pkj->pk", d, inv, d)
    return norm * jnp.exp(ep)


def _gamma_children(points, parent_idx, pi, mu, inv, norm):
    """Soft assignment of each point to the 8 children of its parent."""
    j0 = (parent_idx + 1) * N_NODE                         # (P,)
    cidx = j0[:, None] + jnp.arange(N_NODE)[None, :]       # (P, 8)
    g = pi[cidx] * _pdf(points, mu[cidx], inv[cidx], norm[cidx])
    den = jnp.sum(g, axis=1, keepdims=True)
    g = jnp.where(den > _EPS, g / jnp.maximum(den, _EPS), 0.0)
    return g, cidx


def _accumulate(points, gamma, node_idx, n_total):
    """segment-sum moments (m0, m1, m2) over node ids (gmmtree.cc:78-82)."""
    m0 = jax.ops.segment_sum(gamma, node_idx, num_segments=n_total)
    m1 = jax.ops.segment_sum(gamma[:, None] * points, node_idx,
                             num_segments=n_total)
    zz = points[:, :, None] * points[:, None, :]
    m2 = jax.ops.segment_sum(gamma[:, None, None] * zz, node_idx,
                             num_segments=n_total)
    return m0, m1, m2


def _complexity(cov):
    """max eigenvalue ratio (gmmtree.cc:35-40); low = planar/degenerate."""
    # Closed-form eigenvalues (ops/sym3): jnp.linalg.eigvalsh costs
    # ~28 ms on v5e even for a (72, 3, 3) batch (round-5 measurement) and
    # dominated every registration that computed it.
    lmds = _sym3.eigvalsh3(cov)
    return lmds[..., -1] / jnp.maximum(jnp.sum(lmds, axis=-1), _EPS)


@partial(jax.jit, static_argnames=("max_level", "lambda_s", "lambda_d",
                                   "fused", "fused_interpret"))
def _build(points, key, *, max_level, lambda_s, lambda_d, smask=None,
           fused=False, fused_interpret=False):
    """buildGmmTree (gmmtree.cc:98-123): per-level EM to convergence.

    ``smask``: optional (N,) validity mask for ragged-batch padding — the
    leaf init draws only valid indices (padding sits at the tail), every
    responsibility row of a padded point is zeroed, and the log-likelihood /
    pi normalizers use the true count. Exactly the unpadded build.
    """
    n, dim = points.shape
    n_total = _n_total(max_level)
    masked = smask is not None
    n_eff = jnp.sum(smask) if masked else n
    # Centering: the build's covariance estimators are all of the
    # cancellation-prone m2/m0 - mu mu^T form, which at UTM/mm-scale
    # coordinates (|x| ~ 1e4+) loses the entire covariance to f32
    # rounding (see cpd._run_em_t). Node means shift back at the end.
    if masked:
        cen = (smask @ points) / jnp.maximum(n_eff, 1.0)
    else:
        cen = jnp.mean(points, axis=0)
    points = points - cen[None, :]

    # --- initializeNodes (gmmtree.cc:46-75)
    n_leaf = N_NODE ** max_level
    lf = _level_start(max_level - 1)
    if masked:
        idxs = jax.random.randint(
            key, (n_leaf,), 0, jnp.maximum(n_eff.astype(jnp.int32), 1))
    else:
        idxs = jax.random.randint(key, (n_leaf,), 0, n)
    pi = jnp.zeros((n_total,), points.dtype)
    mu = jnp.zeros((n_total, dim), points.dtype)
    cov = jnp.zeros((n_total, dim, dim), points.dtype)
    pi = pi.at[lf:lf + n_leaf].set(1.0 / N_NODE)
    leaf_mu = points[idxs]
    mu = mu.at[lf:lf + n_leaf].set(leaf_mu)
    diff = points[None, :, :] - leaf_mu[:, None, :]        # (n_leaf, n, 3)
    if masked:
        leaf_cov = jnp.einsum(
            "kni,knj->kij", diff * smask[None, :, None], diff) / n_eff
    else:
        leaf_cov = jnp.einsum("kni,knj->kij", diff, diff) / n
    cov = cov.at[lf:lf + n_leaf].set(leaf_cov)
    for l in range(max_level - 2, -1, -1):
        pidx, cidx = _level_start(l), _level_start(l + 1)
        k = N_NODE ** (l + 1)
        cm = mu[cidx:cidx + k * N_NODE].reshape(k, N_NODE, dim)
        cc = cov[cidx:cidx + k * N_NODE].reshape(k, N_NODE, dim, dim)
        pm = cm.mean(axis=1)
        pc = (cc + cm[..., :, None] * cm[..., None, :]).mean(axis=1) \
            - pm[:, :, None] * pm[:, None, :]
        pi = pi.at[pidx:pidx + k].set(1.0 / N_NODE)
        mu = mu.at[pidx:pidx + k].set(pm)
        cov = cov.at[pidx:pidx + k].set(pc)

    # --- per-level EM (outer python loop over static levels)
    if fused and dim == 3:
        # One Pallas launch per level (ops/gmmtree_pallas.level_em): the
        # XLA level loop below is kernel-launch-serialization-bound on
        # TPU (~146 ms at bunny size for microseconds of FLOPs); the
        # fused kernel runs each level's entire EM while_loop in VMEM
        # with the pdf grid and the M-step moments as two MXU matmuls.
        from .ops import gmmtree_pallas as _gp

        sm = smask if masked else jnp.ones((n,), points.dtype)
        parent_local = jnp.zeros((n,), jnp.int32)
        for l in range(max_level):
            lb, le = _level_start(l), _level_start(l + 1)
            pi_l, mu_l, cov_l, parent_local = _gp.level_em(
                points, sm, pi[lb:le], mu[lb:le], cov[lb:le],
                parent_local, n_eff, lambda_s=lambda_s,
                lambda_d=lambda_d, interpret=fused_interpret)
            pi = pi.at[lb:le].set(pi_l)
            mu = mu.at[lb:le].set(mu_l)
            cov = cov.at[lb:le].set(cov_l)
        return pi, mu + cen[None, :], cov

    parent_idx = jnp.full((n,), -1, jnp.int32)
    for l in range(max_level):
        lb, le = _level_start(l), _level_start(l + 1)

        def level_ll(pi, mu, cov):
            inv, norm, _ = _log_pdf_terms(cov[lb:le])
            p = pi[None, lb:le] * _pdf(
                points,
                jnp.broadcast_to(mu[lb:le], (n, le - lb, dim)),
                jnp.broadcast_to(inv, (n, le - lb, dim, dim)),
                jnp.broadcast_to(norm, (n, le - lb)))
            ll = jnp.log(jnp.maximum(jnp.sum(p, axis=1), _EPS))
            return jnp.sum(ll * smask) if masked else jnp.sum(ll)

        def em_once(pi, mu, cov, parent_idx):
            inv, norm, _ = _log_pdf_terms(cov)
            gamma, cidx = _gamma_children(points, parent_idx, pi, mu, inv, norm)
            if masked:
                gamma = gamma * smask[:, None]
            flat_g = gamma.reshape(-1)
            flat_i = cidx.reshape(-1)
            pts_rep = jnp.repeat(points, N_NODE, axis=0)
            m0, m1, m2 = _accumulate(pts_rep, flat_g, flat_i, _n_total(max_level))
            # mlEstimator (gmmtree.cc:84-97) on this level only.
            sl = slice(lb, le)
            keep = m0[sl] >= lambda_d
            new_pi = jnp.where(keep, m0[sl] / n_eff, 0.0)
            m0s = jnp.maximum(m0[sl], _EPS)
            new_mu = jnp.where(keep[:, None], m1[sl] / m0s[:, None], 0.0)
            new_cov = jnp.where(
                keep[:, None, None],
                m2[sl] / m0s[:, None, None]
                - new_mu[:, :, None] * new_mu[:, None, :],
                jnp.eye(dim, dtype=points.dtype)[None])
            pi = pi.at[sl].set(new_pi)
            mu = mu.at[sl].set(new_mu)
            cov = cov.at[sl].set(new_cov)
            current_idx = jnp.take_along_axis(
                cidx, jnp.argmax(gamma, axis=1)[:, None], axis=1)[:, 0]
            return pi, mu, cov, current_idx.astype(jnp.int32)

        def cond(state):
            _, _, _, _, q, q_prev, it = state
            return jnp.logical_and(
                it < 50, jnp.logical_or(it == 0, jnp.abs(q - q_prev) >= lambda_s))

        def body(state):
            pi, mu, cov, _, q, _, it = state
            pi, mu, cov, cur = em_once(pi, mu, cov, parent_idx)
            q_new = level_ll(pi, mu, cov)
            return (pi, mu, cov, cur, q_new, q, it + 1)

        state = (pi, mu, cov, parent_idx,
                 jnp.asarray(0.0, points.dtype), jnp.asarray(jnp.inf, points.dtype),
                 jnp.asarray(0))
        pi, mu, cov, parent_idx, _, _, _ = jax.lax.while_loop(cond, body, state)

    return pi, mu + cen[None, :], cov


@partial(jax.jit, static_argnames=("max_level", "lambda_c"))
def _reg_estep(points, pi, mu, cov, *, max_level, lambda_c):
    """gmmTreeRegEstep (gmmtree.cc:175-215): vectorized tree descent."""
    n, dim = points.shape
    n_total = _n_total(max_level)
    inv, norm, _ = _log_pdf_terms(cov)
    cplx = _complexity(cov)                                # (T,)

    search = jnp.full((n,), -1, jnp.int32)
    gmax = jnp.zeros((n,), points.dtype)
    stopped = jnp.zeros((n,), bool)
    for l in range(max_level):
        gamma, cidx = _gamma_children(points, search, pi, mu, inv, norm)
        arg = jnp.argmax(gamma, axis=1)
        new_search = jnp.take_along_axis(cidx, arg[:, None], 1)[:, 0].astype(jnp.int32)
        new_g = jnp.take_along_axis(gamma, arg[:, None], 1)[:, 0]
        search = jnp.where(stopped, search, new_search)
        gmax = jnp.where(stopped, gmax, new_g)
        stopped = stopped | (cplx[search] <= lambda_c)
    return _accumulate(points, gmax, search, n_total)


def _mstep_core(m0, m1, node_mu, lmd, nn, rot_p, t_p):
    """Reference gmmtree.py:64-81 with the (constant) node-covariance
    eigendecompositions hoisted out of the EM loop; the stacked twist
    least-squares is solved via 6x6 normal equations (lstsq's SVD costs
    more than the rest of the iteration combined on TPU)."""
    t_total = m0.shape[0]
    dim = node_mu.shape[1]
    eps = jnp.finfo(jnp.float32).eps
    keep = m0 >= eps
    m0s = jnp.maximum(m0, eps)
    s = m1 / m0s[:, None]                                   # (T, 3)
    scale = jnp.sqrt(m0s[:, None] / jnp.maximum(lmd, eps))  # (T, 3)
    nns = nn * scale[:, None, :]                            # scaled eigvecs
    nn_t = jnp.swapaxes(nns, 1, 2)                          # (T, 3, 3) rows=vecs
    b = jnp.einsum("tij,tj->ti", nn_t, node_mu - s)         # (T, 3)
    a_rot = jnp.cross(jnp.broadcast_to(s[:, None, :], nn_t.shape), nn_t)
    amat = jnp.concatenate([a_rot, nn_t], axis=2)           # (T, 3, 6)
    amat = jnp.where(keep[:, None, None], amat, 0.0)
    b = jnp.where(keep[:, None], b, 0.0)
    amat = amat.reshape(t_total * dim, 2 * dim)
    b = b.reshape(t_total * dim)
    ata = amat.T @ amat
    atb = amat.T @ b
    x = jnp.linalg.solve(ata + 1e-8 * jnp.eye(2 * dim, dtype=ata.dtype), atb)
    q = jnp.sum((amat @ x - b) ** 2)
    rot, t = so.twist_mul(x, rot_p, t_p)
    return rot, t, q


@partial(jax.jit, static_argnames=())
def _mstep(m0, m1, node_mu, node_cov, rot_p, t_p):
    lmd, nn = _sym3.eigh3(node_cov)
    return _mstep_core(m0, m1, node_mu, lmd, nn, rot_p, t_p)


def _estep_t_factory(pi, mu, cov, max_level, lambda_c):
    """Build the transposed-descent E-step: estep(x_t (3, N), col_mask
    (1, N)) -> (m0 (T,), m1 (T, 3)). ``col_mask`` zeroes padded columns so
    the sharded path (parallel/sharded.py) can psum the moments."""
    n_total = _n_total(max_level)
    dim = mu.shape[1]
    inv, norm, _ = _log_pdf_terms(cov)                      # (T,3,3), (T,)
    cplx = _complexity(cov)                                 # (T,)
    si_stack = inv.reshape(n_total * dim, dim)              # (3T, 3)
    msi = jnp.einsum("tij,tj->ti", inv, mu)                 # (T, 3)
    mcm = jnp.einsum("ti,ti->t", msi, mu)                   # (T,)
    # Constant selection matrix: qf (T, N) = SSUM @ (B * Xrep), where
    # row t sums the 3 rows of its node block.
    ssum = jnp.repeat(jnp.eye(n_total, dtype=mu.dtype), dim, axis=1)
    parent_of = jnp.asarray(
        np.arange(n_total) // N_NODE - 1, jnp.int32)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (n_total, 1), 0)

    def estep_t(x_t, col_mask):
        n = x_t.shape[1]
        # pdf matrix for all nodes: (T, N).
        b_all = jax.lax.dot_general(
            si_stack, x_t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (3T, N)
        x_rep = jnp.tile(x_t, (n_total, 1))                 # (3T, N)
        qf = jax.lax.dot_general(
            ssum, b_all * x_rep, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (T, N)
        lin = jax.lax.dot_general(
            msi, x_t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (T, N)
        ep = -0.5 * (qf - 2.0 * lin + mcm[:, None])
        pdf = norm[:, None] * jnp.exp(jnp.minimum(ep, 0.0))
        wpdf = pi[:, None] * pdf                            # (T, N)

        parent = jnp.full((1, n), -1, jnp.int32)
        gmax = jnp.zeros((1, n), x_t.dtype)
        stopped = jnp.zeros((1, n), bool)
        search = jnp.zeros((1, n), jnp.int32)
        for _ in range(max_level):
            mask = (parent_of[:, None] == parent).astype(x_t.dtype)
            g = wpdf * mask
            den = jnp.sum(g, axis=0, keepdims=True)
            g = jnp.where(den > _EPS, g / jnp.maximum(den, _EPS), 0.0)
            new_search = jnp.argmax(g, axis=0)[None, :].astype(jnp.int32)
            new_g = jnp.max(g, axis=0, keepdims=True)
            search = jnp.where(stopped, search, new_search)
            gmax = jnp.where(stopped, gmax, new_g)
            # cplx gather via one-hot matmul (lane-friendly).
            onehot = (row_iota == search).astype(x_t.dtype)  # (T, N)
            cpts = jax.lax.dot_general(
                cplx[None, :], onehot, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # (1, N)
            stopped = stopped | (cpts <= lambda_c)
            parent = jnp.where(stopped, parent, search)

        onehot = (row_iota == search).astype(x_t.dtype)
        w = onehot * gmax * col_mask                         # (T, N)
        m0 = jnp.sum(w, axis=1)                              # (T,)
        m1 = jax.lax.dot_general(
            w, x_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # (T, 3)
        return m0, m1

    return estep_t


@partial(jax.jit, static_argnames=("max_level", "lambda_c"))
def _run_registration(target, pi, mu, cov, rot0, t0, *, max_level, lambda_c,
                      maxiter, tol, tmask=None):
    """Whole registration loop in transposed (D, N) layout.

    Per-iteration (N, 3)-layout ops cost ~0.25 ms each on TPU in lane
    relayouts (see cpd.py). The descent is reformulated against the pdf
    matrix of ALL T nodes at once: the Mahalanobis quadratic/linear terms
    for every (node, point) pair come from three constant-matrix matmuls,
    the per-level child restriction is a (T, N) parent-id mask, and the
    final moments (m0, m1, the 6 unique m2 entries) are (T, N) x (N, *)
    matmuls against a one-hot assignment matrix. Everything lane = points.
    """
    n, dim = target.shape
    lmd_nodes, nn_nodes = _sym3.eigh3(cov)
    # f32 covariance estimation can leave slightly INDEFINITE nodes
    # (observed -1.1e-5 smallest eigenvalue on a quantized-input build);
    # a negative eigenvalue drops that direction's twist weight to the
    # eps floor and one such node dominates the 6x6 system — repro:
    # 1.67 rad error at a 1e4 coordinate offset, 4e-3 with the floor.
    lmd_nodes = jnp.maximum(lmd_nodes, jnp.float32(1e-7))
    # Shared-centroid centering (node means + target): the Mahalanobis
    # quadratic terms lose ~|x|^2 * eps to f32 cancellation at UTM/mm
    # coordinate scales (see cpd._run_em_t); covariances are invariant.
    cen = _tree_centroid(target, mu, tmask)
    mu = mu - cen[None, :]
    xs_t0 = target.T - cen[:, None]                         # (3, N)
    t0 = t0 + rot0 @ cen - cen
    estep_core = _estep_t_factory(pi, mu, cov, max_level, lambda_c)
    col_mask = tmask[None, :] if tmask is not None \
        else jnp.ones((1, n), target.dtype)

    def estep_t(x_t):
        return estep_core(x_t, col_mask)

    def body(state):
        rot, t, q, _, i = state
        x_t = rot @ xs_t0 + t[:, None]                       # (3, N)
        m0, m1 = estep_t(x_t)
        rot_new, t_new, q_new = _mstep_core(
            m0, m1, mu, lmd_nodes, nn_nodes, rot, t)
        return (rot_new, t_new, q_new, q, i + 1)

    def cond(state):
        _, _, q, q_prev, i = state
        return jnp.logical_and(
            i < maxiter,
            jnp.logical_or(i == 0, jnp.abs(q - q_prev) >= tol))

    state = (rot0, t0, jnp.asarray(jnp.inf, target.dtype),
             jnp.asarray(jnp.inf, target.dtype), jnp.asarray(0))
    rot, t, q, _, _ = jax.lax.while_loop(cond, body, state)
    t = t + cen - rot @ cen                     # centered -> raw frame
    return rot, t, q


def _multistart_rots(n_starts: int, dim: int) -> np.ndarray:
    """(S, D, D) rotation starts on the shared coarse orientation grid."""
    from . import cost_functions as cf

    return cf.RigidCostFunction.initial_multistart_rots(n_starts, dim)


def _tree_centroid(target, mu, tmask=None):
    """Shared centering shift for the descent (any near-cloud point works;
    exactness is irrelevant, only the magnitude reduction matters)."""
    if tmask is not None:
        tsum = tmask @ target
        tcnt = jnp.sum(tmask)
    else:
        tsum = jnp.sum(target, axis=0)
        tcnt = target.shape[0]
    return (tsum + jnp.sum(mu, axis=0)) / (tcnt + mu.shape[0])


@partial(jax.jit, static_argnames=("max_level", "lambda_c", "k"))
def _registration_chunk(target, pi, mu, cov, rot0, t0, *, max_level,
                        lambda_c, k):
    """K EM iterations in one program, emitting per-iteration (rot, t, q).

    Callback-mode chunking (utils/chunked.py): same transposed step as
    _run_registration, scanned with history instead of while-looped."""
    lmd_nodes, nn_nodes = _sym3.eigh3(cov)
    # f32 covariance estimation can leave slightly INDEFINITE nodes
    # (observed -1.1e-5 smallest eigenvalue on a quantized-input build);
    # a negative eigenvalue drops that direction's twist weight to the
    # eps floor and one such node dominates the 6x6 system — repro:
    # 1.67 rad error at a 1e4 coordinate offset, 4e-3 with the floor.
    lmd_nodes = jnp.maximum(lmd_nodes, jnp.float32(1e-7))
    cen = _tree_centroid(target, mu)
    mu = mu - cen[None, :]
    xs_t0 = target.T - cen[:, None]
    t0 = t0 + rot0 @ cen - cen
    estep_core = _estep_t_factory(pi, mu, cov, max_level, lambda_c)
    col_mask = jnp.ones((1, target.shape[0]), target.dtype)

    def body(carry, _):
        rot, t = carry
        x_t = rot @ xs_t0 + t[:, None]
        m0, m1 = estep_core(x_t, col_mask)
        rot_n, t_n, q_n = _mstep_core(m0, m1, mu, lmd_nodes, nn_nodes,
                                      rot, t)
        # RAW-frame history for the callback consumers; centered carry.
        return (rot_n, t_n), (rot_n, t_n + cen - rot_n @ cen, q_n)

    (rot_c, t_c), hist = jax.lax.scan(body, (rot0, t0), None, length=k)
    return (rot_c, t_c + cen - rot_c @ cen), hist


@partial(jax.jit, static_argnames=("max_level", "lambda_c"))
def _run_registration_multistart(target, pi, mu, cov, rots0, *, max_level,
                                 lambda_c, maxiter, tol, tmask=None):
    n, dim = target.shape
    cen = _tree_centroid(target, mu, tmask)
    mu_c = mu - cen[None, :]
    xs_t0 = target.T - cen[:, None]
    estep_core = _estep_t_factory(pi, mu_c, cov, max_level, lambda_c)
    col_mask = tmask[None, :] if tmask is not None \
        else jnp.ones((1, n), target.dtype)

    def run(rot0):
        # About-centroid grid start (raw frame); _run_registration
        # re-centers internally.
        t0 = cen - rot0 @ cen
        rot, t, q = _run_registration(target, pi, mu, cov, rot0, t0,
                                      max_level=max_level, lambda_c=lambda_c,
                                      maxiter=maxiter, tol=tol, tmask=tmask)
        # Basin selection CANNOT use the twist residual q: a start where no
        # node matches (all m0 < eps) zeroes the lstsq system and reports
        # q = 0 — the worst outcome scoring as the best. Rescore the final
        # pose by the m0-weighted distance of each node's assigned-point
        # centroid to the node mean, with unmatched mass scored infinite.
        # Rescore in the CENTERED frame: t_c = t + R c - c.
        m0, m1 = estep_core(
            rot @ xs_t0 + (t + rot @ cen - cen)[:, None], col_mask)
        m0s = jnp.maximum(m0, _EPS)
        d2 = jnp.sum((m1 / m0s[:, None] - mu_c) ** 2, axis=1)
        mass = jnp.sum(m0)
        n_eff = jnp.sum(tmask) if tmask is not None else n
        score = jnp.where(mass > 1e-3 * n_eff,
                          jnp.sum(m0 * d2) / jnp.maximum(mass, _EPS),
                          jnp.inf)
        return rot, t, q, score

    rot, t, q, score = jax.vmap(run)(rots0)
    i = jnp.argmin(jnp.where(jnp.isnan(score), jnp.inf, score))
    return rot[i], t[i], q[i]


class GMMTree:
    """GMM Tree registration (reference gmmtree.py:24-96).

    Args:
        source: Source point cloud data.
        tree_level: Maximum depth of the GMM tree.
        lambda_c: Complexity threshold pruning the registration descent.
        lambda_s: Log-likelihood tolerance for building the tree.
        tf_init_params: Initializer kwargs for the rigid transformation.
        seed: PRNG seed for the leaf initialization (the C++ uses
            Eigen Vector::Random, gmmtree.cc:47).
    """

    def __init__(self, source=None, tree_level: int = 2,
                 lambda_c: float = 0.01, lambda_s: float = 0.001,
                 tf_init_params: Dict = {}, seed: int = 0):
        self._tree_level = tree_level
        self._lambda_c = lambda_c
        self._lambda_s = lambda_s
        self._tf_type = tf.RigidTransformation
        self._tf_result = self._tf_type(**tf_init_params)
        self._callbacks: List[Callable] = []
        self._seed = seed
        self._source = None
        if source is not None:
            self.set_source(source)

    def set_source(self, source):
        self._source = jnp.asarray(
            interop.as_points(source, dtype=_config.config.dtype))
        # Build from the f64-HOST-centered cloud: representing a unit
        # cloud at |x| ~ 1e4 quantizes every f32 coordinate to ~1e-3,
        # which is enough noise to flip the build EM into a degenerate
        # half-dead tree (38/64 live leaves) whose descent then DIVERGES
        # (measured: q and the pose walk away monotonically at a 1e4
        # offset). Centering in f64 first preserves the full input
        # precision; node means shift back so the tree stays in the
        # caller's raw frame (the registration runners re-center
        # internally in f32, which is exact once magnitudes are O(1)).
        src64 = np.asarray(interop.as_points(source), np.float64)
        center = src64.mean(axis=0)
        key = jax.random.PRNGKey(self._seed)
        # Fused per-level build kernel on TPU (ops/gmmtree_pallas): the
        # XLA build is launch-serialization-bound (146 -> ~3 ms measured
        # at bunny size on v5e).
        from .ops.gmmtree_pallas import fused_build_ok

        fused = (jax.default_backend() == "tpu"
                 and _config.config.use_fused_em
                 and src64.shape[1] == 3
                 and _config.config.dtype == jnp.float32
                 and fused_build_ok(src64.shape[0], self._tree_level))
        pi, mu, cov = _build(
            jnp.asarray(src64 - center, _config.config.dtype), key,
            max_level=self._tree_level,
            lambda_s=float(self._lambda_s), lambda_d=1.0e-4, fused=fused)
        self._nodes = (pi, mu + jnp.asarray(center, mu.dtype)[None, :], cov)

    def set_callbacks(self, callbacks):
        self._callbacks = callbacks

    def expectation_step(self, target) -> EstepResult:
        pi, mu, cov = self._nodes
        m0, m1, m2 = _reg_estep(
            jnp.asarray(target), pi, mu, cov,
            max_level=self._tree_level, lambda_c=float(self._lambda_c))
        return EstepResult((m0, m1, m2))

    def maximization_step(self, estep_res: EstepResult, trans_p) -> MstepResult:
        m0, m1, _ = estep_res.moments
        pi, mu, cov = self._nodes
        rot, t, q = _mstep(m0, m1, mu, cov, trans_p.rot, trans_p.t)
        return MstepResult(tf.RigidTransformation(rot, t), q)

    def registration(self, target, maxiter: int = 20,
                     tol: float = 1.0e-4, n_starts: int = 1,
                     callback_chunk: int = 1) -> MstepResult:
        """``callback_chunk``: EM iterations per device dispatch in callback
        mode; callbacks still fire once per iteration (utils/chunked.py)."""
        target = jnp.asarray(interop.as_points(target, dtype=_config.config.dtype))
        pi, mu, cov = self._nodes
        if n_starts > 1:
            if self._callbacks:
                raise ValueError("n_starts > 1 requires no callbacks")
            rot, t, q = _run_registration_multistart(
                target, pi, mu, cov,
                jnp.asarray(_multistart_rots(int(n_starts),
                                             int(target.shape[1]))),
                max_level=self._tree_level, lambda_c=float(self._lambda_c),
                maxiter=int(maxiter), tol=float(tol))
            self._tf_result = tf.RigidTransformation(rot, t)
            return MstepResult(self._tf_result.inverse(), q)
        if not self._callbacks:
            # Fused whole-registration kernel (ops/gmmtree_pallas): the
            # XLA loop's ~35 ops/iteration serialize in-program; matches
            # the XLA trajectory to ~1e-7 (single launch, all grids in
            # VMEM).
            from .ops.gmmtree_pallas import fused_reg_ok, \
                run_gmmtree_reg_fused

            if (jax.default_backend() == "tpu"
                    and _config.config.use_fused_em
                    and target.shape[1] == 3
                    and target.dtype == jnp.float32
                    and fused_reg_ok(target.shape[0], self._tree_level)):
                rot, t, q = run_gmmtree_reg_fused(
                    target, pi, mu, cov,
                    jnp.asarray(self._tf_result.rot, target.dtype),
                    jnp.asarray(self._tf_result.t, target.dtype),
                    max_level=self._tree_level,
                    lambda_c=float(self._lambda_c),
                    maxiter=int(maxiter), tol=float(tol))
            else:
                rot, t, q = _run_registration(
                    target, pi, mu, cov, self._tf_result.rot,
                    self._tf_result.t, max_level=self._tree_level,
                    lambda_c=float(self._lambda_c),
                    maxiter=int(maxiter), tol=float(tol))
            self._tf_result = tf.RigidTransformation(rot, t)
            return MstepResult(self._tf_result.inverse(), q)
        if callback_chunk > 1:
            from .utils import chunked

            prev = {"q": None}

            def chunk_fn(st, kk):
                return _registration_chunk(
                    target, pi, mu, cov, st[0], st[1],
                    max_level=self._tree_level,
                    lambda_c=float(self._lambda_c), k=kk)

            def handle(i, hist, j):
                rots, ts, qs = hist
                self._tf_result = tf.RigidTransformation(rots[j], ts[j])
                for c in self._callbacks:
                    c(self._tf_result.inverse())
                log.debug("Iteration: {}, Criteria: {}".format(i, qs[j]))
                stop = prev["q"] is not None \
                    and abs(float(qs[j]) - prev["q"]) < tol
                prev["q"] = float(qs[j])
                return stop, MstepResult(self._tf_result.inverse(), qs[j])

            out = chunked.run_chunked(
                chunk_fn,
                (jnp.asarray(self._tf_result.rot, target.dtype),
                 jnp.asarray(self._tf_result.t, target.dtype)),
                int(maxiter), int(callback_chunk), handle)
            if out is None:
                out = MstepResult(self._tf_result.inverse(), None)
            return out
        # Reference-parity host loop, run in the SAME shared-centroid
        # frame as the jitted runners (_run_registration) so both paths
        # follow one trajectory and stay accurate at large coordinate
        # offsets: nodes and target centered in, every emitted transform
        # converted back.
        pi, mu, cov = self._nodes
        cen = np.asarray(_tree_centroid(target, mu), np.float64)
        nodes_c = (pi, mu - jnp.asarray(cen, mu.dtype)[None, :], cov)
        target_c = target - jnp.asarray(cen, target.dtype)[None, :]
        rot0 = np.asarray(self._tf_result.rot, np.float64)
        tf_c = tf.RigidTransformation(
            rot0, np.asarray(self._tf_result.t, np.float64)
            + rot0 @ cen - cen)

        def to_raw(tr):
            r = np.asarray(tr.rot, np.float64)
            return tf.RigidTransformation(
                r, np.asarray(tr.t, np.float64) + cen - r @ cen)

        saved_nodes = self._nodes
        q = None
        res = MstepResult(tf_c, None)
        try:
            self._nodes = nodes_c
            for i in range(maxiter):
                t_target = res.transformation._transform(target_c)
                estep_res = self.expectation_step(t_target)
                res = self.maximization_step(estep_res, res.transformation)
                self._tf_result = to_raw(res.transformation)
                for c in self._callbacks:
                    c(self._tf_result.inverse())
                log.debug("Iteration: {}, Criteria: {}".format(i, res.q))
                if q is not None and abs(float(res.q) - float(q)) < tol:
                    break
                q = float(res.q)
        finally:
            self._nodes = saved_nodes
        return MstepResult(self._tf_result.inverse(), res.q)


def registration_gmmtree(
    source,
    target,
    maxiter: int = 20,
    tol: float = 1.0e-4,
    callbacks: List[Callable] = [],
    n_starts: int = 1,
    **kwargs: Any,
) -> MstepResult:
    """GMMTree registration — drop-in for reference gmmtree.py:99-129.

    Note the reference's convention (gmmtree.py:86-96): the EM transforms the
    *target* toward the source model and the returned transformation is the
    inverse, i.e. maps source to target.

    Args:
        source: Source point cloud (ndarray or open3d PointCloud).
        target: Target point cloud.
        maxiter: Maximum EM iterations.
        tol: Convergence tolerance on the residual q.
        callbacks: Called with the current (inverse) Transformation each
            iteration.

    Keyword Args:
        tree_level (int): Maximum depth of the GMM tree.
        lambda_c (float): Complexity threshold for the descent pruning.
        lambda_s (float): Build log-likelihood tolerance.
        tf_init_params (dict): Initializer for the rigid transformation.

    Returns:
        MstepResult: (transformation, q).
    """
    callback_chunk = int(kwargs.pop("callback_chunk", 1))
    gt = GMMTree(interop.as_points(source), **kwargs)
    gt.set_callbacks(callbacks)
    return gt.registration(interop.as_points(target), maxiter, tol,
                           n_starts=n_starts,
                           callback_chunk=callback_chunk)


@partial(jax.jit, static_argnames=("max_level", "lambda_s", "lambda_c",
                                   "maxiter", "tol"))
def _run_registration_batch(sources, targets, seed, *, max_level, lambda_s,
                            lambda_c, maxiter, tol):
    dim = sources.shape[-1]
    rot0 = jnp.eye(dim, dtype=sources.dtype)
    t0 = jnp.zeros((dim,), sources.dtype)
    # Key derivation INSIDE the program: eager PRNGKey/split would cost two
    # device round-trips per call (CLAUDE.md performance rules).
    keys = jax.random.split(jax.random.PRNGKey(seed), sources.shape[0])

    def run(src, tgt, key):
        pi, mu, cov = _build(src, key, max_level=max_level,
                             lambda_s=lambda_s, lambda_d=1.0e-4)
        return _run_registration(tgt, pi, mu, cov, rot0, t0,
                                 max_level=max_level, lambda_c=lambda_c,
                                 maxiter=maxiter, tol=tol)

    return jax.vmap(run)(sources, targets, keys)


@partial(jax.jit, static_argnames=("max_level", "lambda_s", "lambda_c",
                                   "maxiter", "tol"))
def _run_registration_batch_fused(sources, targets, seed, *, max_level,
                                  lambda_s, lambda_c, maxiter, tol):
    """Batched fused path: lax.map of (fused build + fused registration)
    per pair. The vmapped XLA batch runs every pair's build EM to the
    SLOWEST pair's iteration count and pays batched segment-sum scatters
    per iteration (~31 ms/pair at B=32 on v5e); sequential fused-kernel
    programs leave each pair's device time at ~1-2 ms (the v5e has one
    TensorCore, so batch elements are sequential either way — same
    trade as the ICP/CPD fused batch runners, ops/em_pallas)."""
    from .ops.gmmtree_pallas import run_gmmtree_reg_fused

    dim = sources.shape[-1]
    rot0 = jnp.eye(dim, dtype=sources.dtype)
    t0 = jnp.zeros((dim,), sources.dtype)
    keys = jax.random.split(jax.random.PRNGKey(seed), sources.shape[0])

    def run(args):
        src, tgt, key = args
        pi, mu, cov = _build(src, key, max_level=max_level,
                             lambda_s=lambda_s, lambda_d=1.0e-4,
                             fused=True)
        return run_gmmtree_reg_fused(
            tgt, pi, mu, cov, rot0, t0, max_level=max_level,
            lambda_c=lambda_c, maxiter=maxiter, tol=tol)

    return jax.lax.map(run, (sources, targets, keys))


@partial(jax.jit, static_argnames=("max_level", "lambda_s", "lambda_c",
                                   "maxiter", "tol"))
def _run_registration_ragged_batch_fused(sources, targets, smasks, tmasks,
                                         seed, *, max_level, lambda_s,
                                         lambda_c, maxiter, tol):
    """Ragged twin of _run_registration_batch_fused (masked fused build +
    masked fused registration per pair, lax.map)."""
    from .ops.gmmtree_pallas import run_gmmtree_reg_fused

    dim = sources.shape[-1]
    rot0 = jnp.eye(dim, dtype=sources.dtype)
    t0 = jnp.zeros((dim,), sources.dtype)
    keys = jax.random.split(jax.random.PRNGKey(seed), sources.shape[0])

    def run(args):
        src, tgt, sm, tm, key = args
        pi, mu, cov = _build(src, key, max_level=max_level,
                             lambda_s=lambda_s, lambda_d=1.0e-4,
                             smask=sm, fused=True)
        return run_gmmtree_reg_fused(
            tgt, pi, mu, cov, rot0, t0, tm, max_level=max_level,
            lambda_c=lambda_c, maxiter=maxiter, tol=tol)

    return jax.lax.map(run, (sources, targets, smasks, tmasks, keys))


@partial(jax.jit, static_argnames=("max_level", "lambda_s", "lambda_c",
                                   "maxiter", "tol"))
def _run_gmmtree_multistart_batch(sources, targets, rots0, seed, *,
                                  max_level, lambda_s, lambda_c, maxiter,
                                  tol):
    keys = jax.random.split(jax.random.PRNGKey(seed), sources.shape[0])

    def run(src, tgt, key):
        pi, mu, cov = _build(src, key, max_level=max_level,
                             lambda_s=lambda_s, lambda_d=1.0e-4)
        return _run_registration_multistart(
            tgt, pi, mu, cov, rots0, max_level=max_level,
            lambda_c=lambda_c, maxiter=maxiter, tol=tol)

    return jax.vmap(run)(sources, targets, keys)


@partial(jax.jit, static_argnames=("max_level", "lambda_s", "lambda_c",
                                   "maxiter", "tol"))
def _run_gmmtree_multistart_ragged_batch(sources, targets, smasks, tmasks,
                                         rots0, seed, *, max_level,
                                         lambda_s, lambda_c, maxiter, tol):
    keys = jax.random.split(jax.random.PRNGKey(seed), sources.shape[0])

    def run(src, tgt, sm, tm, key):
        pi, mu, cov = _build(src, key, max_level=max_level,
                             lambda_s=lambda_s, lambda_d=1.0e-4, smask=sm)
        return _run_registration_multistart(
            tgt, pi, mu, cov, rots0, max_level=max_level,
            lambda_c=lambda_c, maxiter=maxiter, tol=tol, tmask=tm)

    return jax.vmap(run)(sources, targets, smasks, tmasks, keys)


@partial(jax.jit, static_argnames=("max_level", "lambda_s", "lambda_c",
                                   "maxiter", "tol"))
def _run_registration_ragged_batch(sources, targets, smasks, tmasks, seed, *,
                                   max_level, lambda_s, lambda_c, maxiter,
                                   tol):
    dim = sources.shape[-1]
    rot0 = jnp.eye(dim, dtype=sources.dtype)
    t0 = jnp.zeros((dim,), sources.dtype)
    keys = jax.random.split(jax.random.PRNGKey(seed), sources.shape[0])

    def run(src, tgt, sm, tm, key):
        pi, mu, cov = _build(src, key, max_level=max_level,
                             lambda_s=lambda_s, lambda_d=1.0e-4, smask=sm)
        return _run_registration(tgt, pi, mu, cov, rot0, t0,
                                 max_level=max_level, lambda_c=lambda_c,
                                 maxiter=maxiter, tol=tol, tmask=tm)

    return jax.vmap(run)(sources, targets, smasks, tmasks, keys)


def registration_gmmtree_batch(
    sources,
    targets,
    maxiter: int = 20,
    tol: float = 1.0e-4,
    tree_level: int = 2,
    lambda_c: float = 0.01,
    lambda_s: float = 0.001,
    seed: int = 0,
    n_starts: int = 1,
) -> List[MstepResult]:
    """Register B cloud pairs with GMMTree in ONE compiled program.

    New capability vs the reference (single pair per call): ``sources``
    (B, M, D) and ``targets`` (B, N, D) build B trees and run B registration
    descents as a single vmapped program — one dispatch, B transformations.
    Same target-transform/inverse-return convention as
    :func:`registration_gmmtree`. See ``cpd.registration_cpd_batch``.

    Ragged batches: ``sources`` / ``targets`` may be Python lists of clouds
    with different point counts — zero-padded and run through a masked tree
    build + registration descent exactly equivalent to unpadded.

    Returns a list of ``MstepResult``.
    """
    ragged = isinstance(sources, (list, tuple)) \
        or isinstance(targets, (list, tuple))
    if n_starts > 1:
        if ragged:
            dt = _config.config.dtype
            src_p, smask = interop.pad_ragged(list(sources), dt)
            tgt_p, tmask = interop.pad_ragged(list(targets), dt)
            rots0 = jnp.asarray(_multistart_rots(int(n_starts),
                                                 int(src_p.shape[-1])))
            rot, t, q = _run_gmmtree_multistart_ragged_batch(
                jnp.asarray(src_p), jnp.asarray(tgt_p),
                jnp.asarray(smask), jnp.asarray(tmask), rots0,
                np.uint32(seed), max_level=int(tree_level),
                lambda_s=float(lambda_s), lambda_c=float(lambda_c),
                maxiter=int(maxiter), tol=float(tol))
            nb = src_p.shape[0]
        else:
            sources = jnp.asarray(
                interop.as_points(sources, dtype=_config.config.dtype))
            targets = jnp.asarray(
                interop.as_points(targets, dtype=_config.config.dtype))
            rots0 = jnp.asarray(_multistart_rots(int(n_starts),
                                                 int(sources.shape[-1])))
            rot, t, q = _run_gmmtree_multistart_batch(
                sources, targets, rots0, np.uint32(seed),
                max_level=int(tree_level), lambda_s=float(lambda_s),
                lambda_c=float(lambda_c), maxiter=int(maxiter),
                tol=float(tol))
            nb = sources.shape[0]
        return [
            MstepResult(tf.RigidTransformation(rot[b], t[b]).inverse(), q[b])
            for b in range(nb)
        ]
    if ragged:
        dt = _config.config.dtype
        src_p, smask = interop.pad_ragged(list(sources), dt)
        tgt_p, tmask = interop.pad_ragged(list(targets), dt)
        from .ops.gmmtree_pallas import fused_build_ok, fused_reg_ok

        if (jax.default_backend() == "tpu"
                and _config.config.use_fused_em
                and src_p.shape[-1] == 3
                and src_p.dtype == np.float32
                and fused_build_ok(src_p.shape[1], int(tree_level))
                and fused_reg_ok(tgt_p.shape[1], int(tree_level))):
            rot, t, q = _run_registration_ragged_batch_fused(
                jnp.asarray(src_p), jnp.asarray(tgt_p),
                jnp.asarray(smask), jnp.asarray(tmask), np.uint32(seed),
                max_level=int(tree_level), lambda_s=float(lambda_s),
                lambda_c=float(lambda_c), maxiter=int(maxiter),
                tol=float(tol))
        else:
            rot, t, q = _run_registration_ragged_batch(
                jnp.asarray(src_p), jnp.asarray(tgt_p),
                jnp.asarray(smask), jnp.asarray(tmask),
                np.uint32(seed),
                max_level=int(tree_level), lambda_s=float(lambda_s),
                lambda_c=float(lambda_c), maxiter=int(maxiter),
                tol=float(tol))
        return [
            MstepResult(tf.RigidTransformation(rot[b], t[b]).inverse(), q[b])
            for b in range(src_p.shape[0])
        ]
    sources = jnp.asarray(interop.as_points(sources, dtype=_config.config.dtype))
    targets = jnp.asarray(interop.as_points(targets, dtype=_config.config.dtype))
    from .ops.gmmtree_pallas import fused_build_ok, fused_reg_ok

    if (jax.default_backend() == "tpu"
            and _config.config.use_fused_em
            and sources.shape[-1] == 3
            and sources.dtype == jnp.float32
            and fused_build_ok(sources.shape[1], int(tree_level))
            and fused_reg_ok(targets.shape[1], int(tree_level))):
        rot, t, q = _run_registration_batch_fused(
            sources, targets, np.uint32(seed), max_level=int(tree_level),
            lambda_s=float(lambda_s), lambda_c=float(lambda_c),
            maxiter=int(maxiter), tol=float(tol))
    else:
        rot, t, q = _run_registration_batch(
            sources, targets, np.uint32(seed), max_level=int(tree_level),
            lambda_s=float(lambda_s), lambda_c=float(lambda_c),
            maxiter=int(maxiter), tol=float(tol))
    return [
        MstepResult(tf.RigidTransformation(rot[b], t[b]).inverse(), q[b])
        for b in range(sources.shape[0])
    ]
