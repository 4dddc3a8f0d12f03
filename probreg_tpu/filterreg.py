"""FilterReg: EM registration with Gaussian-filter E-step.

Parity with reference probreg/filterreg.py, redesigned TPU-first:

* E-step: the reference approximates the per-source moments
  M0/M1/M2/NX with a permutohedral lattice (filterreg.py:78-108). Here the
  DEFAULT is the *exact* dense Gauss transform, fused and streaming on the
  MXU (:func:`probreg_tpu.ops.gausstransform.filterreg_moments`) — on TPU the
  exact evaluation is both faster at probreg's point counts and removes the
  lattice's systematic ~0.7x magnitude bias. ``estep_method='lattice'``
  selects the JAX permutohedral lattice for behavioral parity
  (:mod:`probreg_tpu.ops.permutohedral`), including the reference's
  sparse-cloud no-blur switch (filterreg.py:90-91).
* M-steps: weighted Kabsch (2D/3D) and point-to-plane Gauss-Newton as pure
  jnp reductions (:mod:`probreg_tpu.ops.rigid_solvers`), branch-free so the
  whole EM runs in one ``lax.while_loop`` XLA program when no callbacks /
  feature functions force host round-trips.
* Deformable-kinematic variant uses the JAX dual-quaternion module instead
  of the optional ``dq3d`` package (reference filterreg.py:199-266).
"""

from __future__ import annotations

import abc
from collections import namedtuple
from functools import partial
from typing import Any, Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import config as _config
from .log import log
from .models import transformation as tf
from .ops import gausstransform as gto
from .ops import pairwise as _pw
from .ops import permutohedral as phops
from .ops import rigid_solvers
from .utils import dualquat as dq
from .utils import interop
from .utils import math_utils as mu
from .utils import se3_op as so

EstepResult = namedtuple("EstepResult", ["m0", "m1", "m2", "nx"])
MstepResult = namedtuple("MstepResult", ["transformation", "sigma2", "q"])
MstepResult.__doc__ = """Result of Maximization step.

    Attributes:
        transformation (tf.Transformation): Transformation from source to target.
        sigma2 (float): Variance of Gaussian distribution.
        q (float): Result of likelihood.
"""

_EPS = float(np.finfo(np.float32).eps)

# Module-level alias for parity with reference filterreg.py:38-42.
dualquat_from_twist = dq.from_twist


def _fused_dims_ok(m, n):
    # VMEM-shape gate for the single-launch whole-EM kernels: the
    # m*n bound alone is defeated by skewed shapes (ops/em_pallas.
    # fused_dims_ok — review finding).
    from .ops.em_pallas import fused_dims_ok

    return fused_dims_ok(m, n)


def _as_jnp(x):
    return jnp.asarray(interop.as_points(x, dtype=_config.config.dtype))


# --------------------------------------------------------------------------
# M-step math (pure jnp; reference filterreg.py:158-195)
# --------------------------------------------------------------------------

def rigid_mstep_pt2pt(t_source, m0, m1, m2, rot_p, t_p, sigma2, c):
    dim = t_source.shape[1]
    mask = (m0 > 0.0).astype(t_source.dtype)
    m0_safe = jnp.maximum(m0, _EPS)
    m1m0 = m1 / m0_safe[:, None]
    # Guard m0 + c: with w = 0 (c = 0) the culled/streaming E-steps yield
    # EXACT zeros for unsupported source rows — 0/0 would NaN the Kabsch
    # weights (mask * NaN is still NaN). Same guard as
    # _mstep_from_moments_t; the reference filters zero rows instead
    # (reference filterreg.py:166-170).
    m0m0 = m0 / jnp.maximum(m0 + c, _EPS)
    drxdx = mask * jnp.sqrt(m0m0 / sigma2)
    dr, dt = rigid_solvers.weighted_kabsch(t_source, m1m0, drxdx)
    rx = drxdx[:, None] * (t_source - m1m0)
    q = jnp.sum(jnp.linalg.norm(rx, axis=1))
    rot = dr @ rot_p
    t = t_p @ dr.T + dt
    sigma2_new = _sigma2_update(t_source, m0, m1, m2, m0m0, c, mask, sigma2)
    return rot, t, sigma2_new, q


def rigid_mstep_pt2pl(t_source, m0, m1, m2, nx, rot_p, t_p, sigma2, c):
    mask = (m0 > 0.0).astype(t_source.dtype)
    m0_safe = jnp.maximum(m0, _EPS)
    m1m0 = m1 / m0_safe[:, None]
    nxm0 = nx / m0_safe[:, None]
    m0m0 = m0 / jnp.maximum(m0 + c, _EPS)   # 0/0 guard, see pt2pt above
    drxdx = mask * jnp.sqrt(m0m0 / sigma2)
    tw, q = rigid_solvers.twist_for_pt2pl(t_source, m1m0, nxm0, drxdx)
    rot, t = so.twist_mul(tw, rot_p, t_p)
    sigma2_new = _sigma2_update(t_source, m0, m1, m2, m0m0, c, mask, sigma2)
    return rot, t, sigma2_new, q


def _sigma2_update(t_source, m0, m1, m2, m0m0, c, mask, sigma2_old):
    """Reference filterreg.py:190-195; no-op when m2 is None.

    Deviation: the reference hard-codes the divisor 3.0 even for 2-D clouds
    (filterreg.py:195); we divide by the actual dimensionality, consistently
    across the host, jitted and sharded paths.
    """
    if m2 is None:
        return sigma2_old
    dim = t_source.shape[1]
    num = m0 * jnp.sum(t_source * t_source, axis=1) \
        - 2.0 * jnp.sum(t_source * m1, axis=1) + m2
    s2 = jnp.sum(mask * num / jnp.maximum(m0 + c, _EPS))
    s2 = s2 / (dim * jnp.maximum(jnp.sum(mask * m0m0), _EPS))
    return s2


def _outlier_c(sigma2, w, m, n, dim):
    """FilterReg outlier constant (filterreg.py:163)."""
    return w / (1.0 - w) * n / m * (2.0 * sigma2 * jnp.pi) ** (dim / 2.0)


# --------------------------------------------------------------------------
# Whole-EM jitted runner (dense E-step, identity features)
# --------------------------------------------------------------------------
#
# Transposed (D, M) layout throughout — see the layout note in cpd.py: any
# op touching an (M, 3) array inside the loop costs ~0.25 ms of relayout on
# TPU. All E-step moments come from ONE (C, N) x (M, N)^T matmul where the
# channel matrix stacks [ones; x; |x|^2; normals].

def _kabsch_t(model_t, target_t, w):
    """weighted_kabsch in (D, M) layout (kabsch.cc:6-56 semantics)."""
    dim = model_t.shape[0]
    total = jnp.sum(w)
    safe = jnp.where(total == 0.0, 1.0, total)
    mc = model_t @ w / safe
    tc = target_t @ w / safe
    w2 = w * w
    hh = jax.lax.dot_general(
        (model_t - mc[:, None]) * w2[None, :], target_t - tc[:, None],
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    h_weight = jnp.sum(w2)
    hh = hh / jnp.where(h_weight == 0.0, 1.0, h_weight)
    if dim == 2:
        angle = jnp.arctan2(hh[0, 1] - hh[1, 0], hh[0, 0] + hh[1, 1])
        ca, sa = jnp.cos(angle), jnp.sin(angle)
        r = jnp.array([[ca, -sa], [sa, ca]])
    else:
        u, _, vh = jnp.linalg.svd(hh)
        s = jnp.ones(dim, hh.dtype).at[-1].set(jnp.linalg.det(u @ vh.T))
        r = (vh.T * s) @ u.T
    t = tc - r @ mc
    eye = jnp.eye(dim, dtype=model_t.dtype)
    r = jnp.where(total == 0.0, eye, r)
    t = jnp.where(total == 0.0, jnp.zeros_like(t), t)
    return r, t


def _pt2pl_t(model_t, target_t, normal_t, w):
    """twist_for_pt2pl in (D, M) layout (point_to_plane.cc:6-32)."""
    resid = jnp.sum(normal_t * (target_t - model_t), axis=0)   # (M,)
    # cross(model, normal) column-wise
    cx = model_t[1] * normal_t[2] - model_t[2] * normal_t[1]
    cy = model_t[2] * normal_t[0] - model_t[0] * normal_t[2]
    cz = model_t[0] * normal_t[1] - model_t[1] * normal_t[0]
    jac = jnp.stack([cx, cy, cz, normal_t[0], normal_t[1], normal_t[2]])
    ata = jax.lax.dot_general(
        jac * w[None, :], jac, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)                   # (6, 6)
    atb = jac @ (w * resid)
    r_sum = jnp.sum(w * w * resid * resid)
    degenerate = jnp.max(jnp.abs(ata)) == 0.0
    safe_ata = jnp.where(degenerate, jnp.eye(6, dtype=ata.dtype), ata)
    tw = jnp.linalg.lstsq(safe_ata, atb, rcond=1e-6)[0]
    tw = jnp.where(degenerate, jnp.zeros_like(tw), tw)
    wn = jnp.linalg.norm(tw[:3])
    tw = tw * jnp.minimum(1.0, 0.5 / jnp.maximum(wn, 1e-12))
    return tw, r_sum


def _mstep_from_moments_t(t_src, m0, m1_t, m2, nx_t, rot, t, sigma2, w, m, n,
                          dim, objective_type):
    """Rigid FilterReg M-step from transposed E-step moments.

    ``t_src``/``m1_t``/``nx_t`` are (D, M); shared by the dense, streaming
    and lattice whole-EM runners (reference filterreg.py:149-196). Returns
    ``(rot, t, sigma2_or_new, q)``; sigma2 is re-estimated iff ``m2`` is
    given.
    """
    c = _outlier_c(sigma2, w, m, n, dim)
    mask = (m0 > 0.0).astype(t_src.dtype)
    m0_safe = jnp.maximum(m0, _EPS)
    m1m0_t = m1_t / m0_safe[None, :]
    # Guard m0 + c: with w = 0 (c = 0) the sparse LATTICE E-step yields
    # exact zeros for unsupported source points — 0/0 would NaN-poison the
    # Kabsch weights (cf. the same guard in parallel/sharded2d.py).
    m0m0 = m0 / jnp.maximum(m0 + c, _EPS)
    drxdx = mask * jnp.sqrt(m0m0 / sigma2)
    if objective_type == "pt2pt":
        dr, dt = _kabsch_t(t_src, m1m0_t, drxdx)
        rx2 = jnp.sum((drxdx[None, :] * (t_src - m1m0_t)) ** 2, axis=0)
        q = jnp.sum(jnp.sqrt(rx2))
        rot_n, t_n = dr @ rot, dr @ t + dt
    else:
        nxm0_t = nx_t / m0_safe[None, :]
        tw, q = _pt2pl_t(t_src, m1m0_t, nxm0_t, drxdx)
        rot_n, t_n = so.twist_mul(tw, rot, t)
    if m2 is None:
        return rot_n, t_n, sigma2, q
    num = m0 * jnp.sum(t_src * t_src, axis=0) \
        - 2.0 * jnp.sum(t_src * m1_t, axis=0) + m2
    s2 = jnp.sum(mask * num / jnp.maximum(m0 + c, _EPS))
    s2 = s2 / (dim * jnp.maximum(jnp.sum(mask * m0m0), _EPS))
    return rot_n, t_n, s2, q


@partial(jax.jit, static_argnames=("objective_type", "update_sigma2", "w",
                                   "min_sigma2",
                                   "sigma2_decay", "auto_sigma2", "chunk_k"))
def _run_em_rigid(source, target, normals, rot0, t0, sigma2_0, *,
                  objective_type, update_sigma2, w, maxiter, tol, min_sigma2,
                  sigma2_decay=1.0, auto_sigma2=False, smask=None,
                  tmask=None, chunk_k=None):
    """``smask``/``tmask``: optional (M,)/(N,) validity masks for ragged-
    batch padding. Padded rows/columns are zeroed out of the kernel matrix
    (so M0/M1/M2/NX carry no padded mass; the Kabsch/pt2pl weights already
    vanish where M0 = 0) and the outlier constant / auto-sigma2 use the
    true counts — exactly the unpadded registration.

    ``chunk_k``: when set, run exactly K scanned iterations and return
    ``((rot, t, sigma2) carry, stacked per-iteration (rot, t, sigma2, q))``
    instead of the converged while_loop result — the chunked callback mode
    (utils/chunked.py); maxiter/tol are ignored."""
    m, dim = source.shape
    n = target.shape[0]
    masked = smask is not None
    ys_t = source.T                                            # (D, M)
    xs_t = target.T                                            # (D, N)
    # Shared-centroid centering (translation-invariant EM): the
    # expanded-form f32 sqdist loses ~|x|^2 * eps to cancellation —
    # catastrophic at UTM/mm-scale coordinates (see cpd._run_em_t).
    # rot0/t0 convert in; every emitted transform converts back.
    if masked:
        cen = ((ys_t @ smask + xs_t @ tmask)
               / jnp.maximum(jnp.sum(smask) + jnp.sum(tmask), 1.0))
    else:
        cen = ((jnp.sum(ys_t, axis=1) + jnp.sum(xs_t, axis=1))
               / (m + n))
    ys_t = ys_t - cen[:, None]
    xs_t = xs_t - cen[:, None]
    t0 = t0 + rot0 @ cen - cen
    x2 = jnp.sum(xs_t * xs_t, axis=0, keepdims=True)           # (1, N)
    nrm_t = None if normals is None else normals.T
    if masked:
        m = jnp.sum(smask)
        n = jnp.sum(tmask)
        kmask = smask[:, None] * tmask[None, :]                # (M, N)

    chans = [jnp.ones((1, xs_t.shape[1]), xs_t.dtype), xs_t]
    if update_sigma2:
        chans.append(x2)
    if objective_type == "pt2pl":
        chans.append(nrm_t)
    v_t = jnp.concatenate(chans, axis=0)                       # (C, N)

    if auto_sigma2:
        if objective_type == "pt2pl":
            # Point-spacing scale (see registration()): mean nonzero-NN
            # d^2, streamed in O(N * block) memory (ops/pairwise). A
            # dense (N, N) self-distance matrix here is bounded only by
            # the M*N fast-path gate and could dwarf the (M, N) kernel
            # that gate was sized for (small source, huge target).
            tgt_c = xs_t.T                  # centered target (N, D)
            if masked:
                nn2 = _pw.nearest_sqdist(tgt_c, tgt_c, exclude_zero=True,
                                         target_valid=tmask)
                nn2 = jnp.where(jnp.isfinite(nn2), nn2, 0.0) * tmask
                sigma2_0 = jnp.maximum(jnp.sum(nn2) / n, min_sigma2 * 0.01)
            else:
                sigma2_0 = jnp.maximum(_pw.point_spacing_sq(tgt_c),
                                       min_sigma2 * 0.01)
        elif masked:
            sigma2_0 = jnp.maximum(
                mu.masked_squared_kernel_sum_t(ys_t, xs_t, smask, tmask),
                min_sigma2)
        else:
            sy = jnp.sum(ys_t, axis=1)
            sx = jnp.sum(xs_t, axis=1)
            sigma2_0 = jnp.maximum(
                (n * jnp.sum(ys_t * ys_t) + m * jnp.sum(xs_t * xs_t)
                 - 2.0 * sy @ sx) / (m * dim * n), min_sigma2)

    def step(rot, t, sigma2):
        t_src = rot @ ys_t + t[:, None]                        # (D, M)
        inv2s2 = 0.5 / sigma2
        y2 = jnp.sum(t_src * t_src, axis=0)[:, None]           # (M, 1)
        xy = jax.lax.dot_general(
            t_src, xs_t, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)               # (M, N)
        k = jnp.exp(-jnp.maximum(y2 + x2 - 2.0 * xy, 0.0) * inv2s2)
        if masked:
            k = k * kmask
        mom = jax.lax.dot_general(
            v_t, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)               # (C, M)
        m0 = mom[0]
        m1_t = mom[1:1 + dim]
        col = 1 + dim
        m2 = None
        if update_sigma2:
            m2 = mom[col]
            col += 1
        nx_t = mom[col:col + dim] if objective_type == "pt2pl" else None

        return _mstep_from_moments_t(
            t_src, m0, m1_t, m2, nx_t, rot, t, sigma2, w, m, n, dim,
            objective_type)

    if chunk_k is not None:
        def sbody(carry, _):
            rot, t, sigma2 = carry
            rot_n, t_n, s2, q_new = step(rot, t, sigma2)
            if not update_sigma2:
                s2 = sigma2 * sigma2_decay
            s2 = jnp.maximum(s2, min_sigma2)
            # History in the RAW frame (callback consumers); carry stays
            # centered.
            t_raw = t_n + cen - rot_n @ cen
            return (rot_n, t_n, s2), (rot_n, t_raw, s2, q_new)

        (rot_c, t_c, s2_c), hist = jax.lax.scan(
            sbody, (rot0, t0, sigma2_0), None, length=chunk_k)
        return (rot_c, t_c + cen - rot_c @ cen, s2_c), hist

    def cond(state):
        _, _, _, q, q_prev, i = state
        return jnp.logical_and(
            i < maxiter,
            jnp.logical_or(i == 0, jnp.abs(q - q_prev) >= tol),
        )

    def body(state):
        rot, t, sigma2, q, _, i = state
        rot, t, s2, q_new = step(rot, t, sigma2)
        if not update_sigma2:
            s2 = sigma2 * sigma2_decay
        s2 = jnp.maximum(s2, min_sigma2)
        return (rot, t, s2, q_new, q, i + 1)

    state = (rot0, t0, sigma2_0,
             jnp.asarray(jnp.inf, source.dtype),
             jnp.asarray(jnp.inf, source.dtype), jnp.asarray(0))
    rot, t, sigma2, q, _, _ = jax.lax.while_loop(cond, body, state)
    t = t + cen - rot @ cen                     # centered -> raw frame
    return MstepResult(tf.RigidTransformation(rot, t), sigma2, q)


@partial(jax.jit, static_argnames=("objective_type", "update_sigma2", "w",
                                   "min_sigma2", "sigma2_decay",
                                   "auto_sigma2"))
def _run_em_rigid_streaming(source, target, normals, rot0, t0, sigma2_0, *,
                            objective_type, update_sigma2, w, maxiter, tol,
                            min_sigma2, sigma2_decay=1.0, auto_sigma2=False):
    """Whole-EM rigid FilterReg for LARGE clouds: one jitted while_loop
    whose E-step streams through gto.filterreg_moments (which routes to the
    tile-culled Gauss-transform kernel on TPU) — never materializing the
    (M, N) kernel matrix that caps _run_em_rigid at
    config.transposed_em_max_pairs. Row-major layout: the per-iteration
    (M, 3) relayout cost (~0.25 ms) is noise against a >= 100 ms E-step at
    the sizes this path serves.
    """
    from .ops import gausstransform as gto
    from .ops import pairwise as _pw
    from .ops.spatial import morton_order

    m, dim = source.shape
    n = target.shape[0]
    # Morton-sort ONCE (outside the while_loop): the tile-culled Gauss
    # transform needs spatially compact tiles, and a per-iteration TPU
    # argsort (~0.3 s at 200k keys) would swamp the E-step. The rigid
    # M-step consumes only order-invariant reductions of the per-row
    # moments, so nothing needs unsorting.
    source = source[morton_order(source)]
    perm_t = morton_order(target)
    target = target[perm_t]
    if normals is not None:
        normals = normals[perm_t]
    if auto_sigma2:
        if objective_type == "pt2pl":
            sigma2_0 = jnp.maximum(
                _pw.point_spacing_sq(target), min_sigma2 * 0.01)
        else:
            sigma2_0 = jnp.maximum(
                mu.squared_kernel_sum(source, target), min_sigma2)

    def step(rot, t, sigma2):
        t_src = source @ rot.T + t
        sigma = jnp.sqrt(sigma2)
        m0, m1, m2, nx = gto.filterreg_moments(
            t_src / sigma, target / sigma, target,
            normals if objective_type == "pt2pl" else None,
            need_m2=bool(update_sigma2), assume_sorted=True)
        c = _outlier_c(sigma2, w, m, n, dim)
        if objective_type == "pt2pt":
            return rigid_mstep_pt2pt(t_src, m0, m1, m2, rot, t, sigma2, c)
        return rigid_mstep_pt2pl(t_src, m0, m1, m2, nx, rot, t, sigma2, c)

    def cond(state):
        _, _, _, q, q_prev, i = state
        return jnp.logical_and(
            i < maxiter,
            jnp.logical_or(i == 0, jnp.abs(q - q_prev) >= tol))

    def body(state):
        rot, t, sigma2, q, _, i = state
        rot, t, s2, q_new = step(rot, t, sigma2)
        if not update_sigma2:
            s2 = sigma2 * sigma2_decay
        s2 = jnp.maximum(s2, min_sigma2)
        return (rot, t, s2, q_new, q, i + 1)

    state = (jnp.asarray(rot0, source.dtype),
             jnp.asarray(t0, source.dtype),
             jnp.asarray(sigma2_0, source.dtype),
             jnp.asarray(jnp.inf, source.dtype),
             jnp.asarray(jnp.inf, source.dtype), jnp.asarray(0))
    rot, t, sigma2, q, _, _ = jax.lax.while_loop(cond, body, state)
    return MstepResult(tf.RigidTransformation(rot, t), sigma2, q)


# --------------------------------------------------------------------------
# OO surface (drop-in for the reference classes)
# --------------------------------------------------------------------------

class FilterReg(abc.ABC):
    """Abstract FilterReg (reference filterreg.py:46-147).

    Args:
        source: Source point cloud.
        target_normals: Normals of target points (pt2pl objective).
        sigma2: Fixed variance; None = estimated and optionally updated.
        update_sigma2: Update sigma2 in the M-step.
        estep_method: 'dense' (exact, default) or 'lattice' (permutohedral).
    """

    def __init__(self, source=None, target_normals=None, sigma2=None,
                 update_sigma2: bool = False, estep_method: str = "dense",
                 use_pallas: Optional[bool] = None):
        self._source = None if source is None else _as_jnp(source)
        self._target_normals = (
            None if target_normals is None
            else jnp.asarray(interop.as_normals(target_normals, _config.config.dtype))
        )
        self._sigma2 = sigma2
        self._update_sigma2 = update_sigma2
        self._estep_method = estep_method
        # None: config default; False pins the XLA path (cf. RigidCPD).
        self._use_pallas = use_pallas
        self._tf_type = None
        self._tf_result = None
        self._callbacks: List[Callable] = []

    def set_source(self, source):
        self._source = _as_jnp(source)

    def set_target_normals(self, target_normals):
        self._target_normals = jnp.asarray(
            interop.as_normals(target_normals, _config.config.dtype))

    def set_callbacks(self, callbacks):
        self._callbacks = callbacks

    def expectation_step(self, t_source, target, y, sigma2,
                         update_sigma2=False, objective_type: str = "pt2pt",
                         alpha: float = 0.015) -> EstepResult:
        """E-step moments (reference filterreg.py:78-108).

        ``t_source`` / ``target`` are (already feature-mapped) positions; the
        filtering happens in that feature space scaled by 1/sigma. ``y`` are
        the raw target points whose moments are accumulated.
        """
        t_source = jnp.asarray(t_source)
        target = jnp.asarray(target)
        y = jnp.asarray(y)
        m = t_source.shape[0]
        n = target.shape[0]
        sigma = jnp.sqrt(jnp.asarray(sigma2))
        need_nx = objective_type == "pt2pl"
        if need_nx and self._target_normals is None:
            raise ValueError("pt2pl requires target_normals.")

        if self._estep_method == "dense":
            m0, m1, m2, nx = gto.filterreg_moments(
                t_source / sigma, target / sigma, y,
                self._target_normals if need_nx else None,
                need_m2=bool(update_sigma2),
            )
            return EstepResult(m0, m1, m2, nx)

        # Lattice path (reference-shaped): splat target rows, slice source.
        fin = jnp.concatenate([t_source / sigma, target / sigma], axis=0)
        lat = phops.build(fin, with_blur=True)
        with_blur = True
        if int(lat.size) > n * alpha:
            lat = phops.build(fin, with_blur=False)
            with_blur = False
        chans = [jnp.ones((n, 1), y.dtype), y]
        if update_sigma2:
            chans.append(jnp.sum(y * y, axis=1, keepdims=True))
        if need_nx:
            chans.append(self._target_normals)
        vin = jnp.concatenate(
            [jnp.zeros((m, sum(c.shape[1] for c in chans)), y.dtype),
             jnp.concatenate(chans, axis=1)], axis=0)
        out = phops.filter(lat, vin, start=m, with_blur=with_blur)[:m]
        dim = y.shape[1]
        m0 = out[:, 0]
        m1 = out[:, 1:1 + dim]
        col = 1 + dim
        m2 = None
        if update_sigma2:
            m2 = out[:, col]
            col += 1
        nx = out[:, col:col + dim] if need_nx else None
        return EstepResult(m0, m1, m2, nx)

    def maximization_step(self, t_source, target, estep_res, w=0.0,
                          objective_type: str = "pt2pt") -> MstepResult:
        return self._maximization_step(
            t_source, target, estep_res, self._tf_result, self._sigma2, w,
            objective_type=objective_type)

    @staticmethod
    @abc.abstractmethod
    def _maximization_step(t_source, target, estep_res, trans_p, sigma2,
                           w=0.0, objective_type="pt2pt"):
        ...

    def registration(self, target, w: float = 0.0,
                     objective_type: str = "pt2pt", maxiter: int = 50,
                     tol: float = 0.001, min_sigma2: float = 1.0e-4,
                     feature_fn: Callable = lambda x: x,
                     sigma2_decay: float = 1.0,
                     n_starts: int = 1,
                     callback_chunk: int = 1) -> MstepResult:
        """``callback_chunk``: EM iterations per device dispatch in callback
        mode (rigid dense identity-feature path only; callbacks still fire
        per iteration — utils/chunked.py)."""
        assert self._tf_type is not None, "transformation type is None."
        target = _as_jnp(target)
        if n_starts > 1:
            if (not isinstance(self, RigidFilterReg) or self._callbacks
                    or self._estep_method != "dense"
                    or not _is_identity_feature(feature_fn)):
                raise ValueError("n_starts > 1 requires the rigid dense "
                                 "no-callback path")
            if (self._source.shape[0] * target.shape[0]
                    > _config.config.transposed_em_max_pairs):
                # The multistart vmaps n_starts copies of the dense
                # (M, N)-kernel EM into ONE program — a size the
                # single-start path refuses and streams instead; reaching
                # the device would OOM/fault it (cf. the same guard in
                # cpd.RigidCPD._registration_fast).
                raise ValueError(
                    "n_starts > 1 FilterReg materializes n_starts dense "
                    f"(M, N) kernels; M*N = {self._source.shape[0]}*"
                    f"{target.shape[0]} exceeds "
                    "config.transposed_em_max_pairs. Run the orientation "
                    "search on a downsampled cloud "
                    "(pyramid.registration_filterreg_pyramid(n_starts=)) "
                    "and warm-start the full size with tf_init_params.")
            normals = self._target_normals \
                if objective_type == "pt2pl" else None
            if objective_type == "pt2pl" and normals is None:
                raise ValueError("pt2pl requires target_normals.")
            auto = self._sigma2 is None
            res = _run_em_rigid_multistart_jit(
                self._source, target, normals,
                jnp.asarray(_multistart_rots(
                    int(n_starts), int(self._source.shape[1]))),
                np.float32(0.0 if auto else self._sigma2),
                objective_type=objective_type,
                update_sigma2=self._update_sigma2,
                w=float(w), maxiter=int(maxiter), tol=float(tol),
                min_sigma2=float(min_sigma2),
                sigma2_decay=float(sigma2_decay), auto_sigma2=auto)
            self._tf_result = res.transformation
            self._sigma2 = float(res.sigma2)
            return res

        fast = (
            isinstance(self, RigidFilterReg)
            and not self._callbacks
            and self._estep_method == "dense"
            and _is_identity_feature(feature_fn)
            # _run_em_rigid materializes the (M, N) kernel matrix; beyond
            # this the host loop's streaming gto.filterreg_moments is used.
            and self._source.shape[0] * target.shape[0]
            <= _config.config.transposed_em_max_pairs
        )
        if fast:
            normals = self._target_normals if objective_type == "pt2pl" else None
            if objective_type == "pt2pl" and normals is None:
                raise ValueError("pt2pl requires target_normals.")
            auto = self._sigma2 is None
            m, n = self._source.shape[0], target.shape[0]
            identity_init = bool(
                np.allclose(np.asarray(self._tf_result.rot), np.eye(3))
                and np.allclose(np.asarray(self._tf_result.t), 0.0)
            ) if self._source.shape[1] == 3 else False
            if (identity_init
                    and _config.config.use_fused_em
                    and self._use_pallas is not False
                    and m * n <= _config.config.fused_em_max_pairs
                    and _fused_dims_ok(m, n)
                    and jax.default_backend() == "tpu"):
                from .ops import em_pallas

                rot, t, s2, q = em_pallas.run_em_filterreg_fused(
                    self._source, target, normals,
                    sigma2_0=0.0 if auto else float(self._sigma2),
                    w=float(w), maxiter=int(maxiter), tol=float(tol),
                    update_sigma2=bool(self._update_sigma2),
                    sigma2_decay=float(sigma2_decay),
                    min_sigma2=float(min_sigma2), auto_sigma2=auto,
                    objective=objective_type)
                res = MstepResult(tf.RigidTransformation(rot, t), s2, q)
                self._tf_result = res.transformation
                self._sigma2 = float(res.sigma2)
                return res
            dt = _config.config.dtype
            res = _run_em_rigid(
                self._source, target, normals,
                np.asarray(self._tf_result.rot, dt),
                np.asarray(self._tf_result.t, dt),
                np.asarray(0.0 if auto else self._sigma2, dt),
                objective_type=objective_type,
                update_sigma2=self._update_sigma2,
                w=float(w), maxiter=int(maxiter), tol=float(tol),
                min_sigma2=float(min_sigma2),
                sigma2_decay=float(sigma2_decay),
                auto_sigma2=auto,
            )
            self._tf_result = res.transformation
            self._sigma2 = float(res.sigma2)
            return res

        if (callback_chunk > 1 and self._callbacks
                and isinstance(self, RigidFilterReg)
                and self._estep_method == "dense"
                and _is_identity_feature(feature_fn)
                and self._source.shape[0] * target.shape[0]
                <= _config.config.transposed_em_max_pairs):
            return self._registration_chunked(
                target, w, objective_type, maxiter, tol, min_sigma2,
                sigma2_decay, int(callback_chunk))

        streaming = (
            isinstance(self, RigidFilterReg)
            and not self._callbacks
            and self._estep_method == "dense"
            and _is_identity_feature(feature_fn)
            # Only the large regime _run_em_rigid cannot serve: the
            # streaming runner never materializes the (M, N) kernel, and
            # on TPU its moments route to the tile-culled Gauss transform.
            and self._source.shape[0] * target.shape[0]
            > _config.config.transposed_em_max_pairs
        )
        if streaming:
            normals = self._target_normals if objective_type == "pt2pl" \
                else None
            if objective_type == "pt2pl" and normals is None:
                raise ValueError("pt2pl requires target_normals.")
            auto = self._sigma2 is None
            res = _run_em_rigid_streaming(
                self._source, target, normals,
                np.asarray(self._tf_result.rot, np.float32),
                np.asarray(self._tf_result.t, np.float32),
                np.float32(0.0 if auto else self._sigma2),
                objective_type=objective_type,
                update_sigma2=self._update_sigma2, w=float(w),
                maxiter=int(maxiter), tol=float(tol),
                min_sigma2=float(min_sigma2),
                sigma2_decay=float(sigma2_decay), auto_sigma2=auto)
            self._tf_result = res.transformation
            self._sigma2 = float(res.sigma2)
            return res

        if (isinstance(self, DeformableKinematicFilterReg)
                and not self._callbacks
                and self._estep_method == "dense"
                and _is_identity_feature(feature_fn)):
            # Whole-EM runner: one dispatch per registration (round-3; the
            # host loop costs one ~33 ms RTT per EM iteration on remote TPU).
            auto = self._sigma2 is None
            pair = jnp.asarray(self._skinning_weight.pair)
            val = jnp.asarray(self._skinning_weight.val,
                              _config.config.dtype)
            dqs, s2, q = _run_em_deformable(
                self._source, target,
                jnp.asarray(self._tf_result.dualquats), pair, val,
                np.float32(0.0 if auto else self._sigma2),
                update_sigma2=bool(self._update_sigma2), w=float(w),
                maxiter=int(maxiter), tol=float(tol),
                min_sigma2=float(min_sigma2),
                sigma2_decay=float(sigma2_decay), auto_sigma2=auto)
            res = MstepResult(
                tf.DeformableKinematicModel(dqs, self._skinning_weight),
                s2, q)
            self._tf_result = res.transformation
            self._sigma2 = float(s2)
            return res

        if (isinstance(self, RigidFilterReg)
                and not self._callbacks
                and self._estep_method == "lattice"
                and _is_identity_feature(feature_fn)):
            # Lattice whole-EM runner: the permutohedral build/filter are
            # pure JAX (ops/permutohedral.py), so the parity-mode E-step
            # traces into ONE dispatch per registration instead of one
            # ~33 ms tunnel RTT per EM iteration.
            normals = self._target_normals \
                if objective_type == "pt2pl" else None
            if objective_type == "pt2pl" and normals is None:
                raise ValueError("pt2pl requires target_normals.")
            auto = self._sigma2 is None
            res = _run_em_rigid_lattice(
                self._source, target, normals,
                jnp.asarray(self._tf_result.rot, self._source.dtype),
                jnp.asarray(self._tf_result.t, self._source.dtype),
                np.float32(0.0 if auto else self._sigma2),
                objective_type=objective_type,
                update_sigma2=bool(self._update_sigma2), w=float(w),
                maxiter=int(maxiter), tol=float(tol),
                min_sigma2=float(min_sigma2),
                sigma2_decay=float(sigma2_decay), auto_sigma2=auto)
            self._tf_result = res.transformation
            self._sigma2 = float(res.sigma2)
            return res

        ftarget_precomputed = None
        if (isinstance(self, RigidFilterReg)
                and not self._callbacks
                and self._estep_method == "dense"
                and not _is_identity_feature(feature_fn)):
            # Feature-mode whole-EM runner: the feature map is traced into
            # the loop (one dispatch per registration). Feature fns outside
            # JAX (numpy/sklearn/open3d) fail tracing and fall back to the
            # host loop below.
            normals = self._target_normals \
                if objective_type == "pt2pl" else None
            if objective_type == "pt2pl" and normals is None:
                raise ValueError("pt2pl requires target_normals.")
            auto = self._sigma2 is None
            try:
                ftarget_j = jnp.asarray(feature_fn(target))
                ftarget_precomputed = ftarget_j
                rot, t, s2, q = _run_em_rigid_feature(
                    self._source, target, normals, ftarget_j,
                    jnp.asarray(self._tf_result.rot, self._source.dtype),
                    jnp.asarray(self._tf_result.t, self._source.dtype),
                    np.float32(0.0 if auto else self._sigma2),
                    feature_fn=feature_fn, objective_type=objective_type,
                    update_sigma2=bool(self._update_sigma2), w=float(w),
                    maxiter=int(maxiter), tol=float(tol),
                    min_sigma2=float(min_sigma2),
                    sigma2_decay=float(sigma2_decay), auto_sigma2=auto)
            except (TypeError, jax.errors.UnexpectedTracerError,
                    jax.errors.TracerArrayConversionError,
                    jax.errors.ConcretizationTypeError) as e:
                log.info("feature_fn not traceable (%r); falling back to "
                         "the per-iteration host loop", e)
            else:
                res = MstepResult(tf.RigidTransformation(rot, t), s2, q)
                self._tf_result = res.transformation
                self._sigma2 = float(s2)
                return res

        # Reuse the target features already computed by the traced-runner
        # attempt above (feature_fn(target) succeeded eagerly even when
        # tracing the per-iteration source features failed) — FPFH-class
        # features on a large cloud are too expensive to compute twice.
        ftarget = ftarget_precomputed
        if ftarget is None:
            ftarget = feature_fn(target)
        if self._sigma2 is None:
            if objective_type == "pt2pl":
                # The reference initializes sigma2 at cloud-size scale
                # (squared_kernel_sum), which makes pt2pl diverge: the
                # heavily smoothed virtual targets sit inward of the surface
                # and the along-normal bias swamps the alignment signal (its
                # own pt2pl test is skipped; its example hand-tunes
                # sigma2=0.01). Point-spacing scale converges robustly.
                from .ops import pairwise as _pw

                self._sigma2 = float(jnp.maximum(
                    _pw.point_spacing_sq(target), min_sigma2 * 0.01))
            else:
                fsource = feature_fn(self._source)
                self._sigma2 = float(jnp.maximum(
                    mu.squared_kernel_sum(fsource, ftarget), min_sigma2))

        # Host loop (callbacks / feature functions / lattice parity).
        return self._registration_host_loop(
            target, ftarget, w, objective_type, maxiter, tol, min_sigma2,
            sigma2_decay, feature_fn)

    def _registration_chunked(self, target, w, objective_type, maxiter, tol,
                              min_sigma2, sigma2_decay, chunk):
        """Callback loop at one dispatch per ``chunk`` EM iterations via the
        scanned _run_em_rigid(chunk_k=...) program; per-iteration callback
        and convergence semantics match the eager host loop."""
        from .utils import chunked

        normals = self._target_normals if objective_type == "pt2pl" else None
        if objective_type == "pt2pl" and normals is None:
            raise ValueError("pt2pl requires target_normals.")
        if self._sigma2 is None:
            # Resolve the start temperature ONCE, outside the scanned
            # program: toggling the STATIC auto_sigma2 arg between the
            # first and later chunks compiled the K-step EM program twice
            # per registration (review finding; a degraded-tunnel compile
            # costs minutes, CLAUDE.md). Same formulas as _run_em_rigid's
            # auto branch.
            if objective_type == "pt2pl":
                s20 = np.float32(jnp.maximum(
                    _pw.point_spacing_sq(target), min_sigma2 * 0.01))
            else:
                s20 = np.float32(jnp.maximum(
                    mu.squared_kernel_sum(self._source, target),
                    min_sigma2))
        else:
            s20 = np.float32(self._sigma2)
        flags = {"q": None}
        rot0 = jnp.asarray(self._tf_result.rot, self._source.dtype)
        t0 = jnp.asarray(self._tf_result.t, self._source.dtype)

        def chunk_fn(st, kk):
            return _run_em_rigid(
                self._source, target, normals, st[0], st[1], st[2],
                objective_type=objective_type,
                update_sigma2=self._update_sigma2, w=float(w),
                maxiter=0, tol=0.0, min_sigma2=float(min_sigma2),
                sigma2_decay=float(sigma2_decay),
                auto_sigma2=False, chunk_k=kk)

        def handle(i, hist, j):
            rots, ts, s2s, qs = hist
            self._tf_result = tf.RigidTransformation(rots[j], ts[j])
            self._sigma2 = float(s2s[j])
            for c in self._callbacks:
                c(self._tf_result)
            log.debug("Iteration: {}, Criteria: {}".format(i, qs[j]))
            stop = flags["q"] is not None \
                and abs(float(qs[j]) - flags["q"]) < tol
            flags["q"] = float(qs[j])
            return stop, MstepResult(self._tf_result, s2s[j], qs[j])

        out = chunked.run_chunked(chunk_fn, (rot0, t0, s20), int(maxiter),
                                  int(chunk), handle)
        if out is None:
            out = MstepResult(self._tf_result, self._sigma2, None)
        return out

    def _registration_host_loop(self, target, ftarget, w, objective_type,
                                maxiter, tol, min_sigma2, sigma2_decay,
                                feature_fn):
        q = None
        res = MstepResult(self._tf_result, self._sigma2, None)
        for i in range(maxiter):
            t_source = self._tf_result.transform(self._source)
            fsource = feature_fn(t_source)
            estep_res = self.expectation_step(
                fsource, ftarget, target, self._sigma2,
                self._update_sigma2, objective_type)
            res = self.maximization_step(
                t_source, target, estep_res, w=w,
                objective_type=objective_type)
            if res.q is None:
                res = res._replace(q=q)
                break
            self._tf_result = res.transformation
            s2_next = float(res.sigma2) if self._update_sigma2 \
                else float(self._sigma2) * sigma2_decay
            self._sigma2 = max(s2_next, min_sigma2)
            for c in self._callbacks:
                c(self._tf_result)
            log.debug("Iteration: {}, Criteria: {}".format(i, res.q))
            if q is not None and abs(float(res.q) - float(q)) < tol:
                break
            q = float(res.q)
        return res


@partial(jax.jit, static_argnames=("objective_type", "update_sigma2", "w",
                                   "min_sigma2", "sigma2_decay",
                                   "auto_sigma2", "alpha"))
def _run_em_rigid_lattice(source, target, normals, rot0, t0, sigma2_0, *,
                          objective_type, update_sigma2, w, maxiter, tol,
                          min_sigma2, sigma2_decay=1.0, auto_sigma2=False,
                          alpha=0.015):
    """Whole-EM rigid FilterReg with the PERMUTOHEDRAL-LATTICE E-step.

    The lattice build/filter are pure JAX with static shapes
    (ops/permutohedral.py), so the reference's per-iteration rebuild
    (filterreg.py:78-108) traces straight into one ``while_loop`` program —
    previously ``estep_method='lattice'`` paid one host dispatch (~33 ms
    tunnel RTT) per EM iteration. The reference's data-dependent blur
    switch (lattice size vs ``n * alpha``) becomes a ``lax.cond`` between
    the with-blur and no-blur filter pipelines: both branches' buffers are
    O((M+N)(D+1)) lattice tables, not O(M N), so the both-branches
    reservation that rules out conds in the dense kernels (CLAUDE.md) is
    harmless here.
    """
    m, dim = source.shape
    n = target.shape[0]

    if auto_sigma2:
        if objective_type == "pt2pl":
            from .ops import pairwise as _pw

            sigma2_0 = jnp.maximum(_pw.point_spacing_sq(target),
                                   min_sigma2 * 0.01)
        else:
            sigma2_0 = jnp.maximum(
                mu.squared_kernel_sum(source, target), min_sigma2)

    # Splat channels are constant across iterations (target-side values).
    chans = [jnp.ones((n, 1), target.dtype), target]
    if update_sigma2:
        chans.append(jnp.sum(target * target, axis=1, keepdims=True))
    if objective_type == "pt2pl":
        chans.append(normals)
    cat = jnp.concatenate(chans, axis=1)
    vin = jnp.concatenate(
        [jnp.zeros((m, cat.shape[1]), target.dtype), cat], axis=0)

    def step(rot, t, sigma2):
        t_src = source @ rot.T + t[None, :]               # (M, D) rows
        sigma = jnp.sqrt(sigma2)
        fin = jnp.concatenate([t_src, target], axis=0) / sigma
        lat_b = phops.build(fin, with_blur=True)
        out = jax.lax.cond(
            lat_b.size <= n * alpha,
            lambda: phops.filter(lat_b, vin, start=m, with_blur=True),
            lambda: phops.filter(phops.build(fin, with_blur=False), vin,
                                 start=m, with_blur=False),
        )[:m]
        m0 = out[:, 0]
        m1_t = out[:, 1:1 + dim].T
        col = 1 + dim
        m2 = None
        if update_sigma2:
            m2 = out[:, col]
            col += 1
        nx_t = out[:, col:col + dim].T \
            if objective_type == "pt2pl" else None
        return _mstep_from_moments_t(
            t_src.T, m0, m1_t, m2, nx_t, rot, t, sigma2, w, m, n, dim,
            objective_type)

    def cond(state):
        _, _, _, q, q_prev, i = state
        return jnp.logical_and(
            i < maxiter,
            jnp.logical_or(i == 0, jnp.abs(q - q_prev) >= tol),
        )

    def body(state):
        rot, t, sigma2, q, _, i = state
        rot, t, s2, q_new = step(rot, t, sigma2)
        if not update_sigma2:
            s2 = sigma2 * sigma2_decay
        s2 = jnp.maximum(s2, min_sigma2)
        return (rot, t, s2, q_new, q, i + 1)

    state = (rot0, t0, jnp.asarray(sigma2_0, source.dtype),
             jnp.asarray(jnp.inf, source.dtype),
             jnp.asarray(jnp.inf, source.dtype), jnp.asarray(0))
    rot, t, sigma2, q, _, _ = jax.lax.while_loop(cond, body, state)
    return MstepResult(tf.RigidTransformation(rot, t), sigma2, q)


def _is_identity_feature(fn: Callable) -> bool:
    """True for the default ``lambda x: x`` feature function."""
    try:
        probe = object()
        return fn(probe) is probe
    except Exception:
        return False


class RigidFilterReg(FilterReg):
    """Rigid FilterReg (reference filterreg.py:150-196)."""

    def __init__(self, source=None, target_normals=None, sigma2=None,
                 update_sigma2=False, tf_init_params={}, **kwargs):
        super().__init__(source=source, target_normals=target_normals,
                         sigma2=sigma2, update_sigma2=update_sigma2, **kwargs)
        self._tf_type = tf.RigidTransformation
        # Infer dimensionality from the source (the reference forces the
        # user to pass tf_init_params={'rot': np.identity(2), ...} for 2-D
        # clouds, examples/filterreg_rigid2d.py).
        self._dim_inferred = not tf_init_params
        if not tf_init_params and self._source is not None:
            tf_init_params = {"dim": int(self._source.shape[1])}
        self._tf_result = self._tf_type(**tf_init_params)

    def set_source(self, source):
        super().set_source(source)
        # Re-run the inference: constructing with source=None and calling
        # set_source(2-D cloud) later otherwise left a 3x3 identity that
        # crashed the runner with an opaque shape error.
        if self._dim_inferred:
            self._tf_result = self._tf_type(
                dim=int(self._source.shape[1]))

    @staticmethod
    def _maximization_step(t_source, target, estep_res, trans_p, sigma2,
                           w=0.0, objective_type="pt2pt"):
        m, dim = t_source.shape
        n = target.shape[0]
        m0, m1, m2, nx = estep_res
        if not bool(jnp.any(m0 > 0.0)):
            return MstepResult(trans_p, sigma2, None)
        c = _outlier_c(jnp.asarray(sigma2), w, m, n, dim)
        if objective_type == "pt2pt":
            rot, t, s2, q = rigid_mstep_pt2pt(
                t_source, m0, m1, m2, trans_p.rot, trans_p.t, sigma2, c)
        elif objective_type == "pt2pl":
            rot, t, s2, q = rigid_mstep_pt2pl(
                t_source, m0, m1, m2, nx, trans_p.rot, trans_p.t, sigma2, c)
        else:
            raise ValueError("Unknown objective_type: %s." % objective_type)
        return MstepResult(tf.RigidTransformation(rot, t), s2, q)


class DeformableKinematicFilterReg(FilterReg):
    """Deformable-kinematic FilterReg (reference filterreg.py:199-266).

    Per-point dual-quaternion blended skinning over node pairs; M-step is an
    inner Gauss-Newton loop over all node twists. Uses the JAX dual-quaternion
    module (no dq3d dependency).
    """

    def __init__(self, source=None, skinning_weight=None, sigma2=None, **kwargs):
        super().__init__(source, sigma2=sigma2, **kwargs)
        self._tf_type = tf.DeformableKinematicModel
        self._skinning_weight = skinning_weight
        n_nodes = skinning_weight.n_nodes
        idq = jnp.tile(jnp.asarray(dq.identity()), (n_nodes, 1))
        self._tf_result = self._tf_type(idq, self._skinning_weight)

    @staticmethod
    def _maximization_step(t_source, target, estep_res, trans_p, sigma2,
                           w=0.0, objective_type="", maxiter=50, tol=1.0e-4):
        m, dim = t_source.shape
        n = target.shape[0]
        m0, m1, m2, _ = estep_res
        c = w / (1.0 - w) * n / m
        pair = jnp.asarray(trans_p.weights.pair)        # (P, 2)
        val = jnp.asarray(trans_p.weights.val, t_source.dtype)  # (P, 2)
        new_dq, s2, q = _deformable_mstep(
            t_source, m0, m1, m2, trans_p.dualquats, pair, val,
            jnp.asarray(sigma2, t_source.dtype), c,
            gn_maxiter=maxiter, gn_tol=tol)
        return MstepResult(
            tf.DeformableKinematicModel(new_dq, trans_p.weights), s2, q)


def _deformable_mstep(t_source, m0, m1, m2, dualquats, pair, val, sigma2, c,
                      gn_maxiter=50, gn_tol=1.0e-4):
    """Blended-skinning Gauss-Newton M-step (pure jnp; shared by the host
    maximization_step and the whole-EM runner ``_run_em_deformable``).

    Returns (new_dualquats (n_nodes, 8), sigma2_estimate, q).
    """
    dim = t_source.shape[1]
    n6d = dim * 2
    n_nodes = dualquats.shape[0]
    m0 = jnp.maximum(m0, _EPS)
    m1m0 = m1 / m0[:, None]
    m0m0 = m0 / (m0 + c)
    drxdx = jnp.sqrt(m0m0 / sigma2)

    dxdz = so.diff_x_from_twist(t_source)           # (M, 3, 6)
    drxdz = drxdx[:, None, None] * dxdz             # (M, 3, 6)

    # Full blended-skinning J^T J: d x_i / d tw_k = w_ik * dxdz_i, so
    # each point contributes a 2x2 grid of 6x6 blocks (w0^2, w0 w1,
    # w1 w0, w1^2) between its two nodes. (The reference assembles only
    # the off-diagonal blocks and half the gradient,
    # filterreg.py:231-238/246-253 — with dq3d absent it ships untested;
    # that system is singular for shared-pair clouds.)
    jtj = jnp.einsum("mik,mil->mkl", drxdz, drxdz)  # (M, 6, 6)
    a = jnp.zeros((n_nodes * n6d, n_nodes * n6d), t_source.dtype)
    off = jnp.arange(n6d)
    for pi in range(2):
        for pj in range(2):
            rows = (pair[:, pi] * n6d)[:, None, None] + off[None, :, None]
            cols = (pair[:, pj] * n6d)[:, None, None] + off[None, None, :]
            a = a.at[rows, cols].add(
                jtj * (val[:, pi] * val[:, pj])[:, None, None])

    def blend_apply(tw_all):
        tws = tw_all.reshape(n_nodes, n6d)
        qs = jax.vmap(dq.from_twist)(tws)           # (n_nodes, 8)
        q0 = qs[pair[:, 0]]
        q1 = qs[pair[:, 1]]
        blended = dq.dlb2(val[:, 0], q0, val[:, 1], q1)
        return dq.transform_point(blended, t_source)

    # The skinning normal matrix is exactly singular for degenerate
    # clouds (e.g. colinear points leave rotation about the bar
    # unobservable), and the lattice E-step's m1/m0 noise leaks into
    # those null directions — lstsq with an explicit rcond truncates
    # them (a damped solve would amplify: dtw_null = b_null / lam).
    # The step cap guards the nonlinear overshoot of large twists.
    max_step = jnp.asarray(0.5, t_source.dtype)

    def gn_body(state):
        tw, _, it = state
        x = blend_apply(tw)
        rx = drxdx[:, None] * (x - m1m0)
        b = jnp.zeros((n_nodes * n6d,), t_source.dtype)
        jr = jnp.einsum("mik,mi->mk", drxdz, rx)    # (M, 6)
        for pi in range(2):
            brows = (pair[:, pi] * n6d)[:, None] + jnp.arange(n6d)[None, :]
            b = b.at[brows].add(jr * val[:, pi:pi + 1])
        dtw = jnp.linalg.lstsq(a, b, rcond=1e-5)[0]
        dn = jnp.linalg.norm(dtw)
        dtw = dtw * jnp.minimum(1.0, max_step / jnp.maximum(dn, _EPS))
        return tw - dtw, jnp.minimum(dn, max_step), it + 1

    def gn_cond(state):
        _, dn, it = state
        return jnp.logical_and(it < gn_maxiter,
                               jnp.logical_or(it == 0, dn >= gn_tol))

    tw0 = jnp.zeros((n_nodes * n6d,), t_source.dtype)
    tw, _, _ = jax.lax.while_loop(
        gn_cond, gn_body, (tw0, jnp.asarray(jnp.inf, t_source.dtype),
                           jnp.asarray(0)))

    tws = tw.reshape(n_nodes, n6d)
    deltas = jax.vmap(dq.from_twist)(tws)
    new_dq = jax.vmap(dq.mul)(deltas, dualquats)
    x = blend_apply(tw)
    rx = drxdx[:, None] * (x - m1m0)
    q = jnp.sum(rx * rx)
    s2 = sigma2
    if m2 is not None:
        num = m0 * jnp.sum(t_source * t_source, axis=1) \
            - 2.0 * jnp.sum(t_source * m1, axis=1) + m2
        s2 = jnp.sum(num / (m0 + c)) / (3.0 * jnp.sum(m0m0))
    return new_dq, s2, q


@partial(jax.jit, static_argnames=(
    "update_sigma2", "w", "min_sigma2", "sigma2_decay", "auto_sigma2",
    "gn_maxiter", "gn_tol"))
def _run_em_deformable(source, target, dq0, pair, val, sigma2_in, *,
                       update_sigma2, w, maxiter, tol, min_sigma2,
                       sigma2_decay=1.0, auto_sigma2=False,
                       gn_maxiter=50, gn_tol=1.0e-4):
    """Whole-EM DeformableKinematicFilterReg: ONE XLA program.

    Round 2 left this family on the eager host loop (one ~33 ms dispatch
    RTT per EM iteration on remote TPU); like every other family, the dense
    exact E-step (ops/gausstransform.filterreg_moments) and the
    blended-skinning GN M-step now live in a single ``lax.while_loop``
    with the host loop's convergence semantics (|q - q_prev| < tol, sigma2
    decay/floor applied between iterations).
    """
    m, dim = source.shape
    n = target.shape[0]
    c = w / (1.0 - w) * n / m
    if auto_sigma2:
        sigma2_0 = jnp.maximum(mu.squared_kernel_sum(source, target),
                               min_sigma2)
    else:
        sigma2_0 = jnp.asarray(sigma2_in, source.dtype)

    def body(state):
        dqs, sigma2, q, _, i = state
        q0 = dqs[pair[:, 0]]
        q1 = dqs[pair[:, 1]]
        blended = dq.dlb2(val[:, 0], q0, val[:, 1], q1)
        t_src = dq.transform_point(blended, source)
        sigma = jnp.sqrt(sigma2)
        m0, m1, m2, _ = gto.filterreg_moments(
            t_src / sigma, target / sigma, target, None,
            need_m2=bool(update_sigma2))
        new_dq, s2_est, q_new = _deformable_mstep(
            t_src, m0, m1, m2, dqs, pair, val, sigma2, c,
            gn_maxiter=gn_maxiter, gn_tol=gn_tol)
        s2_next = s2_est if update_sigma2 else sigma2 * sigma2_decay
        s2_next = jnp.maximum(s2_next, min_sigma2)
        return (new_dq, s2_next, q_new, q, i + 1)

    def cond(state):
        _, _, q, q_prev, i = state
        return jnp.logical_and(
            i < maxiter,
            jnp.logical_or(i == 0, jnp.abs(q - q_prev) >= tol))

    state = (dq0, sigma2_0, jnp.asarray(jnp.inf, source.dtype),
             jnp.asarray(jnp.inf, source.dtype), jnp.asarray(0))
    dqs, sigma2, q, _, _ = jax.lax.while_loop(cond, body, state)
    return dqs, sigma2, q


@partial(jax.jit, static_argnames=(
    "feature_fn", "objective_type", "update_sigma2", "w", "min_sigma2",
    "sigma2_decay", "auto_sigma2"))
def _run_em_rigid_feature(source, target, normals, ftarget, rot0, t0,
                          sigma2_in, *, feature_fn, objective_type,
                          update_sigma2, w, maxiter, tol, min_sigma2,
                          sigma2_decay=1.0, auto_sigma2=False):
    """Whole-EM rigid FilterReg with a TRACED feature map: one XLA program.

    ``feature_fn`` (static) is traced into the loop — the per-iteration
    source features (e.g. the pure-JAX FPFH pipeline, ops/fpfh.py) are
    recomputed on-device inside the while_loop instead of paying one host
    dispatch RTT per EM iteration (round-2 weak #6; reference anchor
    filterreg.py:121-133). The E-step runs in feature space, the M-step in
    point space — exactly the host loop's semantics.
    """
    m, dim = source.shape
    n = target.shape[0]
    need_nx = objective_type == "pt2pl"
    if auto_sigma2:
        if need_nx:
            # Point-spacing scale, like the host loop and every other
            # runner (see registration()): a cloud-scale sigma2 makes
            # pt2pl diverge (the smoothed virtual targets sit inward of
            # the surface).
            from .ops import pairwise as _pw

            sigma2_0 = jnp.maximum(_pw.point_spacing_sq(target),
                                   min_sigma2 * 0.01)
        else:
            fsource0 = feature_fn(source)
            sigma2_0 = jnp.maximum(mu.squared_kernel_sum(fsource0, ftarget),
                                   min_sigma2)
    else:
        sigma2_0 = jnp.asarray(sigma2_in, source.dtype)

    def body(state):
        rot, t, sigma2, q, _, i = state
        t_src = source @ rot.T + t
        fsrc = feature_fn(t_src)
        sigma = jnp.sqrt(sigma2)
        m0, m1, m2, nx = gto.filterreg_moments(
            fsrc / sigma, ftarget / sigma, target,
            normals if need_nx else None, need_m2=bool(update_sigma2))
        c = _outlier_c(sigma2, w, m, n, dim)
        if objective_type == "pt2pt":
            rot_n, t_n, s2_est, q_new = rigid_mstep_pt2pt(
                t_src, m0, m1, m2, rot, t, sigma2, c)
        else:
            rot_n, t_n, s2_est, q_new = rigid_mstep_pt2pl(
                t_src, m0, m1, m2, nx, rot, t, sigma2, c)
        s2_next = s2_est if update_sigma2 else sigma2 * sigma2_decay
        s2_next = jnp.maximum(s2_next, min_sigma2)
        return (rot_n, t_n, s2_next, q_new, q, i + 1)

    def cond(state):
        _, _, _, q, q_prev, i = state
        return jnp.logical_and(
            i < maxiter,
            jnp.logical_or(i == 0, jnp.abs(q - q_prev) >= tol))

    state = (rot0, t0, sigma2_0, jnp.asarray(jnp.inf, source.dtype),
             jnp.asarray(jnp.inf, source.dtype), jnp.asarray(0))
    rot, t, sigma2, q, _, _ = jax.lax.while_loop(cond, body, state)
    return rot, t, sigma2, q


@partial(jax.jit, static_argnames=(
    "objective_type", "update_sigma2", "w", "maxiter", "tol", "min_sigma2",
    "sigma2_decay", "auto_sigma2"))
def _run_em_rigid_batch(sources, targets, normals, sigma2_0, *,
                        objective_type, update_sigma2, w, maxiter, tol,
                        min_sigma2, sigma2_decay, auto_sigma2):
    dim = sources.shape[-1]
    rot0 = jnp.eye(dim, dtype=sources.dtype)
    t0 = jnp.zeros((dim,), sources.dtype)

    def run(src, tgt, nrm):
        return _run_em_rigid(
            src, tgt, nrm, rot0, t0, sigma2_0,
            objective_type=objective_type, update_sigma2=update_sigma2,
            w=w, maxiter=maxiter, tol=tol, min_sigma2=min_sigma2,
            sigma2_decay=sigma2_decay, auto_sigma2=auto_sigma2)

    return jax.vmap(run)(sources, targets, normals)


def _multistart_rots(n_starts: int, dim: int) -> np.ndarray:
    """(S, D, D) rotation starts on the shared coarse orientation grid."""
    from . import cost_functions as cf

    return cf.RigidCostFunction.initial_multistart_rots(n_starts, dim)


def _run_em_rigid_multistart(source, target, normals, rots0, sigma2_0, *,
                             objective_type, update_sigma2, w, maxiter, tol,
                             min_sigma2, sigma2_decay, auto_sigma2,
                             smask=None, tmask=None):
    # Grid rotations about the shared centroid (cf. cpd._run_em_t_multistart).
    if smask is not None:
        cen = ((smask @ source + tmask @ target)
               / jnp.maximum(jnp.sum(smask) + jnp.sum(tmask), 1.0))
    else:
        cen = ((jnp.sum(source, axis=0) + jnp.sum(target, axis=0))
               / (source.shape[0] + target.shape[0]))

    def run(rot0):
        t0 = cen - rot0 @ cen
        return _run_em_rigid(
            source, target, normals, rot0, t0, sigma2_0,
            objective_type=objective_type, update_sigma2=update_sigma2,
            w=w, maxiter=maxiter, tol=tol, min_sigma2=min_sigma2,
            sigma2_decay=sigma2_decay, auto_sigma2=auto_sigma2,
            smask=smask, tmask=tmask)

    res = jax.vmap(run)(rots0)
    # Selection: with update_sigma2 the final variance is the alignment
    # residual; otherwise sigma2 is identical across starts and the EM
    # criterion q (weighted residual sum) decides.
    score = res.sigma2 if update_sigma2 else res.q
    i = jnp.argmin(score)
    return MstepResult(
        tf.RigidTransformation(res.transformation.rot[i],
                               res.transformation.t[i]),
        res.sigma2[i], res.q[i])


@partial(jax.jit, static_argnames=(
    "objective_type", "update_sigma2", "w", "maxiter", "tol", "min_sigma2",
    "sigma2_decay", "auto_sigma2"))
def _run_em_rigid_multistart_jit(source, target, normals, rots0, sigma2_0,
                                 **kw):
    return _run_em_rigid_multistart(source, target, normals, rots0,
                                    sigma2_0, **kw)


@partial(jax.jit, static_argnames=(
    "objective_type", "update_sigma2", "w", "maxiter", "tol", "min_sigma2",
    "sigma2_decay", "auto_sigma2"))
def _run_em_rigid_multistart_batch(sources, targets, normals, rots0,
                                   sigma2_0, *, objective_type,
                                   update_sigma2, w, maxiter, tol,
                                   min_sigma2, sigma2_decay, auto_sigma2):
    def run(src, tgt, nrm):
        return _run_em_rigid_multistart(
            src, tgt, nrm, rots0, sigma2_0,
            objective_type=objective_type, update_sigma2=update_sigma2,
            w=w, maxiter=maxiter, tol=tol, min_sigma2=min_sigma2,
            sigma2_decay=sigma2_decay, auto_sigma2=auto_sigma2)

    return jax.vmap(run)(sources, targets, normals)


@partial(jax.jit, static_argnames=(
    "objective_type", "update_sigma2", "w", "maxiter", "tol", "min_sigma2",
    "sigma2_decay", "auto_sigma2"))
def _run_em_rigid_multistart_ragged_batch(sources, targets, normals, smasks,
                                          tmasks, rots0, sigma2_0, *,
                                          objective_type, update_sigma2, w,
                                          maxiter, tol, min_sigma2,
                                          sigma2_decay, auto_sigma2):
    def run(src, tgt, nrm, sm, tm):
        return _run_em_rigid_multistart(
            src, tgt, nrm, rots0, sigma2_0,
            objective_type=objective_type, update_sigma2=update_sigma2,
            w=w, maxiter=maxiter, tol=tol, min_sigma2=min_sigma2,
            sigma2_decay=sigma2_decay, auto_sigma2=auto_sigma2,
            smask=sm, tmask=tm)

    return jax.vmap(run)(sources, targets, normals, smasks, tmasks)


@partial(jax.jit, static_argnames=(
    "objective_type", "update_sigma2", "w", "maxiter", "tol", "min_sigma2",
    "sigma2_decay", "auto_sigma2"))
def _run_em_rigid_ragged_batch(sources, targets, normals, smasks, tmasks,
                               sigma2_0, *, objective_type, update_sigma2,
                               w, maxiter, tol, min_sigma2, sigma2_decay,
                               auto_sigma2):
    dim = sources.shape[-1]
    rot0 = jnp.eye(dim, dtype=sources.dtype)
    t0 = jnp.zeros((dim,), sources.dtype)

    def run(src, tgt, nrm, sm, tm):
        return _run_em_rigid(
            src, tgt, nrm, rot0, t0, sigma2_0,
            objective_type=objective_type, update_sigma2=update_sigma2,
            w=w, maxiter=maxiter, tol=tol, min_sigma2=min_sigma2,
            sigma2_decay=sigma2_decay, auto_sigma2=auto_sigma2,
            smask=sm, tmask=tm)

    return jax.vmap(run)(sources, targets, normals, smasks, tmasks)


def _fused_batch_ok(m, n, dim, use_pallas):
    """True when the batched fused Pallas runner should take the pairs."""
    return (dim == 3 and _config.config.use_fused_em
            and use_pallas is not False
            and m * n <= _config.config.fused_em_max_pairs
            and _fused_dims_ok(m, n)
            and jax.default_backend() == "tpu")


def registration_filterreg_batch(
    sources,
    targets,
    target_normals=None,
    sigma2: Optional[float] = None,
    update_sigma2: bool = False,
    w: float = 0,
    objective_type: str = "pt2pt",
    maxiter: int = 50,
    tol: float = 0.001,
    min_sigma2: float = 1.0e-4,
    sigma2_decay: float = 1.0,
    n_starts: int = 1,
    use_pallas: Optional[bool] = None,
) -> List[MstepResult]:
    """Register B cloud pairs with rigid FilterReg in ONE compiled program.

    New capability vs the reference (its filterreg.py registers one pair per
    call): ``sources`` (B, M, D) and ``targets`` (B, N, D) — plus
    ``target_normals`` (B, N, D) for the pt2pl objective — run as a single
    vmapped EM program: one dispatch, B rigid transformations. The batched
    ``lax.while_loop`` runs until every pair converges (per-pair tolerance
    masking via vmap). Ideal TPU serving shape; see
    ``cpd.registration_cpd_batch`` for the CPD analogue.

    Ragged batches: ``sources`` / ``targets`` (and ``target_normals``) may
    be Python lists of clouds with different point counts — zero-padded and
    registered through a masked E-step exactly equivalent to unpadded.

    Returns a list of ``MstepResult``.
    """
    if objective_type not in ("pt2pt", "pt2pl"):
        raise ValueError("Unknown objective_type: %s." % objective_type)
    if objective_type == "pt2pl" and target_normals is None:
        raise ValueError("pt2pl requires target_normals.")
    auto = sigma2 is None
    ragged = isinstance(sources, (list, tuple)) \
        or isinstance(targets, (list, tuple))
    kwargs = dict(
        objective_type=objective_type, update_sigma2=bool(update_sigma2),
        w=float(w), maxiter=int(maxiter), tol=float(tol),
        min_sigma2=float(min_sigma2), sigma2_decay=float(sigma2_decay),
        auto_sigma2=auto)
    if n_starts > 1:
        if ragged:
            dt = _config.config.dtype
            src_p, smask = interop.pad_ragged(list(sources), dt)
            tgt_p, tmask = interop.pad_ragged(list(targets), dt)
            nrm_p = jnp.asarray(interop.pad_ragged(
                list(target_normals), dt)[0]) \
                if objective_type == "pt2pl" else None
            nb = src_p.shape[0]
            res = _run_em_rigid_multistart_ragged_batch(
                jnp.asarray(src_p), jnp.asarray(tgt_p), nrm_p,
                jnp.asarray(smask), jnp.asarray(tmask),
                jnp.asarray(_multistart_rots(
                    int(n_starts), int(src_p.shape[-1]))),
                np.float32(0.0 if auto else sigma2), **kwargs)
        else:
            sources = _as_jnp(sources)
            targets = _as_jnp(targets)
            normals = _as_jnp(target_normals) \
                if objective_type == "pt2pl" else None
            nb = sources.shape[0]
            res = _run_em_rigid_multistart_batch(
                sources, targets, normals,
                jnp.asarray(_multistart_rots(
                    int(n_starts), int(sources.shape[-1]))),
                np.float32(0.0 if auto else sigma2), **kwargs)
        rot, t = res.transformation.rot, res.transformation.t
        return [
            MstepResult(tf.RigidTransformation(rot[b], t[b]),
                        res.sigma2[b], res.q[b])
            for b in range(nb)
        ]
    if ragged:
        dt = _config.config.dtype
        src_p, smask = interop.pad_ragged(list(sources), dt)
        tgt_p, tmask = interop.pad_ragged(list(targets), dt)
        if objective_type == "pt2pl":
            nrm_p, _ = interop.pad_ragged(list(target_normals), dt)
            nrm_p = jnp.asarray(nrm_p)
        else:
            nrm_p = None
        nb = src_p.shape[0]
        if _fused_batch_ok(src_p.shape[1], tgt_p.shape[1], src_p.shape[2],
                           use_pallas):
            from .ops import em_pallas

            rot, t, sigma2s, qs = em_pallas.run_em_filterreg_fused_batch(
                jnp.asarray(src_p), jnp.asarray(tgt_p), nrm_p,
                jnp.asarray(smask), jnp.asarray(tmask),
                sigma2_0=0.0 if auto else float(sigma2),
                objective=objective_type, w=float(w), maxiter=int(maxiter),
                tol=float(tol), update_sigma2=bool(update_sigma2),
                sigma2_decay=float(sigma2_decay),
                min_sigma2=float(min_sigma2), auto_sigma2=auto, masked=True,
                with_normals=objective_type == "pt2pl")
            return [
                MstepResult(tf.RigidTransformation(rot[b], t[b]),
                            sigma2s[b], qs[b])
                for b in range(nb)
            ]
        res = _run_em_rigid_ragged_batch(
            jnp.asarray(src_p), jnp.asarray(tgt_p), nrm_p,
            jnp.asarray(smask), jnp.asarray(tmask),
            np.float32(0.0 if auto else sigma2), **kwargs)
    else:
        sources = _as_jnp(sources)
        targets = _as_jnp(targets)
        normals = _as_jnp(target_normals) \
            if objective_type == "pt2pl" else None
        nb = sources.shape[0]
        if _fused_batch_ok(sources.shape[1], targets.shape[1],
                           sources.shape[2], use_pallas):
            from .ops import em_pallas

            rot, t, sigma2s, qs = em_pallas.run_em_filterreg_fused_batch(
                sources, targets, normals,
                sigma2_0=0.0 if auto else float(sigma2),
                objective=objective_type, w=float(w), maxiter=int(maxiter),
                tol=float(tol), update_sigma2=bool(update_sigma2),
                sigma2_decay=float(sigma2_decay),
                min_sigma2=float(min_sigma2), auto_sigma2=auto,
                with_normals=objective_type == "pt2pl")
            return [
                MstepResult(tf.RigidTransformation(rot[b], t[b]),
                            sigma2s[b], qs[b])
                for b in range(nb)
            ]
        res = _run_em_rigid_batch(
            sources, targets, normals,
            np.float32(0.0 if auto else sigma2), **kwargs)
    rot, t = res.transformation.rot, res.transformation.t
    return [
        MstepResult(tf.RigidTransformation(rot[b], t[b]),
                    res.sigma2[b], res.q[b])
        for b in range(nb)
    ]


def registration_filterreg(
    source,
    target,
    target_normals=None,
    sigma2: Optional[float] = None,
    update_sigma2: bool = False,
    w: float = 0,
    objective_type: str = "pt2pt",
    maxiter: int = 50,
    tol: float = 0.001,
    min_sigma2: float = 1.0e-4,
    feature_fn: Callable = lambda x: x,
    callbacks: List[Callable] = [],
    sigma2_decay: float = 1.0,
    n_starts: int = 1,
    callback_chunk: int = 1,
    **kwargs: Any,
) -> MstepResult:
    """FilterReg registration — drop-in for reference filterreg.py:269-317.

    Args:
        source: Source point cloud (ndarray or open3d PointCloud).
        target: Target point cloud.
        target_normals: Target normals (pt2pl objective).
        sigma2: Fixed variance; None = estimated.
        update_sigma2: Update sigma2 each M-step.
        w: Weight of the uniform outlier distribution.
        objective_type: 'pt2pt' or 'pt2pl'.
        maxiter / tol / min_sigma2: EM controls.
        feature_fn: Optional feature map (e.g. features.FPFH()).
        callbacks: Called with the current Transformation each iteration.
        sigma2_decay: Per-iteration multiplicative sigma2 annealing (applied
            when ``update_sigma2`` is False; floored at ``min_sigma2``). The
            reference keeps sigma2 fixed, which makes pt2pl diverge unless
            sigma2 is hand-tuned small (its pt2pl test is skipped); a decay
            of ~0.85 makes pt2pl converge from the default initialization.

    Keyword Args:
        tf_init_params (dict): Initializer for the rigid transformation.
        estep_method (str): 'dense' (default, exact) or 'lattice'.

    Returns:
        MstepResult: (transformation, sigma2, q).
    """
    frg = RigidFilterReg(
        interop.as_points(source), target_normals, sigma2, update_sigma2,
        **kwargs)
    frg.set_callbacks(callbacks)
    return frg.registration(
        interop.as_points(target), w=w, objective_type=objective_type,
        maxiter=maxiter, tol=tol, min_sigma2=min_sigma2,
        feature_fn=feature_fn, sigma2_decay=sigma2_decay,
        n_starts=n_starts, callback_chunk=callback_chunk)
