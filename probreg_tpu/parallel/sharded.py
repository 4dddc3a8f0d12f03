"""Sharded CPD: shard_map E-step over a device mesh, psum'd moments.

Design (SURVEY.md §2.3 / §7.4): the target cloud X (N, D) is sharded over a
1-D mesh axis ``points``; the source Y (M, D) and the transformation are
replicated. Each device computes the exact posterior moments of its target
columns — the posterior normalizer ``den_j`` is a *column* sum, so it is
complete on-device and no cross-device softmax is needed. The per-device
moments p1 (M,), px (M, D), n_p, xx are combined with one ``lax.psum`` over
ICI; pt1 (N,) stays sharded with the target.

The whole EM loop runs inside one jitted program: E-step under ``shard_map``,
M-step (tiny D x D linalg) computed replicated on every device.

The reference has no distributed path at all (its accelerator story is one
cupy kernel, probreg/cupy_utils.py:5-22); this module is new capability.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from .. import cpd as cpd_mod
from ..config import config
from ..models import transformation as tf
from ..ops import estep as estep_ops
from ..ops import lowrank
from ..ops.estep import EstepMoments
from ..ops.pairwise import sqdist
from ..utils import interop
from ..utils import math_utils as mu

AXIS = "points"


def make_mesh(devices=None, axis: str = AXIS) -> Mesh:
    """1-D mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def shard_points(points, mesh: Mesh, axis: str = AXIS):
    """Pad N to a multiple of the mesh size and device_put shard-wise.

    Returns (sharded_points, sharded_mask, n) — mask is 0 on padding rows so
    the E-step ignores them.
    """
    pts = np.asarray(interop.as_points(points, dtype=config.dtype))
    n, dim = pts.shape
    n_dev = mesh.shape[axis]
    pad = (-n) % n_dev
    if pad:
        pts = np.concatenate([pts, np.zeros((pad, dim), pts.dtype)], axis=0)
    mask = np.zeros((pts.shape[0],), pts.dtype)
    mask[:n] = 1.0
    sh = NamedSharding(mesh, P(axis, None))
    sh1 = NamedSharding(mesh, P(axis))
    return jax.device_put(pts, sh), jax.device_put(mask, sh1), n


def _local_moments(t_source, x_shard, mask, sigma2, c, eps):
    """Exact moments of the posterior columns owned by this device."""
    g = jnp.exp(-sqdist(t_source, x_shard) / (2.0 * sigma2))
    g = g * mask[None, :]
    den_raw = jnp.sum(g, axis=0)
    den = jnp.where(den_raw == 0.0, eps, den_raw) + c
    pt1 = mask * den_raw / den
    pmat = g / den[None, :]
    p1 = jnp.sum(pmat, axis=1)
    px = jax.lax.dot_general(
        pmat, x_shard,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    xx = jnp.sum(pt1 * jnp.sum(x_shard * x_shard, axis=1))
    return pt1, p1, px, xx


def estep_sharded(
    t_source: jax.Array,
    target_sh: jax.Array,
    mask_sh: jax.Array,
    sigma2,
    w: float,
    n: int,
    mesh: Mesh,
    axis: str = AXIS,
) -> EstepMoments:
    """E-step over a sharded target. p1/px/n_p/xx psum'd; pt1 left sharded.

    ``n`` is the true (unpadded) target count, used for the outlier constant
    (reference cpd.py:78-79).
    """
    m, dim = t_source.shape
    eps = jnp.asarray(jnp.finfo(jnp.float32).eps, t_source.dtype)
    c = estep_ops.outlier_constant(jnp.asarray(sigma2, t_source.dtype), w, m, n, dim)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis), P(), P()),
        out_specs=(P(axis), P(), P(), P(), P()),
    )
    def f(src, x_shard, msk, s2, cc):
        pt1, p1, px, xx = _local_moments(src, x_shard, msk, s2, cc, eps)
        p1 = jax.lax.psum(p1, axis)
        px = jax.lax.psum(px, axis)
        xx = jax.lax.psum(xx, axis)
        n_p = jnp.sum(p1)
        return pt1, p1, px, n_p, xx

    pt1, p1, px, n_p, xx = f(
        t_source, target_sh, mask_sh,
        jnp.asarray(sigma2, t_source.dtype), c,
    )
    return EstepMoments(pt1, p1, px, n_p, xx)


# --------------------------------------------------------------------------
# Transposed-layout sharded EM (rigid / affine)
# --------------------------------------------------------------------------
#
# Same lane-layout rule as the single-chip fast path (see cpd.py): points
# stay (D, N) with the mesh axis sharding the LANE dimension. Each device
# computes its shard's posterior columns (the normalizer is a column sum,
# complete on-device) and one psum combines the O(M*D) moments.

def shard_points_t(points, mesh: Mesh, axis: str = AXIS):
    """(N, D) host points -> (D, Np) sharded over lanes + (1, Np) mask."""
    pts = np.asarray(interop.as_points(points, dtype=config.dtype))
    n, dim = pts.shape
    n_dev = mesh.shape[axis]
    pad = (-n) % n_dev
    if pad:
        pts = np.concatenate([pts, np.zeros((pad, dim), pts.dtype)], axis=0)
    mask = np.zeros((1, pts.shape[0]), pts.dtype)
    mask[0, :n] = 1.0
    sh = NamedSharding(mesh, P(None, axis))
    return (jax.device_put(pts.T.copy(), sh), jax.device_put(mask, sh), n)


@partial(
    jax.jit,
    static_argnames=("kind", "w", "update_scale",
                     "n", "mesh", "axis", "use_culled", "culled_interpret",
                     "culled_tile"),
)
def _run_em_sharded_t(source, xs_t_sh, mask_sh, init=None, sigma2_init=None,
                      *, kind, w, maxiter, tol,
                      update_scale, n, mesh, axis, use_culled=False,
                      culled_interpret=False, culled_tile=1024):
    """Sharded whole-EM in transposed layout; source (M, D) replicated.

    ``use_culled``: per-shard tile-culled Pallas E-step
    (ops/estep_pallas.fused_stash_core). The per-tile cull mask adapts to
    sigma2 at runtime inside the kernel, so no branch is needed; memory
    stays tiled at every size (the dense path materializes (M, N/P) per
    device). Requires Morton-presorted clouds (registration_cpd_sharded
    does this) so each contiguous target shard is spatially compact.

    ``init``: packed (D*D + D + 1,) warm-start (lin, t, scale);
    ``sigma2_init``: warm-start variance (pyramid.py threads both).
    """
    ys_t = source.T
    dim, m = ys_t.shape
    eps = jnp.asarray(jnp.finfo(jnp.float32).eps, source.dtype)

    sig0_spec = (P(), P(None, axis), P(None, axis))

    @partial(shard_map, mesh=mesh, in_specs=sig0_spec, out_specs=P())
    def init_sigma2(ys_t, xs_sh, msk):
        # squared_kernel_sum closed form with masked target shard + psum.
        sx2 = jnp.sum(ys_t * ys_t)
        st2 = jax.lax.psum(jnp.sum(xs_sh * xs_sh * msk), axis)
        sx = jnp.sum(ys_t, axis=1)
        st = jax.lax.psum(jnp.sum(xs_sh * msk, axis=1), axis)
        return (n * sx2 + m * st2 - 2.0 * jnp.dot(sx, st)) / float(m * dim * n)

    if sigma2_init is not None:
        sigma2_0 = jnp.maximum(jnp.asarray(sigma2_init, source.dtype), eps)
    else:
        sigma2_0 = init_sigma2(ys_t, xs_t_sh, mask_sh)
    q0 = 1.0 + n * dim * 0.5 * jnp.log(sigma2_0)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(None, axis), P(None, axis), P()),
        out_specs=(P(), P(), P(), P()),
        # pallas_call outputs carry no varying-mesh-axes annotation; the
        # culled branch would fail shard_map's vma check otherwise.
        check_vma=False,
    )
    def estep_t(t_src_t, xs_sh, msk, sigma2):
        c = estep_ops.outlier_constant(sigma2, w, m, n, dim)

        def dense_local(_):
            y2 = jnp.sum(t_src_t * t_src_t, axis=0)[:, None]
            x2 = jnp.sum(xs_sh * xs_sh, axis=0, keepdims=True)
            xy = jax.lax.dot_general(
                t_src_t, xs_sh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            g = jnp.exp(
                -jnp.maximum(y2 + x2 - 2.0 * xy, 0.0) / (2.0 * sigma2))
            g = g * msk
            den_raw = jnp.sum(g, axis=0, keepdims=True)
            den = jnp.where(den_raw == 0.0, eps, den_raw) + c
            pt1 = msk * den_raw / den
            pmat = g / den
            xs_ext = jnp.concatenate([xs_sh, jnp.ones_like(msk)], axis=0)
            pxp_loc = jax.lax.dot_general(
                xs_ext, pmat, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            return pxp_loc, jnp.sum(pt1 * x2)

        if not use_culled:
            pxp_loc, xx_loc = dense_local(None)
        else:
            # Always the tiled culled kernel (round 3: the single-exp
            # g-stash variant — one exp + 8 stash-bytes per ACTIVE tile
            # pair, >= the dense compute at every density): its per-tile
            # mask already adapts to sigma2 at runtime, and unlike a
            # lax.cond with a dense branch it never compiles an (M, N/P)
            # allocation — the dense branch's buffer would be reserved
            # even when the branch is never taken (observed OOM at
            # 150k x 150k on one device).
            from ..ops import estep_pallas as ep

            nl = xs_sh.shape[1]
            tm = min(culled_tile, ((m + 7) // 8) * 8)
            tn = min(culled_tile, ((nl + 127) // 128) * 128)
            # Per-device g-stash cap (config.cpd_stash_max_bytes): the
            # stash is O(M_padded * tile_n) PER DEVICE — the source is
            # replicated, so target sharding does not shrink it. The
            # single-chip wrapper (estep_auto) shrinks/falls back; this
            # branch has no stash-free twin, so shrink or refuse clearly
            # rather than fault the worker (review finding).
            from ..config import config as _cfg

            budget = int(getattr(_cfg, "cpd_stash_max_bytes", 0) or 0)
            if budget:
                tn_c = ep._capped_stash_tile_n(
                    m, tm, tn, budget=budget, on_overflow="fallback")
                if tn_c is None:
                    raise ValueError(
                        f"sharded culled E-step: the per-device g-stash "
                        f"for M={m} exceeds config.cpd_stash_max_bytes "
                        f"({budget}) even at the tile_n=256 floor. Pass "
                        "use_culled=False (dense per-shard scan) or use "
                        "a 2-axis mesh (shards the source too).")
                tn = min(tn, tn_c)
            mp = -(-m // tm) * tm
            nlp = -(-nl // tn) * tn
            f32 = jnp.float32
            ys8 = jnp.zeros((8, mp), f32).at[:dim, :m].set(t_src_t)
            y2p = jnp.full((1, mp), ep._BIG, f32).at[0, :m].set(
                jnp.sum(t_src_t * t_src_t, axis=0))
            x2v = jnp.sum(xs_sh * xs_sh, axis=0)
            x2v = jnp.where(msk[0] > 0, x2v, ep._BIG)
            xs8 = jnp.zeros((8, nlp), f32).at[:dim, :nl].set(xs_sh)
            x2p = jnp.full((1, nlp), ep._BIG, f32).at[0, :nl].set(x2v)
            scal = jnp.stack([0.5 / sigma2, c]).astype(f32)

            pt1p, p1p, pxp, xxp = ep.fused_stash_core(
                scal, ys8, y2p, xs8, x2p, tile_m=tm, tile_n=tn,
                interpret=culled_interpret)
            pxp_loc = jnp.concatenate([pxp[:dim, :m], p1p[:, :m]], axis=0)
            xx_loc = xxp[0, 0]

        pxp = jax.lax.psum(pxp_loc, axis)
        xx = jax.lax.psum(xx_loc, axis)
        px_t, p1 = pxp[:dim], pxp[dim]
        return px_t, p1, jnp.sum(p1), xx

    from .. import cpd as cpd_mod

    def step(lin, t, scale, sigma2):
        t_src = scale * lin @ ys_t + t[:, None]
        px_t, p1, n_p, xx = estep_t(t_src, xs_t_sh, mask_sh, sigma2)
        if kind == "rigid":
            return cpd_mod._rigid_mstep_t(ys_t, p1, px_t, n_p, xx,
                                          update_scale)
        b, t_new, s2, q = cpd_mod._affine_mstep_t(ys_t, p1, px_t, n_p, xx)
        return b, t_new, jnp.asarray(1.0, source.dtype), s2, q

    def cond(state):
        _, _, _, _, q, q_prev, i = state
        return jnp.logical_and(
            i < maxiter,
            jnp.logical_or(i == 0, jnp.abs(q - q_prev) >= tol))

    def body(state):
        lin, t, scale, sigma2, q, _, i = state
        lin, t, scale, sigma2, q_new = step(lin, t, scale, sigma2)
        return (lin, t, scale, sigma2, q_new, q, i + 1)

    if init is None:
        lin0 = jnp.eye(dim, dtype=source.dtype)
        t0 = jnp.zeros(dim, source.dtype)
        scale0 = jnp.asarray(1.0, source.dtype)
    else:
        lin0 = init[: dim * dim].reshape(dim, dim)
        t0 = init[dim * dim: dim * dim + dim]
        scale0 = init[dim * dim + dim]
    state = (lin0, t0, scale0, sigma2_0, q0,
             jnp.asarray(jnp.inf, source.dtype), jnp.asarray(0))
    lin, t, scale, sigma2, q, _, _ = jax.lax.while_loop(cond, body, state)
    return lin, t, scale, sigma2, q


# --------------------------------------------------------------------------
# Sharded EM: one jitted while_loop per registration
# --------------------------------------------------------------------------

def _mstep_dispatch(kind: str) -> Callable:
    if kind == "rigid":
        return lambda src, mom, aux: cpd_mod.rigid_maximization_step(
            src, mom, aux["update_scale"])
    if kind == "affine":
        return lambda src, mom, aux: cpd_mod.affine_maximization_step(src, mom)
    if kind == "nonrigid":
        return lambda src, mom, aux: cpd_mod.nonrigid_maximization_step(
            src, mom, aux["g"], aux["lmd"], aux["sigma2_p"])
    if kind == "nonrigid_lowrank":
        return lambda src, mom, aux: cpd_mod.nonrigid_lowrank_maximization_step(
            src, mom, aux["u"], aux["lam"], aux["lmd"], aux["sigma2_p"])
    raise ValueError("unknown tf_type %s" % kind)


@partial(
    jax.jit,
    static_argnames=("kind", "w", "n", "mesh", "axis"),
)
def _run_em_sharded(
    source, target_sh, mask_sh, tf0, aux,
    *, kind, w, maxiter, tol, n, mesh, axis, sigma2_init=None,
):
    """Sharded analogue of cpd._run_em: whole EM as one SPMD XLA program.

    sigma2_0/q0 are computed INSIDE the program (closed-form masked
    squared_kernel_sum + psum, as _run_em_sharded_t does) — eager jnp
    init scalars each cost a full tunnel RTT (CLAUDE.md).
    """
    m, dim = source.shape

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(axis, None), P(axis)), out_specs=P())
    def init_sigma2(src, x_sh, msk):
        sx2 = jnp.sum(src * src)
        st2 = jax.lax.psum(jnp.sum(x_sh * x_sh * msk[:, None]), axis)
        sx = jnp.sum(src, axis=0)
        st = jax.lax.psum(jnp.sum(x_sh * msk[:, None], axis=0), axis)
        return (n * sx2 + m * st2 - 2.0 * jnp.dot(sx, st)) \
            / float(m * dim * n)

    if sigma2_init is not None:
        sigma2_0 = jnp.maximum(jnp.asarray(sigma2_init, source.dtype),
                               jnp.finfo(jnp.float32).eps)
    else:
        sigma2_0 = init_sigma2(source, target_sh, mask_sh)
    q0 = 1.0 + n * dim * 0.5 * jnp.log(sigma2_0)
    if kind in ("nonrigid", "nonrigid_lowrank"):
        aux = dict(aux, sigma2_p=sigma2_0)

    def step(transf, sigma2, aux):
        t_src = transf._transform(source)
        mom = estep_sharded(t_src, target_sh, mask_sh, sigma2, w, n, mesh, axis)
        if kind in ("nonrigid", "nonrigid_lowrank"):
            aux = dict(aux, sigma2_p=sigma2)
        return _mstep_dispatch(kind)(source, mom, aux)

    def cond(state):
        _, _, q, q_prev, i = state
        return jnp.logical_and(
            i < maxiter,
            jnp.logical_or(i == 0, jnp.abs(q - q_prev) >= tol),
        )

    def body(state):
        transf, sigma2, q, _, i = state
        new = step(transf, sigma2, aux)
        return (new.transformation, new.sigma2, new.q, q, i + 1)

    state = (tf0, sigma2_0, q0, jnp.asarray(jnp.inf, q0.dtype), jnp.asarray(0))
    transf, sigma2, q, _, _ = jax.lax.while_loop(cond, body, state)
    return cpd_mod.MstepResult(transf, sigma2, q)


def registration_cpd_sharded(
    source,
    target,
    tf_type_name: str = "rigid",
    w: float = 0.0,
    maxiter: int = 50,
    tol: float = 0.001,
    mesh: Optional[Mesh] = None,
    update_scale: bool = True,
    beta: float = 2.0,
    lmd: float = 2.0,
    **kwargs: Any,
) -> cpd_mod.MstepResult:
    """Multi-device CPD registration. Same semantics as registration_cpd.

    Shards the target over ``mesh`` (default: all devices); source and
    transformation are replicated; moments psum over ICI. A 2-D ``(m, n)``
    mesh shards BOTH clouds (cross-device posterior normalizer) — see
    parallel/sharded2d.py.
    """
    if mesh is None:
        mesh = make_mesh()
    if len(mesh.axis_names) == 2:
        from .sharded2d import registration_cpd_2d

        return registration_cpd_2d(
            source, target, tf_type_name, w=w, maxiter=maxiter, tol=tol,
            mesh=mesh, update_scale=update_scale, beta=beta, lmd=lmd,
            **kwargs)
    axis = mesh.axis_names[0]
    use_culled = kwargs.pop("use_culled", None)
    culled_interpret = bool(kwargs.pop("culled_interpret", False))
    culled_tile = int(kwargs.pop("culled_tile", 1024))
    tf_init_params = dict(kwargs.pop("tf_init_params", None) or {})
    sigma2_init = kwargs.pop("sigma2_init", None)
    # Keep device arrays on device (np.asarray on a device array is a
    # host round trip — CLAUDE.md); only the culled branch needs host data
    # for its one-time Morton sort.
    src = interop.as_points(source, dtype=config.dtype)
    tgt = interop.as_points(target, dtype=config.dtype)
    dim = src.shape[1]

    if tf_type_name in ("rigid", "affine"):
        if use_culled is None:
            use_culled = (
                jax.default_backend() == "tpu"
                and config.use_culled_estep
                and src.shape[0] * tgt.shape[0]
                >= config.culled_estep_min_pairs)
        if use_culled:
            # One-time host Morton sort: each contiguous target shard (and
            # each source tile) becomes spatially compact, so the per-shard
            # tile culling fires. Rigid/affine M-steps are order-invariant.
            from ..ops.spatial import morton_order_np

            src = np.asarray(src)
            tgt = np.asarray(tgt)
            src = src[morton_order_np(src)]
            tgt = tgt[morton_order_np(tgt)]
        src = jnp.asarray(src)
        init = None
        if tf_init_params:
            p = tf_init_params
            key = "rot" if tf_type_name == "rigid" else "b"
            init = np.concatenate([
                np.asarray(p.get(key, np.eye(dim)), np.float32).ravel(),
                np.asarray(p.get("t", np.zeros(dim)), np.float32),
                np.atleast_1d(np.float32(p.get("scale", 1.0)))])
        s2i = (None if sigma2_init is None
               else jnp.asarray(sigma2_init, config.dtype))
        # Transposed fast path: lane-sharded target, single jit dispatch.
        xs_t_sh, mask_sh, n = shard_points_t(tgt, mesh, axis)
        lin, t, scale, sigma2, q = _run_em_sharded_t(
            src, xs_t_sh, mask_sh, init, s2i, kind=tf_type_name, w=float(w),
            maxiter=int(maxiter), tol=float(tol),
            update_scale=bool(update_scale), n=n, mesh=mesh, axis=axis,
            use_culled=bool(use_culled),
            culled_interpret=culled_interpret,
            culled_tile=culled_tile)
        if tf_type_name == "rigid":
            transf = tf.RigidTransformation(lin, t, scale)
        else:
            transf = tf.AffineTransformation(lin, t)
        return cpd_mod.MstepResult(transf, sigma2, q)

    src = jnp.asarray(src)

    if tf_init_params:
        raise ValueError("tf_init_params warm starts are rigid/affine-only "
                         "on the sharded path (the nonrigid field has no "
                         "packed init)")
    target_sh, mask_sh, n = shard_points(target, mesh, axis)
    s2i = (None if sigma2_init is None
           else jnp.asarray(sigma2_init, config.dtype))

    if tf_type_name == "nonrigid":
        rank = kwargs.pop("rank", None)
        if rank is None:
            tf0 = tf.NonRigidTransformation(jnp.zeros_like(src), src, beta)
            aux = {
                "g": tf0.g,
                "lmd": jnp.asarray(lmd, config.dtype),
            }
        else:
            # Low-rank factors and the K x K Woodbury solve are replicated
            # (ops/lowrank.py); only the E-step shards over the target.
            u, lam = lowrank.lowrank_rbf(src, float(beta), int(rank))
            zc0 = jnp.zeros((u.shape[1], dim), u.dtype)
            tf0 = tf.LowRankNonRigidTransformation(zc0, u, lam)
            aux = {
                "u": u,
                "lam": lam,
                "lmd": jnp.asarray(lmd, config.dtype),
            }
            tf_type_name = "nonrigid_lowrank"
    else:
        raise ValueError("unknown tf_type_name %s" % tf_type_name)

    return _run_em_sharded(
        src, target_sh, mask_sh, tf0, aux,
        kind=tf_type_name, w=float(w), maxiter=int(maxiter), tol=float(tol),
        n=n, mesh=mesh, axis=axis, sigma2_init=s2i,
    )


# --------------------------------------------------------------------------
# Sharded FilterReg (rigid pt2pt/pt2pl)
# --------------------------------------------------------------------------
#
# FilterReg's dense E-step moments are per-SOURCE row sums over targets
# (filterreg.py:78-106), so sharding the target over the mesh needs one
# psum of the (C, M) moment matrix — same pattern as CPD, no posterior
# normalization at all.

@partial(
    jax.jit,
    static_argnames=("objective_type", "update_sigma2", "w",
                     "min_sigma2", "sigma2_decay", "auto_sigma2",
                     "n", "mesh", "axis"),
)
def _run_filterreg_sharded(source, xs_t_sh, mask_sh, nrm_t_sh, sigma2_in, *,
                           objective_type, update_sigma2, w, maxiter, tol,
                           min_sigma2, sigma2_decay, auto_sigma2, n, mesh,
                           axis, rot0=None, t0=None):
    from .. import filterreg as frg_mod

    ys_t = source.T
    dim, m = ys_t.shape

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(None, axis), P(None, axis)),
             out_specs=P())
    def init_sigma2(ys_t, xs_sh, msk):
        if objective_type == "pt2pl":
            # Point-spacing scale (see filterreg.registration): one-time
            # all-gather of the target so each shard's points query the
            # FULL cloud (shard-local NN overestimates spacing when the
            # input ordering is not spatially coherent). STREAMED over
            # target blocks: a dense (n/P, n) distance matrix is 20 GB
            # per device at n=200k on 8 devices — the single-device path
            # streams for the same reason (filterreg._run_em_rigid).
            xs_full = jax.lax.all_gather(xs_sh, axis, axis=1, tiled=True)
            msk_full = jax.lax.all_gather(msk, axis, axis=1, tiled=True)
            blk = 4096
            pad = (-xs_full.shape[1]) % blk
            xs_p = jnp.pad(xs_full, ((0, 0), (0, pad)))
            mk_p = jnp.pad(msk_full, ((0, 0), (0, pad)))
            xblocks = jnp.moveaxis(
                xs_p.reshape(dim, -1, blk), 1, 0)           # (B, dim, blk)
            mblocks = jnp.moveaxis(
                mk_p.reshape(1, -1, blk), 1, 0)             # (B, 1, blk)
            x2l = jnp.sum(xs_sh * xs_sh, axis=0)[:, None]   # (n/P, 1)

            def body(best, inp):
                xb, mb = inp
                x2b = jnp.sum(xb * xb, axis=0, keepdims=True)
                xy = jax.lax.dot_general(
                    xs_sh, xb, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                d2 = jnp.maximum(x2l + x2b - 2.0 * xy, 0.0)
                d2 = jnp.where((mb <= 0.0) | (d2 <= 1e-12), jnp.inf, d2)
                return jnp.minimum(best, jnp.min(d2, axis=1)), None

            # pcast: the carry must share the varying-manual-axes type
            # of the body output (derived from all_gathered arrays).
            best0 = jax.lax.pcast(
                jnp.full((xs_sh.shape[1],), jnp.inf, xs_sh.dtype),
                (axis,), to="varying")
            nn2, _ = jax.lax.scan(body, best0, (xblocks, mblocks))
            nn2 = jnp.where((msk[0] > 0.0) & jnp.isfinite(nn2), nn2, 0.0)
            cnt = jax.lax.psum(jnp.sum(msk), axis)
            return jax.lax.psum(jnp.sum(nn2), axis) / jnp.maximum(cnt, 1.0)
        sx2 = jnp.sum(ys_t * ys_t)
        st2 = jax.lax.psum(jnp.sum(xs_sh * xs_sh * msk), axis)
        sx = jnp.sum(ys_t, axis=1)
        st = jax.lax.psum(jnp.sum(xs_sh * msk, axis=1), axis)
        return (n * sx2 + m * st2 - 2.0 * jnp.dot(sx, st)) / float(m * dim * n)

    if auto_sigma2:
        floor = min_sigma2 * 0.01 if objective_type == "pt2pl" else min_sigma2
        sigma2_0 = jnp.maximum(init_sigma2(ys_t, xs_t_sh, mask_sh), floor)
    else:
        sigma2_0 = jnp.asarray(sigma2_in, source.dtype)

    nrm_spec = P() if nrm_t_sh is None else P(None, axis)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(None, axis), P(None, axis), nrm_spec, P()),
             out_specs=P())
    def moments(t_src_t, xs_sh, msk, nrm_sh, sigma2):
        inv2s2 = 0.5 / sigma2
        y2 = jnp.sum(t_src_t * t_src_t, axis=0)[:, None]
        x2 = jnp.sum(xs_sh * xs_sh, axis=0, keepdims=True)
        xy = jax.lax.dot_general(
            t_src_t, xs_sh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        kk = jnp.exp(-jnp.maximum(y2 + x2 - 2.0 * xy, 0.0) * inv2s2) * msk
        chans = [msk, xs_sh]
        if update_sigma2:
            chans.append(x2 * msk)
        if objective_type == "pt2pl":
            chans.append(nrm_sh)
        v_t = jnp.concatenate(chans, axis=0)
        mom = jax.lax.dot_general(
            v_t, kk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)           # (C, M)
        return jax.lax.psum(mom, axis)

    def step(rot, t, sigma2):
        t_src = rot @ ys_t + t[:, None]
        mom = moments(t_src, xs_t_sh, mask_sh,
                      nrm_t_sh if nrm_t_sh is not None else sigma2, sigma2)
        m0 = mom[0]
        m1_t = mom[1:1 + dim]
        col = 1 + dim
        m2 = None
        if update_sigma2:
            m2 = mom[col]
            col += 1
        nx_t = mom[col:col + dim] if objective_type == "pt2pl" else None

        c = frg_mod._outlier_c(sigma2, w, m, n, dim)
        mask = (m0 > 0.0).astype(t_src.dtype)
        m0_safe = jnp.maximum(m0, frg_mod._EPS)
        m1m0_t = m1_t / m0_safe[None, :]
        m0m0 = m0 / jnp.maximum(m0 + c, frg_mod._EPS)
        drxdx = mask * jnp.sqrt(m0m0 / sigma2)
        if objective_type == "pt2pt":
            dr, dt = frg_mod._kabsch_t(t_src, m1m0_t, drxdx)
            rx2 = jnp.sum((drxdx[None, :] * (t_src - m1m0_t)) ** 2, axis=0)
            q = jnp.sum(jnp.sqrt(rx2))
            rot_n, t_n = dr @ rot, dr @ t + dt
        else:
            nxm0_t = nx_t / m0_safe[None, :]
            tw, q = frg_mod._pt2pl_t(t_src, m1m0_t, nxm0_t, drxdx)
            from ..utils import se3_op as so

            rot_n, t_n = so.twist_mul(tw, rot, t)
        if m2 is None:
            return rot_n, t_n, sigma2 * sigma2_decay, q
        num = m0 * jnp.sum(t_src * t_src, axis=0) \
            - 2.0 * jnp.sum(t_src * m1_t, axis=0) + m2
        s2 = jnp.sum(mask * num / jnp.maximum(m0 + c, frg_mod._EPS))
        s2 = s2 / (dim * jnp.maximum(jnp.sum(mask * m0m0), frg_mod._EPS))
        return rot_n, t_n, s2, q

    def cond(state):
        _, _, _, q, q_prev, i = state
        return jnp.logical_and(
            i < maxiter,
            jnp.logical_or(i == 0, jnp.abs(q - q_prev) >= tol))

    def body(state):
        rot, t, sigma2, q, _, i = state
        rot, t, s2, q_new = step(rot, t, sigma2)
        s2 = jnp.maximum(s2, min_sigma2)
        return (rot, t, s2, q_new, q, i + 1)

    state = (jnp.eye(dim, dtype=source.dtype) if rot0 is None
             else jnp.asarray(rot0, source.dtype),
             jnp.zeros(dim, source.dtype) if t0 is None
             else jnp.asarray(t0, source.dtype), sigma2_0,
             jnp.asarray(jnp.inf, source.dtype),
             jnp.asarray(jnp.inf, source.dtype), jnp.asarray(0))
    rot, t, sigma2, q, _, _ = jax.lax.while_loop(cond, body, state)
    return rot, t, sigma2, q


def registration_filterreg_sharded(
    source,
    target,
    target_normals=None,
    objective_type: str = "pt2pt",
    sigma2: Optional[float] = None,
    w: float = 0.0,
    maxiter: int = 50,
    tol: float = 0.001,
    min_sigma2: float = 1.0e-4,
    sigma2_decay: float = 1.0,
    update_sigma2: bool = False,
    mesh: Optional[Mesh] = None,
    tf_init_params: Optional[dict] = None,
):
    """Multi-device rigid FilterReg; target (and normals) sharded over the
    mesh, moments psum'd. Same semantics as registration_filterreg's fast
    path (``tf_init_params`` {'rot','t'} warm-starts the transform — the
    pyramid's carry). Returns an MstepResult. A 2-D ``(m, n)`` mesh shards
    BOTH clouds (parallel/sharded2d.py)."""
    from .. import filterreg as frg_mod

    if mesh is None:
        mesh = make_mesh()
    if len(mesh.axis_names) == 2:
        from .sharded2d import registration_filterreg_2d

        return registration_filterreg_2d(
            source, target, target_normals=target_normals,
            objective_type=objective_type, sigma2=sigma2, w=w,
            maxiter=maxiter, tol=tol, min_sigma2=min_sigma2,
            sigma2_decay=sigma2_decay, update_sigma2=update_sigma2,
            mesh=mesh, tf_init_params=tf_init_params)
    axis = mesh.axis_names[0]
    src = jnp.asarray(interop.as_points(source, dtype=config.dtype))
    xs_t_sh, mask_sh, n = shard_points_t(target, mesh, axis)
    nrm_t_sh = None
    if objective_type == "pt2pl":
        if target_normals is None:
            raise ValueError("pt2pl requires target_normals.")
        nrm_t_sh, _, _ = shard_points_t(target_normals, mesh, axis)
    rot, t, sigma2_out, q = _run_filterreg_sharded(
        src, xs_t_sh, mask_sh, nrm_t_sh,
        np.float32(0.0 if sigma2 is None else sigma2),
        objective_type=objective_type, update_sigma2=bool(update_sigma2),
        w=float(w), maxiter=int(maxiter), tol=float(tol),
        min_sigma2=float(min_sigma2), sigma2_decay=float(sigma2_decay),
        auto_sigma2=sigma2 is None, n=n, mesh=mesh, axis=axis,
        # ALWAYS arrays: a None-vs-array pytree difference would compile
        # cold and warm registrations as two separate programs.
        rot0=np.asarray((tf_init_params or {}).get(
            "rot", np.eye(src.shape[1])), np.float32),
        t0=np.asarray((tf_init_params or {}).get(
            "t", np.zeros(src.shape[1])), np.float32))
    return frg_mod.MstepResult(tf.RigidTransformation(rot, t), sigma2_out, q)


# --------------------------------------------------------------------------
# Batch-axis (data-parallel) sharding
# --------------------------------------------------------------------------

def registration_cpd_batch_sharded(
    sources,
    targets,
    tf_type_name: str = "rigid",
    w: float = 0.0,
    maxiter: int = 50,
    tol: float = 0.001,
    update_scale: bool = True,
    mesh: Optional[Mesh] = None,
    axis_name: str = "batch",
):
    """B cloud pairs registered data-parallel over the mesh.

    The second parallel axis next to point sharding (SURVEY.md 2.3's
    "points x batch" design): the vmapped whole-EM program
    (cpd._run_em_t_batch) runs with its batch dimension sharded over the
    devices — each chip registers B/n_dev pairs independently, no
    collectives at all. Pads B up to a multiple of the mesh size (padding
    pairs are dropped from the result). ``sources``/``targets`` may be
    Python lists of clouds with different point counts per pair (ragged):
    pairs are zero-padded and run through the masked E-step, exactly
    equivalent to registering each pair unpadded.

    Returns a list of B MstepResult like cpd.registration_cpd_batch.
    """
    if tf_type_name not in ("rigid", "affine"):
        raise ValueError("batch registration supports 'rigid' and 'affine'")
    ragged = isinstance(sources, (list, tuple)) \
        or isinstance(targets, (list, tuple))
    if ragged:
        # Zero-pad each cloud to the batch max (masked E-step is exactly
        # equivalent to unpadded registration; see cpd._estep_t kmask).
        srcs, smask = interop.pad_ragged(list(sources), config.dtype)
        tgts, tmask = interop.pad_ragged(list(targets), config.dtype)
    else:
        srcs = np.asarray(interop.as_points(sources, dtype=config.dtype))
        tgts = np.asarray(interop.as_points(targets, dtype=config.dtype))
        smask = tmask = None
    if mesh is None:
        mesh = make_mesh(axis=axis_name)
    axis = mesh.axis_names[0]
    b = srcs.shape[0]
    n_dev = mesh.shape[axis]
    pad = (-b) % n_dev
    if pad:
        # Repeat the last pair: same compiled shapes, discarded below.
        rep = lambda a: np.concatenate([a, np.repeat(a[-1:], pad, 0)], 0)
        srcs, tgts = rep(srcs), rep(tgts)
        if ragged:
            smask, tmask = rep(smask), rep(tmask)
    sh = NamedSharding(mesh, P(axis, None, None))
    srcs_d = jax.device_put(srcs, sh)
    tgts_d = jax.device_put(tgts, sh)
    if ragged:
        sh2 = NamedSharding(mesh, P(axis, None))
        lin, t, scale, sigma2, q = cpd_mod._run_em_t_ragged_batch(
            srcs_d, tgts_d,
            jax.device_put(np.asarray(smask), sh2),
            jax.device_put(np.asarray(tmask), sh2),
            kind=tf_type_name, w=float(w), maxiter=int(maxiter),
            tol=float(tol), update_scale=bool(update_scale))
    else:
        lin, t, scale, sigma2, q = cpd_mod._run_em_t_batch(
            srcs_d, tgts_d, kind=tf_type_name, w=float(w),
            maxiter=int(maxiter), tol=float(tol),
            update_scale=bool(update_scale))
    out = []
    for i in range(b):
        if tf_type_name == "rigid":
            transf = tf.RigidTransformation(lin[i], t[i], scale[i])
        else:
            transf = tf.AffineTransformation(lin[i], t[i])
        out.append(cpd_mod.MstepResult(transf, sigma2[i], q[i]))
    return out


# --------------------------------------------------------------------------
# Sharded BCPD (variational inference over a sharded target)
# --------------------------------------------------------------------------
#
# Same decomposition as the CPD E-step: the posterior normalizer den_j is a
# column sum over M, complete per target shard, so the VI moments
# (px_t (D, M), nu (M), s1) psum over ICI; the NN-RMSE convergence
# criterion is an elementwise pmin of per-shard row minima. The M-step
# (bcpd._vi_mstep_t, dense or low-rank Sigma) runs replicated.

@partial(jax.jit, static_argnames=("w", "n", "mesh", "axis"))
def _run_bcpd_sharded(source, xs_t_sh, mask_sh, gram, lmd, k, sigma2_0, *,
                      w, maxiter, tol, n, mesh, axis):
    from .. import bcpd as bcpd_mod

    m, dim = source.shape
    ys_t = source.T
    eps = jnp.asarray(jnp.finfo(jnp.float32).eps, source.dtype)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(None, axis), P(None, axis), P(), P()),
        out_specs=(P(), P(), P()),
    )
    def estep(t_src_t, xs_sh, msk, row, sigma2):
        x2 = jnp.sum(xs_sh * xs_sh, axis=0, keepdims=True)
        y2 = jnp.sum(t_src_t * t_src_t, axis=0)[:, None]
        xy = jax.lax.dot_general(
            t_src_t, xs_sh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        d2 = jnp.maximum(y2 + x2 - 2.0 * xy, 0.0)
        dmin = jnp.min(jnp.where(msk > 0, d2, jnp.inf), axis=1)
        g = jnp.exp(-d2 / (2.0 * sigma2)) \
            / (2.0 * jnp.pi * sigma2) ** (dim * 0.5) * msk
        pmat = g * row[:, None]
        den = w / n + jnp.sum(pmat, axis=0, keepdims=True)
        den = jnp.where(den == 0.0, eps, den)
        pmat = pmat / den
        v_chan = jnp.concatenate([xs_sh, msk, x2], axis=0)  # (D+2, B)
        mom = jax.lax.dot_general(
            v_chan, pmat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)            # (D+2, M)
        # Residual-form sigma2 numerator (bcpd._vi_mstep_t): d2 is live
        # here, so e1 = sum p * d2 is a scalar psum.
        e1 = jnp.sum(pmat * d2)
        return (jax.lax.psum(mom, axis), jax.lax.pmin(dmin, axis),
                jax.lax.psum(e1, axis))

    def body(state):
        (rot, t, scale, v_hat_t, sigma_diag, alpha, sigma2, _, rmse_prev,
         i, best) = state
        t_src_t = scale * rot @ (ys_t + v_hat_t) + t[:, None]
        row = (1.0 - w) * alpha * jnp.exp(
            -(scale ** 2) / (2.0 * sigma2) * sigma_diag * dim)
        mom, dmin, e1 = estep(t_src_t, xs_t_sh, mask_sh, row, sigma2)
        rmse = jnp.mean(jnp.sqrt(dmin))
        px_t, nu, s1 = mom[:dim], mom[dim], jnp.sum(mom[dim + 1])
        (rot_new, t_new, scale_new, v_new_t, sigma_diag_new, alpha_new,
         sigma2_new) = bcpd_mod._vi_mstep_t(
            ys_t, rot, t, scale, sigma2, gram, lmd, k, px_t, nu, s1,
            e1=e1, t_src_t=t_src_t, v_prev_t=v_hat_t)
        # Best-visited tracking — same rationale as bcpd._run_bcpd: the VI
        # trajectory wanders after convergence, so keep the best iterate by
        # the loop's own NN-RMSE. `rmse` scores the incoming state.
        b_rot, b_t, b_scale, b_v, b_rmse = best
        better = rmse < b_rmse
        best = (jnp.where(better, rot, b_rot), jnp.where(better, t, b_t),
                jnp.where(better, scale, b_scale),
                jnp.where(better, v_hat_t, b_v),
                jnp.minimum(rmse, b_rmse))
        return (rot_new, t_new, scale_new, v_new_t, sigma_diag_new,
                alpha_new, sigma2_new, rmse, state[7], i + 1, best)

    def cond(state):
        rmse, rmse_prev, i = state[7], state[8], state[9]
        return jnp.logical_and(
            i < maxiter,
            jnp.logical_or(i < 2, jnp.abs(rmse - rmse_prev) >= tol))

    inf = jnp.asarray(jnp.inf, source.dtype)
    best0 = (jnp.eye(dim, dtype=source.dtype), jnp.zeros(dim, source.dtype),
             jnp.asarray(1.0, source.dtype), jnp.zeros_like(ys_t), inf)
    state = (
        jnp.eye(dim, dtype=source.dtype), jnp.zeros(dim, source.dtype),
        jnp.asarray(1.0, source.dtype), jnp.zeros_like(ys_t),
        jnp.ones((m,), source.dtype),
        jnp.full((m,), 1.0 / m, source.dtype), sigma2_0,
        inf, inf, jnp.asarray(0), best0,
    )
    state = jax.lax.while_loop(cond, body, state)
    rot, t, scale, v_hat_t = state[:4]
    b_rot, b_t, b_scale, b_v, b_rmse = state[10]
    # Score the last iterate once and keep the better of (last, best).
    t_src_t = scale * rot @ (ys_t + v_hat_t) + t[:, None]
    _, dmin, _ = estep(t_src_t, xs_t_sh, mask_sh,
                       jnp.ones((m,), source.dtype), sigma2_0)
    rmse_last = jnp.mean(jnp.sqrt(dmin))
    use_last = rmse_last <= b_rmse
    rot = jnp.where(use_last, rot, b_rot)
    t = jnp.where(use_last, t, b_t)
    scale = jnp.where(use_last, scale, b_scale)
    v_hat_t = jnp.where(use_last, v_hat_t, b_v)
    return rot, t, scale, v_hat_t


def registration_bcpd_sharded(
    source,
    target,
    w: float = 0.0,
    maxiter: int = 50,
    tol: float = 0.001,
    lmd: float = 2.0,
    k: float = 1.0e20,
    gamma: float = 1.0,
    rank: Optional[int] = None,
    normalize: bool = True,
    mesh: Optional[Mesh] = None,
):
    """Multi-device BCPD: target sharded over the mesh, VI moments psum'd.

    Same semantics (incl. the default scale normalization and the optional
    low-rank Sigma) as bcpd.registration_bcpd; returns a
    CombinedTransformation.
    """
    from .. import bcpd as bcpd_mod
    from ..ops import lowrank as lr
    from ..utils import math_utils as mu_

    if mesh is None:
        mesh = make_mesh()
    if len(mesh.axis_names) == 2:
        from .sharded2d import registration_bcpd_2d

        if rank is None:
            raise ValueError("a 2-D mesh requires rank= (the dense M x M "
                             "Sigma solve does not distribute over the "
                             "m-axis)")
        return registration_bcpd_2d(
            source, target, w=w, maxiter=maxiter, tol=tol, lmd=lmd, k=k,
            gamma=gamma, rank=rank, normalize=normalize, mesh=mesh)
    axis = mesh.axis_names[0]
    src = np.asarray(interop.as_points(source), dtype=np.float64)
    tgt = np.asarray(interop.as_points(target), dtype=np.float64)
    # Hardware-safety guard on the PER-DEVICE pair count: the VI shards
    # the target P-fold, but on a 1-device mesh (the default on a
    # single-chip host) this is exactly the flat whole-VI dispatch
    # registration_bcpd refuses — it faulted the v5e worker 3x.
    from ..bcpd import _hw_guard

    ndev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    _hw_guard(
        src.shape[0] * -(-tgt.shape[0] // ndev), maxiter,
        f"sharded over {ndev} device(s) at per-device M*N/P = "
        f"{src.shape[0]}*{-(-tgt.shape[0] // ndev)}",
        "Use a larger mesh, registration_bcpd_pyramid(mesh=...), or "
        "registration_bcpd_pyramid(dispatch_chunk=...).")
    if normalize:
        centroid = np.concatenate([src, tgt], axis=0).mean(axis=0)
        src_h, tgt_h = src - centroid, tgt - centroid
        m, dim = src.shape
        skc = float(
            (src_h ** 2).sum() * tgt.shape[0] + (tgt_h ** 2).sum() * m
            - 2.0 * float(src_h.sum(0) @ tgt_h.sum(0))
        ) / (m * dim * tgt.shape[0])
        scale0 = max(np.sqrt(skc), 1e-12)
    else:
        centroid, scale0 = np.zeros(src.shape[1]), 1.0
    src_n = ((src - centroid) / scale0).astype(np.float32)
    tgt_n = ((tgt - centroid) / scale0).astype(np.float32)

    src_j = jnp.asarray(src_n)
    gram = (mu_.inverse_multiquadric_kernel(src_j, src_j) if rank is None
            else tuple(lr.lowrank_imq(src_j, 1.0, int(rank))))
    sigma2_0 = gamma * mu_.squared_kernel_sum(src_j, jnp.asarray(tgt_n))
    xs_t_sh, mask_sh, n = shard_points_t(tgt_n, mesh, axis)
    rot, t, scale, v_hat_t = _run_bcpd_sharded(
        src_j, xs_t_sh, mask_sh, gram,
        jnp.asarray(lmd, jnp.float32), jnp.asarray(k, jnp.float32),
        jnp.asarray(sigma2_0, jnp.float32),
        w=float(w), maxiter=int(maxiter), tol=float(tol),
        n=n, mesh=mesh, axis=axis)
    v_raw = scale0 * np.asarray(v_hat_t.T, np.float64) - centroid
    t_raw = scale0 * np.asarray(t, np.float64) + centroid
    return tf.CombinedTransformation(
        np.asarray(rot, np.float64), t_raw, float(scale), v_raw)


# --------------------------------------------------------------------------
# Sharded GMMTree (tree-descent E-step over a sharded target)
# --------------------------------------------------------------------------
#
# The registration E-step is an independent per-target-point tree descent
# (gmmtree._estep_t_factory); sharding the target over the mesh needs one
# psum of the (T,) / (T, 3) node moments. The tree itself (built once from
# the source) and the twist M-step are replicated.

@partial(jax.jit, static_argnames=("max_level", "lambda_c", "mesh", "axis"))
def _run_gmmtree_sharded(xs_t_sh, mask_sh, pi, mu_n, cov, rot0, t0, *,
                         max_level, lambda_c, maxiter, tol, mesh, axis):
    from .. import gmmtree as gt_mod

    from ..ops import sym3 as _sym3

    lmd_nodes, nn_nodes = _sym3.eigh3(cov)
    # f32 covariance estimation can leave slightly INDEFINITE nodes
    # (observed -1.1e-5 smallest eigenvalue on a quantized-input build);
    # a negative eigenvalue drops that direction's twist weight to the
    # eps floor and one such node dominates the 6x6 system — repro:
    # 1.67 rad error at a 1e4 coordinate offset, 4e-3 with the floor.
    lmd_nodes = jnp.maximum(lmd_nodes, jnp.float32(1e-7))
    estep_core = gt_mod._estep_t_factory(pi, mu_n, cov, max_level, lambda_c)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(None, axis), P(None, axis)),
        out_specs=(P(), P()),
    )
    def estep(rot, t, xs_sh, msk):
        x_t = rot @ xs_sh + t[:, None]
        m0, m1 = estep_core(x_t, msk)
        return jax.lax.psum(m0, axis), jax.lax.psum(m1, axis)

    def body(state):
        rot, t, q, _, i = state
        m0, m1 = estep(rot, t, xs_t_sh, mask_sh)
        rot_new, t_new, q_new = gt_mod._mstep_core(
            m0, m1, mu_n, lmd_nodes, nn_nodes, rot, t)
        return (rot_new, t_new, q_new, q, i + 1)

    def cond(state):
        _, _, q, q_prev, i = state
        return jnp.logical_and(
            i < maxiter,
            jnp.logical_or(i == 0, jnp.abs(q - q_prev) >= tol))

    state = (rot0, t0, jnp.asarray(jnp.inf, pi.dtype),
             jnp.asarray(jnp.inf, pi.dtype), jnp.asarray(0))
    rot, t, q, _, _ = jax.lax.while_loop(cond, body, state)
    return rot, t, q


def _require_1d_mesh(mesh, what):
    """Entries with no 2-D path must reject a 2-axis mesh instead of
    silently sharding over its first axis only (every n-axis replica
    would redundantly recompute identical work — a silent trap next to
    the CPD/FilterReg/BCPD entries, which dispatch to sharded2d)."""
    if len(mesh.axis_names) != 1:
        raise ValueError(
            f"{what} supports 1-axis meshes only (got axes "
            f"{tuple(mesh.axis_names)}); build one with make_mesh(), or "
            "use registration_cpd_sharded/_filterreg_/_bcpd_ for the "
            "2-D (m, n) mesh paths.")


def registration_gmmtree_sharded(
    source,
    target,
    maxiter: int = 20,
    tol: float = 1.0e-4,
    tree_level: int = 2,
    lambda_c: float = 0.01,
    lambda_s: float = 0.001,
    mesh: Optional[Mesh] = None,
    **kwargs: Any,
):
    """Multi-device GMMTree registration (same semantics as
    gmmtree.registration_gmmtree: transforms the target internally and
    returns the inverse transform as source->target)."""
    from .. import gmmtree as gt_mod

    if mesh is None:
        mesh = make_mesh()
    _require_1d_mesh(mesh, "registration_gmmtree_sharded")
    axis = mesh.axis_names[0]
    gt = gt_mod.GMMTree(source, tree_level=tree_level, lambda_c=lambda_c,
                        lambda_s=lambda_s, **kwargs)
    pi, mu_n, cov = gt._nodes
    xs_t_sh, mask_sh, _ = shard_points_t(target, mesh, axis)
    rot, t, q = _run_gmmtree_sharded(
        xs_t_sh, mask_sh, pi, mu_n, cov,
        jnp.asarray(gt._tf_result.rot), jnp.asarray(gt._tf_result.t),
        max_level=int(tree_level), lambda_c=float(lambda_c),
        maxiter=int(maxiter), tol=float(tol), mesh=mesh, axis=axis)
    # Reference gmmtree.py:96: the estimated transform moves the target;
    # return its inverse (source -> target).
    inv = tf.RigidTransformation(rot, t).inverse()
    return gt_mod.MstepResult(inv, q)


# --------------------------------------------------------------------------
# Sharded L2-dist family (GMMReg / SVR)
# --------------------------------------------------------------------------
#
# The scalable work in the L2-dist registrations is the mixture extraction
# (reference l2dist_regs.py:78-79 -> sklearn fits): the O(N*K) spherical-GMM
# EM and the O(N^2) one-class-SVM dual. Both run here over the mesh with the
# points sharded; only the K-sized (GMM) / N-sized (SVM iterate) moments
# cross devices. The BFGS over the resulting mixtures (<= 800 components) is
# tiny and replicated (l2dist_regs._jax_optimizer).

@partial(jax.jit, static_argnames=("k", "n", "kmeans_iters", "em_iters",
                                   "mesh", "axis"))
def _fit_gmm_sharded(x_sh, mask_sh, mu0, *, k, n, kmeans_iters, em_iters,
                     mesh, axis):
    """Spherical-GMM fit (features._fit_spherical_gmm) with points sharded.

    Per-point responsibilities are local to each device (the row logsumexp
    needs only that point's row); the (K,), (K, D) moment sums psum over
    the mesh.
    """

    @partial(shard_map, mesh=mesh, in_specs=(P(axis, None), P(axis), P()),
             out_specs=(P(), P()))
    def run(x, msk, mu0):
        d = x.shape[1]

        def lloyd(mu, _):
            d2 = sqdist(x, mu)
            onehot = jax.nn.one_hot(
                jnp.argmin(d2, axis=1), k, dtype=x.dtype) * msk[:, None]
            counts = jax.lax.psum(jnp.sum(onehot, axis=0), axis)
            sums = jax.lax.psum(
                jax.lax.dot_general(
                    onehot, x, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32), axis)
            return sums / jnp.maximum(counts, 1.0)[:, None], None

        mu, _ = jax.lax.scan(lloyd, mu0, None, length=kmeans_iters)

        pi = jnp.full((k,), 1.0 / k, x.dtype)
        # Global mean per-dimension variance from psum'd first/second moments.
        s1 = jax.lax.psum(jnp.sum(x * msk[:, None], axis=0), axis) / n
        s2 = jax.lax.psum(jnp.sum(x * x * msk[:, None], axis=0), axis) / n
        var = jnp.full((k,), jnp.mean(s2 - s1 * s1), x.dtype)

        def em(carry, _):
            mu, var, pi = carry
            d2 = sqdist(x, mu)
            log_p = (-0.5 * d2 / var
                     - 0.5 * d * jnp.log(2.0 * jnp.pi * var) + jnp.log(pi))
            log_r = log_p - jax.scipy.special.logsumexp(
                log_p, axis=1, keepdims=True)
            r = jnp.exp(log_r) * msk[:, None]                 # (n_sh, k)
            nk = jnp.maximum(jax.lax.psum(jnp.sum(r, axis=0), axis), 1e-10)
            mu_new = jax.lax.psum(
                jax.lax.dot_general(
                    r, x, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32), axis) / nk[:, None]
            d2_new = sqdist(x, mu_new)
            var_new = jnp.maximum(
                jax.lax.psum(jnp.sum(r * d2_new, axis=0), axis) / (d * nk),
                1e-12)
            pi_new = nk / n
            return (mu_new, var_new, pi_new), None

        (mu, var, pi), _ = jax.lax.scan(em, (mu, var, pi), None,
                                        length=em_iters)
        return mu, pi

    return run(x_sh, mask_sh, mu0)


@partial(jax.jit, static_argnames=("n", "iters", "mesh", "axis"))
def _fit_ocsvm_sharded(x_sh, mask_sh, gamma, *, nu, n, iters, mesh, axis):
    """One-class-SVM dual (features._fit_ocsvm_dual) with the kernel matrix
    row-sharded: each device holds K[rows_sh, :] and computes its slice of
    the projected-gradient matvec; the (N,) iterate is all-gathered per step
    (O(N) bytes vs the O(N^2/P) local compute). Returns alpha sharded like
    the input rows, scaled to libsvm's convention (sum = nu * n)."""
    c = 1.0 / (nu * n)

    @partial(shard_map, mesh=mesh, in_specs=(P(axis, None), P(axis), P()),
             out_specs=P(axis))
    def run(x, msk, gamma):
        x_full = jax.lax.all_gather(x, axis, tiled=True)       # (n_pad, d)
        msk_full = jax.lax.all_gather(msk, axis, tiled=True)   # (n_pad,)
        kmat = (jnp.exp(-gamma * sqdist(x, x_full))
                * msk[:, None] * msk_full[None, :])
        n_sh = x.shape[0]
        start = jax.lax.axis_index(axis) * n_sh

        def project(v):
            # Exact one-shot projection onto {0 <= a <= c*msk, sum a = 1}
            # — the sharded twin of features._fit_ocsvm_dual's project
            # (KEEP IN SYNC), which replaced a 50-step sequential
            # bisection whose latency chain dominated the dual solve.
            # Each device evaluates s at ITS slice of the 2n breakpoints
            # against the full iterate (O(n^2/P), the matvec's cost) and
            # the crossing bracket reduces with pmax/pmin.
            v_sl = jax.lax.dynamic_slice(v, (start,), (n_sh,))
            b = jnp.concatenate([v_sl, v_sl - c])
            s = jnp.sum(msk_full[None, :]
                        * jnp.clip(v[None, :] - b[:, None], 0.0, c), axis=1)
            valid = s >= 1.0
            b_lo = jax.lax.pmax(jnp.max(jnp.where(valid, b, -jnp.inf)),
                                axis)
            b_hi = jax.lax.pmin(jnp.min(jnp.where(valid, jnp.inf, b)),
                                axis)
            s_lo = jnp.sum(msk_full * jnp.clip(v - b_lo, 0.0, c))
            s_hi = jnp.sum(msk_full * jnp.clip(v - b_hi, 0.0, c))
            tau = b_lo + (s_lo - 1.0) * (b_hi - b_lo) / jnp.maximum(
                s_lo - s_hi, 1e-30)
            return msk_full * jnp.clip(v - tau, 0.0, c)

        eta = 1.0 / jax.lax.pmax(
            jnp.max(jnp.sum(jnp.abs(kmat), axis=1)), axis)     # 1/||K||_inf
        # Cast the replicated init varying so the pg scan carry has a
        # consistent varying-manual-axes type with the all_gathered,
        # device-varying iterates.
        alpha = project(jax.lax.pcast(
            jnp.full((x_full.shape[0],), 1.0 / n, x.dtype),
            (axis,), to="varying"))

        def pg(alpha, _):
            g_sh = jax.lax.dot_general(
                kmat, alpha, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            g = jax.lax.all_gather(g_sh, axis, tiled=True)
            return project(alpha - eta * g), None

        alpha, _ = jax.lax.scan(pg, alpha, None, length=iters)
        return jax.lax.dynamic_slice(alpha, (start,), (n_sh,)) * (nu * n)

    return run(x_sh, mask_sh, jnp.asarray(gamma, x_sh.dtype))


class _ShardedFeatureWrapper:
    """Shared drop-in plumbing: everything except ``compute`` delegates to
    the wrapped single-device feature object — INCLUDING attribute writes.
    The L2 registrations re-estimate kernel widths onto
    ``self._feature_gen`` (e.g. RigidSVR._estimate_sigma sets ``_sigma``/
    ``_gamma``); without write-delegation those landed on the wrapper
    while ``compute`` read the base's stale values after ``set_source``
    (review finding)."""

    _OWN = ("_base", "_mesh", "_axis")

    def __init__(self, base, mesh: Mesh, axis: str):
        object.__setattr__(self, "_base", base)
        object.__setattr__(self, "_mesh", mesh)
        object.__setattr__(self, "_axis", axis)

    def __setattr__(self, name, value):
        if name in self._OWN:
            object.__setattr__(self, name, value)
        else:
            setattr(self._base, name, value)

    def __getattr__(self, name):
        if name == "fused_fit":
            # The fused single-device path is gated on
            # hasattr(feature_gen, 'fused_fit') (l2dist_regs.py); the
            # sharded wrapper must NOT advertise it — its fits run
            # through compute() over the mesh.
            raise AttributeError(name)
        return getattr(self._base, name)

    def init(self):
        self._base.init()

    def annealing(self):
        self._base.annealing()


class _ShardedGMM(_ShardedFeatureWrapper):
    """features.GMM drop-in whose fit runs over the mesh."""

    def compute(self, data):
        pts = np.asarray(interop.as_points(data), dtype=np.float32)
        b = self._base
        k = min(b._n_gmm_components, pts.shape[0])
        # Center seeding on host (the single-device path seeds from
        # jax.random inside the program; here the host already owns the
        # full cloud, pre-shard).
        rng = np.random.default_rng(b._seed + b._counter)
        mu0 = jnp.asarray(pts[rng.choice(pts.shape[0], size=k,
                                         replace=False)])
        x_sh, mask_sh, n = shard_points(pts, self._mesh, self._axis)
        return _fit_gmm_sharded(
            x_sh, mask_sh, mu0, k=k, n=n, kmeans_iters=10,
            em_iters=b._em_iters, mesh=self._mesh, axis=self._axis)


class _ShardedOneClassSVM(_ShardedFeatureWrapper):
    """features.OneClassSVM drop-in whose dual solve runs over the mesh."""

    def compute(self, data):
        pts = np.asarray(interop.as_points(data), dtype=np.float32)
        b = self._base
        x_sh, mask_sh, n = shard_points(pts, self._mesh, self._axis)
        alpha = np.asarray(_fit_ocsvm_sharded(
            x_sh, mask_sh, b._gamma, nu=float(b._nu), n=n, iters=300,
            mesh=self._mesh, axis=self._axis))[:n]
        z = np.power(2.0 * np.pi * b._sigma ** 2, b._dim * 0.5)
        sv = alpha > 1e-8
        return jnp.asarray(pts), jnp.asarray(alpha * z * sv, jnp.float32)


def _shardify_l2(reg, mesh: Mesh, axis: str):
    """Swap an L2DistRegistration's feature generator for the mesh version
    (after __init__ so the subclasses' sigma/gamma estimation has run on
    the original object, which the wrapper keeps as ``_base``)."""
    from .. import features as ft_mod

    fg = reg._feature_gen
    if isinstance(fg, ft_mod.GMM):
        reg._feature_gen = _ShardedGMM(fg, mesh, axis)
    elif isinstance(fg, ft_mod.OneClassSVM):
        reg._feature_gen = _ShardedOneClassSVM(fg, mesh, axis)
    else:
        raise ValueError(
            f"no sharded fit for feature type {type(fg).__name__}")
    return reg


def registration_gmmreg_sharded(source, target, tf_type_name: str = "rigid",
                                mesh: Optional[Mesh] = None, **kwargs: Any):
    """Multi-device GMMReg: the GMM mixture fits run over the mesh, the
    BFGS over the mixtures is replicated (cf. l2dist_regs.registration_gmmreg,
    reference l2dist_regs.py:158-181)."""
    from .. import l2dist_regs as l2

    if mesh is None:
        mesh = make_mesh()
    _require_1d_mesh(mesh, "registration_gmmreg_sharded")
    axis = mesh.axis_names[0]
    cv = lambda x: np.asarray(interop.as_points(x))
    if tf_type_name == "rigid":
        reg = l2.RigidGMMReg(cv(source), **kwargs)
    elif tf_type_name == "nonrigid":
        reg = l2.TPSGMMReg(cv(source), **kwargs)
    else:
        raise ValueError("Unknown transform type %s" % tf_type_name)
    return _shardify_l2(reg, mesh, axis).registration(cv(target))


def registration_svr_sharded(
    source,
    target,
    tf_type_name: str = "rigid",
    maxiter: int = 1,
    tol: float = 1.0e-3,
    opt_maxiter: int = 50,
    opt_tol: float = 1.0e-3,
    mesh: Optional[Mesh] = None,
    **kwargs: Any,
):
    """Multi-device SVR: the one-class-SVM dual runs over the mesh with the
    kernel matrix row-sharded (cf. l2dist_regs.registration_svr, reference
    l2dist_regs.py:184-219)."""
    from .. import l2dist_regs as l2

    if mesh is None:
        mesh = make_mesh()
    _require_1d_mesh(mesh, "registration_svr_sharded")
    axis = mesh.axis_names[0]
    cv = lambda x: np.asarray(interop.as_points(x))
    if tf_type_name == "rigid":
        reg = l2.RigidSVR(cv(source), **kwargs)
    elif tf_type_name == "nonrigid":
        reg = l2.TPSSVR(cv(source), **kwargs)
    else:
        raise ValueError("Unknown transform type %s" % tf_type_name)
    return _shardify_l2(reg, mesh, axis).registration(
        cv(target), maxiter, tol, opt_maxiter, opt_tol)
