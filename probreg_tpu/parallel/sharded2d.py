"""2-D mesh CPD: source AND target sharded, cross-device posterior normalizer.

The 1-D design (sharded.py) shards only the target: every device holds all
M source rows, so source-side state (the cloud, nonrigid Gram/Nystrom
factors) is replicated and per-device E-step memory is O(M * N/P). This
module shards BOTH axes over a 2-D mesh ``(m, n)`` — the genuinely
distributed softmax the reference's column normalizer implies
(/root/reference/probreg/cpd.py:80-84, the E-step denominator summed over
ALL source rows):

  device (i, j) holds source shard i (M/Pm rows) and target shard j
  (N/Pn columns) and computes its local Gaussian block g_ij ONCE;
  den_j = psum_m(sum_rows g_ij)             -- the cross-device normalizer
  p1, px = psum_n(row moments of g_ij/den)  -- stay m-sharded
  pt1, xx = n-sharded / replicated scalars

Per-device memory drops Pm-fold vs the 1-D mesh: the E-step block is
(M/Pm, N/Pn), the source and its low-rank Nystrom factor U are (M/Pm, ·),
and the nonrigid M-step runs through the Woodbury K x K system whose
normal-equation moments (U^T diag(p1) U, rhs^T U) are psum_m'd — no device
ever materializes an M-row object. M-step reductions for rigid/affine are
the same trick: all first/second moments are sums over source rows, so each
m-shard reduces locally and one psum_m yields the replicated (D, D) system
every device solves identically (tiny SVD/solve, cheaper than moving it).

The whole EM (init + while_loop) runs INSIDE one shard_map body: a single
SPMD program per registration, collectives riding ICI.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..config import config
from ..models import transformation as tf
from ..ops import estep as estep_ops
from ..ops import lowrank
from ..utils import interop

M_AXIS = "m"
N_AXIS = "n"

_F32_EPS = float(np.finfo(np.float32).eps)


def make_mesh_2d(pm: Optional[int] = None, pn: Optional[int] = None,
                 devices=None,
                 axis_names: Tuple[str, str] = (M_AXIS, N_AXIS)) -> Mesh:
    """2-D ``(m, n)`` mesh. Default shape: squarish with pn >= pm.

    The n-axis is the cheap one (its collectives are O(N/Pn) den rows and
    O(M/Pm * D) moment strips); prefer it larger when the factorization is
    uneven.
    """
    if devices is None:
        devices = jax.devices()
    nd = len(devices)
    if pm is None and pn is None:
        pm = int(np.floor(np.sqrt(nd)))
        while nd % pm:
            pm -= 1
        pn = nd // pm
    elif pm is None:
        pm = nd // pn
    elif pn is None:
        pn = nd // pm
    if pm * pn != nd:
        raise ValueError(f"mesh shape {pm}x{pn} != {nd} devices")
    return Mesh(np.asarray(devices).reshape(pm, pn), axis_names)


def _shard_axis_t(points, mesh: Mesh, axis: str):
    """(N, D) host/device points -> ((D, Np) lane-sharded, (1, Np) mask, n)."""
    pts = np.asarray(interop.as_points(points, dtype=config.dtype))
    n, dim = pts.shape
    n_dev = mesh.shape[axis]
    pad = (-n) % n_dev
    if pad:
        pts = np.concatenate([pts, np.zeros((pad, dim), pts.dtype)], axis=0)
    mask = np.zeros((1, pts.shape[0]), pts.dtype)
    mask[0, :n] = 1.0
    sh = NamedSharding(mesh, P(None, axis))
    return jax.device_put(pts.T.copy(), sh), jax.device_put(mask, sh), n


@partial(jax.jit,
         static_argnames=("kind", "w", "update_scale", "m", "n",
                          "mesh", "maxiter", "use_culled",
                          "culled_interpret", "culled_tile"))
def _run_em_2d(ys_t_sh, smask_sh, xs_t_sh, xmask_sh, u_sh, lam, lmd,
               init=None, sigma2_init=None,
               *, kind, w, maxiter, tol, update_scale, m, n, mesh,
               use_culled=False, culled_interpret=False, culled_tile=512):
    """Whole-EM on the 2-D mesh; one SPMD program.

    kind: 'rigid' | 'affine' | 'nonrigid_lowrank'.
    ``u_sh``/``lam``/``lmd`` are only used by the low-rank kind (pass
    zero-size placeholders otherwise — jit specializes on shapes).

    ``use_culled``: per-device single-exp g-stash E-step
    (ops/estep_pallas.fused_stash_core_spmd) with the column normalizer
    psum'd over the m-axis between the stash and moment passes. Needs
    Morton-presorted clouds (registration_cpd_2d sorts) so each shard's
    tiles are spatially compact.

    ``init``: packed (D*D + D + 1,) warm-start (lin, t, scale) — always an
    array (the caller packs identity when no warm start was given).
    ``sigma2_init``: scalar; <= 0 keeps the squared_kernel_sum default.
    """
    dim = ys_t_sh.shape[0]
    eps = jnp.asarray(_F32_EPS, ys_t_sh.dtype)
    lowrank_kind = kind == "nonrigid_lowrank"
    k = u_sh.shape[1] if lowrank_kind else 0
    if init is None:
        init = jnp.concatenate([
            jnp.eye(dim, dtype=ys_t_sh.dtype).ravel(),
            jnp.zeros((dim,), ys_t_sh.dtype),
            jnp.ones((1,), ys_t_sh.dtype)])
    if sigma2_init is None:
        sigma2_init = jnp.asarray(-1.0, ys_t_sh.dtype)

    u_spec = P(M_AXIS, None) if lowrank_kind else P(None, None)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, M_AXIS), P(None, M_AXIS),
                  P(None, N_AXIS), P(None, N_AXIS), u_spec, P(), P(),
                  P(), P()),
        out_specs=(P(), P(), P(), P(), P()),
        # pallas_call outputs carry no varying-mesh-axes annotation; the
        # culled branch would fail shard_map's vma check otherwise.
        check_vma=False,
    )
    def run(ys_loc, sm, xs_loc, xm, u_loc, lam_, lmd_, init_, s2i_):
        # ---- masked squared_kernel_sum sigma2_0 (reference math_utils:28),
        # both axes partial: psum_m the source sums, psum_n the target sums.
        sy2 = jax.lax.psum(jnp.sum(ys_loc * ys_loc * sm), M_AXIS)
        sy = jax.lax.psum(jnp.sum(ys_loc * sm, axis=1), M_AXIS)
        sx2 = jax.lax.psum(jnp.sum(xs_loc * xs_loc * xm), N_AXIS)
        sx = jax.lax.psum(jnp.sum(xs_loc * xm, axis=1), N_AXIS)
        sigma2_0 = (n * sy2 + m * sx2 - 2.0 * jnp.dot(sy, sx)) \
            / float(m * dim * n)
        sigma2_0 = jnp.where(s2i_ > 0.0, jnp.maximum(s2i_, eps), sigma2_0)
        q0 = 1.0 + n * dim * 0.5 * jnp.log(sigma2_0)

        x2 = jnp.sum(xs_loc * xs_loc, axis=0, keepdims=True)   # (1, Nl)
        xs_ext = jnp.concatenate([xs_loc, jnp.ones_like(xm)], axis=0)

        def estep(t_src, sigma2):
            """Local block + cross-device normalizer. Returns m-sharded
            (px_t (D, Ml), p1 (Ml,)) and replicated (n_p, xx)."""
            c = estep_ops.outlier_constant(sigma2, w, m, n, dim)
            if use_culled:
                from ..ops import estep_pallas as ep

                _, p1_loc, px_loc, xx_part = ep.fused_stash_core_spmd(
                    t_src, xs_loc, sm, xm, sigma2, c, m_axis=M_AXIS,
                    tile_m=culled_tile, tile_n=culled_tile,
                    interpret=culled_interpret)
                pxp = jax.lax.psum(jnp.concatenate(
                    [px_loc, p1_loc[None, :]], axis=0), N_AXIS)
                px_t, p1 = pxp[:dim], pxp[dim]
                n_p = jax.lax.psum(jnp.sum(p1), M_AXIS)
                xx = jax.lax.psum(xx_part, N_AXIS)
                return px_t, p1, n_p, xx
            y2 = jnp.sum(t_src * t_src, axis=0)[:, None]       # (Ml, 1)
            xy = jax.lax.dot_general(
                t_src, xs_loc, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)           # (Ml, Nl)
            g = jnp.exp(-jnp.maximum(y2 + x2 - 2.0 * xy, 0.0)
                        / (2.0 * sigma2))
            g = g * sm.T * xm                                  # mask pads
            # THE cross-tile softmax denominator (SURVEY §7 hard part (a)):
            # each column's normalizer spans every source shard.
            den_raw = jax.lax.psum(
                jnp.sum(g, axis=0, keepdims=True), M_AXIS)     # (1, Nl)
            den = jnp.where(den_raw == 0.0, eps, den_raw) + c
            pt1 = xm * den_raw / den                           # (1, Nl)
            pmat = g / den
            pxp = jax.lax.psum(jax.lax.dot_general(
                xs_ext, pmat, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST), N_AXIS)  # (D+1, Ml)
            px_t, p1 = pxp[:dim], pxp[dim]
            n_p = jax.lax.psum(jnp.sum(p1), M_AXIS)
            xx = jax.lax.psum(jnp.sum(pt1 * x2), N_AXIS)
            return px_t, p1, n_p, xx

        def mstep_rigid(p1, px_t, n_p, xx):
            us = jnp.asarray(update_scale)
            mu_x = jax.lax.psum(jnp.sum(px_t, axis=1), M_AXIS) / n_p
            mu_y = jax.lax.psum(ys_loc @ p1, M_AXIS) / n_p
            src_hat = (ys_loc - mu_y[:, None]) * sm            # (D, Ml)
            a = jax.lax.psum(jax.lax.dot_general(
                px_t, src_hat, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST), M_AXIS) \
                - jnp.outer(mu_x, jax.lax.psum(src_hat @ p1, M_AXIS))
            u_, _, vh = jnp.linalg.svd(a, full_matrices=True)
            cdet = jnp.ones(dim, a.dtype).at[-1].set(
                jnp.linalg.det(u_ @ vh))
            rot = (u_ * cdet) @ vh
            tr_atr = jnp.trace(a.T @ rot)
            tr_yp1y = jax.lax.psum(
                jnp.sum(p1 * jnp.sum(src_hat * src_hat, axis=0)), M_AXIS)
            scale = jnp.where(us, tr_atr / tr_yp1y, 1.0)
            t = mu_x - scale * rot @ mu_y
            tr_xp1x = xx - n_p * jnp.sum(mu_x * mu_x)
            sigma2 = jnp.where(
                us,
                (tr_xp1x - scale * tr_atr) / (n_p * dim),
                (tr_xp1x - 2.0 * scale * tr_atr + tr_yp1y) / (n_p * dim))
            sigma2 = jnp.maximum(sigma2, _F32_EPS)
            q = (tr_xp1x - 2.0 * scale * tr_atr
                 + scale ** 2 * tr_yp1y) / (2.0 * sigma2)
            q = q + dim * n_p * 0.5 * jnp.log(sigma2)
            return rot, t, scale, sigma2, q

        def mstep_affine(p1, px_t, n_p, xx):
            mu_x = jax.lax.psum(jnp.sum(px_t, axis=1), M_AXIS) / n_p
            mu_y = jax.lax.psum(ys_loc @ p1, M_AXIS) / n_p
            src_hat = (ys_loc - mu_y[:, None]) * sm
            a = jax.lax.psum(jax.lax.dot_general(
                px_t, src_hat, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST), M_AXIS) \
                - jnp.outer(mu_x, jax.lax.psum(src_hat @ p1, M_AXIS))
            yp1y = jax.lax.psum(jax.lax.dot_general(
                src_hat * p1[None, :], src_hat, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST), M_AXIS)
            b = jnp.linalg.solve(yp1y.T, a.T).T
            t = mu_x - b @ mu_y
            tr_xp1x = xx - n_p * jnp.sum(mu_x * mu_x)
            tr_ab = jnp.trace(a @ b.T)
            sigma2 = jnp.maximum((tr_xp1x - tr_ab) / (n_p * dim), _F32_EPS)
            q = (tr_xp1x - tr_ab) / (2.0 * sigma2) \
                + dim * n_p * 0.5 * jnp.log(sigma2)
            return b, t, jnp.asarray(1.0, ys_loc.dtype), sigma2, q

        if lowrank_kind:
            # State: zc_t (D, K) replicated; U stays m-sharded forever.
            eye_k = jnp.eye(k, dtype=ys_loc.dtype)

            def body(state):
                zc_t, sigma2, q, _, i = state
                t_src = ys_loc + jax.lax.dot_general(
                    zc_t, u_loc, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)       # (D, Ml)
                px_t, p1, n_p, xx = estep(t_src, sigma2)
                cc = lmd_ * sigma2
                rhs_t = px_t - ys_loc * p1[None, :]
                udu = jax.lax.psum(
                    (u_loc * p1[:, None]).T @ u_loc, M_AXIS)   # (K, K)
                mk = cc * eye_k + udu * lam_[None, :]
                ru = jax.lax.psum(jax.lax.dot_general(
                    rhs_t, u_loc, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST), M_AXIS)  # (D, K)
                z_t = jnp.linalg.solve(mk, ru.T).T
                zc_t_new = z_t * lam_[None, :]
                t_t = ys_loc + jax.lax.dot_general(
                    zc_t_new, u_loc, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                tr_pxt = jax.lax.psum(jnp.sum(px_t * t_t), M_AXIS)
                tr_tpt = jax.lax.psum(
                    jnp.sum(p1 * jnp.sum(t_t * t_t, axis=0)), M_AXIS)
                sigma2_new = jnp.maximum(
                    (xx - 2.0 * tr_pxt + tr_tpt) / (n_p * dim), _F32_EPS)
                return (zc_t_new, sigma2_new, sigma2_new, q, i + 1)

            def cond(state):
                _, _, q, q_prev, i = state
                return jnp.logical_and(
                    i < maxiter,
                    jnp.logical_or(i == 0, jnp.abs(q - q_prev) >= tol))

            state = (jnp.zeros((dim, k), ys_loc.dtype), sigma2_0,
                     jnp.asarray(jnp.inf, sigma2_0.dtype),
                     jnp.asarray(jnp.inf, sigma2_0.dtype), jnp.asarray(0))
            zc_t, sigma2, q, _, _ = jax.lax.while_loop(cond, body, state)
            # Pack zc_t into the (lin, t) slots (lin is (D, D); zc is
            # returned via a dedicated out below). Simplest: return zc_t
            # padded into a (D, K) out — shapes differ from rigid, so the
            # kinds just use different return tuples.
            return zc_t, jnp.zeros(dim, ys_loc.dtype), \
                jnp.asarray(1.0, ys_loc.dtype), sigma2, q

        def step(lin, t, scale, sigma2):
            t_src = scale * lin @ ys_loc + t[:, None]
            px_t, p1, n_p, xx = estep(t_src, sigma2)
            if kind == "rigid":
                return mstep_rigid(p1, px_t, n_p, xx)
            return mstep_affine(p1, px_t, n_p, xx)

        def cond(state):
            _, _, _, _, q, q_prev, i = state
            return jnp.logical_and(
                i < maxiter,
                jnp.logical_or(i == 0, jnp.abs(q - q_prev) >= tol))

        def body(state):
            lin, t, scale, sigma2, q, _, i = state
            lin, t, scale, sigma2, q_new = step(lin, t, scale, sigma2)
            return (lin, t, scale, sigma2, q_new, q, i + 1)

        state = (init_[: dim * dim].reshape(dim, dim),
                 init_[dim * dim: dim * dim + dim],
                 init_[dim * dim + dim], sigma2_0, q0,
                 jnp.asarray(jnp.inf, ys_loc.dtype), jnp.asarray(0))
        lin, t, scale, sigma2, q, _, _ = jax.lax.while_loop(cond, body, state)
        return lin, t, scale, sigma2, q

    return run(ys_t_sh, smask_sh, xs_t_sh, xmask_sh, u_sh, lam, lmd,
               jnp.asarray(init, ys_t_sh.dtype),
               jnp.asarray(sigma2_init, ys_t_sh.dtype))


def registration_cpd_2d(
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
    rank: Optional[int] = None,
    **kwargs: Any,
):
    """CPD registration on a 2-D ``(m, n)`` device mesh.

    Same semantics as :func:`probreg_tpu.cpd.registration_cpd` for 'rigid',
    'affine' and low-rank 'nonrigid' (``rank`` required: the dense M x M
    Gram solve does not distribute; the Woodbury K x K system does). Both
    clouds are sharded; no device holds an M-row or N-row array.
    """
    from .. import cpd as cpd_mod

    if mesh is None:
        mesh = make_mesh_2d()
    _check_mesh_2d(mesh, "registration_cpd_2d")

    src = np.asarray(interop.as_points(source, dtype=config.dtype))
    tgt = np.asarray(interop.as_points(target, dtype=config.dtype))
    m, dim = src.shape
    n = tgt.shape[0]

    use_culled = kwargs.pop("use_culled", None)
    culled_interpret = bool(kwargs.pop("culled_interpret", False))
    culled_tile = int(kwargs.pop("culled_tile", 512))
    tf_init_params = dict(kwargs.pop("tf_init_params", None) or {})
    sigma2_init = kwargs.pop("sigma2_init", None)
    if kwargs:
        # Silently dropping e.g. a misspelled warm-start kwarg would return
        # a cold-start registration that LOOKS like it honored the arg.
        raise TypeError(f"registration_cpd_2d: unknown kwargs {sorted(kwargs)}")
    if tf_init_params and tf_type_name == "nonrigid":
        raise ValueError("tf_init_params is rigid/affine-only on the 2-D "
                         "mesh (the low-rank field has no packed init)")
    if use_culled is None:
        use_culled = (jax.default_backend() == "tpu"
                      and config.use_culled_estep
                      and m * n >= config.culled_estep_min_pairs)
    inv_perm = None
    if use_culled:
        # One-time host Morton sort: each contiguous shard (and each tile
        # within it) becomes spatially compact so the per-device tile
        # culling fires. Rigid/affine results are order-free; the low-rank
        # U rows are un-permuted below before building the returned
        # transformation (its transform is positional).
        from ..ops.spatial import morton_order_np

        perm_s = morton_order_np(src)
        src = src[perm_s]
        tgt = tgt[morton_order_np(tgt)]
        inv_perm = np.argsort(perm_s)

    if tf_type_name == "nonrigid":
        if rank is None:
            raise ValueError(
                "2-D-mesh nonrigid requires rank= (low-rank Nystrom): the "
                "dense M x M Gram solve does not distribute over the m-axis")
        # Nystrom factors from the full source on the host driver (O(M K)),
        # then sharded over m alongside the points.
        u, lam = lowrank.lowrank_rbf(jnp.asarray(src), float(beta), int(rank))
        u = np.asarray(u)
        kind = "nonrigid_lowrank"
    else:
        if tf_type_name not in ("rigid", "affine"):
            raise ValueError("unknown tf_type_name %s" % tf_type_name)
        u = np.zeros((0, 0), src.dtype)
        lam = jnp.zeros((0,), config.dtype)
        kind = tf_type_name

    ys_t_sh, smask_sh, m_true = _shard_axis_t(src, mesh, M_AXIS)
    xs_t_sh, xmask_sh, n_true = _shard_axis_t(tgt, mesh, N_AXIS)
    if kind == "nonrigid_lowrank":
        pad = ys_t_sh.shape[1] - m
        if pad:
            u = np.concatenate([u, np.zeros((pad, u.shape[1]), u.dtype)], 0)
        u_sh = jax.device_put(u, NamedSharding(mesh, P(M_AXIS, None)))
    else:
        u_sh = jax.device_put(u, NamedSharding(mesh, P(None, None)))

    # Always materialize the packed init and the sigma2 sentinel as host
    # arrays: _run_em_2d is jitted with them as traced args, so a None
    # leaf (cold call) vs an array (warm call) would compile the whole-EM
    # program TWICE per shape (cf. the identical rule for the BCPD resume
    # in bcpd._registration_jit).
    p = tf_init_params or {}
    key = "rot" if tf_type_name == "rigid" else "b"
    init = np.concatenate([
        np.asarray(p.get(key, np.eye(dim)), np.float32).ravel(),
        np.asarray(p.get("t", np.zeros(dim)), np.float32),
        np.atleast_1d(np.float32(p.get("scale", 1.0)))])
    s2i = np.float32(-1.0 if sigma2_init is None else sigma2_init)
    lin, t, scale, sigma2, q = _run_em_2d(
        ys_t_sh, smask_sh, xs_t_sh, xmask_sh, u_sh,
        jnp.asarray(lam, config.dtype), jnp.asarray(lmd, config.dtype),
        init, s2i,
        kind=kind, w=float(w), maxiter=int(maxiter), tol=float(tol),
        update_scale=bool(update_scale), m=m_true, n=n_true, mesh=mesh,
        use_culled=bool(use_culled), culled_interpret=culled_interpret,
        culled_tile=culled_tile)

    if kind == "rigid":
        transf = tf.RigidTransformation(lin, t, scale)
    elif kind == "affine":
        transf = tf.AffineTransformation(lin, t)
    else:
        u_out = u[:m]
        if inv_perm is not None:
            # Back to the caller's row order: displacement = U zc is
            # positional, and (U[inv]) zc restores it exactly.
            u_out = u_out[inv_perm]
        transf = tf.LowRankNonRigidTransformation(
            lin.T, jnp.asarray(u_out), jnp.asarray(lam, config.dtype))
    return cpd_mod.MstepResult(transf, sigma2, q)


# --------------------------------------------------------------------------
# FilterReg on the 2-D mesh
# --------------------------------------------------------------------------
#
# FilterReg's E-step moments M0/M1(/M2/NX) are PER-SOURCE-ROW sums over the
# target (reference filterreg.py:78-108) — no column normalizer, so the
# m-axis needs no den psum; the moments psum over n and stay m-sharded. The
# M-step reductions (weighted Kabsch centroids/covariance, pt2pl J^T J) are
# all sums over source rows: local partial sums + one psum_m yield the
# replicated D x D / 6 x 6 system every device solves identically.

@partial(jax.jit,
         static_argnames=("objective_type", "update_sigma2", "w",
                          "maxiter", "min_sigma2", "sigma2_decay",
                          "auto_sigma2", "m", "n", "mesh"))
def _run_filterreg_2d(ys_t_sh, smask_sh, xs_t_sh, xmask_sh, nrm_t_sh,
                      sigma2_in, init=None, *, objective_type,
                      update_sigma2, w, maxiter, tol, min_sigma2,
                      sigma2_decay, auto_sigma2, m, n, mesh):
    from .. import filterreg as frg_mod

    dim = ys_t_sh.shape[0]
    pt2pl = objective_type == "pt2pl"
    nrm_spec = P(None, N_AXIS) if pt2pl else P()
    if init is None:  # pragma: no cover - callers pass arrays (jit cache)
        init = np.concatenate([np.eye(dim, dtype=np.float32).ravel(),
                               np.zeros(dim, np.float32)])

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, M_AXIS), P(None, M_AXIS),
                  P(None, N_AXIS), P(None, N_AXIS), nrm_spec, P(), P()),
        out_specs=(P(), P(), P(), P()),
    )
    def run(ys_loc, sm, xs_loc, xm, nrm_loc, s2_in, init_):
        x2 = jnp.sum(xs_loc * xs_loc, axis=0, keepdims=True)   # (1, Nl)

        # ---- sigma2_0 (same init as registration_filterreg's fast path)
        if auto_sigma2 and pt2pl:
            # Target point-spacing: each n-shard queries the FULL target
            # (one all_gather; replicated over the m-axis). The NN scan
            # STREAMS over target blocks — materializing the full
            # (N/Pn, N) distance matrix would break the module's
            # O(M/Pm * N/Pn) per-device memory contract at exactly the
            # scale this mesh exists for.
            xs_full = jax.lax.all_gather(xs_loc, N_AXIS, axis=1, tiled=True)
            msk_full = jax.lax.all_gather(xm, N_AXIS, axis=1, tiled=True)
            nf = xs_full.shape[1]
            blk = min(4096, nf)
            pad = (-nf) % blk
            xs_p = jnp.pad(xs_full, ((0, 0), (0, pad)))
            mk_p = jnp.pad(msk_full, ((0, 0), (0, pad)))
            nb = (nf + pad) // blk
            xs_b = xs_p.reshape(dim, nb, blk).transpose(1, 0, 2)
            mk_b = mk_p.reshape(1, nb, blk).transpose(1, 0, 2)

            def _nn_blk(carry, b):
                xb, mb = b
                x2b = jnp.sum(xb * xb, axis=0, keepdims=True)
                d2 = jnp.maximum(
                    x2.T + x2b - 2.0 * jax.lax.dot_general(
                        xs_loc, xb, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST), 0.0)
                invalid = (xm.T <= 0.0) | (mb <= 0.0) | (d2 <= 1e-12)
                return jnp.minimum(
                    carry,
                    jnp.min(jnp.where(invalid, jnp.inf, d2), axis=1)), None

            # Carry derives from x2 so it carries the same
            # varying-mesh-axes annotation as the body output.
            nn2, _ = jax.lax.scan(
                _nn_blk, jnp.full_like(x2[0], jnp.inf), (xs_b, mk_b))
            nn2 = jnp.where(jnp.isfinite(nn2), nn2, 0.0)
            cnt = jax.lax.psum(jnp.sum(xm), N_AXIS)
            sigma2_0 = jax.lax.psum(jnp.sum(nn2), N_AXIS) \
                / jnp.maximum(cnt, 1.0)
            sigma2_0 = jnp.maximum(sigma2_0, min_sigma2 * 0.01)
        elif auto_sigma2:
            sy2 = jax.lax.psum(jnp.sum(ys_loc * ys_loc * sm), M_AXIS)
            sy = jax.lax.psum(jnp.sum(ys_loc * sm, axis=1), M_AXIS)
            sx2 = jax.lax.psum(jnp.sum(xs_loc * xs_loc * xm), N_AXIS)
            sx = jax.lax.psum(jnp.sum(xs_loc * xm, axis=1), N_AXIS)
            sigma2_0 = (n * sy2 + m * sx2 - 2.0 * jnp.dot(sy, sx)) \
                / float(m * dim * n)
            sigma2_0 = jnp.maximum(sigma2_0, min_sigma2)
        else:
            sigma2_0 = s2_in

        chans = [xm, xs_loc]
        if update_sigma2:
            chans.append(x2 * xm)
        if pt2pl:
            chans.append(nrm_loc)
        v_t = jnp.concatenate(chans, axis=0)                   # (C, Nl)

        def step(rot, t, sigma2):
            t_src = rot @ ys_loc + t[:, None]                  # (D, Ml)
            y2 = jnp.sum(t_src * t_src, axis=0)[:, None]
            xy = jax.lax.dot_general(
                t_src, xs_loc, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            kk = jnp.exp(-jnp.maximum(y2 + x2 - 2.0 * xy, 0.0)
                         * (0.5 / sigma2)) * xm
            mom = jax.lax.psum(jax.lax.dot_general(
                v_t, kk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST), N_AXIS)  # (C, Ml)
            m0 = mom[0]
            m1_t = mom[1:1 + dim]
            col = 1 + dim
            m2 = None
            if update_sigma2:
                m2 = mom[col]
                col += 1
            nx_t = mom[col:col + dim] if pt2pl else None

            c = frg_mod._outlier_c(sigma2, w, m, n, dim)
            mask = (m0 > 0.0).astype(t_src.dtype) * sm[0]
            m0_safe = jnp.maximum(m0, frg_mod._EPS)
            m1m0_t = m1_t / m0_safe[None, :]
            m0m0 = m0 / jnp.maximum(m0 + c, frg_mod._EPS)
            drxdx = mask * jnp.sqrt(m0m0 / sigma2)
            if pt2pl:
                nxm0_t = nx_t / m0_safe[None, :]
                tw, q = _pt2pl_2d(t_src, m1m0_t, nxm0_t, drxdx)
                from ..utils import se3_op as so

                rot_n, t_n = so.twist_mul(tw, rot, t)
            else:
                dr, dt = _kabsch_2d(t_src, m1m0_t, drxdx)
                rx2 = jnp.sum(
                    (drxdx[None, :] * (t_src - m1m0_t)) ** 2, axis=0)
                q = jax.lax.psum(jnp.sum(jnp.sqrt(rx2)), M_AXIS)
                rot_n, t_n = dr @ rot, dr @ t + dt
            if m2 is None:
                return rot_n, t_n, sigma2 * sigma2_decay, q
            num = m0 * jnp.sum(t_src * t_src, axis=0) \
                - 2.0 * jnp.sum(t_src * m1_t, axis=0) + m2
            s2 = jax.lax.psum(jnp.sum(
                mask * num / jnp.maximum(m0 + c, frg_mod._EPS)), M_AXIS)
            s2 = s2 / (dim * jnp.maximum(
                jax.lax.psum(jnp.sum(mask * m0m0), M_AXIS), frg_mod._EPS))
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

        state = (init_[: dim * dim].reshape(dim, dim),
                 init_[dim * dim:], sigma2_0,
                 jnp.asarray(jnp.inf, ys_loc.dtype),
                 jnp.asarray(jnp.inf, ys_loc.dtype), jnp.asarray(0))
        rot, t, sigma2, q, _, _ = jax.lax.while_loop(cond, body, state)
        return rot, t, sigma2, q

    nrm = nrm_t_sh if nrm_t_sh is not None else sigma2_in
    return run(ys_t_sh, smask_sh, xs_t_sh, xmask_sh, nrm, sigma2_in,
               jnp.asarray(init, config.dtype))


def _kabsch_2d(model_t, target_t, w):
    """KEEP IN SYNC with filterreg._kabsch_t — this is that solver with
    jax.lax.psum(..., M_AXIS) wrapped around each source-row reduction
    (3-D SVD path only; the 2-D closed-form branch of the single-device
    twin is not ported — the 2-D mesh entry points are 3-D clouds).

    filterreg._kabsch_t with every source-row reduction psum_m'd.
    Inputs are m-sharded (D, Ml) columns; the returned (rot, t) is the
    replicated solve of the psum'd centroids/covariance."""
    dim = model_t.shape[0]
    total = jax.lax.psum(jnp.sum(w), M_AXIS)
    safe = jnp.where(total == 0.0, 1.0, total)
    mc = jax.lax.psum(model_t @ w, M_AXIS) / safe
    tc = jax.lax.psum(target_t @ w, M_AXIS) / safe
    w2 = w * w
    hh = jax.lax.psum(jax.lax.dot_general(
        (model_t - mc[:, None]) * w2[None, :], target_t - tc[:, None],
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST), M_AXIS)
    h_weight = jax.lax.psum(jnp.sum(w2), M_AXIS)
    hh = hh / jnp.where(h_weight == 0.0, 1.0, h_weight)
    u, _, vh = jnp.linalg.svd(hh)
    s = jnp.ones(dim, hh.dtype).at[-1].set(jnp.linalg.det(u @ vh.T))
    r = (vh.T * s) @ u.T
    t = tc - r @ mc
    eye = jnp.eye(dim, dtype=model_t.dtype)
    r = jnp.where(total == 0.0, eye, r)
    t = jnp.where(total == 0.0, jnp.zeros_like(t), t)
    return r, t


def _pt2pl_2d(model_t, target_t, normal_t, w):
    """KEEP IN SYNC with filterreg._pt2pl_t (same psum-wrapped port as
    _kabsch_2d above).

    filterreg._pt2pl_t with the 6x6 GN system psum_m'd."""
    resid = jnp.sum(normal_t * (target_t - model_t), axis=0)
    cx = model_t[1] * normal_t[2] - model_t[2] * normal_t[1]
    cy = model_t[2] * normal_t[0] - model_t[0] * normal_t[2]
    cz = model_t[0] * normal_t[1] - model_t[1] * normal_t[0]
    jac = jnp.stack([cx, cy, cz, normal_t[0], normal_t[1], normal_t[2]])
    ata = jax.lax.psum(jax.lax.dot_general(
        jac * w[None, :], jac, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST), M_AXIS)          # (6, 6)
    atb = jax.lax.psum(jac @ (w * resid), M_AXIS)
    r_sum = jax.lax.psum(jnp.sum(w * w * resid * resid), M_AXIS)
    degenerate = jnp.max(jnp.abs(ata)) == 0.0
    safe_ata = jnp.where(degenerate, jnp.eye(6, dtype=ata.dtype), ata)
    tw = jnp.linalg.lstsq(safe_ata, atb, rcond=1e-6)[0]
    tw = jnp.where(degenerate, jnp.zeros_like(tw), tw)
    wn = jnp.linalg.norm(tw[:3])
    tw = tw * jnp.minimum(1.0, 0.5 / jnp.maximum(wn, 1e-12))
    return tw, r_sum


def registration_filterreg_2d(
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
    """Rigid FilterReg on a 2-D ``(m, n)`` mesh: BOTH clouds sharded.

    Same semantics as registration_filterreg's fast path /
    registration_filterreg_sharded; per-device memory is O(M/Pm * N/Pn)
    and no device holds an M-row or N-row array. Returns an MstepResult.
    """
    from .. import filterreg as frg_mod

    if mesh is None:
        mesh = make_mesh_2d()
    _check_mesh_2d(mesh, "registration_filterreg_2d")
    ys_t_sh, smask_sh, m = _shard_axis_t(source, mesh, M_AXIS)
    xs_t_sh, xmask_sh, n = _shard_axis_t(target, mesh, N_AXIS)
    nrm_t_sh = None
    if objective_type == "pt2pl":
        if target_normals is None:
            raise ValueError("pt2pl requires target_normals.")
        nrm_t_sh, _, _ = _shard_axis_t(target_normals, mesh, N_AXIS)
    elif objective_type != "pt2pt":
        raise ValueError("unknown objective_type %s" % objective_type)
    # Packed warm start — ALWAYS materialized HERE, outside the jit
    # boundary, so cold (identity) and warm calls present the same
    # argument pytree and share one compiled program.
    p = dict(tf_init_params or {})
    dim0 = int(ys_t_sh.shape[0])
    init = np.concatenate([
        np.asarray(p.get("rot", np.eye(dim0)), np.float32).ravel(),
        np.asarray(p.get("t", np.zeros(dim0)), np.float32)])
    rot, t, sigma2_out, q = _run_filterreg_2d(
        ys_t_sh, smask_sh, xs_t_sh, xmask_sh, nrm_t_sh,
        jnp.asarray(0.0 if sigma2 is None else sigma2, config.dtype),
        init,
        objective_type=objective_type, update_sigma2=bool(update_sigma2),
        w=float(w), maxiter=int(maxiter), tol=float(tol),
        min_sigma2=float(min_sigma2), sigma2_decay=float(sigma2_decay),
        auto_sigma2=sigma2 is None, m=m, n=n, mesh=mesh)
    return frg_mod.MstepResult(tf.RigidTransformation(rot, t), sigma2_out, q)


def _check_mesh_2d(mesh: Mesh, who: str):
    if len(mesh.axis_names) != 2:
        raise ValueError(f"{who} needs a 2-D mesh; got axes "
                         f"{mesh.axis_names}")
    if tuple(mesh.axis_names) != (M_AXIS, N_AXIS):
        raise ValueError(f"2-D mesh axes must be named ({M_AXIS!r}, "
                         f"{N_AXIS!r}); got {mesh.axis_names}")


# --------------------------------------------------------------------------
# BCPD (low-rank) on the 2-D mesh
# --------------------------------------------------------------------------
#
# The VI E-step has the SAME column normalizer as CPD (den_j sums over all
# source rows, reference bcpd.py:64) -> psum_m; its moments nu/px/s1 psum
# over n and stay m-sharded. The M-step distributes through the Woodbury
# factorization: U is m-sharded, the K x K core (U^T diag(nu) U) and the
# normal-equation strips psum over m, and diag(Sigma) / the v field are
# recovered row-locally from the replicated core — no device ever holds an
# M-row object (the dense M x M Sigma solve does not distribute; rank= is
# required).

@partial(jax.jit, static_argnames=("w", "maxiter", "m", "n", "mesh"))
def _run_bcpd_2d(ys_t_sh, smask_sh, xs_t_sh, xmask_sh, u_sh, lam, lmd, k,
                 sigma2_0, *, w, maxiter, tol, m, n, mesh,
                 init=None, v0_sh=None):
    """``init``: packed (D*D + D + 1,) replicated rigid warm start;
    ``v0_sh``: m-sharded (D, Ml) initial displacement field. Both are
    ALWAYS materialized (identity/zeros when absent) so warm and cold
    registrations share one compiled program (cf. _run_em_2d)."""
    dim = ys_t_sh.shape[0]
    krank = u_sh.shape[1]
    eps = jnp.asarray(_F32_EPS, ys_t_sh.dtype)
    if init is None:  # pragma: no cover - callers pass arrays (jit cache)
        init = np.concatenate([
            np.eye(dim, dtype=np.float32).ravel(),
            np.zeros(dim, np.float32), np.ones(1, np.float32)])
    if v0_sh is None:  # pragma: no cover - same
        v0_sh = jnp.zeros_like(ys_t_sh)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, M_AXIS), P(None, M_AXIS),
                  P(None, N_AXIS), P(None, N_AXIS), P(M_AXIS, None),
                  P(), P(), P(), P(), P(), P(None, M_AXIS)),
        out_specs=P(),
    )
    def run(ys_loc, sm, xs_loc, xm, u_loc, lam_, lmd_, k_, s2_0, init_,
            v0_loc):
        ml = ys_loc.shape[1]
        sm1 = sm[0]                                            # (Ml,)
        x2 = jnp.sum(xs_loc * xs_loc, axis=0, keepdims=True)   # (1, Nl)
        v_chan = jnp.concatenate([xs_loc, xm, x2 * xm], axis=0)
        eye_k = jnp.eye(krank, dtype=ys_loc.dtype)

        def estep(t_src_t, row, sigma2):
            """row: (Ml,) mixing/Sigma-correction factor (already masked).
            Returns m-sharded px_t/nu, replicated s1, per-row dmin."""
            y2 = jnp.sum(t_src_t * t_src_t, axis=0)[:, None]
            xy = jax.lax.dot_general(
                t_src_t, xs_loc, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            d2 = jnp.maximum(y2 + x2 - 2.0 * xy, 0.0)
            dmin = jnp.min(jnp.where(xm > 0, d2, jnp.inf), axis=1)
            dmin = jax.lax.pmin(dmin, N_AXIS)
            g = jnp.exp(-d2 / (2.0 * sigma2)) \
                / (2.0 * jnp.pi * sigma2) ** (dim * 0.5) * xm
            pmat = g * row[:, None]
            # Cross-device posterior normalizer (reference bcpd.py:64):
            # den_j spans every source shard.
            den = w / n + jax.lax.psum(
                jnp.sum(pmat, axis=0, keepdims=True), M_AXIS)
            den = jnp.where(den == 0.0, eps, den)
            pmat = pmat / den
            mom = jax.lax.psum(jax.lax.dot_general(
                v_chan, pmat, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST), N_AXIS)  # (D+2, Ml)
            px_t, nu = mom[:dim], mom[dim]
            s1 = jax.lax.psum(jnp.sum(mom[dim + 1]), M_AXIS)
            # Residual-form sigma2 numerator (bcpd._vi_mstep_t): d2 is
            # live here, so e1 = sum p * d2 is a scalar double-psum.
            e1 = jax.lax.psum(jax.lax.psum(
                jnp.sum(pmat * d2), N_AXIS), M_AXIS)
            return px_t, nu, s1, dmin, e1

        def body(state):
            (rot, t, scale, v_hat_t, sigma_diag, alpha, sigma2, _,
             rmse_prev, i, best) = state
            t_src_t = scale * rot @ (ys_loc + v_hat_t) + t[:, None]
            row = (1.0 - w) * alpha * jnp.exp(
                -(scale ** 2) / (2.0 * sigma2) * sigma_diag * dim) * sm1
            px_t, nu, s1, dmin, e1 = estep(t_src_t, row, sigma2)
            rmse = jax.lax.psum(
                jnp.sum(jnp.where(sm1 > 0, jnp.sqrt(dmin), 0.0)),
                M_AXIS) / m

            # ---- M-step (_vi_mstep_t with psum_m reductions)
            n_p = jnp.maximum(jax.lax.psum(jnp.sum(nu), M_AXIS), eps)
            x_hat_t = px_t / jnp.maximum(nu, eps)[None, :]
            s2s2 = scale ** 2 / (sigma2 ** 2)
            residual_t = rot.T @ ((x_hat_t - t[:, None]) / scale) - ys_loc
            # KEEP IN SYNC with ops/lowrank.regularized_sigma (the
            # single-device twin): this is its Woodbury-core algebra
            # (mk / s_core / sigma_diag) distributed — only the cmat
            # moment gains a psum over m; numerical fixes there (solve
            # conditioning, symmetrization) must be ported here.
            cmat = jax.lax.psum(
                (u_loc * nu[:, None]).T @ u_loc, M_AXIS)       # (K, K)
            mk = lmd_ * eye_k + s2s2 * lam_[:, None] * cmat
            s_core = jnp.diag(lam_) - s2s2 * jnp.linalg.solve(
                mk, lam_[:, None] * cmat * lam_[None, :])
            s_core = 0.5 * (s_core + s_core.T)
            sigma_diag_new = jnp.sum((u_loc @ s_core) * u_loc, axis=1) / lmd_
            strip = jax.lax.psum(jax.lax.dot_general(
                residual_t * nu[None, :], u_loc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST), M_AXIS)  # (D, K)
            v_new_t = (s2s2 / lmd_) * jax.lax.dot_general(
                strip @ s_core, u_loc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)           # (D, Ml)
            u_hat_t = ys_loc + v_new_t
            alpha_new = jnp.exp(
                jax.scipy.special.digamma(k_ + nu)
                - jax.scipy.special.digamma(k_ * m + n_p))
            x_m = jax.lax.psum(x_hat_t @ nu, M_AXIS) / n_p
            sigma2_m = jax.lax.psum(
                jnp.sum(nu * sigma_diag_new), M_AXIS) / n_p
            u_m = jax.lax.psum(u_hat_t @ nu, M_AXIS) / n_p
            u_hm = u_hat_t - u_m[:, None]
            s_xu = jax.lax.psum(jax.lax.dot_general(
                (x_hat_t - x_m[:, None]) * nu[None, :], u_hm,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST), M_AXIS) / n_p
            s_uu = jax.lax.psum(jax.lax.dot_general(
                u_hm * nu[None, :], u_hm, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST), M_AXIS) / n_p \
                + sigma2_m * jnp.eye(dim, dtype=ys_loc.dtype)
            phi, _, psih = jnp.linalg.svd(s_xu, full_matrices=True)
            cdet = jnp.ones(dim, ys_loc.dtype).at[-1].set(
                jnp.linalg.det(phi @ psih))
            rot_new = (phi * cdet) @ psih
            scale_new = jnp.trace(rot_new @ s_xu) / jnp.trace(s_uu)
            t_new = x_m - scale_new * rot_new @ u_m
            # Residual-form sigma2 update (bcpd._vi_mstep_t docstring):
            # e1 = sum p d2 from the E-step plus the v-update correction —
            # every term O(residual)-scale, so the expanded-form
            # catastrophic cancellation (raw update observed NEGATIVE at
            # 700k) never happens — and this runner IS the 1M-class path.
            # The f32 eps floor stays as a backstop.
            delta_t = scale * (rot @ (v_new_t - v_hat_t))   # (D, Ml)
            r_t = px_t - nu[None, :] * t_src_t              # (D, Ml)
            numer = (e1
                     - 2.0 * jax.lax.psum(jnp.sum(r_t * delta_t), M_AXIS)
                     + jax.lax.psum(
                         jnp.sum(nu * jnp.sum(delta_t * delta_t, axis=0)),
                         M_AXIS))
            sigma2_new = jnp.maximum(
                numer / (n_p * dim) + scale_new ** 2 * sigma2_m,
                jnp.finfo(jnp.float32).eps)

            b_rot, b_t, b_scale, b_v, b_s2, b_rmse = best
            better = rmse < b_rmse
            best = (jnp.where(better, rot, b_rot),
                    jnp.where(better, t, b_t),
                    jnp.where(better, scale, b_scale),
                    jnp.where(better, v_hat_t, b_v),
                    jnp.where(better, sigma2, b_s2),
                    jnp.minimum(rmse, b_rmse))
            return (rot_new, t_new, scale_new, v_new_t, sigma_diag_new,
                    alpha_new, sigma2_new, rmse, state[7], i + 1, best)

        def cond(state):
            rmse, rmse_prev, i = state[7], state[8], state[9]
            return jnp.logical_and(
                i < maxiter,
                jnp.logical_or(i < 2, jnp.abs(rmse - rmse_prev) >= tol))

        inf = jnp.asarray(jnp.inf, ys_loc.dtype)
        # m-sharded carries must start with the 'm' varying-mesh-axis
        # annotation their loop-body outputs have: v0_loc and
        # ones_like(sm1) inherit it from the sharded inputs.
        rot0 = init_[: dim * dim].reshape(dim, dim)
        t0 = init_[dim * dim: dim * dim + dim]
        scale0 = init_[dim * dim + dim]
        best0 = (rot0, t0, scale0, v0_loc, s2_0, inf)
        state = (
            rot0, t0, scale0, v0_loc,
            jnp.ones_like(sm1), sm1 / m, s2_0,
            inf, inf, jnp.asarray(0), best0,
        )
        state = jax.lax.while_loop(cond, body, state)
        rot, t, scale, v_hat_t = state[:4]
        b_rot, b_t, b_scale, b_v, b_s2, b_rmse = state[10]
        # Score the last iterate once; keep the better of (last, best).
        t_src_t = scale * rot @ (ys_loc + v_hat_t) + t[:, None]
        _, _, _, dmin, _ = estep(t_src_t, sm1, s2_0)
        rmse_last = jax.lax.psum(
            jnp.sum(jnp.where(sm1 > 0, jnp.sqrt(dmin), 0.0)), M_AXIS) / m
        use_last = rmse_last <= b_rmse
        rot = jnp.where(use_last, rot, b_rot)
        t = jnp.where(use_last, t, b_t)
        scale = jnp.where(use_last, scale, b_scale)
        v_hat_t = jnp.where(use_last, v_hat_t, b_v)
        # Return the SELECTED state's sigma2 (as _run_bcpd does): the
        # pyramid's next-level sigma2_init carry must be consistent with
        # the pose it warm-starts, not the final iterate's possibly
        # collapsed temperature.
        sigma2_out = jnp.where(use_last, state[6], b_s2)
        # Gather the v field to every device: the result must be host-
        # fetchable from EVERY controller in a multi-process run (an
        # m-sharded output spans non-addressable devices). Placement+psum
        # instead of all_gather so the output's varying-mesh-axes type is
        # invariant (all_gather output still types as m-varying).
        buf = jnp.zeros((dim, ml * jax.lax.axis_size(M_AXIS)),
                        v_hat_t.dtype)
        buf = jax.lax.dynamic_update_slice(
            buf, v_hat_t, (0, jax.lax.axis_index(M_AXIS) * ml))
        v_full = jax.lax.psum(buf, M_AXIS)
        # ONE packed result buffer: every piece fetched separately costs a
        # full tunnel RTT (~33 ms) on remote-TPU transports — the same fix
        # bcpd._fetch_last_host applies to the tracking warm-state carry.
        return jnp.concatenate([
            rot.ravel(), t, jnp.reshape(scale, (1,)),
            jnp.reshape(sigma2_out, (1,)), v_full.ravel()])

    return run(ys_t_sh, smask_sh, xs_t_sh, xmask_sh, u_sh, lam, lmd,
               jnp.asarray(k, config.dtype),
               jnp.asarray(sigma2_0, config.dtype),
               jnp.asarray(init, config.dtype), v0_sh)


def registration_bcpd_2d(
    source,
    target,
    w: float = 0.0,
    maxiter: int = 50,
    tol: float = 0.001,
    lmd: float = 2.0,
    k: float = 1.0e20,
    gamma: float = 1.0,
    rank: int = 64,
    normalize: bool = True,
    mesh: Optional[Mesh] = None,
    tf_init_params: Optional[dict] = None,
    v_init=None,
    sigma2_init: Optional[float] = None,
    return_sigma2: bool = False,
):
    """BCPD on a 2-D ``(m, n)`` mesh: BOTH clouds sharded, low-rank Sigma.

    Same semantics (incl. the default scale normalization) as
    registration_bcpd with ``rank=``; the VI E-step's posterior normalizer
    psums over the m-axis and the Woodbury Sigma update runs through
    psum_m'd K x K moments — per-device memory O(M/Pm * (N/Pn + K)).
    Returns a CombinedTransformation.

    ``tf_init_params`` ({'rot','t','scale'}), ``v_init`` ((M, D) field) and
    ``sigma2_init`` warm-start the VI in RAW coordinates (converted to the
    normalized frame here, like registration_bcpd) — the coarse-to-fine
    pyramid's carries compose with the 2-D mesh through these.
    """
    from ..ops import lowrank as lr

    if mesh is None:
        mesh = make_mesh_2d()
    _check_mesh_2d(mesh, "registration_bcpd_2d")
    if rank is None:
        raise ValueError("registration_bcpd_2d requires rank= (the dense "
                         "M x M Sigma solve does not distribute)")
    src = np.asarray(interop.as_points(source), dtype=np.float64)
    tgt = np.asarray(interop.as_points(target), dtype=np.float64)
    from ..utils import math_utils as mu_

    if normalize:
        centroid = np.concatenate([src, tgt], axis=0).mean(axis=0)
        scale0 = max(np.sqrt(mu_.squared_kernel_sum_np(src, tgt)), 1e-12)
    else:
        centroid, scale0 = np.zeros(src.shape[1]), 1.0
    src_n = ((src - centroid) / scale0).astype(np.float32)
    tgt_n = ((tgt - centroid) / scale0).astype(np.float32)

    # Nystrom factors from the full source on the host driver (O(M K)),
    # then sharded over m alongside the points.
    u, lam = lr.lowrank_imq(jnp.asarray(src_n), 1.0, int(rank))
    u = np.asarray(u)
    # squared_kernel_sum(src_n, tgt_n) == skc / scale0^2 (the mean pairwise
    # sqdist is invariant to the shared centroid shift), i.e. exactly 1.0
    # under normalization — computed host-side, no eager device dispatch
    # (CLAUDE.md: one jit dispatch per registration).
    if normalize:
        sigma2_0 = gamma
    else:
        sigma2_0 = gamma * mu_.squared_kernel_sum_np(src_n, tgt_n)

    # Raw -> normalized-frame warm starts (the inverse of the
    # denormalization below; cf. _registration_bcpd_impl).
    if sigma2_init is not None:
        # Same eps clamp as bcpd._registration_jit: a carried variance
        # may have collapsed to ~0; unclamped it reaches the kernel as
        # sigma2 = 0 and NaNs the first E-step.
        sigma2_0 = max(float(sigma2_init) / scale0 ** 2,
                       float(np.finfo(np.float32).eps))

    ys_t_sh, smask_sh, m = _shard_axis_t(src_n, mesh, M_AXIS)
    xs_t_sh, xmask_sh, n = _shard_axis_t(tgt_n, mesh, N_AXIS)
    pad = ys_t_sh.shape[1] - m
    if pad:
        u = np.concatenate([u, np.zeros((pad, u.shape[1]), u.dtype)], 0)
    u_sh = jax.device_put(u, NamedSharding(mesh, P(M_AXIS, None)))

    # Warm starts ALWAYS materialized here (outside the jit boundary) so
    # cold and warm calls share one compiled program. Cold = the
    # NORMALIZED-frame identity (t_n = 0, v_n = 0); with any warm piece
    # given, the exact raw->normalized conversion applies (v_raw defaults
    # to 0, which converts to v_n = centroid/scale0 — the two centroid
    # terms cancel in the composed transform).
    dim0 = src.shape[1]
    if tf_init_params or v_init is not None:
        p = dict(tf_init_params or {})
        t_n = (np.asarray(p.get("t", np.zeros(dim0)), np.float64)
               - centroid) / scale0
        init = np.concatenate([
            np.asarray(p.get("rot", np.eye(dim0)), np.float32).ravel(),
            t_n.astype(np.float32),
            np.asarray([p.get("scale", 1.0)], np.float32)])
        v_n = ((np.zeros_like(src) if v_init is None
                else np.asarray(v_init, np.float64)) + centroid) / scale0
        v_n = v_n.astype(np.float32)
    else:
        init = np.concatenate([
            np.eye(dim0, dtype=np.float32).ravel(),
            np.zeros(dim0, np.float32), np.ones(1, np.float32)])
        v_n = np.zeros_like(src_n)
    v0_sh, _, _ = _shard_axis_t(v_n, mesh, M_AXIS)

    flat = np.asarray(_run_bcpd_2d(
        ys_t_sh, smask_sh, xs_t_sh, xmask_sh, u_sh,
        jnp.asarray(lam, config.dtype), jnp.asarray(lmd, config.dtype),
        float(k), np.float32(sigma2_0),
        w=float(w), maxiter=int(maxiter), tol=float(tol), m=m, n=n,
        mesh=mesh, init=init, v0_sh=v0_sh), np.float64)  # ONE fetch
    dd = dim0 * dim0
    rot = flat[:dd].reshape(dim0, dim0)
    t = flat[dd: dd + dim0]
    scale = float(flat[dd + dim0])
    s2_out = float(flat[dd + dim0 + 1])
    v_hat = flat[dd + dim0 + 2:].reshape(dim0, -1)       # (D, M_padded)
    v_raw = scale0 * v_hat.T[:m] - centroid
    t_raw = scale0 * t + centroid
    out = tf.CombinedTransformation(rot, t_raw, scale, v_raw)
    if return_sigma2:
        # Final (annealed) VI sigma2 back in raw units — the pyramid carry.
        return out, s2_out * scale0 ** 2
    return out
