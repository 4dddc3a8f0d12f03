"""Weighted rigid solvers: Kabsch (2D/3D) and point-to-plane Gauss-Newton.

TPU-native equivalents of the reference C++ kernels
(probreg/cc/kabsch.cc, probreg/cc/point_to_plane.cc): the OpenMP
declare-reduction accumulations become single matmul/einsum reductions, the
3x3 SVD / 6x6 LDLT solves are tiny jnp.linalg calls. All functions are pure
jnp and safe inside jit/while_loop (the zero-weight early-outs of the C++
become jnp.where selects).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def weighted_kabsch(model: jax.Array, target: jax.Array, weight: jax.Array):
    """Weighted rigid fit r, t minimizing sum_i w_i^2 |r y_i + t - x_i|^2.

    Semantics of computeKabsch (kabsch.cc:6-56): centroids use weight w,
    the cross-covariance uses w^2; SVD with det-sign fix; dim 2 uses the
    closed-form atan2 rotation (kabsch.cc:58-109). Zero total weight returns
    identity.
    """
    dim = model.shape[1]
    w = jnp.asarray(weight)
    total = jnp.sum(w)
    safe_total = jnp.where(total == 0.0, 1.0, total)
    mc = w @ model / safe_total
    tc = w @ target / safe_total
    w2 = w * w
    hh = ((model - mc) * w2[:, None]).T @ (target - tc)
    h_weight = jnp.sum(w2)
    hh = hh / jnp.where(h_weight == 0.0, 1.0, h_weight)

    if dim == 2:
        angle = jnp.arctan2(hh[0, 1] - hh[1, 0], hh[0, 0] + hh[1, 1])
        ca, sa = jnp.cos(angle), jnp.sin(angle)
        r = jnp.array([[ca, -sa], [sa, ca]])
    else:
        u, _, vh = jnp.linalg.svd(hh)
        # det-sign fix: ss[2] = det(U V); jnp returns vh = V^T.
        s = jnp.ones(dim, hh.dtype).at[-1].set(jnp.linalg.det(u @ vh.T))
        r = (vh.T * s) @ u.T

    t = tc - r @ mc
    eye = jnp.eye(dim, dtype=model.dtype)
    r = jnp.where(total == 0.0, eye, r)
    t = jnp.where(total == 0.0, jnp.zeros_like(t), t)
    return r, t


def twist_for_pt2pl(model: jax.Array, target: jax.Array,
                    target_normal: jax.Array, weight: jax.Array):
    """One GN step for the point-to-plane objective (point_to_plane.cc:6-32).

    residual_k = n_k . (x_k - y_k); jac_k = [y_k x n_k; n_k] (6,);
    solve (sum w J J^T) tw = sum w r J;  q = sum w^2 r^2.
    """
    resid = jnp.sum(target_normal * (target - model), axis=1)
    cross = jnp.cross(model, target_normal)
    jac = jnp.concatenate([cross, target_normal], axis=1)  # (M, 6)
    ata = (jac * weight[:, None]).T @ jac
    atb = (weight * resid) @ jac
    r_sum = jnp.sum(weight * weight * resid * resid)
    # lstsq (SVD, min-norm) instead of the C++ LDLT: a single plane leaves a
    # 3-dim null space (in-plane motions); min-norm zeroes those components
    # instead of contaminating the twist.
    degenerate = jnp.max(jnp.abs(ata)) == 0.0
    safe_ata = jnp.where(degenerate, jnp.eye(6, dtype=ata.dtype), ata)
    tw = jnp.linalg.lstsq(safe_ata, atb, rcond=1e-6)[0]
    tw = jnp.where(degenerate, jnp.zeros_like(tw), tw)
    # Trust region: the GN linearization is only valid for small rotations.
    # The C++ takes the raw step, which can fling the cloud away on the first
    # iteration (the reference's own pt2pl e2e test is skipped for this);
    # clamp the step, preserving its direction.
    max_rot = 0.5
    wn = jnp.linalg.norm(tw[:3])
    scale = jnp.minimum(1.0, max_rot / jnp.maximum(wn, 1e-12))
    return tw * scale, r_sum
