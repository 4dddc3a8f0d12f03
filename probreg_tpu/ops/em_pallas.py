"""Whole-EM rigid CPD in ONE Pallas kernel launch.

The transposed-layout XLA fast path (cpd._run_em_t) still spends ~0.05 ms
per EM iteration at probreg-typical sizes — tens of kernel launches per
iteration against microseconds of math. This kernel runs the ENTIRE EM loop
(E-step, moments, rotation solve, sigma2/q updates, convergence test) inside
a single launch with every operand resident in VMEM.

Design notes:

* One MXU matmul yields the full distance matrix: with augmented operands
  A = [t_src; |t_src|^2; 1; bigmask_y; 1; 0] and
  B = [-2 xs; 1; |xs|^2; 1; bigmask_x; 0],  A^T B = d^2 (+BIG on any padded
  row/column, so padding underflows out of exp with no transposes/masks).
* One MXU matmul yields all moments: xs_ext = [xs; 1] rows against the
  normalized posterior gives px (rows 0-2) and p1 (row 3).
* The rotation update uses Horn's quaternion method instead of the SVD
  (which doesn't exist inside a kernel): the dominant eigenvector of the
  4x4 K(a^T) matrix — obtained by shifted power iteration — gives exactly
  the det-corrected optimal PROPER rotation of reference cpd.py:176-178
  (verified to 1e-15 against SVD+sign-fix including reflection cases).
* All small-matrix assembly (K from a, R from q q^T, the 8x8 homogeneous
  transform from R/t/scale) is done with constant embedding tensors and
  einsum — no scalar scatters, Mosaic-friendly.

Reference semantics: probreg/cpd.py:71-88 (E-step), :160-192 (M-step).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30
_POWER_SQUARINGS = 7


def _dominant_eigvec(kmat):
    """Unit dominant eigenvector of a symmetric 4x4 via repeated squaring.

    A plain shifted power iteration converges as ((l2+s)/(l1+s))^iters — the
    PSD shift pushes the ratio toward 1, and 30 iterations leave ~1e-3
    eigenvector error (enough to drift CPD rotations by degrees). Squaring
    the shifted matrix k times amplifies the gap to ratio^(2^k): 7
    squarings give ratio^128 suppression for a handful of 4x4 matmuls.
    """
    shift = jnp.sum(jnp.abs(kmat))
    ks = kmat + shift * jnp.eye(4, dtype=jnp.float32)
    ks = ks / jnp.sqrt(jnp.sum(ks * ks))

    def sq(_, m):
        m = jnp.dot(m, m, preferred_element_type=jnp.float32)
        return m / jnp.sqrt(jnp.sum(m * m))

    ks = jax.lax.fori_loop(0, _POWER_SQUARINGS, sq, ks)
    v = jnp.dot(ks, jnp.full((4, 1), 0.5, jnp.float32),
                preferred_element_type=jnp.float32)
    # One Rayleigh polish step against the original matrix.
    v = v / jnp.sqrt(jnp.sum(v * v))
    v = jnp.dot(kmat + shift * jnp.eye(4, dtype=jnp.float32), v,
                preferred_element_type=jnp.float32)
    return v / jnp.sqrt(jnp.sum(v * v))


def _flatten_rows(x, rows, cols):
    """(rows, cols) -> (1, rows*cols). Mosaic-safe: per-row lane rolls + a
    sublane reduction (reshape/concat-with-offset are not lowerable)."""
    total = rows * cols
    pad = jnp.pad(x, ((0, 0), (0, total - cols)))
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, total), 0)
    out = jnp.zeros((rows, total), x.dtype)
    for i in range(rows):
        rolled = pltpu.roll(pad, i * cols, 1)
        out = out + jnp.where(row_ids == i, rolled, 0.0)
    return jnp.sum(out, axis=0, keepdims=True)


def _unflatten_rows(x, rows, cols):
    """(1, rows*cols) -> (rows, cols) via broadcast + per-row lane rolls."""
    xb = jnp.broadcast_to(x, (rows, rows * cols))
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, rows * cols), 0)
    total = rows * cols
    out = jnp.zeros((rows, total), x.dtype)
    for i in range(rows):
        rolled = pltpu.roll(xb, (total - i * cols) % total, 1)
        out = out + jnp.where(row_ids == i, rolled, 0.0)
    return out[:, :cols]


def _k_from_a_tensor() -> np.ndarray:
    """(3,3,4,4) T with K = sum_ij a[i,j] T[i,j] for m = a^T (Horn)."""
    t = np.zeros((3, 3, 4, 4), np.float32)

    def add(mi, mj, k, l, s):
        # K[k,l] += s * m[mi,mj] and m = a^T -> a[mj,mi]
        t[mj, mi, k, l] += s

    # K row 0
    add(0, 0, 0, 0, 1); add(1, 1, 0, 0, 1); add(2, 2, 0, 0, 1)
    add(1, 2, 0, 1, 1); add(2, 1, 0, 1, -1)
    add(2, 0, 0, 2, 1); add(0, 2, 0, 2, -1)
    add(0, 1, 0, 3, 1); add(1, 0, 0, 3, -1)
    # row 1
    add(1, 2, 1, 0, 1); add(2, 1, 1, 0, -1)
    add(0, 0, 1, 1, 1); add(1, 1, 1, 1, -1); add(2, 2, 1, 1, -1)
    add(0, 1, 1, 2, 1); add(1, 0, 1, 2, 1)
    add(0, 2, 1, 3, 1); add(2, 0, 1, 3, 1)
    # row 2
    add(2, 0, 2, 0, 1); add(0, 2, 2, 0, -1)
    add(0, 1, 2, 1, 1); add(1, 0, 2, 1, 1)
    add(0, 0, 2, 2, -1); add(1, 1, 2, 2, 1); add(2, 2, 2, 2, -1)
    add(1, 2, 2, 3, 1); add(2, 1, 2, 3, 1)
    # row 3
    add(0, 1, 3, 0, 1); add(1, 0, 3, 0, -1)
    add(0, 2, 3, 1, 1); add(2, 0, 3, 1, 1)
    add(1, 2, 3, 2, 1); add(2, 1, 3, 2, 1)
    add(0, 0, 3, 3, -1); add(1, 1, 3, 3, -1); add(2, 2, 3, 3, 1)
    return t


def _r_from_qq_tensor() -> np.ndarray:
    """(4,4,3,3) T with R = sum_kl q[k] q[l] T[k,l] for unit q (w,x,y,z)."""
    t = np.zeros((4, 4, 3, 3), np.float32)
    w, x, y, z = 0, 1, 2, 3

    def add(qa, qb, i, j, s):
        t[qa, qb, i, j] += s * 0.5
        t[qb, qa, i, j] += s * 0.5

    add(w, w, 0, 0, 1); add(x, x, 0, 0, 1); add(y, y, 0, 0, -1); add(z, z, 0, 0, -1)
    add(x, y, 0, 1, 2); add(w, z, 0, 1, -2)
    add(x, z, 0, 2, 2); add(w, y, 0, 2, 2)
    add(x, y, 1, 0, 2); add(w, z, 1, 0, 2)
    add(w, w, 1, 1, 1); add(y, y, 1, 1, 1); add(x, x, 1, 1, -1); add(z, z, 1, 1, -1)
    add(y, z, 1, 2, 2); add(w, x, 1, 2, -2)
    add(x, z, 2, 0, 2); add(w, y, 2, 0, -2)
    add(y, z, 2, 1, 2); add(w, x, 2, 1, 2)
    add(w, w, 2, 2, 1); add(z, z, 2, 2, 1); add(x, x, 2, 2, -1); add(y, y, 2, 2, -1)
    return t


_K_T = _k_from_a_tensor().reshape(9, 16)
_R_T = _r_from_qq_tensor().reshape(16, 9)


def _em_kernel(consts_ref, ys_ref, bmat_ref, xs_ext_ref, x2_ref, bigy_ref,
               kt_ref, rt_ref, tmat_ref, out_ref):
    """consts (SMEM, 8): [wratio, maxiter, tol, update_scale, n_p_dim,
    sigma2_0, q0, dim]."""
    wratio = consts_ref[0]
    maxiter = consts_ref[1]
    tol = consts_ref[2]
    update_scale = consts_ref[3]
    dim = consts_ref[7]
    eps = jnp.float32(1.1920929e-07)
    k_t = kt_ref[:]
    r_t = rt_ref[:]

    ys = ys_ref[:]                # (8, Mp): rows [y0,y1,y2,1,0,0,0,0]
    bmat = bmat_ref[:]            # (8, Np)
    xs_ext = xs_ext_ref[:]        # (8, Np): rows [x0,x1,x2,1,0,0,0,0]
    x2 = x2_ref[:]                # (1, Np) (BIG on pads)
    bigy = bigy_ref[:]            # (1, Mp) (BIG on pads, else 0)
    ones_m = jnp.ones_like(bigy)
    zeros_m = jnp.zeros_like(bigy)
    x2m = jnp.where(x2 < _BIG * 0.5, x2, 0.0)

    def body(carry):
        tmat, sigma2, q_prev_unused, q_cur, it = carry
        inv2s2 = 0.5 / sigma2
        t_src = jax.lax.dot_general(
            tmat, ys, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)[:3]              # (3, Mp)
        y2 = jnp.sum(t_src * t_src, axis=0, keepdims=True)        # (1, Mp)
        a_aug = jnp.concatenate(
            [t_src, y2, ones_m, bigy, ones_m, zeros_m], axis=0)   # (8, Mp)
        d2 = jax.lax.dot_general(
            a_aug, bmat, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)                  # (Mp, Np)
        g = jnp.exp(-jnp.maximum(d2, 0.0) * inv2s2)
        den_raw = jnp.sum(g, axis=0, keepdims=True)               # (1, Np)
        c = wratio * jnp.exp(1.5 * jnp.log(2.0 * jnp.pi * sigma2))
        den = jnp.where(den_raw == 0.0, eps, den_raw) + c
        pt1 = den_raw / den
        pmat = g / den
        pxp = jax.lax.dot_general(
            xs_ext, pmat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)                  # (8, Mp)
        px_t = pxp[:3]
        p1 = pxp[3:4]                                             # (1, Mp)
        n_p = jnp.sum(p1)
        xx = jnp.sum(pt1 * x2m)

        mu_x = jnp.sum(px_t, axis=1, keepdims=True) / n_p         # (3, 1)
        ys3 = ys[:3]
        mu_y = jax.lax.dot_general(
            ys3, p1, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) / n_p             # (3, 1)
        src_hat = ys3 - mu_y
        a = jax.lax.dot_general(
            px_t, src_hat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                   # (3, 3)
        sh_p1 = jax.lax.dot_general(
            src_hat, p1, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                   # (3, 1)
        a = a - jnp.dot(mu_x, sh_p1.T, preferred_element_type=jnp.float32)

        # Horn rotation: K = (a -> 4x4), shifted power iteration.
        kmat = _unflatten_rows(
            jnp.dot(_flatten_rows(a, 3, 3), k_t,
                    preferred_element_type=jnp.float32), 4, 4)
        v = _dominant_eigvec(kmat)
        qq = jnp.dot(v, v.T, preferred_element_type=jnp.float32)  # (4, 4)
        rot = _unflatten_rows(
            jnp.dot(_flatten_rows(qq, 4, 4), r_t,
                    preferred_element_type=jnp.float32), 3, 3)

        tr_atr = jnp.sum(a * rot)
        tr_yp1y = jnp.sum(p1 * jnp.sum(src_hat * src_hat, axis=0,
                                       keepdims=True))
        scale = jnp.where(update_scale > 0.5, tr_atr / tr_yp1y,
                          jnp.float32(1.0))
        t_new = mu_x - scale * jnp.dot(rot, mu_y,
                                       preferred_element_type=jnp.float32)
        tr_xp1x = xx - n_p * jnp.sum(mu_x * mu_x)
        sigma2_new = jnp.where(
            update_scale > 0.5,
            (tr_xp1x - scale * tr_atr) / (n_p * dim),
            (tr_xp1x - 2.0 * scale * tr_atr + tr_yp1y) / (n_p * dim))
        sigma2_new = jnp.maximum(sigma2_new, eps)
        q_new = (tr_xp1x - 2.0 * scale * tr_atr
                 + scale * scale * tr_yp1y) / (2.0 * sigma2_new) \
            + dim * n_p * 0.5 * jnp.log(sigma2_new)

        # New homogeneous transform: rows 0-2 [scale*R | t].
        top = jnp.concatenate(
            [scale * rot, t_new,
             jnp.zeros((3, 4), jnp.float32)], axis=1)             # (3, 8)
        tmat_new = jnp.concatenate(
            [top, jnp.eye(8, dtype=jnp.float32)[3:]], axis=0)
        return (tmat_new, sigma2_new, q_cur, q_new, it + 1.0)

    def cond(carry):
        _, _, q_prev, q, it = carry
        return jnp.logical_and(
            it < maxiter,
            jnp.logical_or(it < 0.5, jnp.abs(q - q_prev) >= tol))

    carry0 = (jnp.eye(8, dtype=jnp.float32), consts_ref[5],
              jnp.float32(3.4e38), consts_ref[6], jnp.float32(0.0))
    tmat, sigma2, _, q, it = jax.lax.while_loop(cond, body, carry0)
    tmat_ref[:] = tmat
    out_ref[0, 0] = sigma2
    out_ref[0, 1] = q
    out_ref[0, 2] = it


@functools.partial(
    jax.jit, static_argnames=("w", "maxiter", "tol", "update_scale",
                              "interpret"))
def run_em_rigid_fused(source, target, w=0.0, maxiter=50, tol=1e-3,
                       update_scale=True, interpret=False):
    """Rigid CPD registration as ONE kernel launch.

    Returns (rot (3,3), t (3,), scale, sigma2, q). Sizes must satisfy
    Mp*Np*4B (posterior tile) << VMEM; use for M, N <= ~1024.
    """
    source = jnp.asarray(source, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    m, dim = source.shape
    n = target.shape[0]
    assert dim == 3, "fused EM kernel is 3-D only"
    mp = -(-m // 8) * 8
    np_ = -(-n // 128) * 128

    ys = jnp.zeros((8, mp), jnp.float32)
    ys = ys.at[:3, :m].set(source.T)
    ys = ys.at[3, :m].set(1.0)
    xs = jnp.zeros((8, np_), jnp.float32)
    xs = xs.at[:3, :n].set(target.T)
    xs_ext = xs.at[3, :n].set(1.0)
    x2_real = jnp.sum(target * target, axis=1)
    x2 = jnp.full((1, np_), _BIG, jnp.float32).at[0, :n].set(x2_real)
    bigy = jnp.zeros((1, mp), jnp.float32).at[0, m:].set(_BIG)
    bigx_row = jnp.zeros((1, np_), jnp.float32).at[0, n:].set(_BIG)
    ones_n = jnp.zeros((1, np_), jnp.float32).at[0, :].set(1.0)
    bmat = jnp.concatenate([
        -2.0 * xs[:3],                       # pair with t_src rows
        ones_n,                              # pair with y2 row
        jnp.where(x2 < _BIG * 0.5, x2, 0.0),  # pair with ones row
        ones_n,                              # pair with bigy row
        bigx_row,                            # pair with ones row
        jnp.zeros((1, np_), jnp.float32),
    ], axis=0)                               # (8, Np)

    # sigma2_0 / q0 closed form (reference math_utils.py:28).
    from ..utils import math_utils as _mu

    sigma2_0 = _mu.squared_kernel_sum(source, target)
    q0 = 1.0 + n * dim * 0.5 * jnp.log(sigma2_0)

    wratio = w / (1.0 - w) * m / n if w > 0.0 else 0.0
    consts = jnp.stack([
        jnp.asarray(wratio, jnp.float32),
        jnp.asarray(float(maxiter), jnp.float32),
        jnp.asarray(float(tol), jnp.float32),
        jnp.asarray(1.0 if update_scale else 0.0, jnp.float32),
        jnp.asarray(0.0, jnp.float32),
        sigma2_0.astype(jnp.float32),
        q0.astype(jnp.float32),
        jnp.asarray(float(dim), jnp.float32),
    ])

    tmat, out = pl.pallas_call(
        _em_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, 8), jnp.float32),
            jax.ShapeDtypeStruct((1, 4), jnp.float32),
        ],
        interpret=interpret,
    )(consts, ys, bmat, xs_ext, x2, bigy,
      jnp.asarray(_K_T), jnp.asarray(_R_T))

    sigma2, q = out[0, 0], out[0, 1]
    # Recover scale and rot from the homogeneous matrix.
    sr = tmat[:3, :3]
    scale = jnp.sqrt(jnp.maximum(jnp.sum(sr * sr) / 3.0, 1e-30))
    rot = sr / scale
    t = tmat[:3, 3]
    return rot, t, scale, sigma2, q


# --------------------------------------------------------------------------
# FilterReg pt2pt whole-EM kernel
# --------------------------------------------------------------------------
#
# Same machinery as the CPD kernel, simpler E-step: FilterReg's moments are
# per-source row sums of the unnormalized Gaussian kernel (no posterior
# column normalization), and the M-step is a weighted Kabsch — whose optimal
# rotation is again the Horn solve with a = hh^T.
# Reference semantics: filterreg.py:78-108 (E-step), :158-196 (M-step).

def _frg_kernel(consts_ref, ys_ref, bmat_ref, xs_ext_ref, bigy_ref,
                kt_ref, rt_ref, tmat_ref, out_ref):
    """consts (SMEM, 8): [wratio (w/(1-w)*n/m), maxiter, tol, update_sigma2,
    sigma2_decay, sigma2_0, min_sigma2, unused]."""
    wratio = consts_ref[0]
    maxiter = consts_ref[1]
    tol = consts_ref[2]
    update_sigma2 = consts_ref[3]
    sigma2_decay = consts_ref[4]
    min_sigma2 = consts_ref[6]
    eps = jnp.float32(1.1920929e-07)
    k_t = kt_ref[:]
    r_t = rt_ref[:]

    ys = ys_ref[:]                # (8, Mp)
    bmat = bmat_ref[:]            # (8, Np)
    xs_ext = xs_ext_ref[:]        # (8, Np): rows [x; 1; |x|^2; 0...]
    bigy = bigy_ref[:]            # (1, Mp)
    ones_m = jnp.ones_like(bigy)
    zeros_m = jnp.zeros_like(bigy)

    def body(carry):
        tmat, sigma2, _, q_cur, it = carry
        inv2s2 = 0.5 / sigma2
        t_src = jax.lax.dot_general(
            tmat, ys, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)[:3]              # (3, Mp)
        y2 = jnp.sum(t_src * t_src, axis=0, keepdims=True)
        a_aug = jnp.concatenate(
            [t_src, y2, ones_m, bigy, ones_m, zeros_m], axis=0)
        d2 = jax.lax.dot_general(
            a_aug, bmat, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)                  # (Mp, Np)
        k = jnp.exp(-jnp.maximum(d2, 0.0) * inv2s2)
        mom = jax.lax.dot_general(
            xs_ext, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)                  # (8, Mp)
        m1_t = mom[:3]
        m0 = mom[3:4]                                             # (1, Mp)
        m2 = mom[4:5]
        c = wratio * jnp.exp(1.5 * jnp.log(2.0 * jnp.pi * sigma2))
        mask = jnp.where(m0 > 0.0, 1.0, 0.0)
        m0s = jnp.maximum(m0, eps)
        m1m0 = m1_t / m0s
        # max-guard: with w=0 and m0=0 (padding) m0/(m0+c) is 0/0 -> NaN,
        # and mask * NaN is still NaN.
        m0m0 = m0 / jnp.maximum(m0 + c, eps)
        drxdx = mask * jnp.sqrt(m0m0 / sigma2)                    # (1, Mp)

        # Weighted Kabsch (kabsch.cc:6-56) in-kernel.
        total = jnp.sum(drxdx)
        safe_total = jnp.where(total == 0.0, 1.0, total)
        mc = jax.lax.dot_general(
            t_src, drxdx, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) / safe_total      # (3, 1)
        tc = jax.lax.dot_general(
            m1m0 * mask, drxdx, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) / safe_total
        w2 = drxdx * drxdx
        hh = jax.lax.dot_general(
            (t_src - mc) * w2, (m1m0 - tc) * mask,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)                  # (3, 3)
        # argmax_R tr(R hh) == Horn with a = hh^T.
        a = hh.T
        kmat = _unflatten_rows(
            jnp.dot(_flatten_rows(a, 3, 3), k_t,
                    preferred_element_type=jnp.float32), 4, 4)
        v = _dominant_eigvec(kmat)
        qq = jnp.dot(v, v.T, preferred_element_type=jnp.float32)
        dr = _unflatten_rows(
            jnp.dot(_flatten_rows(qq, 4, 4), r_t,
                    preferred_element_type=jnp.float32), 3, 3)
        degenerate = total == 0.0
        dr = jnp.where(degenerate, jnp.eye(3, dtype=jnp.float32), dr)
        dt = jnp.where(degenerate, jnp.zeros((3, 1), jnp.float32),
                       tc - jnp.dot(dr, mc, preferred_element_type=jnp.float32))

        rx2 = jnp.sum(
            (drxdx * (t_src - m1m0) * mask) ** 2, axis=0, keepdims=True)
        q_new = jnp.sum(jnp.sqrt(rx2))

        num = m0 * y2 - 2.0 * jnp.sum(t_src * m1_t, axis=0, keepdims=True) + m2
        s2_upd = jnp.sum(mask * num / jnp.maximum(m0 + c, eps)) \
            / (3.0 * jnp.maximum(jnp.sum(mask * m0m0), eps))
        sigma2_new = jnp.where(update_sigma2 > 0.5, s2_upd,
                               sigma2 * sigma2_decay)
        sigma2_new = jnp.maximum(sigma2_new, min_sigma2)

        # Compose: rows 0-2 of new tmat = [dr @ R | dr @ t + dt].
        old_rt = tmat[:3, :]                                      # (3, 8)
        new_rt = jnp.dot(dr, old_rt, preferred_element_type=jnp.float32)
        col3 = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1) == 3, 1.0, 0.0)
        dt_pad = jnp.dot(dt, col3, preferred_element_type=jnp.float32)
        top = new_rt + dt_pad
        tmat_new = jnp.concatenate(
            [top, jnp.eye(8, dtype=jnp.float32)[3:]], axis=0)
        return (tmat_new, sigma2_new, q_cur, q_new, it + 1.0)

    def cond(carry):
        _, _, q_prev, q, it = carry
        return jnp.logical_and(
            it < maxiter,
            jnp.logical_or(it < 0.5, jnp.abs(q - q_prev) >= tol))

    carry0 = (jnp.eye(8, dtype=jnp.float32), consts_ref[5],
              jnp.float32(3.4e38), jnp.float32(1e30), jnp.float32(0.0))
    tmat, sigma2, _, q, it = jax.lax.while_loop(cond, body, carry0)
    tmat_ref[:] = tmat
    out_ref[0, 0] = sigma2
    out_ref[0, 1] = q
    out_ref[0, 2] = it


@functools.partial(
    jax.jit, static_argnames=("w", "maxiter", "tol", "update_sigma2",
                              "sigma2_decay", "min_sigma2", "auto_sigma2",
                              "interpret"))
def run_em_filterreg_fused(source, target, sigma2_0=0.0, w=0.0, maxiter=50,
                           tol=1e-3, update_sigma2=False, sigma2_decay=1.0,
                           min_sigma2=1e-4, auto_sigma2=True,
                           interpret=False):
    """Rigid pt2pt FilterReg registration as ONE kernel launch.

    Returns (rot (3,3), t (3,), sigma2, q). M, N <= ~1024.
    """
    source = jnp.asarray(source, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    m, dim = source.shape
    n = target.shape[0]
    assert dim == 3, "fused FilterReg kernel is 3-D only"
    mp = -(-m // 8) * 8
    np_ = -(-n // 128) * 128

    ys = jnp.zeros((8, mp), jnp.float32)
    ys = ys.at[:3, :m].set(source.T)
    ys = ys.at[3, :m].set(1.0)
    xs = jnp.zeros((8, np_), jnp.float32)
    xs = xs.at[:3, :n].set(target.T)
    x2_real = jnp.sum(target * target, axis=1)
    x2 = jnp.full((1, np_), _BIG, jnp.float32).at[0, :n].set(x2_real)
    x2z = jnp.where(x2 < _BIG * 0.5, x2, 0.0)
    xs_ext = jnp.concatenate([
        xs[:3],
        jnp.zeros((1, np_), jnp.float32).at[0, :n].set(1.0),
        x2z,
        jnp.zeros((3, np_), jnp.float32),
    ], axis=0)
    bigy = jnp.zeros((1, mp), jnp.float32).at[0, m:].set(_BIG)
    bigx_row = jnp.zeros((1, np_), jnp.float32).at[0, n:].set(_BIG)
    ones_n = jnp.ones((1, np_), jnp.float32)
    bmat = jnp.concatenate([
        -2.0 * xs[:3], ones_n, x2z, ones_n, bigx_row,
        jnp.zeros((1, np_), jnp.float32),
    ], axis=0)

    if auto_sigma2:
        from ..utils import math_utils as _mu

        s2_0 = jnp.maximum(_mu.squared_kernel_sum(source, target), min_sigma2)
    else:
        s2_0 = jnp.asarray(sigma2_0, jnp.float32)

    wratio = w / (1.0 - w) * n / m if w > 0.0 else 0.0
    consts = jnp.stack([
        jnp.asarray(wratio, jnp.float32),
        jnp.asarray(float(maxiter), jnp.float32),
        jnp.asarray(float(tol), jnp.float32),
        jnp.asarray(1.0 if update_sigma2 else 0.0, jnp.float32),
        jnp.asarray(float(sigma2_decay), jnp.float32),
        s2_0.astype(jnp.float32),
        jnp.asarray(float(min_sigma2), jnp.float32),
        jnp.asarray(0.0, jnp.float32),
    ])

    tmat, out = pl.pallas_call(
        _frg_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, 8), jnp.float32),
            jax.ShapeDtypeStruct((1, 4), jnp.float32),
        ],
        interpret=interpret,
    )(consts, ys, bmat, xs_ext, bigy, jnp.asarray(_K_T), jnp.asarray(_R_T))

    sigma2, q = out[0, 0], out[0, 1]
    rot = tmat[:3, :3]
    t = tmat[:3, 3]
    return rot, t, sigma2, q
