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
  4x4 K(a^T) matrix — obtained by power squaring + Rayleigh-quotient
  inverse iteration (_dominant_eigvec) — gives exactly the det-corrected
  optimal PROPER rotation of reference cpd.py:176-178 (matches the XLA
  SVD path to ~1e-6 at EVERY EM iteration, measured on v5e).
* The affine M-step solves yp1y B^T = a^T with a bilinear-cofactor 3x3
  inverse (_inv3_sym); the FilterReg pt2pl M-step solves its 6x6 GN
  normal equations by a Schur complement over two such inverses.
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
_POWER_SQUARINGS = 16
_RQI_STEPS = 2


def _dominant_eigvec(kmat):
    """Unit dominant eigenvector of a symmetric 4x4, f32, Mosaic-friendly.

    Three stages, all matmuls/reductions (no SVD/eigh exists in-kernel):

    1. Repeated squaring of the Frobenius-normalized PSD shift K/|K|_F + I:
       squaring k times amplifies the eigenvalue ratio to ratio^(2^k); the
       tight shift matters — an earlier sum|K| shift pushed the ratio so
       close to 1 that 2^7 squarings left the top eigenvector unresolved
       below relative gaps of ~1e-1.
    2. Initial vector = the largest-norm COLUMN of the squared matrix
       (selected branch-free with an iota one-hot). The squared matrix is
       ~ l1^(2^k) v1 v1^T, so its best column has overlap |v1_i| >= 1/2
       with v1 — unlike `ks @ ones`, which fails completely whenever v1 is
       near-orthogonal to the ones vector.
    3. Rayleigh-quotient inverse iteration, cubically convergent, with the
       4x4 resolvent solve done as Cayley–Hamilton ADJUGATE matvecs
       adj(B) v = -(B^3 - e1 B^2 + e2 B - e3 I) v (Newton's identities for
       e_i) — no inverse, no det division: normalization absorbs the
       scalar, and near-singular B is exactly the convergent regime.

    Verified vs float64 eigh: eigenvector error <= ~eps/gap (the f32
    floor), Rayleigh-quotient suboptimality <= 2e-7 * l1 even for fully
    degenerate top eigenvalues.
    """
    eye4 = jnp.eye(4, dtype=jnp.float32)
    nrm = jnp.sqrt(jnp.sum(kmat * kmat))
    kn = kmat / jnp.maximum(nrm, jnp.float32(1e-30))  # eigs in [-1, 1]
    ks = kn + jnp.float32(1.0000001) * eye4           # PSD shift
    ks = ks / jnp.sqrt(jnp.sum(ks * ks))

    def sq(_, m):
        m = jnp.dot(m, m, preferred_element_type=jnp.float32)
        return m / jnp.sqrt(jnp.sum(m * m))

    ks = jax.lax.fori_loop(0, _POWER_SQUARINGS, sq, ks)

    coln = jnp.sum(ks * ks, axis=0, keepdims=True)    # (1, 4)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 4), 1)
    jbest = jnp.min(jnp.where(coln >= jnp.max(coln), iota, 1000))
    onehot = jnp.where(iota == jbest, jnp.float32(1.0), jnp.float32(0.0))
    v = jnp.dot(ks, onehot.T, preferred_element_type=jnp.float32)  # (4, 1)
    v = v / jnp.sqrt(jnp.maximum(jnp.sum(v * v), jnp.float32(1e-30)))

    def rqi(_, v):
        mu = jnp.sum(v * jnp.dot(kn, v, preferred_element_type=jnp.float32))
        b = kn - mu * eye4
        bv = jnp.dot(b, v, preferred_element_type=jnp.float32)
        b2 = jnp.dot(b, b, preferred_element_type=jnp.float32)
        b2v = jnp.dot(b, bv, preferred_element_type=jnp.float32)
        b3v = jnp.dot(b, b2v, preferred_element_type=jnp.float32)
        p1 = jnp.sum(b * eye4)
        p2 = jnp.sum(b * b)
        p3 = jnp.sum(b2 * b)
        e1 = p1
        e2 = (e1 * p1 - p2) * jnp.float32(0.5)
        e3 = (e2 * p1 - e1 * p2 + p3) * jnp.float32(1.0 / 3.0)
        w = b3v - e1 * b2v + e2 * bv - e3 * v
        nw = jnp.sqrt(jnp.sum(w * w))
        # Cancellation guard: adj(B) v is a difference of O(1) terms; when
        # the true result is below their f32 rounding floor (top eigenvalues
        # crowded within ~sqrt(eps), or v already converged), w is pure
        # noise and one step can land on an arbitrary eigenvector — keep v
        # instead (its Rayleigh quotient is within the crowd's spread of
        # the optimum, so the rotation objective loses nothing measurable).
        noise = jnp.float32(16.0 * 1.1920929e-07) * (
            jnp.sqrt(jnp.sum(b3v * b3v))
            + jnp.abs(e1) * jnp.sqrt(jnp.sum(b2v * b2v))
            + jnp.abs(e2) * jnp.sqrt(jnp.sum(bv * bv))
            + jnp.abs(e3))
        return jnp.where(nw > noise,
                         w / jnp.maximum(nw, jnp.float32(1e-30)), v)

    return jax.lax.fori_loop(0, _RQI_STEPS, rqi, v)


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


def _cof3_tensor() -> np.ndarray:
    """(81, 9) T with cof(S).flat = (S ⊗ S).flat @ T for any 3x3 S.

    cof(S)[i,j] = 1/2 eps_{ipq} eps_{jrs} S[p,r] S[q,s] — the cofactor is
    BILINEAR in S, so the 3x3 inverse needed by the affine M-step reduces
    to one outer product and one constant matmul (Mosaic-friendly, no
    scalar indexing). inv(S) = cof(S)^T / det(S); det = sum(S*cof)/3.
    """
    e = np.zeros((3, 3, 3), np.float32)
    for (i, j, k), s in (((0, 1, 2), 1), ((1, 2, 0), 1), ((2, 0, 1), 1),
                         ((0, 2, 1), -1), ((2, 1, 0), -1), ((1, 0, 2), -1)):
        e[i, j, k] = s
    t = np.zeros((81, 9), np.float32)
    for p in range(3):
        for r in range(3):
            for q in range(3):
                for s_ in range(3):
                    for i in range(3):
                        for j in range(3):
                            val = 0.5 * e[i, p, q] * e[j, r, s_]
                            if val:
                                t[(p * 3 + r) * 9 + (q * 3 + s_),
                                  i * 3 + j] += val
    return t


def _skew_tensor() -> np.ndarray:
    """(3, 9) T with skew(w).flat = w @ T (skew is linear in w)."""
    t = np.zeros((3, 3, 3), np.float32)
    t[0, 1, 2] = -1.0
    t[0, 2, 1] = 1.0
    t[1, 0, 2] = 1.0
    t[1, 2, 0] = -1.0
    t[2, 0, 1] = -1.0
    t[2, 1, 0] = 1.0
    return t.reshape(3, 9)


_K_T = _k_from_a_tensor().reshape(9, 16)
_R_T = _r_from_qq_tensor().reshape(16, 9)
_COF_T = _cof3_tensor()
_SK_T = _skew_tensor()


def _inv3_sym(s, cof_t):
    """Inverse of a SYMMETRIC 3x3 via the bilinear cofactor tensor.

    (cof(S) = adj(S)^T; for symmetric S the cofactor matrix is symmetric,
    so no transpose is needed.)
    """
    s9 = _flatten_rows(s, 3, 3)                            # (1, 9)
    outer = jnp.dot(s9.T, s9, preferred_element_type=jnp.float32)
    cof9 = jnp.dot(_flatten_rows(outer, 9, 9), cof_t,
                   preferred_element_type=jnp.float32)     # (1, 9)
    cof = _unflatten_rows(cof9, 3, 3)
    det = jnp.sum(s * cof) * jnp.float32(1.0 / 3.0)
    det = jnp.where(jnp.abs(det) < jnp.float32(1e-30),
                    jnp.float32(1e-30), det)
    return cof / det


def _em_kernel(consts_ref, ys_ref, bmat_ref, xs_ext_ref, x2_ref, bigy_ref,
               kt_ref, rt_ref, cof_ref, tmat_ref, out_ref, *, kind="rigid"):
    """consts (SMEM, 8): [wratio, maxiter, tol, update_scale, n_p_dim,
    sigma2_0, q0, dim]. ``kind`` is trace-time static: "rigid" uses the
    Horn quaternion rotation solve (reference cpd.py:160-192), "affine"
    the 3x3 cofactor-inverse solve of yp1y B^T = a^T (cpd.py:219-244)."""
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
        tr_xp1x = xx - n_p * jnp.sum(mu_x * mu_x)

        if kind == "rigid":
            # Horn rotation: K = (a -> 4x4), dominant eigenvector solve.
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
            lin = scale * rot
            t_new = mu_x - jnp.dot(lin, mu_y,
                                   preferred_element_type=jnp.float32)
            sigma2_new = jnp.where(
                update_scale > 0.5,
                (tr_xp1x - scale * tr_atr) / (n_p * dim),
                (tr_xp1x - 2.0 * scale * tr_atr + tr_yp1y) / (n_p * dim))
            sigma2_new = jnp.maximum(sigma2_new, eps)
            q_new = (tr_xp1x - 2.0 * scale * tr_atr
                     + scale * scale * tr_yp1y) / (2.0 * sigma2_new) \
                + dim * n_p * 0.5 * jnp.log(sigma2_new)
        else:
            # Affine: B = a @ inv(yp1y) (yp1y symmetric PSD; cpd.py:219-244).
            yp1y = jax.lax.dot_general(
                src_hat * p1, src_hat, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)               # (3, 3)
            lin = jnp.dot(a, _inv3_sym(yp1y, cof_ref[:]),
                          preferred_element_type=jnp.float32)
            t_new = mu_x - jnp.dot(lin, mu_y,
                                   preferred_element_type=jnp.float32)
            tr_ab = jnp.sum(a * lin)
            sigma2_new = jnp.maximum((tr_xp1x - tr_ab) / (n_p * dim), eps)
            q_new = (tr_xp1x - tr_ab) / (2.0 * sigma2_new) \
                + dim * n_p * 0.5 * jnp.log(sigma2_new)

        # New homogeneous transform: rows 0-2 [lin | t].
        top = jnp.concatenate(
            [lin, t_new,
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


def fused_dims_ok(m, n):
    """True iff the single-launch whole-EM kernels' VMEM-resident tiles
    fit: the posterior tile is Mp x Np f32 with Mp padded to 8 sublanes
    and Np to 128 lanes, and a few such tiles plus the (8, Mp)/(8, Np)
    operand strips are live at once. Callers MUST gate on this, not on
    raw m*n: skewed shapes defeat an m*n bound (m=65536, n=16 passes
    m*n <= 2^20 but pads to a 32 MB tile against v5e's 16 MB VMEM —
    review finding). The padded-pair budget matches the historical
    config.fused_em_max_pairs default; the per-dim caps bound the
    operand strips."""
    mp = -(-m // 8) * 8
    np_ = -(-n // 128) * 128
    return (mp * np_ <= 1 << 20) and mp <= (1 << 14) and np_ <= (1 << 14)


@functools.partial(
    jax.jit, static_argnames=("w", "maxiter", "tol", "update_scale",
                              "kind", "interpret"))
def _run_em_cpd_fused(source, target, smask=None, tmask=None, w=0.0,
                      maxiter=50, tol=1e-3, update_scale=True, kind="rigid",
                      interpret=False):
    """CPD registration (rigid or affine M-step) as ONE kernel launch.

    Returns (lin (3,3), t (3,), sigma2, q) where lin = scale*R (rigid) or
    B (affine). Sizes must satisfy Mp*Np*4B (posterior tile) << VMEM; use
    for M, N <= ~1024.

    ``smask``/``tmask``: optional (M,)/(N,) 0/1 validity masks for
    ragged-batch padding. Masked points get BIG distance rows/columns (so
    their Gaussian mass underflows to exactly 0 inside the kernel) and the
    outlier constant / sigma2_0 / q0 use the true counts — exactly the
    unpadded registration, with the masks as runtime DATA so one compiled
    program serves every ragged batch element.
    """
    source = jnp.asarray(source, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    m, dim = source.shape
    n = target.shape[0]
    assert dim == 3, "fused EM kernel is 3-D only"
    assert (smask is None) == (tmask is None)
    masked = smask is not None
    mp = -(-m // 8) * 8
    np_ = -(-n // 128) * 128

    ys = jnp.zeros((8, mp), jnp.float32)
    ys = ys.at[:3, :m].set(source.T)
    ys = ys.at[3, :m].set(1.0)
    xs = jnp.zeros((8, np_), jnp.float32)
    xs = xs.at[:3, :n].set(target.T)
    x2_real = jnp.sum(target * target, axis=1)
    if masked:
        smask = jnp.asarray(smask, jnp.float32)
        tmask = jnp.asarray(tmask, jnp.float32)
        xs_ext = xs.at[3, :n].set(tmask)
        x2 = jnp.full((1, np_), _BIG, jnp.float32).at[0, :n].set(
            jnp.where(tmask > 0, x2_real, _BIG))
        bigy = jnp.full((1, mp), _BIG, jnp.float32).at[0, :m].set(
            jnp.where(smask > 0, 0.0, _BIG))
        bigx_row = jnp.full((1, np_), _BIG, jnp.float32).at[0, :n].set(
            jnp.where(tmask > 0, 0.0, _BIG))
    else:
        xs_ext = xs.at[3, :n].set(1.0)
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

    if masked:
        m_eff = jnp.sum(smask)
        n_eff = jnp.sum(tmask)
        sigma2_0 = _mu.masked_squared_kernel_sum_t(
            source.T, target.T, smask, tmask)
        wratio = jnp.where(
            jnp.asarray(w > 0.0), w / (1.0 - w + 1e-30) * m_eff / n_eff, 0.0)
    else:
        m_eff, n_eff = m, n
        sigma2_0 = _mu.squared_kernel_sum(source, target)
        wratio = w / (1.0 - w) * m / n if w > 0.0 else 0.0
    q0 = 1.0 + n_eff * dim * 0.5 * jnp.log(sigma2_0)

    consts = jnp.stack([
        jnp.asarray(wratio, jnp.float32),
        jnp.asarray(float(maxiter), jnp.float32),
        jnp.asarray(float(tol), jnp.float32),
        jnp.asarray(1.0 if update_scale else 0.0, jnp.float32),
        jnp.asarray(0.0, jnp.float32),
        sigma2_0.astype(jnp.float32),
        jnp.asarray(q0, jnp.float32),
        jnp.asarray(float(dim), jnp.float32),
    ])

    tmat, out = pl.pallas_call(
        functools.partial(_em_kernel, kind=kind),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
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
      jnp.asarray(_K_T), jnp.asarray(_R_T), jnp.asarray(_COF_T))

    sigma2, q = out[0, 0], out[0, 1]
    return tmat[:3, :3], tmat[:3, 3], sigma2, q


@functools.partial(
    jax.jit, static_argnames=("w", "maxiter", "tol", "update_scale",
                              "interpret"))
def run_em_rigid_fused(source, target, w=0.0, maxiter=50, tol=1e-3,
                       update_scale=True, interpret=False):
    """Rigid CPD registration as ONE kernel launch.

    Returns (rot (3,3), t (3,), scale, sigma2, q). M, N <= ~1024.
    """
    sr, t, sigma2, q = _run_em_cpd_fused(
        source, target, w=w, maxiter=maxiter, tol=tol,
        update_scale=update_scale, kind="rigid", interpret=interpret)
    # Recover scale and rot from the homogeneous matrix.
    scale = jnp.sqrt(jnp.maximum(jnp.sum(sr * sr) / 3.0, 1e-30))
    rot = sr / scale
    return rot, t, scale, sigma2, q


@functools.partial(jax.jit, static_argnames=("w", "maxiter", "tol",
                                             "interpret"))
def run_em_affine_fused(source, target, w=0.0, maxiter=50, tol=1e-3,
                        interpret=False):
    """Affine CPD registration as ONE kernel launch.

    Returns (b (3,3), t (3,), sigma2, q). M, N <= ~1024.
    Reference semantics: probreg cpd.py:219-244 (affine M-step).
    """
    b, t, sigma2, q = _run_em_cpd_fused(
        source, target, w=w, maxiter=maxiter, tol=tol,
        update_scale=False, kind="affine", interpret=interpret)
    return b, t, sigma2, q


# --------------------------------------------------------------------------
# Whole-ICP kernel
# --------------------------------------------------------------------------
#
# ICP is CPD-EM with a HARD posterior: the per-source argmin correspondence
# is the one-hot row mask (d2 == row-min), so the same two augmented MXU
# matmuls produce the distance matrix and the correspondence moments, and
# the same Horn solve (scale = 1) is exactly weighted Kabsch on the matched
# pairs. Exact ties average their targets (deterministic; measure-zero for
# real clouds). Replaces Open3D's registration_icp in the reference's
# baseline table (reference README.md:139, examples/icp_test.py) with a
# single-launch program: ~0.3 ms for a full 30-iteration bunny ICP vs the
# XLA while_loop's ~2.6 ms (v5e, amortized).

def _icp_kernel(consts_ref, ys_ref, bmat_ref, xs_ext_ref, bigy_ref,
                kt_ref, rt_ref, tmat0_ref, tmat_ref, out_ref):
    """consts (SMEM, 4): [maxiter, tol, dim, unused]."""
    maxiter = consts_ref[0]
    tol = consts_ref[1]
    eps = jnp.float32(1.1920929e-07)
    k_t = kt_ref[:]
    r_t = rt_ref[:]

    ys = ys_ref[:]                # (8, Mp): rows [y0,y1,y2,1,0,0,0,0]
    bmat = bmat_ref[:]            # (8, Np)
    xs_ext = xs_ext_ref[:]        # (8, Np): rows [x0,x1,x2,1,0,0,0,0]
    bigy = bigy_ref[:]            # (1, Mp) (BIG on pads, else 0)
    ones_m = jnp.ones_like(bigy)
    zeros_m = jnp.zeros_like(bigy)

    def body(carry):
        tmat, rmse_prev_unused, rmse_cur, it = carry
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
        dmin = jnp.min(d2, axis=1, keepdims=True)                 # (Mp, 1)
        # Row validity from dmin itself: padded source rows (and rows with
        # every target masked BIG) see dmin >= BIG and get weight 0.
        w = (dmin < _BIG * 0.25).astype(jnp.float32)              # (Mp, 1)
        hard = (d2 <= dmin).astype(jnp.float32)                   # one-hot+ties
        cnt = jnp.maximum(jnp.sum(hard, axis=1, keepdims=True), 1.0)
        pmat = hard * (w / cnt)                                   # (Mp, Np)
        pxp = jax.lax.dot_general(
            xs_ext, pmat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)                  # (8, Mp)
        px_t = pxp[:3]
        p1 = pxp[3:4]                                             # (1, Mp) = w
        n_p = jnp.maximum(jnp.sum(p1), 1.0)

        # Weighted Kabsch on the matched pairs == the CPD rigid M-step
        # moments with the hard posterior (reference kabsch.cc:30-49).
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

        kmat = _unflatten_rows(
            jnp.dot(_flatten_rows(a, 3, 3), k_t,
                    preferred_element_type=jnp.float32), 4, 4)
        v = _dominant_eigvec(kmat)
        qq = jnp.dot(v, v.T, preferred_element_type=jnp.float32)  # (4, 4)
        rot = _unflatten_rows(
            jnp.dot(_flatten_rows(qq, 4, 4), r_t,
                    preferred_element_type=jnp.float32), 3, 3)
        t_new = mu_x - jnp.dot(rot, mu_y,
                               preferred_element_type=jnp.float32)

        # rmse over matched pairs: sum pmat * d2 == sum_m w_m dmin_m (tied
        # entries all equal dmin), with no (Mp, 1) -> (1, Mp) transpose.
        wd = jnp.sum(pmat * jnp.maximum(d2, 0.0))
        rmse = jnp.sqrt(wd / n_p)

        top = jnp.concatenate(
            [rot, t_new, jnp.zeros((3, 4), jnp.float32)], axis=1)  # (3, 8)
        tmat_new = jnp.concatenate(
            [top, jnp.eye(8, dtype=jnp.float32)[3:]], axis=0)
        return (tmat_new, rmse_cur, rmse, it + 1.0)

    def cond(carry):
        _, rmse_prev, rmse, it = carry
        return jnp.logical_and(
            it < maxiter,
            jnp.logical_or(it < 1.5, jnp.abs(rmse_prev - rmse) >= tol))

    carry0 = (tmat0_ref[:], jnp.float32(3.4e38), jnp.float32(3.4e38),
              jnp.float32(0.0))
    tmat, _, rmse, it = jax.lax.while_loop(cond, body, carry0)
    tmat_ref[:] = tmat
    out_ref[0, 0] = rmse
    out_ref[0, 1] = it
    out_ref[0, 2] = jnp.float32(0.0)
    out_ref[0, 3] = jnp.float32(0.0)


@functools.partial(
    jax.jit, static_argnames=("maxiter", "tol", "interpret"))
def run_icp_fused(source, target, rot0=None, t0=None, smask=None,
                  tmask=None, *, maxiter=30, tol=1e-6, interpret=False):
    """Point-to-point ICP as ONE kernel launch (3-D, untrimmed).

    Returns (rot (3,3), t (3,), rmse, n_iter). Sizes must satisfy
    :func:`fused_dims_ok`; icp.registration_icp routes here on TPU and
    falls back to the streaming XLA while_loop otherwise.

    ``smask``/``tmask``: optional (M,)/(N,) 0/1 validity masks for
    ragged-batch padding — masked source rows get zero correspondence
    weight (their row minimum is the BIG marker), masked target columns
    get BIG distances so no source row ever matches them; exactly the
    unpadded registration, with the masks as runtime data.
    """
    source = jnp.asarray(source, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    m, dim = source.shape
    n = target.shape[0]
    assert dim == 3, "fused ICP kernel is 3-D only"
    assert (smask is None) == (tmask is None)
    masked = smask is not None
    rot0 = jnp.eye(3, dtype=jnp.float32) if rot0 is None \
        else jnp.asarray(rot0, jnp.float32)
    t0 = jnp.zeros((3,), jnp.float32) if t0 is None \
        else jnp.asarray(t0, jnp.float32)
    # Shared-centroid centering (see icp._run_icp): the expanded-form f32
    # distances cancel catastrophically at large coordinate magnitudes.
    if masked:
        smask = jnp.asarray(smask, jnp.float32)
        tmask = jnp.asarray(tmask, jnp.float32)
        cnt = jnp.maximum(jnp.sum(smask) + jnp.sum(tmask), 1.0)
        cen = (jnp.sum(source * smask[:, None], axis=0)
               + jnp.sum(target * tmask[:, None], axis=0)) / cnt
    else:
        cen = (jnp.sum(source, axis=0) + jnp.sum(target, axis=0)) / (m + n)
    source = source - cen[None, :]
    target = target - cen[None, :]
    t0 = t0 + rot0 @ cen - cen

    mp = -(-m // 8) * 8
    np_ = -(-n // 128) * 128
    ys = jnp.zeros((8, mp), jnp.float32)
    ys = ys.at[:3, :m].set(source.T)
    ys = ys.at[3, :m].set(1.0)
    xs = jnp.zeros((8, np_), jnp.float32)
    xs = xs.at[:3, :n].set(target.T)
    xs_ext = xs.at[3, :n].set(1.0)
    x2_real = jnp.sum(target * target, axis=1)
    if masked:
        x2 = jnp.full((1, np_), _BIG, jnp.float32).at[0, :n].set(
            jnp.where(tmask > 0, x2_real, _BIG))
        bigy = jnp.full((1, mp), _BIG, jnp.float32).at[0, :m].set(
            jnp.where(smask > 0, 0.0, _BIG))
        bigx_row = jnp.full((1, np_), _BIG, jnp.float32).at[0, :n].set(
            jnp.where(tmask > 0, 0.0, _BIG))
    else:
        x2 = jnp.full((1, np_), _BIG, jnp.float32).at[0, :n].set(x2_real)
        bigy = jnp.zeros((1, mp), jnp.float32).at[0, m:].set(_BIG)
        bigx_row = jnp.zeros((1, np_), jnp.float32).at[0, n:].set(_BIG)
    ones_n = jnp.ones((1, np_), jnp.float32)
    bmat = jnp.concatenate([
        -2.0 * xs[:3],
        ones_n,
        jnp.where(x2 < _BIG * 0.5, x2, 0.0),
        ones_n,
        bigx_row,
        jnp.zeros((1, np_), jnp.float32),
    ], axis=0)                               # (8, Np)

    consts = jnp.stack([
        jnp.asarray(float(maxiter), jnp.float32),
        jnp.asarray(float(tol), jnp.float32),
        jnp.asarray(float(dim), jnp.float32),
        jnp.asarray(0.0, jnp.float32),
    ])
    tmat0 = jnp.eye(8, dtype=jnp.float32)
    tmat0 = tmat0.at[:3, :3].set(rot0)
    tmat0 = tmat0.at[:3, 3].set(t0)

    tmat, out = pl.pallas_call(
        _icp_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, 8), jnp.float32),
            jax.ShapeDtypeStruct((1, 4), jnp.float32),
        ],
        interpret=interpret,
    )(consts, ys, bmat, xs_ext, bigy,
      jnp.asarray(_K_T), jnp.asarray(_R_T), tmat0)

    rot, t = tmat[:3, :3], tmat[:3, 3]
    t = t + cen - rot @ cen                  # centered -> raw frame
    return rot, t, out[0, 0], out[0, 1].astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("maxiter", "tol", "masked", "interpret"))
def run_icp_fused_batch(sources, targets, smasks=None, tmasks=None, *,
                        maxiter=30, tol=1e-6, masked=False,
                        interpret=False):
    """(B, M, 3) x (B, N, 3) [+ (B, M)/(B, N) masks] -> stacked
    (rot, t, rmse, n_iter) via one fused ICP launch per pair (lax.map —
    see the batched-fused-runners note below)."""

    def one(args):
        if masked:
            s, t, sm, tm = args
            return run_icp_fused(s, t, smask=sm, tmask=tm,
                                 maxiter=maxiter, tol=tol,
                                 interpret=interpret)
        s, t = args
        return run_icp_fused(s, t, maxiter=maxiter, tol=tol,
                             interpret=interpret)

    args = (sources, targets, smasks, tmasks) if masked \
        else (sources, targets)
    return jax.lax.map(one, args)


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
                kt_ref, rt_ref, cof_ref, sk_ref, tmat_ref, out_ref, *,
                objective="pt2pt"):
    """consts (SMEM, 8): [wratio (w/(1-w)*n/m), maxiter, tol, update_sigma2,
    sigma2_decay, sigma2_0, min_sigma2, unused].

    ``objective`` is trace-time static: "pt2pt" = weighted Kabsch via the
    Horn solve (kabsch.cc:6-56); "pt2pl" = one Gauss-Newton twist step
    (point_to_plane.cc:6-32) with the 6x6 normal equations solved by a
    Schur complement over two symmetric-3x3 cofactor inverses, then an
    exact Rodrigues update (se3_op.py:20-53). xs_ext rows 5-7 carry the
    target normals so ONE moment matmul also yields NX."""
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
        total = jnp.sum(drxdx)
        degenerate = total == 0.0

        if objective == "pt2pt":
            # Weighted Kabsch (kabsch.cc:6-56) in-kernel.
            safe_total = jnp.where(degenerate, 1.0, total)
            mc = jax.lax.dot_general(
                t_src, drxdx, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) / safe_total  # (3, 1)
            tc = jax.lax.dot_general(
                m1m0 * mask, drxdx, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) / safe_total
            w2 = drxdx * drxdx
            hh = jax.lax.dot_general(
                (t_src - mc) * w2, (m1m0 - tc) * mask,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)              # (3, 3)
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
            dt = tc - jnp.dot(dr, mc, preferred_element_type=jnp.float32)
            rx2 = jnp.sum(
                (drxdx * (t_src - m1m0) * mask) ** 2, axis=0, keepdims=True)
            q_new = jnp.sum(jnp.sqrt(rx2))
        else:
            # pt2pl: one GN step on the twist (point_to_plane.cc:6-32,
            # filterreg.py _pt2pl_t semantics).
            nxm0 = mom[5:8] / m0s                                 # (3, Mp)
            resid = jnp.sum(nxm0 * (m1m0 - t_src), axis=0,
                            keepdims=True)                        # (1, Mp)
            cxr = t_src[1:2] * nxm0[2:3] - t_src[2:3] * nxm0[1:2]
            cyr = t_src[2:3] * nxm0[0:1] - t_src[0:1] * nxm0[2:3]
            czr = t_src[0:1] * nxm0[1:2] - t_src[1:2] * nxm0[0:1]
            jac = jnp.concatenate(
                [cxr, cyr, czr, nxm0,
                 jnp.zeros_like(mom[:2])], axis=0)                # (8, Mp)
            ata = jax.lax.dot_general(
                jac * drxdx, jac, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)              # (8, 8)
            atb = jax.lax.dot_general(
                jac, drxdx * resid, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)               # (8, 1)
            q_new = jnp.sum((drxdx * resid) ** 2)

            eye8 = jnp.eye(8, dtype=jnp.float32)
            p1m = eye8[0:3]                                       # (3, 8)
            p2m = eye8[3:6]
            amat = jnp.dot(jnp.dot(p1m, ata), p1m.T,
                           preferred_element_type=jnp.float32)
            bmat3 = jnp.dot(jnp.dot(p1m, ata), p2m.T,
                            preferred_element_type=jnp.float32)
            cmat = jnp.dot(jnp.dot(p2m, ata), p2m.T,
                           preferred_element_type=jnp.float32)
            b1 = jnp.dot(p1m, atb, preferred_element_type=jnp.float32)
            b2 = jnp.dot(p2m, atb, preferred_element_type=jnp.float32)
            # Relative ridge: the Schur solve needs A invertible; the XLA
            # path's lstsq(rcond=1e-6) min-norm behavior differs only for
            # near-singular systems (degenerate normal fields).
            eye3 = jnp.eye(3, dtype=jnp.float32)
            lam = jnp.float32(1e-7) * (jnp.sum(amat * eye3)
                                       + jnp.sum(cmat * eye3)) + eps * eps
            amat = amat + lam * eye3
            cmat = cmat + lam * eye3
            ainv = _inv3_sym(amat, cof_ref[:])
            ainv_b = jnp.dot(ainv, bmat3, preferred_element_type=jnp.float32)
            smat = cmat - jax.lax.dot_general(
                bmat3, ainv_b, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)               # B^T Ainv B
            sinv = _inv3_sym(smat, cof_ref[:])
            rhs2 = b2 - jax.lax.dot_general(
                bmat3, jnp.dot(ainv, b1, preferred_element_type=jnp.float32),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            u2 = jnp.dot(sinv, rhs2, preferred_element_type=jnp.float32)
            u1 = jnp.dot(
                ainv, b1 - jnp.dot(bmat3, u2,
                                   preferred_element_type=jnp.float32),
                preferred_element_type=jnp.float32)               # (3, 1)
            # Trust region: cap the whole twist by the rotation norm
            # (filterreg._pt2pl_t).
            wn2 = jnp.sum(u1 * u1)
            fac = jnp.minimum(
                1.0, 0.5 / jnp.sqrt(jnp.maximum(wn2, jnp.float32(1e-24))))
            u1 = u1 * fac
            u2 = u2 * fac
            # Exact Rodrigues (se3_op.twist_trans). The identity snap uses
            # the SAME 1e-12 cutoff as the XLA twin: snapping at f32 eps
            # (angle < 3.5e-4 rad) put a ~0.02 deg floor on the fused
            # pt2pl refinement the XLA path does not have (review
            # finding); the sqrt stays guarded so the math is safe at
            # any cutoff.
            twd2 = jnp.sum(u1 * u1)
            twd = jnp.sqrt(jnp.maximum(twd2, jnp.float32(1e-30)))
            ntw = u1 / twd
            skewm = _unflatten_rows(
                jnp.dot(ntw.T, sk_ref[:],
                        preferred_element_type=jnp.float32), 3, 3)
            cth = jnp.cos(twd)
            sth = jnp.sin(twd)
            nnt = jnp.dot(ntw, ntw.T, preferred_element_type=jnp.float32)
            dr = cth * eye3 + (1.0 - cth) * nnt + sth * skewm
            dr = jnp.where(twd2 < jnp.float32(1e-12), eye3, dr)
            dt = u2

        dr = jnp.where(degenerate, jnp.eye(3, dtype=jnp.float32), dr)
        dt = jnp.where(degenerate, jnp.zeros((3, 1), jnp.float32), dt)

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
                              "objective", "interpret"))
def run_em_filterreg_fused(source, target, normals=None, smask=None,
                           tmask=None, sigma2_0=0.0,
                           w=0.0, maxiter=50, tol=1e-3, update_sigma2=False,
                           sigma2_decay=1.0, min_sigma2=1e-4,
                           auto_sigma2=True, objective="pt2pt",
                           interpret=False):
    """Rigid FilterReg registration (pt2pt or pt2pl) as ONE kernel launch.

    Returns (rot (3,3), t (3,), sigma2, q). M, N <= ~1024. ``normals``
    (N, 3) required for objective="pt2pl". ``smask``/``tmask``: optional
    (M,)/(N,) 0/1 validity masks for ragged-batch padding (see
    _run_em_cpd_fused).
    """
    source = jnp.asarray(source, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    m, dim = source.shape
    n = target.shape[0]
    assert dim == 3, "fused FilterReg kernel is 3-D only"
    assert objective in ("pt2pt", "pt2pl")
    assert objective == "pt2pt" or normals is not None
    assert (smask is None) == (tmask is None)
    masked = smask is not None
    mp = -(-m // 8) * 8
    np_ = -(-n // 128) * 128

    ys = jnp.zeros((8, mp), jnp.float32)
    ys = ys.at[:3, :m].set(source.T)
    ys = ys.at[3, :m].set(1.0)
    xs = jnp.zeros((8, np_), jnp.float32)
    xs = xs.at[:3, :n].set(target.T)
    x2_real = jnp.sum(target * target, axis=1)
    if masked:
        smask = jnp.asarray(smask, jnp.float32)
        tmask = jnp.asarray(tmask, jnp.float32)
        x2 = jnp.full((1, np_), _BIG, jnp.float32).at[0, :n].set(
            jnp.where(tmask > 0, x2_real, _BIG))
        bigy = jnp.full((1, mp), _BIG, jnp.float32).at[0, :m].set(
            jnp.where(smask > 0, 0.0, _BIG))
        bigx_row = jnp.full((1, np_), _BIG, jnp.float32).at[0, :n].set(
            jnp.where(tmask > 0, 0.0, _BIG))
        m0_row = jnp.zeros((1, np_), jnp.float32).at[0, :n].set(tmask)
    else:
        x2 = jnp.full((1, np_), _BIG, jnp.float32).at[0, :n].set(x2_real)
        bigy = jnp.zeros((1, mp), jnp.float32).at[0, m:].set(_BIG)
        bigx_row = jnp.zeros((1, np_), jnp.float32).at[0, n:].set(_BIG)
        m0_row = jnp.zeros((1, np_), jnp.float32).at[0, :n].set(1.0)
    x2z = jnp.where(x2 < _BIG * 0.5, x2, 0.0)
    if objective == "pt2pl":
        nrm_rows = jnp.zeros((3, np_), jnp.float32).at[:, :n].set(
            jnp.asarray(normals, jnp.float32).T)
    else:
        nrm_rows = jnp.zeros((3, np_), jnp.float32)
    xs_ext = jnp.concatenate([
        xs[:3],
        m0_row,
        x2z,
        nrm_rows,
    ], axis=0)
    ones_n = jnp.ones((1, np_), jnp.float32)
    bmat = jnp.concatenate([
        -2.0 * xs[:3], ones_n, x2z, ones_n, bigx_row,
        jnp.zeros((1, np_), jnp.float32),
    ], axis=0)

    if auto_sigma2:
        if objective == "pt2pl":
            # Point-spacing init (see filterreg.registration: the
            # cloud-size squared_kernel_sum scale makes pt2pl diverge).
            from . import pairwise as _pw

            if masked:
                # Streamed masked NN (same as filterreg._run_em_rigid): a
                # dense (N, N) self-distance matrix here is 17 GB at a
                # 65k padded target — a size the Pallas kernel itself
                # handles fine (review finding).
                nn2 = _pw.nearest_sqdist(target, target, exclude_zero=True,
                                         target_valid=tmask)
                nn2 = jnp.where(jnp.isfinite(nn2), nn2, 0.0) * tmask
                s2_0 = jnp.maximum(jnp.sum(nn2) / jnp.sum(tmask),
                                   min_sigma2 * 0.01)
            else:
                s2_0 = jnp.maximum(_pw.point_spacing_sq(target),
                                   min_sigma2 * 0.01)
        else:
            from ..utils import math_utils as _mu

            if masked:
                s2_0 = jnp.maximum(_mu.masked_squared_kernel_sum_t(
                    source.T, target.T, smask, tmask), min_sigma2)
            else:
                s2_0 = jnp.maximum(_mu.squared_kernel_sum(source, target),
                                   min_sigma2)
    else:
        s2_0 = jnp.asarray(sigma2_0, jnp.float32)

    if masked:
        wratio = jnp.where(
            jnp.asarray(w > 0.0),
            w / (1.0 - w + 1e-30) * jnp.sum(tmask) / jnp.sum(smask), 0.0)
    else:
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
        functools.partial(_frg_kernel, objective=objective),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, 8), jnp.float32),
            jax.ShapeDtypeStruct((1, 4), jnp.float32),
        ],
        interpret=interpret,
    )(consts, ys, bmat, xs_ext, bigy, jnp.asarray(_K_T), jnp.asarray(_R_T),
      jnp.asarray(_COF_T), jnp.asarray(_SK_T))

    sigma2, q = out[0, 0], out[0, 1]
    rot = tmat[:3, :3]
    t = tmat[:3, 3]
    return rot, t, sigma2, q


# --------------------------------------------------------------------------
# Batched fused runners (TPU serving path)
# --------------------------------------------------------------------------
#
# One compiled program, B sequential whole-EM kernel launches (lax.map; the
# v5e has a single TensorCore, so batch elements are sequential either way).
# Each launch keeps every operand in VMEM and each pair exits its own
# while_loop at ITS convergence iteration, where the vmapped XLA loop runs
# every pair until the LAST one converges. Measured on v5e (B=8 bunny
# pairs, heterogeneous rotations/noise): FilterReg 4.19 vs 6.17 ms/pair at
# n=1000 (1.47x) and ~even at n=390; CPD within +-8% of the vmapped EM at
# both sizes (the batched matmuls amortize what the early exit saves).
# Ragged batches ride the mask operands — one program for any mix of point
# counts.

@functools.partial(
    jax.jit, static_argnames=("kind", "w", "maxiter", "tol", "update_scale",
                              "masked"))
def run_em_cpd_fused_batch(sources, targets, smasks=None, tmasks=None, *,
                           kind="rigid", w=0.0, maxiter=50, tol=1e-3,
                           update_scale=True, masked=False):
    """(B, M, 3) x (B, N, 3) [+ (B, M)/(B, N) masks] -> stacked
    (lin, t, sigma2, q) via one fused kernel launch per pair."""

    def one(args):
        if masked:
            s, t, sm, tm = args
            return _run_em_cpd_fused(s, t, sm, tm, w=w, maxiter=maxiter,
                                     tol=tol, update_scale=update_scale,
                                     kind=kind)
        s, t = args
        return _run_em_cpd_fused(s, t, w=w, maxiter=maxiter, tol=tol,
                                 update_scale=update_scale, kind=kind)

    args = (sources, targets, smasks, tmasks) if masked \
        else (sources, targets)
    return jax.lax.map(one, args)


@functools.partial(
    jax.jit, static_argnames=("objective", "w", "maxiter", "tol",
                              "update_sigma2", "sigma2_decay", "min_sigma2",
                              "auto_sigma2", "masked", "with_normals"))
def run_em_filterreg_fused_batch(sources, targets, normals=None, smasks=None,
                                 tmasks=None, sigma2_0=0.0, *,
                                 objective="pt2pt", w=0.0, maxiter=50,
                                 tol=1e-3, update_sigma2=False,
                                 sigma2_decay=1.0, min_sigma2=1e-4,
                                 auto_sigma2=True, masked=False,
                                 with_normals=False):
    """Batched fused FilterReg: stacked (rot, t, sigma2, q)."""

    def one(args):
        i = 2
        nrm = None
        sm = tm = None
        if with_normals:
            nrm = args[i]
            i += 1
        if masked:
            sm, tm = args[i], args[i + 1]
        return run_em_filterreg_fused(
            args[0], args[1], nrm, sm, tm, sigma2_0=sigma2_0, w=w,
            maxiter=maxiter, tol=tol, update_sigma2=update_sigma2,
            sigma2_decay=sigma2_decay, min_sigma2=min_sigma2,
            auto_sigma2=auto_sigma2, objective=objective)

    args = [sources, targets]
    if with_normals:
        args.append(normals)
    if masked:
        args += [smasks, tmasks]
    return jax.lax.map(one, tuple(args))
