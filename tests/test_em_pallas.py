"""Fused whole-EM kernel vs the XLA fast path (runs on real TPU only).

The test suite runs on CPU where the Mosaic kernel cannot execute (and its
interpreter emulation of an SMEM-carried while_loop is pathologically slow),
so these are skipped off-TPU; the kernel's math (augmented-matmul distance,
Horn-quaternion rotation) is validated numerically in
test_em_math_components below, which runs everywhere.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probreg_tpu.ops import em_pallas
from probreg_tpu.utils import se3_op

tpu_only = pytest.mark.skipif(jax.default_backend() != "tpu",
                              reason="Mosaic kernel requires TPU")


@tpu_only
def test_fused_em_matches_xla(rng):
    from probreg_tpu import cpd

    src = (rng.normal(size=(40, 3)) * 0.3).astype(np.float32)
    ang = np.deg2rad([8.0, -4.0, 6.0])
    rot0 = np.asarray(se3_op.euler2mat(*ang), np.float32)
    tgt = (src @ rot0.T).astype(np.float32)
    r, t, s, s2, q = em_pallas.run_em_rigid_fused(src, tgt, maxiter=8, tol=0.0)
    lin, t2, s2x, sig2, q2 = cpd._run_em_t(
        jnp.asarray(src), jnp.asarray(tgt), kind="rigid", w=0.0,
        maxiter=8, tol=0.0)
    # The in-kernel Horn solve (power squaring + column init + RQI polish)
    # tracks the XLA SVD path to f32 precision at every iteration.
    np.testing.assert_allclose(np.asarray(r), np.asarray(lin), atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t2), atol=1e-4)


@tpu_only
def test_fused_affine_em_matches_xla(rng):
    from probreg_tpu import cpd

    src = (rng.normal(size=(40, 3)) * 0.3).astype(np.float32)
    b0 = (np.eye(3) + 0.1 * rng.normal(size=(3, 3))).astype(np.float32)
    tgt = (src @ b0.T + np.float32([0.02, -0.01, 0.03])).astype(np.float32)
    b, t, s2, q = em_pallas.run_em_affine_fused(src, tgt, maxiter=8, tol=0.0)
    lin, t2, _, sig2, q2 = cpd._run_em_t(
        jnp.asarray(src), jnp.asarray(tgt), kind="affine", w=0.0,
        maxiter=8, tol=0.0)
    np.testing.assert_allclose(np.asarray(b), np.asarray(lin), atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t2), atol=1e-4)


@tpu_only
def test_fused_filterreg_pt2pl_matches_xla(rng):
    from probreg_tpu import filterreg
    from probreg_tpu.utils import se3_op

    # Synthetic curved surface with analytic normals (z = 0.2 sin x cos y).
    g = np.mgrid[0:8, 0:8].reshape(2, -1).T.astype(np.float32) * 0.125
    z = 0.2 * np.sin(g[:, 0] * 3) * np.cos(g[:, 1] * 3)
    src = np.column_stack([g, z]).astype(np.float32)
    dzdx = 0.6 * np.cos(g[:, 0] * 3) * np.cos(g[:, 1] * 3)
    dzdy = -0.6 * np.sin(g[:, 0] * 3) * np.sin(g[:, 1] * 3)
    nrm = np.column_stack([-dzdx, -dzdy, np.ones_like(z)])
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    rot0 = np.asarray(se3_op.euler2mat(*np.deg2rad([3.0, -2.0, 4.0])),
                      np.float32)
    tgt = (src @ rot0.T).astype(np.float32)
    nrm_t = (nrm @ rot0.T).astype(np.float32)

    sigma2 = 0.01
    for i in (2, 6):
        r, t, s2, q = em_pallas.run_em_filterreg_fused(
            src, tgt, nrm_t, sigma2_0=sigma2, maxiter=i, tol=0.0,
            auto_sigma2=False, objective="pt2pl")
        res = filterreg._run_em_rigid(
            jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(nrm_t),
            np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
            np.float32(sigma2), objective_type="pt2pl",
            update_sigma2=False, w=0.0, maxiter=i, tol=0.0,
            min_sigma2=1e-4)
        # 5e-4: the kernel's one-matmul augmented distance rounds
        # differently from the XLA path's y2+x2-2xy, and the pt2pl GN
        # twist feedback compounds that over iterations (measured 2.2e-4
        # at iter 6 on v5e) — same order as the XLA path's own f32
        # deviation from the f64 replica (test_filterreg, 2e-4).
        np.testing.assert_allclose(np.asarray(r),
                                   np.asarray(res.transformation.rot),
                                   atol=5e-4)
        np.testing.assert_allclose(np.asarray(t),
                                   np.asarray(res.transformation.t),
                                   atol=5e-4)


@tpu_only
def test_fused_batch_matches_xla_batch(rng):
    """Batched fused runners (dense + ragged) vs the vmapped XLA EM, via
    the public batch entry points (use_pallas toggles the path on TPU)."""
    from probreg_tpu import cpd, filterreg
    from probreg_tpu.utils import se3_op

    rots = [np.asarray(se3_op.euler2mat(*np.deg2rad(a)), np.float32)
            for a in ([4.0, -2.0, 6.0], [-3.0, 5.0, 2.0], [1.0, 2.0, -7.0])]
    srcs = [(rng.normal(size=(m, 3)) * 0.3).astype(np.float32)
            for m in (40, 28, 33)]
    tgts = [(s @ r.T).astype(np.float32) for s, r in zip(srcs, rots)]

    for kind in ("rigid", "affine"):
        fused = cpd.registration_cpd_batch(srcs, tgts, kind, maxiter=8,
                                           tol=0.0)
        xla = cpd.registration_cpd_batch(srcs, tgts, kind, maxiter=8,
                                         tol=0.0, use_pallas=False)
        for f, x in zip(fused, xla):
            lf = f.transformation.rot if kind == "rigid" \
                else f.transformation.b
            lx = x.transformation.rot if kind == "rigid" \
                else x.transformation.b
            np.testing.assert_allclose(np.asarray(lf), np.asarray(lx),
                                       atol=5e-4)
            np.testing.assert_allclose(np.asarray(f.transformation.t),
                                       np.asarray(x.transformation.t),
                                       atol=5e-4)

    # Dense (uniform-size) batch, rigid.
    srcs_d = np.stack([srcs[0], (srcs[0] * 1.1).astype(np.float32)])
    tgts_d = np.stack([tgts[0], (tgts[0] * 1.1).astype(np.float32)])
    fused = cpd.registration_cpd_batch(srcs_d, tgts_d, maxiter=8, tol=0.0)
    xla = cpd.registration_cpd_batch(srcs_d, tgts_d, maxiter=8, tol=0.0,
                                     use_pallas=False)
    for f, x in zip(fused, xla):
        np.testing.assert_allclose(np.asarray(f.transformation.rot),
                                   np.asarray(x.transformation.rot),
                                   atol=5e-4)

    # FilterReg pt2pt ragged.
    fused = filterreg.registration_filterreg_batch(srcs, tgts, sigma2=0.02,
                                                   maxiter=6, tol=0.0)
    xla = filterreg.registration_filterreg_batch(srcs, tgts, sigma2=0.02,
                                                 maxiter=6, tol=0.0,
                                                 use_pallas=False)
    for f, x in zip(fused, xla):
        np.testing.assert_allclose(np.asarray(f.transformation.rot),
                                   np.asarray(x.transformation.rot),
                                   atol=5e-4)
        np.testing.assert_allclose(np.asarray(f.transformation.t),
                                   np.asarray(x.transformation.t), atol=5e-4)

    # FilterReg pt2pl ragged (random unit normals exercise the GN solve).
    nrms = [rng.normal(size=s.shape).astype(np.float32) for s in srcs]
    nrms = [n / np.linalg.norm(n, axis=1, keepdims=True) for n in nrms]
    fused = filterreg.registration_filterreg_batch(
        srcs, tgts, nrms, sigma2=0.02, objective_type="pt2pl", maxiter=4,
        tol=0.0)
    xla = filterreg.registration_filterreg_batch(
        srcs, tgts, nrms, sigma2=0.02, objective_type="pt2pl", maxiter=4,
        tol=0.0, use_pallas=False)
    for f, x in zip(fused, xla):
        np.testing.assert_allclose(np.asarray(f.transformation.rot),
                                   np.asarray(x.transformation.rot),
                                   atol=5e-4)


def test_em_math_components(rng):
    """Kernel building blocks validated in plain numpy/jnp."""
    # Horn tensor: K from a reproduces the SVD+sign-fix rotation.
    for trial in range(50):
        a = rng.normal(size=(3, 3)).astype(np.float32)
        if trial % 3 == 0:
            a = a @ np.diag([1, 1, -1]).astype(np.float32)
        k = (a.reshape(9) @ em_pallas._K_T).reshape(4, 4)
        w, v = np.linalg.eigh(k)
        q = v[:, -1]
        rot_h = ((np.outer(q, q) / (q @ q)).reshape(16) @ em_pallas._R_T
                 ).reshape(3, 3)
        u, _, vh = np.linalg.svd(a)
        c = np.ones(3); c[-1] = np.linalg.det(u @ vh)
        rot_svd = (u * c) @ vh
        tr_gap = np.trace(a.T @ rot_svd) - np.trace(a.T @ rot_h)
        assert abs(tr_gap) < 1e-4, tr_gap
        # proper rotation
        np.testing.assert_allclose(np.linalg.det(rot_h), 1.0, atol=1e-4)

    # Cofactor tensor: the bilinear 3x3 inverse (numpy mirror of
    # _inv3_sym — pltpu.roll only lowers inside Mosaic) matches
    # np.linalg.inv on symmetric matrices (the affine M-step's yp1y).
    for _ in range(50):
        s = rng.normal(size=(3, 3)).astype(np.float32)
        s = (s @ s.T + 0.1 * np.eye(3)).astype(np.float32)
        s9 = s.reshape(1, 9)
        cof = ((s9.T @ s9).reshape(1, 81) @ em_pallas._COF_T).reshape(3, 3)
        det = np.sum(s * cof) / 3.0
        np.testing.assert_allclose(det, np.linalg.det(s.astype(np.float64)),
                                   rtol=1e-4)
        np.testing.assert_allclose(cof / det,
                                   np.linalg.inv(s.astype(np.float64)),
                                   rtol=2e-3, atol=1e-5)

    # Dominant-eigenvector solve (power squaring + column init + RQI):
    # f32-floor accuracy across eigengaps, including the two failure modes
    # of the earlier scheme (dominant eigenvector orthogonal to the ones
    # vector; relative gap ~1e-2 unresolved by a loose shift).
    for trial in range(300):
        q, _ = np.linalg.qr(rng.normal(size=(4, 4)))
        gap = 10.0 ** rng.uniform(-4, 0)
        lam = np.array([1.0, 1.0 - gap,
                        rng.uniform(-1, 0.5), rng.uniform(-1, 0.5)])
        scale = 10.0 ** rng.uniform(-3, 3)
        k = ((q * (lam * scale)) @ q.T).astype(np.float32)
        k = (k + k.T) / 2
        w, vmat = np.linalg.eigh(k.astype(np.float64))
        vt = vmat[:, -1]
        v = np.asarray(em_pallas._dominant_eigvec(jnp.asarray(k)))[:, 0]
        err = min(np.linalg.norm(v - vt), np.linalg.norm(v + vt))
        # f32 floor is ~eps/gap; suboptimality of the Rayleigh quotient
        # bounds what the rotation objective can lose.
        assert err < max(2e-3, 3e-7 / gap), (trial, gap, err)
        subopt = (w[-1] - v @ k.astype(np.float64) @ v) / abs(w[-1])
        assert subopt < 1e-6, (trial, gap, subopt)
    # Adversarial: l2 AND l3 crowd l1. The eigenvector is then genuinely
    # unresolvable in f32 (the RQI adjugate signal sits below the rounding
    # floor — the cancellation guard must keep the power-iteration seed
    # rather than jump to noise), but the Rayleigh quotient must stay
    # within ~1e-3 of the optimum (no catastrophic flips onto the negative
    # eigenvalue, which an unguarded step produces).
    for trial in range(200):
        q, _ = np.linalg.qr(rng.normal(size=(4, 4)))
        g12 = 10.0 ** rng.uniform(-7, 0)
        g13 = max(g12, 10.0 ** rng.uniform(-7, 0))
        lam = np.array([1.0, 1.0 - g12, 1.0 - g13, rng.uniform(-1, 0.5)])
        scale = 10.0 ** rng.uniform(-3, 3)
        k = ((q * (lam * scale)) @ q.T).astype(np.float32)
        k = (k + k.T) / 2
        w, _ = np.linalg.eigh(k.astype(np.float64))
        v = np.asarray(em_pallas._dominant_eigvec(jnp.asarray(k)))[:, 0]
        subopt = (w[-1] - v @ k.astype(np.float64) @ v) / abs(w[-1])
        assert subopt < 2e-3, (trial, g12, g13, subopt)

    # Degenerate / zero inputs stay finite.
    v = np.asarray(em_pallas._dominant_eigvec(jnp.zeros((4, 4), jnp.float32)))
    assert np.all(np.isfinite(v)) and abs(np.linalg.norm(v) - 1) < 1e-5

    # Augmented matmul produces squared distances with BIG padding.
    m, n = 5, 7
    ys = rng.normal(size=(3, m)).astype(np.float32)
    xs = rng.normal(size=(3, n)).astype(np.float32)
    y2 = (ys * ys).sum(0, keepdims=True)
    x2 = (xs * xs).sum(0, keepdims=True)
    ones_m = np.ones((1, m), np.float32)
    a_aug = np.concatenate([ys, y2, ones_m, np.zeros((1, m), np.float32),
                            ones_m, np.zeros((1, m), np.float32)])
    bmat = np.concatenate([-2 * xs, np.ones((1, n), np.float32), x2,
                           np.ones((1, n), np.float32),
                           np.zeros((2, n), np.float32)])
    d2 = a_aug.T @ bmat
    ref = ((ys.T[:, None] - xs.T[None]) ** 2).sum(-1)
    np.testing.assert_allclose(d2, ref, atol=1e-4)
