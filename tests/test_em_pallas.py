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
    np.testing.assert_allclose(np.asarray(r), np.asarray(lin), atol=5e-3)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t2), atol=5e-3)


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
