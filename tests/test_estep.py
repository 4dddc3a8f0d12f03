"""E-step kernels vs the dense reference oracle (cpd.py:71-88 semantics)."""

import numpy as np
import pytest

from probreg_tpu.ops import estep as es


def dense_oracle(t_source, target, sigma2, w):
    """Float64 transcription of the reference E-step (cpd.py:74-88)."""
    t_source = np.asarray(t_source, np.float64)
    target = np.asarray(target, np.float64)
    d2 = ((t_source[:, None, :] - target[None, :, :]) ** 2).sum(-1)
    pmat = np.exp(-d2 / (2.0 * sigma2))
    c = (2.0 * np.pi * sigma2) ** (t_source.shape[1] * 0.5)
    c *= w / (1.0 - w) * t_source.shape[0] / target.shape[0]
    den = pmat.sum(axis=0)
    den[den == 0] = np.finfo(np.float32).eps
    den += c
    pmat = pmat / den
    pt1 = pmat.sum(axis=0)
    p1 = pmat.sum(axis=1)
    px = pmat @ target
    return pt1, p1, px, p1.sum()


@pytest.mark.parametrize("w", [0.0, 0.2])
@pytest.mark.parametrize("block", [None, 16])
def test_estep_xla_matches_oracle(rng, w, block):
    m, n = 40, 50
    src = rng.random((m, 3)).astype(np.float32)
    tgt = rng.random((n, 3)).astype(np.float32)
    sigma2 = 0.05
    mom = es.estep_xla(src, tgt, sigma2, w, block=block)
    pt1, p1, px, n_p = dense_oracle(src, tgt, sigma2, w)
    assert np.allclose(np.asarray(mom.pt1), pt1, atol=1e-4)
    assert np.allclose(np.asarray(mom.p1), p1, atol=1e-4)
    assert np.allclose(np.asarray(mom.px), px, atol=1e-4)
    assert np.isclose(float(mom.n_p), n_p, rtol=1e-4)
    xx_ref = float((pt1 * (tgt.astype(np.float64) ** 2).sum(1)).sum())
    assert np.isclose(float(mom.xx), xx_ref, rtol=1e-4)


def test_estep_blocked_equals_unblocked(rng):
    src = rng.random((30, 3)).astype(np.float32)
    tgt = rng.random((70, 3)).astype(np.float32)
    a = es.estep_xla(src, tgt, 0.1, 0.1, block=None)
    b = es.estep_xla(src, tgt, 0.1, 0.1, block=13)
    for f_a, f_b in zip(a, b):
        assert np.allclose(np.asarray(f_a), np.asarray(f_b), atol=1e-5)


def test_estep_small_sigma_no_nan(rng):
    # Far-apart clouds with tiny sigma: den underflows to 0 -> eps guard.
    src = rng.random((10, 3)).astype(np.float32)
    tgt = rng.random((12, 3)).astype(np.float32) + 100.0
    mom = es.estep_xla(src, tgt, 1e-6, 0.0)
    for f in mom:
        assert np.all(np.isfinite(np.asarray(f)))
