"""Pallas fused E-step vs the XLA oracle (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from probreg_tpu.ops import estep as estep_ops
from probreg_tpu.ops import estep_pallas


@pytest.mark.parametrize("m,n,w", [(100, 130, 0.0), (256, 512, 0.2), (530, 260, 0.1)])
def test_estep_fused_matches_xla(rng, m, n, w):
    d = 3
    src = rng.normal(size=(m, d)).astype(np.float32)
    tgt = rng.normal(size=(n, d)).astype(np.float32)
    sigma2 = jnp.asarray(0.7, jnp.float32)

    ref = estep_ops.estep_xla(src, tgt, sigma2, w=w)
    out = estep_pallas.estep_fused(
        src, tgt, sigma2, w=w, tile_m=128, tile_n=128, interpret=True
    )

    np.testing.assert_allclose(np.asarray(out.pt1), np.asarray(ref.pt1), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.p1), np.asarray(ref.p1), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.px), np.asarray(ref.px), rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(float(out.n_p), float(ref.n_p), rtol=1e-5)
    np.testing.assert_allclose(float(out.xx), float(ref.xx), rtol=1e-5)


def test_estep_fused_2d(rng):
    src = rng.normal(size=(70, 2)).astype(np.float32)
    tgt = rng.normal(size=(90, 2)).astype(np.float32)
    sigma2 = jnp.asarray(0.3, jnp.float32)
    ref = estep_ops.estep_xla(src, tgt, sigma2, w=0.05)
    out = estep_pallas.estep_fused(src, tgt, sigma2, w=0.05, tile_m=64, tile_n=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out.px), np.asarray(ref.px), rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.p1), np.asarray(ref.p1), rtol=2e-5, atol=1e-6)
