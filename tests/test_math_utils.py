import numpy as np

from probreg_tpu import math_utils as mu
from probreg_tpu.ops import pairwise


def test_squared_kernel_sum_matches_loop():
    n, dim = 5, 3
    x = np.arange(n * dim, dtype=np.float64).reshape(n, dim)
    ans = np.sum([np.sum((x[i] - x) ** 2) for i in range(n)]) / (n * n * dim)
    assert np.allclose(float(mu.squared_kernel_sum(x, x)), ans, rtol=1e-5)


def test_rbf_kernel_symmetry(rng):
    x = rng.random((5, 3)).astype(np.float32)
    g = np.asarray(mu.rbf_kernel(x, x, 1.0))
    assert np.allclose(g, g.T, atol=1e-6)
    assert np.allclose(np.diag(g), 1.0, atol=1e-5)


def test_sqdist_matches_numpy(rng):
    x = rng.random((7, 3)).astype(np.float32)
    y = rng.random((9, 3)).astype(np.float32)
    d = np.asarray(pairwise.sqdist(x, y))
    ref = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
    assert np.allclose(d, ref, atol=1e-5)


def test_tps_kernels(rng):
    x2 = rng.random((4, 2)).astype(np.float32)
    k2 = np.asarray(pairwise.tps_kernel_2d(x2, x2))
    assert np.allclose(np.diag(k2), 0.0, atol=1e-6)
    d = np.linalg.norm(x2[0] - x2[1])
    assert np.isclose(k2[0, 1], d * d * np.log(d), atol=1e-4)

    x3 = rng.random((4, 3)).astype(np.float32)
    k3 = np.asarray(pairwise.tps_kernel_3d(x3, x3))
    assert np.isclose(k3[0, 1], -np.linalg.norm(x3[0] - x3[1]), atol=1e-5)


def test_inverse_multiquadric(rng):
    x = rng.random((4, 3)).astype(np.float32)
    k = np.asarray(pairwise.inverse_multiquadric_kernel(x, x, c=1.0))
    assert np.allclose(np.diag(k), 1.0, atol=1e-5)


def test_compute_rmse_zero_for_identical(rng):
    x = rng.random((50, 3)).astype(np.float32)
    # The |x|^2+|y|^2-2xy distance form has ~1e-7 absolute f32 cancellation
    # noise at d=0 -> sqrt gives a ~3e-4 distance floor on TPU (exact zeros
    # on CPU). Registration convergence uses rmse *differences*, which the
    # floor cancels out of.
    assert float(mu.compute_rmse(x, x)) < 1e-3


def test_nearest_sqdist_masks_padding(rng):
    src = rng.random((10, 3)).astype(np.float32)
    tgt = rng.random((5, 3)).astype(np.float32)
    d2 = np.asarray(pairwise.nearest_sqdist(src, tgt, block=4))
    ref = (((src[:, None, :] - tgt[None, :, :]) ** 2).sum(-1)).min(1)
    assert np.allclose(d2, ref, atol=1e-5)


def test_normalizer_roundtrip(rng):
    x = rng.random((20, 3)) * 10 + 5
    nrm = mu.Normalizer.fit(x)
    xn = np.asarray(nrm.normalize(x))
    assert np.abs(xn.mean(0)).max() < 1.0
    assert np.allclose(np.asarray(nrm.denormalize(xn)), x, atol=1e-4)

def test_nearest_sqdist_source_chunking_exact():
    """The source axis is chunked (an unchunked (M, block) buffer reaches
    16 GB at M=1M — review finding); chunking must not change results."""
    import jax.numpy as jnp

    from probreg_tpu.ops import pairwise as pw

    rng = np.random.default_rng(0)
    src = rng.random((530, 3)).astype(np.float32)
    tgt = rng.random((700, 3)).astype(np.float32)
    got = np.asarray(pw.nearest_sqdist(src, tgt, block=256, src_block=128))
    d2 = ((src[:, None] - tgt[None]) ** 2).sum(-1)
    np.testing.assert_allclose(got, d2.min(axis=1), rtol=1e-5, atol=1e-6)
    # exclude_zero still works through the chunked path.
    got2 = np.asarray(pw.nearest_sqdist(src, src, block=256, src_block=128,
                                        exclude_zero=True))
    d2s = ((src[:, None] - src[None]) ** 2).sum(-1)
    np.fill_diagonal(d2s, np.inf)
    # atol 2e-5: on real TPU the MXU matmul path rounds tiny self-NN
    # distances slightly differently than the numpy oracle.
    np.testing.assert_allclose(got2, d2s.min(axis=1), rtol=1e-4, atol=2e-5)


def test_fused_dims_ok_rejects_skewed_shapes():
    """The m*n gate alone admits shapes whose PADDED tiles blow VMEM
    (review finding)."""
    from probreg_tpu.ops.em_pallas import fused_dims_ok

    assert fused_dims_ok(390, 390)
    assert fused_dims_ok(1024, 1024)
    assert not fused_dims_ok(65536, 16)    # m*n passes, 32 MB padded tile
    assert not fused_dims_ok(1_000_000, 1)
    assert not fused_dims_ok(16, 65536)
