"""Pairwise-distance primitives and kernel Gram matrices.

TPU-native replacement for the reference's OpenMP column-loop kernels
(/root/reference/probreg/cc/math_utils.cc:5-34). All pairwise distances are
expressed as ``|x|^2 + |y|^2 - 2 x.y^T`` so the O(M*N*D) work lands on the MXU
as a single matmul, and elementwise kernel maps fuse into it under XLA.

For reductions over huge clouds (where the M x N Gram matrix would not fit in
HBM) use the streaming helpers which ``lax.scan`` over row blocks and never
materialize more than a block.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import config


def sqdist(x: jax.Array, y: jax.Array) -> jax.Array:
    """Pairwise squared euclidean distances, shape (M, N) for (M,D),(N,D).

    Clamped at zero: the matmul formulation can go slightly negative in f32.

    Internally centered: the expanded form loses ~|x|^2 * eps to f32
    cancellation, which exceeds real point distances once coordinates
    reach UTM/mm magnitudes (|x| ~ 1e4; the f64 reference never sees
    this). Squared distances are translation invariant, so subtracting a
    shared mean first — exact to the result's ulp — restores O(1)
    accuracy for every kernel/NN builder routed through here at O(M+N)
    extra cost.
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    cen = ((jnp.sum(x, axis=0) + jnp.sum(y, axis=0))
           / (x.shape[0] + y.shape[0])).astype(x.dtype)
    x = x - cen[None, :]
    y = y - cen[None, :]
    x2 = jnp.sum(x * x, axis=-1)[:, None]
    y2 = jnp.sum(y * y, axis=-1)[None, :]
    # precision=HIGHEST is load-bearing: the TPU MXU's default f32 matmul is
    # a single bf16 pass (~4e-3 relative error); the Gaussian exponent
    # d^2/(2*sigma2) amplifies that catastrophically once sigma2 anneals
    # below ~1e-4 and EM starts to oscillate instead of converging.
    xy = jax.lax.dot_general(
        x.astype(config.matmul_dtype),
        y.astype(config.matmul_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(x.dtype)
    return jnp.maximum(x2 + y2 - 2.0 * xy, 0.0)


def squared_kernel(x: jax.Array, y: jax.Array) -> jax.Array:
    """Alias matching the reference C++ symbol (math_utils.cc:15)."""
    return sqdist(x, y)


def rbf_kernel(x: jax.Array, y: jax.Array, beta: float) -> jax.Array:
    """exp(-d^2 / (2*beta)) Gram matrix (math_utils.cc:17-19).

    Note the reference convention: ``beta`` enters linearly (it is the
    variance), not squared.
    """
    return jnp.exp(-sqdist(x, y) / (2.0 * beta))


def tps_kernel_2d(x: jax.Array, y: jax.Array) -> jax.Array:
    """d^2 * log(d) thin-plate-spline kernel, 2-D (math_utils.cc:21-26)."""
    d2 = sqdist(x, y)
    # Threshold at the f32 matmul-distance noise floor (reference uses 1e-9
    # with exact accumulation; our MXU formulation has ~1e-6 absolute noise).
    safe = jnp.maximum(d2, 1e-6)
    return jnp.where(d2 > 1e-6, safe * jnp.log(jnp.sqrt(safe)), 0.0)


def tps_kernel_3d(x: jax.Array, y: jax.Array) -> jax.Array:
    """-d thin-plate-spline kernel, 3-D (math_utils.cc:28-30)."""
    return -jnp.sqrt(sqdist(x, y))


def inverse_multiquadric_kernel(x: jax.Array, y: jax.Array, c: float = 1.0) -> jax.Array:
    """1/sqrt(d^2 + c) kernel (math_utils.cc:32-34)."""
    return 1.0 / jnp.sqrt(sqdist(x, y) + c)


@partial(jax.jit, static_argnames=("block",))
def sqdist_sum(x: jax.Array, y: jax.Array, block: int = 8192) -> jax.Array:
    """sum_ij |x_i - y_j|^2 without materializing the M x N matrix.

    Closed form: N*sum|x|^2 + M*sum|y|^2 - 2 (sum x).(sum y).
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    m, n = x.shape[0], y.shape[0]
    # Internally centered, like sqdist (the closed form shares the
    # |x|^2-scale cancellation).
    cen = ((jnp.sum(x, axis=0) + jnp.sum(y, axis=0)) / (m + n)).astype(
        x.dtype)
    x = x - cen[None, :]
    y = y - cen[None, :]
    sx2 = jnp.sum(x * x)
    sy2 = jnp.sum(y * y)
    sx = jnp.sum(x, axis=0)
    sy = jnp.sum(y, axis=0)
    return n * sx2 + m * sy2 - 2.0 * jnp.dot(sx, sy)


def _pad_rows(x: jax.Array, block: int) -> tuple[jax.Array, int]:
    m = x.shape[0]
    pad = (-m) % block
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    return x, m


@partial(jax.jit, static_argnames=("block", "exclude_zero", "src_block"))
def nearest_sqdist(source: jax.Array, target: jax.Array, block: int = 4096,
                   exclude_zero: bool = False,
                   src_block: int = 4096,
                   target_valid: jax.Array = None) -> jax.Array:
    """For each source point, squared distance to its nearest target point.

    Streaming replacement for the reference's scipy cKDTree queries
    (math_utils.py:32-33, bcpd.py:86). Brute force is MXU-shaped and wins on
    TPU for the point counts involved. ``exclude_zero`` skips exact matches
    (self-neighbors) — used for point-spacing estimation.

    BOTH axes are chunked: the transient distance buffer is
    (src_block, block) f32 regardless of cloud sizes — an unchunked
    source axis materialized (M, block) per scan step, 16 GB at M=1M
    (review finding; CLAUDE.md flags >4 GB buffers as a tunnel-fault
    trigger).

    ``target_valid``: optional (N,) 0/1 mask — invalid rows are never a
    nearest neighbor (ragged-batch padding). Use this, NOT a far-offset
    coordinate trick: sqdist centers on the joint mean, so rows pushed
    1e6 away drag the centroid off the real cloud and re-introduce the
    cancellation the centering exists to remove.
    """
    source = jnp.asarray(source)
    target = jnp.asarray(target)
    m = source.shape[0]
    tgt, n = _pad_rows(target, block)
    n_blocks = tgt.shape[0] // block
    blocks = tgt.reshape(n_blocks, block, tgt.shape[1])
    if target_valid is not None:
        tv, _ = _pad_rows(jnp.asarray(target_valid, source.dtype), block)
        vblocks = tv.reshape(n_blocks, block)
    else:
        vblocks = jnp.ones((n_blocks, block), source.dtype)
    base = jnp.arange(block)
    offs = jnp.arange(n_blocks) * block
    src_p, _ = _pad_rows(source, src_block)
    schunks = src_p.reshape(-1, src_block, src_p.shape[1])

    def one_chunk(sc):
        def body(best, inp):
            blk, vb, idx0 = inp
            d2 = sqdist(sc, blk)
            valid = ((idx0 + base) < n) & (vb > 0)
            d2 = jnp.where(valid[None, :], d2, jnp.inf)
            if exclude_zero:
                d2 = jnp.where(d2 <= 1e-12, jnp.inf, d2)
            return jnp.minimum(best, jnp.min(d2, axis=1)), None

        init = jnp.full((src_block,), jnp.inf, sc.dtype)
        best, _ = jax.lax.scan(body, init, (blocks, vblocks, offs))
        return best

    return jax.lax.map(one_chunk, schunks).reshape(-1)[:m]


def point_spacing_sq(points: jax.Array) -> jax.Array:
    """Mean squared nearest-neighbor spacing of a cloud (self excluded)."""
    d2 = nearest_sqdist(points, points, exclude_zero=True)
    d2 = jnp.where(jnp.isfinite(d2), d2, 0.0)
    return jnp.mean(d2)
