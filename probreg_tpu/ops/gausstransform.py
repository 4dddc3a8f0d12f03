"""Streaming exact Gauss transform on the MXU.

    out[i, c] = sum_j exp(-|target_i - source_j|^2 / h^2) * weights[j, c]

TPU-native replacement for the reference's Direct/IFGT split
(probreg/gauss_transform.py:10-44, probreg/cc/ifgt.cc): a tiled exact
evaluation is MXU-shaped (the kernel matrix block is one matmul against the
weight channels) and at probreg's point counts is faster than the IFGT's
cluster/Taylor machinery would be on this hardware. Memory stays
O(N * block) via lax.scan over source blocks.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import config
from .pairwise import sqdist


@partial(jax.jit, static_argnames=("block", "assume_sorted"))
def gauss_transform(
    source: jax.Array,
    target: jax.Array,
    weights: jax.Array,
    h,
    block: Optional[int] = None,
    assume_sorted: bool = False,
) -> jax.Array:
    """Exact Gauss transform; ``weights`` is (M,) or (M, C), h the bandwidth.

    Matches the reference convention exp(-d^2 / h^2)
    (gauss_transform.py:10-18) — note h^2, not 2h^2.
    """
    source = jnp.asarray(source)
    target = jnp.asarray(target)
    weights = jnp.asarray(weights)
    squeeze = weights.ndim == 1
    if squeeze:
        weights = weights[:, None]
    m, dim = source.shape
    h2 = jnp.asarray(h, source.dtype) ** 2

    # Large problems route to the tile-culled single-pass Pallas kernel:
    # no posterior normalizer -> no double-exp penalty, so it is at worst
    # dense-fused speed and wins by 1/active-fraction as h shrinks.
    # Gates (review findings): the kernel packs points into 8-sublane
    # strips and Morton codes need >= 2-D, so only 2 <= dim <= 8 clouds
    # qualify (33-D FPFH feature spaces crash _pad_transpose otherwise);
    # and UNSORTED callers qualify only from 1 << 28 pairs — they pay two
    # Morton argsorts (~0.3 s each at 200k keys) + an unsort scatter PER
    # CALL, which per-iteration E-step bodies must never do (same rule as
    # ops/estep.py's unsorted threshold).
    min_pairs = (config.culled_estep_min_pairs if assume_sorted
                 else max(config.culled_estep_min_pairs, 1 << 28))
    if (jax.default_backend() == "tpu"
            and config.use_culled_estep
            and weights.shape[1] <= 8
            and 2 <= dim <= 8
            and m * target.shape[0] >= min_pairs):
        from . import estep_pallas

        out = estep_pallas.gauss_transform_culled(
            source, target, weights, h, sort=not assume_sorted)
        return out[:, 0] if squeeze else out

    if block is None:
        block = max(min(config.estep_chunk, m,
                        max(128, ((1 << 28) // max(target.shape[0], 1))
                            // 128 * 128)), 1)
    if m <= block:
        k = jnp.exp(-sqdist(target, source) / h2)
        out = k @ weights
        return out[:, 0] if squeeze else out

    pad = (-m) % block
    src = jnp.concatenate([source, jnp.zeros((pad, dim), source.dtype)], axis=0)
    wgt = jnp.concatenate(
        [weights, jnp.zeros((pad, weights.shape[1]), weights.dtype)], axis=0
    )
    nb = src.shape[0] // block
    src_blocks = src.reshape(nb, block, dim)
    wgt_blocks = wgt.reshape(nb, block, weights.shape[1])
    offs = jnp.arange(nb) * block
    base = jnp.arange(block)

    def body(acc, inp):
        s_blk, w_blk, off = inp
        mask = ((off + base) < m).astype(source.dtype)
        k = jnp.exp(-sqdist(target, s_blk) / h2) * mask[None, :]
        return acc + k @ w_blk, None

    init = jnp.zeros((target.shape[0], weights.shape[1]), source.dtype)
    out, _ = jax.lax.scan(body, init, (src_blocks, wgt_blocks, offs))
    return out[:, 0] if squeeze else out


@partial(jax.jit, static_argnames=("need_m2", "block", "assume_sorted"))
def filterreg_moments(
    f_source: jax.Array,
    f_target: jax.Array,
    y: jax.Array,
    normals: Optional[jax.Array],
    need_m2: bool = False,
    block: Optional[int] = None,
    assume_sorted: bool = False,
):
    """Exact FilterReg E-step moments in one fused streaming pass.

    K_ij = exp(-|fx_i - fy_j|^2 / 2) over sigma-scaled features
    (reference filterreg.py:78-106 computes these through the permutohedral
    lattice; this is the exact dense version).

    Returns (m0 (M,), m1 (M, D), m2 (M,) | None, nx (M, D) | None).
    """
    dim = y.shape[1]
    chans = [jnp.ones((y.shape[0], 1), y.dtype), y]
    if need_m2:
        chans.append(jnp.sum(y * y, axis=1, keepdims=True))
    if normals is not None:
        chans.append(jnp.asarray(normals, y.dtype))
    v = jnp.concatenate(chans, axis=1)
    out = gauss_transform(f_target, f_source, v, jnp.sqrt(2.0), block=block,
                          assume_sorted=assume_sorted)
    m0 = out[:, 0]
    m1 = out[:, 1:1 + dim]
    col = 1 + dim
    m2 = None
    if need_m2:
        m2 = out[:, col]
        col += 1
    nx = out[:, col:col + dim] if normals is not None else None
    return m0, m1, m2, nx
