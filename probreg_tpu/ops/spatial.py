"""Spatial ordering helpers for tile-culled kernels.

Tile culling (ops/estep_pallas.py) skips (source-tile, target-tile) pairs
whose bounding-sphere distance lower bound guarantees every pairwise
Gaussian underflows f32 to exactly zero. That only pays when tiles are
spatially COMPACT — a tile of 1024 points in input order spans the whole
cloud and never culls. Morton (Z-order) sorting makes consecutive points
spatial neighbors, so a contiguous tile is a compact box; moments are
row/column reductions so the permutation is undone by a gather (or, for
order-invariant consumers like the rigid/affine M-steps, not at all).

No counterpart in the reference: its IFGT gets spatial locality from
k-center clustering (cc/kcenter_clustering.cc) — this is the tiled-MXU
equivalent of the same idea.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _spread3(x: jax.Array) -> jax.Array:
    """Spread 10 bits to every 3rd bit (standard Morton magic numbers)."""
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def _spread2(x: jax.Array) -> jax.Array:
    """Spread 15 bits to every 2nd bit."""
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def morton_code(points: jax.Array) -> jax.Array:
    """(N, D) points -> (N,) int32 Morton codes (D in {2, 3}).

    Coordinates are min-max quantized to 10 bits (3-D) / 15 bits (2-D);
    ties are harmless (the consumer only needs approximate locality).
    """
    points = jnp.asarray(points)
    dim = points.shape[1]
    lo = jnp.min(points, axis=0)
    hi = jnp.max(points, axis=0)
    span = jnp.maximum(hi - lo, jnp.finfo(points.dtype).tiny)
    bits = 10 if dim >= 3 else 15
    scale = float(2 ** bits - 1)
    q = jnp.clip((points - lo) / span * scale, 0.0, scale).astype(jnp.int32)
    if dim == 2:
        return _spread2(q[:, 0]) | (_spread2(q[:, 1]) << 1)
    code = _spread3(q[:, 0]) | (_spread3(q[:, 1]) << 1) \
        | (_spread3(q[:, 2]) << 2)
    if dim > 3:
        # Rare (feature-space clouds): order by the first 3 axes only —
        # still a valid locality order for culling purposes.
        pass
    return code


def morton_order(points: jax.Array) -> jax.Array:
    """Permutation that sorts points into Z-order."""
    return jnp.argsort(morton_code(points))


def morton_order_np(points) -> "np.ndarray":
    """Host-side Z-order permutation (numpy — no device dispatch).

    Used by entry points that pre-sort clouds ONCE before sharding /
    jitting (parallel/sharded.py): running the jnp version eagerly would
    cost a device round trip per registration. The native radix-sort path
    (cc/io_native.cpp::morton_order) is ~4-6x faster at 1M points and
    bit-identical for float32 clouds; numpy is the fallback.
    """
    import numpy as np

    pts = np.asarray(points)
    if pts.ndim == 2 and pts.shape[1] in (2, 3) \
            and pts.dtype == np.float32:
        try:
            from probreg_tpu import _io_native as _nat

            return _nat.morton_order(np.ascontiguousarray(pts))
        except (ImportError, AttributeError):  # pragma: no cover
            pass
    dim = pts.shape[1]
    lo = pts.min(axis=0)
    span = np.maximum(pts.max(axis=0) - lo, np.finfo(np.float32).tiny)
    bits = 10 if dim >= 3 else 15
    scale = float(2 ** bits - 1)
    q = np.clip((pts - lo) / span * scale, 0.0, scale).astype(np.int64)

    def spread(x, step):
        out = np.zeros_like(x)
        for b in range(bits):
            out |= ((x >> b) & 1) << (b * step)
        return out

    if dim == 2:
        code = spread(q[:, 0], 2) | (spread(q[:, 1], 2) << 1)
    else:
        code = spread(q[:, 0], 3) | (spread(q[:, 1], 3) << 1) \
            | (spread(q[:, 2], 3) << 2)
    return np.argsort(code, kind="stable")
