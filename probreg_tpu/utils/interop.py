"""Host-boundary conversion helpers.

The reference accepts ``np.ndarray | open3d PointCloud`` at every entry point
via a ``cv`` lambda (cpd.py:444, bcpd.py:182, filterreg.py:306, ...). Open3D
is an *optional* dependency here: when present, the same duck-typing works;
when absent, plain arrays (numpy or jax) pass through.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np

try:  # pragma: no cover - open3d is optional
    import open3d as _o3

    _HAS_O3 = True
except Exception:  # pragma: no cover
    _o3 = None
    _HAS_O3 = False


def has_open3d() -> bool:
    return _HAS_O3


def as_points(x: Any, dtype=np.float32) -> np.ndarray:
    """Convert point-cloud-ish input to an (N, D) float array.

    Device (jax) arrays of the right dtype pass through untouched —
    ``np.asarray`` on one would silently round-trip device->host->device
    (two RTTs per registration on remote TPU).
    """
    if isinstance(x, jax.Array):
        return x if x.dtype == dtype else x.astype(dtype)
    if _HAS_O3:
        if isinstance(x, _o3.geometry.PointCloud):
            return np.asarray(x.points, dtype=dtype)
        if isinstance(x, _o3.utility.Vector3dVector):
            return np.asarray(x, dtype=dtype)
    return np.asarray(x, dtype=dtype)


def pad_ragged(clouds, dtype=np.float32):
    """Stack variable-length clouds into (B, max_N, D) + (B, max_N) masks.

    The padded rows are zeros with mask 0; batch registration entry points
    route masked inputs through E-steps where padded points carry no
    posterior mass (exactly equivalent to registering each pair unpadded).
    """
    arrs = [np.asarray(as_points(c), dtype=dtype) for c in clouds]
    nmax = max(a.shape[0] for a in arrs)
    out = np.zeros((len(arrs), nmax, arrs[0].shape[1]), dtype)
    mask = np.zeros((len(arrs), nmax), dtype)
    for i, a in enumerate(arrs):
        out[i, : a.shape[0]] = a
        mask[i, : a.shape[0]] = 1.0
    return out, mask


def as_normals(x: Optional[Any], dtype=np.float32) -> Optional[np.ndarray]:
    if x is None:
        return None
    if _HAS_O3 and isinstance(x, _o3.geometry.PointCloud):
        return np.asarray(x.normals, dtype=dtype)
    return as_points(x, dtype)


def maybe_o3_roundtrip(points, original):
    """Return ``points`` wrapped in the container type of ``original``.

    Mirrors Transformation.transform's Vector3dVector round-trip
    (reference transformation.py:23-26).
    """
    if _HAS_O3 and isinstance(original, _o3.utility.Vector3dVector):
        return _o3.utility.Vector3dVector(np.asarray(points, dtype=np.float64))
    return points
