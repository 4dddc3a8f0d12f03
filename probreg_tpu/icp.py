"""Point-to-point ICP — the classical baseline the reference compares against.

The reference has no ICP of its own: its examples/icp_test.py and the
README timing table call Open3D's ``registration_icp``. This TPU-native
ICP removes that dependency and makes the baseline comparison
(examples/icp_comparison.py, README.md:135-144) self-contained:

* correspondences: brute-force nearest neighbor as a streaming argmin over
  MXU distance blocks (no KD-tree — at registration-scale clouds the MXU
  beats tree traversal on TPU, same argument as ops/pairwise.nearest_sqdist);
* update: weighted Kabsch (ops/rigid_solvers, kabsch.cc semantics) with
  an optional trimmed quantile for outlier rejection;
* loop: whole ICP as one ``lax.while_loop`` program — a registration is a
  single device dispatch, like every other family here.
"""

from __future__ import annotations

from collections import namedtuple
from functools import partial
from typing import Any, Callable, List

import jax
import jax.numpy as jnp
import numpy as np

from . import config as _config
from .models import transformation as tf
from .ops import rigid_solvers
from .ops.pairwise import sqdist
from .utils import interop

ICPResult = namedtuple("ICPResult", ["transformation", "rmse", "n_iter"])


def _nearest(t_source, target, block: int = 4096):
    """(d2, idx) of each source point's nearest target (streaming argmin)."""
    m = t_source.shape[0]
    n, dim = target.shape
    pad = (-n) % block
    tgt = jnp.concatenate(
        [target, jnp.full((pad, dim), 1e15, target.dtype)], axis=0)
    nb = tgt.shape[0] // block
    blocks = tgt.reshape(nb, block, dim)
    offs = jnp.arange(nb) * block

    def body(carry, inp):
        best_d2, best_ix = carry
        blk, off = inp
        d2 = sqdist(t_source, blk)
        bd = jnp.min(d2, axis=1)
        bi = jnp.argmin(d2, axis=1).astype(jnp.int32) + off
        take = bd < best_d2
        return (jnp.where(take, bd, best_d2),
                jnp.where(take, bi, best_ix)), None

    init = (jnp.full((m,), jnp.inf, t_source.dtype),
            jnp.zeros((m,), jnp.int32))
    (d2, idx), _ = jax.lax.scan(body, init, (blocks, offs))
    return d2, idx


@partial(jax.jit, static_argnames=("maxiter", "trim_fraction"))
def _run_icp(source, target, rot0, t0, *, maxiter, tol, trim_fraction):
    m = source.shape[0]

    def step(rot, t):
        t_src = source @ rot.T + t
        d2, idx = _nearest(t_src, target)
        corr = target[idx]
        if trim_fraction > 0.0:
            # Trimmed ICP: zero-weight the worst-matching quantile.
            thresh = jnp.quantile(d2, 1.0 - trim_fraction)
            w = (d2 <= thresh).astype(source.dtype)
        else:
            w = jnp.ones((m,), source.dtype)
        dr, dt = rigid_solvers.weighted_kabsch(t_src, corr, w)
        rot_n = dr @ rot
        t_n = dr @ t + dt
        wsum = jnp.maximum(jnp.sum(w), 1.0)
        rmse = jnp.sqrt(jnp.sum(w * d2) / wsum)
        return rot_n, t_n, rmse

    def cond(state):
        _, _, rmse, rmse_prev, i = state
        return jnp.logical_and(
            i < maxiter,
            jnp.logical_or(i == 0, jnp.abs(rmse_prev - rmse) >= tol))

    def body(state):
        rot, t, rmse, _, i = state
        rot_n, t_n, rmse_n = step(rot, t)
        return (rot_n, t_n, rmse_n, rmse, i + 1)

    state = (rot0, t0, jnp.asarray(jnp.inf, source.dtype),
             jnp.asarray(jnp.inf, source.dtype), jnp.asarray(0))
    rot, t, rmse, _, i = jax.lax.while_loop(cond, body, state)
    return rot, t, rmse, i


def registration_icp(
    source,
    target,
    maxiter: int = 50,
    tol: float = 1.0e-6,
    trim_fraction: float = 0.0,
    tf_init_params: dict = {},
    callbacks: List[Callable] = [],
    **kwargs: Any,
) -> ICPResult:
    """Point-to-point ICP registration.

    Args:
        source: Source point cloud (ndarray or open3d PointCloud).
        target: Target point cloud.
        maxiter: Maximum ICP iterations.
        tol: Convergence tolerance on the correspondence RMSE delta.
        trim_fraction: Fraction of worst correspondences to drop per
            iteration (trimmed ICP; 0 = classic).
        tf_init_params: Initial rigid transform ({'rot': ..., 't': ...}).
        callbacks: Called with the current Transformation each iteration
            (forces one dispatch per iteration; the no-callback path runs
            the whole ICP as one program).

    Returns:
        ICPResult: (RigidTransformation, final rmse, iterations run).
    """
    src = jnp.asarray(interop.as_points(source, dtype=_config.config.dtype))
    tgt = jnp.asarray(interop.as_points(target, dtype=_config.config.dtype))
    dim = src.shape[1]
    rot0 = jnp.asarray(tf_init_params.get("rot", np.eye(dim)),
                       _config.config.dtype)
    t0 = jnp.asarray(tf_init_params.get("t", np.zeros(dim)),
                     _config.config.dtype)
    if callbacks:
        rot, t = rot0, t0
        rmse = jnp.asarray(jnp.inf, _config.config.dtype)
        rmse_prev = None
        it = 0
        for i in range(maxiter):
            rot, t, rmse, _ = _run_icp(
                src, tgt, rot, t, maxiter=1, tol=0.0,
                trim_fraction=float(trim_fraction))
            it = i + 1
            for c in callbacks:
                c(tf.RigidTransformation(rot, t))
            r = float(rmse)
            if rmse_prev is not None and abs(rmse_prev - r) < tol:
                break
            rmse_prev = r
        return ICPResult(tf.RigidTransformation(rot, t), rmse, it)
    rot, t, rmse, i = _run_icp(src, tgt, rot0, t0, maxiter=int(maxiter),
                               tol=float(tol),
                               trim_fraction=float(trim_fraction))
    return ICPResult(tf.RigidTransformation(rot, t), rmse, i)
