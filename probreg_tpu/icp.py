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
from .ops import em_pallas
from .utils import interop

ICPResult = namedtuple("ICPResult", ["transformation", "rmse", "n_iter"])


def _nearest_t(t_src_t, xs_t, block: int = 4096, src_block: int = 4096):
    """(d2, idx) of each source point's nearest target, transposed layout.

    BOTH axes are chunked: the transient distance buffer is
    (src_block, block) f32 — 64 MB at the defaults — regardless of cloud
    sizes. An unchunked source axis materialized (M, block) per scan
    step, 16 GB at M=1M (review finding; CLAUDE.md flags >4 GB buffers
    as a tunnel-fault trigger).
    """
    dim, m = t_src_t.shape
    n = xs_t.shape[1]
    # Adaptive blocks: at bunny-size clouds the fixed 4096 defaults padded
    # a ~390-point problem to a 4096x4096 distance block — 100x wasted
    # MXU/VPU work per iteration (round-5 ICP bench finding).
    block = min(block, ((n + 127) // 128) * 128)
    src_block = min(src_block, ((m + 7) // 8) * 8)
    pad_t = (-n) % block
    tgt = jnp.concatenate(
        [xs_t, jnp.full((dim, pad_t), 1e15, xs_t.dtype)], axis=1)
    nb = tgt.shape[1] // block
    tblocks = jnp.moveaxis(tgt.reshape(dim, nb, block), 1, 0)
    x2b = jnp.sum(tblocks * tblocks, axis=1)               # (nb, block)
    # int32 keeps the scan carry type stable under jax x64 (the f64
    # validation tier): a bare arange would promote to int64 there.
    offs = jnp.arange(nb, dtype=jnp.int32) * jnp.int32(block)
    pad_s = (-m) % src_block
    src = jnp.concatenate(
        [t_src_t, jnp.zeros((dim, pad_s), t_src_t.dtype)], axis=1)
    ns = src.shape[1] // src_block
    sblocks = jnp.moveaxis(src.reshape(dim, ns, src_block), 1, 0)

    def one_chunk(sb):                                     # (dim, src_block)
        y2 = jnp.sum(sb * sb, axis=0)                      # (src_block,)

        def body(carry, inp):
            best_d2, best_ix = carry
            blk, x2, off = inp
            d2 = jnp.maximum(
                y2[:, None] + x2[None, :] - 2.0 * jax.lax.dot_general(
                    sb, blk, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST), 0.0)
            bd = jnp.min(d2, axis=1)
            bi = jnp.argmin(d2, axis=1).astype(jnp.int32) + off
            take = bd < best_d2
            return (jnp.where(take, bd, best_d2),
                    jnp.where(take, bi, best_ix)), None

        init = (jnp.full((src_block,), jnp.inf, sb.dtype),
                jnp.zeros((src_block,), jnp.int32))
        out, _ = jax.lax.scan(body, init, (tblocks, x2b, offs))
        return out

    d2c, idxc = jax.lax.map(one_chunk, sblocks)
    return d2c.reshape(-1)[:m], idxc.reshape(-1)[:m]


@partial(jax.jit, static_argnames=("maxiter", "trim_fraction"))
def _run_icp(source, target, rot0, t0, *, maxiter, tol, trim_fraction):
    # Transposed (D, M) layout inside the loop (CLAUDE.md: per-iteration
    # ops on (M, 3) arrays cost ~0.25 ms of relayout each on TPU).
    from .filterreg import _kabsch_t

    ys_t = source.T
    xs_t = target.T
    m = source.shape[0]
    # Shared-centroid centering: the expanded-form f32 NN distances lose
    # ~|x|^2 * eps to cancellation — ICP diverged outright at a 1e4
    # coordinate offset (see cpd._run_em_t). rot0/t0 convert in; the
    # result converts back.
    cen = ((jnp.sum(ys_t, axis=1) + jnp.sum(xs_t, axis=1))
           / (m + xs_t.shape[1]))
    ys_t = ys_t - cen[:, None]
    xs_t = xs_t - cen[:, None]
    t0 = t0 + rot0 @ cen - cen
    # Trim count resolved at trace time: a sort-free lax.top_k threshold
    # replaces the per-iteration jnp.quantile full sort (~0.3 s at 200k
    # keys on TPU, CLAUDE.md).
    k_trim = int(round(trim_fraction * m)) if trim_fraction > 0.0 else 0

    def step(rot, t):
        t_src_t = rot @ ys_t + t[:, None]
        d2, idx = _nearest_t(t_src_t, xs_t)
        corr_t = xs_t[:, idx]
        if k_trim > 0:
            # Trimmed ICP: zero-weight the k worst correspondences.
            worst = jax.lax.top_k(d2, k_trim)[0]
            w = (d2 < worst[-1]).astype(source.dtype)
        else:
            w = jnp.ones((m,), source.dtype)
        dr, dt = _kabsch_t(t_src_t, corr_t, w)
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
    t = t + cen - rot @ cen                     # centered -> raw frame
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
    # Single-launch fused kernel (ops/em_pallas._icp_kernel): the whole
    # ICP loop in VMEM — ~0.3 ms for a 30-iteration bunny registration vs
    # ~2.6 ms for the XLA while_loop (v5e, amortized), 4.7x the
    # reference's 1.41 ms Open3D baseline (reference README.md:139).
    if (not callbacks and trim_fraction == 0.0 and dim == 3
            and src.dtype == jnp.float32
            and jax.default_backend() == "tpu"
            and _config.config.use_fused_em
            and em_pallas.fused_dims_ok(src.shape[0], tgt.shape[0])):
        rot, t, rmse, i = em_pallas.run_icp_fused(
            src, tgt, rot0, t0, maxiter=int(maxiter), tol=float(tol))
        return ICPResult(tf.RigidTransformation(rot, t), rmse, i)
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


def registration_icp_batch(
    sources,
    targets,
    maxiter: int = 50,
    tol: float = 1.0e-6,
    trim_fraction: float = 0.0,
) -> List[ICPResult]:
    """Register B cloud pairs with ICP in one compiled program.

    Batch-serving symmetry with the other families
    (cpd.registration_cpd_batch etc.): ``sources``/``targets`` are
    (B, M, 3)/(B, N, 3) stacks, or Python lists of clouds with DIFFERENT
    point counts per pair (RAGGED — zero-padded to the batch maximum and
    registered through masked hard correspondences exactly equivalent to
    registering each pair unpadded). On TPU each pair runs as one fused
    whole-ICP kernel launch (ops/em_pallas.run_icp_fused, ~0.7 ms/pair at
    bunny size); elsewhere, or for trimmed/oversized batches, pairs fall
    back to per-pair :func:`registration_icp` calls.

    Returns a list of ``ICPResult``.
    """
    import jax

    ragged = isinstance(sources, (list, tuple)) \
        or isinstance(targets, (list, tuple))
    if ragged:
        src_p, smask = interop.pad_ragged(
            list(sources), _config.config.dtype)
        tgt_p, tmask = interop.pad_ragged(
            list(targets), _config.config.dtype)
    else:
        src_p = np.asarray(interop.as_points(sources,
                                             dtype=_config.config.dtype))
        tgt_p = np.asarray(interop.as_points(targets,
                                             dtype=_config.config.dtype))
        smask = tmask = None
    nb, m = src_p.shape[0], src_p.shape[1]
    n = tgt_p.shape[1]
    if (trim_fraction == 0.0 and src_p.shape[2] == 3
            and src_p.dtype == np.float32
            and jax.default_backend() == "tpu"
            and _config.config.use_fused_em
            and em_pallas.fused_dims_ok(m, n)):
        out = em_pallas.run_icp_fused_batch(
            jnp.asarray(src_p), jnp.asarray(tgt_p),
            None if smask is None else jnp.asarray(smask),
            None if tmask is None else jnp.asarray(tmask),
            maxiter=int(maxiter), tol=float(tol), masked=smask is not None)
        # ONE packed fetch: separate np.asarray calls cost one ~33 ms
        # tunnel RTT EACH on the remote-TPU harness (CLAUDE.md).
        rots, ts, rmses, iters = jax.device_get(out)
        return [ICPResult(tf.RigidTransformation(rots[b], ts[b]),
                          rmses[b], int(iters[b])) for b in range(nb)]
    srcs = sources if ragged else [src_p[b] for b in range(nb)]
    tgts = targets if ragged else [tgt_p[b] for b in range(nb)]
    return [registration_icp(s, t, maxiter=maxiter, tol=tol,
                             trim_fraction=trim_fraction)
            for s, t in zip(srcs, tgts)]
