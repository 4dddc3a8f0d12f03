"""Coarse-to-fine (multiresolution) registration pipelines.

The reference library leaves multiresolution to the user: its own examples
voxel-downsample before registering (reference examples/utils.py:20,51-52)
and the full-resolution cloud never benefits from the coarse solve. Here the
pyramid is a first-class pipeline: register the coarsest level, then
warm-start each finer level with BOTH the recovered transform
(``tf_init_params``) and the converged variance (``sigma2_init``), so the
expensive full-resolution EM iterations skip the dense start-temperature
regime entirely and run inside the annealed — on TPU, tile-culled
(ops/estep_pallas.py) — regime. Measured on v5e at 1M points, a dense
start-regime iteration costs 17-22 s while a culled late-regime iteration
costs 2-4 s (BENCHMARKS.md): the pyramid converts nearly every
full-resolution iteration into the cheap kind.

Levels are built host-side with :func:`probreg_tpu.utils.io.voxel_down_sample`
(native C++ path when available). The voxel schedule is geometric; the
coarsest size is auto-fit so the coarsest clouds hold ``coarse_points``
points (a one-shot density probe — point clouds are surfaces, so occupied
voxels scale ~ (diag/v)^2).
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional, Sequence

import jax
import numpy as np

from . import config as _config
from .utils import interop
from .utils import io as pio

__all__ = [
    "build_pyramid",
    "auto_voxel_sizes",
    "registration_cpd_pyramid",
    "registration_filterreg_pyramid",
    "registration_bcpd_pyramid",
    "registration_gmmtree_pyramid",
    "registration_icp_pyramid",
]


def _voxel_count(points: np.ndarray, voxel_size: float) -> int:
    """Number of occupied voxels at ``voxel_size`` (density probe)."""
    keys = np.floor((points - points.min(axis=0)) / voxel_size).astype(np.int64)
    # Pack to a single int64 key: bounded coordinates after the min-shift.
    span = keys.max(axis=0) + 1
    flat = keys[:, 0]
    for d in range(1, keys.shape[1]):
        flat = flat * span[d] + keys[:, d]
    return int(np.unique(flat).size)


def auto_voxel_sizes(
    source: np.ndarray,
    target: np.ndarray,
    levels: int = 3,
    coarse_points: int = 3000,
    factor: float = 4.0,
) -> List[float]:
    """Geometric voxel schedule, coarsest first, ``0.0`` = full resolution.

    The coarsest voxel is fitted so the coarser of the two downsampled
    clouds holds roughly ``coarse_points`` points; each finer level divides
    the voxel by ``factor``; the last level is always the original clouds.
    """
    if levels < 2:
        return [0.0]
    lo = np.minimum(source.min(axis=0), target.min(axis=0))
    hi = np.maximum(source.max(axis=0), target.max(axis=0))
    diag = float(np.linalg.norm(hi - lo))
    n = int(min(source.shape[0], target.shape[0]))
    if diag == 0.0 or n <= coarse_points:
        # Nothing to gain from downsampling; run flat.
        return [0.0]
    probe = source if source.shape[0] <= target.shape[0] else target
    # Surface scaling: occupied voxels ~ (diag/v)^2. Newton-ish refinement
    # against the true count (each probe is one np.unique pass).
    v = diag * float(np.sqrt(max(coarse_points, 8) / n))
    for _ in range(3):
        cnt = _voxel_count(probe, v)
        if cnt <= 8:  # collapsed — back off
            v *= 0.5
            continue
        ratio = cnt / float(coarse_points)
        if 0.6 <= ratio <= 1.7:
            break
        v *= float(np.sqrt(ratio))
    sizes = [v / (factor ** i) for i in range(levels - 1)]
    return sizes + [0.0]


def build_pyramid(points: np.ndarray, voxel_sizes: Sequence[float]) -> List[np.ndarray]:
    """Downsampled copies of ``points`` per level (coarsest first).

    ``0.0`` (or None) keeps the original points for that level.
    """
    dtype = _config.config.dtype
    out = []
    for v in voxel_sizes:
        if not v:
            out.append(np.asarray(points, dtype))
        else:
            out.append(np.asarray(pio.voxel_down_sample(points, float(v)), dtype))
    return out


def _carry_sigma2(prev_sigma2: float, prev_voxel: float,
                  inflation: float) -> float:
    """Warm-start variance for the next (finer) level.

    The converged coarse variance reflects residual misalignment at coarse
    geometry; moving to a finer level, the clouds differ from the coarse
    ones by up to ~voxel/2 per point (centroid averaging), so floor the
    carried variance at (voxel/2)^2 and inflate for basin safety.
    """
    floor = 0.25 * float(prev_voxel) ** 2
    return max(float(prev_sigma2) * float(inflation), floor,
               float(np.finfo(np.float32).eps))


def _prepare_levels(source, target, voxel_sizes, levels, coarse_points,
                    factor, keep_device_last=True):
    """Shared level-prep: interop, auto schedule, per-level downsampling.

    Returns ``(src_levels, tgt_levels, voxel_sizes)``; when
    ``keep_device_last`` and the finest level is full resolution, the
    caller's (possibly on-device) arrays are passed through unchanged.
    """
    src = interop.as_points(source, dtype=_config.config.dtype)
    tgt = interop.as_points(target, dtype=_config.config.dtype)
    src_np = np.asarray(src)
    tgt_np = np.asarray(tgt)
    if voxel_sizes is None:
        voxel_sizes = auto_voxel_sizes(src_np, tgt_np, levels,
                                       coarse_points, factor)
    voxel_sizes = list(voxel_sizes)
    src_levels = build_pyramid(src_np, voxel_sizes)
    tgt_levels = build_pyramid(tgt_np, voxel_sizes)
    if keep_device_last and voxel_sizes[-1] in (0.0, None):
        src_levels[-1] = src
        tgt_levels[-1] = tgt
    return src_levels, tgt_levels, voxel_sizes


def _default_level_maxiters(n_levels, maxiter, polish_divisor):
    """Full budget coarse, half at intermediates, polish at full res."""
    if n_levels == 1:
        return [maxiter]
    polish = max(maxiter // polish_divisor, 10)
    return ([maxiter] + [max(maxiter // 2, 10)] * (n_levels - 2) + [polish])


def _fit_level_maxiters(level_maxiters, n_levels, maxiter, polish_divisor,
                        auto_schedule):
    """Resolve the per-level iteration budgets against the ACTUAL schedule.

    ``auto_voxel_sizes`` degenerates to fewer levels than requested when
    there is nothing to downsample (tiny clouds, zero-diagonal fixtures) —
    a user who sized ``level_maxiters`` to the ``levels`` they asked for
    must not crash on that data-dependent collapse. Keep the coarse
    search budget plus the finest budgets (the only level of a fully
    collapsed schedule is both coarsest and finest, so it gets the full
    coarse budget). An explicit ``voxel_sizes`` schedule still requires
    an exact length match.
    """
    if level_maxiters is None:
        return _default_level_maxiters(n_levels, maxiter, polish_divisor)
    lm = list(level_maxiters)
    if len(lm) == n_levels:
        return lm
    if auto_schedule and len(lm) > n_levels:
        return [lm[0]] + lm[len(lm) - (n_levels - 1):]
    raise ValueError("level_maxiters length must match the level count")


def _sliced_level(budget, dispatch_chunk, warm, run, carry, tol=0.0,
                  stop=None):
    """One pyramid level as warm-resumed <= chunk-iteration programs.

    ``run(maxiter, warm) -> res`` executes one program; ``carry(res)``
    builds the next program's warm state. Always calls ``run`` at least
    once (a 0 budget runs one maxiter=0 program — the warm-start state,
    matching the unsliced behavior).

    Each resumed program re-enters its convergence loop with a fresh
    q_prev/rmse_prev, so the in-program tol stop cannot fire across a
    chunk boundary. With ``tol > 0`` this detects convergence AT the
    boundaries instead: via the ``stop()`` callback when given (e.g. the
    BCPD pyramid's no-improvement monitor), else when a resumed chunk
    returns the same warm state it started from (the in-program loop
    froze immediately). ``tol == 0`` keeps the exact fixed-budget
    semantics (no early stop).
    """
    budget = int(budget)
    chunk = budget if not dispatch_chunk else int(dispatch_chunk)
    prev_state = None
    while True:
        res = run(max(min(chunk, budget), 0), warm)
        budget -= max(chunk, 1)
        if budget <= 0:
            return res
        if tol > 0.0 and stop is not None and stop():
            return res
        warm = carry(res)
        if tol > 0.0 and stop is None:
            state = np.concatenate([
                np.ravel(np.asarray(x, np.float64))
                for x in jax.tree_util.tree_leaves(warm)]) \
                if warm is not None else None
            if (state is not None and prev_state is not None
                    and state.shape == prev_state.shape
                    and np.allclose(state, prev_state,
                                    rtol=1.0e-7, atol=1.0e-12)):
                return res
            prev_state = state


def registration_cpd_pyramid(
    source,
    target,
    tf_type_name: str = "rigid",
    w: float = 0.0,
    maxiter: int = 50,
    tol: float = 0.001,
    callbacks: List[Callable] = [],
    levels: int = 3,
    voxel_sizes: Optional[Sequence[float]] = None,
    coarse_points: int = 3000,
    factor: float = 4.0,
    sigma2_inflation: float = 3.0,
    level_maxiters: Optional[Sequence[int]] = None,
    mesh=None,
    **kwargs: Any,
):
    """Coarse-to-fine CPD registration (rigid / affine / low-rank nonrigid).

    Registers voxel-downsampled levels coarsest-first, warm-starting each
    finer level with the previous level's transform and variance. The
    result is exactly a :func:`probreg_tpu.cpd.registration_cpd` result on
    the full-resolution clouds — only reached in a fraction of the wall
    time at large N (see module docstring).

    Args:
        source / target: Point clouds (ndarray or open3d PointCloud).
        tf_type_name: 'rigid', 'affine', or 'nonrigid' with ``rank=``
            (the coarse displacement field is kernel-interpolated to each
            finer level and projected onto its Nystrom basis as the
            initial field).
        w, maxiter, tol, callbacks: As in registration_cpd; applied at
            every level (callbacks fire at every level with the global
            transform — it applies to the original clouds unchanged).
        levels: Number of pyramid levels including full resolution.
        voxel_sizes: Explicit schedule (coarsest first; 0 = full res).
            Overrides ``levels``/``coarse_points``/``factor``.
        coarse_points: Auto-schedule target size of the coarsest level.
        factor: Auto-schedule geometric voxel ratio between levels.
        sigma2_inflation: Safety factor on the carried variance.
        mesh: Optional 1-D device mesh (jax.sharding.Mesh): every level
            runs through parallel.registration_cpd_sharded with the same
            warm starts — the pyramid schedule composes with multi-chip
            target sharding (rigid/affine only).
        level_maxiters: Per-level maxiter override (coarsest first).
            Default: full ``maxiter`` at the coarsest level, half at
            intermediate levels, and a ``maxiter // 5`` (>= 10) polish
            budget at full resolution — warm-started EM needs only a few
            polish iterations (measured at 200k: 10 polish iterations land
            within 4e-7 translation error of the 50-iteration run at 2.4x
            less wall time), and the CPD tol is an absolute threshold on q
            that rarely triggers at large N.
        **kwargs: Forwarded to registration_cpd at every level
            (update_scale, use_pallas, ...). ``dispatch_chunk`` (int)
            slices each level's EM into warm-resumed device programs of at
            most that many iterations (exact resume — CPD's result is its
            last EM iterate); bounds single-program device time.
            ``n_starts`` (rigid only) applies to the COARSEST level only —
            that is where the orientation search belongs; finer levels
            refine the carried pose (multistart is mutually exclusive with
            the warm start every finer level receives). With ``mesh=`` the
            coarsest level runs the single-device multistart (it is small
            by construction); finer levels shard as usual.

    Returns:
        MstepResult from the finest (full-resolution) level.
    """
    from . import cpd as _cpd

    nonrigid = tf_type_name == "nonrigid"
    if tf_type_name not in ("rigid", "affine", "nonrigid"):
        raise ValueError(
            "registration_cpd_pyramid supports 'rigid', 'affine' and "
            "low-rank 'nonrigid' (rank= required).")
    n_starts = int(kwargs.pop("n_starts", 1))
    if n_starts > 1 and tf_type_name != "rigid":
        raise ValueError("n_starts > 1 supports the rigid pyramid only")
    if n_starts > 1 and callbacks:
        raise ValueError("n_starts > 1 and callbacks are incompatible "
                         "(the multistart coarsest level runs the "
                         "no-callback vmapped path)")
    if nonrigid and kwargs.get("rank") is None:
        raise ValueError(
            "nonrigid pyramid requires rank= (low-rank Nystrom): the "
            "coarse displacement field is kernel-interpolated to each "
            "finer level and projected onto its Nystrom basis (v_init); "
            "the dense model has no cross-resolution warm start.")
    for managed in ("tf_init_params", "sigma2_init", "v_init"):
        if managed in kwargs:
            raise ValueError(f"{managed} is managed by the pyramid; pass it "
                             "to registration_cpd instead.")

    # Keep the caller's device arrays at full resolution (no host round trip).
    auto_schedule = voxel_sizes is None
    src_levels, tgt_levels, voxel_sizes = _prepare_levels(
        source, target, voxel_sizes, levels, coarse_points, factor)

    level_maxiters = _fit_level_maxiters(
        level_maxiters, len(voxel_sizes), maxiter, 5, auto_schedule)

    dispatch_chunk = kwargs.pop("dispatch_chunk", None)
    if mesh is not None and (nonrigid or callbacks):
        raise ValueError("mesh= pyramid supports rigid/affine without "
                         "callbacks (the sharded runner has no callback "
                         "or displacement warm-start path)")

    res = None
    tf_init = {}
    sigma2_init = None
    v_init = None
    for i, (s_i, t_i) in enumerate(zip(src_levels, tgt_levels)):
        # Multistart (orientation search) belongs to the coarsest level
        # only: finer levels carry a warm start, which is mutually
        # exclusive with n_starts (cpd.py), and re-multistarting would
        # discard the carry — the pyramid's whole point.
        multistart = n_starts > 1 and i == 0

        # ``dispatch_chunk``: slice this level's EM into warm-resumed
        # programs of <= chunk iterations. CPD's result IS its last EM
        # iterate, so resuming from (transform, sigma2) — or the positional
        # displacement field for nonrigid — continues the trajectory
        # exactly (cf. the BCPD pyramid's sliced dispatch). A multistart
        # coarsest level always runs as ONE program (a resumed chunk would
        # carry a warm start into the multistart).
        def _run(mi, warm, s_i=s_i, t_i=t_i, multistart=multistart):
            tf_c, v_c, s2_c = warm
            if nonrigid:
                return _cpd.registration_cpd(
                    s_i, t_i, "nonrigid", w=w, maxiter=mi, tol=tol,
                    callbacks=callbacks,
                    sigma2_init=s2_c, v_init=v_c, **kwargs)
            if multistart:
                # Single-device even under mesh=: the coarsest level is
                # small by construction and the sharded runner has no
                # multistart path.
                return _cpd.registration_cpd(
                    s_i, t_i, tf_type_name, w=w, maxiter=mi, tol=tol,
                    callbacks=callbacks, n_starts=n_starts, **kwargs)
            if mesh is not None:
                from .parallel import sharded as _sharded

                return _sharded.registration_cpd_sharded(
                    s_i, t_i, tf_type_name, w=w, maxiter=mi, tol=tol,
                    mesh=mesh, tf_init_params=tf_c or None,
                    sigma2_init=s2_c, **kwargs)
            return _cpd.registration_cpd(
                s_i, t_i, tf_type_name, w=w, maxiter=mi, tol=tol,
                callbacks=callbacks, tf_init_params=tf_c or None,
                sigma2_init=s2_c, **kwargs)

        def _carry(res, s_i=s_i):
            tr = res.transformation
            s2_c = max(float(np.asarray(res.sigma2)),
                       float(np.finfo(np.float32).eps))
            if nonrigid:
                return (None, np.asarray(tr.transform(s_i)) - s_i, s2_c)
            if tf_type_name == "rigid":
                tf_c = {"rot": np.asarray(tr.rot), "t": np.asarray(tr.t),
                        "scale": float(np.asarray(tr.scale))}
            else:
                tf_c = {"b": np.asarray(tr.b), "t": np.asarray(tr.t)}
            return (tf_c, None, s2_c)

        res = _sliced_level(level_maxiters[i],
                            None if multistart else dispatch_chunk,
                            (dict(tf_init), v_init, sigma2_init),
                            _run, _carry, tol=tol)
        if i + 1 < len(src_levels):
            tr = res.transformation
            if nonrigid:
                v_init = _interp_displacement(
                    s_i, np.asarray(tr.transform(s_i)) - s_i,
                    src_levels[i + 1], voxel_sizes[i])
            elif tf_type_name == "rigid":
                tf_init = {"rot": np.asarray(tr.rot),
                           "t": np.asarray(tr.t),
                           "scale": float(np.asarray(tr.scale))}
            else:
                tf_init = {"b": np.asarray(tr.b), "t": np.asarray(tr.t)}
            sigma2_init = _carry_sigma2(
                np.asarray(res.sigma2), voxel_sizes[i], sigma2_inflation)
    return res


def _interp_displacement(coarse_pts, coarse_disp, fine_pts, voxel):
    """Kernel-regress the coarse displacement field onto the fine points.

    Nadaraya-Watson with a Gaussian of bandwidth ~2 voxels: one culled
    Gauss-transform call evaluates both the weighted displacement sum and
    the normalizer (ones channel). Fine points with no coarse support
    (den ~ 0) get zero displacement.
    """
    import jax.numpy as jnp

    from .ops import gausstransform as gto

    dim = coarse_pts.shape[1]
    if voxel:
        h = 2.0 * float(voxel)
    else:
        # Scale-aware fallback (no voxel = the carry crosses equal-
        # resolution levels, e.g. iteration-splitting schedules with
        # repeated 0.0 entries): ~2x the typical coarse point spacing
        # (surfaces: spacing ~ diag/sqrt(n)), in the CLOUD's own units.
        # An absolute h=1.0 flattened the field for small-extent clouds
        # and underflowed it for large-coordinate ones.
        ext = np.asarray(coarse_pts.max(axis=0) - coarse_pts.min(axis=0),
                         np.float64)
        diag = float(np.linalg.norm(ext))
        h = max(2.0 * diag / np.sqrt(max(coarse_pts.shape[0], 2)), 1e-12)
    wts = jnp.concatenate(
        [jnp.asarray(coarse_disp, _config.config.dtype),
         jnp.ones((coarse_pts.shape[0], 1), _config.config.dtype)], axis=1)
    out = gto.gauss_transform(
        jnp.asarray(coarse_pts, _config.config.dtype),
        jnp.asarray(fine_pts, _config.config.dtype), wts, h)
    den = jnp.maximum(out[:, dim:], float(np.finfo(np.float32).tiny) * 1e10)
    return np.asarray(out[:, :dim] / den)


def registration_bcpd_pyramid(
    source,
    target,
    w: float = 0.0,
    maxiter: int = 50,
    tol: float = 0.001,
    levels: int = 3,
    voxel_sizes: Optional[Sequence[float]] = None,
    coarse_points: int = 3000,
    factor: float = 4.0,
    sigma2_inflation: float = 3.0,
    level_maxiters: Optional[Sequence[int]] = None,
    mesh=None,
    **kwargs: Any,
):
    """Coarse-to-fine BCPD registration (combined rigid+scale+nonrigid).

    Same schedule as :func:`registration_cpd_pyramid`: each finer level is
    warm-started with the coarse level's rigid parameters, its
    kernel-interpolated nonrigid displacement field (``v_init``) and its
    converged variance (``sigma2_init``), all carried in RAW coordinates
    (registration_bcpd converts to each level's normalized frame). Unlike
    the CPD nonrigid pyramid, NO ``rank=`` is required: the BCPD M-step
    re-solves the full field every iteration (reference bcpd.py:130-136),
    so ``v_init`` only seeds the first E-step position — dense and
    low-rank (``rank=``) models both warm-start exactly. ``rank=`` is
    still what makes large-N levels tractable (K x K Woodbury vs M x M
    solve).

    Args:
        source / target: Point clouds (ndarray or open3d PointCloud).
        w, maxiter, tol: As in registration_bcpd, applied per level.
        levels / voxel_sizes / coarse_points / factor: Pyramid schedule
            (see registration_cpd_pyramid).
        sigma2_inflation: Safety factor on the carried variance.
        level_maxiters: Per-level maxiter override (coarsest first).
            Default: full budget coarse, half at intermediate levels,
            ``maxiter // 3`` (>= 10) at full resolution — BCPD's
            fine-scale deformation needs a few more polish iterations
            than the rigid pyramid's default.
        mesh: Optional 2-axis (m, n) jax.sharding.Mesh — every level runs
            through parallel.registration_bcpd_2d (both clouds sharded,
            requires ``rank=``) with the same raw-frame carries; the
            1M-class path. Incompatible with ``dispatch_chunk``.
        **kwargs: Forwarded to registration_bcpd (lmd, k, gamma, rank,
            normalize, ...). Callbacks are not supported (warm starts
            ride the jitted no-callback path). ``dispatch_chunk`` (int)
            slices each level's VI iterations into warm-started device
            programs of at most that many iterations — bounds
            single-program device time (preemptible fleets, very large
            levels) for one extra host round trip per chunk. ``n_starts``
            applies to the COARSEST level only (orientation search; it is
            mutually exclusive with the warm starts finer levels carry);
            the multistart coarse level runs as one unsliced single-device
            program and exposes no converged variance, so the SECOND level
            re-estimates its start temperature (still cheap at pyramid
            sizes) and the variance carry resumes from there.

    Returns:
        tf.CombinedTransformation for the full-resolution source.
    """
    from . import bcpd as _bcpd

    for managed in ("tf_init_params", "sigma2_init", "v_init"):
        if managed in kwargs:
            raise ValueError(f"{managed} is managed by the pyramid; pass it "
                             "to registration_bcpd instead.")
    if kwargs.get("callbacks"):
        raise ValueError("registration_bcpd_pyramid does not support "
                         "callbacks (warm starts require the jitted path)")
    kwargs.pop("callbacks", None)

    auto_schedule = voxel_sizes is None
    src_levels, tgt_levels, voxel_sizes = _prepare_levels(
        source, target, voxel_sizes, levels, coarse_points, factor,
        keep_device_last=False)

    level_maxiters = _fit_level_maxiters(
        level_maxiters, len(voxel_sizes), maxiter, 3, auto_schedule)

    normalize = bool(kwargs.pop("normalize", True))
    dispatch_chunk = kwargs.pop("dispatch_chunk", None)
    n_starts = int(kwargs.pop("n_starts", 1))
    # Hardware-safety guard: above the single-chip-validated size an
    # unmeshed whole-VI program has faulted v5e workers (see
    # config.bcpd_guard_max_pairs). Auto-slice such levels into short
    # warm-resumed programs instead of letting one multi-minute dispatch
    # reach the device.
    guard = int(getattr(_config.config, "bcpd_guard_max_pairs", 0) or 0)
    if (guard and mesh is None
            and any(s.shape[0] * t.shape[0] > guard
                    for s, t in zip(src_levels, tgt_levels))):
        import jax as _jax

        if _jax.default_backend() == "tpu":
            if dispatch_chunk is None:
                dispatch_chunk = int(_config.config.bcpd_guard_chunk)
                from . import log as _log

                _log.log.warning(
                    "registration_bcpd_pyramid: level size exceeds the "
                    "single-chip-validated BCPD size; auto-applying "
                    "dispatch_chunk=%d (config.bcpd_guard_max_pairs). "
                    "Prefer mesh= for large clouds.", dispatch_chunk)
            elif int(dispatch_chunk) > int(_config.config.bcpd_guard_chunk):
                # Fail BEFORE any level runs — the per-dispatch guard in
                # _registration_jit would otherwise reject the same chunk
                # mid-run, discarding the completed coarse levels.
                raise ValueError(
                    f"dispatch_chunk={int(dispatch_chunk)} exceeds "
                    f"config.bcpd_guard_chunk="
                    f"{int(_config.config.bcpd_guard_chunk)} and a level "
                    "exceeds config.bcpd_guard_max_pairs (device programs "
                    "this long at this size have faulted TPU workers); "
                    "lower dispatch_chunk, pass mesh=, or raise the "
                    "config limits to override.")
    if mesh is not None:
        if dispatch_chunk:
            raise ValueError("dispatch_chunk is not supported with mesh= "
                             "(the 2-D runner does not expose its final "
                             "VI iterate)")
        if kwargs.get("rank") is None:
            raise ValueError("mesh= BCPD pyramid requires rank= "
                             "(registration_bcpd_2d is low-rank only)")
        return _bcpd_pyramid_2d(src_levels, tgt_levels, voxel_sizes,
                                level_maxiters, mesh, w, tol, normalize,
                                sigma2_inflation, n_starts, kwargs)
    res = None
    tf_init = None
    v_init = None
    sigma2_init = None
    for i, (s_i, t_i) in enumerate(zip(src_levels, tgt_levels)):
        # Orientation search (n_starts) at the coarsest level only; finer
        # levels refine the carried pose — n_starts is mutually exclusive
        # with the warm starts they receive (bcpd.py). The multistart
        # level always runs as ONE program (no sliced resume: the
        # multistart path exposes no final VI iterate).
        multistart = n_starts > 1 and i == 0

        # ``dispatch_chunk``: slice this level's VI iterations into several
        # warm-started device programs (_sliced_level). The resume uses
        # the raw FINAL VI iterate (return_last) — the best-visited result
        # state would stall during the start-temperature phase, where it
        # is still ~the initial state. The level RESULT is the best state
        # across ALL chunks (tracked by the NN-RMSE each program already
        # scores): the unchunked program keeps its global best across all
        # iterations, and the post-convergence VI trajectory is chaotic in
        # f32, so the LAST chunk's in-program best can be far worse than
        # an earlier chunk's.
        out = {}

        def _run(mi, warm, s_i=s_i, t_i=t_i, out=out,
                 multistart=multistart):
            if multistart:
                warm = {}
            res, sigma2_raw, last, rinfo = _bcpd._registration_bcpd_impl(
                s_i, t_i, w=w, maxiter=mi, tol=tol,
                callbacks=[], normalize=normalize,
                callback_chunk=1, return_last=True,
                n_starts=n_starts if multistart else 1, **warm, **kwargs)
            out["sigma2_raw"], out["last"] = sigma2_raw, last
            rinfo = rinfo or {}
            rmse = rinfo.get("best")
            if rmse is not None and (out.get("best_rmse") is None
                                     or rmse < out["best_rmse"]):
                out["best_rmse"] = rmse
                out["best"] = (res, sigma2_raw)
            out["prev_last_rmse"] = out.get("last_rmse")
            out["last_rmse"] = rinfo.get("last")
            return res

        def _carry(res, out=out):
            if out["last"] is None:
                # Path without last-state tracking (multistart is already
                # rejected above) — restart from the result state.
                rt = res.rigid_trans
                return {"tf_init_params": {
                            "rot": np.asarray(rt.rot),
                            "t": np.asarray(rt.t),
                            "scale": float(np.asarray(rt.scale))},
                        "v_init": np.asarray(res.v),
                        "sigma2_init": out["sigma2_raw"]}
            return out["last"]

        def _stop(out=out, tol=tol):
            # tol > 0 boundary stop: the SAME |rmse - rmse_prev| < tol
            # trajectory criterion the in-program loop uses, applied to
            # consecutive chunks' final iterates — a resumed program
            # resets its own rmse_prev, so without this a converged level
            # keeps dispatching forced >=2-iteration chunks that only walk
            # the chaotic post-convergence trajectory.
            a, b = out.get("last_rmse"), out.get("prev_last_rmse")
            return a is not None and b is not None and abs(a - b) < tol

        res = _sliced_level(
            level_maxiters[i], None if multistart else dispatch_chunk,
            {"tf_init_params": tf_init, "v_init": v_init,
             "sigma2_init": sigma2_init},
            _run, _carry, tol=tol, stop=_stop)
        if out.get("best") is not None:
            res, sigma2_raw = out["best"]
        else:
            sigma2_raw = out["sigma2_raw"]
        if i + 1 < len(src_levels):
            rt = res.rigid_trans
            tf_init = {"rot": np.asarray(rt.rot),
                       "t": np.asarray(rt.t),
                       "scale": float(np.asarray(rt.scale))}
            v_init = _interp_displacement(
                s_i, np.asarray(res.v), src_levels[i + 1], voxel_sizes[i])
            if sigma2_raw is not None:
                sigma2_init = _carry_sigma2(
                    sigma2_raw, voxel_sizes[i], sigma2_inflation)
    return res


def _bcpd_pyramid_2d(src_levels, tgt_levels, voxel_sizes, level_maxiters,
                     mesh, w, tol, normalize, sigma2_inflation, n_starts,
                     kwargs):
    """BCPD pyramid levels on the 2-D (m, n) mesh: every level runs through
    parallel.registration_bcpd_2d with the same raw-frame carries as the
    single-device schedule — the 1M-class path (single-chip dense levels
    fault/oom; the 2-D mesh drops per-device memory Pm-fold). A coarsest-
    level multistart (n_starts > 1) runs single-device — the coarse level
    is small by construction and the 2-D runner has no multistart path."""
    from . import bcpd as _bcpd
    from .parallel import sharded2d as _s2d

    res = None
    tf_init = None
    v_init = None
    sigma2_init = None
    for i, (s_i, t_i) in enumerate(zip(src_levels, tgt_levels)):
        if n_starts > 1 and i == 0:
            res, sigma2_raw = _bcpd._registration_bcpd_impl(
                s_i, t_i, w=w, maxiter=int(level_maxiters[i]), tol=tol,
                callbacks=[], normalize=normalize, callback_chunk=1,
                n_starts=n_starts, **kwargs)
        else:
            res, sigma2_raw = _s2d.registration_bcpd_2d(
                s_i, t_i, w=w, maxiter=int(level_maxiters[i]), tol=tol,
                normalize=normalize, mesh=mesh, tf_init_params=tf_init,
                v_init=v_init, sigma2_init=sigma2_init, return_sigma2=True,
                **kwargs)
        if i + 1 < len(src_levels):
            rt = res.rigid_trans
            tf_init = {"rot": np.asarray(rt.rot), "t": np.asarray(rt.t),
                       "scale": float(np.asarray(rt.scale))}
            v_init = _interp_displacement(
                s_i, np.asarray(res.v), src_levels[i + 1], voxel_sizes[i])
            if sigma2_raw is not None:
                sigma2_init = _carry_sigma2(
                    sigma2_raw, voxel_sizes[i], sigma2_inflation)
    return res


def registration_filterreg_pyramid(
    source,
    target,
    target_normals=None,
    w: float = 0.0,
    objective_type: str = "pt2pt",
    maxiter: int = 50,
    tol: float = 0.001,
    min_sigma2: float = 1.0e-4,
    callbacks: List[Callable] = [],
    levels: int = 3,
    voxel_sizes: Optional[Sequence[float]] = None,
    coarse_points: int = 3000,
    factor: float = 4.0,
    sigma2_inflation: float = 3.0,
    sigma2_decay: float = 0.9,
    update_sigma2: bool = False,
    level_maxiters: Optional[Sequence[int]] = None,
    mesh=None,
    **kwargs: Any,
):
    """Coarse-to-fine FilterReg registration (pt2pt).

    Same schedule as :func:`registration_cpd_pyramid`, including the
    default ``level_maxiters`` (full budget coarse, ``maxiter // 3``
    polish at full resolution — FilterReg's annealed residual q rarely
    triggers the tol stop; pass ``level_maxiters`` explicitly for the old
    full-budget-everywhere behavior). ``mesh=`` routes every level
    through parallel.registration_filterreg_sharded (1-axis: target
    sharded; 2-axis: both clouds sharded) with the same carries —
    incompatible with callbacks and ``dispatch_chunk``. pt2pl needs
    per-level target normals, so only the full-resolution level uses
    ``target_normals``; coarser levels run pt2pt to produce the warm start.

    ``sigma2_decay`` defaults to 0.9 here (the flat entry point defaults to
    1.0): FilterReg with a FIXED sigma2 never anneals, so its final sigma2
    is just the initial estimate and carrying it down would hand finer
    levels a cloud-scale variance. With annealing (or ``update_sigma2``)
    the converged variance is meaningful and the carry works like CPD's;
    without either, each level estimates its own sigma2 and only the
    transform warm-starts.

    ``n_starts`` applies to the COARSEST level only (the orientation
    search; finer levels refine the carried pose — re-multistarting them
    would discard the warm carry). With ``mesh=`` the coarsest level runs
    the single-device multistart (small by construction); finer levels
    shard as usual.
    """
    from . import filterreg as _frg

    if "tf_init_params" in kwargs or "sigma2" in kwargs:
        raise ValueError("tf_init_params/sigma2 are managed by the pyramid; "
                         "pass them to registration_filterreg instead.")
    n_starts = int(kwargs.pop("n_starts", 1))
    if n_starts > 1 and callbacks:
        raise ValueError("n_starts > 1 and callbacks are incompatible "
                         "(the multistart coarsest level runs the "
                         "no-callback rigid dense path)")

    auto_schedule = voxel_sizes is None
    src_levels, tgt_levels, voxel_sizes = _prepare_levels(
        source, target, voxel_sizes, levels, coarse_points, factor)
    # FilterReg's q is a shrinking annealed residual, so the |q - q_prev|
    # tol rarely stops the full-resolution level early — the default caps
    # it at a warm-started polish budget like the other pyramid entries.
    level_maxiters = _fit_level_maxiters(
        level_maxiters, len(voxel_sizes), maxiter, 3, auto_schedule)

    dispatch_chunk = kwargs.pop("dispatch_chunk", None)
    if mesh is not None and (callbacks or dispatch_chunk):
        raise ValueError("mesh= FilterReg pyramid supports neither "
                         "callbacks nor dispatch_chunk")
    if mesh is not None and kwargs:
        # The sharded runner implements the dense pt2pt/pt2pl EM only; a
        # TypeError from deep inside the first sharded level would be
        # cryptic (same call works single-device).
        raise ValueError(
            f"mesh= FilterReg pyramid does not support {sorted(kwargs)}; "
            "supported there: sigma2/w/maxiter/tol/min_sigma2/"
            "sigma2_decay/update_sigma2/objective_type/target_normals/"
            "n_starts.")
    res = None
    tf_init = None
    sigma2 = None
    sigma2_meaningful = update_sigma2 or sigma2_decay < 1.0
    for i, (s_i, t_i) in enumerate(zip(src_levels, tgt_levels)):
        last = i + 1 == len(src_levels)
        # Orientation search at the coarsest level only; finer levels
        # refine the carried pose (re-multistarting every level would
        # silently discard the warm carry — the pyramid's whole point).
        multistart = n_starts > 1 and i == 0
        if mesh is not None and not multistart:
            from .parallel import sharded as _sharded

            res = _sharded.registration_filterreg_sharded(
                s_i, t_i,
                target_normals=target_normals if last else None,
                objective_type=objective_type if last else "pt2pt",
                sigma2=sigma2, w=w, maxiter=int(level_maxiters[i]),
                tol=tol, min_sigma2=min_sigma2, sigma2_decay=sigma2_decay,
                update_sigma2=update_sigma2, mesh=mesh,
                tf_init_params=tf_init, **kwargs)
            if not last:
                tr = res.transformation
                tf_init = {"rot": np.asarray(tr.rot),
                           "t": np.asarray(tr.t)}
                if sigma2_meaningful:
                    sigma2 = _carry_sigma2(np.asarray(res.sigma2),
                                           voxel_sizes[i], sigma2_inflation)
            continue
        # dispatch_chunk: warm-resumed <= chunk-iteration programs (exact —
        # FilterReg's result is its last EM iterate; the resumed sigma2
        # continues the annealing schedule). A multistart coarsest level
        # always runs as ONE single-device program (a resumed chunk would
        # carry a warm start into the multistart; the sharded runner has
        # no multistart path).
        def _run(mi, warm, s_i=s_i, t_i=t_i, last=last,
                 multistart=multistart):
            tf_c, s2_c = warm
            if multistart:
                tf_c, s2_c = None, None
            return _frg.registration_filterreg(
                s_i, t_i,
                target_normals=target_normals if last else None,
                sigma2=s2_c, w=w,
                objective_type=objective_type if last else "pt2pt",
                maxiter=mi, tol=tol, min_sigma2=min_sigma2,
                sigma2_decay=sigma2_decay, update_sigma2=update_sigma2,
                callbacks=callbacks, tf_init_params=tf_c or {},
                n_starts=n_starts if multistart else 1, **kwargs)

        def _carry(res):
            tr = res.transformation
            return ({"rot": np.asarray(tr.rot), "t": np.asarray(tr.t)},
                    float(np.asarray(res.sigma2)))

        res = _sliced_level(level_maxiters[i],
                            None if multistart else dispatch_chunk,
                            (tf_init, sigma2), _run, _carry, tol=tol)
        if not last:
            tr = res.transformation
            tf_init = {"rot": np.asarray(tr.rot), "t": np.asarray(tr.t)}
            if sigma2_meaningful:
                sigma2 = _carry_sigma2(
                    np.asarray(res.sigma2), voxel_sizes[i],
                    sigma2_inflation)
    return res


def registration_gmmtree_pyramid(
    source,
    target,
    maxiter: int = 20,
    tol: float = 1.0e-4,
    callbacks: List[Callable] = [],
    levels: int = 3,
    voxel_sizes: Optional[Sequence[float]] = None,
    coarse_points: int = 3000,
    factor: float = 4.0,
    level_maxiters: Optional[Sequence[int]] = None,
    **kwargs: Any,
):
    """Coarse-to-fine GMMTree registration.

    Per level: a GMM tree is built from the downsampled source and the
    downsampled target registers against it, warm-started with the coarse
    transform. GMMTree's EM moves the TARGET toward the source model and
    returns the inverse (reference gmmtree.py:86-96), so the carried
    initializer is the INVERSE of the previous level's returned transform.
    No variance carry — node covariances come from the per-level tree
    build. ``tree_level`` may stay constant across levels: at coarse
    resolutions deeper leaves simply soak up fewer points.

    Args: As in :func:`probreg_tpu.gmmtree.registration_gmmtree`; pyramid
        schedule args as in :func:`registration_cpd_pyramid`. ``n_starts``
        (if given) applies to the COARSEST level only — that is where the
        orientation search belongs; finer levels refine the carried pose.
    """
    from . import gmmtree as _gt

    if "tf_init_params" in kwargs:
        raise ValueError("tf_init_params is managed by the pyramid; pass it "
                         "to registration_gmmtree instead.")
    n_starts = int(kwargs.pop("n_starts", 1))

    auto_schedule = voxel_sizes is None
    src_levels, tgt_levels, voxel_sizes = _prepare_levels(
        source, target, voxel_sizes, levels, coarse_points, factor)
    level_maxiters = _fit_level_maxiters(
        level_maxiters, len(voxel_sizes), maxiter, 2, auto_schedule)

    dispatch_chunk = kwargs.pop("dispatch_chunk", None)
    if dispatch_chunk and n_starts > 1:
        raise ValueError("dispatch_chunk is incompatible with n_starts > 1")
    res = None
    tf_init: dict = {}
    for i, (s_i, t_i) in enumerate(zip(src_levels, tgt_levels)):
        # n_starts > 1 is rejected with dispatch_chunk above, so the
        # multistart (coarsest level) case is always a single program.
        def _run(mi, warm, s_i=s_i, t_i=t_i, i=i):
            return _gt.registration_gmmtree(
                s_i, t_i, maxiter=mi, tol=tol,
                callbacks=callbacks, tf_init_params=dict(warm) or {},
                n_starts=n_starts if i == 0 else 1, **kwargs)

        def _carry(res):
            inv = res.transformation.inverse()
            return {"rot": np.asarray(inv.rot), "t": np.asarray(inv.t)}

        res = _sliced_level(level_maxiters[i], dispatch_chunk,
                            dict(tf_init), _run, _carry, tol=tol)
        if i + 1 < len(src_levels):
            inv = res.transformation.inverse()
            tf_init = {"rot": np.asarray(inv.rot), "t": np.asarray(inv.t)}
    return res


def registration_icp_pyramid(
    source,
    target,
    maxiter: int = 50,
    tol: float = 1.0e-6,
    trim_fraction: float = 0.0,
    levels: int = 3,
    voxel_sizes: Optional[Sequence[float]] = None,
    coarse_points: int = 3000,
    factor: float = 4.0,
    level_maxiters: Optional[Sequence[int]] = None,
    **kwargs: Any,
):
    """Coarse-to-fine point-to-point ICP.

    The classic multiresolution ICP: each finer level starts at the coarse
    level's pose, so the exact nearest-neighbor iterations at full
    resolution only polish. Args as in
    :func:`probreg_tpu.icp.registration_icp`; pyramid schedule args as in
    :func:`registration_cpd_pyramid`.
    """
    from . import icp as _icp

    if "tf_init_params" in kwargs:
        raise ValueError("tf_init_params is managed by the pyramid; pass it "
                         "to registration_icp instead.")

    auto_schedule = voxel_sizes is None
    src_levels, tgt_levels, voxel_sizes = _prepare_levels(
        source, target, voxel_sizes, levels, coarse_points, factor)
    level_maxiters = _fit_level_maxiters(
        level_maxiters, len(voxel_sizes), maxiter, 2, auto_schedule)

    dispatch_chunk = kwargs.pop("dispatch_chunk", None)
    res = None
    tf_init: dict = {}
    for i, (s_i, t_i) in enumerate(zip(src_levels, tgt_levels)):
        def _run(mi, warm, s_i=s_i, t_i=t_i):
            return _icp.registration_icp(
                s_i, t_i, maxiter=mi, tol=tol,
                trim_fraction=trim_fraction, tf_init_params=dict(warm),
                **kwargs)

        def _carry(res):
            tr = res.transformation
            return {"rot": np.asarray(tr.rot), "t": np.asarray(tr.t)}

        res = _sliced_level(level_maxiters[i], dispatch_chunk,
                            dict(tf_init), _run, _carry, tol=tol)
        if i + 1 < len(src_levels):
            tr = res.transformation
            tf_init = {"rot": np.asarray(tr.rot), "t": np.asarray(tr.t)}
    return res
