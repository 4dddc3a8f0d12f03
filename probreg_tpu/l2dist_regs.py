"""L2-distance registrations: GMMReg and SVR (parity with l2dist_regs.py).

Both clouds are summarized as Gaussian mixtures by a Feature generator
(JAX-native GMM / one-class SVM, :mod:`probreg_tpu.features`); the L2
distance between the mixtures is minimized with BFGS over the transform
parameters. The cost+gradient evaluations are fused XLA programs
(:mod:`probreg_tpu.cost_functions`); scipy's BFGS drives them from the host
(an outer annealing loop scales sigma by delta each round,
reference l2dist_regs.py:63-64,91-92).
"""

from __future__ import annotations

import logging
from typing import Any, Callable, List

import numpy as np
from scipy.optimize import minimize

from . import cost_functions as cf
from . import features as ft
from . import transformation as tf
from .log import log
from .utils import interop


_JAX_OPT_CACHE = {}
_JAX_FUSED_CACHE = {}

# Strided-subsample cap for the raw-point candidate re-scoring below: at
# <=1024 points per side one candidate score is a ~1M-pair kernel pass on
# the MXU, negligible next to the vmapped BFGS that produced the candidates.
_RESCORE_MAX_POINTS = 1024


def _bfgs_solve(obj, x0, args, opt_maxiter, opt_tol):
    """One in-program BFGS solve, with f32 conditioning for the rigid cost.

    The reference drives this objective with scipy's host BFGS in float64,
    where raw scaling is harmless. Inside an f32 XLA program the raw rigid
    objective is O(1e2) with O(1e4) translation gradients (the 1/z Gaussian
    normalizer at small sigma), so BFGS's first unit-Hessian step overshoots
    by four orders of magnitude and the line search exhausts its zoom cap
    (observed: status=3 after nit=1, a silent stall at the start point).
    Conditioning: optimize the translation in units of sigma and rescale
    the objective so a perfect-overlap value is O(1) — multiply by
    z / ((sum phi_s)(sum phi_t)), which cancels the 1/z and normalizes the
    mixture masses (OCSVM weights are unnormalized dual coefficients, so a
    plain z rescale would leave the gradient under gtol and stall at x0).
    The returned (x, fun) are in the reference's original scaling.
    """
    import jax.numpy as jnp
    from jax.scipy.optimize import minimize as jax_minimize

    if obj is not cf.RigidCostFunction.pure_objective:
        r = jax_minimize(obj, x0, args=args, method="BFGS",
                         options={"maxiter": opt_maxiter, "gtol": opt_tol})
        return r.x, r.fun
    mu_s, phi_s, _, phi_t, sigma = args[:5]
    d = mu_s.shape[1]
    z = (2.0 * jnp.pi * sigma * sigma) ** (d * 0.5)
    c = z / jnp.maximum(jnp.abs(phi_s.sum() * phi_t.sum()), 1e-30)
    scale = jnp.concatenate([
        jnp.ones((4,), x0.dtype),
        jnp.full((x0.shape[0] - 4,), sigma, x0.dtype)])

    def sobj(y):
        return c * obj(y * scale, *args)

    r = jax_minimize(sobj, x0 / scale, method="BFGS",
                     options={"maxiter": opt_maxiter, "gtol": opt_tol})
    return r.x * scale, r.fun / c


def _rescore_and_polish(xs, src, tgt, sigma, opt_maxiter, opt_tol,
                        smask=None, tmask=None):
    """Select among multistart BFGS results by RAW-point mixture L2.

    The per-start objective values come from the fitted features (GMM /
    OCSVM); a poor feature fit can genuinely score a flipped pose below the
    true one, so argmin over them occasionally keeps a wrong basin. The raw
    clouds are the ground truth the features summarize: re-score every
    candidate with a uniform-weight mixture over (strided) raw points, then
    polish the winner with a short BFGS on that same raw objective — the
    full-point model the reference's component cap only approximates.
    Traced inside the fused/batched programs (no extra dispatch).
    """
    import jax
    import jax.numpy as jnp

    ss = max(1, -(-src.shape[0] // _RESCORE_MAX_POINTS))
    st = max(1, -(-tgt.shape[0] // _RESCORE_MAX_POINTS))
    s, t = src[::ss], tgt[::st]
    if smask is None:
        phi_s = jnp.full((s.shape[0],), 1.0 / s.shape[0], s.dtype)
        phi_t = jnp.full((t.shape[0],), 1.0 / t.shape[0], t.dtype)
    else:
        sm, tm = smask[::ss], tmask[::st]
        phi_s = sm / jnp.maximum(jnp.sum(sm), 1.0)
        phi_t = tm / jnp.maximum(jnp.sum(tm), 1.0)
    robj = cf.RigidCostFunction.pure_objective
    args = (s, phi_s, t, phi_t, sigma)
    scores = jax.vmap(lambda x: robj(x, *args))(xs)
    # A single NaN-diverged start must not hijack the argmin (NaN
    # propagates through jnp.argmin) — same guard as gmmtree's selection.
    scores = jnp.where(jnp.isnan(scores), jnp.inf, scores)
    return _bfgs_solve(robj, xs[jnp.argmin(scores)], args,
                       opt_maxiter, opt_tol)


class L2DistRegistration:
    """L2 distance registration (reference l2dist_regs.py:16-97).

    Args:
        source: Source point cloud data.
        feature_gen: Mixture generator (features.Feature).
        cost_fn: Cost function (cost_functions.CostFunction).
        sigma: Scaling parameter for the L2 distance.
        delta: Annealing factor applied to sigma per outer round.
        use_estimated_sigma: Estimate sigma from the source covariance.
    """

    def __init__(self, source, feature_gen: ft.Feature,
                 cost_fn: cf.CostFunction, sigma: float = 1.0,
                 delta: float = 0.9, use_estimated_sigma: bool = True,
                 optimizer: str = "jax", n_starts: int = 1):
        self._source = source
        self._feature_gen = feature_gen
        self._cost_fn = cost_fn
        self._sigma = sigma
        self._delta = delta
        self._use_estimated_sigma = use_estimated_sigma
        # n_starts > 1: vmapped BFGS restarts from a coarse orientation grid
        # (RigidCostFunction.initial_multistart), best final cost wins.
        # Recovers large rotations the identity start cannot (fused-optimizer
        # path only). Still one dispatch, but device time scales with the
        # slowest start's BFGS — use when the rotation may exceed ~90 deg.
        self._n_starts = int(n_starts)
        if self._n_starts > 1 and not hasattr(cost_fn, "initial_multistart"):
            raise ValueError(
                "n_starts > 1 requires a cost function with "
                "initial_multistart (rigid)")
        # 'jax': whole-BFGS-in-one-XLA-program (jax.scipy.optimize) — one
        # device dispatch per annealing round instead of one per BFGS
        # iteration (which costs a full RTT on remote TPU). 'scipy': host
        # BFGS like the reference (needed when callbacks want per-iteration
        # transforms).
        self._optimizer = optimizer
        self._callbacks: List[Callable] = []
        if self._source is not None and self._use_estimated_sigma:
            self._estimate_sigma(self._source)

    def set_source(self, source):
        self._source = source
        if self._use_estimated_sigma:
            self._estimate_sigma(self._source)

    def set_callbacks(self, callbacks):
        self._callbacks.extend(callbacks)

    def _estimate_sigma(self, data):
        """sigma = det(cov)^(1/2d) (reference l2dist_regs.py:58-61)."""
        data = np.asarray(data)
        ndata, dim = data.shape
        data_hat = data - np.mean(data, axis=0)
        self._sigma = np.power(
            np.linalg.det(data_hat.T @ data_hat / (ndata - 1)),
            1.0 / (2.0 * dim))

    def _annealing(self):
        self._sigma *= self._delta

    def optimization_cb(self, x):
        tf_result = self._cost_fn.to_transformation(x)
        for c in self._callbacks:
            c(tf_result)

    def _jax_optimizer(self, opt_maxiter: int, opt_tol: float):
        """Jitted whole-BFGS program, cached per cost-function CLASS.

        jax.scipy.optimize.minimize retraces on every bare call (~1 s of
        tracing per round); a jitted wrapper keyed on the class-level pure
        objective makes repeat registrations (even with fresh instances)
        compile-free and turns the inner optimization into ONE dispatch.
        """
        key = (type(self._cost_fn), opt_maxiter, opt_tol)
        opt = _JAX_OPT_CACHE.get(key)
        if opt is None:
            import jax

            obj = type(self._cost_fn).pure_objective

            @jax.jit
            def opt(x0, mu_s, phi_s, mu_t, phi_t, sigma, *extra):
                return _bfgs_solve(
                    obj, x0, (mu_s, phi_s, mu_t, phi_t, sigma) + extra,
                    opt_maxiter, opt_tol)

            _JAX_OPT_CACHE[key] = opt
        return opt

    def _fused_round(self, opt_maxiter: int, opt_tol: float,
                     n_source: int, n_target: int):
        """Whole-round jitted program: fit(source)+fit(target)+BFGS.

        On a remote TPU each dispatch costs a full RTT; the eager path pays
        three per annealing round (two feature fits + the optimizer). Fusing
        the feature fits into the optimizer program makes a round ONE
        dispatch. Cached per (cost class, feature class, feature statics) so
        repeat registrations are compile-free.
        """
        feat = self._feature_gen
        static_s = feat.fused_static(n_source)
        static_t = feat.fused_static(n_target)
        key = (type(self._cost_fn), type(feat), static_s, static_t,
               opt_maxiter, opt_tol)
        run = _JAX_FUSED_CACHE.get(key)
        if run is None:
            import jax
            import jax.numpy as jnp

            obj = type(self._cost_fn).pure_objective
            fit = type(feat).fused_fit
            prep = getattr(type(self._cost_fn), "pure_prepare", None)

            @jax.jit
            def run(x0s, src, tgt, sigma, dynamic, extra):
                mu_s, phi_s = fit(src, static_s, dynamic)
                mu_t, phi_t = fit(tgt, static_t, dynamic)
                # Theta-independent cost machinery hoisted once per solve
                # (TPS: basis/kernel — recomputed per BFGS evaluation
                # otherwise).
                solved_extra = tuple(extra) if prep is None \
                    else prep(mu_s, *extra)

                def solve(x0):
                    return _bfgs_solve(
                        obj, x0,
                        (mu_s, phi_s, mu_t, phi_t, sigma) + solved_extra,
                        opt_maxiter, opt_tol)

                xs, fs = jax.vmap(solve)(x0s)
                if (x0s.shape[0] > 1
                        and obj is cf.RigidCostFunction.pure_objective):
                    return _rescore_and_polish(
                        xs, src, tgt, sigma, opt_maxiter, opt_tol)
                i = jnp.argmin(fs)
                return xs[i], fs[i]

            _JAX_FUSED_CACHE[key] = run
        return run

    def _start_stack(self, x_ini: np.ndarray) -> np.ndarray:
        """(S, P) starts: the warm start first, then the orientation grid."""
        if self._n_starts <= 1:
            return np.asarray(x_ini)[None]
        grid = self._cost_fn.initial_multistart(self._n_starts)
        return np.r_[np.asarray(x_ini)[None], grid[1:]]

    def registration(self, target, maxiter: int = 1, tol: float = 1.0e-3,
                     opt_maxiter: int = 50, opt_tol: float = 1.0e-3
                     ) -> tf.Transformation:
        f = None
        x_ini = self._cost_fn.initial()
        # Rigid solves run in the shared-centroid frame: the quaternion
        # objective rotates about the ORIGIN, so at UTM/mm-scale
        # coordinates (|x| ~ 1e4) every grid/BFGS rotation step throws
        # the mixture ~1e4*theta away and the solve diverges (measured
        # 3.1 rad error at a 1e4 offset; the f64 reference is equally
        # origin-anchored but its users' data is origin-ish). Centering
        # is exact (f64 host) and the translation converts back below.
        # TPS keeps the raw frame (its basis is not translation
        # invariant); pre-center the clouds for TPS at large offsets.
        rigid_center = isinstance(self._cost_fn, cf.RigidCostFunction)
        saved_source = self._source
        if rigid_center:
            src64 = np.asarray(self._source, np.float64)
            tgt64 = np.asarray(target, np.float64)
            cen = (src64.mean(axis=0) * len(tgt64)
                   + tgt64.mean(axis=0) * len(src64)) \
                / (len(src64) + len(tgt64))
            self._source = (src64 - cen).astype(np.float32)
            target = (tgt64 - cen).astype(np.float32)
        try:
            out = self._registration_impl(target, maxiter, tol,
                                          opt_maxiter, opt_tol, x_ini, f)
        finally:
            self._source = saved_source
        if rigid_center:
            rot = np.asarray(out.rot, np.float64)
            t_raw = np.asarray(out.t, np.float64) + cen - rot @ cen
            out = tf.RigidTransformation(rot, t_raw,
                                         float(np.asarray(out.scale)))
        return out

    def _registration_impl(self, target, maxiter, tol, opt_maxiter,
                           opt_tol, x_ini, f):
        use_jax_opt = (self._optimizer == "jax" and not self._callbacks
                       and hasattr(self._cost_fn, "pure_objective"))
        use_fused = use_jax_opt and hasattr(self._feature_gen, "fused_fit")
        if use_fused:
            import jax.numpy as jnp

            src_dev = jnp.asarray(self._source, jnp.float32)
            tgt_dev = jnp.asarray(target, jnp.float32)
        for _ in range(maxiter):
            self._feature_gen.init()
            if use_fused:
                run = self._fused_round(opt_maxiter, opt_tol,
                                        int(src_dev.shape[0]),
                                        int(tgt_dev.shape[0]))
                rx, rf = run(
                    jnp.asarray(self._start_stack(x_ini), jnp.float32),
                    src_dev, tgt_dev,
                    jnp.asarray(self._sigma, jnp.float32),
                    self._feature_gen.fused_dynamic(),
                    tuple(self._cost_fn.extra_args()))
                # One host fetch for both results (each sync is a full RTT
                # through the remote-TPU tunnel).
                import jax

                rx, rf = jax.device_get((rx, rf))
                res_fun, res_x = float(rf), np.asarray(rx, np.float64)
                self._annealing()
                self._feature_gen.annealing()
                if f is not None and abs(res_fun - f) < tol:
                    break
                f = res_fun
                x_ini = res_x
                continue
            mu_source, phi_source = self._feature_gen.compute(self._source)
            mu_target, phi_target = self._feature_gen.compute(target)
            if use_jax_opt:
                import jax.numpy as jnp

                opt = self._jax_optimizer(opt_maxiter, opt_tol)
                rx, rf = opt(
                    jnp.asarray(x_ini, jnp.float32), jnp.asarray(mu_source),
                    jnp.asarray(phi_source), jnp.asarray(mu_target),
                    jnp.asarray(phi_target),
                    jnp.asarray(self._sigma, jnp.float32),
                    *self._cost_fn.extra_args())
                import jax

                rx, rf = jax.device_get((rx, rf))
                res_fun, res_x = float(rf), np.asarray(rx, np.float64)
            else:
                args = (mu_source, phi_source, mu_target, phi_target,
                        self._sigma)
                res = minimize(
                    self._cost_fn, x_ini, args=args, method="BFGS", jac=True,
                    tol=opt_tol,
                    options={"maxiter": opt_maxiter,
                             "disp": log.level == logging.DEBUG},
                    callback=self.optimization_cb)
                res_fun, res_x = res.fun, res.x
            self._annealing()
            self._feature_gen.annealing()
            if f is not None and abs(res_fun - f) < tol:
                break
            f = res_fun
            x_ini = res_x
        return self._cost_fn.to_transformation(res_x)


class RigidGMMReg(L2DistRegistration):
    def __init__(self, source, sigma=1.0, delta=0.9, n_gmm_components=800,
                 use_estimated_sigma=True, **kwargs):
        n_gmm_components = min(n_gmm_components, int(source.shape[0] * 0.8))
        super().__init__(source, ft.GMM(n_gmm_components),
                         cf.RigidCostFunction(), sigma, delta,
                         use_estimated_sigma,
                         optimizer=kwargs.get("optimizer", "jax"),
                         n_starts=kwargs.get("n_starts", 1))


class TPSGMMReg(L2DistRegistration):
    def __init__(self, source, sigma=1.0, delta=0.9, n_gmm_components=800,
                 alpha=1.0, beta=0.1, use_estimated_sigma=True, **kwargs):
        n_gmm_components = min(n_gmm_components, int(source.shape[0] * 0.8))
        super().__init__(source, ft.GMM(n_gmm_components),
                         cf.TPSCostFunction([], alpha, beta), sigma, delta,
                         use_estimated_sigma,
                         optimizer=kwargs.get("optimizer", "jax"),
                         n_starts=kwargs.get("n_starts", 1))
        self._feature_gen.init()
        control_pts, _ = self._feature_gen.compute(source)
        self._cost_fn._control_pts = control_pts


class RigidSVR(L2DistRegistration):
    def __init__(self, source, sigma=1.0, delta=0.9, gamma=0.5, nu=0.1,
                 use_estimated_sigma=True, **kwargs):
        super().__init__(
            source, ft.OneClassSVM(source.shape[1], sigma, gamma, nu),
            cf.RigidCostFunction(), sigma, delta, use_estimated_sigma,
            optimizer=kwargs.get("optimizer", "jax"),
            n_starts=kwargs.get("n_starts", 1))

    def _estimate_sigma(self, data):
        super()._estimate_sigma(data)
        self._feature_gen._sigma = self._sigma
        self._feature_gen._gamma = 1.0 / (2.0 * np.square(self._sigma))


class TPSSVR(L2DistRegistration):
    def __init__(self, source, sigma=1.0, delta=0.9, gamma=0.5, nu=0.1,
                 alpha=1.0, beta=0.1, use_estimated_sigma=True, **kwargs):
        super().__init__(
            source, ft.OneClassSVM(source.shape[1], sigma, gamma, nu),
            cf.TPSCostFunction([], alpha, beta), sigma, delta,
            use_estimated_sigma, optimizer=kwargs.get("optimizer", "jax"),
            n_starts=kwargs.get("n_starts", 1))
        self._feature_gen.init()
        control_pts, _ = self._feature_gen.compute(source)
        self._cost_fn._control_pts = control_pts

    def _estimate_sigma(self, data):
        super()._estimate_sigma(data)
        self._feature_gen._sigma = self._sigma
        self._feature_gen._gamma = 1.0 / (2.0 * np.square(self._sigma))


_JAX_BATCH_CACHE = {}


def _batched_l2dist_program(feat_cls, static_s, static_t,
                            opt_maxiter: int, opt_tol: float, dyn_axes,
                            masked: bool = False, rounds: int = 1,
                            delta: float = 0.9):
    """vmapped whole-round program: B (fit+fit+BFGS) rounds, one dispatch.

    ``masked``: ragged-batch variant taking per-pair (M,)/(N,) validity
    masks — the feature fits exclude padded points (features.py masked
    paths) and zero-weight mixture components are inert in the L2 cost.

    ``rounds`` > 1: the reference's outer annealing loop, traced into the
    SAME program — per round the cost sigma scales by ``delta`` and the
    features refit (GMM: a fresh PRNG key; OCSVM: gamma x10, the feature's
    annealing default), warm-starting BFGS from the previous round. The
    single-pair path does this on the host (registration(), maxiter); in
    the batch program the rounds are unrolled with no early stop.
    """
    key = (feat_cls, static_s, static_t, opt_maxiter, opt_tol, dyn_axes,
           masked, rounds, delta)
    run = _JAX_BATCH_CACHE.get(key)
    if run is None:
        import jax

        obj = cf.RigidCostFunction.pure_objective
        fit = feat_cls.fused_fit
        is_gmm = feat_cls is ft.GMM

        import jax.numpy as jnp

        def one(src, tgt, sm, tm, sigma, dyn, x0s):
            x = fval = None
            for r in range(rounds):
                if rounds > 1:
                    # GMM dyn = (stacked keys (rounds, 2),); OCSVM dyn =
                    # (gamma, nu, z) with gamma annealing x10 per round.
                    dyn_r = (dyn[0][r],) if is_gmm else \
                        (dyn[0] * (10.0 ** r), dyn[1], dyn[2])
                else:
                    dyn_r = dyn
                sigma_r = sigma * (delta ** r)
                mu_s, phi_s = fit(src, static_s, dyn_r, smask=sm)
                mu_t, phi_t = fit(tgt, static_t, dyn_r, smask=tm)
                args = (mu_s, phi_s, mu_t, phi_t, sigma_r)
                if r == 0:
                    xs, fs = jax.vmap(lambda x0: _bfgs_solve(
                        obj, x0, args, opt_maxiter, opt_tol))(x0s)
                    if x0s.shape[0] > 1:
                        x, fval = _rescore_and_polish(
                            xs, src, tgt, sigma_r, opt_maxiter, opt_tol,
                            smask=sm, tmask=tm)
                    else:
                        i = jnp.argmin(fs)
                        x, fval = xs[i], fs[i]
                else:
                    x, fval = _bfgs_solve(obj, x, args, opt_maxiter,
                                          opt_tol)
            return x, fval

        if masked:
            @jax.jit
            def run(x0s, srcs, tgts, smasks, tmasks, sigmas, dynamic):
                return jax.vmap(
                    lambda s, t, sm, tm, sg, dy: one(s, t, sm, tm, sg, dy,
                                                     x0s),
                    in_axes=(0, 0, 0, 0, 0, dyn_axes))(
                    srcs, tgts, smasks, tmasks, sigmas, dynamic)
        else:
            @jax.jit
            def run(x0s, srcs, tgts, sigmas, dynamic):
                return jax.vmap(
                    lambda s, t, sg, dy: one(s, t, None, None, sg, dy, x0s),
                    in_axes=(0, 0, 0, dyn_axes))(
                    srcs, tgts, sigmas, dynamic)

        _JAX_BATCH_CACHE[key] = run
    return run


def _batch_estimated_sigmas(sources) -> np.ndarray:
    """Per-cloud sigma = det(cov)^(1/2d) (reference l2dist_regs.py:58-61)."""
    b, n, d = sources.shape
    hat = sources - sources.mean(axis=1, keepdims=True)
    cov = np.einsum("bnd,bne->bde", hat, hat) / (n - 1)
    return np.power(np.linalg.det(cov), 1.0 / (2.0 * d))


def _registration_l2dist_batch(sources, targets, feature_kind: str,
                               opt_maxiter: int, opt_tol: float,
                               n_gmm_components: int, gamma, nu,
                               use_estimated_sigma: bool, sigma, seed: int,
                               n_starts: int = 1, maxiter: int = 1,
                               delta: float = 0.9) -> List[tf.Transformation]:
    import jax
    import jax.numpy as jnp

    ragged = isinstance(sources, (list, tuple)) \
        or isinstance(targets, (list, tuple))
    if ragged:
        raw_sources = [np.asarray(interop.as_points(s), np.float32)
                       for s in sources]
        raw_targets = [np.asarray(interop.as_points(t), np.float32)
                       for t in targets]
        sources, smask = interop.pad_ragged(raw_sources, np.float32)
        targets, tmask = interop.pad_ragged(raw_targets, np.float32)
        # The GMM component count is a shared static: it must not exceed
        # ANY cloud in the batch (source or target), or the masked seeding
        # would be forced to draw padded points as centers.
        min_m = min(min(s.shape[0] for s in raw_sources),
                    min(t.shape[0] for t in raw_targets))
    else:
        sources = np.asarray(interop.as_points(sources), np.float32)
        targets = np.asarray(interop.as_points(targets), np.float32)
    if sources.ndim != 3 or targets.ndim != 3:
        raise ValueError("batch registration expects (B, N, D) stacks")
    b, n_s, d = sources.shape
    n_t = targets.shape[1]
    if use_estimated_sigma:
        if ragged:
            sigmas = np.asarray([
                _batch_estimated_sigmas(s[None])[0] for s in raw_sources])
        else:
            sigmas = _batch_estimated_sigmas(sources)
    else:
        sigmas = np.full((b,), sigma, np.float64)

    if feature_kind == "gmm":
        feat_cls = ft.GMM
        # Ragged: every pair shares one static component count, so cap it
        # at the SMALLEST cloud (the masked seeding draws k valid points).
        cap = int((min_m if ragged else n_s) * 0.8)
        proto = ft.GMM(min(n_gmm_components, cap))
        static_s = proto.fused_static(n_s)
        static_t = proto.fused_static(n_t)
        # The same key the single-pair fused round uses (counter=1), shared
        # across the batch: clouds differ per element, and batch-of-1 then
        # reproduces the single path exactly.
        if maxiter > 1:
            # One key PER ANNEALING ROUND, matching the single path's
            # counter bump (features.GMM.init): key_r = PRNGKey(seed+1+r).
            dynamic = (np.stack([ft.np_prng_key(seed + 1 + r)
                                 for r in range(maxiter)]),)
        else:
            dynamic = (ft.np_prng_key(seed + 1),)
        dyn_axes = (None,)
    elif feature_kind == "svm":
        feat_cls = ft.OneClassSVM
        static_s = static_t = ()
        gammas = 1.0 / (2.0 * np.square(sigmas)) if use_estimated_sigma \
            else np.full((b,), gamma, np.float64)
        zs = np.power(2.0 * np.pi * np.square(sigmas), d * 0.5)
        dynamic = (jnp.asarray(gammas, jnp.float32),
                   jnp.asarray(np.full((b,), nu), jnp.float32),
                   jnp.asarray(zs, jnp.float32))
        dyn_axes = (0, 0, 0)
    else:
        raise ValueError("unknown feature kind %s" % feature_kind)

    run = _batched_l2dist_program(feat_cls, static_s, static_t,
                                  opt_maxiter, opt_tol, dyn_axes,
                                  masked=ragged, rounds=int(maxiter),
                                  delta=float(delta))
    x0s = cf.RigidCostFunction.initial_multistart(max(1, n_starts))
    if ragged:
        rx, _ = run(jnp.asarray(x0s, jnp.float32),
                    jnp.asarray(sources), jnp.asarray(targets),
                    jnp.asarray(smask), jnp.asarray(tmask),
                    jnp.asarray(sigmas, jnp.float32), dynamic)
    else:
        rx, _ = run(jnp.asarray(x0s, jnp.float32),
                    jnp.asarray(sources), jnp.asarray(targets),
                    jnp.asarray(sigmas, jnp.float32), dynamic)
    rx = np.asarray(jax.device_get(rx), np.float64)
    cost = cf.RigidCostFunction()
    return [cost.to_transformation(rx[i]) for i in range(b)]


def registration_gmmreg_batch(sources, targets, n_gmm_components: int = 800,
                              sigma: float = 1.0,
                              use_estimated_sigma: bool = True,
                              opt_maxiter: int = 50, opt_tol: float = 1.0e-3,
                              seed: int = 0, n_starts: int = 1,
                              maxiter: int = 1, delta: float = 0.9
                              ) -> List[tf.Transformation]:
    """Rigid GMMReg over B cloud pairs in ONE compiled program.

    New capability vs the reference (single-pair only): ``sources`` (B, M, D)
    and ``targets`` (B, N, D) are summarized and registered simultaneously —
    the per-pair GMM fits and BFGS optimizations run vmapped on-device. One
    dispatch, B transformations. Ideal for TPU batch serving.
    ``n_starts > 1`` additionally vmaps BFGS restarts over a coarse
    orientation grid per pair (best final cost wins) — recovers large
    rotations the identity start cannot. Device time scales with the
    slowest start's BFGS, so reserve it for unknown/large rotations.
    """
    return _registration_l2dist_batch(
        sources, targets, "gmm", opt_maxiter, opt_tol, n_gmm_components,
        None, None, use_estimated_sigma, sigma, seed, n_starts,
        maxiter, delta)


def registration_svr_batch(sources, targets, gamma: float = 0.5,
                           nu: float = 0.1, sigma: float = 1.0,
                           use_estimated_sigma: bool = True,
                           opt_maxiter: int = 50, opt_tol: float = 1.0e-3,
                           n_starts: int = 1, maxiter: int = 1,
                           delta: float = 0.9) -> List[tf.Transformation]:
    """Rigid SVR over B cloud pairs in ONE compiled program (see
    :func:`registration_gmmreg_batch`). ``maxiter`` > 1 unrolls the
    reference's annealing rounds into the program (sigma x delta, OCSVM
    gamma x10 per round, warm-started BFGS) — combined rotations near 15-20
    degrees need 2-3 rounds, exactly as in the single-pair path."""
    return _registration_l2dist_batch(
        sources, targets, "svm", opt_maxiter, opt_tol, 0, gamma, nu,
        use_estimated_sigma, sigma, 0, n_starts, maxiter, delta)


def registration_gmmreg(source, target, tf_type_name: str = "rigid",
                        callbacks: List = [], **kargs):
    """GMMReg (reference l2dist_regs.py:158-181).

    Args:
        source: Source point cloud data.
        target: Target point cloud data.
        tf_type_name: 'rigid' or 'nonrigid'.
        callbacks: Called with the current Transformation per BFGS iteration.

    Returns:
        Transformation from source to target.
    """
    cv = lambda x: np.asarray(interop.as_points(x))
    if tf_type_name == "rigid":
        gmmreg = RigidGMMReg(cv(source), **kargs)
    elif tf_type_name == "nonrigid":
        gmmreg = TPSGMMReg(cv(source), **kargs)
    else:
        raise ValueError("Unknown transform type %s" % tf_type_name)
    gmmreg.set_callbacks(callbacks)
    return gmmreg.registration(cv(target))


def registration_svr(
    source,
    target,
    tf_type_name: str = "rigid",
    maxiter: int = 1,
    tol: float = 1.0e-3,
    opt_maxiter: int = 50,
    opt_tol: float = 1.0e-3,
    callbacks: List[Callable] = [],
    **kwargs: Any,
):
    """Support Vector Registration (reference l2dist_regs.py:184-219).

    Args:
        source: Source point cloud data.
        target: Target point cloud data.
        tf_type_name: 'rigid' or 'nonrigid'.
        maxiter / tol: Outer annealing loop controls.
        opt_maxiter / opt_tol: Inner BFGS controls.
        callbacks: Called with the current Transformation per BFGS iteration.

    Returns:
        Transformation from source to target.
    """
    cv = lambda x: np.asarray(interop.as_points(x))
    if tf_type_name == "rigid":
        svr = RigidSVR(cv(source), **kwargs)
    elif tf_type_name == "nonrigid":
        svr = TPSSVR(cv(source), **kwargs)
    else:
        raise ValueError("Unknown transform type %s" % tf_type_name)
    svr.set_callbacks(callbacks)
    return svr.registration(cv(target), maxiter, tol, opt_maxiter, opt_tol)
