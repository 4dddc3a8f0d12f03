"""Frame-to-frame tracking: warm-started sequence registration.

Productizes the warm-start pattern of ``examples/tracking_sequence.py``:
a :class:`RigidTracker` registers each incoming frame against the previous
one (or against a fixed keyframe), seeding every solve with the last
frame's transform AND converged variance — so after the first frame the
EM never revisits the dense start-temperature regime, and (with constant
frame sizes) every solve reuses ONE compiled whole-EM program.

The reference library has no sequence API; its users re-run
``registration_*`` cold per pair.

TPU notes:
- Keep frame sizes CONSTANT (pad/subsample at the sensor boundary):
  a new (M, N) shape pairing triggers a fresh whole-EM compile.
- Combine with ``config.enable_compilation_cache`` so process restarts
  re-attach to previously compiled programs.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from . import config as _config
from .models import transformation as tf
from .utils import interop

__all__ = ["RigidTracker", "NonrigidTracker"]


def _nn_rmse_sub(a: np.ndarray, b: np.ndarray, max_pts: int = 512) -> float:
    """Subsampled nearest-neighbor RMSE (host-side, O(max_pts^2)).

    The quality monitor for auto re-keying: cheap enough to run per frame
    (strided subsample of both clouds), scale-consistent with the
    registration residual it tracks.
    """
    sa = a[:: max(1, a.shape[0] // max_pts)]
    sb = b[:: max(1, b.shape[0] // max_pts)]
    d2 = ((sa[:, None, :] - sb[None, :, :]) ** 2).sum(-1)
    return float(np.sqrt(d2.min(axis=1).mean()))


class RigidTracker:
    """Tracks a rigid pose through a sequence of point-cloud frames.

    Args:
        algorithm: 'cpd' (default), 'filterreg' or 'icp'.
        mode: 'frame_to_frame' registers consecutive frames and composes
            the increments into the world pose (drift accumulates slowly;
            each solve is a small-motion problem). 'keyframe' registers
            the current KEYFRAME (initially the first frame) against every
            new frame directly — no drift while the keyframe holds, and
            automatic re-keying (below) bounds the motion a single solve
            must bridge on long sequences.
        rekey_rmse: Keyframe mode only — re-key (promote the current frame
            to keyframe, folding its pose into the world pose) when the
            solve's subsampled NN-RMSE exceeds this threshold. 'auto'
            (default) uses max(4x the first keyframe solve's RMSE, 2% of
            the first frame's bbox diagonal); pass a float for an absolute
            threshold or None to disable (pre-round-4 behavior).
            ``n_rekeys`` counts re-keys.
        sigma2_inflation: The carried variance is multiplied by this
            before seeding the next solve — the new frame moved, so the
            converged variance of the last solve slightly understates the
            incoming residual. 1 disables (pure carry).
        sigma2_floor_frac: Per-frame floor on the carried variance, as a
            fraction of the dense start temperature (the mean pairwise
            squared distance the cold solver would start from; one O(N)
            numpy pass). On clean clouds the converged variance collapses
            toward eps — far below the NEXT frame's motion — and a warm
            start that cold would make the posterior underflow and the
            track diverge. 1e-3 of the dense temperature re-opens the
            basin to ~3% of the cloud diagonal per frame. 0 disables.
        **kwargs: Forwarded to the underlying ``registration_*`` call
            (maxiter, tol, w, sigma2_decay, trim_fraction, ...).
            Tracking-specific defaults: CPD runs ``update_scale=False``
            (the pose composition assumes scale-free motion) and
            FilterReg runs ``sigma2_decay=0.9`` (a fixed sigma2 never
            converges tightly and the composed pose drifts); pass the
            kwarg explicitly to override. ``n_starts`` applies to the
            first solve only (it is incompatible with warm starts).

    Usage::

        trk = RigidTracker(maxiter=30, tol=1e-6)
        for frame in frames:                      # (N, 3) arrays
            pose = trk.update(frame)              # RigidTransformation
        # pose maps frame 0's coordinates onto the latest frame.
    """

    def __init__(self, algorithm: str = "cpd",
                 mode: str = "frame_to_frame",
                 sigma2_inflation: float = 2.0,
                 sigma2_floor_frac: float = 1.0e-3,
                 rekey_rmse="auto",
                 **kwargs: Any):
        if algorithm not in ("cpd", "filterreg", "icp"):
            raise ValueError("algorithm must be 'cpd', 'filterreg' or "
                             f"'icp'; got {algorithm!r}")
        if mode not in ("frame_to_frame", "keyframe"):
            raise ValueError("mode must be 'frame_to_frame' or 'keyframe'; "
                             f"got {mode!r}")
        reserved = {"tf_init_params"}
        if algorithm == "cpd":
            reserved.add("sigma2_init")
        elif algorithm == "filterreg":
            reserved.add("sigma2")
        bad = sorted(set(kwargs) & reserved)
        if bad:
            raise ValueError(
                f"RigidTracker drives {bad} itself (the warm pose/variance "
                "carry); they cannot be overridden per construction.")
        if algorithm == "icp" and "n_starts" in kwargs:
            raise ValueError("ICP has no orientation multistart; n_starts "
                             "is supported for algorithm='cpd'/'filterreg'")
        self.algorithm = algorithm
        self.mode = mode
        self.sigma2_inflation = float(sigma2_inflation)
        self.sigma2_floor_frac = float(sigma2_floor_frac)
        self.rekey_rmse = rekey_rmse
        self.kwargs = dict(kwargs)
        self._prev: Optional[np.ndarray] = None    # registration source
        self._pose_rot: Optional[np.ndarray] = None
        self._pose_t: Optional[np.ndarray] = None
        self._tf_init: Optional[Dict] = None
        self._sigma2: Optional[float] = None
        # Keyframe mode: world pose of the current keyframe + the re-key
        # quality monitor's adaptive baseline.
        self._key_rot: Optional[np.ndarray] = None
        self._key_t: Optional[np.ndarray] = None
        self._rekey_threshold: Optional[float] = None
        self.n_rekeys = 0
        self.n_frames = 0

    @property
    def pose(self) -> tf.RigidTransformation:
        """World pose: maps frame 0's coordinates onto the latest frame."""
        if self._pose_rot is None:
            raise RuntimeError("no frames tracked yet")
        return tf.RigidTransformation(self._pose_rot, self._pose_t)

    def reset(self) -> None:
        """Forget all state (next update() starts a new sequence)."""
        self._prev = None
        self._pose_rot = None
        self._pose_t = None
        self._tf_init = None
        self._sigma2 = None
        self._key_rot = None
        self._key_t = None
        self._rekey_threshold = None
        self.n_rekeys = 0
        self.n_frames = 0

    def _register(self, source, target):
        if self.algorithm == "cpd":
            from . import cpd as _cpd

            # Rigid tracking: scale is fixed at 1 unless the caller opts
            # in (the pose composition below assumes scale-free motion).
            # n_starts (global search) applies to the FIRST solve only —
            # it is mutually exclusive with the warm start every later
            # frame carries.
            kw = {"update_scale": False, **self.kwargs}
            if self._tf_init is not None:
                kw.pop("n_starts", None)
            res = _cpd.registration_cpd(
                source, target, "rigid",
                tf_init_params=self._tf_init, sigma2_init=self._sigma2,
                **kw)
            trr = res.transformation
            carry_tf = {"rot": np.asarray(trr.rot),
                        "t": np.asarray(trr.t),
                        "scale": float(np.asarray(trr.scale))}
            carry_s2 = float(np.asarray(res.sigma2)) * self.sigma2_inflation
        elif self.algorithm == "filterreg":
            from . import filterreg as _frg

            # Tracking wants each solve to CONVERGE, so anneal by
            # default (the library default sigma2_decay=1.0 exists for
            # reference parity; a fixed sigma2 leaves correspondences
            # blurry and drifts the composed pose).
            kw = {"sigma2_decay": 0.9, **self.kwargs}
            if self._tf_init is not None:
                kw.pop("n_starts", None)
            res = _frg.registration_filterreg(
                source, target, sigma2=self._sigma2,
                tf_init_params=self._tf_init or {}, **kw)
            trr = res.transformation
            carry_tf = {"rot": np.asarray(trr.rot), "t": np.asarray(trr.t)}
            s2 = res.sigma2
            # With a fixed (non-annealed, non-updated) sigma2 the result
            # echoes the input; inflating THAT would compound every frame
            # (2^k growth) — only inflate when the solver evolved it.
            evolving = kw.get("update_sigma2", False) \
                or kw.get("sigma2_decay", 1.0) < 1.0
            carry_s2 = None
            if s2 is not None:
                carry_s2 = float(np.asarray(s2))
                if evolving:
                    carry_s2 *= self.sigma2_inflation
        else:
            from . import icp as _icp

            res = _icp.registration_icp(
                source, target, tf_init_params=self._tf_init or {},
                **self.kwargs)  # ICP has no n_starts
            trr = res.transformation
            carry_tf = {"rot": np.asarray(trr.rot), "t": np.asarray(trr.t)}
            carry_s2 = None
        return trr, carry_tf, carry_s2

    def update(self, frame) -> tf.RigidTransformation:
        """Ingest the next frame; returns the updated world pose."""
        pts = np.asarray(interop.as_points(frame,
                                           dtype=_config.config.dtype))
        if self._prev is None:
            dim = pts.shape[1]
            self._prev = pts
            self._pose_rot = np.eye(dim, dtype=np.float64)
            self._pose_t = np.zeros(dim, np.float64)
            self._key_rot = np.eye(dim, dtype=np.float64)
            self._key_t = np.zeros(dim, np.float64)
            self.n_frames = 1
            return self.pose
        if self._sigma2 is not None and self.sigma2_floor_frac > 0.0:
            from .utils import math_utils as mu

            floor = self.sigma2_floor_frac \
                * mu.squared_kernel_sum_np(self._prev, pts)
            self._sigma2 = max(self._sigma2, floor)
        trr, carry_tf, carry_s2 = self._register(self._prev, pts)
        rot = np.asarray(trr.rot, np.float64)
        t = np.asarray(trr.t, np.float64)
        rekeyed = False
        if self.mode == "frame_to_frame":
            # increment maps prev -> current; world pose composes on top.
            self._pose_rot = rot @ self._pose_rot
            self._pose_t = rot @ self._pose_t + t
            self._prev = pts
        else:  # keyframe: solve maps keyframe -> frame; world composes
            # on the keyframe's own world pose (identity until a re-key).
            self._pose_rot = rot @ self._key_rot
            self._pose_t = rot @ self._key_t + t
            rekeyed = self._maybe_rekey(trr, pts)
        if not rekeyed:
            self._tf_init = carry_tf
            self._sigma2 = carry_s2
        self.n_frames += 1
        return self.pose

    def _maybe_rekey(self, trr, pts) -> bool:
        """Auto re-key: when the keyframe solve's NN-RMSE degrades past
        the threshold, promote the current frame to keyframe (folding its
        pose into the world pose) so the next solves bridge small motion
        again. The docstring's long-sequence story, now implemented.
        Returns True if re-keyed (the caller then drops the warm carry —
        relative motion restarts near identity, variance re-estimates)."""
        if self.rekey_rmse is None:
            return False
        rmse = _nn_rmse_sub(np.asarray(trr.transform(self._prev)), pts)
        if self._rekey_threshold is None:
            if self.rekey_rmse == "auto":
                diag = float(np.linalg.norm(
                    self._prev.max(0) - self._prev.min(0)))
                self._rekey_threshold = max(4.0 * rmse, 0.02 * diag)
            else:
                self._rekey_threshold = float(self.rekey_rmse)
        if rmse <= self._rekey_threshold:
            return False
        self._prev = pts
        self._key_rot = self._pose_rot.copy()
        self._key_t = self._pose_t.copy()
        self._tf_init = None
        self._sigma2 = None
        self.n_rekeys += 1
        return True


class NonrigidTracker:
    """Tracks a DEFORMING cloud against a fixed template via warm BCPD.

    Registers the template (first frame) onto every incoming frame with
    :func:`probreg_tpu.bcpd.registration_bcpd`, warm-starting each solve
    with the previous solve's FULL final VI iterate — rigid params, the
    (M, D) displacement field, the converged variance, the mixing weights
    alpha and diag(Sigma) (the ``return_last`` full-state carry; all
    per-template-row quantities, so they stay valid while the template is
    fixed). After the first frame the VI never revisits the dense
    start-temperature regime: warm solves converge in a few iterations
    where cold solves need the full annealing schedule.

    The reference has no sequence API at all — its users re-run
    ``registration_bcpd`` cold per pair (reference bcpd.py:159).

    Template mode is the only mode: a frame-to-frame variant would change
    the VI's source cloud every step, invalidating the per-source-row
    state (alpha, diag(Sigma), v rows) the warm start carries.

    Args:
        sigma2_inflation: Multiplier on the carried variance (the new
            frame moved/deformed; the last converged variance understates
            the incoming residual). 1 disables.
        sigma2_floor_frac: Per-frame floor on the carried variance as a
            fraction of the dense start temperature (see RigidTracker).
        **kwargs: Forwarded to registration_bcpd (maxiter, tol, lmd, k,
            gamma, rank, w, ...). ``rank=`` is strongly recommended for
            large templates (K x K Woodbury instead of the M x M solve).

    Usage::

        trk = NonrigidTracker(maxiter=30, tol=1e-4, lmd=10.0, rank=48)
        for frame in frames:                     # (N_k, 3) arrays
            transf = trk.update(frame)           # CombinedTransformation
        # transf.transform(template) lands on the latest frame;
        # transf.v is the per-template-point displacement field.
    """

    _RESERVED = ("callbacks", "callback_chunk", "return_last",
                 "tf_init_params", "v_init", "sigma2_init",
                 "_alpha_init", "_sdiag_init")

    def __init__(self, sigma2_inflation: float = 2.0,
                 sigma2_floor_frac: float = 1.0e-3,
                 **kwargs: Any):
        bad = sorted(set(kwargs) & set(self._RESERVED))
        if bad:
            raise ValueError(
                f"NonrigidTracker drives {bad} itself (the warm VI-state "
                "carry and the per-frame result fetch); they cannot be "
                "overridden per construction.")
        self.sigma2_inflation = float(sigma2_inflation)
        self.sigma2_floor_frac = float(sigma2_floor_frac)
        self.kwargs = dict(kwargs)
        self.template: Optional[np.ndarray] = None
        self.transformation = None   # latest CombinedTransformation
        self._warm: Optional[Dict] = None
        self._last_sigma2: Optional[float] = None
        self.n_frames = 0

    def reset(self) -> None:
        self.template = None
        self.transformation = None
        self._warm = None
        self._last_sigma2 = None
        self.n_frames = 0

    def update(self, frame):
        """Ingest the next frame; returns template -> frame transform."""
        from . import bcpd as _bcpd
        from .models import transformation as _tf

        pts = np.asarray(interop.as_points(frame,
                                           dtype=_config.config.dtype))
        if self.template is None:
            self.template = pts
            self.transformation = _tf.CombinedTransformation(
                np.eye(pts.shape[1], dtype=np.float64),
                np.zeros(pts.shape[1], np.float64), 1.0,
                np.zeros_like(pts))
            self.n_frames = 1
            return self.transformation
        warm = dict(self._warm or {})
        if warm.get("sigma2_init") is not None:
            # Inflation and floor are independent knobs (as in
            # RigidTracker): inflation always applies; the floor only
            # when enabled.
            s2 = warm["sigma2_init"] * self.sigma2_inflation
            if self.sigma2_floor_frac > 0.0:
                from .utils import math_utils as mu

                s2 = max(s2, self.sigma2_floor_frac
                         * mu.squared_kernel_sum_np(self.template, pts))
            warm["sigma2_init"] = s2
        extra = {k: v for k, v in self.kwargs.items()
                 if k not in ("w", "maxiter", "tol", "normalize")}
        if self.n_frames > 1:
            # n_starts (global orientation search) applies to the FIRST
            # registered frame only; warm frames refine the carried state
            # (the impl rejects n_starts > 1 combined with warm starts).
            extra.pop("n_starts", None)
            if not warm and self.transformation is not None:
                # The multistart path returns no VI state — seed the next
                # frame from the recovered pose + displacement field (and
                # the winner's final variance) so the found orientation is
                # not discarded and the solve skips the start-temperature
                # regime.
                tr = self.transformation
                warm = {
                    "tf_init_params": {
                        "rot": np.asarray(tr.rigid_trans.rot),
                        "t": np.asarray(tr.rigid_trans.t),
                        "scale": float(np.asarray(tr.rigid_trans.scale)),
                    },
                    "v_init": np.asarray(tr.v),
                }
                if self._last_sigma2 is not None:
                    s2 = self._last_sigma2 * self.sigma2_inflation
                    if self.sigma2_floor_frac > 0.0:
                        from .utils import math_utils as mu

                        s2 = max(s2, self.sigma2_floor_frac
                                 * mu.squared_kernel_sum_np(self.template,
                                                            pts))
                    warm["sigma2_init"] = s2
        res, s2f, last, _ = _bcpd._registration_bcpd_impl(
            self.template, pts, w=self.kwargs.get("w", 0.0),
            maxiter=self.kwargs.get("maxiter", 50),
            tol=self.kwargs.get("tol", 1.0e-3),
            callbacks=[], normalize=self.kwargs.get("normalize", True),
            callback_chunk=1, return_last=True,
            **{**extra, **warm})
        self.transformation = res
        self._warm = last    # full raw-frame VI state, or None
        self._last_sigma2 = None if s2f is None else float(s2f)
        self.n_frames += 1
        return res
