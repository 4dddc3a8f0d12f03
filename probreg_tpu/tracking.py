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

__all__ = ["RigidTracker"]


class RigidTracker:
    """Tracks a rigid pose through a sequence of point-cloud frames.

    Args:
        algorithm: 'cpd' (default), 'filterreg' or 'icp'.
        mode: 'frame_to_frame' registers consecutive frames and composes
            the increments into the world pose (drift accumulates slowly;
            each solve is a small-motion problem). 'keyframe' registers
            the FIRST frame against every new frame directly (no drift,
            but motion relative to the keyframe grows over time — combine
            with ``n_starts``/re-keying for long sequences).
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
                 **kwargs: Any):
        if algorithm not in ("cpd", "filterreg", "icp"):
            raise ValueError("algorithm must be 'cpd', 'filterreg' or "
                             f"'icp'; got {algorithm!r}")
        if mode not in ("frame_to_frame", "keyframe"):
            raise ValueError("mode must be 'frame_to_frame' or 'keyframe'; "
                             f"got {mode!r}")
        self.algorithm = algorithm
        self.mode = mode
        self.sigma2_inflation = float(sigma2_inflation)
        self.sigma2_floor_frac = float(sigma2_floor_frac)
        self.kwargs = dict(kwargs)
        self._prev: Optional[np.ndarray] = None    # registration source
        self._pose_rot: Optional[np.ndarray] = None
        self._pose_t: Optional[np.ndarray] = None
        self._tf_init: Optional[Dict] = None
        self._sigma2: Optional[float] = None
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
        if self.mode == "frame_to_frame":
            # increment maps prev -> current; world pose composes on top.
            self._pose_rot = rot @ self._pose_rot
            self._pose_t = rot @ self._pose_t + t
            self._prev = pts
        else:  # keyframe: the solve IS the world pose
            self._pose_rot = rot
            self._pose_t = t
        self._tf_init = carry_tf
        self._sigma2 = carry_s2
        self.n_frames += 1
        return self.pose
