"""Top-level alias of :mod:`probreg_tpu.models.transformation`.

Keeps the reference import path ``from probreg import transformation`` valid
as ``from probreg_tpu import transformation``.
"""

from .models.transformation import (  # noqa: F401
    AffineTransformation,
    CombinedTransformation,
    DeformableKinematicModel,
    LowRankNonRigidTransformation,
    NonRigidTransformation,
    RigidTransformation,
    TPSTransformation,
    Transformation,
)
