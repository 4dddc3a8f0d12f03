"""probreg_tpu — TPU-native probabilistic point-cloud registration.

A ground-up JAX/XLA/Pallas re-design of the capabilities of neka-nat/probreg:
CPD (rigid/affine/nonrigid/constrained), BCPD, FilterReg (pt2pt/pt2pl/
deformable-kinematic), GMMReg/SVR (L2-distance of mixtures), and GMMTree —
with first-class multi-device sharding (jax.sharding mesh + psum'd E-step
moments), which the CPU/CUDA reference does not have.
"""

import jax as _jax

# Registration EM anneals sigma2 toward machine epsilon; the TPU MXU's
# default single-pass-bf16 f32 matmul (~4e-3 relative error) destabilizes it.
# All matmuls in this library are small-K (D=2/3) so full-f32 passes are
# effectively free. Override with jax.default_matmul_precision(...) if needed.
_jax.config.update("jax_default_matmul_precision", "highest")

# Package surface mirroring the reference probreg/__init__.py:1-3
# (bcpd, callbacks, cpd, filterreg, gmmtree, l2dist_regs, log, math_utils,
# transformation) plus the framework-native modules.
from . import (  # noqa: F401
    bcpd,
    cost_functions,
    cpd,
    features,
    filterreg,
    gauss_transform,
    gaussian_filtering,
    gmmtree,
    icp,
    l2dist_regs,
    log,
    math_utils,
    parallel,
    pyramid,
    se3_op,
    tracking,
    transformation,
)
from .version import __version__  # noqa: F401


def __getattr__(name):
    # callbacks pulls in matplotlib; import lazily to keep import light.
    if name == "callbacks":
        import importlib

        return importlib.import_module(".callbacks", __name__)
    raise AttributeError(name)
