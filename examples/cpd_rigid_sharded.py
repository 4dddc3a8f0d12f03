"""Multi-device rigid CPD over a jax.sharding mesh.

New capability vs the reference (its accelerator story is one cupy kernel,
cupy_utils.py). Run on CPU with virtual devices:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
  python cpd_rigid_sharded.py
"""
import numpy as np
import utils
from probreg_tpu.parallel import sharded
from probreg_tpu.utils import se3_op as so

source, target = utils.prepare_source_and_target_rigid_3d(
    utils.DATA_DIR + "/bunny.pcd", n_random=0,
    orientation=np.deg2rad([0.0, 0.0, 10.0]))
res = sharded.registration_cpd_sharded(source, target)
print("result:", np.rad2deg(np.asarray(so.mat2euler(res.transformation.rot))),
      float(res.transformation.scale), np.asarray(res.transformation.t))
