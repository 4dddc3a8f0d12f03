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
print("1-D mesh:", np.rad2deg(np.asarray(so.mat2euler(res.transformation.rot))),
      float(res.transformation.scale), np.asarray(res.transformation.t))

# 2-D (m, n) mesh: BOTH clouds sharded — the posterior normalizer is
# psum'd across the source axis (parallel/sharded2d.py). Per-device
# memory drops Pm-fold; same API, pass a 2-axis mesh.
import jax  # noqa: E402
from probreg_tpu.parallel import sharded2d  # noqa: E402

if len(jax.devices()) >= 4:
    mesh2d = sharded2d.make_mesh_2d()  # squarish (pm, pn) over all devices
    res2 = sharded.registration_cpd_sharded(source, target, mesh=mesh2d)
    print(f"2-D mesh {dict(zip(mesh2d.axis_names, mesh2d.devices.shape))}:",
          np.rad2deg(np.asarray(so.mat2euler(res2.transformation.rot))))
