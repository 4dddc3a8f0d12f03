"""Deformable-kinematic FilterReg on a bending bar.

Port of reference examples/filterreg_deformable.py: a line of points is
deformed by two skinning nodes (identity and a 30-degree z-rotation with a
z-translation, blended linearly along the bar), then the deformable
registration recovers the node dual quaternions. The reference needs the
optional dq3d package and Open3D for display; here the dual-quaternion
skinning is native (probreg_tpu/utils/dualquat.py) and the result is
printed / plotted with matplotlib.
"""

import numpy as np
import utils  # noqa: F401  (path + backend setup)
import jax.numpy as jnp

from probreg_tpu import filterreg
from probreg_tpu.models import transformation as tf
from probreg_tpu.utils import dualquat as dq
from probreg_tpu.utils import se3_op as so

n_points = 30
points = np.array([[i * 0.05, 0.0, 0.0] for i in range(n_points)],
                  dtype=np.float32)

# Two nodes: identity, and rotate 30 deg about z + translate 0.3 in z.
rot = np.asarray(so.euler2mat(0.0, 0.0, np.deg2rad(30.0)), np.float32)
q0 = dq.identity()
q1 = dq.from_rot_trans(jnp.asarray(so.mat2quat(rot)),
                       jnp.asarray([0.0, 0.0, 0.3]))

# Linear blend along the bar (reference assigns val[i] = [i/n, 1 - i/n]).
pairs = np.tile(np.array([[0, 1]], np.int32), (n_points, 1))
w = np.arange(n_points, dtype=np.float32) / n_points
ws = tf.DeformableKinematicModel.SkinningWeight(
    pairs, np.stack([w, 1.0 - w], axis=1))

dtf = tf.DeformableKinematicModel(jnp.stack([q0, q1]), ws)
tf_points = np.asarray(dtf.transform(points))

reg = filterreg.DeformableKinematicFilterReg(points, ws, 0.01,
                                             update_sigma2=True)
res = reg.registration(tf_points, maxiter=50, tol=1e-6)

moved = np.asarray(res.transformation.transform(points))
print("ground-truth dual quaternions:")
print(np.asarray(jnp.stack([q0, q1])))
print("estimated dual quaternions:")
print(np.asarray(res.transformation.dualquats))
print("residual RMSE:",
      float(np.sqrt(np.mean((moved - tf_points) ** 2))))

try:
    import matplotlib.pyplot as plt

    fig = plt.figure()
    ax = fig.add_subplot(projection="3d")
    ax.scatter(*points.T, label="source")
    ax.scatter(*tf_points.T, label="target")
    ax.scatter(*moved.T, marker="x", label="registered")
    ax.legend()
    plt.savefig("filterreg_deformable.png", dpi=120)
    print("wrote filterreg_deformable.png")
except Exception as e:  # headless image without matplotlib backends
    print("plot skipped:", e)
