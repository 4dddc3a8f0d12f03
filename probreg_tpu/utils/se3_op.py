"""SE(3) / SO(3) differential operators, JAX-native and fully jittable.

Functional parity with the reference's ``probreg/se3_op.py`` (skew,
twist_trans, twist_mul, diff_x_from_twist, diff_rot_from_quaternion) plus the
rotation helpers the reference outsourced to ``transforms3d``
(quat2mat / euler2mat / mat2euler), reimplemented here so the framework has no
dependency on that package.

Everything is branch-free (``jnp.where`` instead of python ``if``) so it can
live inside ``jit`` / ``lax.while_loop`` EM bodies.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def skew(x: jax.Array) -> jax.Array:
    """Skew-symmetric matrix of a 3-vector (reference se3_op.py:7-17).

    Supports batched input ``(..., 3) -> (..., 3, 3)``.
    """
    x = jnp.asarray(x)
    z = jnp.zeros_like(x[..., 0])
    return jnp.stack(
        [
            jnp.stack([z, -x[..., 2], x[..., 1]], axis=-1),
            jnp.stack([x[..., 2], z, -x[..., 0]], axis=-1),
            jnp.stack([-x[..., 1], x[..., 0], z], axis=-1),
        ],
        axis=-2,
    )


def twist_trans(tw: jax.Array, linear: bool = False) -> tuple[jax.Array, jax.Array]:
    """Twist vector (w|v) -> (R, t) via exact Rodrigues or linearization.

    Reference: se3_op.py:20-39. Branch-free for jit: the ``twd == 0`` case is
    handled with a safe-norm and ``jnp.where``.
    """
    tw = jnp.asarray(tw)
    w, v = tw[:3], tw[3:]
    eye = jnp.eye(3, dtype=tw.dtype)
    if linear:
        return eye + skew(w), v
    twd2 = jnp.sum(w * w)
    twd = jnp.sqrt(jnp.maximum(twd2, _EPS))
    ntw = w / twd
    c, s = jnp.cos(twd), jnp.sin(twd)
    rot = c * eye + (1.0 - c) * jnp.outer(ntw, ntw) + s * skew(ntw)
    rot = jnp.where(twd2 < _EPS, eye, rot)
    return rot, v


def twist_mul(
    tw: jax.Array, rot: jax.Array, t: jax.Array, linear: bool = False
) -> tuple[jax.Array, jax.Array]:
    """Compose a twist increment with an existing (rot, t).

    Reference: se3_op.py:42-53 — note the reference composes the translation
    as ``t @ tr.T + tt`` (i.e. rotates the old translation by the increment).
    """
    tr, tt = twist_trans(tw, linear=linear)
    return tr @ rot, t @ tr.T + tt


def diff_x_from_twist(x: jax.Array) -> jax.Array:
    """d(T(tw) x)/d(tw) at tw=0: the 3x6 jacobian [ -skew(x) | I ].

    Reference: se3_op.py:56-59. Batched: ``(..., 3) -> (..., 3, 6)``.
    """
    x = jnp.asarray(x)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=x.dtype), x.shape[:-1] + (3, 3))
    return jnp.concatenate([-skew(x), eye], axis=-1)


def quat2mat(q: jax.Array) -> jax.Array:
    """Rotation matrix from a (possibly non-unit) quaternion (w, x, y, z).

    Matches transforms3d.quaternions.quat2mat semantics used by the reference
    (cost_functions.py:49): the quaternion is normalized internally, so BFGS
    can optimize over unconstrained R^4.
    """
    q = jnp.asarray(q)
    w, x, y, z = q[0], q[1], q[2], q[3]
    nq = w * w + x * x + y * y + z * z
    s = 2.0 / jnp.maximum(nq, _EPS)
    xx, yy, zz = x * x * s, y * y * s, z * z * s
    xy, xz, yz = x * y * s, x * z * s, y * z * s
    wx, wy, wz = w * x * s, w * y * s, w * z * s
    return jnp.array(
        [
            [1.0 - yy - zz, xy - wz, xz + wy],
            [xy + wz, 1.0 - xx - zz, yz - wx],
            [xz - wy, yz + wx, 1.0 - xx - yy],
        ],
        dtype=q.dtype,
    )


def quat2mat_np(q):
    """Host-side numpy quat2mat (same semantics as :func:`quat2mat`).

    For boundary code that must not issue eager device ops: on a remote TPU
    every eager jnp op is a tunnel dispatch, so converting an optimizer's
    result vector into a Transformation goes through numpy.
    """
    import numpy as np

    q = np.asarray(q, np.float64)
    w, x, y, z = q
    nq = w * w + x * x + y * y + z * z
    s = 2.0 / max(nq, _EPS)
    xx, yy, zz = x * x * s, y * y * s, z * z * s
    xy, xz, yz = x * y * s, x * z * s, y * z * s
    wx, wy, wz = w * x * s, w * y * s, w * z * s
    return np.array(
        [
            [1.0 - yy - zz, xy - wz, xz + wy],
            [xy + wz, 1.0 - xx - zz, yz - wx],
            [xz - wy, yz + wx, 1.0 - xx - yy],
        ]
    )


def mat2quat(rot: jax.Array) -> jax.Array:
    """Unit quaternion (w, x, y, z) from rotation matrix, branch-free.

    Uses the 4-way stable construction evaluated for all four pivots and a
    ``where`` select, so it is safe under jit/vmap.
    """
    rot = jnp.asarray(rot)
    m00, m01, m02 = rot[0, 0], rot[0, 1], rot[0, 2]
    m10, m11, m12 = rot[1, 0], rot[1, 1], rot[1, 2]
    m20, m21, m22 = rot[2, 0], rot[2, 1], rot[2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, _EPS))

    # candidate 0: w largest
    s0 = safe_sqrt(1.0 + tr) * 2.0
    q0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0])
    # candidate 1: x largest
    s1 = safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1])
    # candidate 2: y largest
    s2 = safe_sqrt(1.0 - m00 + m11 - m22) * 2.0
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2])
    # candidate 3: z largest
    s3 = safe_sqrt(1.0 - m00 - m11 + m22) * 2.0
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3])

    cands = jnp.stack([q0, q1, q2, q3])
    scores = jnp.stack([tr, m00, m11, m22])
    idx = jnp.argmax(scores)
    q = cands[idx]
    return q / jnp.linalg.norm(q)


def diff_rot_from_quaternion(q: jax.Array) -> jax.Array:
    """dR(q)/dq as a (4, 3, 3) tensor.

    The reference hand-derives all 36 partials (se3_op.py:62-120); here we get
    the exact same jacobian from one ``jax.jacfwd`` through :func:`quat2mat`,
    which also compiles to straight-line code.
    """
    jac = jax.jacfwd(quat2mat)(jnp.asarray(q, dtype=jnp.result_type(q, jnp.float32)))
    # jacfwd gives (3, 3, 4); reference layout is (4, 3, 3).
    return jnp.transpose(jac, (2, 0, 1))


def euler2mat(ai: jax.Array, aj: jax.Array, ak: jax.Array) -> jax.Array:
    """Rotation matrix from static-frame xyz Euler angles ('sxyz').

    Matches ``transforms3d.euler.euler2mat`` defaults used throughout the
    reference tests/examples: R = Rz(ak) @ Ry(aj) @ Rx(ai).
    """
    ai, aj, ak = jnp.asarray(ai), jnp.asarray(aj), jnp.asarray(ak)
    si, ci = jnp.sin(ai), jnp.cos(ai)
    sj, cj = jnp.sin(aj), jnp.cos(aj)
    sk, ck = jnp.sin(ak), jnp.cos(ak)
    rx = jnp.array([[1, 0, 0], [0, ci, -si], [0, si, ci]], dtype=jnp.result_type(ai, 1.0))
    ry = jnp.array([[cj, 0, sj], [0, 1, 0], [-sj, 0, cj]], dtype=rx.dtype)
    rz = jnp.array([[ck, -sk, 0], [sk, ck, 0], [0, 0, 1]], dtype=rx.dtype)
    return rz @ ry @ rx


def mat2euler(rot: jax.Array) -> jax.Array:
    """Static-frame xyz Euler angles ('sxyz') from a rotation matrix."""
    rot = jnp.asarray(rot)
    cy = jnp.sqrt(rot[2, 2] * rot[2, 2] + rot[2, 1] * rot[2, 1])
    ok = cy > 1e-6
    ax = jnp.where(ok, jnp.arctan2(rot[2, 1], rot[2, 2]), jnp.arctan2(-rot[1, 2], rot[1, 1]))
    ay = jnp.arctan2(-rot[2, 0], cy)
    az = jnp.where(ok, jnp.arctan2(rot[1, 0], rot[0, 0]), 0.0)
    return jnp.stack([ax, ay, az])


def rotation_angle(r_a: jax.Array, r_b: jax.Array) -> jax.Array:
    """Geodesic angle between two rotations (radians)."""
    r = jnp.asarray(r_a) @ jnp.asarray(r_b).T
    c = (jnp.trace(r) - 1.0) * 0.5
    return jnp.arccos(jnp.clip(c, -1.0, 1.0))
