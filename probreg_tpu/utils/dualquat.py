"""Dual quaternions as (…, 8) arrays: [qr (w,x,y,z) | qd (w,x,y,z)].

JAX-native replacement for the reference's optional ``dq3d`` dependency
(filterreg.py:20-25, transformation.py:10-15). Supports batched ops so
dual-quaternion linear blending (DLB) over a whole cloud is one fused
vector op instead of a per-point python loop
(reference transformation.py:209-212).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def identity(dtype=jnp.float32) -> jax.Array:
    return jnp.array([1.0, 0, 0, 0, 0, 0, 0, 0], dtype=dtype)


def qmul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product of quaternions (w, x, y, z), batched."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Dual-quaternion product."""
    ar, ad = a[..., :4], a[..., 4:]
    br, bd = b[..., :4], b[..., 4:]
    return jnp.concatenate([qmul(ar, br), qmul(ar, bd) + qmul(ad, br)], axis=-1)


def from_rot_trans(quat: jax.Array, t: jax.Array) -> jax.Array:
    """Dual quaternion from unit rotation quaternion and translation."""
    tq = jnp.concatenate([jnp.zeros_like(t[..., :1]), t], axis=-1)
    qd = 0.5 * qmul(tq, quat)
    return jnp.concatenate([quat, qd], axis=-1)


def from_twist(tw: jax.Array) -> jax.Array:
    """Dual quaternion from a 6-twist (axis-angle w | translation v).

    Matches reference filterreg.py:38-42 (``dualquat_from_twist``): rotation
    quaternion from angle ``|w|`` about axis ``w/|w|``, translation ``v``.
    """
    w, v = tw[..., :3], tw[..., 3:]
    ang2 = jnp.sum(w * w, axis=-1, keepdims=True)
    ang = jnp.sqrt(jnp.maximum(ang2, _EPS))
    axis = w / ang
    half = 0.5 * ang
    qr = jnp.concatenate([jnp.cos(half), jnp.sin(half) * axis], axis=-1)
    qr = jnp.where(ang2 < _EPS, jnp.broadcast_to(jnp.array([1.0, 0, 0, 0], tw.dtype), qr.shape), qr)
    return from_rot_trans(qr, v)


def normalize(q: jax.Array) -> jax.Array:
    n = jnp.linalg.norm(q[..., :4], axis=-1, keepdims=True)
    n = jnp.maximum(n, _EPS)
    return q / n


def dlb2(w0: jax.Array, q0: jax.Array, w1: jax.Array, q1: jax.Array) -> jax.Array:
    """Dual-quaternion linear blend of two dual quaternions, batched.

    Handles the antipodal sign: q1 is flipped when qr0.qr1 < 0.
    """
    dot = jnp.sum(q0[..., :4] * q1[..., :4], axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    return normalize(w0[..., None] * q0 + w1[..., None] * q1)


def transform_point(q: jax.Array, p: jax.Array) -> jax.Array:
    """Apply (batched) unit dual quaternion to (batched) 3-points."""
    qr, qd = q[..., :4], q[..., 4:]
    w = qr[..., :1]
    u = qr[..., 1:]
    # Rotate: p' = p + 2 u x (u x p + w p)
    uxp = jnp.cross(u, p)
    rotated = p + 2.0 * jnp.cross(u, uxp + w * p)
    # Translate: t = 2 (qd * conj(qr)) vector part
    t = 2.0 * qmul(qd, conj(qr))[..., 1:]
    return rotated + t


def conj(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1, -1, -1], dtype=q.dtype)


def to_rot_trans(q: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Extract rotation quaternion and translation vector."""
    qn = normalize(q)
    qr, qd = qn[..., :4], qn[..., 4:]
    t = 2.0 * qmul(qd, conj(qr))[..., 1:]
    return qr, t
