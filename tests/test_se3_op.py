import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probreg_tpu import se3_op as so


def test_skew_cross_product(rng):
    x = rng.normal(size=3)
    v = rng.normal(size=3)
    assert np.allclose(np.asarray(so.skew(x)) @ v, np.cross(x, v), atol=1e-6)


def test_twist_trans_rodrigues(rng):
    tw = np.array([0.1, -0.2, 0.3, 1.0, 2.0, 3.0], dtype=np.float32)
    r, t = so.twist_trans(tw)
    r = np.asarray(r)
    # Orthonormal with det 1
    assert np.allclose(r @ r.T, np.eye(3), atol=1e-5)
    assert np.isclose(np.linalg.det(r), 1.0, atol=1e-5)
    assert np.allclose(t, tw[3:])
    # Zero twist -> identity (branch-free path)
    r0, _ = so.twist_trans(np.zeros(6, np.float32))
    assert np.allclose(r0, np.eye(3), atol=1e-6)


def test_twist_trans_matches_linearization():
    tw = np.array([1e-4, -2e-4, 3e-4, 0, 0, 0], dtype=np.float64)
    r_exact, _ = so.twist_trans(tw)
    r_lin, _ = so.twist_trans(tw, linear=True)
    assert np.allclose(r_exact, r_lin, atol=1e-6)


def test_quat2mat_identity_and_norm_invariance(rng):
    assert np.allclose(so.quat2mat(jnp.array([1.0, 0, 0, 0])), np.eye(3), atol=1e-6)
    q = rng.normal(size=4)
    r1 = np.asarray(so.quat2mat(q))
    r2 = np.asarray(so.quat2mat(3.7 * q))
    assert np.allclose(r1, r2, atol=1e-5)
    assert np.allclose(r1 @ r1.T, np.eye(3), atol=1e-5)


def test_mat2quat_roundtrip(rng):
    for _ in range(10):
        q = rng.normal(size=4)
        q = q / np.linalg.norm(q)
        r = np.asarray(so.quat2mat(q))
        q2 = np.asarray(so.mat2quat(r))
        # quaternion double cover: q or -q
        assert np.allclose(q, q2, atol=1e-4) or np.allclose(q, -q2, atol=1e-4)


def test_euler_roundtrip(rng):
    for _ in range(10):
        angles = rng.uniform(0.0, np.pi / 4, 3)
        r = np.asarray(so.euler2mat(*angles))
        assert np.allclose(r @ r.T, np.eye(3), atol=1e-5)
        back = np.asarray(so.mat2euler(r))
        assert np.allclose(back, angles, atol=1e-5)


def _np_quat2mat(q):
    w, x, y, z = q
    nq = w * w + x * x + y * y + z * z
    s = 2.0 / nq
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


def test_quat2mat_matches_numpy_oracle(rng):
    q = rng.normal(size=4)
    assert np.allclose(np.asarray(so.quat2mat(q)), _np_quat2mat(q), atol=1e-5)


def test_diff_rot_from_quaternion_matches_fd(rng):
    q = rng.normal(size=4)
    d = np.asarray(so.diff_rot_from_quaternion(q))
    assert d.shape == (4, 3, 3)
    h = 1e-6
    for k in range(4):
        dq = np.zeros(4)
        dq[k] = h
        fd = (_np_quat2mat(q + dq) - _np_quat2mat(q - dq)) / (2 * h)  # float64 FD
        assert np.allclose(d[k], fd, atol=1e-3)


def test_twist_mul_composition(rng):
    tw = 0.1 * rng.normal(size=6)
    rot = np.asarray(so.euler2mat(0.1, 0.2, 0.3))
    t = rng.normal(size=3)
    r2, t2 = so.twist_mul(tw, rot, t)
    tr, tt = so.twist_trans(tw)
    assert np.allclose(r2, np.asarray(tr) @ rot, atol=1e-6)
    assert np.allclose(t2, t @ np.asarray(tr).T + tt, atol=1e-6)


def test_diff_x_from_twist_layout():
    x = np.array([1.0, 2.0, 3.0])
    j = np.asarray(so.diff_x_from_twist(x))
    expected = np.array(
        [[0.0, 3.0, -2.0, 1, 0, 0], [-3.0, 0.0, 1.0, 0, 1, 0], [2.0, -1.0, 0.0, 0, 0, 1]]
    )
    assert np.allclose(j, expected)
