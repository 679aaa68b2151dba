import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from noetic_slam_tpu.utils import geometry as geo


def _rand_quat(rng, n=32):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_mul_matches_scipy(rng):
    q1, q2 = _rand_quat(rng), _rand_quat(rng)
    got = np.asarray(geo.quat_mul(jnp.asarray(q1), jnp.asarray(q2)))
    # scipy uses xyzw
    r = Rotation.from_quat(q1[:, [1, 2, 3, 0]]) * Rotation.from_quat(
        q2[:, [1, 2, 3, 0]])
    want = r.as_quat()[:, [3, 0, 1, 2]]
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got, want * sign, atol=1e-6)


def test_quat_rotate_matches_matrix(rng):
    q = _rand_quat(rng)
    v = rng.normal(size=(32, 3))
    got = np.asarray(geo.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
    R = Rotation.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    want = np.einsum("nij,nj->ni", R, v)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_quat_mat_roundtrip(rng):
    q = _rand_quat(rng)
    m = geo.quat_to_mat(jnp.asarray(q))
    q2 = np.asarray(geo.mat_to_quat(m))
    sign = np.sign(np.sum(q * q2, axis=-1, keepdims=True))
    np.testing.assert_allclose(q * sign, q2, atol=1e-6)


def test_so3_exp_matches_scipy(rng):
    w = rng.normal(size=(16, 3))
    w = np.concatenate([w, w * 1e-7])  # exercise the small-angle branch
    got = np.asarray(geo.so3_exp_quat(jnp.asarray(w)))
    want = Rotation.from_rotvec(w).as_quat()[:, [3, 0, 1, 2]]
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got, want * sign, atol=1e-6)


def test_se3_roundtrip(rng):
    q = _rand_quat(rng)[:4]
    p = rng.normal(size=(4, 3))
    T = geo.make_se3(jnp.asarray(q), jnp.asarray(p))
    q2, p2 = geo.se3_q_p(T)
    sign = np.sign(np.sum(q * np.asarray(q2), axis=-1, keepdims=True))
    np.testing.assert_allclose(q * sign, np.asarray(q2), atol=1e-6)
    np.testing.assert_allclose(p, np.asarray(p2), atol=1e-6)


def test_transform_points(rng):
    q = _rand_quat(rng)[:1]
    p = rng.normal(size=(1, 3))
    pts = rng.normal(size=(64, 3))
    T = np.asarray(geo.make_se3(jnp.asarray(q[0]), jnp.asarray(p[0])))
    got = np.asarray(geo.transform_points(jnp.asarray(T), jnp.asarray(pts)))
    want = pts @ T[:3, :3].T + T[:3, 3]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_quat_angle_deg(rng):
    base = Rotation.from_rotvec([0.0, 0.0, 0.3])
    other = Rotation.from_rotvec([0.0, 0.0, -0.2])
    q1 = base.as_quat()[[3, 0, 1, 2]]
    q2 = other.as_quat()[[3, 0, 1, 2]]
    ang = float(geo.quat_angle_deg(jnp.asarray(q1), jnp.asarray(q2)))
    np.testing.assert_allclose(ang, np.degrees(0.5), rtol=1e-5)
    # hemisphere flip invariance
    ang2 = float(geo.quat_angle_deg(jnp.asarray(q1), jnp.asarray(-q2)))
    np.testing.assert_allclose(ang2, np.degrees(0.5), rtol=1e-5)
