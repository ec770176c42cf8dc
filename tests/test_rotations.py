"""Property tests for batched rotation conversions vs analytic identities and
scipy ground truth (mirrors the reference's manual self-test pattern in
operator_py/transform3d.py:311-539, but automated)."""
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

import jax
import jax.numpy as jnp

from deepim_tpu.geometry import (
    euler2mat,
    mat2euler,
    mat2quat,
    qmult,
    quat2mat,
    quat_inverse,
    quat_normalize,
    rot_geodesic_deg,
)


def random_quats(rng, n):
    q = rng.randn(n, 4)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q[q[:, 0] < 0] *= -1
    return q.astype(np.float32)


def test_quat2mat_matches_scipy(rng):
    q = random_quats(rng, 64)
    m = np.asarray(quat2mat(jnp.asarray(q)))
    # scipy uses (x, y, z, w)
    m_ref = R.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    np.testing.assert_allclose(m, m_ref, atol=1e-5)


def test_quat2mat_unnormalized_ok(rng):
    q = random_quats(rng, 16)
    m1 = np.asarray(quat2mat(jnp.asarray(q)))
    m2 = np.asarray(quat2mat(jnp.asarray(q * 3.7)))
    np.testing.assert_allclose(m1, m2, atol=1e-5)


def test_quat2mat_zero_quat_identity():
    m = np.asarray(quat2mat(jnp.zeros((4,))))
    np.testing.assert_allclose(m, np.eye(3), atol=1e-6)


def test_mat2quat_roundtrip(rng):
    q = random_quats(rng, 128)
    q2 = np.asarray(mat2quat(quat2mat(jnp.asarray(q))))
    np.testing.assert_allclose(np.abs(np.sum(q * q2, axis=1)), 1.0, atol=1e-4)


def test_mat2quat_near_180(rng):
    # 180-degree rotations exercise all pivot branches.
    for axis in np.eye(3):
        m = R.from_rotvec(np.pi * axis).as_matrix().astype(np.float32)
        q = np.asarray(mat2quat(jnp.asarray(m)))
        m2 = np.asarray(quat2mat(jnp.asarray(q)))
        np.testing.assert_allclose(m2, m, atol=1e-5)


def test_qmult_matches_rotation_compose(rng):
    q1, q2 = random_quats(rng, 8), random_quats(rng, 8)
    q12 = np.asarray(qmult(jnp.asarray(q1), jnp.asarray(q2)))
    m12 = np.asarray(quat2mat(jnp.asarray(q12)))
    m_ref = np.einsum(
        "nij,njk->nik",
        np.asarray(quat2mat(jnp.asarray(q1))),
        np.asarray(quat2mat(jnp.asarray(q2))),
    )
    np.testing.assert_allclose(m12, m_ref, atol=1e-5)


def test_quat_inverse(rng):
    q = random_quats(rng, 8)
    qi = quat_inverse(jnp.asarray(q))
    ident = np.asarray(qmult(jnp.asarray(q), qi))
    np.testing.assert_allclose(ident, np.tile([1, 0, 0, 0], (8, 1)), atol=1e-5)


def test_euler_roundtrip(rng):
    ang = rng.uniform(-1.2, 1.2, (32, 3)).astype(np.float32)
    m = euler2mat(jnp.asarray(ang[:, 0]), jnp.asarray(ang[:, 1]), jnp.asarray(ang[:, 2]))
    m_ref = R.from_euler("xyz", ang).as_matrix()  # static xyz == scipy lowercase xyz
    np.testing.assert_allclose(np.asarray(m), m_ref, atol=1e-5)
    ax, ay, az = mat2euler(m)
    back = np.stack([np.asarray(ax), np.asarray(ay), np.asarray(az)], axis=1)
    np.testing.assert_allclose(back, ang, atol=1e-4)


def test_rot_geodesic_deg(rng):
    angles = rng.uniform(0, np.pi * 0.99, 32)
    axes = rng.randn(32, 3)
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    r1 = R.random(32, random_state=rng).as_matrix()
    r2 = np.einsum("nij,njk->nik", R.from_rotvec(axes * angles[:, None]).as_matrix(), r1)
    d = np.asarray(rot_geodesic_deg(jnp.asarray(r1, jnp.float32), jnp.asarray(r2, jnp.float32)))
    np.testing.assert_allclose(d, np.degrees(angles), atol=0.1)


def test_gradients_flow_through_quat2mat(rng):
    q = jnp.asarray(random_quats(rng, 4))

    def f(q):
        return jnp.sum(quat2mat(quat_normalize(q)) ** 2)

    g = jax.grad(f)(q)
    assert np.all(np.isfinite(np.asarray(g)))
