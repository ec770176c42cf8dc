"""Tests for the untangled SE(3) delta representation: apply/invert round
trips and numerical-gradient checks (the reference hand-derives these
gradients in operator_py/transform3d.py:99-281 and validates them with
central differences :420-539; autodiff replaces the derivation, the checks
remain)."""
import numpy as np
from scipy.spatial.transform import Rotation as R

import jax
import jax.numpy as jnp
from jax.test_util import check_grads

from deepim_tpu.geometry import (
    RT_transform,
    T_inv_transform,
    T_transform,
    calc_RT_delta,
    make_pose,
    mat2quat,
    se3_inverse,
    se3_mul,
)


def random_poses(rng, n):
    r = R.random(n, random_state=rng).as_matrix().astype(np.float32)
    t = rng.uniform(-0.3, 0.3, (n, 3)).astype(np.float32)
    t[:, 2] = rng.uniform(0.5, 2.0, n)
    return np.concatenate([r, t[:, :, None]], axis=2)


def test_se3_inverse_mul(rng):
    p = jnp.asarray(random_poses(rng, 16))
    ident = se3_mul(p, se3_inverse(p))
    expect = np.tile(np.eye(3, 4, dtype=np.float32), (16, 1, 1))
    np.testing.assert_allclose(np.asarray(ident), expect, atol=1e-5)


def test_untangled_translation_roundtrip(rng):
    for coord in ("CAMERA", "MODEL", "CAMERA_NEW"):
        t_src = jnp.asarray(random_poses(rng, 32)[:, :, 3])
        t_tgt = jnp.asarray(random_poses(rng, 32)[:, :, 3])
        d = T_inv_transform(t_src, t_tgt, rot_coord=coord)
        back = T_transform(t_src, d, rot_coord=coord)
        np.testing.assert_allclose(np.asarray(back), np.asarray(t_tgt), atol=1e-5)


def test_untangled_with_means_stds(rng):
    means = jnp.asarray([0.01, -0.02, 0.1])
    stds = jnp.asarray([0.5, 0.5, 2.0])
    t_src = jnp.asarray(random_poses(rng, 8)[:, :, 3])
    t_tgt = jnp.asarray(random_poses(rng, 8)[:, :, 3])
    d = T_inv_transform(t_src, t_tgt, means, stds, "CAMERA")
    back = T_transform(t_src, d, means, stds, "CAMERA")
    np.testing.assert_allclose(np.asarray(back), np.asarray(t_tgt), atol=1e-5)


def test_rt_delta_roundtrip_all_coords(rng):
    for coord in ("CAMERA", "MODEL"):
        src = jnp.asarray(random_poses(rng, 16))
        tgt = jnp.asarray(random_poses(rng, 16))
        r_delta, t_delta = calc_RT_delta(src, tgt, rot_coord=coord)
        quat = mat2quat(r_delta)
        back = RT_transform(src, quat, t_delta, rot_coord=coord)
        np.testing.assert_allclose(np.asarray(back), np.asarray(tgt), atol=2e-4)


def test_rt_transform_naive(rng):
    src = jnp.asarray(random_poses(rng, 8))
    tgt = jnp.asarray(random_poses(rng, 8))
    r_delta, t_delta = calc_RT_delta(src, tgt, rot_coord="NAIVE")
    back = RT_transform(src, mat2quat(r_delta), t_delta, rot_coord="NAIVE")
    np.testing.assert_allclose(np.asarray(back), np.asarray(tgt), atol=2e-4)


def test_identity_delta_is_zero(rng):
    p = jnp.asarray(random_poses(rng, 4))
    r_delta, t_delta = calc_RT_delta(p, p, rot_coord="CAMERA")
    np.testing.assert_allclose(
        np.asarray(r_delta), np.tile(np.eye(3, dtype=np.float32), (4, 1, 1)), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(t_delta), 0.0, atol=1e-5)


def test_point_matching_gradcheck(rng):
    """Numerical gradient check of the full pose-update + point-transform chain,
    the autodiff replacement for Transform3D's hand-written backward
    (transform3d.py:99-281, self-test :420-539)."""
    pose_src = jnp.asarray(random_poses(rng, 2))
    pts = jnp.asarray(rng.uniform(-0.05, 0.05, (2, 64, 3)).astype(np.float32))

    def f(quat, t_delta):
        pose = RT_transform(pose_src, quat, t_delta, rot_coord="CAMERA")
        out = jnp.einsum("bij,bnj->bni", pose[:, :, :3], pts) + pose[:, None, :, 3]
        return jnp.sum(jnp.abs(out))

    quat = jnp.asarray(np.tile([0.99, 0.05, -0.03, 0.02], (2, 1)).astype(np.float32))
    t_delta = jnp.asarray(rng.uniform(-0.1, 0.1, (2, 3)).astype(np.float32))
    check_grads(f, (quat, t_delta), order=1, modes=["rev"], atol=1e-2, rtol=1e-2)


def test_scan_composes_poses(rng):
    """Chained RT_transform under lax.scan (the shape of the refinement loop)."""
    p0 = jnp.asarray(random_poses(rng, 4))
    deltas_q = jnp.asarray(
        np.stack([np.tile([1.0, 0.01 * i, 0, 0], (4, 1)) for i in range(4)]), jnp.float32
    )
    deltas_t = jnp.asarray(rng.uniform(-0.01, 0.01, (4, 4, 3)).astype(np.float32))

    def step(pose, delta):
        q, t = delta
        return RT_transform(pose, q, t, rot_coord="CAMERA"), None

    final, _ = jax.lax.scan(step, p0, (deltas_q, deltas_t))
    assert final.shape == (4, 3, 4)
    assert np.all(np.isfinite(np.asarray(final)))
