"""Batched SE(3) math and DeepIM's untangled delta-pose representation.

Re-implements, as batched differentiable JAX, the pose algebra of
lib/pair_matching/RT_transform.py and lib/utils/projection.py:

* se3_inverse / se3_mul                       (projection.py:12-44)
* R_transform / R_inv_transform               (RT_transform.py:47-71)
* T_transform / T_inv_transform (untangled)   (RT_transform.py:74-124)
* calc_RT_delta / RT_transform                (RT_transform.py:16-44,127-151)

The "untangled" representation (DeepIM paper sec. 3.2): the network predicts a
rotation delta about the object center expressed in the chosen frame and a
translation delta (vx, vy, vz) where vx/vy are projective-image-plane offsets
and vz = log(z_src / z_tgt).

Poses are (..., 3, 4) [R|t] matrices throughout. `rot_coord` is a static
Python string ('MODEL', 'CAMERA', 'CAMERA_NEW', 'NAIVE') resolved at trace
time, mirroring the reference's config knob network.ROT_COORD.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from deepim_tpu.geometry.rotations import euler2mat, quat2mat, quat_normalize

_EPS = 1e-12


def make_pose(r: jax.Array, t: jax.Array) -> jax.Array:
    """Assemble (..., 3, 4) pose from (..., 3, 3) rotation and (..., 3) translation."""
    return jnp.concatenate([r, t[..., None]], axis=-1)


def se3_inverse(pose: jax.Array) -> jax.Array:
    """Inverse of [R|t]: [R^T | -R^T t]  (lib/utils/projection.py:12-23)."""
    r = pose[..., :3, :3]
    t = pose[..., :3, 3]
    r_inv = jnp.swapaxes(r, -1, -2)
    t_inv = -jnp.einsum("...ij,...j->...i", r_inv, t)
    return make_pose(r_inv, t_inv)


def se3_mul(pose_a: jax.Array, pose_b: jax.Array) -> jax.Array:
    """Compose [Ra|ta] @ [Rb|tb] -> [Ra Rb | Ra tb + ta]  (projection.py:26-44)."""
    ra, ta = pose_a[..., :3, :3], pose_a[..., :3, 3]
    rb, tb = pose_b[..., :3, :3], pose_b[..., :3, 3]
    r = jnp.einsum("...ij,...jk->...ik", ra, rb)
    t = jnp.einsum("...ij,...j->...i", ra, tb) + ta
    return make_pose(r, t)


def _check_coord(rot_coord: str) -> str:
    rc = rot_coord.lower()
    if rc not in ("model", "camera", "camera_new", "naive"):
        raise ValueError(f"Unknown rot_coord: {rot_coord}")
    return rc


def R_transform(r_src: jax.Array, r_delta: jax.Array, rot_coord: str = "CAMERA") -> jax.Array:
    """Apply rotation delta (RT_transform.py:47-61).

    MODEL frame: R = R_src @ R_delta; CAMERA/NAIVE frames: R = R_delta @ R_src.
    """
    rc = _check_coord(rot_coord)
    if rc == "model":
        return jnp.einsum("...ij,...jk->...ik", r_src, r_delta)
    return jnp.einsum("...ij,...jk->...ik", r_delta, r_src)


def R_inv_transform(r_src: jax.Array, r_tgt: jax.Array, rot_coord: str = "CAMERA") -> jax.Array:
    """Rotation delta taking src to tgt (RT_transform.py:64-71)."""
    rc = _check_coord(rot_coord)
    if rc == "model":
        return jnp.einsum("...ji,...jk->...ik", r_src, r_tgt)
    return jnp.einsum("...ij,...kj->...ik", r_tgt, r_src)


def T_transform(
    t_src: jax.Array,
    t_delta: jax.Array,
    t_means: jax.Array | float = 0.0,
    t_stds: jax.Array | float = 1.0,
    rot_coord: str = "CAMERA",
) -> jax.Array:
    """Apply the untangled translation delta (RT_transform.py:74-95).

    z_tgt = z_src / exp(vz);
    CAMERA/MODEL: x_tgt = z_tgt * (vx + x_src / z_src)   (projective offsets)
    CAMERA_NEW:   x_tgt = z_src * vx + x_src.
    t_src, t_delta: (..., 3).
    """
    rc = _check_coord(rot_coord)
    d = t_delta * t_stds + t_means
    zs = t_src[..., 2]
    z2 = zs / jnp.exp(d[..., 2])
    if rc in ("camera", "model"):
        x2 = z2 * (d[..., 0] + t_src[..., 0] / zs)
        y2 = z2 * (d[..., 1] + t_src[..., 1] / zs)
    elif rc == "camera_new":
        x2 = zs * d[..., 0] + t_src[..., 0]
        y2 = zs * d[..., 1] + t_src[..., 1]
    else:
        raise ValueError("T_transform does not support rot_coord='naive'")
    return jnp.stack([x2, y2, z2], axis=-1)


def T_inv_transform(
    t_src: jax.Array,
    t_tgt: jax.Array,
    t_means: jax.Array | float = 0.0,
    t_stds: jax.Array | float = 1.0,
    rot_coord: str = "CAMERA",
) -> jax.Array:
    """Untangled translation delta taking t_src to t_tgt (RT_transform.py:105-124)."""
    rc = _check_coord(rot_coord)
    if rc == "camera_new":
        vx = (t_tgt[..., 0] - t_src[..., 0]) / t_src[..., 2]
        vy = (t_tgt[..., 1] - t_src[..., 1]) / t_src[..., 2]
    elif rc in ("camera", "model"):
        vx = t_tgt[..., 0] / t_tgt[..., 2] - t_src[..., 0] / t_src[..., 2]
        vy = t_tgt[..., 1] / t_tgt[..., 2] - t_src[..., 1] / t_src[..., 2]
    else:
        raise ValueError("T_inv_transform does not support rot_coord='naive'")
    vz = jnp.log(t_src[..., 2] / t_tgt[..., 2])
    delta = jnp.stack([vx, vy, vz], axis=-1)
    return (delta - t_means) / t_stds


def RT_transform(
    pose_src: jax.Array,
    rot: jax.Array,
    t_delta: jax.Array,
    t_means: jax.Array | float = 0.0,
    t_stds: jax.Array | float = 1.0,
    rot_coord: str = "CAMERA",
) -> jax.Array:
    """Apply a (rotation, untangled-translation) delta to pose(s)
    (RT_transform.py:127-151).

    pose_src: (..., 3, 4); rot: (..., 4) quaternion (normalized internally)
    or (..., 3) 'sxyz' Euler angles — the reference dispatches on the same
    last-dimension size (RT_transform.py:130-138, network.ROT_TYPE);
    t_delta: (..., 3).
    """
    rc = _check_coord(rot_coord)
    if rot.shape[-1] == 4:
        r_delta = quat2mat(quat_normalize(rot))
    elif rot.shape[-1] == 3:
        r_delta = euler2mat(rot[..., 0], rot[..., 1], rot[..., 2])
    else:
        raise ValueError(f"rot delta must have dim 3 (euler) or 4 (quat), got {rot.shape}")
    if rc == "naive":
        return se3_mul(make_pose(r_delta, t_delta), pose_src)
    r = R_transform(pose_src[..., :3, :3], r_delta, rot_coord)
    t = T_transform(pose_src[..., :3, 3], t_delta, t_means, t_stds, rot_coord)
    return make_pose(r, t)


def calc_RT_delta(
    pose_src: jax.Array,
    pose_tgt: jax.Array,
    t_means: jax.Array | float = 0.0,
    t_stds: jax.Array | float = 1.0,
    rot_coord: str = "CAMERA",
) -> tuple[jax.Array, jax.Array]:
    """Relative (R_delta matrix, untangled T_delta) from src to tgt poses
    (RT_transform.py:16-44, rot_type='MATRIX'; convert with mat2quat for 'QUAT')."""
    rc = _check_coord(rot_coord)
    if rc == "naive":
        rel = se3_mul(pose_tgt, se3_inverse(pose_src))
        return rel[..., :3, :3], rel[..., :3, 3]
    r_delta = R_inv_transform(pose_src[..., :3, :3], pose_tgt[..., :3, :3], rot_coord)
    t_delta = T_inv_transform(pose_src[..., :3, 3], pose_tgt[..., :3, 3], t_means, t_stds, rot_coord)
    return r_delta, t_delta
