"""Differentiable pose-update + model-point transform (the Transform3D op).

The reference implements this as a custom MXNet op with hand-derived
gradients through quaternion normalization, rotation composition and the
untangled translation update (operator_py/transform3d.py:34-281, per-sample
numpy on host).  Here the forward math is batched JAX and the backward pass
is autodiff; gradients flow only to (rotation, translation) — points and
pose_src are stop-gradiented, matching transform3d.py:148-151.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from deepim_tpu.geometry.se3 import RT_transform


def transform3d(
    points_model: jax.Array,
    quat: jax.Array,
    trans_delta: jax.Array,
    pose_src: jax.Array,
    t_means: jax.Array | float = 0.0,
    t_stds: jax.Array | float = 1.0,
    rot_coord: str = "CAMERA",
) -> jax.Array:
    """Apply the predicted delta to pose_src and transform the model points.

    points_model: (B, N, 3); quat: (B, 4); trans_delta: (B, 3);
    pose_src: (B, 3, 4).  Returns (B, N, 3) points in the camera frame
    (transform3d.py:34-97: quat2mat -> R/T_transform -> R_tgt p + T_tgt).
    """
    points = jax.lax.stop_gradient(points_model)
    src = jax.lax.stop_gradient(pose_src)
    pose_tgt = RT_transform(src, quat, trans_delta, t_means, t_stds, rot_coord)
    r = pose_tgt[..., :3, :3]
    t = pose_tgt[..., :3, 3]
    return jnp.einsum("bij,bnj->bni", r, points) + t[:, None, :]
