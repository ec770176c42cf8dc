"""Pinhole projection / backprojection (batched JAX).

Replaces lib/utils/projection.py:47-67 (backproject_camera) and the per-pixel
projection math embedded in lib/flow_c/gpu_flow_kernel.cu:37-53 with batched
array code.  Pixel coordinates follow the reference convention: integer pixel
index (w, h) maps through K / K^-1 directly (no half-pixel offset), matching
the CUDA flow kernel.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def pixel_grid(height: int, width: int, dtype=jnp.float32) -> tuple[jax.Array, jax.Array]:
    """Return (h_idx, w_idx) index grids, each (H, W)."""
    hh = jax.lax.broadcasted_iota(dtype, (height, width), 0)
    ww = jax.lax.broadcasted_iota(dtype, (height, width), 1)
    return hh, ww


def backproject_pixels(depth: jax.Array, k_inv: jax.Array) -> jax.Array:
    """Backproject a depth map to camera-frame points.

    depth: (..., H, W); k_inv: (3, 3) inverse intrinsics.
    Returns (..., H, W, 3) points: (x, y, z) = K^-1 (w, h, 1) * depth
    (gpu_flow_kernel.cu:41-44 pixel convention).
    """
    h, w = depth.shape[-2], depth.shape[-1]
    hh, ww = pixel_grid(h, w, depth.dtype)
    x = (ww * k_inv[0, 0] + hh * k_inv[0, 1] + k_inv[0, 2]) * depth
    y = (ww * k_inv[1, 0] + hh * k_inv[1, 1] + k_inv[1, 2]) * depth
    return jnp.stack([x, y, depth], axis=-1)


def project_points(points: jax.Array, k: jax.Array) -> jax.Array:
    """Project camera-frame points to (w, h) pixel coordinates.

    points: (..., 3); k: (3, 3).  Returns (..., 2).
    """
    uvw = jnp.einsum("ij,...j->...i", k, points)
    z = uvw[..., 2] + jnp.sign(uvw[..., 2]) * 1e-15 + jnp.where(uvw[..., 2] == 0, 1e-15, 0.0)
    return uvw[..., :2] / z[..., None]


def transform_points(pose: jax.Array, points: jax.Array) -> jax.Array:
    """Apply (..., 3, 4) pose to (..., N, 3) points -> (..., N, 3)."""
    r = pose[..., :3, :3]
    t = pose[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", r, points) + t[..., None, :]


def project_pose_center(k: jax.Array, pose: jax.Array) -> jax.Array:
    """Project the object origin under pose -> (w, h) pixels (zoom_mask.py:67-69)."""
    return project_points(pose[..., :3, 3], k)
