"""Point-light shading for the unseen-object (ModelNet) rendering path.

Re-implements the reference's Phong-ish light shader
(lib/render_glumpy/render_py_light.py:13-80, also used by
render_py_light_modelnet[_multi].py) as a per-vertex computation:

    brightness = clamp(dot(normalize(R n), normalize(light_pos - p_cam)), 0, 1)
    color      = base_color * ((1 - k) + k * brightness * light_intensity)

with k the brightness_ratio (the reference instantiates one GL program per
ratio in {0.4, 0.3, 0.2}; here it is a traced scalar).  Since the rasterizer
interpolates vertex colors perspective-correctly, lighting the vertices is
the direct analog of the reference's interpolated-normal fragment shading on
these dense meshes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def compute_vertex_normals(vertices: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals (host-side, at mesh load)."""
    v = np.asarray(vertices, np.float64)
    f = np.asarray(faces)
    fn = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])  # area-weighted
    n = np.zeros_like(v)
    for i in range(3):
        np.add.at(n, f[:, i], fn)
    norm = np.linalg.norm(n, axis=1, keepdims=True)
    return (n / np.maximum(norm, 1e-12)).astype(np.float32)


def lit_vertex_colors(
    vertices: jax.Array,      # (B, V, 3) model frame
    normals: jax.Array,       # (B, V, 3) model frame
    base_colors: jax.Array,   # (B, V, 3) [0, 255]
    pose: jax.Array,          # (B, 3, 4)
    light_position: jax.Array,   # (3,) or (B, 3), camera frame
    light_intensity: jax.Array,  # (3,) or (B, 3)
    brightness_ratio: jax.Array | float = 0.4,
) -> jax.Array:
    """Vertex colors under the reference's point-light model."""
    r = pose[..., :3, :3]
    t = pose[..., :3, 3]
    p_cam = jnp.einsum("bij,bvj->bvi", r, vertices) + t[:, None, :]
    n_cam = jnp.einsum("bij,bvj->bvi", r, normals)
    lp = jnp.broadcast_to(jnp.asarray(light_position), p_cam.shape[:1] + (3,))
    to_light = lp[:, None, :] - p_cam
    cos = jnp.sum(n_cam * to_light, axis=-1) / (
        jnp.linalg.norm(to_light, axis=-1) * jnp.maximum(jnp.linalg.norm(n_cam, axis=-1), 1e-12)
    )
    brightness = jnp.clip(cos, 0.0, 1.0)
    li = jnp.broadcast_to(jnp.asarray(light_intensity), p_cam.shape[:1] + (3,))
    k = jnp.asarray(brightness_ratio)
    if k.ndim == 1:  # per-sample ratio
        k = k[:, None, None]
    scale = (1.0 - k) + k * brightness[..., None] * li[:, None, :]
    return jnp.clip(base_colors * scale, 0.0, 255.0)
