"""Standalone single-object renderer utility (pysixd-style API).

Equivalent of the reference's lib/utils/renderer.py (Hodan's pysixd
offscreen renderer, :1-456): render a model at (K, R, t) to an RGB and/or
depth image with flat or Phong-ish shading — a convenience wrapper used by
data-prep and visualization scripts, NOT the training hot path (which uses
render.rasterizer directly inside the jitted step).

API mirrors pysixd's `render(model, im_size, K, R, t, clip_near, clip_far,
surf_color, mode, shading)`; the model is a render.mesh.Mesh (load via
load_ply / load_textured_mesh).
"""
from __future__ import annotations

import numpy as np


def render(
    model,
    im_size: tuple[int, int],
    k: np.ndarray,
    r: np.ndarray,
    t: np.ndarray,
    clip_near: float = 0.1,
    clip_far: float = 10.0,
    surf_color: tuple[float, float, float] | None = None,
    mode: str = "rgb+depth",
    shading: str = "flat",
    ambient_weight: float = 0.5,
    texture: np.ndarray | None = None,
    bg_color: tuple[float, float, float, float] = (0.0, 0.0, 0.0, 0.0),
):
    """Render one model at one pose.

    im_size: (width, height) as in pysixd; k: (3, 3); r: (3, 3); t: (3,).
    mode: 'rgb', 'depth' or 'rgb+depth'; shading: 'flat' | 'phong'.
    texture: (TH, TW, 3) image (uint8 or [0, 1] float) sampled per fragment
    through the model's `uv` coordinates (renderer.py:341-349; v-up GL
    convention handled by the sampler, no flipud needed).  bg_color:
    RGB(A) fill for uncovered pixels (alpha ignored — no FBO here).
    Returns rgb (H, W, 3) uint8, depth (H, W) float32 (meters), or both.
    """
    import jax.numpy as jnp

    from deepim_tpu.render.rasterizer import RasterConfig, rasterize_single

    w, h = im_size
    pose = np.concatenate(
        [np.asarray(r, np.float32), np.asarray(t, np.float32).reshape(3, 1)], axis=1
    )
    colors = model.colors
    if surf_color is not None:
        colors = np.tile(np.asarray(surf_color, np.float32) * 255.0, (model.num_vertices, 1))
    if shading == "phong":
        # Headlight Phong-ish: Lambert term against the view direction plus
        # ambient (renderer.py's fragment shader with the light at the
        # camera), evaluated per vertex.
        from deepim_tpu.render.lighting import compute_vertex_normals

        normals = (
            model.normals if model.normals is not None
            else compute_vertex_normals(model.vertices, model.faces)
        )
        n_cam = normals @ np.asarray(r, np.float32).T
        v_cam = model.vertices @ np.asarray(r, np.float32).T + np.asarray(t, np.float32)
        view = -v_cam / np.maximum(np.linalg.norm(v_cam, axis=1, keepdims=True), 1e-9)
        lam = np.clip(np.sum(n_cam * view, axis=1), 0.0, 1.0)[:, None]
        colors = colors * (ambient_weight + (1.0 - ambient_weight) * lam)
    elif shading != "flat":
        raise ValueError(f"unknown shading {shading!r}")

    cfg = RasterConfig(
        height=h, width=w,
        tile_h=8 if h % 8 == 0 else 16,
        tile_w=128 if w % 128 == 0 else 16,
        znear=clip_near, zfar=clip_far,
    )
    if texture is not None:
        # Per-fragment texture2D path (renderer.py:70-71).  Shading
        # modulation rides per-vertex grey 'colors' which the flat/phong
        # branch above has already scaled; fold it into the sampled color.
        if getattr(model, "uv", None) is None:
            raise ValueError("texture given but the model has no uv coordinates")
        from deepim_tpu.render.rasterizer import rasterize_textured

        tex = np.asarray(texture, np.float32)
        if tex.max() <= 1.0 + 1e-6:
            tex = tex * 255.0
        # No np.flipud here (renderer.py:345): texture_gather samples with
        # v-up directly, so the image stays in loaded row order.
        rgb, depth = rasterize_textured(
            jnp.asarray(model.vertices)[None], jnp.asarray(model.uv)[None],
            jnp.asarray(tex)[None], jnp.asarray(model.faces)[None],
            jnp.ones((1, model.num_faces), bool), jnp.asarray(pose)[None],
            jnp.asarray(np.asarray(k, np.float32)), cfg,
        )
        rgb, depth = rgb[0], depth[0]
        if shading == "phong":
            # Re-render the per-vertex light weights and modulate (the GL
            # shader multiplies light_w into the sampled texel).
            lw, _ = rasterize_single(
                jnp.asarray(model.vertices),
                jnp.asarray(np.broadcast_to(lam * 255.0, (model.num_vertices, 3))),
                jnp.asarray(model.faces), jnp.ones(model.num_faces, bool),
                jnp.asarray(pose), jnp.asarray(np.asarray(k, np.float32)), cfg,
            )
            rgb = rgb * (ambient_weight + (1.0 - ambient_weight) * lw / 255.0)
    else:
        rgb, depth = rasterize_single(
            jnp.asarray(model.vertices), jnp.asarray(colors),
            jnp.asarray(model.faces), jnp.ones(model.num_faces, bool),
            jnp.asarray(pose), jnp.asarray(np.asarray(k, np.float32)), cfg,
        )
    depth = np.asarray(depth)
    rgb = np.asarray(rgb)
    if any(c != 0.0 for c in bg_color[:3]):
        bg = np.asarray(bg_color[:3], np.float32) * 255.0
        rgb = np.where((depth > 0)[..., None], rgb, bg)
    rgb = np.clip(rgb, 0, 255).astype(np.uint8)
    if mode == "rgb":
        return rgb
    if mode == "depth":
        return depth
    return rgb, depth
