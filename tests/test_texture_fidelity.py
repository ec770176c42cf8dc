"""Texture fidelity: quantify vertex-baked color error against exact
per-fragment texture sampling under the zoom crop, and validate the
texture-sampling render path (rasterize_textured), which reproduces the
reference GL renderer's fragment-rate texture2D
(render_py_multi.py:40-52).

Measured picture (printed by test_vertex_baking_error_measured): at
LINEMOD-like vertex density (object ~200 px across, >= several thousand
vertices) a smooth/photographic texture bakes with ~1-2 intensity levels of
mean foreground error; an adversarial checkerboard on a coarse mesh is off
by tens of levels — that regime needs dataset.TEXTURE_SAMPLING."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepim_tpu.render.mesh import Mesh, MeshBank, _sample_texture
from deepim_tpu.render.rasterizer import (
    RasterConfig,
    rasterize,
    rasterize_textured,
    texture_gather,
)

H = W = 128
# Object at z=0.5 with fx=320 and radius 0.05 -> ~64 px across: a zoomed
# LINEMOD crop has the object filling most of the frame; scale fx up.
K_MAT = np.array([[500.0, 0.0, 64.0], [0.0, 500.0, 64.0], [0.0, 0.0, 1.0]], np.float32)
CFG = RasterConfig(height=H, width=W, tile_h=8, tile_w=64, max_faces_per_tile=256,
                   chunk=16, znear=0.05, zfar=10.0)


def make_uv_sphere(radius: float, n_lat: int, n_lon: int, texture: np.ndarray) -> Mesh:
    """Lat/long sphere with proper uv coordinates and a texture."""
    verts, uvs = [], []
    for i in range(n_lat + 1):
        theta = np.pi * i / n_lat
        for j in range(n_lon + 1):  # duplicate seam column for clean uv wrap
            phi = 2 * np.pi * j / n_lon
            verts.append([
                radius * np.sin(theta) * np.cos(phi),
                radius * np.sin(theta) * np.sin(phi),
                radius * np.cos(theta),
            ])
            uvs.append([j / n_lon, 1.0 - i / n_lat])
    faces = []
    stride = n_lon + 1
    for i in range(n_lat):
        for j in range(n_lon):
            a = i * stride + j
            faces.append([a, a + 1, a + stride])
            faces.append([a + 1, a + stride + 1, a + stride])
    v = np.asarray(verts, np.float32)
    uv = np.asarray(uvs, np.float32)
    colors = _sample_texture(texture, uv).astype(np.float32)
    return Mesh(vertices=v, faces=np.asarray(faces, np.int32), colors=colors,
                uv=uv, texture=texture.astype(np.float32))


def smooth_texture(size: int = 256, seed: int = 0) -> np.ndarray:
    """Photographic-like band-limited texture: coarse noise upsampled."""
    import cv2

    rng = np.random.RandomState(seed)
    coarse = rng.uniform(40, 215, (16, 16, 3)).astype(np.float32)
    return cv2.resize(coarse, (size, size), interpolation=cv2.INTER_CUBIC).clip(0, 255)


def checker_texture(size: int = 256, cells: int = 32) -> np.ndarray:
    ij = np.indices((size, size)).sum(axis=0) // (size // cells)
    c = (ij % 2).astype(np.float32)
    return np.stack([c * 255, c * 255, (1 - c) * 255], axis=-1)


def _fg_error(mesh: Mesh) -> float:
    """Mean |baked - texture-sampled| over foreground pixels for one view."""
    pose = np.eye(3, 4, dtype=np.float32)
    pose[2, 3] = 0.5
    args = (
        jnp.asarray(mesh.vertices)[None], jnp.asarray(mesh.faces)[None],
        jnp.ones((1, mesh.num_faces), bool), jnp.asarray(pose)[None],
        jnp.asarray(K_MAT),
    )
    rgb_baked, depth = rasterize(args[0], jnp.asarray(mesh.colors)[None], *args[1:], CFG)
    rgb_tex, depth2 = rasterize_textured(
        args[0], jnp.asarray(mesh.uv)[None], jnp.asarray(mesh.texture)[None], *args[1:], CFG
    )
    np.testing.assert_allclose(np.asarray(depth), np.asarray(depth2), atol=1e-5)
    fg = np.asarray(depth[0]) > 0
    assert fg.sum() > 500  # object fills a zoom-crop-sized region
    diff = np.abs(np.asarray(rgb_baked[0]) - np.asarray(rgb_tex[0]))[fg]
    return float(diff.mean())


def test_texture_gather_matches_host_reference(rng):
    tex = smooth_texture()
    uv = rng.uniform(0, 1, (1, 8, 16, 2)).astype(np.float32)
    got = np.asarray(texture_gather(jnp.asarray(tex)[None], jnp.asarray(uv[..., 0]), jnp.asarray(uv[..., 1])))
    want = _sample_texture(tex, uv.reshape(-1, 2)).reshape(1, 8, 16, 3)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_vertex_baking_error_measured():
    """The measurement the round-1 'visually equivalent' claim lacked."""
    tex_smooth = smooth_texture()
    tex_checker = checker_texture()
    err = {
        ("smooth", "coarse"): _fg_error(make_uv_sphere(0.05, 12, 24, tex_smooth)),
        ("smooth", "dense"): _fg_error(make_uv_sphere(0.05, 64, 128, tex_smooth)),
        ("checker", "coarse"): _fg_error(make_uv_sphere(0.05, 12, 24, tex_checker)),
        ("checker", "dense"): _fg_error(make_uv_sphere(0.05, 64, 128, tex_checker)),
    }
    print("vertex-baking mean foreground error (intensity levels /255):", err)
    # Dense mesh (LINEMOD-like density: ~8k verts on a ~120 px object) bakes
    # a smooth texture to within a few intensity levels.
    assert err[("smooth", "dense")] < 4.0
    # Densifying helps monotonically.
    assert err[("smooth", "dense")] < err[("smooth", "coarse")]
    assert err[("checker", "dense")] < err[("checker", "coarse")]
    # The adversarial regime is real: coarse + checker is visibly wrong,
    # which is exactly what dataset.TEXTURE_SAMPLING exists for.
    assert err[("checker", "coarse")] > 10.0


def test_engine_texture_sampling_path(rng):
    """refine_step runs end-to-end with dataset.TEXTURE_SAMPLING mesh banks."""
    from deepim_tpu.engine import EngineConfig, MeshBuffers, Observation, refine, render_at_pose
    from deepim_tpu.models import FlowNetDeepIM
    from deepim_tpu.ops.masks import box_fill
    from deepim_tpu.config import replace

    tex = smooth_texture()
    mesh = make_uv_sphere(0.05, 16, 32, tex)
    bank = MeshBank.from_meshes([mesh], pad_multiple=64, keep_textures=True)
    bank_arrays = {
        "vertices": jnp.asarray(bank.vertices), "colors": jnp.asarray(bank.colors),
        "faces": jnp.asarray(bank.faces), "face_valid": jnp.asarray(bank.face_valid),
        "uv": jnp.asarray(bank.uv), "textures": jnp.asarray(bank.textures),
    }
    cls_idx = jnp.zeros((2,), jnp.int32)
    meshes = MeshBuffers.gather(bank_arrays, cls_idx)
    assert meshes.uv is not None and meshes.textures is not None

    ecfg = EngineConfig(
        height=H, width=W, raster=CFG, update_mask="box_rendered",
        num_iters=2, texture_sampling=True,
    )
    pose_gt = np.eye(3, 4, dtype=np.float32)[None].repeat(2, 0)
    pose_gt[:, 2, 3] = 0.5
    img, depth, mask = render_at_pose(meshes, jnp.asarray(pose_gt), jnp.asarray(K_MAT), ecfg)
    assert float(img.max()) > 30.0
    model = FlowNetDeepIM(pred_flow=False, pred_mask=False)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 8)))
    obs = Observation(
        image_observed=img, mask_observed=box_fill(mask), mask_gt_observed=None,
        depth_observed=None, k=jnp.asarray(K_MAT),
    )
    pose0 = jnp.asarray(pose_gt).at[:, 2, 3].add(0.05)
    pose_final, poses = jax.jit(
        lambda p, o, m, p0: refine(p, model, o, m, p0, ecfg)
    )(params, obs, meshes, pose0)
    assert np.isfinite(np.asarray(pose_final)).all()
