"""Batched tile-based triangle rasterizer in pure JAX/XLA.

TPU-native replacement for the reference's glumpy/GLFW/OpenGL renderer
(lib/render_glumpy/render_py_multi.py) so rendering runs *inside* the jitted
refinement step instead of a host round-trip per sample per iteration
(batch_updater_py_multi.py:183-229, tester.py:424-433).

Pipeline (all static shapes, fully batched):
  1. vertex transform + projection (MXU matmuls)
  2. tile binning: per-face screen bbox -> per-tile face lists with a static
     cap, built with a cumsum-rank + scatter compaction (no host sync)
  3. visibility pass: per tile, `lax.scan` over face chunks computing edge
     functions and perspective-correct 1/z; z-buffer keeps the nearest face
     id per pixel (a "visibility buffer")
  4. deferred shading: one barycentric + perspective-correct color
     interpolation per *pixel* (not per face-pixel pair)

Camera convention: derived from the reference's calibrated GL projection
(render_py_multi.py:134-160 + flipud in :120-121): pixel (i, j) of the output
image corresponds exactly to image-plane point u = fx*x/z + cx = j,
v = fy*y/z + cy = i, and depth is the positive camera-frame z (the GL depth
unprojection in render_py_multi.py:127-128 recovers the same quantity).
Faces with any vertex outside (znear, zfar) are culled (the reference relies
on GL clip planes with znear=0.25, zfar=6.0; objects never straddle them).
No backface culling (GL default, render_py_multi.py:89-93 enables only
depth test).  Depth test resolves to the nearest fragment (GL_LESS).

The separate Pallas kernel (pallas_raster.py) consumes the same binning
output; this XLA path is the portable reference and the CPU test target.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

_NEG = -1e30


@dataclass(frozen=True)
class RasterConfig:
    height: int = 480
    width: int = 640
    tile_h: int = 8
    tile_w: int = 128
    max_faces_per_tile: int = 512
    chunk: int = 32
    znear: float = 0.25
    zfar: float = 6.0

    @property
    def tiles_y(self) -> int:
        return -(-self.height // self.tile_h)

    @property
    def tiles_x(self) -> int:
        return -(-self.width // self.tile_w)

    @property
    def num_tiles(self) -> int:
        return self.tiles_y * self.tiles_x


def project_vertices(vertices: jax.Array, pose: jax.Array, k: jax.Array):
    """Transform model-frame vertices to camera frame and screen coords.

    vertices: (V, 3); pose: (3, 4); k: (3, 3).
    Returns (u, v, z): each (V,) with u = fx x/z + cx (pixel == index).
    """
    r, t = pose[:, :3], pose[:, 3]
    cam = vertices @ r.T + t  # (V, 3)
    z = cam[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    u = k[0, 0] * cam[:, 0] / zs + k[0, 1] * cam[:, 1] / zs + k[0, 2]
    v = k[1, 1] * cam[:, 1] / zs + k[1, 2]
    return u, v, z


def _gather_face_corners(u, v, z, faces):
    """faces: (F, 3) -> per-corner screen coords (F, 3) each."""
    fu = u[faces]  # (F, 3)
    fv = v[faces]
    fz = z[faces]
    return fu, fv, fz


def bin_faces(fu, fv, valid, cfg: RasterConfig):
    """Assign faces to the tiles their screen bbox overlaps.

    Returns (tile_faces (T, K) int32 face ids, -1 padded; tile_counts (T,)).
    Compaction: per tile, rank faces by cumulative count of overlapping faces
    and scatter face ids into their slot (drop overflow beyond K).
    """
    t_y, t_x, k_cap = cfg.tiles_y, cfg.tiles_x, cfg.max_faces_per_tile
    n_tiles = t_y * t_x
    f = fu.shape[0]

    umin = jnp.min(fu, axis=1)
    umax = jnp.max(fu, axis=1)
    vmin = jnp.min(fv, axis=1)
    vmax = jnp.max(fv, axis=1)

    # Tile index ranges covered by the bbox (pixel centers at integer coords).
    bx0 = jnp.clip(jnp.floor(umin / cfg.tile_w), 0, t_x - 1).astype(jnp.int32)
    bx1 = jnp.clip(jnp.floor(umax / cfg.tile_w), 0, t_x - 1).astype(jnp.int32)
    by0 = jnp.clip(jnp.floor(vmin / cfg.tile_h), 0, t_y - 1).astype(jnp.int32)
    by1 = jnp.clip(jnp.floor(vmax / cfg.tile_h), 0, t_y - 1).astype(jnp.int32)
    offscreen = (umax < 0) | (umin > cfg.width - 1) | (vmax < 0) | (vmin > cfg.height - 1)
    ok = valid & ~offscreen

    ty = jax.lax.broadcasted_iota(jnp.int32, (t_y, t_x), 0).reshape(n_tiles, 1)
    tx = jax.lax.broadcasted_iota(jnp.int32, (t_y, t_x), 1).reshape(n_tiles, 1)
    overlap = (
        ok[None, :]
        & (tx >= bx0[None, :]) & (tx <= bx1[None, :])
        & (ty >= by0[None, :]) & (ty <= by1[None, :])
    )  # (T, F)

    rank = jnp.cumsum(overlap.astype(jnp.int32), axis=1)  # (T, F)
    counts = jnp.minimum(rank[:, -1], k_cap)
    slot = rank - 1
    in_cap = overlap & (slot < k_cap)
    tile_row = jax.lax.broadcasted_iota(jnp.int32, (n_tiles, f), 0)
    flat_idx = jnp.where(in_cap, tile_row * k_cap + slot, n_tiles * k_cap)
    face_ids = jax.lax.broadcasted_iota(jnp.int32, (n_tiles, f), 1)
    tile_faces = (
        jnp.full((n_tiles * k_cap,), -1, jnp.int32)
        .at[flat_idx.reshape(-1)]
        .set(face_ids.reshape(-1), mode="drop")
        .reshape(n_tiles, k_cap)
    )
    return tile_faces, counts


def _edge(ax, ay, bx, by, px, py):
    """Signed area of (a, b, p): >0 when p is left of a->b."""
    return (bx - ax) * (py - ay) - (by - ay) * (px - ax)


def _visibility_pass(fu, fv, fq, valid, tile_faces, cfg: RasterConfig):
    """Per-tile z-buffer over binned faces -> best face id and 1/z per pixel.

    fu, fv: (F, 3) screen corners; fq: (F, 3) = 1/z per corner;
    tile_faces: (T, K).  Returns (best_face (T, P) int32, best_q (T, P)).
    """
    th, tw = cfg.tile_h, cfg.tile_w
    p = th * tw
    n_tiles, k_cap = tile_faces.shape
    n_chunks = k_cap // cfg.chunk

    ty = jax.lax.broadcasted_iota(jnp.int32, (cfg.tiles_y, cfg.tiles_x), 0).reshape(-1)
    tx = jax.lax.broadcasted_iota(jnp.int32, (cfg.tiles_y, cfg.tiles_x), 1).reshape(-1)
    py = (
        ty[:, None] * th
        + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0).reshape(1, p)
    ).astype(fu.dtype)  # (T, P) pixel v coords
    px = (
        tx[:, None] * tw
        + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1).reshape(1, p)
    ).astype(fu.dtype)

    chunked = tile_faces.reshape(n_tiles, n_chunks, cfg.chunk)
    chunked = jnp.moveaxis(chunked, 1, 0)  # (n_chunks, T, C)

    def chunk_step(carry, face_idx):
        best_q, best_f = carry  # (T, P), (T, P)
        fid = jnp.maximum(face_idx, 0)  # (T, C)
        live = (face_idx >= 0) & valid[fid]
        u = fu[fid]  # (T, C, 3)
        v = fv[fid]
        q = fq[fid]
        u0, u1, u2 = u[..., 0], u[..., 1], u[..., 2]
        v0, v1, v2 = v[..., 0], v[..., 1], v[..., 2]
        area = _edge(u0, v0, u1, v1, u2, v2)  # (T, C)
        # Per-pixel edge functions: (T, C, P).
        pxb, pyb = px[:, None, :], py[:, None, :]
        w0 = _edge(u1[..., None], v1[..., None], u2[..., None], v2[..., None], pxb, pyb)
        w1 = _edge(u2[..., None], v2[..., None], u0[..., None], v0[..., None], pxb, pyb)
        w2 = _edge(u0[..., None], v0[..., None], u1[..., None], v1[..., None], pxb, pyb)
        s = jnp.sign(area)[..., None]
        inside = (
            (w0 * s >= 0) & (w1 * s >= 0) & (w2 * s >= 0)
            & (jnp.abs(area)[..., None] > 1e-12)
            & live[..., None]
        )
        inv_area = 1.0 / jnp.where(jnp.abs(area) < 1e-12, 1.0, area)[..., None]
        qi = (
            w0 * q[..., 0:1] + w1 * q[..., 1:2] + w2 * q[..., 2:3]
        ) * inv_area  # (T, C, P) interpolated 1/z
        qi = jnp.where(inside, qi, _NEG)
        q_c = jnp.max(qi, axis=1)  # (T, P)
        a_c = jnp.argmax(qi, axis=1)  # (T, P) winner within chunk
        f_c = jnp.take_along_axis(fid, a_c, axis=1)
        upd = q_c > best_q
        return (jnp.where(upd, q_c, best_q), jnp.where(upd, f_c, best_f)), None

    init = (jnp.full((n_tiles, p), _NEG, fu.dtype), jnp.full((n_tiles, p), -1, jnp.int32))
    (best_q, best_f), _ = jax.lax.scan(chunk_step, init, chunked)
    return best_f, best_q


def _deferred_shade(best_f, fu, fv, fq, fcol, cfg: RasterConfig):
    """One perspective-correct interpolation per pixel from the visibility
    buffer.  best_f: (T, P) -> rgb (H, W, 3), depth (H, W)."""
    th, tw = cfg.tile_h, cfg.tile_w
    h, w = cfg.height, cfg.width
    t_y, t_x = cfg.tiles_y, cfg.tiles_x

    # Untile to full-image layout.
    img_f = (
        best_f.reshape(t_y, t_x, th, tw).transpose(0, 2, 1, 3).reshape(t_y * th, t_x * tw)
    )[:h, :w]
    fid = jnp.maximum(img_f, 0)
    hit = img_f >= 0

    u = fu[fid]  # (H, W, 3)
    v = fv[fid]
    q = fq[fid]
    c = fcol[fid]  # (H, W, 3 corners, 3 rgb)

    pyy = jax.lax.broadcasted_iota(fu.dtype, (h, w), 0)
    pxx = jax.lax.broadcasted_iota(fu.dtype, (h, w), 1)
    u0, u1, u2 = u[..., 0], u[..., 1], u[..., 2]
    v0, v1, v2 = v[..., 0], v[..., 1], v[..., 2]
    area = _edge(u0, v0, u1, v1, u2, v2)
    w0 = _edge(u1, v1, u2, v2, pxx, pyy)
    w1 = _edge(u2, v2, u0, v0, pxx, pyy)
    w2 = _edge(u0, v0, u1, v1, pxx, pyy)
    inv_area = 1.0 / jnp.where(jnp.abs(area) < 1e-12, 1.0, area)
    l0, l1, l2 = w0 * inv_area, w1 * inv_area, w2 * inv_area
    qp = l0 * q[..., 0] + l1 * q[..., 1] + l2 * q[..., 2]
    qp = jnp.where(jnp.abs(qp) < 1e-12, 1e-12, qp)
    depth = jnp.where(hit, 1.0 / qp, 0.0)
    # Perspective-correct vertex colors: (sum l c q) / (sum l q).
    num = (
        l0[..., None] * c[..., 0, :] * q[..., 0, None]
        + l1[..., None] * c[..., 1, :] * q[..., 1, None]
        + l2[..., None] * c[..., 2, :] * q[..., 2, None]
    )
    rgb = jnp.where(hit[..., None], num / qp[..., None], 0.0)
    return rgb, depth


def rasterize_single(
    vertices: jax.Array,
    colors: jax.Array,
    faces: jax.Array,
    face_valid: jax.Array,
    pose: jax.Array,
    k: jax.Array,
    cfg: RasterConfig,
):
    """Render one mesh at one pose.  Returns (rgb (H, W, 3) in [0, 255],
    depth (H, W) metric camera z, 0 = background)."""
    u, v, z = project_vertices(vertices, pose, k)
    fu, fv, fz = _gather_face_corners(u, v, z, faces)
    in_range = jnp.all((fz > cfg.znear) & (fz < cfg.zfar), axis=1)
    valid = face_valid & in_range
    fq = 1.0 / jnp.where(jnp.abs(fz) < 1e-12, 1e-12, fz)
    fcol = colors[faces]  # (F, 3, 3)
    tile_faces, _ = bin_faces(fu, fv, valid, cfg)
    best_f, _ = _visibility_pass(fu, fv, fq, valid, tile_faces, cfg)
    rgb, depth = _deferred_shade(best_f, fu, fv, fq, fcol, cfg)
    return rgb, depth


@partial(jax.jit, static_argnames=("cfg",))
def rasterize(
    vertices: jax.Array,
    colors: jax.Array,
    faces: jax.Array,
    face_valid: jax.Array,
    poses: jax.Array,
    k: jax.Array,
    cfg: RasterConfig = RasterConfig(),
):
    """Batched render.

    vertices/colors: (B, V, 3); faces: (B, F, 3); face_valid: (B, F);
    poses: (B, 3, 4); k: (3, 3) shared or (B, 3, 3) per sample.
    Returns rgb (B, H, W, 3) in [0, 255] and depth (B, H, W).
    Per-class mesh selection happens upstream by gathering a MeshBank with
    class indices (replaces per-class gloo programs, render_py_multi.py:66-81).
    """
    kb = jnp.broadcast_to(k, (poses.shape[0], 3, 3)) if k.ndim == 2 else k

    def one(args):
        verts, cols, fcs, fvalid, pose, kk = args
        return rasterize_single(verts, cols, fcs, fvalid, pose, kk, cfg)

    # lax.map over the batch bounds binning memory (the (T, F) overlap mask
    # is materialized one sample at a time).
    return jax.lax.map(one, (vertices, colors, faces, face_valid, poses, kb))


def render_mask(depth: jax.Array, thresh: float = 0.2) -> jax.Array:
    """Object mask from rendered depth (batch_updater_py_multi.py:261-265)."""
    return (depth > thresh).astype(depth.dtype)
