"""Batched tile-based triangle rasterizer in pure JAX/XLA.

TPU-native replacement for the reference's glumpy/GLFW/OpenGL renderer
(lib/render_glumpy/render_py_multi.py) so rendering runs *inside* the jitted
refinement step instead of a host round-trip per sample per iteration
(batch_updater_py_multi.py:183-229, tester.py:424-433).

Pipeline (all static shapes, fully batched):
  1. vertex transform + projection (batched matmuls)
  2. tile binning: per-face screen bbox -> per-tile face lists with a static
     cap, built with a cumsum-rank + scatter compaction (no host sync)
  3. active-tile compaction: per sample, only the top `active_tiles` tiles by
     face count are rasterized (object-centric frames are mostly empty) and
     the (batch, tile) pairs of ALL samples are flattened into ONE work list
     so the z-buffer loop below is a single while_loop over face chunks, not
     a vmapped loop per sample
  4. visibility pass: while_loop over face chunks (trip count = max binned
     count, not the static cap) computing edge functions and
     perspective-correct 1/z; keeps the nearest face id per pixel
     (a "visibility buffer")
  5. deferred shading: one barycentric + perspective-correct color
     interpolation per *pixel* (not per face-pixel pair)

Camera convention: derived from the reference's calibrated GL projection
(render_py_multi.py:134-160 + flipud in :120-121): pixel (i, j) of the output
image corresponds exactly to image-plane point u = fx*x/z + cx = j,
v = fy*y/z + cy = i, and depth is the positive camera-frame z (the GL depth
unprojection in render_py_multi.py:127-128 recovers the same quantity).
Faces with any vertex outside (znear, zfar) are culled (the reference relies
on GL clip planes with znear=0.25, zfar=6.0; objects never straddle them).
No backface culling (GL default; render_py_multi.py:89-93 enables only the
depth test).  The depth test resolves to the nearest fragment (GL_LESS).
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
    # (8, 128) tiles: one (sublane, lane) vreg per elementwise kernel op, and
    # untiling finished tiles into the (B, H, W) frame moves contiguous
    # 128-float rows instead of strided 32-float chunks.
    tile_h: int = 8
    tile_w: int = 128
    max_faces_per_tile: int = 512
    chunk: int = 32
    znear: float = 0.25
    zfar: float = 6.0
    # Tiles rasterized per sample (top-k by binned face count); 0 = all tiles
    # (exact for any scene; the default covers objects up to ~128 tiles).
    active_tiles: int = 128
    # Binning materializes a (tiles, faces) overlap mask per sample; for very
    # large meshes process the batch in chunks of this size (0 = whole batch).
    bin_batch_chunk: int = 0
    # Soft budget (bytes) for the visibility pass's (work-items, chunk,
    # pixels) temporaries; the face-chunk width shrinks automatically for
    # large batch x active_tiles products.
    vis_mem_budget: int = 2 << 30
    # Use the Pallas per-tile kernel (render/pallas_raster.py) for the
    # visibility + shading loop: per-tile face-count loop bounds instead of
    # the lockstep max-count while_loop.  Requires tile_h*tile_w % 128 == 0.
    use_pallas: bool = False
    # Binning layout for the Pallas path.  'dense' pre-gathers a padded
    # (work_items, K, 32) record table — fine for small meshes, quadratic
    # waste for dense ones (K must cover the fullest tile).  'csr' packs
    # exact per-tile segments (chunk-aligned) from a sorted (tile, face)
    # pair list, so memory and kernel work scale with the actual number of
    # face-tile overlaps; 'auto' switches to csr when F > 2048.
    binning: str = "auto"
    # Static budget of (tile, face) overlap pairs per sample for csr binning,
    # interpreted per face: each face may overlap up to bin_pairs / F tiles
    # (0 = 8 per face, covering bboxes up to ~2 tile columns x 4 tile rows —
    # ample for dense small-face meshes, the regime csr exists for).  A face
    # whose bbox spans more tiles loses its farthest tiles; set
    # bin_pairs = F * num_tiles for exact binning of any mesh, or use the
    # dense path for giant-face meshes.
    bin_pairs: int = 0
    # csr chunk length (faces per kernel grid step / SMEM block rows).
    csr_chunk: int = 128
    # Chunks per pallas_call in the csr path.  The grid's static size covers
    # the worst-case pair budget; groups past the frame's ACTUAL chunk count
    # are skipped at runtime (lax.cond), so only ~1 group typically runs.
    # Bounded by the scalar-prefetch SMEM budget (6 int32 arrays x group).
    csr_group: int = 8192

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
    """Model-frame vertices -> screen coords, batched.

    vertices: (B, V, 3); pose: (B, 3, 4); k: (B, 3, 3).
    Returns (u, v, z): each (B, V) with u = fx x/z + cx (pixel == index).
    """
    r, t = pose[..., :3], pose[..., 3]
    cam = jnp.einsum("bij,bvj->bvi", r, vertices) + t[:, None, :]
    z = cam[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    u = (k[:, 0:1, 0] * cam[..., 0] + k[:, 0:1, 1] * cam[..., 1]) / zs + k[:, 0:1, 2]
    v = k[:, 1:2, 1] * cam[..., 1] / zs + k[:, 1:2, 2]
    return u, v, z


def bin_faces(fu, fv, valid, cfg: RasterConfig):
    """Assign faces to the tiles their screen bbox overlaps (one sample).

    fu, fv: (F, 3); valid: (F,).  Returns (tile_faces (T, K) int32 face ids,
    -1 padded; tile_counts (T,)).

    Compaction of each tile's overlap row is done with a per-row sort of
    `face_id + F * (not overlapping)` keys rather than a scatter — TPU
    scatters serialize, a bitonic row sort is fully vectorized.  Sorted
    ascending this puts overlapping face ids first, in face order (the same
    slot order the draw-call face order gives GL).
    """
    t_y, t_x, k_cap = cfg.tiles_y, cfg.tiles_x, cfg.max_faces_per_tile
    n_tiles = t_y * t_x
    f = fu.shape[0]

    umin = jnp.min(fu, axis=1)
    umax = jnp.max(fu, axis=1)
    vmin = jnp.min(fv, axis=1)
    vmax = jnp.max(fv, axis=1)

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

    counts = jnp.minimum(jnp.sum(overlap.astype(jnp.int32), axis=1), k_cap)
    face_ids = jax.lax.broadcasted_iota(jnp.int32, (n_tiles, f), 1)
    keys = jnp.where(overlap, face_ids, face_ids + f)
    keys = jnp.sort(keys, axis=1)
    if f > k_cap:
        keys = keys[:, :k_cap]
    else:
        keys = jnp.pad(keys, ((0, 0), (0, k_cap - f)), constant_values=2 * f)
    tile_faces = jnp.where(keys < f, keys, -1)
    return tile_faces, counts


_SCAN_CHUNK = 512


def _cumsum_mm(x: jax.Array) -> jax.Array:
    """Inclusive prefix sum along the last axis via MXU matmuls.

    XLA lowers jnp.cumsum on TPU to a log-pass reduce-window that measures
    ~3 ns/element (70 ms for the binning pass's 21M elements); a blocked
    scan — in-chunk prefix as a lower-triangular (C, C) matmul + a short
    cross-chunk carry — moves the same work to the MXU at <1 ms.  Values
    are summed in fp32: exact for the integer inputs used here (all counts
    and indices are < 2^24).
    """
    c = _SCAN_CHUNK
    orig_dtype = x.dtype
    n = x.shape[-1]
    pad = (-n) % c
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    nc = x.shape[-1] // c
    xc = x.reshape(x.shape[:-1] + (nc, c)).astype(jnp.float32)
    tri = jnp.tril(jnp.ones((c, c), jnp.float32))  # tri[s, l] = l <= s
    within = jnp.einsum("...cl,sl->...cs", xc, tri)
    carry = jnp.cumsum(xc.sum(-1), axis=-1) - xc.sum(-1)  # exclusive, (.., nc)
    out = (within + carry[..., None]).reshape(x.shape[:-1] + (nc * c,))
    return out[..., :n].astype(orig_dtype)


def _run_length_decode(boundaries: jax.Array, n: int) -> jax.Array:
    """out[p] = number of boundaries <= p, for p in [0, n) — equivalent to
    searchsorted(boundaries, arange(n), side='right') but via scatter-add
    markers + prefix sum.  XLA's searchsorted lowers to log2 passes of
    gathers over every query, which measures ~40x slower on TPU than this
    formulation (175 ms vs 4 ms for 64x20k queries on v5e)."""
    markers = jnp.zeros((n,), jnp.int32).at[boundaries].add(1, mode="drop")
    return _cumsum_mm(markers)


def bin_faces_csr(fu, fv, valid, cfg: RasterConfig):
    """Sparse binning for one sample: (tile, face) overlap pairs.

    Instead of the (T, F) overlap matrix + per-row sort (O(T*F log^2 F) —
    prohibitive at LINEMOD face counts), enumerate each face's bbox tiles
    directly in a static (F, S) layout (S = per-face tile budget,
    bin_pairs / F) — pure elementwise index math, no scatters (TPU
    scatter-adds serialize per index; an earlier prefix-sum/run-length
    formulation of this pass spent ~200 ms/frame in them at LINEMOD scale)
    — then sort the N = F*S packed keys once to group pairs by tile with
    ascending face ids (GL draw order preserved for z-ties), and read
    per-tile offsets/counts off the sorted keys via searchsorted.

    Returns (sorted_face (N,) int32 [F = invalid], offsets (T,), counts (T,)).
    Faces whose bbox spans more than S tiles lose their farthest tiles
    (bbox row-major); the default S=8 covers every face whose bbox spans at
    most 2 tile columns x 4 tile rows (~250 x 30 px at the default tile
    size) — set bin_pairs = F * num_tiles for exact binning of any mesh.
    """
    t_y, t_x = cfg.tiles_y, cfg.tiles_x
    n_tiles = t_y * t_x
    f = fu.shape[0]
    s = min(max(cfg.bin_pairs // f, 1), n_tiles) if cfg.bin_pairs else min(8, n_tiles)
    n = f * s

    umin = jnp.min(fu, axis=1)
    umax = jnp.max(fu, axis=1)
    vmin = jnp.min(fv, axis=1)
    vmax = jnp.max(fv, axis=1)
    bx0 = jnp.clip(jnp.floor(umin / cfg.tile_w), 0, t_x - 1).astype(jnp.int32)
    bx1 = jnp.clip(jnp.floor(umax / cfg.tile_w), 0, t_x - 1).astype(jnp.int32)
    by0 = jnp.clip(jnp.floor(vmin / cfg.tile_h), 0, t_y - 1).astype(jnp.int32)
    by1 = jnp.clip(jnp.floor(vmax / cfg.tile_h), 0, t_y - 1).astype(jnp.int32)
    offscreen = (umax < 0) | (umin > cfg.width - 1) | (vmax < 0) | (vmin > cfg.height - 1)
    ok = valid & ~offscreen

    wbb = jnp.maximum(bx1 - bx0 + 1, 1)
    span = wbb * (by1 - by0 + 1)
    slot = jax.lax.broadcasted_iota(jnp.int32, (f, s), 1)
    fidx = jax.lax.broadcasted_iota(jnp.int32, (f, s), 0)
    pair_ok = ok[:, None] & (slot < span[:, None])
    tile = (
        (by0[:, None] + slot // wbb[:, None]) * t_x + bx0[:, None] + slot % wbb[:, None]
    )
    tile = jnp.clip(tile, 0, n_tiles - 1)
    # Packed sort key: tile-major, face ascending within tile.  Keys are
    # unique (one pair per (tile, face)), so an unstable sort is exact and
    # cheaper than jnp.sort's stable default.
    key = jnp.where(pair_ok, tile * f + fidx, n_tiles * f).reshape(n)
    (key,) = jax.lax.sort((key,), is_stable=False)
    sorted_tile = key // f
    sorted_face = jnp.where(key < n_tiles * f, key % f, f)
    offsets = jnp.searchsorted(sorted_tile, jnp.arange(n_tiles, dtype=jnp.int32), side="left").astype(jnp.int32)
    ends = jnp.searchsorted(sorted_tile, jnp.arange(n_tiles, dtype=jnp.int32), side="right").astype(jnp.int32)
    # No K clip: CSR segments are exact-packed, so the per-tile face budget
    # is the pair budget itself (the dense path's K cap would silently drop
    # faces on dense meshes — at LINEMOD density most covered tiles overflow
    # a 1k cap).
    counts = ends - offsets
    return sorted_face.astype(jnp.int32), offsets, counts


def _bin_batch(fu, fv, valid, cfg: RasterConfig):
    """Batched binning: (B, F, 3) -> tile_faces (B, T, K), counts (B, T)."""
    vbin = jax.vmap(partial(bin_faces, cfg=cfg))
    if cfg.bin_batch_chunk and fu.shape[0] > cfg.bin_batch_chunk:
        b = fu.shape[0]
        c = cfg.bin_batch_chunk
        assert b % c == 0, (b, c)
        fu_c = fu.reshape(b // c, c, *fu.shape[1:])
        fv_c = fv.reshape(b // c, c, *fv.shape[1:])
        va_c = valid.reshape(b // c, c, *valid.shape[1:])
        tf, cnt = jax.lax.map(lambda args: vbin(*args), (fu_c, fv_c, va_c))
        return tf.reshape(b, *tf.shape[2:]), cnt.reshape(b, *cnt.shape[2:])
    return vbin(fu, fv, valid)


def _edge(ax, ay, bx, by, px, py):
    """Signed area of (a, b, p): >0 when p is left of a->b."""
    return (bx - ax) * (py - ay) - (by - ay) * (px - ax)


def _visibility_pass(fu_flat, fv_flat, fq_flat, tile_faces_g, counts, tile_py, tile_px, cfg):
    """Single while_loop z-buffer over the flattened (batch x active-tile)
    work list.

    fu_flat/fv_flat/fq_flat: (B*F, 3) with invalid faces pre-poisoned;
    tile_faces_g: (W, K) GLOBAL face ids (-1 padded); counts: (W,);
    tile_py/tile_px: (W, P) pixel coords.  Returns (best_f (W, P) global ids,
    best_q (W, P)).
    """
    w_items, k_cap = tile_faces_g.shape
    p = tile_py.shape[1]
    # ~8 (W, C, P) fp32 temporaries live in the chunk body; clamp C to budget.
    chunk = max(1, min(cfg.chunk, int(cfg.vis_mem_budget // (8 * 4 * w_items * p))))
    n_chunks_needed = (jnp.max(counts) + chunk - 1) // chunk

    def chunk_body(state):
        step, best_q, best_f = state
        face_idx = jax.lax.dynamic_slice(tile_faces_g, (0, step * chunk), (w_items, chunk))
        fid = jnp.maximum(face_idx, 0)
        live = face_idx >= 0
        u = fu_flat[fid]  # (W, C, 3)
        v = fv_flat[fid]
        q = fq_flat[fid]
        u0, u1, u2 = u[..., 0], u[..., 1], u[..., 2]
        v0, v1, v2 = v[..., 0], v[..., 1], v[..., 2]
        area = _edge(u0, v0, u1, v1, u2, v2)  # (W, C)
        pxb, pyb = tile_px[:, None, :], tile_py[:, None, :]
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
        ) * inv_area  # (W, C, P) interpolated 1/z
        # Inside a triangle the interpolated 1/z is bounded by its corner
        # values; clamping is exact for inside pixels and stops float error
        # on small-area faces from poisoning the z-buffer.
        qi = jnp.clip(qi, jnp.min(q, axis=-1, keepdims=True), jnp.max(q, axis=-1, keepdims=True))
        qi = jnp.where(inside, qi, _NEG)
        q_c = jnp.max(qi, axis=1)  # (W, P)
        a_c = jnp.argmax(qi, axis=1)
        f_c = jnp.take_along_axis(fid, a_c, axis=1)
        upd = q_c > best_q
        return step + 1, jnp.where(upd, q_c, best_q), jnp.where(upd, f_c, best_f)

    init = (
        jnp.zeros((), jnp.int32),
        jnp.full((w_items, p), _NEG, fu_flat.dtype),
        jnp.full((w_items, p), -1, jnp.int32),
    )
    _, best_q, best_f = jax.lax.while_loop(
        lambda st: st[0] < n_chunks_needed, chunk_body, init
    )
    return best_f, best_q


def _face_planes(fu, fv, fq, fcol):
    """Screen-space plane coefficients per face.

    Every perspective-correct attribute (1/z and each color channel / z) is
    affine in screen space; precomputing (a, b, c) with
    attr(x, y) = a x + b y + c turns per-pixel shading into 2 FMAs per
    attribute (no barycentrics, no corner gathers at pixel rate).

    fu/fv/fq: (N, 3); fcol: (N, 3, 3) -> (N, 4, 3): planes for
    [q, r*q, g*q, b*q].
    """
    u0, u1, u2 = fu[:, 0], fu[:, 1], fu[:, 2]
    v0, v1, v2 = fv[:, 0], fv[:, 1], fv[:, 2]
    area = _edge(u0, v0, u1, v1, u2, v2)
    inv = 1.0 / jnp.where(jnp.abs(area) < 1e-12, 1.0, area)

    def plane(val):  # (N, 3) corner values -> (N, 3) coeffs
        d1 = val[:, 1] - val[:, 0]
        d2 = val[:, 2] - val[:, 0]
        a = (d1 * (v2 - v0) - d2 * (v1 - v0)) * inv
        b = (d2 * (u1 - u0) - d1 * (u2 - u0)) * inv
        c = val[:, 0] - a * u0 - b * v0
        return jnp.stack([a, b, c], axis=-1)

    planes = [plane(fq)]
    for ch in range(3):
        planes.append(plane(fcol[:, :, ch] * fq))
    return jnp.stack(planes, axis=1)  # (N, 4, 3)


def _shade_tiles(best_f, planes_flat, px, py):
    """Shade the compacted tile pixels from the visibility buffer.

    best_f: (W, P) global face ids; planes_flat: (N, 4, 3); px/py: (W, P).
    Returns rgb (W, P, 3), depth (W, P)."""
    fid = jnp.maximum(best_f, 0)
    hit = best_f >= 0
    pc = planes_flat[fid]  # (W, P, 4, 3)
    vals = pc[..., 0] * px[..., None] + pc[..., 1] * py[..., None] + pc[..., 2]  # (W, P, 4)
    qp = vals[..., 0]
    qp = jnp.where(jnp.abs(qp) < 1e-12, 1e-12, qp)
    depth = jnp.where(hit, 1.0 / qp, 0.0)
    rgb = jnp.where(hit[..., None], vals[..., 1:4] / qp[..., None], 0.0)
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
    corners: jax.Array | None = None,
    corner_colors: jax.Array | None = None,
):
    """Batched render.

    vertices/colors: (B, V, 3); faces: (B, F, 3); face_valid: (B, F);
    poses: (B, 3, 4); k: (3, 3) shared or (B, 3, 3) per sample.
    Returns rgb (B, H, W, 3) in [0, 255] and depth (B, H, W).
    Per-class mesh selection happens upstream by gathering a MeshBank with
    class indices (replaces per-class gloo programs, render_py_multi.py:66-81).

    corners/corner_colors ((B, F, 3, 3), optional): pre-expanded face-corner
    positions/colors (vertices[faces] / colors[faces]).  Passing them removes
    the per-render vertex->corner gather from the hot path — corner expansion
    is pose-independent, so callers that render the same mesh repeatedly
    (the 4-iteration refinement scan) expand ONCE per batch
    (MeshBuffers.gather) and pay only the 3x-redundant projection matmul,
    which is MXU-trivial; the gather of projected attributes costs ~45 ms at
    LINEMOD scale per render.  Results are bit-identical either way.
    """
    b, nv, _ = vertices.shape
    nf = faces.shape[1]
    t = cfg.num_tiles
    p = cfg.tile_h * cfg.tile_w
    kb = jnp.broadcast_to(k, (b, 3, 3)) if k.ndim == 2 else k
    use_csr = cfg.use_pallas and (
        cfg.binning == "csr" or (cfg.binning == "auto" and nf > 2048)
    )

    if corners is None or corner_colors is None:
        # One row-gather of packed per-vertex rows instead of per-corner
        # scalar gathers: TPU gathers amortize per-index cost over the row
        # width.
        vattr = jnp.concatenate([vertices, colors], axis=-1)  # (B, V, 6)
        fattr = jnp.take_along_axis(
            vattr, faces.reshape(b, nf * 3)[..., None], axis=1
        ).reshape(b, nf, 3, 6)
        corners = fattr[..., 0:3]
        corner_colors = fattr[..., 3:6]
    u, v, z = project_vertices(corners.reshape(b, nf * 3, 3), poses, kb)
    fu = u.reshape(b, nf, 3)  # (B, F, 3)
    fv = v.reshape(b, nf, 3)
    fz = z.reshape(b, nf, 3)
    fcol = corner_colors  # (B, F, 3, 3)
    in_range = jnp.all((fz > cfg.znear) & (fz < cfg.zfar), axis=2)
    # Cull near-degenerate slivers (screen area < 1e-6 px^2): their plane
    # coefficients carry 1/area ~ 1e6+ and amplify float error into garbage
    # attribute values (e.g. the coincident pole vertices of a lat/long
    # sphere); such faces cannot legitimately cover a pixel center.
    screen_area = _edge(
        fu[..., 0], fv[..., 0], fu[..., 1], fv[..., 1], fu[..., 2], fv[..., 2]
    )
    valid = face_valid & in_range & (jnp.abs(screen_area) > 1e-6)
    fq = 1.0 / jnp.where(jnp.abs(fz) < 1e-12, 1e-12, fz)

    # Flatten faces across the batch so one work list covers all samples.
    fu_flat = fu.reshape(b * nf, 3)
    fv_flat = fv.reshape(b * nf, 3)
    fq_flat = fq.reshape(b * nf, 3)
    fcol_flat = fcol.reshape(b * nf, 3, 3)

    if use_csr:
        sorted_face, offsets, counts = jax.vmap(partial(bin_faces_csr, cfg=cfg))(
            fu, fv, valid
        )  # (B, N), (B, T), (B, T)
    else:
        tile_faces, counts = _bin_batch(fu, fv, valid, cfg)  # (B, T, K), (B, T)

    # One globally pooled, count-sorted work list over all (batch, tile)
    # pairs.  `active_tiles` is a per-sample *average* budget: the batch
    # shares w_items = B * active_tiles work slots, so a close-up sample can
    # borrow slots from far-away samples.  Sorted-descending counts put every
    # empty tile in a contiguous suffix, which the Pallas kernel exploits to
    # skip their DMAs entirely.
    a = cfg.active_tiles if cfg.active_tiles and cfg.active_tiles < t else t
    w_items = min(b * a, b * t)
    counts_flat = counts.reshape(b * t)
    cnt_top, flat_ids = jax.lax.top_k(counts_flat, w_items)  # (W,)
    sample_of = flat_ids // t
    tile_of = flat_ids % t
    if not use_csr:
        tf_sel = tile_faces.reshape(b * t, cfg.max_faces_per_tile)[flat_ids]  # (W, K)
        tf_global = jnp.where(tf_sel >= 0, tf_sel + (sample_of * nf)[:, None], -1)

    dtype = fu.dtype
    ty = (tile_of // cfg.tiles_x).astype(dtype)
    tx = (tile_of % cfg.tiles_x).astype(dtype)
    py = ty[:, None] * cfg.tile_h + jax.lax.broadcasted_iota(
        dtype, (cfg.tile_h, cfg.tile_w), 0
    ).reshape(1, p)
    px = tx[:, None] * cfg.tile_w + jax.lax.broadcasted_iota(
        dtype, (cfg.tile_h, cfg.tile_w), 1
    ).reshape(1, p)

    planes_flat = _face_planes(fu_flat, fv_flat, fq_flat, fcol_flat)

    def untile_grid(x, channels=None):
        """(B*T, P[, C]) tile rows -> (B, H, W[, C]) images."""
        ch = () if channels is None else (channels,)
        out = (
            x.reshape(b, cfg.tiles_y, cfg.tiles_x, cfg.tile_h, cfg.tile_w, *ch)
            .transpose(0, 1, 3, 2, 4, *(range(5, 5 + len(ch))))
            .reshape(b, cfg.tiles_y * cfg.tile_h, cfg.tiles_x * cfg.tile_w, *ch)
        )
        return out[:, : cfg.height, : cfg.width]

    if use_csr:
        from deepim_tpu.render.pallas_raster import (
            build_face_records,
            pallas_csr_group,
        )

        face_records = build_face_records(
            fu_flat, fv_flat, planes_flat, valid.reshape(b * nf), fq_flat
        )
        ch = cfg.csr_chunk
        n_pairs = sorted_face.shape[1]
        sorted_face_flat = sorted_face.reshape(b * n_pairs)
        cnt = cnt_top.astype(jnp.int32)
        seg_off = offsets.reshape(b * t)[flat_ids]  # per-sample pair offset
        chunks_w = (cnt + ch - 1) // ch             # (W,)
        chunk_csum = jnp.cumsum(chunks_w)
        total_chunks = chunk_csum[w_items - 1]      # ACTUAL chunks this frame
        # Static capacity: every budgeted pair once + <CH padding per
        # selected tile.  All metadata is chunk-level (S,) — nothing below
        # materializes pair-level (S*CH) index arrays.
        s_total = (b * n_pairs) // ch + w_items
        group = min(cfg.csr_group, s_total)
        n_groups = -(-s_total // group)
        s_total = n_groups * group
        # Chunk -> work item map (one prefix-sum); the rest of the per-chunk
        # metadata is derived lazily INSIDE each group so the (s_total,)
        # scalar gathers are only paid for groups that actually run.
        w_of_s = jnp.minimum(_run_length_decode(chunk_csum, s_total), w_items - 1)

        interpret = jax.default_backend() == "cpu"
        zq_acc = jnp.full((w_items, p), _NEG, jnp.float32)
        rgbq_acc = jnp.zeros((w_items, 3, p), jnp.float32)
        rows = jnp.arange(w_items)
        for g in range(n_groups):
            sl = slice(g * group, (g + 1) * group)
            w_g = w_of_s[sl]
            s_ids_g = jnp.arange(g * group, (g + 1) * group, dtype=jnp.int32)

            def run_group(w_g=w_g, s_ids_g=s_ids_g, g=g,
                          zq_acc=zq_acc, rgbq_acc=rgbq_acc):
                c_of_s = s_ids_g - (chunk_csum[w_g] - chunks_w[w_g])
                nh_g = jnp.clip(cnt[w_g] - c_of_s * ch, 0, ch)
                init_g = (c_of_s == 0).astype(jnp.int32)
                if g > 0:
                    # A tile split across groups starts from a FRESH output
                    # buffer in the new group; force init on the group's
                    # first chunk (the z-merge below combines the halves).
                    init_g = init_g.at[0].set(1)
                row_g = jnp.where(nh_g > 0, w_g, w_items)
                x0_g = (tile_of[w_g] % cfg.tiles_x) * cfg.tile_w
                y0_g = (tile_of[w_g] // cfg.tiles_x) * cfg.tile_h
                # First budgeted pair of each chunk within the flat sorted-
                # pair array; the chunk's CH pair slots are CONTIGUOUS from
                # there (a tile's CSR segment is contiguous), so the face
                # ids of a whole chunk are one dynamic slice, not CH scalar
                # gathers.
                start_g = jnp.clip(
                    sample_of[w_g] * n_pairs + seg_off[w_g] + c_of_s * ch,
                    0, b * n_pairs - ch,
                )
                sf = jax.vmap(
                    lambda st: jax.lax.dynamic_slice(sorted_face_flat, (st,), (ch,))
                )(start_g)  # (G, CH)
                fg = (sample_of[w_g] * nf)[:, None] + jnp.minimum(sf, nf - 1)
                rec = face_records[fg.reshape(-1)]  # (G*CH, 32)
                out = pallas_csr_group(
                    rec, nh_g, init_g, row_g, x0_g, y0_g,
                    w_items, cfg.tile_h, cfg.tile_w, ch=ch, interpret=interpret,
                )
                # Rows this group touched: [w of first chunk, w of last real
                # chunk]; merge by the z-test (exact for split tiles).
                w_hi = jnp.max(jnp.where(nh_g > 0, row_g, -1))
                touched = (rows >= w_g[0]) & (rows <= w_hi)
                upd = touched[:, None] & (out[:, 0, :] > zq_acc)
                return (
                    jnp.where(upd, out[:, 0, :], zq_acc),
                    jnp.where(upd[:, None, :], out[:, 1:4, :], rgbq_acc),
                )

            if g == 0:
                zq_acc, rgbq_acc = run_group()
            else:
                # Groups past the actual chunk count are SKIPPED at runtime:
                # the static budget covers the worst case, the executed
                # gathers/kernel scale with the real face-tile overlaps.
                zq_acc, rgbq_acc = jax.lax.cond(
                    g * group < total_chunks,
                    run_group,
                    lambda zq_acc=zq_acc, rgbq_acc=rgbq_acc: (zq_acc, rgbq_acc),
                )
        hit = zq_acc > 0
        qsafe = jnp.where(hit, zq_acc, 1.0)
        depth_t = jnp.where(hit, 1.0 / qsafe, 0.0)
        rgb_t = jnp.where(
            hit[:, None, :], rgbq_acc / qsafe[:, None, :], 0.0
        )
        rgb_t = jnp.moveaxis(rgb_t, 1, 2)  # (W, P, 3)
    elif cfg.use_pallas:
        from deepim_tpu.render.pallas_raster import build_face_records, pallas_visibility_shade

        face_records = build_face_records(
            fu_flat, fv_flat, planes_flat, valid.reshape(b * nf), fq_flat
        )
        # Rows at index >= count are -1-padded; the kernel's face loop is
        # bounded by count so the garbage gathered for them is never read.
        tile_records = face_records[jnp.maximum(tf_global, 0)]  # (W, K, 32)
        tile_xy = jnp.stack(
            [
                (tile_of % cfg.tiles_x) * cfg.tile_w,
                (tile_of // cfg.tiles_x) * cfg.tile_h,
            ],
            axis=1,
        ).astype(jnp.int32)
        depth_t, rgb_t = pallas_visibility_shade(
            tile_records, cnt_top.astype(jnp.int32), tile_xy,
            cfg.tile_h, cfg.tile_w,
            interpret=jax.default_backend() == "cpu",
        )
    else:
        best_f, _ = _visibility_pass(
            fu_flat, fv_flat, fq_flat, tf_global, cnt_top, py, px, cfg
        )  # (W, P)
        # Shade in the compacted tile domain (W*P pixels, not B*H*W).
        rgb_t, depth_t = _shade_tiles(best_f, planes_flat, px, py)

    # Place finished tiles back into the full (B, T, P) grid, then untile.
    # Formulated as a row GATHER via the inverse permutation of the work
    # list: scatters of (P,) rows serialize on TPU (XLA cannot prove index
    # uniqueness), while the equivalent gather is fully parallel.  Only the
    # tiny (B*T,) int32 inverse map is built with a scatter.  Work items with
    # count 0 carry kernel garbage and un-selected tiles have no work item —
    # both index the appended zero trash row.
    w_items_n = cnt_top.shape[0]
    src = (
        jnp.full((b * t,), w_items_n, jnp.int32)
        .at[flat_ids]
        .set(
            jnp.where(cnt_top > 0, jnp.arange(w_items_n, dtype=jnp.int32), w_items_n),
            mode="drop",
        )
    )
    # One fused (W+1, P, 4) row gather for [r, g, b, depth] instead of two
    # passes (row-gather cost is per-row overhead dominated).
    rgbd = jnp.concatenate([rgb_t, depth_t[..., None]], axis=-1)  # (W, P, 4)
    rgbd_ext = jnp.concatenate([rgbd, jnp.zeros((1, p, 4), rgbd.dtype)], axis=0)
    out = untile_grid(rgbd_ext[src], 4)
    return out[..., 0:3], out[..., 3]


def texture_gather(textures: jax.Array, u: jax.Array, v: jax.Array) -> jax.Array:
    """Per-pixel bilinear texture lookup (the GLSL texture2D the reference's
    fragment shader performs, render_py_multi.py:40-52).

    textures: (B, TH, TW, 3); u, v: (B, H, W) texcoords in [0, 1] (v up, GL
    convention — matching mesh._sample_texture).  Returns (B, H, W, 3).
    """
    b, th, tw, _ = textures.shape
    up = jnp.clip(u, 0.0, 1.0) * (tw - 1)
    vp = (1.0 - jnp.clip(v, 0.0, 1.0)) * (th - 1)
    x0 = jnp.floor(up).astype(jnp.int32)
    y0 = jnp.floor(vp).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, tw - 1)
    y1 = jnp.minimum(y0 + 1, th - 1)
    fx = (up - x0)[..., None]
    fy = (vp - y0)[..., None]
    flat = textures.reshape(b, th * tw, 3)

    def pick(yy, xx):
        idx = (yy * tw + xx).reshape(b, -1)
        return jnp.take_along_axis(flat, idx[..., None], axis=1).reshape(u.shape + (3,))

    return (
        pick(y0, x0) * (1 - fx) * (1 - fy)
        + pick(y0, x1) * fx * (1 - fy)
        + pick(y1, x0) * (1 - fx) * fy
        + pick(y1, x1) * fx * fy
    )


@partial(jax.jit, static_argnames=("cfg",))
def rasterize_textured(
    vertices: jax.Array,
    uv: jax.Array,
    textures: jax.Array,
    faces: jax.Array,
    face_valid: jax.Array,
    poses: jax.Array,
    k: jax.Array,
    cfg: RasterConfig = RasterConfig(),
):
    """Batched render with exact per-fragment texture sampling.

    Runs the SAME tile pipeline but interpolates (u, v) perspective-correctly
    instead of RGB, then gathers the texture once per output pixel — i.e.
    true fragment-rate texture2D, the reference GL renderer's semantics.
    Costs one (B, H, W) 4-tap gather on top of the vertex-color path; use it
    when vertex-baked colors measurably deviate (high-frequency textures on
    coarse meshes — see tests/test_texture_fidelity.py for the bound).

    vertices: (B, V, 3); uv: (B, V, 2); textures: (B, TH, TW, 3);
    faces/face_valid/poses/k as in `rasterize`.
    Returns rgb (B, H, W, 3) in [0, 255] and depth (B, H, W).
    """
    uvz = jnp.concatenate([uv, jnp.zeros_like(uv[..., :1])], axis=-1)
    uv_img, depth = rasterize(vertices, uvz, faces, face_valid, poses, k, cfg)
    rgb = texture_gather(textures, uv_img[..., 0], uv_img[..., 1])
    hit = (depth > 0)[..., None]
    return jnp.where(hit, rgb, 0.0), depth


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
    rgb, depth = rasterize(
        vertices[None], colors[None], faces[None], face_valid[None], pose[None], k, cfg
    )
    return rgb[0], depth[0]


def render_mask(depth: jax.Array, thresh: float = 0.2) -> jax.Array:
    """Object mask from rendered depth (batch_updater_py_multi.py:261-265)."""
    return (depth > thresh).astype(depth.dtype)
