"""Pallas TPU kernel for the rasterizer's per-tile z-buffer + shading loop.

The XLA visibility pass (rasterizer._visibility_pass) runs a lockstep
while_loop across every (batch, active-tile) work item: each step processes
`chunk` faces for ALL tiles, so the trip count is the MAX binned face count.
This kernel instead runs one grid step per tile with the face loop bounded by
THAT tile's count (scalar-prefetched), with the z-buffer and color
accumulators resident in registers/VMEM — total work drops from
W x max(count) to sum(count) face-tile pairs, and there is no HBM traffic
between face chunks.

Per tile: the pre-gathered face records (K, 32) are DMA'd to VMEM by the
grid pipeline; a fori_loop over the tile's face count evaluates 3 edge
functions plus the 4 screen-space attribute planes (1/z and rgb/z, computed
in rasterizer._face_planes) over the tile's pixels and keeps the nearest
face's shaded color.

Record layout (32 lanes, float32):
  [0:6]  u0 v0 u1 v1 u2 v2   (screen corners)
  [6]    sign(area) * validity  (0 for padded/degenerate faces)
  [7]    min corner 1/z  (clamp bound — interpolated 1/z inside a triangle
         is bounded by its corners; clamping is exact and keeps float error
         on small faces out of the z-buffer)
  [8:11] q plane (a, b, c)
  [11:14] r*q plane
  [14:17] g*q plane
  [17:20] b*q plane
  [20]   max corner 1/z  (clamp bound)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REC_WIDTH = 32


def build_face_records(fu, fv, planes, valid, fq):
    """Per-face record table (N, 32) from corner coords + attribute planes.

    fu, fv, fq: (N, 3) screen corners and corner 1/z; planes: (N, 4, 3);
    valid: (N,) bool.
    """
    n = fu.shape[0]
    u0, u1, u2 = fu[:, 0], fu[:, 1], fu[:, 2]
    v0, v1, v2 = fv[:, 0], fv[:, 1], fv[:, 2]
    area = (u1 - u0) * (v2 - v0) - (v1 - v0) * (u2 - u0)
    s = jnp.where(valid & (jnp.abs(area) > 1e-12), jnp.sign(area), 0.0)
    cols = [
        u0, v0, u1, v1, u2, v2, s, jnp.min(fq, axis=1),
        planes[:, 0, 0], planes[:, 0, 1], planes[:, 0, 2],
        planes[:, 1, 0], planes[:, 1, 1], planes[:, 1, 2],
        planes[:, 2, 0], planes[:, 2, 1], planes[:, 2, 2],
        planes[:, 3, 0], planes[:, 3, 1], planes[:, 3, 2],
        jnp.max(fq, axis=1),
    ]
    rec = jnp.stack(cols, axis=1)  # (N, 21)
    return jnp.pad(rec, ((0, 0), (0, REC_WIDTH - rec.shape[1])))


def _tile_kernel(counts_ref, txy_ref, rec_ref, out_ref, *, tile_h, tile_w, sub, lanes):
    """One grid step = one tile.  rec_ref: (1, K, 32) VMEM; out_ref:
    (1, 4, P) [depth, r, g, b]."""
    w = pl.program_id(0)
    cnt = counts_ref[w]
    x0 = txy_ref[w, 0].astype(jnp.float32)
    y0 = txy_ref[w, 1].astype(jnp.float32)

    lin = (
        jax.lax.broadcasted_iota(jnp.int32, (sub, lanes), 0) * lanes
        + jax.lax.broadcasted_iota(jnp.int32, (sub, lanes), 1)
    )
    px = x0 + (lin % tile_w).astype(jnp.float32)
    py = y0 + (lin // tile_w).astype(jnp.float32)

    neg = jnp.full((sub, lanes), -1e30, jnp.float32)
    zero = jnp.zeros((sub, lanes), jnp.float32)

    def body(i, state):
        zq, dep, r, g, b = state
        def at(j):  # scalar read from the SMEM-resident record block
            return rec_ref[0, i, j]

        u0, v0, u1, v1, u2, v2 = at(0), at(1), at(2), at(3), at(4), at(5)
        s = at(6)
        e0 = ((u2 - u1) * (py - v1) - (v2 - v1) * (px - u1)) * s
        e1 = ((u0 - u2) * (py - v2) - (v0 - v2) * (px - u2)) * s
        e2 = ((u1 - u0) * (py - v0) - (v1 - v0) * (px - u0)) * s
        qi = jnp.clip(at(8) * px + at(9) * py + at(10), at(7), at(20))
        inside = (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & (s != 0)
        upd = inside & (qi > zq)
        inv_q = 1.0 / jnp.where(jnp.abs(qi) < 1e-12, 1e-12, qi)
        rr = (at(11) * px + at(12) * py + at(13)) * inv_q
        gg = (at(14) * px + at(15) * py + at(16)) * inv_q
        bb = (at(17) * px + at(18) * py + at(19)) * inv_q
        return (
            jnp.where(upd, qi, zq),
            jnp.where(upd, inv_q, dep),
            jnp.where(upd, rr, r),
            jnp.where(upd, gg, g),
            jnp.where(upd, bb, b),
        )

    zq, dep, r, g, b = jax.lax.fori_loop(0, cnt, body, (neg, zero, zero, zero, zero))
    p = sub * lanes
    out_ref[0, 0, :] = dep.reshape(p)
    out_ref[0, 1, :] = r.reshape(p)
    out_ref[0, 2, :] = g.reshape(p)
    out_ref[0, 3, :] = b.reshape(p)


def _csr_chunk_kernel(nh_ref, init_ref, row_ref, x0_ref, y0_ref, blk_ref, rec_ref, out_ref,
                      *, tile_h, tile_w, sub, lanes, ch):
    """One grid step = one CH-face chunk of one tile's CSR segment.

    Per-chunk scalar-prefetch arrays (1-D int32 — 2-D SMEM operands get
    lane-padded to 128 and blow the 1 MB SMEM budget): nh = faces in this
    chunk, init = 1 for the first chunk of its tile, row = output row
    (trash row for empty chunks), x0/y0 = tile pixel origin.
    rec_ref: (CH, 32) SMEM block (chunk s of the aligned record array).
    out_ref: (1, 5, P) accumulator rows [zq, depth, r, g, b] — consecutive
    chunks of one tile map to the same block, so it stays VMEM-resident and
    accumulates across the tile's chunks (flushed when the tile changes).
    """
    s = pl.program_id(0)
    n_here = nh_ref[s]
    x0 = x0_ref[s].astype(jnp.float32)
    y0 = y0_ref[s].astype(jnp.float32)

    lin = (
        jax.lax.broadcasted_iota(jnp.int32, (sub, lanes), 0) * lanes
        + jax.lax.broadcasted_iota(jnp.int32, (sub, lanes), 1)
    )
    px = x0 + (lin % tile_w).astype(jnp.float32)
    py = y0 + (lin // tile_w).astype(jnp.float32)
    p = sub * lanes

    @pl.when(init_ref[s] == 1)
    def _():
        out_ref[0, 0, :] = jnp.full((p,), -1e30, jnp.float32)
        out_ref[0, 1, :] = jnp.zeros((p,), jnp.float32)
        out_ref[0, 2, :] = jnp.zeros((p,), jnp.float32)
        out_ref[0, 3, :] = jnp.zeros((p,), jnp.float32)

    state0 = (
        out_ref[0, 0, :].reshape(sub, lanes),
        out_ref[0, 1, :].reshape(sub, lanes),
        out_ref[0, 2, :].reshape(sub, lanes),
        out_ref[0, 3, :].reshape(sub, lanes),
    )

    def body(i, state):
        # Accumulators stay in q-space (winner's interpolated 1/z and the
        # r*q / g*q / b*q plane values): the division by z happens ONCE per
        # output pixel after the kernel, not per candidate face.
        zq, r, g, b = state

        def at(j):
            return rec_ref[i, j]

        u0, v0, u1, v1, u2, v2 = at(0), at(1), at(2), at(3), at(4), at(5)
        sgn = at(6)
        e0 = ((u2 - u1) * (py - v1) - (v2 - v1) * (px - u1)) * sgn
        e1 = ((u0 - u2) * (py - v2) - (v0 - v2) * (px - u2)) * sgn
        e2 = ((u1 - u0) * (py - v0) - (v1 - v0) * (px - u0)) * sgn
        qi = jnp.clip(at(8) * px + at(9) * py + at(10), at(7), at(20))
        inside = (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & (sgn != 0)
        upd = inside & (qi > zq)
        rr = at(11) * px + at(12) * py + at(13)
        gg = at(14) * px + at(15) * py + at(16)
        bb = at(17) * px + at(18) * py + at(19)
        return (
            jnp.where(upd, qi, zq),
            jnp.where(upd, rr, r),
            jnp.where(upd, gg, g),
            jnp.where(upd, bb, b),
        )

    zq, r, g, b = jax.lax.fori_loop(0, n_here, body, state0)
    out_ref[0, 0, :] = zq.reshape(p)
    out_ref[0, 1, :] = r.reshape(p)
    out_ref[0, 2, :] = g.reshape(p)
    out_ref[0, 3, :] = b.reshape(p)


def pallas_csr_group(
    rec_group: jax.Array,   # (S_G * ch, 32) per-chunk face records, chunk-major
    nh_g: jax.Array,        # (S_G,) int32 faces in each chunk
    init_g: jax.Array,      # (S_G,) int32 1 = first chunk of its tile
    row_g: jax.Array,       # (S_G,) int32 output row (w_items = trash)
    x0_g: jax.Array,        # (S_G,) int32 tile pixel origin x
    y0_g: jax.Array,        # (S_G,) int32 tile pixel origin y
    w_items: int,
    tile_h: int,
    tile_w: int,
    ch: int = 128,
    interpret: bool = False,
):
    """One group of the CSR visibility+shading grid: a 1-D grid over S_G
    face chunks, accumulating z/q-space color into (w_items + 1, 4, P)
    output rows [zq, r*q, g*q, b*q] (row w_items = trash for empty chunks).

    The caller (rasterizer.rasterize) assembles the per-group record block,
    loops groups under lax.cond (groups past the real chunk count are
    skipped at RUNTIME — the static grid covers the worst-case pair budget,
    the executed work scales with the actual overlaps), and z-merges group
    outputs.  The SMEM window is (CH, 32) = 16 KB regardless of how full
    the densest tile is.
    """
    s_g = nh_g.shape[0]
    assert rec_group.shape[0] == s_g * ch, (rec_group.shape, s_g, ch)
    p = tile_h * tile_w
    assert p % 128 == 0
    sub = p // 128

    # Block index per chunk: identity for real chunks; junk-suffix chunks
    # repeat the previous block so the pipeline skips their SMEM DMAs.
    ids = jnp.arange(s_g, dtype=jnp.int32)
    last_real = jnp.maximum(jnp.max(jnp.where(nh_g > 0, ids, 0)), 0)
    blk_g = jnp.where(nh_g > 0, ids, last_real)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(s_g,),
        in_specs=[
            pl.BlockSpec(
                (ch, REC_WIDTH),
                lambda s, nh, ini, row, x0, y0, blk: (blk[s], 0),
                memory_space=pltpu.SMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 4, p),
            lambda s, nh, ini, row, x0, y0, blk, w=w_items: (jnp.minimum(row[s], w), 0, 0),
        ),
    )
    return pl.pallas_call(
        functools.partial(
            _csr_chunk_kernel, tile_h=tile_h, tile_w=tile_w, sub=sub, lanes=128, ch=ch
        ),
        out_shape=jax.ShapeDtypeStruct((w_items + 1, 4, p), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(nh_g, init_g, row_g, x0_g, y0_g, blk_g, rec_group)[:w_items]


@functools.partial(jax.jit, static_argnames=("tile_h", "tile_w", "interpret"))
def pallas_visibility_shade(
    records: jax.Array,   # (W, K, 32) per-tile face records
    counts: jax.Array,    # (W,) int32
    tile_xy: jax.Array,   # (W, 2) int32 pixel origin (x0, y0)
    tile_h: int,
    tile_w: int,
    interpret: bool = False,
):
    """Returns (depth (W, P), rgb (W, P, 3))."""
    w_items, k_cap, _ = records.shape
    p = tile_h * tile_w
    assert p % 128 == 0, "tile pixel count must be lane aligned"
    sub = p // 128

    # Per-grid-step SMEM bookkeeping scales with the grid size; keep each
    # pallas_call's grid at <= 512 tiles and chunk the work-item dimension.
    #
    # The caller sorts work items by binned face count (descending), so all
    # empty tiles form a contiguous suffix.  Empty steps alias their input
    # block to block 0 and their output block to a trash row (index n): the
    # pipeline skips the DMA when consecutive steps map to the same block, so
    # empty work items cost only grid iteration — the kernel's cost scales
    # with the number of *covered* tiles, not the static work-list budget.
    w_chunk = 512
    outs = []
    for start in range(0, w_items, w_chunk):
        end = min(start + w_chunk, w_items)
        n = end - start
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n,),
            in_specs=[
                pl.BlockSpec(
                    (1, k_cap, REC_WIDTH),
                    lambda w, c, t: (jnp.where(c[w] > 0, w, 0), 0, 0),
                    memory_space=pltpu.SMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 4, p), lambda w, c, t, n=n: (jnp.where(c[w] > 0, w, n), 0, 0)
            ),
        )
        outs.append(
            pl.pallas_call(
                functools.partial(
                    _tile_kernel, tile_h=tile_h, tile_w=tile_w, sub=sub, lanes=128
                ),
                out_shape=jax.ShapeDtypeStruct((n + 1, 4, p), jnp.float32),
                grid_spec=grid_spec,
                interpret=interpret,
            )(counts[start:end], tile_xy[start:end], records[start:end])[:n]
        )
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    depth = out[:, 0, :]
    rgb = jnp.moveaxis(out[:, 1:4, :], 1, 2)  # (W, P, 3)
    return depth, rgb
