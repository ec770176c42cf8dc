"""Pallas TPU kernels for the rasterizer's per-tile z-buffer + shading loop.

The XLA visibility pass (rasterizer._visibility_pass) runs a lockstep
while_loop across every (batch, active-tile) work item: each step processes
`chunk` faces for ALL tiles, so the trip count is the MAX binned face count.
These kernels instead bound the face loop by each tile's own count
(scalar-prefetched), with the z-buffer and color accumulators resident in
registers/VMEM — total work drops from W x max(count) to sum(count)
face-tile pairs, and there is no HBM traffic between face chunks.

Both kernels accumulate shading IN q-SPACE (the winner's interpolated 1/z
and its r*q / g*q / b*q plane values): the division by z happens once per
output pixel after the kernel.  A deferred-shading variant (z + face id
only, shade from a gathered record row per pixel) was measured and
rejected: TPU row gathers cost ~12 ns/row regardless of width, so shading
W*P pixels through a gather costs more than evaluating 3 attribute planes
per candidate face inside the kernel.

Face-record layout (32 lanes, float32; built by
rasterizer.build_face_records, shared with the XLA path):

  [0]  u0   [1] v0      anchor = screen corner 0.  All planes are evaluated
                        as a*dx + b*dy + c with dx = px-u0, dy = py-v0:
                        anchored evaluation keeps the FMA terms O(tile+bbox)
                        instead of O(coord^2), which direct plane constants
                        would need (catastrophic cancellation at 640px).
  [2:5]  A0 B0 ar       edge 1->2 (opposite corner 0): e0 = A0 dx + B0 dy + ar,
                        ar = |area| (sign-folded); ar = -1e30 for invalid
                        faces so e0 < 0 everywhere.
  [5:7]  A1 B1          edge 2->0: e1 = A1 dx + B1 dy  (anchor lies ON it)
  [7:9]  A2 B2          edge 0->1: e2 = A2 dx + B2 dy
  [9:12] Qa Qb q0       interpolated 1/z plane: qi = Qa dx + Qb dy + q0
  [12]   qmin  [13] qmax   corner 1/z bounds — interpolated 1/z inside a
                        triangle is bounded by its corners; clamping is
                        exact and keeps float error on small faces out of
                        the z-buffer
  [14]   fid            global face index as f32 (exact: < 2^24)
  [15]   pad
  [16:19] / [19:22] / [22:25]  r*q / g*q / b*q attribute planes (a, b, c0)
  [25:32] pad

A pixel is inside iff min(e0, e1, e2) >= 0 (inclusive edges, no backface
culling — GL default, render_py_multi.py:89-93).  The z-test is strict
(qi > best): faces are processed in draw order within a tile (ascending
face id, both in the dense tile lists and within each CSR slot), so exact
z-ties (shared edges of adjacent coplanar faces interpolate identical 1/z)
resolve to the earliest-drawn face, matching GL.  The CSR kernel's 8 slots
interleave draw order, so the winning face id is carried per slot and the
cross-slot/cross-group merges use the lexicographic (qi, -fid) comparator,
which restores the exact draw-order tie rule.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REC_WIDTH = 32
_NEG = -1e30
_BIG = 1e30


def _tile_kernel(counts_ref, txy_ref, rec_ref, out_ref, *, tile_h, tile_w, sub, lanes):
    """Dense path: one grid step = one tile, fori over the tile's face
    count, one face per step over the full tile.  rec_ref: (1, K, 32) SMEM;
    out_ref: (1, 4, P) [zq, r*q, g*q, b*q]."""
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

    def body(i, state):
        zq, r, g, b = state

        def at(j):  # scalar read from the SMEM-resident record block
            return rec_ref[0, i, j]

        dx = px - at(0)
        dy = py - at(1)
        e0 = at(2) * dx + at(3) * dy + at(4)
        e1 = at(5) * dx + at(6) * dy
        e2 = at(7) * dx + at(8) * dy
        inside = jnp.minimum(e0, jnp.minimum(e1, e2)) >= 0
        qi = jnp.clip(at(9) * dx + at(10) * dy + at(11), at(12), at(13))
        # Strict z-test: faces arrive in draw order, so ties keep the first.
        upd = inside & (qi > zq)
        rr = at(16) * dx + at(17) * dy + at(18)
        gg = at(19) * dx + at(20) * dy + at(21)
        bb = at(22) * dx + at(23) * dy + at(24)
        return (
            jnp.where(upd, qi, zq),
            jnp.where(upd, rr, r),
            jnp.where(upd, gg, g),
            jnp.where(upd, bb, b),
        )

    neg = jnp.full((sub, lanes), _NEG, jnp.float32)
    zero = jnp.zeros((sub, lanes), jnp.float32)
    zq, r, g, b = jax.lax.fori_loop(0, cnt, body, (neg, zero, zero, zero))
    p = sub * lanes
    out_ref[0, 0, :] = zq.reshape(p)
    out_ref[0, 1, :] = r.reshape(p)
    out_ref[0, 2, :] = g.reshape(p)
    out_ref[0, 3, :] = b.reshape(p)


def _csr_chunk_kernel(nh_ref, init_ref, fin_ref, row_ref, x0_ref, y0_ref, blk_ref,
                      rec_ref, out_ref, acc_ref,
                      *, tile_h, tile_w, sub, lanes, ch):
    """CSR path: one grid step = one CH-face chunk of one tile's segment,
    EIGHT faces per unrolled step packed across sublanes x the tile's 128
    pixels — a (8, 128) f32 vreg does 8 face-pixel-block evaluations per
    instruction instead of broadcasting one face over a whole 1024-px tile
    (the scalar-loop formulation wastes >99% of its lanes on faces that
    cover a few pixels; with 128-px fine tiles + sublane packing the same
    vreg budget covers 8 faces).  The step loop is statically unrolled
    (ch/8 steps) with a per-step liveness mask — no fori bookkeeping.

    Per-chunk scalar-prefetch arrays (1-D int32): nh = faces in this chunk,
    init = 1 for the first chunk of its tile, fin = 1 for the last chunk of
    its tile within this group, row = output row (only read on fin chunks;
    trash row otherwise), x0/y0 = tile pixel origin.
    rec_ref: (CH, 32) VMEM block (vector slices, NOT scalar reads).
    acc_ref: (40, P) VMEM scratch, persistent across the sequential grid —
    rows [0:8] per-slot zq, [8:16] per-slot winning fid, [16:24]/[24:32]/
    [32:40] per-slot r*q/g*q/b*q.  Slot s holds the z-winner among faces
    s, s+8, s+16, ... of the tile's segment.
    out_ref: (1, 8, P) — on a fin chunk the 8 slots are tree-merged
    IN-KERNEL with the (qi, -fid) comparator (which restores exact
    draw-order tie handling) and rows [qi, fid, r*q, g*q, b*q, 0, 0, 0]
    are emitted; non-fin chunks flush garbage to the caller's trash row.
    Merging here (vs a separate XLA pass over (W, 40, P)) writes 5x less
    kernel output to HBM and deletes a full read-modify-write pass.
    """
    s = pl.program_id(0)
    n_here = nh_ref[s]
    x0 = x0_ref[s].astype(jnp.float32)
    y0 = y0_ref[s].astype(jnp.float32)

    assert sub == 8 and tile_h * tile_w == lanes == 128
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
    px = x0 + (lin % tile_w).astype(jnp.float32)   # (1, P) broadcasts over slots
    py = y0 + (lin // tile_w).astype(jnp.float32)
    slot = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

    @pl.when(init_ref[s] == 1)
    def _():
        acc_ref[0:8, :] = jnp.full((8, lanes), _NEG, jnp.float32)
        acc_ref[8:16, :] = jnp.full((8, lanes), _BIG, jnp.float32)
        acc_ref[16:40, :] = jnp.zeros((24, lanes), jnp.float32)

    # Junk chunks (group padding past the frame's real chunk count) carry
    # n_here = 0: predicate the whole unrolled loop off so they cost only
    # the grid step, not 16 masked vector passes.
    @pl.when(n_here > 0)
    def _():
        zq = acc_ref[0:8, :]
        fb = acc_ref[8:16, :]
        r = acc_ref[16:24, :]
        g = acc_ref[24:32, :]
        b = acc_ref[32:40, :]

        for i in range(ch // 8):
            rec8 = rec_ref[i * 8:(i + 1) * 8, :]  # (8, 32): 8 faces, static slice

            def at(j, rec8=rec8):  # (8, 1) lane, broadcasts against (1, P)
                return rec8[:, j:j + 1]

            live = (i * 8 + slot) < n_here  # mask the ragged last step
            dx = px - at(0)  # (8, P)
            dy = py - at(1)
            e0 = at(2) * dx + at(3) * dy + at(4)
            e1 = at(5) * dx + at(6) * dy
            e2 = at(7) * dx + at(8) * dy
            inside = (jnp.minimum(e0, jnp.minimum(e1, e2)) >= 0) & live
            qi = jnp.clip(at(9) * dx + at(10) * dy + at(11), at(12), at(13))
            # Strict z-test: within a slot faces arrive in draw order, so
            # ties keep the first; cross-slot ties are resolved by the
            # merge's fid comparator.
            upd = inside & (qi > zq)
            f = jnp.broadcast_to(at(14), zq.shape)
            rr = at(16) * dx + at(17) * dy + at(18)
            gg = at(19) * dx + at(20) * dy + at(21)
            bb = at(22) * dx + at(23) * dy + at(24)
            zq = jnp.where(upd, qi, zq)
            fb = jnp.where(upd, f, fb)
            r = jnp.where(upd, rr, r)
            g = jnp.where(upd, gg, g)
            b = jnp.where(upd, bb, b)

        acc_ref[0:8, :] = zq
        acc_ref[8:16, :] = fb
        acc_ref[16:24, :] = r
        acc_ref[24:32, :] = g
        acc_ref[32:40, :] = b

    # Final chunk of this tile (within this group): tree-merge the 8 slots
    # by (max qi, then min fid) — associative, so 3 halving passes — and
    # emit the merged row.
    @pl.when(fin_ref[s] == 1)
    def _():
        q = acc_ref[0:8, :]
        f = acc_ref[8:16, :]
        r = acc_ref[16:24, :]
        g = acc_ref[24:32, :]
        b = acc_ref[32:40, :]
        n = 8
        while n > 1:
            h = n // 2
            qa, qb = q[:h], q[h:n]
            fa, fb_ = f[:h], f[h:n]
            upd = (qb > qa) | ((qb == qa) & (fb_ < fa))
            q = jnp.where(upd, qb, qa)
            f = jnp.where(upd, fb_, fa)
            r = jnp.where(upd, r[h:n], r[:h])
            g = jnp.where(upd, g[h:n], g[:h])
            b = jnp.where(upd, b[h:n], b[:h])
            n = h
        out_ref[0, 0:1, :] = q
        out_ref[0, 1:2, :] = f
        out_ref[0, 2:3, :] = r
        out_ref[0, 3:4, :] = g
        out_ref[0, 4:5, :] = b
        out_ref[0, 5:8, :] = jnp.zeros((3, lanes), jnp.float32)


RAW_WIDTH = 32  # raw corner-pack row width (planes64 kernel), lane layout below


def _csr_planes_kernel(nh_ref, init_ref, fin_ref, row_ref, x0_ref, y0_ref, blk_ref,
                       raw_ref, out_ref, acc_ref, *, tile_h, tile_w, lanes, ch):
    """planes64 CSR path: one grid step = one CH-face chunk; ALL CH faces of
    the chunk are evaluated together as (CH, 128) column-broadcast FMAs and
    reduced to the tile's single best fragment by a log2(CH) lexicographic
    (qi, -fid) tournament, then lex-merged into a (8, P) accumulator.

    Unlike the slots8 kernel this variant consumes RAW projected corners and
    derives the edge/attribute planes in-kernel per chunk ((CH, 1) column
    math, negligible next to the (CH, 128) evaluation): the caller skips the
    25-column record-table build entirely — at LINEMOD scale that XLA-side
    relayout (build_face_records' stack) costs more than the whole z-kernel.
    Formulas are IDENTICAL to build_face_records (rasterizer.py), so the
    output matches the XLA pipeline within f32 fma-reassociation noise.

    raw_ref: (CH, 32) f32 VMEM block of the raw pack
      [0:3] corner u, [3:6] corner v, [6:9] corner 1/z,
      [9:18] corner colors (corner-major: c0 rgb, c1 rgb, c2 rgb),
      [18] global face id (f32, exact < 2^24), [19] validity flag,
      [20:32] pad.
    acc_ref: (8, P) persistent scratch — rows [zq, fid, r*q, g*q, b*q, pad].
    out_ref: (1, 8, P): fin chunks emit [qi, fid, r*q, g*q, b*q, 0, 0, 0] —
    the same contract as the slots8 kernel, so the caller's cross-group
    merge is shared.
    """
    s = pl.program_id(0)
    n_here = nh_ref[s]
    x0 = x0_ref[s].astype(jnp.float32)
    y0 = y0_ref[s].astype(jnp.float32)
    assert tile_h * tile_w == lanes == 128

    lin = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
    px = x0 + (lin % tile_w).astype(jnp.float32)   # (1, P)
    py = y0 + (lin // tile_w).astype(jnp.float32)

    @pl.when(init_ref[s] == 1)
    def _():
        acc_ref[0:1, :] = jnp.full((1, lanes), _NEG, jnp.float32)
        acc_ref[1:2, :] = jnp.full((1, lanes), _BIG, jnp.float32)
        acc_ref[2:8, :] = jnp.zeros((6, lanes), jnp.float32)

    @pl.when(n_here > 0)
    def _():
        raw = raw_ref[:]  # (CH, 32)

        def col(j):  # (CH, 1) face-column, broadcasts against (1, P)
            return raw[:, j:j + 1]

        u0, u1, u2 = col(0), col(1), col(2)
        v0, v1, v2 = col(3), col(4), col(5)
        q0, q1, q2 = col(6), col(7), col(8)
        # --- per-face plane derivation ((CH, 1) ops) — build_face_records'
        # exact formulas (rasterizer.py) ---
        area = (u1 - u0) * (v2 - v0) - (v1 - v0) * (u2 - u0)
        okf = (col(19) > 0) & (jnp.abs(area) > 1e-12)
        sgn = jnp.where(okf, jnp.sign(area), 0.0)
        ar = jnp.where(okf, jnp.abs(area), _NEG)
        inv = 1.0 / jnp.where(okf, area, 1.0)
        a0, b0 = -(v2 - v1) * sgn, (u2 - u1) * sgn
        a1, b1 = -(v0 - v2) * sgn, (u0 - u2) * sgn
        a2, b2 = -(v1 - v0) * sgn, (u1 - u0) * sgn

        def attr_plane(w0, w1, w2):
            d1, d2 = w1 - w0, w2 - w0
            a = (d1 * (v2 - v0) - d2 * (v1 - v0)) * inv
            b = (d2 * (u1 - u0) - d1 * (u2 - u0)) * inv
            return a, b, w0

        qa, qb, _ = attr_plane(q0, q1, q2)
        qlo = jnp.minimum(q0, jnp.minimum(q1, q2))
        qhi = jnp.maximum(q0, jnp.maximum(q1, q2))
        fidc = col(18)
        live = (
            jax.lax.broadcasted_iota(jnp.int32, (ch, 1), 0) < n_here
        )

        # --- (CH, P) evaluation ---
        dx = px - u0
        dy = py - v0
        e0 = a0 * dx + b0 * dy + ar
        e1 = a1 * dx + b1 * dy
        e2 = a2 * dx + b2 * dy
        inside = (jnp.minimum(e0, jnp.minimum(e1, e2)) >= 0) & live
        qi = jnp.clip(qa * dx + qb * dy + q0, qlo, qhi)
        q = jnp.where(inside, qi, _NEG)
        f = jnp.broadcast_to(fidc, (ch, lanes))
        rgb = []
        for c in range(3):
            ca, cb, c0 = attr_plane(
                col(9 + c) * q0, col(12 + c) * q1, col(15 + c) * q2
            )
            rgb.append(ca * dx + cb * dy + c0)
        r, g, b = rgb

        # --- lexicographic (max qi, min fid) tournament: log2 halvings.
        # CH need not be a power of two (the default chunk is 192); pad the
        # candidate rows to the next power of two with miss lanes
        # (q = _NEG, fid = _BIG) — the merge's (q > _NEG) hit gate keeps
        # them out of the accumulator.  Static Python, free when CH is
        # already a power of two. ---
        n = ch
        pow2 = 1 << (n - 1).bit_length()
        if pow2 != n:
            pad = pow2 - n
            q = jnp.concatenate([q, jnp.full((pad, lanes), _NEG, jnp.float32)], 0)
            f = jnp.concatenate([f, jnp.full((pad, lanes), _BIG, jnp.float32)], 0)
            r = jnp.concatenate([r, jnp.zeros((pad, lanes), jnp.float32)], 0)
            g = jnp.concatenate([g, jnp.zeros((pad, lanes), jnp.float32)], 0)
            b = jnp.concatenate([b, jnp.zeros((pad, lanes), jnp.float32)], 0)
            n = pow2
        while n > 1:
            h = n // 2
            qa_, qb_ = q[:h], q[h:n]
            fa_, fb_ = f[:h], f[h:n]
            upd = (qb_ > qa_) | ((qb_ == qa_) & (fb_ < fa_))
            q = jnp.where(upd, qb_, qa_)
            f = jnp.where(upd, fb_, fa_)
            r = jnp.where(upd, r[h:n], r[:h])
            g = jnp.where(upd, g[h:n], g[:h])
            b = jnp.where(upd, b[h:n], b[:h])
            n = h

        # --- merge the chunk winner into the accumulator ---
        # The tie clause requires a REAL hit (q > _NEG): without it, a pixel
        # no face covers would merge q == zq == _NEG with f < fz(_BIG) and
        # leave a phantom face id + extrapolated rgb in the accumulator.
        # The caller masks by zq > 0 so rgb/depth were safe either way, but
        # the fid lane contract now matches slots8 (miss => fid stays _BIG).
        zq = acc_ref[0:1, :]
        fz = acc_ref[1:2, :]
        upd = (q > zq) | ((q == zq) & (q > _NEG) & (f < fz))
        acc_ref[0:1, :] = jnp.where(upd, q, zq)
        acc_ref[1:2, :] = jnp.where(upd, f, fz)
        acc_ref[2:3, :] = jnp.where(upd, r, acc_ref[2:3, :])
        acc_ref[3:4, :] = jnp.where(upd, g, acc_ref[3:4, :])
        acc_ref[4:5, :] = jnp.where(upd, b, acc_ref[4:5, :])

    @pl.when(fin_ref[s] == 1)
    def _():
        out_ref[0, 0:5, :] = acc_ref[0:5, :]
        out_ref[0, 5:8, :] = jnp.zeros((3, lanes), jnp.float32)


def pallas_csr_group(
    rec_group: jax.Array,   # (S_G * ch, 32) per-chunk face records, chunk-major
    nh_g: jax.Array,        # (S_G,) int32 faces in each chunk
    init_g: jax.Array,      # (S_G,) int32 1 = first chunk of its tile
    fin_g: jax.Array,       # (S_G,) int32 1 = last chunk of its tile (in group)
    row_g: jax.Array,       # (S_G,) int32 output row (w_items = trash)
    x0_g: jax.Array,        # (S_G,) int32 tile pixel origin x
    y0_g: jax.Array,        # (S_G,) int32 tile pixel origin y
    w_items: int,
    tile_h: int,
    tile_w: int,
    ch: int = 128,
    interpret: bool = False,
    kernel: str = "slots8",
):
    """One group of the CSR z-buffer grid: a 1-D grid over S_G face chunks,
    accumulating per-slot (zq, fid, rgb*q) in persistent VMEM scratch and
    emitting slot-MERGED rows [qi, fid, r*q, g*q, b*q, 0, 0, 0] into the
    (w_items + 1, 8, P) output on each tile's final chunk (row w_items =
    trash for non-final/empty chunks).

    The caller (rasterizer.rasterize) assembles the per-group record block,
    scans groups under lax.cond (groups past the real chunk count are
    skipped at RUNTIME — the static grid covers the worst-case pair budget,
    the executed work scales with the actual overlaps), and z-merges group
    outputs with the same (qi, -fid) comparator (exact for tiles split
    across groups: the caller forces fin on each group's last chunk and
    init on the next group's first).
    """
    s_g = nh_g.shape[0]
    assert rec_group.shape[0] == s_g * ch, (rec_group.shape, s_g, ch)
    assert ch % 8 == 0, ch
    p = tile_h * tile_w
    assert p == 128, "csr tile must be exactly one 128-lane pixel block"

    # Block index per chunk: identity for real chunks; junk-suffix chunks
    # repeat the previous block so the pipeline skips their DMAs.
    ids = jnp.arange(s_g, dtype=jnp.int32)
    last_real = jnp.maximum(jnp.max(jnp.where(nh_g > 0, ids, 0)), 0)
    blk_g = jnp.where(nh_g > 0, ids, last_real)
    if kernel == "planes64":
        kern = functools.partial(
            _csr_planes_kernel, tile_h=tile_h, tile_w=tile_w, lanes=p, ch=ch
        )
        scratch = pltpu.VMEM((8, p), jnp.float32)
    else:
        kern = functools.partial(
            _csr_chunk_kernel, tile_h=tile_h, tile_w=tile_w, sub=8, lanes=p, ch=ch
        )
        scratch = pltpu.VMEM((40, p), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(s_g,),
        in_specs=[
            pl.BlockSpec(
                (ch, REC_WIDTH),
                lambda s, nh, ini, fin, row, x0, y0, blk: (blk[s], 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, p),
            lambda s, nh, ini, fin, row, x0, y0, blk, w=w_items: (
                jnp.where(fin[s] == 1, jnp.minimum(row[s], w), w), 0, 0
            ),
        ),
        scratch_shapes=[scratch],
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((w_items + 1, 8, p), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(nh_g, init_g, fin_g, row_g, x0_g, y0_g, blk_g, rec_group)[:w_items]


@functools.partial(jax.jit, static_argnames=("tile_h", "tile_w", "interpret"))
def pallas_visibility_shade(
    records: jax.Array,   # (W, K, 32) per-tile face records
    counts: jax.Array,    # (W,) int32
    tile_xy: jax.Array,   # (W, 2) int32 pixel origin (x0, y0)
    tile_h: int,
    tile_w: int,
    interpret: bool = False,
):
    """Dense path: returns (best_q (W, P), rgbq (W, P, 3) q-space colors)."""
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
    best_q = out[:, 0, :]
    rgbq = jnp.moveaxis(out[:, 1:4, :], 1, 2)  # (W, P, 3)
    return best_q, rgbq
