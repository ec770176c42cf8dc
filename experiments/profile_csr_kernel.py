"""Microbenchmark: the CSR z-buffer Pallas kernel in isolation, plus the
surrounding XLA stages, with realistic LINEMOD-scale shapes.

Usage: python experiments/profile_csr_kernel.py [--batch 8] [--detail 5]
"""
from __future__ import annotations

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def timeit(fn, *args, n=10):
    import jax

    jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--detail", type=int, default=5)
    ap.add_argument("--active", type=int, default=48)
    ap.add_argument("--n", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _build_scene
    from deepim_tpu.render import rasterizer as rz
    from deepim_tpu.render.pallas_raster import pallas_csr_group

    b, h, w = args.batch, 480, 640
    k_mat = np.array(
        [[572.4114, 0.0, 325.2611], [0.0, 573.57043, 242.04899], [0.0, 0.0, 1.0]],
        np.float32,
    )
    ecfg, bank_arrays, cls_idx, meshes, pose_gt, pose0, img, depth, mask = _build_scene(
        b, h, w, k_mat, num_iters=4, mesh_detail=args.detail, active_tiles=args.active,
    )
    cfg = ecfg.raster
    kb = jnp.broadcast_to(jnp.asarray(k_mat), (b, 3, 3))
    pose0 = jnp.asarray(pose0)
    nf = meshes.faces.shape[1]
    th, tw = cfg.csr_tile_h, cfg.csr_tile_w
    t_y, t_x = -(-h // th), -(-w // tw)
    t = t_y * t_x
    p = th * tw
    ch = cfg.csr_chunk

    @jax.jit
    def stage_project_records(pose):
        u, v, z = rz.project_vertices(meshes.corners.reshape(b, nf * 3, 3), pose, kb)
        fu = u.reshape(b, nf, 3)
        fv = v.reshape(b, nf, 3)
        fz = z.reshape(b, nf, 3)
        in_range = jnp.all((fz > cfg.znear) & (fz < cfg.zfar), axis=2)
        area = (
            (fu[..., 1] - fu[..., 0]) * (fv[..., 2] - fv[..., 0])
            - (fv[..., 1] - fv[..., 0]) * (fu[..., 2] - fu[..., 0])
        )
        valid = meshes.face_valid & in_range & (jnp.abs(area) > 1e-6)
        if cfg.backface_cull:
            valid = valid & (area * cfg.backface_cull > 0)
        fq = 1.0 / jnp.where(jnp.abs(fz) < 1e-12, 1e-12, fz)
        records = rz.build_face_records(
            fu.reshape(-1, 3), fv.reshape(-1, 3), fq.reshape(-1, 3),
            meshes.corner_colors.reshape(-1, 3, 3), valid.reshape(-1),
        )
        return fu, fv, valid, records

    print(f"project+records: {timeit(stage_project_records, pose0, n=args.n)*1e3:8.2f} ms")
    fu, fv, valid, records = stage_project_records(pose0)

    bin_j = jax.jit(lambda fu, fv, valid: jax.vmap(
        partial(rz.bin_faces_csr, cfg=cfg, th=th, tw=tw))(fu, fv, valid))
    print(f"bin_csr(fine): {timeit(bin_j, fu, fv, valid, n=args.n)*1e3:8.2f} ms")
    sorted_face, offsets, counts, dropped = bin_j(fu, fv, valid)

    a = min(-(-cfg.active_tiles * cfg.tile_h * cfg.tile_w // p), t) if cfg.active_tiles else t
    w_items = b * a
    n_pairs = sorted_face.shape[1]

    @jax.jit
    def stage_meta(sorted_face, offsets, counts):
        counts_flat = counts.reshape(b * t)
        cnt_top, flat_ids = jax.lax.top_k(counts_flat, w_items)
        sample_of = flat_ids // t
        tile_of = flat_ids % t
        cnt = cnt_top.astype(jnp.int32)
        seg_off = offsets.reshape(b * t)[flat_ids]
        chunks_w = (cnt + ch - 1) // ch
        chunk_csum = jnp.cumsum(chunks_w)
        s_total = (b * n_pairs) // ch + w_items
        group = min(cfg.csr_group, s_total)
        n_groups = -(-s_total // group)
        s_total = n_groups * group
        w_of_s = jnp.minimum(rz._run_length_decode(chunk_csum, s_total), w_items - 1)
        return cnt_top, flat_ids, sample_of, tile_of, cnt, seg_off, chunks_w, chunk_csum, w_of_s

    print(f"meta(topk+decode): {timeit(stage_meta, sorted_face, offsets, counts, n=args.n)*1e3:8.2f} ms")
    cnt_top, flat_ids, sample_of, tile_of, cnt, seg_off, chunks_w, chunk_csum, w_of_s = (
        stage_meta(sorted_face, offsets, counts)
    )
    total_chunks = int(np.asarray(chunk_csum)[-1])
    group = min(cfg.csr_group, (b * n_pairs) // ch + w_items)
    print(f"  w_items={w_items} covered={(np.asarray(cnt_top) > 0).sum()} "
          f"real_chunks={total_chunks} group={group} "
          f"sum_pairs={int(np.asarray(cnt_top).sum())} max_cnt={int(np.asarray(cnt_top).max())}")

    # Group-0 inputs, exactly as rasterize builds them.
    @jax.jit
    def stage_group0_inputs(w_of_s, chunk_csum, chunks_w, cnt, seg_off, sample_of, tile_of, sorted_face, records):
        s_ids_g = jnp.arange(group, dtype=jnp.int32)
        w_g = w_of_s[:group]
        c_of_s = s_ids_g - (chunk_csum[w_g] - chunks_w[w_g])
        nh_g = jnp.clip(cnt[w_g] - c_of_s * ch, 0, ch)
        init_g = (c_of_s == 0).astype(jnp.int32).at[0].set(1)
        w_next = jnp.roll(w_g, -1)
        nh_next = jnp.roll(nh_g, -1)
        fin_g = ((nh_g > 0) & ((w_next != w_g) | (nh_next == 0)))
        fin_g = fin_g.at[group - 1].set(nh_g[group - 1] > 0).astype(jnp.int32)
        row_g = jnp.where(nh_g > 0, w_g, w_items)
        x0_g = (tile_of[w_g] % t_x) * tw
        y0_g = (tile_of[w_g] // t_x) * th
        sff = jnp.concatenate([sorted_face.reshape(b * n_pairs), jnp.full((ch,), nf, jnp.int32)])
        start_g = sample_of[w_g] * n_pairs + seg_off[w_g] + c_of_s * ch
        sf = jax.vmap(lambda st: jax.lax.dynamic_slice(sff, (st,), (ch,)))(start_g)
        fg = (sample_of[w_g] * nf)[:, None] + jnp.minimum(sf, nf - 1)
        rec = records[fg.reshape(-1)]
        return rec, nh_g, init_g, fin_g, row_g, x0_g, y0_g

    print(f"group0 inputs(gather): {timeit(stage_group0_inputs, w_of_s, chunk_csum, chunks_w, cnt, seg_off, sample_of, tile_of, sorted_face, records, n=args.n)*1e3:8.2f} ms")
    rec, nh_g, init_g, fin_g, row_g, x0_g, y0_g = stage_group0_inputs(
        w_of_s, chunk_csum, chunks_w, cnt, seg_off, sample_of, tile_of, sorted_face, records
    )

    kern = jax.jit(lambda rec, nh, ini, fin, row, x0, y0: pallas_csr_group(
        rec, nh, ini, fin, row, x0, y0, w_items, th, tw, ch=ch))
    print(f"kernel(group0, in-kernel merge): {timeit(kern, rec, nh_g, init_g, fin_g, row_g, x0_g, y0_g, n=args.n)*1e3:8.2f} ms")
    out = kern(rec, nh_g, init_g, fin_g, row_g, x0_g, y0_g)

    # --- isolation: what does a row gather actually cost on this chip? ---
    n_rows = records.shape[0]
    idx1m = jnp.asarray(np.random.RandomState(0).randint(0, n_rows, group * ch), jnp.int32)
    g_rec = jax.jit(lambda idx: records[idx])
    print(f"pure gather {group*ch} rows x128B: {timeit(g_rec, idx1m, n=args.n)*1e3:8.2f} ms")
    rec15 = records[:, :16]
    g_rec15 = jax.jit(lambda idx: rec15[idx])
    print(f"pure gather {group*ch} rows x64B: {timeit(g_rec15, idx1m, n=args.n)*1e3:8.2f} ms")
    sff = jnp.concatenate([sorted_face.reshape(b * n_pairs), jnp.full((ch,), nf, jnp.int32)])
    starts = jnp.asarray(np.random.RandomState(1).randint(0, b * n_pairs - ch, group), jnp.int32)
    g_sl = jax.jit(lambda st: jax.vmap(
        lambda s: jax.lax.dynamic_slice(sff, (s,), (ch,)))(st))
    print(f"vmapped dynamic_slice x{group}: {timeit(g_sl, starts, n=args.n)*1e3:8.2f} ms")

    full = jax.jit(lambda pose: rz.rasterize(
        meshes.vertices, meshes.colors, meshes.faces, meshes.face_valid, pose,
        jnp.asarray(k_mat), cfg,
        corners=meshes.corners, corner_colors=meshes.corner_colors))
    print(f"FULL rasterize: {timeit(full, pose0, n=args.n)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
