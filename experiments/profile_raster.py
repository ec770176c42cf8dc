"""Stage-level timing of the rasterizer on the real chip (batch 64 @480x640,
bench scene).  Development diagnostic."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=20):
    import jax

    jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from functools import partial

    from __graft_entry__ import _build_scene
    from deepim_tpu.render import rasterizer as rz
    from deepim_tpu.render.pallas_raster import pallas_visibility_shade

    b, h, w = 64, 480, 640
    k_mat = np.array(
        [[572.4114, 0.0, 325.2611], [0.0, 573.57043, 242.04899], [0.0, 0.0, 1.0]],
        np.float32,
    )
    ecfg, bank_arrays, cls_idx, meshes, pose_gt, pose0, img, depth, mask = _build_scene(
        b, h, w, k_mat, num_iters=4
    )
    cfg = ecfg.raster
    kb = jnp.broadcast_to(jnp.asarray(k_mat), (b, 3, 3))
    vertices, colors, faces, face_valid = (
        meshes.vertices, meshes.colors, meshes.faces, meshes.face_valid,
    )
    pose0 = jnp.asarray(pose0)
    print(f"F={faces.shape[1]} V={vertices.shape[1]} tiles={cfg.num_tiles} "
          f"active={cfg.active_tiles} K={cfg.max_faces_per_tile} "
          f"tile={cfg.tile_h}x{cfg.tile_w}")

    t = cfg.num_tiles
    nf = faces.shape[1]
    p = cfg.tile_h * cfg.tile_w

    @jax.jit
    def stage_geom(pose):
        u, v, z = rz.project_vertices(vertices, pose, kb)
        fu = jnp.take_along_axis(u[:, :, None], faces, axis=1)
        fv = jnp.take_along_axis(v[:, :, None], faces, axis=1)
        fz = jnp.take_along_axis(z[:, :, None], faces, axis=1)
        in_range = jnp.all((fz > cfg.znear) & (fz < cfg.zfar), axis=2)
        valid = face_valid & in_range
        fq = 1.0 / jnp.where(jnp.abs(fz) < 1e-12, 1e-12, fz)
        fcol = jnp.take_along_axis(colors[:, :, None, :], faces[..., None], axis=1)
        return fu, fv, fq, fcol, valid

    t_geom = timeit(stage_geom, pose0)
    fu, fv, fq, fcol, valid = stage_geom(pose0)

    bin_j = jax.jit(lambda fu, fv, valid: rz._bin_batch(fu, fv, valid, cfg))
    t_bin = timeit(bin_j, fu, fv, valid)
    tile_faces, counts = bin_j(fu, fv, valid)

    a = cfg.active_tiles if cfg.active_tiles and cfg.active_tiles < t else t
    w_items = min(b * a, b * t)

    @jax.jit
    def stage_worklist(tile_faces, counts, fu, fv, fq, fcol, valid):
        fu_flat = fu.reshape(b * nf, 3)
        fv_flat = fv.reshape(b * nf, 3)
        fq_flat = fq.reshape(b * nf, 3)
        fcol_flat = fcol.reshape(b * nf, 3, 3)
        counts_flat = counts.reshape(b * t)
        cnt_top, flat_ids = jax.lax.top_k(counts_flat, w_items)
        tf_sel = tile_faces.reshape(b * t, cfg.max_faces_per_tile)[flat_ids]
        sample_of = flat_ids // t
        tile_of = flat_ids % t
        tf_global = jnp.where(tf_sel >= 0, tf_sel + (sample_of * nf)[:, None], -1)
        face_records = rz.build_face_records(
            fu_flat, fv_flat, fq_flat, fcol_flat, valid.reshape(b * nf)
        )
        tile_records = face_records[jnp.maximum(tf_global, 0)]
        tile_xy = jnp.stack(
            [(tile_of % cfg.tiles_x) * cfg.tile_w, (tile_of // cfg.tiles_x) * cfg.tile_h],
            axis=1,
        ).astype(jnp.int32)
        return tile_records, cnt_top.astype(jnp.int32), tile_xy, flat_ids

    t_work = timeit(stage_worklist, tile_faces, counts, fu, fv, fq, fcol, valid)
    tile_records, cnt_top, tile_xy, flat_ids = stage_worklist(
        tile_faces, counts, fu, fv, fq, fcol, valid
    )
    print(f"covered tiles = {int((np.asarray(cnt_top) > 0).sum())} / {w_items}, "
          f"sum counts = {int(np.asarray(cnt_top).sum())}, max = {int(np.asarray(cnt_top).max())}")

    kern = jax.jit(
        lambda r, c, xy: pallas_visibility_shade(r, c, xy, cfg.tile_h, cfg.tile_w)
    )
    t_kern = timeit(kern, tile_records, cnt_top, tile_xy)
    q_t, rgbq_t = kern(tile_records, cnt_top, tile_xy)
    qsafe = jnp.where(q_t > 0, q_t, 1.0)
    depth_t = jnp.where(q_t > 0, 1.0 / qsafe, 0.0)
    rgb_t = jnp.where((q_t > 0)[..., None], rgbq_t / qsafe[..., None], 0.0)

    @jax.jit
    def stage_untile(rgb_t, depth_t, cnt_top, flat_ids):
        def untile_grid(x, channels=None):
            ch = () if channels is None else (channels,)
            out = (
                x.reshape(b, cfg.tiles_y, cfg.tiles_x, cfg.tile_h, cfg.tile_w, *ch)
                .transpose(0, 1, 3, 2, 4, *(range(5, 5 + len(ch))))
                .reshape(b, cfg.tiles_y * cfg.tile_h, cfg.tiles_x * cfg.tile_w, *ch)
            )
            return out[:, : cfg.height, : cfg.width]

        w_items_n = cnt_top.shape[0]
        src = (
            jnp.full((b * t,), w_items_n, jnp.int32)
            .at[flat_ids]
            .set(
                jnp.where(cnt_top > 0, jnp.arange(w_items_n, dtype=jnp.int32), w_items_n),
                mode="drop",
            )
        )
        rgb_ext = jnp.concatenate([rgb_t, jnp.zeros((1, p, 3), rgb_t.dtype)], axis=0)
        depth_ext = jnp.concatenate([depth_t, jnp.zeros((1, p), depth_t.dtype)], axis=0)
        return untile_grid(rgb_ext[src], 3), untile_grid(depth_ext[src])

    t_untile = timeit(stage_untile, rgb_t, depth_t, cnt_top, flat_ids)

    full = jax.jit(partial(rz.rasterize, cfg=cfg))
    t_full = timeit(full, vertices, colors, faces, face_valid, pose0, jnp.asarray(k_mat))

    print(f"geom+gather  : {t_geom*1e3:7.2f} ms")
    print(f"binning      : {t_bin*1e3:7.2f} ms")
    print(f"worklist+rec : {t_work*1e3:7.2f} ms")
    print(f"pallas kernel: {t_kern*1e3:7.2f} ms")
    print(f"untile       : {t_untile*1e3:7.2f} ms")
    print(f"sum          : {(t_geom+t_bin+t_work+t_kern+t_untile)*1e3:7.2f} ms")
    print(f"full raster  : {t_full*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
