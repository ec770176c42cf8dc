"""Rasterizer + full-refine timing at LINEMOD-scale mesh density.

Usage: python experiments/profile_dense.py [--detail 4] [--batch 64]
       [--k 1024] [--active 64] [--full]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "repo") if False else os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    ap.add_argument("--detail", type=int, default=4)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--k", type=int, default=1024)
    ap.add_argument("--active", type=int, default=64)
    ap.add_argument("--full", action="store_true", help="also time the 4-iter refine")
    ap.add_argument("--n", type=int, default=10)
    ap.add_argument("--stages", action="store_true")
    args = ap.parse_args()
    if args.stages:
        stage_profile(args)
        return

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _build_scene
    from deepim_tpu.engine import Observation, refine
    from deepim_tpu.engine.refine import render_at_pose
    from deepim_tpu.models import FlowNetDeepIM
    from deepim_tpu.ops.masks import box_fill
    from deepim_tpu.render import rasterizer as rz

    b, h, w = args.batch, 480, 640
    k_mat = np.array(
        [[572.4114, 0.0, 325.2611], [0.0, 573.57043, 242.04899], [0.0, 0.0, 1.0]],
        np.float32,
    )
    ecfg, bank_arrays, cls_idx, meshes, pose_gt, pose0, img, depth, mask = _build_scene(
        b, h, w, k_mat, num_iters=4, mesh_detail=args.detail,
        max_faces_per_tile=args.k, active_tiles=args.active,
    )
    cfg = ecfg.raster
    print(f"backend={jax.default_backend()} F={meshes.faces.shape[1]} "
          f"V={meshes.vertices.shape[1]} tiles={cfg.num_tiles} K={cfg.max_faces_per_tile} "
          f"active={cfg.active_tiles} batch={b}")

    raster = jax.jit(lambda p: rz.rasterize(
        meshes.vertices, meshes.colors, meshes.faces, meshes.face_valid, p,
        jnp.asarray(k_mat), cfg))
    pose0j = jnp.asarray(pose0)
    t = timeit(raster, pose0j, n=args.n)
    print(f"rasterize: {t*1e3:8.2f} ms  ({b/t:9.1f} renders/s)")

    # Binned-count stats (how full the tile lists are).
    u, v, z = rz.project_vertices(meshes.vertices, pose0j, jnp.broadcast_to(jnp.asarray(k_mat), (b, 3, 3)))
    fu = jnp.take_along_axis(u[:, :, None], meshes.faces, axis=1)
    fv = jnp.take_along_axis(v[:, :, None], meshes.faces, axis=1)
    _, counts = rz._bin_batch(fu, fv, meshes.face_valid, cfg)
    c = np.asarray(counts)
    nz = c[c > 0]
    print(f"binned counts: covered tiles/sample={(c > 0).sum() / b:.1f}, "
          f"mean={nz.mean():.1f}, p95={np.percentile(nz, 95):.0f}, max={nz.max()}, "
          f"clipped_at_K={(c >= cfg.max_faces_per_tile).sum()}")

    if args.full:
        full_model = FlowNetDeepIM(pred_flow=False, pred_mask=False, dtype=jnp.bfloat16)
        params = FlowNetDeepIM(pred_flow=True, pred_mask=True, dtype=jnp.bfloat16).init(
            jax.random.PRNGKey(0), jnp.zeros((1, h, w, 8)))
        obs = Observation(
            image_observed=img, mask_observed=box_fill(mask), mask_gt_observed=None,
            depth_observed=None, k=jnp.asarray(k_mat))
        run = jax.jit(lambda p, p0: refine(p, full_model, obs, meshes, p0, ecfg)[0])
        t = timeit(run, params, pose0j, n=args.n)
        print(f"refine x4: {t*1e3:8.2f} ms  ({b/t:9.1f} frames/s)")


def stage_profile(args):
    """--stages: per-stage timing of the CSR raster pipeline."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from functools import partial

    from __graft_entry__ import _build_scene
    from deepim_tpu.render import rasterizer as rz

    b, h, w = args.batch, 480, 640
    k_mat = np.array(
        [[572.4114, 0.0, 325.2611], [0.0, 573.57043, 242.04899], [0.0, 0.0, 1.0]],
        np.float32,
    )
    ecfg, bank_arrays, cls_idx, meshes, pose_gt, pose0, img, depth, mask = _build_scene(
        b, h, w, k_mat, num_iters=4, mesh_detail=args.detail,
        max_faces_per_tile=args.k, active_tiles=args.active,
    )
    cfg = ecfg.raster
    kb = jnp.broadcast_to(jnp.asarray(k_mat), (b, 3, 3))
    vertices, colors, faces, face_valid = (
        meshes.vertices, meshes.colors, meshes.faces, meshes.face_valid,
    )
    pose0 = jnp.asarray(pose0)
    nf = faces.shape[1]
    t = cfg.num_tiles

    @jax.jit
    def stage_geom(pose):
        u, v, z = rz.project_vertices(vertices, pose, kb)
        fu = jnp.take_along_axis(u[:, :, None], faces, axis=1)
        fv = jnp.take_along_axis(v[:, :, None], faces, axis=1)
        fz = jnp.take_along_axis(z[:, :, None], faces, axis=1)
        in_range = jnp.all((fz > cfg.znear) & (fz < cfg.zfar), axis=2)
        area = (
            (fu[..., 1] - fu[..., 0]) * (fv[..., 2] - fv[..., 0])
            - (fv[..., 1] - fv[..., 0]) * (fu[..., 2] - fu[..., 0])
        )
        valid = face_valid & in_range & (jnp.abs(area) > 1e-6)
        return fu, fv, valid

    print(f"geom:      {timeit(stage_geom, pose0, n=args.n)*1e3:8.2f} ms")
    fu, fv, valid = stage_geom(pose0)

    bin_j = jax.jit(lambda fu, fv, valid: jax.vmap(partial(rz.bin_faces_csr, cfg=cfg))(fu, fv, valid))
    print(f"bin_csr:   {timeit(bin_j, fu, fv, valid, n=args.n)*1e3:8.2f} ms")

    full = jax.jit(lambda pose: rz.rasterize(vertices, colors, faces, face_valid, pose, jnp.asarray(k_mat), cfg))
    print(f"full:      {timeit(full, pose0, n=args.n)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
