"""Per-component timing of the refinement hot path on the real chip:
rasterize / zoom / network forward / full refine step @480x640.

Not part of the test suite; a development diagnostic.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=10):
    import jax

    jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--detail", type=int, default=2)
    ap.add_argument("--active", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _build_scene
    from deepim_tpu.engine import Observation, refine
    from deepim_tpu.engine.refine import refine_step, render_at_pose
    from deepim_tpu.models import FlowNetDeepIM, assemble_input
    from deepim_tpu.ops.masks import box_fill
    from deepim_tpu.ops.zoom import zoom_factor_from_masks, zoom_images, zoom_masks

    b, h, w = args.batch, 480, 640
    k_mat = np.array(
        [[572.4114, 0.0, 325.2611], [0.0, 573.57043, 242.04899], [0.0, 0.0, 1.0]],
        np.float32,
    )
    ecfg, bank_arrays, cls_idx, meshes, pose_gt, pose0, img, depth, mask = _build_scene(
        b, h, w, k_mat, num_iters=4, mesh_detail=args.detail, active_tiles=args.active
    )
    full = FlowNetDeepIM(pred_flow=True, pred_mask=True, dtype=jnp.bfloat16)
    params = full.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 8)))
    model = FlowNetDeepIM(pred_flow=False, pred_mask=False, dtype=jnp.bfloat16)
    obs = Observation(
        image_observed=img, mask_observed=box_fill(mask), mask_gt_observed=None,
        depth_observed=None, k=jnp.asarray(k_mat),
    )

    raster = jax.jit(lambda m, p: render_at_pose(m, p, obs.k, ecfg))
    t_raster = timeit(raster, meshes, pose0)
    print(f"rasterize+mask      : {t_raster*1e3:8.2f} ms  ({b/t_raster:8.1f} renders/s)")

    img_r, depth_r, mask_r = raster(meshes, pose0)

    def zoom_fn(pose, img_obs, img_r, mask_r):
        mo = box_fill(mask_r)
        zf = zoom_factor_from_masks(mo, mo, mask_r, pose, obs.k)
        zi = zoom_images(img_obs, img_r, zf, jnp.zeros(3))
        zm = zoom_masks(mo, mo, mask_r, zf)
        return zi, zm

    t_zoom = timeit(jax.jit(zoom_fn), pose0, obs.image_observed, img_r, mask_r)
    print(f"zoom (imgs+masks)   : {t_zoom*1e3:8.2f} ms")

    x = assemble_input(
        jnp.transpose(obs.image_observed, (0, 2, 3, 1)),
        jnp.transpose(img_r, (0, 2, 3, 1)),
        mask_observed=jnp.transpose(mask_r, (0, 2, 3, 1)),
        mask_rendered=jnp.transpose(mask_r, (0, 2, 3, 1)),
    )
    fwd = jax.jit(lambda p, x: model.apply(p, x))
    t_net = timeit(fwd, params, x)
    print(f"net fwd (FAST_TEST) : {t_net*1e3:8.2f} ms")
    fwd_full = jax.jit(lambda p, x: full.apply(p, x))
    t_netf = timeit(fwd_full, params, x)
    print(f"net fwd (full)      : {t_netf*1e3:8.2f} ms")

    # obs/meshes enter as jit ARGUMENTS: closed-over scene constants get
    # serialized into the remote-compile payload (HTTP 413 at batch >= 64).
    step = jax.jit(lambda p, o, m, pose: refine_step(p, model, o, m, pose, ecfg)[0])
    t_step = timeit(step, params, obs, meshes, pose0)
    print(f"refine_step (1 iter): {t_step*1e3:8.2f} ms")

    t_sum = t_raster + t_zoom + t_net
    print(f"sum raster+zoom+net : {t_sum*1e3:8.2f} ms")

    run4 = jax.jit(lambda p, o, m, pose: refine(p, model, o, m, pose, ecfg)[0])
    t4 = timeit(run4, params, obs, meshes, pose0)
    print(f"refine x4           : {t4*1e3:8.2f} ms  ({b/t4:8.1f} frames/s)")


if __name__ == "__main__":
    main()
