"""A/B harness for CSR rasterizer config knobs on the real chip.

Times the FULL rasterize call (the unit the refine loop pays
raster_batch_chunk times per iteration) for a list of config variants in
one process, with chained reps (each call's output perturbs the next
call's pose by ~1e-12 so no dispatch can be cache-served), and verifies
each variant drops zero CSR pairs before timing it.

Usage: python experiments/ab_raster.py [--batch 8] [--detail 5] [--n 20]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--detail", type=int, default=5)
    ap.add_argument("--active", type=int, default=32)
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("--variants", default=None,
                    help="semicolon-separated JSON dicts of RasterConfig overrides")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _build_scene
    from deepim_tpu.render.rasterizer import csr_dropped_pairs, rasterize

    b, h, w = args.batch, 480, 640
    k_mat = np.array(
        [[572.4114, 0.0, 325.2611], [0.0, 573.57043, 242.04899], [0.0, 0.0, 1.0]],
        np.float32,
    )
    ecfg, bank_arrays, cls_idx, meshes, pose_gt, pose0, img, depth, mask = _build_scene(
        b, h, w, k_mat, num_iters=4, mesh_detail=args.detail, active_tiles=args.active,
    )
    base = dataclasses.replace(ecfg.raster, raster_batch_chunk=0)
    kb = jnp.asarray(k_mat)
    pose0 = jnp.asarray(pose0)
    mb = meshes.expand_corners()

    if args.variants:
        variants = [json.loads(v) for v in args.variants.split(";")]
    else:
        variants = [
            {},
            {"bin_pairs": meshes.faces.shape[1] * 2},
            {"csr_chunk": 64},
            {"bin_pairs": meshes.faces.shape[1] * 2, "csr_chunk": 64},
            {"csr_chunk": 64, "csr_group": 1024},
            {"bin_pairs": meshes.faces.shape[1] * 3, "csr_chunk": 64, "csr_group": 1024},
        ]

    ref = None
    for ov in variants:
        cfg = dataclasses.replace(base, **ov)
        nd = int(csr_dropped_pairs(mb.vertices, mb.faces, mb.face_valid, pose0, kb, cfg))
        if nd:
            print(json.dumps({"variant": ov, "skipped": "drops %d pairs" % nd}))
            continue

        @jax.jit
        def run(pose, mb=mb, cfg=cfg):
            rgb, dep = rasterize(
                mb.vertices, mb.colors, mb.faces, mb.face_valid, pose, kb, cfg,
                corners=mb.corners, corner_colors=mb.corner_colors,
            )
            # Chain: fold a O(1e-12) function of the output into the pose.
            return rgb, dep, pose + 1e-15 * jnp.mean(dep)

        rgb, dep, p = jax.block_until_ready(run(pose0))
        if ref is None:
            ref = (np.asarray(rgb), np.asarray(dep))
        else:
            derr = float(np.abs(np.asarray(dep) - ref[1]).max())
            cerr = float(np.abs(np.asarray(rgb) - ref[0]).max())
            if derr > 1e-5 or cerr > 1e-3:
                print(json.dumps({"variant": ov, "MISMATCH": {"depth": derr, "rgb": cerr}}))
        t0 = time.time()
        for _ in range(args.n):
            rgb, dep, p = run(p)
        jax.block_until_ready(dep)
        dt = (time.time() - t0) / args.n
        print(json.dumps({"variant": ov, "ms": round(dt * 1e3, 3),
                          "ms_per_frame": round(dt * 1e3 / b, 4)}), flush=True)


if __name__ == "__main__":
    main()
