"""Pairdb statistics (lib/pair_matching/stat_se3.py, stat_depth.py).

`stat_se3` reports the mean/std of the untangled delta-pose labels
(rendered -> observed) over a pairdb plus the max rotation/translation
distance; `stat_depth` the min/max stored depth value.  Both are batched:
the SE(3) deltas run through the jitted geometry core instead of a
per-sample host loop.
"""
from __future__ import annotations

import argparse

import numpy as np


def stat_se3(pairdb: list[dict], rot_coord: str = "CAMERA") -> tuple[np.ndarray, np.ndarray]:
    import jax.numpy as jnp

    from deepim_tpu.geometry.rotations import mat2quat
    from deepim_tpu.geometry.se3 import calc_RT_delta

    src = jnp.asarray(np.stack([p["pose_rendered"] for p in pairdb]))
    tgt = jnp.asarray(np.stack([p["pose_observed"] for p in pairdb]))
    r_delta, t_delta = calc_RT_delta(
        src, tgt, jnp.zeros(3), jnp.ones(3), rot_coord
    )
    quat = np.asarray(mat2quat(r_delta))
    se3 = np.concatenate([quat, np.asarray(t_delta)], axis=1)
    se3_mean, se3_std = se3.mean(axis=0), se3.std(axis=0)

    # Distances (calc_rt_dist_m): geodesic rotation + translation norm.
    rel = np.einsum("bij,bkj->bik", np.asarray(tgt)[:, :, :3], np.asarray(src)[:, :, :3])
    tr = np.clip((np.trace(rel, axis1=1, axis2=2) - 1) / 2, -1, 1)
    r_dist = np.degrees(np.arccos(tr))
    t_dist = np.linalg.norm(np.asarray(tgt)[:, :, 3] - np.asarray(src)[:, :, 3], axis=1)
    print(f"mean: {se3_mean},\nstd: {se3_std}")
    print(f"R_max: {r_dist.max():.3f} deg, T_max: {t_dist.max():.4f} m")
    return se3_mean, se3_std


def stat_depth(pairdb: list[dict]) -> tuple[float, float]:
    import cv2

    files = sorted({p["depth_rendered"] for p in pairdb})
    max_val, min_val = -1.0, float("inf")
    for f in files:
        d = cv2.imread(f, cv2.IMREAD_UNCHANGED).astype(np.float32)
        max_val = max(max_val, float(d.max()))
        min_val = min(min_val, float(d.min()))
    print(f"max of depth value is {max_val}, min of depth value is {min_val}")
    return max_val, min_val


def main():
    from deepim_tpu.data.pairdb import PairDB

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", required=True)
    ap.add_argument("--image-set", required=True)
    ap.add_argument("--cls", required=True)
    ap.add_argument("--what", choices=["se3", "depth", "both"], default="both")
    args = ap.parse_args()
    db = PairDB(name="LM6D_REFINE", devkit_path=args.root, image_set=args.image_set, cur_class=args.cls)
    pairdb = db.gt_pairdb()
    if args.what in ("se3", "both"):
        stat_se3(pairdb)
    if args.what in ("depth", "both"):
        stat_depth(pairdb)


if __name__ == "__main__":
    main()
