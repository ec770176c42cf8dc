"""CLI: video pose tracking over a test image sequence.

Treats a class's observed frames (in image-set order) as a video: frame 0 is
initialized from its stored init pose (e.g. the PoseCNN estimate the
reference uses, deepim/test.py protocol) and every later frame starts from
the previous frame's refined pose.  Reports per-frame rotation/translation
error against gt and can write an edge-overlay video (the reference only
ships offline visualization videos — toolkit/gen_video_* — with no tracking
driver at all).

Usage:
  python -m deepim_tpu.tools.track_video --cfg cfg.yaml --cls ape \
      [--ckpt-prefix out/deepim] [--iters-per-frame 2] [--out track.mp4]
"""
from __future__ import annotations

import argparse

import numpy as np


def track_pairdb_sequence(
    cfg, params, model, db, pairdb, bank_arrays, iters_per_frame: int = 2,
    chunk: int = 0,
):
    """Track one class's observed sequence.  Returns (poses (T, 3, 4),
    rot_err (T,), trans_err (T,))."""
    import jax
    import jax.numpy as jnp

    from deepim_tpu.data.loader import TestLoader
    from deepim_tpu.engine.refine import EngineConfig, MeshBuffers
    from deepim_tpu.engine.tracker import make_tracker

    ecfg = EngineConfig.from_config(cfg, train=False, bank_arrays=bank_arrays)
    loader = TestLoader(pairdb, cfg, batch_size=1)
    frames, poses_gt = [], []
    pose0 = None
    for batch, _valid in loader.batches():
        frames.append(batch["image_observed"][0])
        poses_gt.append(batch["pose_observed"][0])
        if pose0 is None:
            pose0 = batch["pose_rendered"][0]
    frames = jnp.asarray(np.stack(frames))[:, None]  # (T, 1, 3, H, W)
    cls_idx = jnp.asarray([list(db.classes).index(db.cur_class)], jnp.int32)
    meshes = MeshBuffers.gather(bank_arrays, cls_idx)
    k = jnp.asarray(cfg.dataset.intrinsic_matrix())
    track = jax.jit(make_tracker(model, ecfg, iters_per_frame, with_stats=True))
    _, poses, stats = track(params, frames, meshes, k, jnp.asarray(pose0[None]))
    poses = np.asarray(poses)[:, 0]  # (T, 3, 4)
    nd = int(np.asarray(stats["raster_dropped"]))
    if nd:
        from deepim_tpu.utils.logger import logger

        logger.warning(
            "rasterizer dropped %d face-tile pairs during tracking - "
            "renders had holes; raise RasterConfig.bin_pairs", nd,
        )

    gt = np.stack(poses_gt)
    tr = np.einsum("tij,tij->t", poses[:, :, :3], gt[:, :, :3])
    rot_err = np.degrees(np.arccos(np.clip((tr - 1.0) / 2.0, -1.0, 1.0)))
    trans_err = np.linalg.norm(poses[:, :, 3] - gt[:, :, 3], axis=-1)
    return poses, rot_err, trans_err


def main():
    from deepim_tpu.config import load_config
    from deepim_tpu.data.pairdb import load_gt_pairdb
    from deepim_tpu.engine.checkpoint import load_checkpoint
    from deepim_tpu.engine.train import TrainState
    from deepim_tpu.tools.train_net import build_mesh_bank, build_model
    from deepim_tpu.utils.logger import logger

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--cls", required=True)
    ap.add_argument("--ckpt-prefix", default=None)
    ap.add_argument("--iters-per-frame", type=int, default=2)
    ap.add_argument("--out", default=None, help="optional overlay .mp4 path")
    args = ap.parse_args()

    cfg = load_config(args.cfg)
    model, params = build_model(cfg)
    if args.ckpt_prefix:
        state = load_checkpoint(args.ckpt_prefix, cfg.TEST.test_epoch, TrainState(params, None, 0))
        params = state.params
    bank_arrays = build_mesh_bank(cfg)
    iset = cfg.dataset.test_image_set
    db, pairdb = load_gt_pairdb(
        cfg, cfg.dataset.dataset.split("+")[0],
        iset + args.cls if iset.endswith("_") else iset,
        args.cls, cfg.dataset.root_path, cfg.dataset.dataset_path,
    )
    poses, rot_err, trans_err = track_pairdb_sequence(
        cfg, params, model, db, pairdb, bank_arrays, args.iters_per_frame
    )
    for t in range(len(rot_err)):
        logger.info("frame %03d: rot %.2f deg, trans %.1f mm", t, rot_err[t], trans_err[t] * 1000)
    logger.info(
        "track %s: %d frames, mean rot %.2f deg, mean trans %.1f mm, max trans %.1f mm",
        args.cls, len(rot_err), rot_err.mean(), trans_err.mean() * 1000, trans_err.max() * 1000,
    )

    if args.out:
        import jax.numpy as jnp

        from deepim_tpu.data.loader import TestLoader
        from deepim_tpu.engine.refine import EngineConfig, MeshBuffers, render_at_pose
        from deepim_tpu.toolkit.gen_video import _edge_overlay, _to_u8, images_to_video
        import cv2
        import os
        import tempfile

        bank_arrays = build_mesh_bank(cfg)
        ecfg = EngineConfig.from_config(cfg, train=False, bank_arrays=bank_arrays)
        loader = TestLoader(pairdb, cfg, batch_size=1)
        cls_idx = jnp.asarray([list(db.classes).index(db.cur_class)], jnp.int32)
        meshes = MeshBuffers.gather(bank_arrays, cls_idx)
        k = jnp.asarray(cfg.dataset.intrinsic_matrix())
        tmp = tempfile.mkdtemp()
        frame_paths = []
        for t, (batch, _valid) in enumerate(loader.batches()):
            _, _, mask = render_at_pose(meshes, jnp.asarray(poses[t][None]), k, ecfg)
            obs_rgb = _to_u8(batch["image_observed"][0].transpose(1, 2, 0))
            frame = _edge_overlay(obs_rgb, np.asarray(mask[0, 0]))
            p = os.path.join(tmp, f"{t:04d}.png")
            cv2.imwrite(p, frame[:, :, ::-1])
            frame_paths.append(p)
        images_to_video(frame_paths, args.out, fps=10.0)
        logger.info("wrote %s", args.out)


if __name__ == "__main__":
    main()
