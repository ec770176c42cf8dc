"""Refinement-iteration visualization videos.

Re-implements the toolkit's gen_video_* family (gen_video_from_images.py,
gen_video_iter_from_images.py, gen_video_iter_zoom_from_images.py,
gen_video_iter_zoom_with_factor.py, gen_video_single_from_images.py): runs
the refinement engine on a set of test pairs and writes one video where each
frame shows, per iteration, the observed image, the render at the current
pose estimate (green-over-observed edge overlay), and the zoomed
(observed, rendered) pair the network sees.  The reference compositions are
built offline from dumped images; here the frames come straight out of the
jitted refine_step aux.

Also exposes `images_to_video` for the plain image-folder -> video case
(gen_video_from_images.py).
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def _to_u8(img: np.ndarray) -> np.ndarray:
    return np.clip(np.asarray(img), 0, 255).astype(np.uint8)


def _edge_overlay(observed_rgb: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Observed image with the rendered silhouette edge drawn in green (the
    reference's Unseen.png-style overlay)."""
    import cv2

    edges = cv2.Canny((mask * 255).astype(np.uint8), 50, 150)
    out = observed_rgb.copy()
    out[edges > 0] = (0, 255, 0)
    return out


def compose_frame(obs_rgb, rend_rgb, mask, zoom_obs, zoom_rend) -> np.ndarray:
    """One video frame: [observed+overlay | rendered] over
    [zoom observed | zoom rendered], all HxW panels."""
    import cv2

    h, w = obs_rgb.shape[:2]
    top = np.concatenate([_edge_overlay(obs_rgb, mask), _to_u8(rend_rgb)], axis=1)
    zo = cv2.resize(_to_u8(zoom_obs), (w, h))
    zr = cv2.resize(_to_u8(zoom_rend), (w, h))
    bottom = np.concatenate([zo, zr], axis=1)
    return np.concatenate([top, bottom], axis=0)


def images_to_video(image_paths: list[str], out_path: str, fps: float = 2.0) -> None:
    """gen_video_from_images.py: stack image files into a video."""
    import cv2

    first = cv2.imread(image_paths[0])
    h, w = first.shape[:2]
    vw = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for p in image_paths:
        img = cv2.imread(p)
        if img.shape[:2] != (h, w):
            img = cv2.resize(img, (w, h))
        vw.write(img)
    vw.release()


def gen_refine_video(
    cfg,
    params,
    model,
    pairdb: list[dict],
    bank_arrays: tuple,
    out_path: str,
    num_pairs: int = 8,
    fps: float = 2.0,
    mode: str = "iter_zoom",
) -> None:
    """Run test-time refinement on the first `num_pairs` pairs and write the
    per-iteration composition video(s).

    mode maps to the reference's five gen_video_* scripts:
      'iter_zoom' — overlay+render over the zoomed pair the network sees
                    (gen_video_iter_zoom_from_images.py /
                     gen_video_iter_zoom_with_factor.py)
      'iter'      — overlay+render row only (gen_video_iter_from_images.py)
      'single'    — one video PER SAMPLE, iter_zoom composition, written as
                    <out>_s<i>.mp4 (gen_video_single_from_images.py)
    (plain image-folder stacking = images_to_video, gen_video_from_images.py)
    """
    import cv2
    import jax
    import jax.numpy as jnp

    from deepim_tpu.data.loader import TestLoader
    from deepim_tpu.engine.refine import EngineConfig, MeshBuffers, Observation, refine_step

    ecfg = EngineConfig.from_config(cfg, train=False, bank_arrays=bank_arrays)

    @jax.jit
    def step(params, obs, meshes, pose):
        return refine_step(params, model, obs, meshes, pose, ecfg)

    loader = TestLoader(pairdb[:num_pairs], cfg, batch_size=min(num_pairs, len(pairdb)))
    frames = []
    for batch, valid in loader.batches():
        meshes = MeshBuffers.gather(bank_arrays, jnp.asarray(batch["class_index"]))
        obs = Observation(
            image_observed=jnp.asarray(batch["image_observed"]),
            mask_observed=jnp.asarray(batch["mask_observed"]),
            mask_gt_observed=None,
            depth_observed=(
                jnp.asarray(batch["depth_observed"]) if "depth_observed" in batch else None
            ),
            k=jnp.asarray(batch["k"]),
            class_index=jnp.asarray(batch["class_index"]),
        )
        pose = jnp.asarray(batch["pose_rendered"])
        for _ in range(cfg.TEST.test_iter):
            pose, aux = step(params, obs, meshes, pose)
            for j in range(valid):
                obs_rgb = _to_u8(np.asarray(batch["image_observed"][j]).transpose(1, 2, 0))
                rend_rgb = np.asarray(aux["image_rendered"][j]).transpose(1, 2, 0)
                mask = np.asarray(aux["mask_rendered"][j, 0])
                if mode == "iter":
                    fr = np.concatenate(
                        [_edge_overlay(obs_rgb, mask), _to_u8(rend_rgb)], axis=1
                    )
                else:
                    zo = np.asarray(aux["zoom_image_observed"][j]).transpose(1, 2, 0)
                    zr = np.asarray(aux["zoom_image_rendered"][j]).transpose(1, 2, 0)
                    fr = compose_frame(obs_rgb, rend_rgb, mask, zo, zr)
                frames.append((j, fr))
        break  # one batch of num_pairs

    # Order frames per sample, iterations consecutive (gen_video_iter_*).
    frames.sort(key=lambda t: t[0])
    h, w = frames[0][1].shape[:2]
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    if mode == "single":
        stem, ext = os.path.splitext(out_path)
        written = 0
        for j in sorted({j for j, _ in frames}):
            path = f"{stem}_s{j}{ext}"
            vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
            for jj, fr in frames:
                if jj == j:
                    vw.write(fr[:, :, ::-1])
                    written += 1
            vw.release()
        print(f"wrote {written} frames to {stem}_s*.mp4")
        return
    vw = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for _, fr in frames:
        vw.write(fr[:, :, ::-1])  # RGB -> BGR
    vw.release()
    print(f"wrote {len(frames)} frames to {out_path}")


def main():
    from deepim_tpu.config import load_config
    from deepim_tpu.data.pairdb import load_gt_pairdb
    from deepim_tpu.engine.checkpoint import load_checkpoint
    from deepim_tpu.engine.train import TrainState
    from deepim_tpu.tools.train_net import build_mesh_bank, build_model

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--out", required=True, help="output .mp4 path")
    ap.add_argument("--cls", required=True)
    ap.add_argument("--ckpt-prefix", default=None)
    ap.add_argument("--num-pairs", type=int, default=8)
    ap.add_argument("--fps", type=float, default=2.0)
    ap.add_argument("--mode", default="iter_zoom", choices=["iter_zoom", "iter", "single"])
    args = ap.parse_args()
    cfg = load_config(args.cfg)
    model, params = build_model(cfg)
    if args.ckpt_prefix:
        state = load_checkpoint(args.ckpt_prefix, cfg.TEST.test_epoch, TrainState(params, None, 0))
        params = state.params
    bank_arrays = build_mesh_bank(cfg)
    iset = cfg.dataset.test_image_set
    _, pairdb = load_gt_pairdb(
        cfg, cfg.dataset.dataset.split("+")[0],
        iset + args.cls if iset.endswith("_") else iset,
        args.cls, cfg.dataset.root_path, cfg.dataset.dataset_path,
    )
    gen_refine_video(cfg, params, model, pairdb, bank_arrays, args.out, args.num_pairs, args.fps, args.mode)


if __name__ == "__main__":
    main()
