"""Synthetic end-to-end sanity run: train the matching network on a
generated cube+sphere dataset and verify that iterative refinement reduces
pose error on held-out pairs vs the perturbed initial poses.

This validates the entire learning loop (rasterizer -> zoom -> network ->
untangled update -> on-device label refresh -> SGD) without LINEMOD assets.
Run on TPU:  python experiments/synthetic_sanity.py [--epochs 8]
"""
import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=24)
    ap.add_argument("--n-train", type=int, default=512)
    ap.add_argument("--n-val", type=int, default=64)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--overfit", action="store_true",
        help="evaluate on the training pairs (capacity check: refinement "
        "must become near-perfect on seen data)",
    )
    args = ap.parse_args()

    from deepim_tpu.config import Config, update_config_dict
    from deepim_tpu.render.mesh import make_icosphere, make_test_cube
    from deepim_tpu.render.rasterizer import RasterConfig
    from deepim_tpu.tools.synth_data import generate_dataset
    from deepim_tpu.tools.test_net import test_deepim
    from deepim_tpu.tools.train_net import train_net

    h = w = args.size
    k = np.array([[1.2 * h, 0.0, w / 2], [0.0, 1.2 * h, h / 2], [0.0, 0.0, 1.0]], np.float32)
    devkit = args.out or os.path.join(tempfile.gettempdir(), f"synth_lm6d_{h}")
    if not os.path.exists(os.path.join(devkit, "image_set")):
        print("generating dataset at", devkit)
        meshes = {"cube": make_test_cube(0.1), "sphere": make_icosphere(0.06, 2)}
        generate_dataset(
            devkit, meshes, k, n_train=args.n_train, n_val=args.n_val,
            height=h, width=w, z_range=(0.5, 0.8),
            raster_cfg=RasterConfig(height=h, width=w, znear=0.05, zfar=10.0),
        )

    cfg = update_config_dict(
        Config(),
        {
            "SCALES": [h, w],
            "output_path": os.path.join(devkit, "output"),
            "dataset": {
                "dataset": "LM6D_REFINE", "dataset_path": devkit, "root_path": devkit,
                "image_set": "train_",
                "test_image_set": "train_" if args.overfit else "val_",
                "model_dir": os.path.join(devkit, "models"),
                "class_name": ["cube", "sphere"],
                "INTRINSIC_MATRIX": k.flatten().tolist(),
                "NORMALIZE_FLOW": 20.0, "ZNEAR": 0.05, "ZFAR": 10.0,
            },
            "network": {
                "INPUT_MASK": True, "PRED_FLOW": True, "PRED_MASK": True,
                "TRAIN_ITER": True, "TRAIN_ITER_SIZE": 2,
                "PIXEL_MEANS": [123.68, 116.779, 103.939],
            },
            # From-scratch weighting: the reference's LW_PM=0.1 assumes
            # pretrained-FlowNet fine-tuning where the (pixel-summed) mask
            # BCE may dominate; training from random init needs the SE(3)
            # signal in charge (single-batch overfit converges 50mm -> 2mm
            # at these scales, diverges at the reference's).
            "train_iter": {
                "SE3_PM_LOSS": True, "LW_PM": 1.0, "NUM_3D_SAMPLE": 512,
                "LW_FLOW": 0.25, "LW_MASK": 0.01,
            },
            # Adam for from-scratch learning (the reference recipe is SGD
            # fine-tuning of pretrained FlowNet features; random-init SGD at
            # those scales needs ~100k steps to move the SE(3) heads).
            "TRAIN": {
                "optimizer": "adam",
                "BATCH_PAIRS": 16, "end_epoch": args.epochs,
                "warmup": True, "warmup_lr": 1e-5, "warmup_step": 50,
                "lr": 3e-4, "lr_step": f"{args.epochs * 3 // 4}",
                "momentum": 0.975, "grad_clip": 1.0,
                "INIT_MASK": "box_gt", "UPDATE_MASK": "box_gt", "MASK_DILATE": True,
                "model_prefix": "synth",
            },
            "TEST": {"test_iter": 4, "test_epoch": args.epochs},
        },
    )
    run_dir = os.path.join(devkit, "run")
    os.makedirs(run_dir, exist_ok=True)
    state = train_net(cfg, output_dir=run_dir)
    cache = os.path.join(run_dir, "results_pose.pkl")
    if os.path.exists(cache):
        os.remove(cache)
    results = test_deepim(cfg, output_dir=run_dir, params=state.params, batch_size=16)

    # Init-pose (perturbed) error baseline vs refined — the reference's
    # tables never include iteration 0 (PoseCNN's numbers are external);
    # here we compute the init ADD directly from the pairdb.
    from deepim_tpu.data.pairdb import load_gt_pairdb
    from deepim_tpu.eval.evaluator import _add_errors

    print("\n==== refinement quality (ADD) ====")
    for cls in ("cube", "sphere"):
        db, pairdb = load_gt_pairdb(
            cfg, "LM6D_REFINE", cfg.dataset.test_image_set + cls, cls,
            cfg.dataset.root_path, cfg.dataset.dataset_path,
        )
        pts = db.points(cls)
        pose0 = np.stack([r["pose_rendered"] for r in pairdb])
        pose_gt = np.stack([r["pose_observed"] for r in pairdb])
        init_errs = _add_errors(pose0, pose_gt, pts)
        diameter = db.diameter(cls) if hasattr(db, "diameter") else None
        init_mean = float(np.mean(init_errs))
        per_iter = [results["add"][cls][it]["0.10"] for it in range(cfg.TEST.test_iter)]
        means = [float(np.mean(results["add"][cls][it]["errors"])) for it in range(cfg.TEST.test_iter)]
        if diameter is not None:
            init_acc = float(np.mean(init_errs < 0.10 * diameter) * 100)
            print(f"{cls}: ADD<0.1d init {init_acc:.1f}% -> per-iter {per_iter}")
        print(f"{cls}: mean ADD error init {init_mean:.4f} -> per iter {['%.4f' % m for m in means]}")


if __name__ == "__main__":
    main()
