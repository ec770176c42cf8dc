"""Tracking-precision fine-tune: close the ~0.1d translation floor.

Round-4 diagnosis (experiments/results/track_learned_r4.jsonl + README):
the bench13 checkpoint tracks rotation to 0.0-0.5 deg but carries an
iteration-budget-independent ~0.1 x diameter TRANSLATION residual, so
ADD<0.1d lock sits at ~50%.  Root cause: the training pair distribution is
the reference's PoseCNN-like init noise (15 deg / (0.01, 0.01, 0.05) m,
LM6d_1_gen_rendered_pose.py:51-55) — the network almost never sees
NEAR-CONVERGENCE deltas, so it has no gradient pressure to be precise once
the pose is close (exactly the regime a tracker lives in every frame).

Fix: fine-tune on a noise MIX dominated by small deltas (near-convergence
curriculum) while keeping a tail of the standard noise so the wide basin
is not forgotten:

    50%  rot N(0, 3 deg) clip 9,   trans N(0, (3, 3, 10) mm)
    25%  rot N(0, 8 deg) clip 24,  trans N(0, (6, 6, 30) mm)
    25%  the reference model (15 deg / (10, 10, 50) mm)

Run AFTER benchmark_multiclass (same --size/--classes/--subdiv):
    python experiments/track_finetune.py [--epochs 60] [--finetune-epochs 20]
then evaluate with
    python experiments/track_learned.py --prefix trackft --epochs <end>
"""
import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=60, help="bench13 checkpoint epoch to seed from")
    ap.add_argument("--finetune-epochs", type=int, default=20)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--classes", type=int, default=13)
    ap.add_argument("--subdiv", type=int, default=3)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--n-train", type=int, default=256, help="pairs per class")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--train-iter-size", type=int, default=2,
                    help="2 matches the tracker's iters_per_frame")
    args = ap.parse_args()

    from deepim_tpu.config import Config, update_config_dict
    from deepim_tpu.render.mesh import make_benchmark_classes
    from deepim_tpu.render.rasterizer import RasterConfig
    from deepim_tpu.tools.synth_data import generate_dataset
    from deepim_tpu.tools.train_net import train_net

    h = w = args.size
    k = np.array([[1.35 * h, 0.0, w / 2], [0.0, 1.35 * h, h / 2], [0.0, 0.0, 1.0]], np.float32)
    bench_devkit = os.path.join(
        tempfile.gettempdir(), f"bench13_{args.classes}c_{h}_{args.subdiv}"
    )
    ft_devkit = bench_devkit + "_trackft"
    meshes = make_benchmark_classes(args.classes, subdiv=args.subdiv)
    classes = sorted(meshes.keys())
    noise_mix = [
        (0.50, 3.0, 9.0, (0.003, 0.003, 0.010)),
        (0.25, 8.0, 24.0, (0.006, 0.006, 0.030)),
        (0.25, 15.0, 45.0, (0.010, 0.010, 0.050)),
    ]
    if not os.path.exists(os.path.join(ft_devkit, "image_set")):
        print("generating near-convergence dataset at", ft_devkit, flush=True)
        generate_dataset(
            ft_devkit, meshes, k, n_train=args.n_train, n_val=16,
            height=h, width=w, z_range=(0.45, 0.75),
            raster_cfg=RasterConfig(height=h, width=w, znear=0.05, zfar=10.0),
            noise_mix=noise_mix, seed=11,
        )

    end_epoch = args.epochs + args.finetune_epochs
    cfg = update_config_dict(
        Config(),
        {
            "SCALES": [h, w],
            "output_path": os.path.join(ft_devkit, "output"),
            "dataset": {
                "dataset": "LM6D_REFINE", "dataset_path": ft_devkit, "root_path": ft_devkit,
                "image_set": "train_", "test_image_set": "val_",
                "model_dir": os.path.join(ft_devkit, "models"),
                "class_name": classes,
                "INTRINSIC_MATRIX": k.flatten().tolist(),
                "NORMALIZE_FLOW": 20.0, "ZNEAR": 0.05, "ZFAR": 10.0,
            },
            "network": {
                "INPUT_MASK": True, "PRED_FLOW": True, "PRED_MASK": True,
                "TRAIN_ITER": True, "TRAIN_ITER_SIZE": args.train_iter_size,
                "PIXEL_MEANS": [123.68, 116.779, 103.939],
            },
            "train_iter": {
                "SE3_PM_LOSS": True, "LW_PM": 1.0, "NUM_3D_SAMPLE": 512,
                "LW_FLOW": 0.25,
                "LW_MASK": 0.01 * (128.0 / args.size) ** 2,
            },
            "TRAIN": {
                "optimizer": "adam", "BATCH_PAIRS": args.batch,
                "warmup": True, "warmup_lr": 1e-5, "warmup_step": 50,
                "lr": args.lr, "lr_step": f"{args.epochs + args.finetune_epochs * 3 // 4}",
                "grad_clip": 1.0,
                "INIT_MASK": "box_gt", "UPDATE_MASK": "box_gt", "MASK_DILATE": True,
                "model_prefix": "trackft", "CHECKPOINT_INTERVAL": 5,
                "RESUME": True, "begin_epoch": args.epochs, "end_epoch": end_epoch,
            },
        },
    )
    run_dir = os.path.join(ft_devkit, "run")
    os.makedirs(run_dir, exist_ok=True)
    # Seed the fine-tune checkpoint stream with the bench13 weights.
    import shutil

    seed_src = os.path.join(bench_devkit, "run", f"bench13_ckpt/{args.epochs}")
    seed_dst = os.path.join(run_dir, f"trackft_ckpt/{args.epochs}")
    if not os.path.exists(seed_dst):
        os.makedirs(os.path.dirname(seed_dst), exist_ok=True)
        shutil.copytree(seed_src, seed_dst)
    train_net(cfg, output_dir=run_dir)
    print(f"\nfine-tuned checkpoint: {run_dir}/trackft epoch {end_epoch}")
    print("evaluate with: python experiments/track_learned.py "
          f"--prefix trackft --run-dir {run_dir} --epochs {end_epoch}")


if __name__ == "__main__":
    main()
