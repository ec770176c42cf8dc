"""Occlusion-LINEMOD protocol: multi-instance scenes (one observed frame,
several objects, per-pixel class-id label) evaluated per class with Proj2D
accuracy-vs-threshold curves — the reference's Occlusion LINEMOD reporting
(README.md:43-49, assets/LM6d_Occ_results.png; metric math per
lib/dataset/LM6D_REFINE.py:514-669)."""
import glob
import os

import numpy as np
import pytest

from deepim_tpu.config import Config, update_config_dict
from deepim_tpu.data.pairdb import PairDB
from deepim_tpu.render.mesh import make_icosphere, make_test_cube
from deepim_tpu.tools.synth_data import generate_occlusion_dataset

H = W = 64
K_MAT = np.array([[80.0, 0.0, 32.0], [0.0, 80.0, 32.0], [0.0, 0.0, 1.0]], np.float32)


@pytest.fixture(scope="module")
def occ_devkit(tmp_path_factory):
    from deepim_tpu.render.rasterizer import RasterConfig

    path = str(tmp_path_factory.mktemp("LM6d_occ_synth"))
    meshes = {"cube": make_test_cube(0.08), "sphere": make_icosphere(0.05, 1)}
    generate_occlusion_dataset(
        path, meshes, K_MAT, n_scenes=6, height=H, width=W,
        z_range=(0.45, 0.6), lateral_spread=0.02,
        raster_cfg=RasterConfig(
            height=H, width=W, tile_h=16, tile_w=16,
            max_faces_per_tile=128, chunk=16, znear=0.05, zfar=10.0,
        ),
    )
    return path


def make_cfg(devkit_path) -> Config:
    return update_config_dict(
        Config(),
        {
            "SCALES": [H, W],
            "output_path": os.path.join(devkit_path, "output"),
            "dataset": {
                "dataset": "LM6D_REFINE",
                "dataset_path": devkit_path,
                "root_path": devkit_path,
                "image_set": "train_",
                "test_image_set": "val_",
                "model_dir": os.path.join(devkit_path, "models"),
                "class_name": ["cube", "sphere"],
                "INTRINSIC_MATRIX": K_MAT.flatten().tolist(),
                "ZNEAR": 0.05,
                "ZFAR": 10.0,
            },
            "network": {"INPUT_MASK": True, "PRED_FLOW": False, "PRED_MASK": False},
            "TEST": {"test_iter": 2, "FAST_TEST": True},
        },
    )


def test_occlusion_layout_is_multi_instance(occ_devkit):
    import cv2

    labels = sorted(glob.glob(os.path.join(occ_devkit, "data/observed/scenes/*-label.png")))
    assert len(labels) == 6
    # At least one scene has both class ids present, and at least one scene
    # has an occluded (partially hidden) instance: the per-class visible mask
    # is smaller than the object rendered alone.
    both = 0
    occluded = 0
    for lp in labels:
        lab = cv2.imread(lp, cv2.IMREAD_UNCHANGED)
        ids = set(np.unique(lab)) - {0}
        if ids == {1, 2}:
            both += 1
        idx = os.path.basename(lp).split("-")[0]
        for ci, cls in enumerate(("cube", "sphere"), start=1):
            alone = cv2.imread(
                os.path.join(occ_devkit, f"data/gt_observed/{cls}/{idx}-depth.png"),
                cv2.IMREAD_UNCHANGED,
            )
            vis = (lab == ci).sum()
            full = (alone > 0).sum()
            if full > 0 and vis < full:
                occluded += 1
    assert both >= 1
    assert occluded >= 1


def test_occlusion_pairdb_and_masks(occ_devkit):
    cfg = make_cfg(occ_devkit)
    from deepim_tpu.data.preprocess import make_test_sample

    db = PairDB(name="LM6D_REFINE", devkit_path=occ_devkit, image_set="val_cube", cur_class="cube")
    pairdb = db.gt_pairdb()
    assert len(pairdb) == 6
    rec = pairdb[0]
    assert "scenes/" in rec["image_observed"]
    cfg_gt = update_config_dict(cfg, {"TEST": {"INIT_MASK": "mask_gt_observed"}})
    s = make_test_sample(rec, cfg_gt)
    # The observed mask only covers this class's visible pixels.
    assert 0 < s["mask_observed"].sum() < H * W


def test_occlusion_pred_eval_end_to_end(occ_devkit):
    """Full per-class evaluation over the shared multi-instance scenes, with
    per-class Proj2D curves emitted."""
    from deepim_tpu.tools.test_net import test_deepim

    cfg = make_cfg(occ_devkit)
    out_dir = os.path.join(occ_devkit, "run")
    results = test_deepim(cfg, output_dir=out_dir, batch_size=4)
    for cls in ("cube", "sphere"):
        for it in range(cfg.TEST.test_iter):
            acc = results["arp_2d"][cls][it]
            assert acc["curve"].shape == acc["curve_thresholds"].shape
            assert np.all(np.diff(acc["curve"]) >= -1e-9)  # monotone curve
            assert 0.0 <= acc["auc"] <= 100.0
    # Curve tables on disk (one per iteration).
    files = sorted(glob.glob(os.path.join(out_dir, "proj2d_curves_iter*.txt")))
    assert len(files) == cfg.TEST.test_iter
    body = open(files[-1]).read()
    assert "cube" in body and "sphere" in body
