"""Full-pipeline integration test: toolkit dataset generation -> pairdb ->
loader -> dp-sharded training (one epoch) -> batched test refinement ->
evaluation protocols.  This is the rebuild's equivalent of running the
reference end-to-end on a miniature dataset (its only pipeline validation
was the real eval run, SURVEY.md §4)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepim_tpu.config import Config, update_config_dict
from deepim_tpu.data.loader import TestLoader, TrainLoader
from deepim_tpu.data.pairdb import PairDB, load_pose_file
from deepim_tpu.render.mesh import load_textured_mesh, make_icosphere, make_test_cube
from deepim_tpu.tools.synth_data import generate_dataset, sample_perturbed_pose

H = W = 64
K_MAT = np.array([[80.0, 0.0, 32.0], [0.0, 80.0, 32.0], [0.0, 0.0, 1.0]], np.float32)


@pytest.fixture(scope="module")
def devkit(tmp_path_factory):
    from deepim_tpu.render.rasterizer import RasterConfig

    path = str(tmp_path_factory.mktemp("LM6d_refine_synth"))
    meshes = {"cube": make_test_cube(0.08), "sphere": make_icosphere(0.05, 1)}
    generate_dataset(
        path, meshes, K_MAT, n_train=8, n_val=4, height=H, width=W,
        z_range=(0.45, 0.6),
        raster_cfg=RasterConfig(height=H, width=W, tile_h=16, tile_w=16, max_faces_per_tile=128, chunk=16, znear=0.05, zfar=10.0),
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
                "NORMALIZE_FLOW": 20.0,
                "ZNEAR": 0.05,
                "ZFAR": 10.0,
            },
            "network": {
                "INPUT_MASK": True,
                "PRED_FLOW": True,
                "PRED_MASK": True,
                "TRAIN_ITER": True,
                "TRAIN_ITER_SIZE": 2,
                "PIXEL_MEANS": [123.68, 116.779, 103.939],
            },
            "train_iter": {
                "SE3_PM_LOSS": True, "LW_PM": 0.1, "NUM_3D_SAMPLE": 16,
                "LW_FLOW": 0.25, "LW_MASK": 0.03,
            },
            "TRAIN": {
                "BATCH_PAIRS": 1, "end_epoch": 1, "warmup": True,
                "warmup_lr": 1e-5, "warmup_step": 2, "lr": 1e-4,
                "INIT_MASK": "box_gt", "UPDATE_MASK": "box_gt", "MASK_DILATE": True,
                "model_prefix": "deepim_synth",
            },
            "TEST": {"test_iter": 2, "test_epoch": 1},
        },
    )


def test_dataset_layout_and_pairdb(devkit):
    db = PairDB(name="LM6D_REFINE", devkit_path=devkit, image_set="train_cube", cur_class="cube")
    pairdb = db.gt_pairdb()
    assert len(pairdb) == 8
    rec = pairdb[0]
    for key in ("image_observed", "depth_gt_observed", "mask_gt_observed"):
        assert os.path.exists(rec[key]), rec[key]
    assert rec["pose_observed"].shape == (3, 4)
    assert rec["pose_rendered"].shape == (3, 4)
    # Perturbed pose differs from gt but is in the same ballpark.
    d = np.abs(rec["pose_rendered"][:, 3] - rec["pose_observed"][:, 3])
    assert d.max() < 0.3
    assert db.points("cube").shape[1] == 3
    assert db.diameter("cube") > 0
    # cache round trip
    pairdb2 = db.gt_pairdb()
    assert len(pairdb2) == len(pairdb)


def test_obj_roundtrip(devkit):
    mesh = load_textured_mesh(os.path.join(devkit, "models", "cube"))
    ref = make_test_cube(0.08)
    assert mesh.num_vertices == ref.num_vertices
    assert mesh.num_faces == ref.num_faces
    np.testing.assert_allclose(mesh.vertices, ref.vertices, atol=1e-5)
    np.testing.assert_allclose(mesh.colors, ref.colors, atol=1.0)


def test_pose_noise_model(rng):
    pose = np.eye(3, 4, dtype=np.float32)
    pose[2, 3] = 0.6
    nprng = np.random.RandomState(0)
    rots, ts = [], []
    for _ in range(200):
        p = sample_perturbed_pose(pose, nprng)
        cos = np.clip((np.trace(p[:, :3]) - 1) / 2, -1, 1)
        rots.append(np.degrees(np.arccos(cos)))
        ts.append(p[:, 3] - pose[:, 3])
    # Angular noise from three N(0, 15deg) axes: mean total angle ~ 20-30 deg.
    assert 10 < np.mean(rots) < 45
    assert np.abs(np.std([t[2] for t in ts]) - 0.05) < 0.02


def test_train_loader_batches(devkit):
    cfg = make_cfg(devkit)
    db = PairDB(name="LM6D_REFINE", devkit_path=devkit, image_set="train_cube", cur_class="cube")
    pairdb = db.gt_pairdb()
    loader = TrainLoader(pairdb, cfg, {"cube": db.points("cube")}, batch_size=4)
    batches = list(loader.epoch())
    assert len(batches) == 2
    b = batches[0]
    assert b.image_observed.shape == (4, 3, H, W)
    assert b.mask_observed.shape == (4, 1, H, W)
    assert b.depth_gt_observed.shape == (4, H, W)
    assert b.points_model.shape == (4, 16, 3)
    assert b.image_observed.max() > 1.0  # raw [0, 255]
    assert set(np.unique(b.mask_gt_observed)) <= {0.0, 1.0}
    # box_gt observed mask must cover the gt mask (modulo dilation).
    assert (b.mask_observed >= b.mask_gt_observed - 1e-6).mean() > 0.99


def test_full_train_and_eval(devkit):
    from deepim_tpu.tools.test_net import test_deepim
    from deepim_tpu.tools.train_net import train_net

    cfg = make_cfg(devkit)
    state = train_net(cfg, output_dir=os.path.join(devkit, "run"), n_devices=4)
    assert int(state.step) == 4 * 2 * 1  # 4 batches/epoch (16 pairs / 4) x 2 inner iters
    finite = all(np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(state.params))
    assert finite

    results = test_deepim(cfg, output_dir=os.path.join(devkit, "run"), params=state.params, batch_size=4)
    assert set(results.keys()) == {"pose", "add", "arp_2d", "flow_epe"}
    assert np.isfinite(results["flow_epe"]["epe_all"])
    assert results["flow_epe"]["epe_viz"] >= 0.0
    for cls in ("cube", "sphere"):
        assert cls in results["add"], results["add"].keys()
        for it in range(cfg.TEST.test_iter):
            add_res = results["add"][cls][it]
            assert 0.0 <= add_res["0.10"] <= 100.0
            assert 0.0 <= add_res["auc"] <= 100.0
            assert np.isfinite(add_res["errors"]).all()
    # Result cache was written and reloads.
    cache = os.path.join(devkit, "run", "results_pose.pkl")
    assert os.path.exists(cache)
    results2 = test_deepim(cfg, output_dir=os.path.join(devkit, "run"), params=state.params, batch_size=4)
    np.testing.assert_allclose(
        results2["add"]["cube"][0]["0.10"], results["add"]["cube"][0]["0.10"]
    )


def test_precomputed_pose_eval_paths(devkit):
    """TEST.PRECOMPUTED_ICP / BEFORE_ICP shortcuts (tester.py:193-279):
    evaluate stored poses without running the network."""
    import glob

    from deepim_tpu.config import replace
    from deepim_tpu.data.pairdb import PairDB, save_pose_file
    from deepim_tpu.tools.test_net import test_deepim

    cfg = make_cfg(devkit)

    # BEFORE_ICP: evaluates the initial (perturbed) rendered poses.
    cfg_b = replace(cfg, TEST=replace(cfg.TEST, BEFORE_ICP=True))
    res_b = test_deepim(cfg_b, output_dir=os.path.join(devkit, "run_icp"))
    assert np.isfinite(res_b["add"]["cube"][0]["errors"]).all()

    # PRECOMPUTED_ICP: write a perfect "-pose_icp.txt" next to every rendered
    # depth; evaluation must then be exact (100% at every threshold).
    for cls in ("cube", "sphere"):
        db = PairDB(name="LM6D_REFINE", devkit_path=devkit, image_set=f"val_{cls}", cur_class=cls)
        for rec in db.gt_pairdb():
            icp_path = rec["depth_rendered"][: -len("-depth.png")] + "-pose_icp.txt"
            save_pose_file(icp_path, rec["pose_observed"])
    cfg_i = replace(cfg, TEST=replace(cfg.TEST, PRECOMPUTED_ICP=True))
    res_i = test_deepim(cfg_i, output_dir=os.path.join(devkit, "run_icp"))
    for cls in ("cube", "sphere"):
        assert res_i["add"][cls][0]["0.10"] == 100.0
        assert res_i["pose"][cls][0]["acc_5cm_5deg"] == 100.0
