"""Toolkit pipeline tests (reference toolkit/, SURVEY.md §2.8): devkit
adaptation, gt-observed rendering, perturbed-pose sampling + rendering,
PoseCNN-pred rendering, synthetic-set pipeline + check, stats, videos —
exercised end-to-end on a miniature synthetic devkit."""
import os
import pickle

import numpy as np
import pytest

from deepim_tpu.data.pairdb import PairDB, load_pose_file
from deepim_tpu.render.mesh import make_icosphere, make_test_cube
from deepim_tpu.render.rasterizer import RasterConfig
from deepim_tpu.tools.synth_data import generate_dataset

H = W = 64
K_MAT = np.array([[80.0, 0.0, 32.0], [0.0, 80.0, 32.0], [0.0, 0.0, 1.0]], np.float32)
RCFG = RasterConfig(height=H, width=W, tile_h=16, tile_w=16, max_faces_per_tile=128,
                    chunk=16, znear=0.05, zfar=10.0)


@pytest.fixture(scope="module")
def devkit(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("toolkit_devkit"))
    meshes = {"cube": make_test_cube(0.08), "sphere": make_icosphere(0.05, 1)}
    generate_dataset(
        path, meshes, K_MAT, n_train=4, n_val=2, height=H, width=W,
        z_range=(0.45, 0.6), raster_cfg=RCFG,
    )
    # Observed-set index lists (image_set/observed/<cls>_{all,train,test}.txt),
    # the convention the toolkit scripts consume (LM6d_*.py observed_set_dir).
    obs_set = os.path.join(path, "image_set", "observed")
    os.makedirs(obs_set, exist_ok=True)
    for cls in ("cube", "sphere"):
        indices = [f"{cls}/{i:06d}" for i in range(6)]
        for name, sel in (("all", indices), ("train", indices[:4]), ("test", indices[4:])):
            with open(os.path.join(obs_set, f"{cls}_{name}.txt"), "w") as f:
                f.write("\n".join(sel) + "\n")
    return path


def _renderer_kwargs():
    return dict(k=K_MAT, width=W, height=H)


def test_gen_gt_observed(devkit):
    """Re-rendering gt_observed at the stored poses reproduces the dataset's
    own depth (same rasterizer, same pose — the LM6d_0 golden check)."""
    import cv2

    from deepim_tpu.toolkit.gen_gt_observed import gen_gt_observed

    out_dir = os.path.join(devkit, "data", "gt_observed", "cube")
    ref_depth = cv2.imread(os.path.join(out_dir, "000000-depth.png"), cv2.IMREAD_UNCHANGED).copy()
    gen_gt_observed(devkit, ["cube"], "all", k=K_MAT, width=W, height=H, batch=4)
    for i in range(6):
        for suffix in ("-depth.png", "-label.png", "-pose.txt", "-color.png"):
            assert os.path.exists(os.path.join(out_dir, f"{i:06d}{suffix}"))
    new_depth = cv2.imread(os.path.join(out_dir, "000000-depth.png"), cv2.IMREAD_UNCHANGED)
    assert np.mean(np.abs(new_depth.astype(np.int64) - ref_depth.astype(np.int64)) <= 1) > 0.999
    # pose file has the class-index header and parses with the pairdb loader
    pose = load_pose_file(os.path.join(out_dir, "000000-pose.txt"))
    assert pose.shape == (3, 4)
    label = cv2.imread(os.path.join(out_dir, "000000-label.png"), cv2.IMREAD_UNCHANGED)
    assert set(np.unique(label)) <= {0, 1}


def test_gen_rendered_pose_and_rendered(devkit):
    from deepim_tpu.toolkit.gen_rendered import gen_rendered
    from deepim_tpu.toolkit.gen_rendered_pose import (
        gen_rendered_pose,
        line_to_pose,
        pose_to_line,
    )

    # pose line round trip
    pose = np.eye(3, 4, dtype=np.float32)
    pose[2, 3] = 0.5
    np.testing.assert_allclose(line_to_pose(pose_to_line(pose)), pose, atol=1e-6)

    gen_rendered_pose(devkit, ["cube"], "all", per_observed=2, k=K_MAT, width=W, height=H)
    pose_file = os.path.join(devkit, "rendered_poses", "LM6d_all_rendered_pose_cube.txt")
    with open(pose_file) as f:
        lines = [x for x in f if x.strip()]
    assert len(lines) == 6 * 2
    # noise model: rotation <= 45 deg from source, center inside margin
    src = load_pose_file(os.path.join(devkit, "data", "gt_observed", "cube", "000000-pose.txt"))
    for line in lines[:2]:
        p = line_to_pose(line)
        cos = np.clip((np.trace(p[:, :3] @ src[:, :3].T) - 1) / 2, -1, 1)
        assert np.degrees(np.arccos(cos)) <= 45.0 + 1e-6

    gen_rendered(devkit, ["cube"], "all", per_observed=2, k=K_MAT, width=W, height=H, batch=4)
    rend_dir = os.path.join(devkit, "data", "rendered", "cube")
    assert os.path.exists(os.path.join(rend_dir, "000000_1-color.png"))
    assert os.path.exists(os.path.join(rend_dir, "000005_0-depth.png"))
    with open(os.path.join(devkit, "image_set", "my_val_cube.txt")) as f:
        val_pairs = [x.split() for x in f if x.strip()]
    assert len(val_pairs) == 2  # test frames 000004, 000005 x first pose
    with open(os.path.join(devkit, "image_set", "train_cube.txt")) as f:
        train_pairs = [x for x in f if x.strip()]
    assert len(train_pairs) == 4 * 2  # non-test frames x per_observed
    # pairdb consumes the generated set directly
    db = PairDB(name="LM6D_REFINE", devkit_path=devkit, image_set="my_val_cube", cur_class="cube")
    recs = db.gt_pairdb()
    assert len(recs) == 2 and recs[0]["pose_rendered"].shape == (3, 4)


def test_gen_posecnn_rendered(devkit):
    from deepim_tpu.toolkit.gen_posecnn_rendered import gen_posecnn_rendered
    from deepim_tpu.toolkit.gen_rendered_pose import pose_to_line

    pred_dir = os.path.join(devkit, "posecnn_preds")
    os.makedirs(pred_dir, exist_ok=True)
    # predictions for the 2 test frames: one valid (the gt pose), one missing
    gt = load_pose_file(os.path.join(devkit, "data", "gt_observed", "cube", "000004-pose.txt"))
    with open(os.path.join(pred_dir, "cube_poses.txt"), "w") as f:
        f.write(pose_to_line(gt) + "\n")
        f.write(" ".join(["-1"] * 7) + "\n")
    gen_posecnn_rendered(devkit, pred_dir, ["cube"], k=K_MAT, width=W, height=H, batch=4)

    pair_file = os.path.join(devkit, "image_set", "PoseCNN_val_cube.txt")
    with open(pair_file) as f:
        pairs = [x.split() for x in f if x.strip()]
    assert len(pairs) == 1  # the no-detection frame is skipped
    out_dir = os.path.join(devkit, "data", "rendered_val_PoseCNN", "cube")
    for suffix in ("-color.png", "-depth.png", "-label.png", "-pose.txt", "-pose_icp.txt"):
        assert os.path.exists(os.path.join(out_dir, f"000004_0{suffix}"))
    np.testing.assert_allclose(
        load_pose_file(os.path.join(out_dir, "000004_0-pose.txt")), gt, atol=1e-5
    )


def test_syn_pipeline(devkit, tmp_path):
    from deepim_tpu.toolkit.gen_rendered import gen_rendered
    from deepim_tpu.toolkit.gen_rendered_pose import gen_rendered_pose
    from deepim_tpu.toolkit.syn_poses import check, gen_observed, gen_poses

    syn_root = str(tmp_path / "syn")
    pkl = gen_poses(devkit, syn_root, ["cube"], num_images=4, k=K_MAT, width=W, height=H, margin=8)
    with open(pkl, "rb") as f:
        poses = pickle.load(f)["cube"]
    assert poses.shape == (4, 3, 4)
    # orthonormal rotations, translations near the observed distribution
    rtr = np.einsum("bij,bkj->bik", poses[:, :, :3], poses[:, :, :3])
    np.testing.assert_allclose(rtr, np.tile(np.eye(3), (4, 1, 1)), atol=1e-5)
    assert np.all(poses[:, 2, 3] > 0.2) and np.all(poses[:, 2, 3] < 1.0)

    os.symlink(os.path.join(devkit, "models"), os.path.join(syn_root, "models"))
    gen_observed(syn_root, ["cube"], k=K_MAT, width=W, height=H, batch=4)
    obs_dir = os.path.join(syn_root, "data", "observed", "cube")
    assert os.path.exists(os.path.join(obs_dir, "000001-color.png"))
    assert os.path.exists(os.path.join(obs_dir, "000004-pose.txt"))
    # lit observed differs from unlit gt_observed where the object is visible
    import cv2

    obs = cv2.imread(os.path.join(obs_dir, "000001-color.png")).astype(np.int64)
    gt = cv2.imread(
        os.path.join(syn_root, "data", "gt_observed", "cube", "000001-color.png")
    ).astype(np.int64)
    depth = cv2.imread(os.path.join(obs_dir, "000001-depth.png"), cv2.IMREAD_UNCHANGED)
    fg = depth > 0
    assert fg.sum() > 0
    assert np.abs(obs - gt)[fg].mean() > 0.5  # lighting changed the shading

    # ds_3/ds_4 = the standard rendered pipeline against the syn root
    gen_rendered_pose(syn_root, ["cube"], "all", per_observed=1, k=K_MAT, width=W, height=H)
    gen_rendered(syn_root, ["cube"], "all", per_observed=1, k=K_MAT, width=W, height=H, batch=4)
    report = check(syn_root, ["cube"], image_set="train", vis_dir=str(tmp_path / "vis"))
    assert report["pairs"] == 4
    assert not report["missing"]
    assert not report["label_mismatch"]
    assert os.path.exists(str(tmp_path / "vis" / "cube_000001_check.png"))


def test_stats(devkit, capsys):
    from deepim_tpu.toolkit.stats import stat_depth, stat_se3

    db = PairDB(name="LM6D_REFINE", devkit_path=devkit, image_set="train_cube", cur_class="cube")
    pairdb = db.gt_pairdb()
    mean, std = stat_se3(pairdb)
    assert mean.shape == (7,) and std.shape == (7,)
    assert np.isfinite(mean).all() and np.isfinite(std).all()
    assert mean[0] > 0.8  # near-identity delta quaternions (w ~ 1)
    max_d, min_d = stat_depth(pairdb)
    assert max_d > min_d >= 0


def test_adapt_devkit(devkit, tmp_path):
    import cv2
    import scipy.io as sio

    from deepim_tpu.render.mesh import load_textured_mesh
    from deepim_tpu.toolkit.adapt_devkit import adapt_images, calc_extents, rescale_models

    # --- rescale-models: millimeter ascii PLY -> meters obj/points.xyz
    origin_models = tmp_path / "origin_models"
    origin_models.mkdir()
    cube = make_test_cube(0.08)
    verts_mm = cube.vertices * 1000.0
    with open(origin_models / "obj_000001.ply", "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {cube.num_vertices}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write(f"element face {cube.num_faces}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for v, c in zip(verts_mm, cube.colors):
            f.write(f"{v[0]} {v[1]} {v[2]} {int(c[0])} {int(c[1])} {int(c[2])}\n")
        for tri in cube.faces:
            f.write(f"3 {tri[0]} {tri[1]} {tri[2]}\n")
    out_models = tmp_path / "models"
    rescale_models(str(origin_models), str(out_models), ["cube"])
    pts = np.loadtxt(out_models / "cube" / "points.xyz")
    np.testing.assert_allclose(np.abs(pts).max(), 0.04, atol=1e-5)  # meters
    mesh = load_textured_mesh(str(out_models / "cube"))
    assert mesh.num_faces == cube.num_faces
    assert os.path.exists(out_models / "models_info.txt")

    # --- calc-extents
    ext = calc_extents(str(out_models), ["cube"])
    np.testing.assert_allclose(ext[0], [0.08, 0.08, 0.08], atol=1e-5)

    # --- adapt-images: miniature BOP scene built from the synth devkit
    bop = tmp_path / "bop"
    scene = bop / "000001"
    for sub in ("rgb", "depth", "mask"):
        (scene / sub).mkdir(parents=True)
    src = os.path.join(devkit, "data", "observed", "cube")
    gt_json = {}
    for i in range(2):
        color = cv2.imread(os.path.join(src, f"{i:06d}-color.png"))
        depth = cv2.imread(os.path.join(src, f"{i:06d}-depth.png"), cv2.IMREAD_UNCHANGED)
        cv2.imwrite(str(scene / "rgb" / f"{i:06d}.png"), color)
        cv2.imwrite(str(scene / "depth" / f"{i:06d}.png"), depth)
        cv2.imwrite(str(scene / "mask" / f"{i:06d}_000000.png"), ((depth > 0) * 255).astype(np.uint8))
        pose = load_pose_file(os.path.join(devkit, "data", "gt_observed", "cube", f"{i:06d}-pose.txt"))
        gt_json[str(i)] = [{
            "obj_id": 1,
            "cam_R_m2c": pose[:, :3].flatten().tolist(),
            "cam_t_m2c": (pose[:, 3] * 1000.0).tolist(),
        }]
    import json

    with open(scene / "scene_gt.json", "w") as f:
        json.dump(gt_json, f)

    out_root = tmp_path / "adapted"
    adapt_images(str(bop), str(out_root), ["ape"])  # obj 1 -> first class name given
    obs = out_root / "data" / "observed" / "01"
    assert os.path.exists(obs / "000001-color.png")
    assert os.path.exists(obs / "000002-label.png")
    meta = sio.loadmat(str(obs / "000001-meta.mat"))
    assert meta["poses"].shape == (3, 4, 1)
    pose0 = load_pose_file(os.path.join(devkit, "data", "gt_observed", "cube", "000000-pose.txt"))
    np.testing.assert_allclose(meta["poses"][:, :, 0], pose0, atol=1e-5)
    with open(out_root / "image_set" / "observed" / "ape_all.txt") as f:
        assert len([x for x in f if x.strip()]) == 2
    label = cv2.imread(str(obs / "000001-label.png"), cv2.IMREAD_UNCHANGED)
    assert set(np.unique(label)) <= {0, 1}


def test_gen_video(devkit, tmp_path):
    import jax.numpy as jnp

    from deepim_tpu.config import Config, update_config_dict
    from deepim_tpu.toolkit.gen_video import gen_refine_video, images_to_video
    from deepim_tpu.tools.train_net import build_mesh_bank, build_model

    cfg = update_config_dict(
        Config(),
        {
            "SCALES": [H, W],
            "dataset": {
                "dataset": "LM6D_REFINE", "dataset_path": devkit, "root_path": devkit,
                "model_dir": os.path.join(devkit, "models"),
                "class_name": ["cube", "sphere"],
                "INTRINSIC_MATRIX": K_MAT.flatten().tolist(),
                "ZNEAR": 0.05, "ZFAR": 10.0,
            },
            "network": {"INPUT_MASK": True, "PRED_FLOW": False, "PRED_MASK": False},
            "TEST": {"test_iter": 2},
        },
    )
    model, params = build_model(cfg, dtype=jnp.float32)
    bank = build_mesh_bank(cfg)
    db = PairDB(name="LM6D_REFINE", devkit_path=devkit, image_set="my_val_cube", cur_class="cube")
    out = str(tmp_path / "refine.mp4")
    gen_refine_video(cfg, params, model, db.gt_pairdb(), bank, out, num_pairs=2)
    assert os.path.exists(out) and os.path.getsize(out) > 1000

    # plain image-folder -> video (gen_video_from_images.py)
    src = os.path.join(devkit, "data", "observed", "cube")
    paths = [os.path.join(src, f"{i:06d}-color.png") for i in range(3)]
    out2 = str(tmp_path / "plain.mp4")
    images_to_video(paths, out2, fps=2.0)
    assert os.path.exists(out2) and os.path.getsize(out2) > 0
