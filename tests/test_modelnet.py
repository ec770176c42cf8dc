"""Unseen-object (ModelNet-style) path: lit rendering + class-agnostic
refinement on meshes never used elsewhere in the tests."""
import os

import numpy as np
from scipy.spatial.transform import Rotation as R

import jax
import jax.numpy as jnp

from deepim_tpu.data.modelnet import ModelNetDB, write_modelnet_lists
from deepim_tpu.engine import EngineConfig, LightParams, MeshBuffers, Observation, refine, render_at_pose
from deepim_tpu.models import FlowNetDeepIM
from deepim_tpu.ops.masks import box_fill
from deepim_tpu.render.lighting import compute_vertex_normals, lit_vertex_colors
from deepim_tpu.render.mesh import make_icosphere, make_test_cube, write_obj
from deepim_tpu.render.rasterizer import RasterConfig

H = W = 64
K_MAT = np.array([[80.0, 0, 32.0], [0, 80.0, 32.0], [0, 0, 1]], np.float32)
ECFG = EngineConfig(
    height=H, width=W,
    raster=RasterConfig(height=H, width=W, tile_h=16, tile_w=16, max_faces_per_tile=128, chunk=16, znear=0.05, zfar=10.0),
    update_mask="box_rendered", num_iters=2,
)


def test_vertex_normals_sphere():
    mesh = make_icosphere(0.05, 2)
    n = compute_vertex_normals(mesh.vertices, mesh.faces)
    # Sphere normals point radially outward.
    radial = mesh.vertices / np.linalg.norm(mesh.vertices, axis=1, keepdims=True)
    dots = np.sum(n * radial, axis=1)
    assert dots.min() > 0.95


def test_lighting_modulates_brightness(rng):
    mesh = make_icosphere(0.05, 1)
    b = 1
    verts = jnp.asarray(mesh.vertices[None])
    normals = jnp.asarray(compute_vertex_normals(mesh.vertices, mesh.faces)[None])
    cols = jnp.asarray(np.full((1, mesh.num_vertices, 3), 200.0, np.float32))
    pose = np.eye(3, 4, dtype=np.float32)[None]
    pose[0, 2, 3] = 0.5
    lit = lit_vertex_colors(
        verts, normals, cols, jnp.asarray(pose),
        jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray([1.0, 1.0, 1.0]), 0.4,
    )
    lit = np.asarray(lit)
    assert lit.min() >= 200.0 * 0.6 - 1e-3  # ambient floor = (1 - k) * base
    assert lit.max() > lit.min() + 5.0      # directional variation
    assert lit.max() <= 255.0


def test_modelnet_db_and_refinement(tmp_path, rng):
    # Author two "novel" meshes + pose list files.
    mesh_dir = tmp_path / "models"
    os.makedirs(mesh_dir)
    meshes = {"obj0": make_test_cube(0.09), "obj1": make_icosphere(0.055, 1)}
    paths = []
    for name, m in meshes.items():
        p = str(mesh_dir / f"{name}.obj")
        write_obj(p, m)
        paths.append(p)
    poses = []
    nprng = np.random.RandomState(3)
    for i in range(4):
        rot = R.random(random_state=nprng).as_matrix().astype(np.float32)
        pose = np.concatenate([rot, np.array([[0.0], [0.0], [0.55]], np.float32)], 1)
        poses.append((i % 2, pose))
    model_file, pose_file = write_modelnet_lists(str(tmp_path), paths, poses)

    db = ModelNetDB(model_file=model_file, pose_file=pose_file)
    bank = db.mesh_bank()
    assert bank.normals is not None
    records = db.sample_records()
    assert len(records) == 4

    bank_arrays = (
        jnp.asarray(bank.vertices), jnp.asarray(bank.colors),
        jnp.asarray(bank.faces), jnp.asarray(bank.face_valid),
        jnp.asarray(bank.normals),
    )
    cls_idx = jnp.asarray([r["model_index"] for r in records], jnp.int32)
    mesh_buf = MeshBuffers.gather(bank_arrays, cls_idx)
    assert mesh_buf.normals is not None

    pose_gt = jnp.asarray(np.stack([r["pose_observed"] for r in records]))
    pose0 = jnp.asarray(np.stack([r["pose_rendered"] for r in records]))
    light = LightParams(
        position=jnp.asarray(np.stack([r["light_position"] for r in records])),
        intensity=jnp.asarray(np.stack([r["light_intensity"] for r in records])),
        brightness_ratio=jnp.asarray(np.stack([r["brightness_ratio"] for r in records])),
    )
    img, depth, mask = render_at_pose(mesh_buf, pose_gt, jnp.asarray(K_MAT), ECFG, light)
    assert float(jnp.sum(mask)) > 100

    model = FlowNetDeepIM(pred_flow=True, pred_mask=True)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 8)))
    obs = Observation(
        image_observed=img, mask_observed=box_fill(mask), mask_gt_observed=None,
        depth_observed=None, k=jnp.asarray(K_MAT), light=light,
    )
    pose_final, iters = jax.jit(
        lambda p, o, m, p0: refine(p, model, o, m, p0, ECFG)
    )(params, obs, mesh_buf, pose0)
    assert pose_final.shape == (4, 3, 4)
    assert np.isfinite(np.asarray(pose_final)).all()


def test_modelnet_driver_eval(tmp_path, rng):
    """test_deepim dispatches ModelNet datasets to the unseen-object
    evaluator (deepim/train.py:74 / tester.py:114 dataset branch)."""
    from deepim_tpu.config import Config, update_config_dict
    from deepim_tpu.tools.test_net import test_deepim
    from deepim_tpu.tools.train_net import build_model

    mesh_dir = tmp_path / "models"
    os.makedirs(mesh_dir)
    paths = []
    for name, m in {"c": make_test_cube(0.09), "s": make_icosphere(0.055, 1)}.items():
        p = str(mesh_dir / f"{name}.obj")
        write_obj(p, m)
        paths.append(p)
    nprng = np.random.RandomState(5)
    poses = []
    for i in range(5):
        rot = R.random(random_state=nprng).as_matrix().astype(np.float32)
        poses.append((i % 2, np.concatenate([rot, np.array([[0.0], [0.0], [0.55]], np.float32)], 1)))
    model_file, pose_file = write_modelnet_lists(str(tmp_path), paths, poses)

    cfg = update_config_dict(
        Config(),
        {
            "SCALES": [H, W],
            "output_path": str(tmp_path / "out"),
            "dataset": {
                "dataset": "ModelNet_lit", "model_file": model_file, "pose_file": pose_file,
                "INTRINSIC_MATRIX": K_MAT.flatten().tolist(),
                "ZNEAR": 0.05, "ZFAR": 10.0,
            },
            "network": {"INPUT_MASK": True, "PRED_FLOW": False, "PRED_MASK": False},
            "TEST": {"test_iter": 2, "UPDATE_MASK": "box_rendered"},
        },
    )
    model, params = build_model(cfg)
    results = test_deepim(cfg, output_dir=str(tmp_path / "out"), params=params, batch_size=4)
    assert len(results["iters"]) == 2
    assert results["init"]["rot_err"].shape == (5,)
    for it in results["iters"]:
        assert np.isfinite(it["rot_err"]).all() and np.isfinite(it["trans_err"]).all()
