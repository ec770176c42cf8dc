"""Multi-chip (virtual 8-device CPU mesh) tests: dp-sharded train step and
sharded batched refinement compile and execute; gradients are synchronized
(replicated params remain bitwise identical across devices)."""
import numpy as np
from scipy.spatial.transform import Rotation as R

import jax
import jax.numpy as jnp

from deepim_tpu.config import Config, TrainIterConfig
from deepim_tpu.engine import (
    EngineConfig,
    MeshBuffers,
    Observation,
    TrainBatch,
    TrainState,
    make_train_step,
    refine,
    render_at_pose,
)
from deepim_tpu.engine.lr_schedule import warmup_multifactor_schedule
from deepim_tpu.engine.train import make_optimizer
from deepim_tpu.models import FlowNetDeepIM
from deepim_tpu.ops.masks import box_fill
from deepim_tpu.parallel import (
    jit_refine_dp,
    jit_train_step_dp,
    make_mesh,
    replicate_pytree,
    shard_pytree_batch,
)
from deepim_tpu.render.mesh import MeshBank, make_test_cube
from deepim_tpu.render.rasterizer import RasterConfig

H = W = 64
K_MAT = np.array([[80.0, 0, 32.0], [0, 80.0, 32.0], [0, 0, 1]], np.float32)
ECFG = EngineConfig(
    height=H, width=W,
    raster=RasterConfig(height=H, width=W, tile_h=8, tile_w=64, max_faces_per_tile=64, chunk=16, znear=0.05, zfar=10.0),
    update_mask="box_gt", num_iters=2,
)


def build(rng, b):
    bank = MeshBank.from_meshes([make_test_cube(0.08)], pad_multiple=16)
    bank_arrays = (
        jnp.asarray(bank.vertices), jnp.asarray(bank.colors),
        jnp.asarray(bank.faces), jnp.asarray(bank.face_valid),
    )
    cls_idx = jnp.zeros((b,), jnp.int32)
    meshes = MeshBuffers.gather(bank_arrays, cls_idx)
    rot = R.from_euler("xyz", rng.uniform(-0.3, 0.3, (b, 3))).as_matrix().astype(np.float32)
    pose_gt = np.concatenate([rot, np.zeros((b, 3, 1), np.float32)], 2)
    pose_gt[:, 2, 3] = 0.5
    pose0 = pose_gt.copy()
    pose0[:, 2, 3] += 0.04
    img, depth, mask = render_at_pose(meshes, jnp.asarray(pose_gt), jnp.asarray(K_MAT), ECFG)
    return bank_arrays, cls_idx, meshes, pose_gt, pose0, img, depth, mask


def test_dp_train_step_on_8_device_mesh(rng):
    mesh = make_mesh(8)
    b = 8
    bank_arrays, cls_idx, meshes, pose_gt, pose0, img, depth, mask = build(rng, b)
    model = FlowNetDeepIM(pred_flow=True, pred_mask=True)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 8)))

    ticfg = TrainIterConfig(SE3_PM_LOSS=True, LW_PM=0.1, NUM_3D_SAMPLE=16, LW_FLOW=0.25, LW_MASK=0.03)
    tx = make_optimizer(Config(), warmup_multifactor_schedule(1e-4, (1000,)))
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    n_pts = 16
    batch = TrainBatch(
        image_observed=img, mask_observed=box_fill(mask), mask_gt_observed=mask,
        depth_gt_observed=depth[:, 0], pose_rendered=jnp.asarray(pose0),
        pose_observed=jnp.asarray(pose_gt), class_index=cls_idx,
        points_model=meshes.vertices[:, :n_pts], points_weights=jnp.ones((b, n_pts)),
        k=jnp.asarray(K_MAT),
    )
    step = make_train_step(model, tx, ECFG, ticfg, "viz")
    state_d = replicate_pytree(state, mesh)
    batch_d = shard_pytree_batch(batch, mesh)
    bank_d = replicate_pytree(bank_arrays, mesh)
    pstep = jit_train_step_dp(step, mesh, state_d, batch_d, bank_d)
    new_state, metrics, pose_final = pstep(state_d, batch_d, bank_d)
    jax.block_until_ready(new_state)
    assert int(new_state.step) == 2
    assert np.isfinite(np.asarray(metrics["total"])).all()
    assert pose_final.shape == (b, 3, 4)
    # Params identical to a single-device run of the same step (grad sync).
    sstep = jax.jit(step)
    sstate, smetrics, _ = sstep(state, batch, bank_arrays)
    diff = jax.tree_util.tree_map(
        lambda a, b_: float(jnp.max(jnp.abs(a - b_))), new_state.params, sstate.params
    )
    max_diff = max(jax.tree_util.tree_leaves(diff))
    assert max_diff < 5e-5, max_diff


def test_dp_refine_sharded(rng):
    mesh = make_mesh(8)
    b = 8
    bank_arrays, cls_idx, meshes, pose_gt, pose0, img, depth, mask = build(rng, b)
    model = FlowNetDeepIM(pred_flow=True, pred_mask=True)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 8)))
    obs = Observation(
        image_observed=img, mask_observed=box_fill(mask), mask_gt_observed=None,
        depth_observed=None, k=jnp.asarray(K_MAT),
    )

    def refine_fn(params, obs, meshes, pose0):
        return refine(params, model, obs, meshes, pose0, ECFG)

    obs_d = shard_pytree_batch(obs, mesh)
    meshes_d = shard_pytree_batch(meshes, mesh)
    params_d = replicate_pytree(params, mesh)
    pose0_d = shard_pytree_batch(jnp.asarray(pose0), mesh)
    prefine = jit_refine_dp(refine_fn, mesh, params_d, obs_d, meshes_d)
    pose_final, poses = prefine(params_d, obs_d, meshes_d, pose0_d)
    jax.block_until_ready(pose_final)
    assert pose_final.shape == (b, 3, 4)
    assert poses.shape == (2, b, 3, 4)
    assert np.isfinite(np.asarray(pose_final)).all()
