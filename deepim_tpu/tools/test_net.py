"""Test driver: the deepim/test.py:57-176 (test_deepim) equivalent —
build the test model, restore a checkpoint, run batched sharded refinement
over every test class and evaluate."""
from __future__ import annotations

import os

import jax.numpy as jnp

from deepim_tpu.config import Config
from deepim_tpu.data.pairdb import load_gt_pairdb
from deepim_tpu.engine.checkpoint import load_checkpoint
from deepim_tpu.engine.tester import eval_flow_epe, eval_precomputed_poses, pred_eval
from deepim_tpu.engine.train import TrainState
from deepim_tpu.tools.train_net import build_mesh_bank, build_model
from deepim_tpu.utils.logger import create_logger, logger


def test_modelnet(cfg: Config, params, model, batch_size: int = 16) -> dict:
    """Unseen-object evaluation: the deepim/test.py ModelNet branch
    (tester.py:114, batch_updater_py_multi.py:35).  Novel meshes come from
    dataset.model_file/pose_file lists (config.py:52-53); observed views are
    rendered with the per-sample point-light model and refinement runs with
    lit re-rendering.  Reports per-iteration rotation/translation errors vs
    the perturbed init poses (the reference publishes qualitative overlays
    only, README.md:51-58)."""
    import jax
    import numpy as np

    from deepim_tpu.data.modelnet import ModelNetDB
    from deepim_tpu.engine import Observation, refine
    from deepim_tpu.engine.refine import EngineConfig, LightParams, MeshBuffers, render_at_pose
    from deepim_tpu.ops.masks import box_fill

    db = ModelNetDB(cfg.dataset.model_file, cfg.dataset.pose_file)
    bank = db.mesh_bank()
    bank_arrays = (
        jnp.asarray(bank.vertices), jnp.asarray(bank.colors),
        jnp.asarray(bank.faces), jnp.asarray(bank.face_valid),
        jnp.asarray(bank.normals),
    )
    records = db.sample_records()
    ecfg = EngineConfig.from_config(cfg, train=False, bank_arrays=bank_arrays)
    k = jnp.asarray(cfg.dataset.intrinsic_matrix())

    @jax.jit
    def run(params, cls_idx, pose_gt, pose0, lpos, lint, lbr):
        meshes = MeshBuffers.gather(bank_arrays, cls_idx)
        light = LightParams(lpos, lint, lbr)
        img, _depth, mask = render_at_pose(meshes, pose_gt, k, ecfg, light)
        obs = Observation(
            image_observed=img, mask_observed=box_fill(mask), mask_gt_observed=None,
            depth_observed=None, k=k, light=light,
        )
        return refine(params, model, obs, meshes, pose0, ecfg)[1]  # (iters, B, 3, 4)

    n = len(records)
    all_poses = []
    for start in range(0, n, batch_size):
        recs = [records[min(start + j, n - 1)] for j in range(batch_size)]
        poses = run(
            params,
            jnp.asarray([r["model_index"] for r in recs], jnp.int32),
            jnp.asarray(np.stack([r["pose_observed"] for r in recs])),
            jnp.asarray(np.stack([r["pose_rendered"] for r in recs])),
            jnp.asarray(np.stack([r["light_position"] for r in recs])),
            jnp.asarray(np.stack([r["light_intensity"] for r in recs])),
            jnp.asarray(np.stack([r["brightness_ratio"] for r in recs])),
        )
        all_poses.append(np.asarray(poses)[:, : min(batch_size, n - start)])
    poses_iter = np.concatenate(all_poses, axis=1)  # (iters, N, 3, 4)

    pose_gt = np.stack([r["pose_observed"] for r in records])
    pose0 = np.stack([r["pose_rendered"] for r in records])

    def errs(poses_est):
        terr = np.linalg.norm(poses_est[:, :, 3] - pose_gt[:, :, 3], axis=-1)
        tr = np.einsum("bij,bij->b", poses_est[:, :, :3], pose_gt[:, :, :3])
        rerr = np.degrees(np.arccos(np.clip((tr - 1.0) / 2.0, -1.0, 1.0)))
        return rerr, terr

    results = {"iters": []}
    r0, t0 = errs(pose0)
    logger.info(
        "ModelNet init: rot<5deg %.2f, trans<5cm %.2f (mean %.2fdeg / %.1fmm)",
        np.mean(r0 < 5) * 100, np.mean(t0 < 0.05) * 100, r0.mean(), t0.mean() * 1000,
    )
    results["init"] = {"rot_err": r0, "trans_err": t0}
    for it in range(poses_iter.shape[0]):
        r, t = errs(poses_iter[it])
        logger.info(
            "ModelNet iter %d: 5cm5deg %.2f (rot<5deg %.2f, trans<5cm %.2f; mean %.2fdeg / %.1fmm)",
            it + 1, np.mean((r < 5) & (t < 0.05)) * 100,
            np.mean(r < 5) * 100, np.mean(t < 0.05) * 100, r.mean(), t.mean() * 1000,
        )
        results["iters"].append({"rot_err": r, "trans_err": t})
    return results


def test_deepim(cfg: Config, output_dir: str | None = None, params=None, batch_size: int = 16) -> dict:
    if output_dir is None:
        output_dir = create_logger(
            cfg.output_path, cfg.TRAIN.model_prefix, cfg.dataset.test_image_set
        )
    model, init_params = build_model(cfg)
    if params is None:
        prefix = os.path.join(output_dir, cfg.TRAIN.model_prefix)
        state = TrainState(init_params, None, 0)
        try:
            state = load_checkpoint(prefix, cfg.TEST.test_epoch, state)
            params = state.params
            logger.info("loaded params for test epoch %d", cfg.TEST.test_epoch)
        except Exception as e:
            params = init_params
            logger.warning(
                "no checkpoint restored from %s epoch %d (%s); using init params",
                prefix, cfg.TEST.test_epoch, e,
            )

    # FAST_TEST head gating (test symbol construction,
    # deepIM_flownet.py:624-676): under the shipped eval protocol
    # (FAST_TEST=True, UPDATE_MASK='box_rendered') the flow decoder and mask
    # head are dropped from the test graph entirely.  The flax params dict
    # from the full checkpoint still applies — unused subtrees are ignored.
    keep_flow = cfg.network.PRED_FLOW and not cfg.TEST.FAST_TEST
    keep_mask = cfg.network.PRED_MASK and (
        cfg.TEST.UPDATE_MASK not in ("init", "box_rendered") or not cfg.TEST.FAST_TEST
    )
    eval_model = model
    if (keep_flow, keep_mask) != (cfg.network.PRED_FLOW, cfg.network.PRED_MASK):
        from deepim_tpu.models import FlowNetDeepIM

        eval_model = FlowNetDeepIM(
            pred_flow=keep_flow, pred_mask=keep_mask,
            num_regressors=cfg.network.REGRESSOR_NUM,
            rot_dim=3 if cfg.network.ROT_TYPE == "EULER" else 4, dtype=jnp.bfloat16,
        )

    if cfg.dataset.dataset.startswith("ModelNet"):
        return test_modelnet(cfg, params, eval_model, batch_size)

    bank_arrays = build_mesh_bank(cfg)
    dataset_name = cfg.dataset.dataset.split("+")[0]
    iset = cfg.dataset.test_image_set
    class_dbs = []
    for cls in cfg.dataset.class_name:
        db, pairdb = load_gt_pairdb(
            cfg, dataset_name, iset + cls if iset.endswith("_") else iset,
            cls, cfg.dataset.root_path, cfg.dataset.dataset_path,
            pair_flip=cfg.TEST.FLIP_PAIR,
        )
        class_dbs.append((db, pairdb))
    # Precomputed-pose evaluation shortcuts (tester.py:193-279): evaluate the
    # stored ICP-refined (or initial) poses instead of running the network.
    if cfg.TEST.PRECOMPUTED_ICP:
        return eval_precomputed_poses(cfg, class_dbs, icp=True)
    if cfg.TEST.BEFORE_ICP:
        return eval_precomputed_poses(cfg, class_dbs, icp=False)
    results = pred_eval(cfg, params, eval_model, class_dbs, bank_arrays, output_dir, batch_size)
    if cfg.network.PRED_FLOW and not cfg.TEST.FAST_TEST:
        results["flow_epe"] = eval_flow_epe(cfg, params, model, class_dbs, bank_arrays, batch_size)
    if cfg.TEST.VIS_VIDEO:
        # Per-class refinement-iteration videos (deepim/test.py:38-42
        # --vis_video; composition per toolkit/gen_video_iter_*).
        from deepim_tpu.toolkit.gen_video import gen_refine_video

        for db, pairdb in class_dbs:
            gen_refine_video(
                cfg, params, eval_model, pairdb, bank_arrays,
                os.path.join(output_dir, f"video_{db.cur_class}.mp4"),
            )
    return results
