"""Batched test-time refinement + evaluation driver.

Replaces deepim/core/tester.py (Predictor :27-43, pred_eval :50-529): the
reference enforces batch 1 per GPU (:83) and loops predict -> host pose
update -> OpenGL re-render -> update_data_batch per iteration (:389-485).
Here the whole 4-iteration refinement is one jitted scan over a large batch
(optionally dp-sharded across all chips), and the per-iteration poses come
back in one device->host transfer per batch.

Sentinel invalid initial poses (all entries -1, sum == -12: PoseCNN failed
to detect the object, tester.py:285-297) bypass refinement: their estimated
pose stays at the sentinel, which fails every evaluation threshold —
equivalent to the reference's error-1000 bookkeeping.

Results are cached to a pickle (tester.py:64-80, :504-509) so re-evaluation
skips inference.
"""
from __future__ import annotations

import os
import pickle
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from deepim_tpu.config import Config
from deepim_tpu.data.loader import TestLoader
from deepim_tpu.engine.refine import EngineConfig, MeshBuffers, Observation, refine
from deepim_tpu.eval.evaluator import PoseEvaluator
from deepim_tpu.utils.logger import logger


def is_sentinel_pose(pose: np.ndarray) -> np.ndarray:
    """PoseCNN no-detection sentinel: the stored pose is all -1
    (tester.py:285-297)."""
    return np.abs(pose.reshape(pose.shape[0], -1).sum(axis=1) + 12.0) < 1e-6


def _make_evaluator(cfg: Config, class_dbs: list, num_iters: int) -> "PoseEvaluator":
    all_classes = list(class_dbs[0][0].classes)
    points = {c: db.points(c) for db, _ in class_dbs for c in [db.cur_class]}
    diameters = {c: db.diameter(c) for db, _ in class_dbs for c in [db.cur_class]}
    return PoseEvaluator(
        all_classes, points, diameters, cfg.dataset.intrinsic_matrix(), num_iters
    )


def eval_precomputed_poses(cfg: Config, class_dbs: list, icp: bool = True) -> dict:
    """TEST.PRECOMPUTED_ICP / TEST.BEFORE_ICP evaluation paths
    (deepim/core/tester.py:193-279): instead of running the network, read a
    precomputed refined pose from the file next to each rendered depth
    (`-pose_icp.txt` after ICP, `-pose.txt` before) and run the standard
    evaluators at a single iteration."""
    from deepim_tpu.eval.evaluator import _rot_trans_errors

    suffix = "-pose_icp.txt" if icp else "-pose.txt"
    all_classes = list(class_dbs[0][0].classes)
    poses_est = [[[]] for _ in all_classes]
    poses_gt = [[[]] for _ in all_classes]
    for db, pairdb in class_dbs:
        cls_idx = all_classes.index(db.cur_class)
        for rec in pairdb:
            pose_path = rec["depth_rendered"][: -len("-depth.png")] + suffix
            pose = np.loadtxt(pose_path, skiprows=1).astype(np.float32).reshape(3, 4)
            poses_est[cls_idx][0].append(pose)
            poses_gt[cls_idx][0].append(rec["pose_observed"])
        rot_err, trans_err = _rot_trans_errors(
            np.stack(poses_est[cls_idx][0]), np.stack(poses_gt[cls_idx][0])
        )
        logger.info(
            "precomputed %s %s: rot %.2f +/- %.2f deg, trans %.2f +/- %.2f cm",
            "ICP" if icp else "init", db.cur_class,
            np.mean(rot_err), np.std(rot_err),
            np.mean(trans_err) * 100, np.std(trans_err) * 100,
        )
    evaluator = _make_evaluator(cfg, class_dbs, 1)
    return {
        "pose": evaluator.evaluate_pose(poses_est, poses_gt),
        "add": evaluator.evaluate_pose_add(poses_est, poses_gt),
        "arp_2d": evaluator.evaluate_pose_arp_2d(poses_est, poses_gt),
    }


def eval_flow_epe(
    cfg: Config,
    params: Any,
    model: Any,
    class_dbs: list,
    bank_arrays: tuple,
    batch_size: int = 8,
) -> dict:
    """Flow end-point-error evaluation (tester.py:340-377, :513-515;
    GT per par_generate_gt :530-569; accumulation per calc_EPE_one_pair
    :572-589).  Runs the full TEST.test_iter refinement, un-zooms each
    iteration's predicted flow to the full frame, and compares against the
    depth-reprojection GT flow at that iteration's source pose.  Reports
    mean EPE over all pixels, visible pixels, and visible+background pixels
    — both PER ITERATION ('per_iter') and for iteration 1 (the top-level
    keys, matching the reference's single-step statistics)."""
    from deepim_tpu.data.preprocess import load_depth, load_gt_observed_mask, resize_to
    from deepim_tpu.engine.refine import refine_step
    from deepim_tpu.ops.flow import flow_from_depth
    from deepim_tpu.ops.zoom import zoom_flow

    ecfg = EngineConfig.from_config(cfg, train=False, bank_arrays=bank_arrays)
    nf = float(cfg.dataset.NORMALIZE_FLOW)
    n_iter = max(1, cfg.TEST.test_iter)

    @jax.jit
    def flow_steps(params, obs, meshes, pose0):
        def step(pose, it):
            pose_new, aux = refine_step(params, model, obs, meshes, pose, ecfg,
                                        iter_index=it)
            flow_zoom = jnp.transpose(aux["net"]["flow"], (0, 3, 1, 2)) * nf
            flow_full = zoom_flow(flow_zoom, aux["zoom_factor"], inverse=True)
            return pose_new, (flow_full, aux["depth_rendered"][:, 0], pose)

        _, ys = jax.lax.scan(step, pose0, jnp.arange(n_iter))
        return ys  # (flows (I,B,2,H,W), depths (I,B,H,W), poses_src (I,B,3,4))

    sums = [
        {"epe_all": 0.0, "num_all": 0.0, "epe_viz": 0.0, "num_viz": 0.0,
         "epe_vizbg": 0.0, "num_vizbg": 0.0}
        for _ in range(n_iter)
    ]
    for db, pairdb in class_dbs:
        loader = TestLoader(pairdb, cfg, batch_size)
        recs_iter = iter(pairdb)
        for batch, valid in loader.batches():
            pose0 = batch["pose_rendered"]
            sentinel = is_sentinel_pose(pose0)
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
            safe_pose0 = pose0.copy()
            safe_pose0[sentinel] = np.eye(3, 4, dtype=np.float32)
            safe_pose0[sentinel, 2, 3] = 1.0
            flow_pred, depth_rend, poses_src = flow_steps(
                params, obs, meshes, jnp.asarray(safe_pose0)
            )
            flow_pred = np.asarray(flow_pred)    # (I, B, 2, H, W)
            depth_rend = np.asarray(depth_rend)  # (I, B, H, W)
            poses_src = np.asarray(poses_src)    # (I, B, 3, 4)
            for j in range(valid):
                rec = next(recs_iter)
                if sentinel[j]:
                    continue
                # GT flow from the rendered depth and the (masked) gt-observed
                # depth (par_generate_gt, tester.py:530-569), per iteration at
                # that iteration's SOURCE pose.
                d_obs = load_depth(rec["depth_gt_observed"], cfg.dataset.DEPTH_FACTOR)
                label = load_gt_observed_mask(rec, cfg.dataset.DEPTH_FACTOR)
                # Stored depths are at the devkit's native resolution; bring
                # them to SCALES when they differ (same resize the train-side
                # sample builder applies, preprocess.make_train_sample).
                if d_obs.shape != depth_rend[0, j].shape:
                    ts, ms = cfg.SCALES[0]
                    d_obs = resize_to(d_obs, ts, ms)[0]
                    label = (resize_to(label, ts, ms)[0] >= 0.5).astype(np.float32)
                d_obs = d_obs * (label > 0)
                gt_flow, gt_valid = flow_from_depth(
                    jnp.asarray(depth_rend[:, j]),
                    jnp.asarray(np.tile(d_obs[None], (n_iter, 1, 1))),
                    jnp.asarray(poses_src[:, j]),
                    jnp.asarray(np.tile(rec["pose_observed"][None], (n_iter, 1, 1))),
                    jnp.asarray(batch["k"]),
                    standard_rep=cfg.network.STANDARD_FLOW_REP,
                )
                gt_flow = np.asarray(gt_flow)        # (I, 2, H, W)
                gt_valid = np.asarray(gt_valid) > 0  # (I, H, W)
                for it in range(n_iter):
                    visible = gt_valid[it]
                    bg = np.logical_and(~visible, depth_rend[it, j] == 0)
                    diff = np.sqrt(np.sum(np.square(gt_flow[it] - flow_pred[it, j]), axis=0))
                    s = sums[it]
                    s["epe_all"] += diff.sum()
                    s["num_all"] += diff.size
                    s["epe_viz"] += diff[visible].sum()
                    s["num_viz"] += visible.sum()
                    vizbg = np.logical_or(visible, bg)
                    s["epe_vizbg"] += diff[vizbg].sum()
                    s["num_vizbg"] += vizbg.sum()
    per_iter = [
        {
            "epe_all": s["epe_all"] / max(s["num_all"], 1.0),
            "epe_viz": s["epe_viz"] / max(s["num_viz"], 1.0),
            "epe_vizbg": s["epe_vizbg"] / max(s["num_vizbg"], 1.0),
        }
        for s in sums
    ]
    out = dict(per_iter[0])
    out["per_iter"] = per_iter
    for it, row in enumerate(per_iter):
        logger.info(
            "EPE iter %d: all %.4f, ignore-unvisible %.4f, visible %.4f",
            it + 1, row["epe_all"], row["epe_vizbg"], row["epe_viz"],
        )
    return out


def pred_eval(
    cfg: Config,
    params: Any,
    model: Any,
    class_dbs: list,           # list of (PairDB, pairdb records) per class
    bank_arrays: tuple,        # MeshBank device arrays (class-indexable)
    output_dir: str,
    batch_size: int = 16,
    refine_jit=None,
) -> dict:
    ecfg = EngineConfig.from_config(cfg, train=False, bank_arrays=bank_arrays)
    num_iters = cfg.TEST.test_iter
    classes = [db.cur_class for db, _ in class_dbs]
    all_classes = list(class_dbs[0][0].classes)

    cache_file = os.path.join(output_dir, "results_pose.pkl")
    if os.path.exists(cache_file):
        with open(cache_file, "rb") as f:
            all_poses_est, all_poses_gt = pickle.load(f)
        logger.info("loaded cached results from %s", cache_file)
    else:
        all_poses_est = [[[] for _ in range(num_iters)] for _ in all_classes]
        all_poses_gt = [[[] for _ in range(num_iters)] for _ in all_classes]

        if refine_jit is None:
            @jax.jit
            def refine_jit(params, obs, meshes, pose0):
                return refine(params, model, obs, meshes, pose0, ecfg, num_iters,
                              with_stats=True)[:3]

        t_data = t_net = 0.0
        for db, pairdb in class_dbs:
            cls_idx = all_classes.index(db.cur_class)
            loader = TestLoader(pairdb, cfg, batch_size)
            t0 = time.time()
            for batch, valid in loader.batches():
                t_data += time.time() - t0
                t0 = time.time()
                pose0 = batch["pose_rendered"]
                sentinel = is_sentinel_pose(pose0)
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
                # Sentinel poses get a safe placeholder for the device pass.
                safe_pose0 = pose0.copy()
                safe_pose0[sentinel] = np.eye(3, 4, dtype=np.float32)
                safe_pose0[sentinel, 2, 3] = 1.0
                out = refine_jit(params, obs, meshes, jnp.asarray(safe_pose0))
                poses = np.asarray(out[1])  # (iters, B, 3, 4)
                if len(out) > 2:
                    nd = int(np.asarray(out[2]["raster_dropped"]))
                    if nd:
                        # Loud on every backend (the in-jit debug-print only
                        # works where host callbacks do): the CSR budget was
                        # too small for these poses; results have holes.
                        logger.warning(
                            "rasterizer dropped %d face-tile pairs for class "
                            "%s - raise RasterConfig.bin_pairs", nd, db.cur_class,
                        )
                t_net += time.time() - t0
                for it in range(num_iters):
                    for j in range(valid):
                        if sentinel[j]:
                            all_poses_est[cls_idx][it].append(pose0[j])
                        else:
                            all_poses_est[cls_idx][it].append(poses[it, j])
                        all_poses_gt[cls_idx][it].append(batch["pose_observed"][j])
                t0 = time.time()
        logger.info("pred_eval timing: data %.1fs net %.1fs", t_data, t_net)
        os.makedirs(output_dir, exist_ok=True)
        with open(cache_file, "wb") as f:
            pickle.dump([all_poses_est, all_poses_gt], f, protocol=4)

    # Evaluation (LM6D_REFINE.py evaluators).
    evaluator = _make_evaluator(cfg, class_dbs, num_iters)
    results = {
        "pose": evaluator.evaluate_pose(all_poses_est, all_poses_gt),
        "add": evaluator.evaluate_pose_add(all_poses_est, all_poses_gt),
        "arp_2d": evaluator.evaluate_pose_arp_2d(all_poses_est, all_poses_gt),
    }
    dump_proj2d_curves(results["arp_2d"], output_dir, num_iters)
    return results


def dump_proj2d_curves(arp_2d: dict, output_dir: str, num_iters: int) -> None:
    """Write the per-class Proj2D accuracy-vs-pixel-threshold tables — the
    Occlusion-LINEMOD reporting artifact (README.md:43-49,
    assets/LM6d_Occ_results.png is the plotted form of exactly this data)."""
    classes = [c for c in arp_2d if arp_2d[c]]
    if not classes:
        return
    os.makedirs(output_dir, exist_ok=True)
    for it in range(num_iters):
        rows = {c: arp_2d[c][it] for c in classes if it in arp_2d[c]}
        if not rows:
            continue
        path = os.path.join(output_dir, f"proj2d_curves_iter{it + 1}.txt")
        first = next(iter(rows.values()))
        thr = np.asarray(first["curve_thresholds"])
        with open(path, "w") as f:
            f.write("# Proj2D accuracy (%) vs pixel threshold, iter "
                    f"{it + 1}\n# px " + " ".join(classes) + "\n")
            for ti in range(0, len(thr), 10):  # 1 px steps of the 0.1 px grid
                vals = " ".join(f"{rows[c]['curve'][ti]:.2f}" for c in classes)
                f.write(f"{thr[ti]:.1f} {vals}\n")
        logger.info("wrote %s", path)
