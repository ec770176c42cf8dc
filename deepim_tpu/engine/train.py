"""The jitted training step: render-and-compare with on-device label refresh.

Replaces the reference training inner loop (deepim/core/module.py:1131-1137 +
lib/pair_matching/batch_updater_py_multi.py:91-328), which for each of
TRAIN_ITER_SIZE=4 inner iterations ran forward/backward on device, read the
SE(3) predictions back to host, applied the pose update in numpy, re-rendered
each sample through OpenGL, refreshed flow labels through a CUDA kernel, and
rebuilt the batch.  Here the whole inner loop is a `lax.scan` inside ONE
jitted function: render, zoom, network, losses, SGD update, pose update and
label refresh (calc_RT_delta + flow_from_depth) all stay on chip.

Semantics preserved from the reference:
* each inner iteration performs a full optimizer update (module.py:1131-1137
  order: forward/backward -> update -> re-render with the *pre-update*
  predictions);
* labels are recomputed from the refined pose before the next iteration
  (batch_updater_py_multi.py:239-298);
* the observed-side mask follows TRAIN.UPDATE_MASK (box_gt keeps the
  loader-provided box; the rendered mask refreshes from depth > 0.2).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from deepim_tpu.config import Config, TrainIterConfig
from deepim_tpu.engine.losses import flow_loss, mask_loss, point_matching_loss, se3_dist_loss
from deepim_tpu.engine.refine import EngineConfig, MeshBuffers, Observation, refine_step
from deepim_tpu.geometry.rotations import mat2quat
from deepim_tpu.geometry.se3 import calc_RT_delta
from deepim_tpu.ops.flow import flow_from_depth
from deepim_tpu.ops.pointmatch import transform3d
from deepim_tpu.ops.zoom import zoom_flow, zoom_trans


class TrainBatch(NamedTuple):
    """One training batch (all device arrays, NCHW images)."""

    image_observed: jax.Array     # (B, 3, H, W) RGB [0, 255]
    mask_observed: jax.Array      # (B, 1, H, W) strategy-applied (box_gt + dilate)
    mask_gt_observed: jax.Array   # (B, 1, H, W)
    depth_gt_observed: jax.Array  # (B, H, W) meters
    pose_rendered: jax.Array      # (B, 3, 4) initial/source pose
    pose_observed: jax.Array      # (B, 3, 4) target pose
    class_index: jax.Array        # (B,) int32
    points_model: jax.Array       # (B, N, 3) sampled model points (zero-padded)
    points_weights: jax.Array     # (B, N) 1 for real points
    k: jax.Array                  # (3, 3)
    depth_observed: jax.Array | None = None  # (B, 1, H, W) if INPUT_DEPTH


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array  # global update counter (drives the LR schedule)


def make_optimizer(cfg: Config, schedule) -> optax.GradientTransformation:
    """TRAIN.optimizer='sgd': SGD + momentum + weight decay, the reference
    recipe (train.py:243-254; MXNet wd is L2 decay folded into the
    gradient).  'adam': Adam + decoupled weight decay — an extension for
    from-scratch training, where the reference recipe (which always
    fine-tunes pretrained FlowNet features) learns impractically slowly.
    Optional global-norm clipping for either."""
    parts = []
    if cfg.TRAIN.grad_clip > 0:
        parts.append(optax.clip_by_global_norm(cfg.TRAIN.grad_clip))
    name = cfg.TRAIN.optimizer.lower()
    if name == "sgd":
        parts += [
            optax.add_decayed_weights(cfg.TRAIN.wd),
            optax.sgd(learning_rate=schedule, momentum=cfg.TRAIN.momentum),
        ]
    elif name == "adam":
        parts.append(optax.adamw(learning_rate=schedule, weight_decay=cfg.TRAIN.wd))
    else:
        raise ValueError(f"Unknown TRAIN.optimizer {cfg.TRAIN.optimizer!r}")
    tx = optax.chain(*parts)
    if cfg.TRAIN.skip_nonfinite:
        # From-scratch iterated training can hit isolated non-finite batches
        # (a diverged inner-loop pose early in training); skip those updates
        # instead of poisoning the parameters forever.  Not in the reference
        # (which always fine-tunes pretrained FlowNet and never needs it).
        tx = optax.apply_if_finite(tx, max_consecutive_errors=100)
    return tx


def flow_weights_from_valid(valid: jax.Array, weight_type: str, depth_src: jax.Array) -> jax.Array:
    """Expand the visibility map into per-channel flow weights
    (lib/utils/image.py:436-442).  valid, depth_src: (B, H, W) -> (B, 2, H, W)."""
    if weight_type == "all":
        w = jnp.ones_like(valid)
    elif weight_type == "viz":
        w = valid
    elif weight_type == "valid":
        w = jnp.logical_or(depth_src == 0, valid > 0).astype(valid.dtype)
    else:
        raise ValueError(f"Unknown FLOW_WEIGHT_TYPE {weight_type}")
    return jnp.tile(w[:, None], (1, 2, 1, 1))


def compute_losses(
    params: Any,
    model: Any,
    batch: TrainBatch,
    meshes: MeshBuffers,
    pose_src: jax.Array,
    ecfg: EngineConfig,
    ticfg: TrainIterConfig,
    flow_weight_type: str,
):
    """One forward pass + all enabled losses at the current source pose."""
    obs = Observation(
        image_observed=batch.image_observed,
        mask_observed=batch.mask_observed,
        mask_gt_observed=batch.mask_gt_observed,
        depth_observed=batch.depth_observed,
        k=batch.k,
        class_index=batch.class_index,
    )
    pose_new, aux = refine_step(params, model, obs, meshes, pose_src, ecfg)
    zf = aux["zoom_factor"]
    zf_arr = zf.as_array()
    t_means = jnp.asarray(ecfg.trans_means, jnp.float32)
    t_stds = jnp.asarray(ecfg.trans_stds, jnp.float32)

    losses = {}
    total = 0.0

    if ticfg.SE3_PM_LOSS:
        points_obs = (
            jnp.einsum("bij,bnj->bni", batch.pose_observed[:, :, :3], batch.points_model)
            + batch.pose_observed[:, None, :, 3]
        )
        points_est = transform3d(
            batch.points_model,
            aux["rot"],
            aux["trans"],
            pose_src,
            t_means,
            t_stds,
            ecfg.rot_coord,
        )
        pm = point_matching_loss(
            points_est, points_obs, batch.points_weights, ticfg, ecfg.normalize_3d_point
        )
        losses["pm_loss"] = pm
        total = total + pm

    if ticfg.SE3_DIST_LOSS:
        r_delta, t_delta = calc_RT_delta(
            pose_src, batch.pose_observed, t_means, t_stds, ecfg.rot_coord
        )
        rot_gt = mat2quat(r_delta)
        zoom_trans_gt = zoom_trans(t_delta, zf_arr, False, False)
        rot_l, trans_l = se3_dist_loss(
            aux["rot"], aux["zoom_trans"], rot_gt, zoom_trans_gt, ticfg
        )
        losses["rot_loss"] = rot_l
        losses["trans_loss"] = trans_l
        total = total + rot_l + trans_l

    if ecfg.pred_flow and ticfg.LW_FLOW > 0:
        # On-device flow-label refresh (replaces the CUDA gpu_flow call,
        # batch_updater_py_multi.py:276-298).
        depth_rend = aux["depth_rendered"][:, 0]
        gt_flow, gt_valid = flow_from_depth(
            depth_rend, batch.depth_gt_observed, pose_src, batch.pose_observed, batch.k,
            standard_rep=ecfg.standard_flow_rep,
        )
        if flow_weight_type == "viz_visible":
            # Occlusion-aware: additionally require the flow TARGET pixel to
            # be VISIBLE in the observed frame (the per-pixel instance mask
            # from -label.png) — flow_from_depth's depth consistency only
            # checks against the object-alone gt depth, so occluder-covered
            # correspondences would otherwise be supervised as visible.
            from deepim_tpu.ops.flow import gather_at_flow_target

            vis_tgt = gather_at_flow_target(
                batch.mask_gt_observed[:, 0], gt_flow,
                standard_rep=ecfg.standard_flow_rep,
            )
            gt_valid = gt_valid * vis_tgt
            weights = flow_weights_from_valid(gt_valid, "viz", depth_rend)
        else:
            weights = flow_weights_from_valid(gt_valid, flow_weight_type, depth_rend)
        z_flow, z_weights = zoom_flow(gt_flow, zf, weights)
        flow_est = jnp.transpose(aux["net"]["flow"], (0, 3, 1, 2))
        fl = flow_loss(
            flow_est, z_flow, z_weights, ecfg.normalize_flow, ticfg.LW_FLOW,
            float(ecfg.height * ecfg.width),
        )
        losses["flow_loss"] = fl
        total = total + fl

    if ecfg.pred_mask and ticfg.LW_MASK > 0:
        logit = jnp.transpose(aux["net"]["mask_logit"], (0, 3, 1, 2))
        ml = mask_loss(logit, aux["zoom_mask_gt_observed"], ticfg.LW_MASK)
        losses["mask_loss"] = ml
        total = total + ml

    losses["total"] = total
    # Observability, not a loss: CSR truncated-pair counter for this
    # iteration's render (always 0 for a correctly tuned bank).  Rides the
    # metrics dict so train_net can warn without an extra fetch.
    losses["raster_dropped"] = aux["raster_dropped"]
    return total, (pose_new, losses)


def make_train_step(
    model: Any,
    tx: optax.GradientTransformation,
    ecfg: EngineConfig,
    ticfg: TrainIterConfig,
    flow_weight_type: str = "viz",
    num_inner: int | None = None,
):
    """Build the jitted train step.  The returned function runs the full
    TRAIN_ITER_SIZE inner render-and-compare loop (default ecfg.num_iters)."""
    n_inner = num_inner if num_inner is not None else ecfg.num_iters
    if ticfg.SE3_DIST_LOSS and ecfg.rot_type != "QUAT":
        # The reference's rot loss is the squared quaternion dot
        # (deepIM_flownet.py:238-244); it has no defined EULER form (the
        # reference never combines the two and would compute garbage).
        raise ValueError("SE3_DIST_LOSS requires network.ROT_TYPE='QUAT'")

    def train_step(state: TrainState, batch: TrainBatch, bank_arrays):
        meshes = MeshBuffers.gather(bank_arrays, batch.class_index)

        def inner(carry, _):
            params, opt_state, step, pose_src = carry

            def loss_and_aux(p):
                total, (pose_new, losses) = compute_losses(
                    p, model, batch, meshes, pose_src, ecfg, ticfg, flow_weight_type
                )
                return total, (pose_new, losses)

            (total, (pose_new, losses)), grads = jax.value_and_grad(loss_and_aux, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            # Rollout sanitation for from-scratch iterated training: an
            # early-training network can emit a delta that throws the pose
            # out of the camera frustum; the next iteration would then
            # render nothing and fit garbage labels.  Reset such samples to
            # their previous pose (per sample).  A no-op once the network is
            # minimally competent — and always a no-op for the reference's
            # own regime (fine-tuning from pretrained FlowNet).
            pose_next = jax.lax.stop_gradient(pose_new)
            z = pose_next[:, 2, 3]
            pose_ok = (
                jnp.all(jnp.isfinite(pose_next), axis=(1, 2))
                & (z > ecfg.raster.znear)
                & (z < ecfg.raster.zfar)
            )
            pose_next = jnp.where(pose_ok[:, None, None], pose_next, pose_src)
            return (params, opt_state, step + 1, pose_next), losses

        init = (state.params, state.opt_state, state.step, batch.pose_rendered)
        (params, opt_state, step, pose_final), metrics = jax.lax.scan(
            inner, init, None, length=n_inner
        )
        new_state = TrainState(params=params, opt_state=opt_state, step=step)
        # metrics: dict of (n_inner,) arrays (per-iteration losses).
        return new_state, metrics, pose_final

    return train_step
