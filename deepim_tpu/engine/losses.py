"""Training losses, matching the reference's MakeLoss/grad_scale semantics.

MXNet MakeLoss(data, grad_scale=g) backpropagates g * d(sum(data)); the
equivalent scalar loss is g * sum(data).  The reference's per-loss scales
(deepim/symbols/deepIM_flownet.py):

* flow:  LW_FLOW / (480*640) * sum(weights * (flow_est - flow_gt/NF)^2)  (:201-207)
* point matching: LW_PM / NUM_3D_SAMPLE * sum(w * |dp| / NORMALIZE_3D_POINT) (:283-312)
* mask:  LW_MASK * sum(BCE(logit, label))  (LogisticRegressionOutput
  backward is (sigmoid - label) * grad_scale; :342-347)
* optional SE3 dist loss: rot 1 - (q_gt . q_est)^2, trans L2/L1/smooth-L1
  on the zoomed delta (:238-262)

All sums are divided by the batch size here (the reference folds 1/batch
into the optimizer's rescale_grad, module.py:520-525).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from deepim_tpu.config import TrainIterConfig


def smooth_l1(x: jax.Array, scalar: float) -> jax.Array:
    """MXNet smooth_l1 with `scalar` sigma: 0.5 (s x)^2 if |x| < 1/s^2 else
    |x| - 0.5/s^2."""
    s2 = scalar * scalar
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0 / s2, 0.5 * s2 * x * x, ax - 0.5 / s2)


def flow_loss(
    flow_est: jax.Array,
    flow_gt: jax.Array,
    flow_weights: jax.Array,
    normalize_flow: float,
    lw_flow: float,
    frame_pixels: float,
) -> jax.Array:
    """flow_est, flow_gt, flow_weights: (B, 2, H, W); flow_gt in pixels,
    flow_est in normalized units (deepIM_flownet.py:201-207)."""
    b = flow_est.shape[0]
    err = flow_weights * jnp.square(flow_est - flow_gt / normalize_flow)
    return lw_flow / frame_pixels * jnp.sum(err) / b


def point_matching_loss(
    points_est: jax.Array,
    points_obs: jax.Array,
    point_weights: jax.Array,
    ticfg: TrainIterConfig,
    normalize_3d_point: float,
) -> jax.Array:
    """points_*: (B, N, 3); point_weights: (B, N) or (B, N, 1)
    (deepIM_flownet.py:283-312)."""
    b = points_est.shape[0]
    if point_weights.ndim == 2:
        point_weights = point_weights[..., None]
    d = (points_est - jax.lax.stop_gradient(points_obs)) / normalize_3d_point
    if ticfg.SE3_PM_LOSS_TYPE == "L1":
        e = jnp.abs(d)
    elif ticfg.SE3_PM_LOSS_TYPE == "L2":
        e = jnp.square(d)
    elif ticfg.SE3_PM_LOSS_TYPE == "smooth_L1":
        e = smooth_l1(d, ticfg.SE3_PM_SL1_SCALAR)
    else:
        raise ValueError(f"Unknown SE3_PM_LOSS_TYPE {ticfg.SE3_PM_LOSS_TYPE}")
    return ticfg.LW_PM / ticfg.NUM_3D_SAMPLE * jnp.sum(point_weights * e) / b


def mask_loss(mask_logit: jax.Array, mask_label: jax.Array, lw_mask: float) -> jax.Array:
    """Per-pixel binary cross entropy, summed (LogisticRegressionOutput with
    grad_scale=LW_MASK, deepIM_flownet.py:342-347).  Inputs (B, 1, H, W) or
    (B, H, W, 1)."""
    b = mask_logit.shape[0]
    label = jax.lax.stop_gradient(mask_label)
    bce = jnp.maximum(mask_logit, 0) - mask_logit * label + jnp.log1p(jnp.exp(-jnp.abs(mask_logit)))
    return lw_mask * jnp.sum(bce) / b


def se3_dist_loss(
    rot_est: jax.Array,
    zoom_trans_est: jax.Array,
    rot_gt: jax.Array,
    zoom_trans_gt: jax.Array,
    ticfg: TrainIterConfig,
) -> tuple[jax.Array, jax.Array]:
    """Optional direct SE(3) losses (deepIM_flownet.py:238-262): rotation
    1 - (q_gt . q_est)^2; translation on the *zoomed* delta."""
    b = rot_est.shape[0]
    dot = jnp.sum(rot_gt * rot_est, axis=-1)
    rot_l = ticfg.LW_ROT * jnp.sum(1.0 - jnp.square(dot)) / b
    d = zoom_trans_est - zoom_trans_gt
    if ticfg.TRANS_LOSS_TYPE == "L2":
        e = jnp.square(d)
    elif ticfg.TRANS_LOSS_TYPE == "L1":
        e = jnp.abs(d)
    elif ticfg.TRANS_LOSS_TYPE == "smooth_L1":
        e = smooth_l1(d, ticfg.TRANS_SMOOTH_L1_SCALAR)
    else:
        raise ValueError(f"Unknown TRANS_LOSS_TYPE {ticfg.TRANS_LOSS_TYPE}")
    trans_l = ticfg.LW_TRANS * jnp.sum(e) / b
    return rot_l, trans_l
