"""Flow-from-depth: ground-truth optical flow between a rendered-depth frame
and a target-depth frame via reprojection + depth-consistency visibility.

TPU-native replacement for the reference's CUDA kernel
(lib/flow_c/gpu_flow_kernel.cu:32-69, host wrapper :82-148 — which round-trips
host<->GPU every call) and the host numpy version
(lib/pair_matching/flow.py:12-63).  Here the whole batch is computed on-device
inside the jitted training step: backprojection and reprojection are batched
matmul/elementwise ops; the only gather is the target-depth lookup at the
rounded projected coordinates.

Flow channel order follows the reference's shipped default
(STANDARD_FLOW_REP=False, config.py:36): channel 0 = dh, channel 1 = dw
(flow.py:55-59, gpu_flow_kernel.cu:57-58).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from deepim_tpu.geometry.projection import pixel_grid
from deepim_tpu.geometry.se3 import se3_inverse, se3_mul

DEPTH_EPS = 1e-3    # source-depth validity (gpu_flow_kernel.cu:45)
VIS_THRESH = 3e-3   # depth-consistency visibility (gpu_flow_kernel.cu:56)


def flow_from_depth_kt(
    depth_src: jax.Array,
    depth_tgt: jax.Array,
    kt: jax.Array,
    k_inv: jax.Array,
    *,
    thresh: float = VIS_THRESH,
    standard_rep: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Batched flow from depth pair and projection matrices.

    depth_src, depth_tgt: (B, H, W); kt: (B, 3, 4) = K @ [R|t]_rel;
    k_inv: (3, 3).  Returns (flow (B, 2, H, W), valid (B, H, W)).
    Matches gpu_flow_kernel.cu:37-67 semantics: a pixel is valid iff its
    source depth > 1e-3, the reprojection lands in-frame, and the projected
    depth agrees with the target depth within `thresh`.
    """
    b, h, w = depth_src.shape
    hh, ww = pixel_grid(h, w, depth_src.dtype)

    # Backproject: (x, y, z) = K^-1 (w, h, 1) * d  (cu:42-44).
    x = (ww * k_inv[0, 0] + hh * k_inv[0, 1] + k_inv[0, 2]) * depth_src
    y = (ww * k_inv[1, 0] + hh * k_inv[1, 1] + k_inv[1, 2]) * depth_src
    z = depth_src

    def dot_row(r):
        return (
            x * kt[:, r, 0, None, None]
            + y * kt[:, r, 1, None, None]
            + z * kt[:, r, 2, None, None]
            + kt[:, r, 3, None, None]
        )

    x_proj = dot_row(0)
    y_proj = dot_row(1)
    z_proj = dot_row(2) + 1e-15
    w_proj = x_proj / z_proj
    h_proj = y_proj / z_proj

    w_i = jnp.round(w_proj).astype(jnp.int32)
    h_i = jnp.round(h_proj).astype(jnp.int32)
    in_frame = (
        (w_proj >= 0.0) & (w_proj <= w - 1.0) & (h_proj >= 0.0) & (h_proj <= h - 1.0)
    )
    w_c = jnp.clip(w_i, 0, w - 1)
    h_c = jnp.clip(h_i, 0, h - 1)

    # Target depth lookup at rounded projection (the one gather).
    flat_idx = (h_c * w + w_c).reshape(b, h * w)
    d_tgt = jnp.take_along_axis(depth_tgt.reshape(b, h * w), flat_idx, axis=1).reshape(b, h, w)

    valid = (depth_src > DEPTH_EPS) & in_frame & (jnp.abs(z_proj - d_tgt) < thresh)
    dh = jnp.where(valid, h_proj - hh, 0.0)
    dw = jnp.where(valid, w_proj - ww, 0.0)
    if standard_rep:
        flow = jnp.stack([dw, dh], axis=1)
    else:
        flow = jnp.stack([dh, dw], axis=1)
    return flow, valid.astype(depth_src.dtype)


def gather_at_flow_target(
    values: jax.Array, flow: jax.Array, *, standard_rep: bool = False
) -> jax.Array:
    """Sample `values` (B, H, W) at each source pixel's flow TARGET position
    (nearest neighbor).  flow: (B, 2, H, W) in the configured channel order.

    Used for occlusion-aware flow supervision (TRAIN.FLOW_WEIGHT_TYPE
    'viz_visible'): the depth-consistency visibility of flow_from_depth
    compares against the object-ALONE gt-observed depth
    (gpu_flow_kernel.cu:56 semantics), so a correspondence whose target
    pixel is covered by a DIFFERENT object in the real observed frame still
    counts as visible — but the network cannot observe it.  Gathering the
    per-pixel visible-instance mask (the -label.png class mask) at the
    target position closes that gap.  Pixels with zero flow sample their
    own location, so background/invalid pixels are unaffected (their weight
    is already 0).
    """
    b, _, h, w = flow.shape
    hh, ww = pixel_grid(h, w, flow.dtype)
    dh = flow[:, 1] if standard_rep else flow[:, 0]
    dw = flow[:, 0] if standard_rep else flow[:, 1]
    h_c = jnp.clip(jnp.round(hh + dh).astype(jnp.int32), 0, h - 1)
    w_c = jnp.clip(jnp.round(ww + dw).astype(jnp.int32), 0, w - 1)
    flat_idx = (h_c * w + w_c).reshape(b, h * w)
    return jnp.take_along_axis(values.reshape(b, h * w), flat_idx, axis=1).reshape(b, h, w)


def flow_from_depth(
    depth_src: jax.Array,
    depth_tgt: jax.Array,
    pose_src: jax.Array,
    pose_tgt: jax.Array,
    k: jax.Array,
    *,
    thresh: float = VIS_THRESH,
    standard_rep: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Flow from depths + poses: KT = K @ (pose_tgt @ pose_src^-1)
    (lib/pair_matching/flow.py:29, batch_updater_py_multi.py:256-259)."""
    rel = se3_mul(pose_tgt, se3_inverse(pose_src))  # (B, 3, 4)
    kt = jnp.einsum("ij,bjk->bik", k, rel)
    k_inv = jnp.linalg.inv(k)
    return flow_from_depth_kt(depth_src, depth_tgt, kt, k_inv, thresh=thresh, standard_rep=standard_rep)
