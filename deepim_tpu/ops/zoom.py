"""DeepIM zoom-in crop ops: batched, branchless, on-device.

Re-implements the zoom operator family of deepim/operator_py as fused batched
array code (no host sync, no per-sample Python loops):

* zoom factor from masks        zoom_mask.py:29-103
* zoom factor from images       zoom_image.py:26-98
* apply zoom to images          zoom_image_with_factor.py:31-65
* apply zoom to depths          zoom_depth.py:18-78
* apply zoom to masks (+inv)    zoom_mask_with_factor.py:29-64
* apply zoom to flow (+inv)     zoom_flow.py:28-71
* zoom the translation delta    zoom_trans.py:22-74

The crop is treated as non-differentiable (stop_gradient on the zoom factor),
matching the reference's zero backward passes, except zoom_trans which passes
gradients through to the translation (optionally unscaled, the reference's
b_zoom_grad=False default).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from deepim_tpu.geometry.projection import project_points
from deepim_tpu.ops.sampler import ZoomFactor, affine_sample, invert_zoom_factor

MASK_THRESH = 0.2  # depth-as-mask binarization (zoom_mask.py:40-41)


def mask_bbox(mask: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Bbox of nonzero pixels, branchless.

    mask: (B, H, W) boolean/float.  Returns (x0, x1, y0, y1, valid), each (B,).
    Invalid (empty) masks give x0 > x1; callers select a fallback via `valid`.
    """
    m = mask > 0.5
    b, h, w = m.shape
    col_any = jnp.any(m, axis=-2)  # (B, W)
    row_any = jnp.any(m, axis=-1)  # (B, H)
    xs = jax.lax.broadcasted_iota(jnp.float32, (b, w), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (b, h), 1)
    x0 = jnp.min(jnp.where(col_any, xs, jnp.inf), axis=-1)
    x1 = jnp.max(jnp.where(col_any, xs, -jnp.inf), axis=-1)
    y0 = jnp.min(jnp.where(row_any, ys, jnp.inf), axis=-1)
    y1 = jnp.max(jnp.where(row_any, ys, -jnp.inf), axis=-1)
    valid = jnp.any(col_any, axis=-1)
    return x0, x1, y0, y1, valid


def _zoom_factor_from_boxes(
    real_box, rend_box, rend_center, height: int, width: int
) -> ZoomFactor:
    """Shared zoom-factor math (zoom_mask.py:47-103 == zoom_image.py:41-98).

    Crop center = projected rendered-object center (or the observed bbox
    center if the rendered mask is empty); half-extent = max(0.75*l, 0.75*r,
    u, d) * 1.4; square in normalized units => pixel aspect == image aspect.
    """
    rx0, rx1, ry0, ry1, r_valid = real_box
    sx0, sx1, sy0, sy1, s_valid = rend_box

    # Observed bbox fallback when empty: full frame (keeps math finite; the
    # reference asserts non-empty observed masks upstream, image.py:301-303).
    rx0 = jnp.where(r_valid, rx0, 0.0)
    rx1 = jnp.where(r_valid, rx1, float(width - 1))
    ry0 = jnp.where(r_valid, ry0, 0.0)
    ry1 = jnp.where(r_valid, ry1, float(height - 1))
    real_cx = (rx0 + rx1) * 0.5
    real_cy = (ry0 + ry1) * 0.5

    # Rendered bbox fallback -> observed bbox ("NO POINT VALID", zoom_mask.py:70-77).
    sx0 = jnp.where(s_valid, sx0, rx0)
    sx1 = jnp.where(s_valid, sx1, rx1)
    sy0 = jnp.where(s_valid, sy0, ry0)
    sy1 = jnp.where(s_valid, sy1, ry1)
    cx = jnp.where(s_valid, rend_center[..., 0], real_cx)
    cy = jnp.where(s_valid, rend_center[..., 1], real_cy)

    left = jnp.maximum(cx - sx0, cx - rx0)
    right = jnp.maximum(sx1 - cx, rx1 - cx)
    up = jnp.maximum(cy - sy0, cy - ry0)
    down = jnp.maximum(ry1 - cy, sy1 - cy)
    crop_h = (
        jnp.maximum(
            jnp.maximum(0.75 * right, 0.75 * left), jnp.maximum(up, down)
        )
        * 1.4
        * 2.0
    )
    crop_h = jnp.maximum(crop_h, 1e-4 * height)  # keep wx>0 (degenerate masks)
    wx = crop_h / height
    zf = ZoomFactor(
        wx=wx,
        wy=wx,
        tx=cx / width * 2.0 - 1.0,
        ty=cy / height * 2.0 - 1.0,
    )
    return ZoomFactor(*[jax.lax.stop_gradient(v) for v in zf])


def zoom_factor_from_masks(
    mask_observed: jax.Array,
    mask_gt_observed: jax.Array,
    mask_rendered: jax.Array,
    src_pose: jax.Array,
    k: jax.Array,
) -> ZoomFactor:
    """Zoom factor from mask pair + projected object center (zoom_mask.py:29-103).

    masks: (B, 1, H, W); src_pose: (B, 3, 4); k: (3, 3).
    The observed bbox comes from mask_GT_observed; the rendered mask is
    binarized at 0.2 first (it may be a depth map).
    """
    b, _, h, w = mask_observed.shape
    real = jnp.sum(mask_gt_observed, axis=1) > 0.3  # (B, H, W), zoom_mask.py:36-37
    rend = jnp.sum(jnp.where(mask_rendered > MASK_THRESH, 1.0, 0.0), axis=1) > 0.3
    center = project_points(src_pose[:, :, 3], k)  # (B, 2) = (w, h) px
    return _zoom_factor_from_boxes(mask_bbox(real), mask_bbox(rend), center, h, w)


def zoom_factor_from_images(
    image_observed: jax.Array,
    image_rendered: jax.Array,
    src_pose: jax.Array,
    k: jax.Array,
    pixel_means: jax.Array,
) -> ZoomFactor:
    """Zoom factor from image foregrounds (zoom_image.py:26-98; the
    INPUT_MASK=False path).  Foreground = channel-sum of (img + mean) > 0.01."""
    b, _, h, w = image_observed.shape
    pm = pixel_means.reshape(1, -1, 1, 1)
    real = jnp.sum(image_observed + pm, axis=1) > 0.01
    rend = jnp.sum(image_rendered + pm, axis=1) > 0.01
    center = project_points(src_pose[:, :, 3], k)
    return _zoom_factor_from_boxes(mask_bbox(real), mask_bbox(rend), center, h, w)


def zoom_images(
    image_observed: jax.Array,
    image_rendered: jax.Array,
    zf: ZoomFactor,
    pixel_means: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Apply zoom to a mean-subtracted image pair (zoom_image_with_factor.py:31-65).

    Adds the pixel means back before sampling and removes them after, so the
    zero-padded out-of-frame region ends up at -mean (i.e. black), exactly as
    the reference.
    """
    pm = pixel_means.reshape(1, -1, 1, 1).astype(image_observed.dtype)
    obs = affine_sample(image_observed + pm, zf) - pm
    rend = affine_sample(image_rendered + pm, zf) - pm
    return jax.lax.stop_gradient(obs), jax.lax.stop_gradient(rend)


def zoom_depths(depth_observed: jax.Array, depth_rendered: jax.Array, zf: ZoomFactor):
    """Apply zoom to a depth pair (zoom_depth.py:18-78)."""
    return (
        jax.lax.stop_gradient(affine_sample(depth_observed, zf)),
        jax.lax.stop_gradient(affine_sample(depth_rendered, zf)),
    )


def zoom_mask(mask: jax.Array, zf: ZoomFactor, *, binarize_input: bool = True, inverse: bool = False) -> jax.Array:
    """Apply (inverse) zoom to a mask; binarize at 0.2 first (if the input may
    be a depth map) and round after sampling (zoom_mask_with_factor.py:29-64)."""
    if binarize_input:
        mask = jnp.where(mask > MASK_THRESH, 1.0, 0.0).astype(mask.dtype)
    if inverse:
        h, w = mask.shape[-2], mask.shape[-1]
        zf = invert_zoom_factor(zf, h, w)
    return jax.lax.stop_gradient(jnp.round(affine_sample(mask, zf)))


def zoom_masks(
    mask_observed: jax.Array,
    mask_gt_observed: jax.Array,
    mask_rendered: jax.Array,
    zf: ZoomFactor,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """The ZoomMask op's mask outputs (zoom_mask.py:105-112): observed and
    gt-observed sampled raw, rendered sampled after 0.2-binarization; all
    rounded."""
    obs = jnp.round(affine_sample(mask_observed, zf))
    gt = jnp.round(affine_sample(mask_gt_observed, zf))
    rend_bin = jnp.where(mask_rendered > MASK_THRESH, 1.0, 0.0).astype(mask_rendered.dtype)
    rend = jnp.round(affine_sample(rend_bin, zf))
    return tuple(jax.lax.stop_gradient(x) for x in (obs, gt, rend))


def zoom_flow(
    flow: jax.Array,
    zf: ZoomFactor,
    flow_weights: jax.Array | None = None,
    *,
    inverse: bool = False,
) -> jax.Array | tuple[jax.Array, jax.Array]:
    """Apply (inverse) zoom to flow maps, scaling flow values by 1/wx (or wx)
    (zoom_flow.py:28-71).  Forward mode also zooms + re-binarizes the flow
    weights with round(x - 0.45)."""
    h, w = flow.shape[-2], flow.shape[-1]
    sample_zf = invert_zoom_factor(zf, h, w) if inverse else zf
    scale = zf.wx if inverse else 1.0 / zf.wx
    out = affine_sample(flow, sample_zf) * scale[:, None, None, None]
    out = jax.lax.stop_gradient(out)
    if inverse:
        return out
    assert flow_weights is not None, "forward zoom_flow requires flow_weights"
    zw = affine_sample(flow_weights, sample_zf)
    zw = jax.lax.stop_gradient(jnp.round(zw - 0.45))
    return out, zw


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def zoom_trans(trans_delta: jax.Array, zf_arr: jax.Array, inverse: bool = False, zoom_grad: bool = False):
    """Scale the (vx, vy) translation delta by the zoom (zoom_trans.py:22-46).

    zoom-in divides by wx (crop pixel units); inverse multiplies by wx.
    Backward (zoom_trans.py:48-74): passes the gradient through unscaled
    unless zoom_grad (the reference's b_zoom_grad, default False).
    trans_delta: (B, 3); zf_arr: (B, 4) (ZoomFactor.as_array()).
    """
    return _zoom_trans_fwd_math(trans_delta, zf_arr, inverse)


def _zoom_trans_fwd_math(trans_delta, zf_arr, inverse):
    wx = jax.lax.stop_gradient(zf_arr[..., 0])
    scale = wx if inverse else 1.0 / wx
    return jnp.stack(
        [
            trans_delta[..., 0] * scale,
            trans_delta[..., 1] * scale,
            trans_delta[..., 2],
        ],
        axis=-1,
    )


def _zoom_trans_fwd(trans_delta, zf_arr, inverse, zoom_grad):
    return _zoom_trans_fwd_math(trans_delta, zf_arr, inverse), zf_arr


def _zoom_trans_bwd(inverse, zoom_grad, zf_arr, g):
    if zoom_grad:
        wx = zf_arr[..., 0]
        scale = wx if inverse else 1.0 / wx
        gx = g[..., 0] * scale
        gy = g[..., 1] * scale
    else:
        gx, gy = g[..., 0], g[..., 1]
    return jnp.stack([gx, gy, g[..., 2]], axis=-1), jnp.zeros_like(zf_arr)


zoom_trans.defvjp(_zoom_trans_fwd, _zoom_trans_bwd)
