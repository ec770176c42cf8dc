"""Separable affine bilinear resampling as matrix multiplies (MXU-native).

The reference implements its zoom crops with MXNet GridGenerator +
BilinearSampler (per-pixel gathers on GPU; e.g. zoom_mask.py:96-107,
zoom_image_with_factor.py:47-58).  All DeepIM zooms are axis-aligned affine
transforms ([[wx, 0, tx], [0, wy, ty]]), so the 2D bilinear resample
factorizes exactly into a row interpolation and a column interpolation:

    out[b, c] = Wy[b] @ img[b, c] @ Wx[b]^T

where Wy (H_out, H_in) and Wx (W_out, W_in) each have <= 2 non-zeros per row.
On TPU these dense matmuls run on the MXU, replacing gathers (which TPUs
execute poorly) — the TPU-native formulation of the zoom op.

Conventions match MXNet BilinearSampler: normalized grid coordinates in
[-1, 1] with pixel = (g + 1) * (size - 1) / 2 (align-corners), zero padding
outside the source image (out-of-range taps contribute 0, which the
clamped-hat weight function reproduces exactly).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ZoomFactor(NamedTuple):
    """Batched affine zoom parameters, identical in meaning to the reference's
    zoom_factor = (wx, wy, tx, ty) blob (zoom_mask.py:100-103)."""

    wx: jax.Array  # (B,) crop_size / image_size
    wy: jax.Array  # (B,)
    tx: jax.Array  # (B,) crop center, normalized [-1, 1]
    ty: jax.Array  # (B,)

    @staticmethod
    def identity(batch: int, dtype=jnp.float32) -> "ZoomFactor":
        one = jnp.ones((batch,), dtype)
        zero = jnp.zeros((batch,), dtype)
        return ZoomFactor(one, one, zero, zero)

    def as_array(self) -> jax.Array:
        return jnp.stack(self, axis=-1)

    @staticmethod
    def from_array(a: jax.Array) -> "ZoomFactor":
        return ZoomFactor(a[..., 0], a[..., 1], a[..., 2], a[..., 3])


def invert_zoom_factor(zf: ZoomFactor, height: int, width: int) -> ZoomFactor:
    """Zoom factor mapping the crop back to the full frame (zoom_flow.py:35-44)."""
    crop_w = zf.wx * width
    crop_h = zf.wy * height
    cx = zf.tx * 0.5 * width + 0.5 * width
    cy = zf.ty * 0.5 * height + 0.5 * height
    return ZoomFactor(
        wx=1.0 / zf.wx,
        wy=1.0 / zf.wy,
        tx=(width * 0.5 - cx) / crop_w * 2.0,
        ty=(height * 0.5 - cy) / crop_h * 2.0,
    )


def _interp_weights(src: jax.Array, size_in: int) -> jax.Array:
    """Bilinear interpolation matrix rows for source positions.

    src: (B, N_out) source pixel coordinates -> (B, N_out, size_in) weights;
    rows for out-of-range positions sum to < 1 (zero padding), matching
    BilinearSampler boundary handling.
    """
    idx = jax.lax.broadcasted_iota(src.dtype, (1, 1, size_in), 2)
    return jnp.maximum(0.0, 1.0 - jnp.abs(src[..., None] - idx))


def affine_sample(img: jax.Array, zf: ZoomFactor, out_hw: tuple[int, int] | None = None) -> jax.Array:
    """Resample img (B, C, H, W) through the affine zoom -> (B, C, H_out, W_out).

    For output pixel (i, j): g = (2j/(W_out-1) - 1, 2i/(H_out-1) - 1),
    source normalized coord = (wx * gx + tx, wy * gy + ty), then bilinear.
    """
    b, c, h, w = img.shape
    ho, wo = out_hw if out_hw is not None else (h, w)
    dtype = img.dtype
    # Sample positions and interpolation weights are ALWAYS built in f32 —
    # a bf16 source coordinate at 640 px carries ~2 px of rounding error.
    # Only the weight matrices are cast to the image dtype, so a bf16 image
    # runs both resample matmuls at the MXU's bf16 rate with f32
    # accumulation (preferred_element_type below).
    f32 = jnp.float32
    gx = jnp.linspace(-1.0, 1.0, wo, dtype=f32)
    gy = jnp.linspace(-1.0, 1.0, ho, dtype=f32)
    wx, wy = zf.wx.astype(f32), zf.wy.astype(f32)
    tx, ty = zf.tx.astype(f32), zf.ty.astype(f32)
    sx = (wx[:, None] * gx[None, :] + tx[:, None] + 1.0) * ((w - 1) * 0.5)
    sy = (wy[:, None] * gy[None, :] + ty[:, None] + 1.0) * ((h - 1) * 0.5)
    wmat_x = _interp_weights(sx, w).astype(dtype)  # (B, Wo, W)
    wmat_y = _interp_weights(sy, h).astype(dtype)  # (B, Ho, H)
    # Two MXU matmuls: rows then columns.
    tmp = jnp.einsum("bih,bchw->bciw", wmat_y, img, preferred_element_type=jnp.float32)
    out = jnp.einsum("bciw,bjw->bcij", tmp, wmat_x, preferred_element_type=jnp.float32)
    return out.astype(dtype)
