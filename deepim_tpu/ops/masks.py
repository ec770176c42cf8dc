"""Mask-strategy ops: filled-box masks and random directional dilation.

Batched on-device replacements for the per-sample host numpy mask strategies:
* box-filled masks ('box_gt' / 'box_rendered' / 'box_observed' INIT/UPDATE
  strategies): lib/utils/image.py:230-399, lib/utils/get_min_rect.py:9-23,
  lib/pair_matching/data_pair.py:93-123.
* random directional dilation augmentation: lib/utils/mask_dilate.py:10-47.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from deepim_tpu.ops.zoom import mask_bbox


def box_fill(mask: jax.Array) -> jax.Array:
    """Filled bounding-box rectangle of each mask.

    mask: (B, H, W) (or (B, 1, H, W)).  Rectangle fill uses [start, end)
    semantics matching the reference's `mask[y_start:y_end, x_start:x_end]=1`
    (data_pair.py:105).  Empty masks produce empty boxes.
    """
    squeeze = mask.ndim == 4
    m = mask[:, 0] if squeeze else mask
    b, h, w = m.shape
    x0, x1, y0, y1, valid = mask_bbox(m)
    ys = jax.lax.broadcasted_iota(jnp.float32, (b, h, 1), 1)
    xs = jax.lax.broadcasted_iota(jnp.float32, (b, 1, w), 2)
    box = (
        (ys >= y0[:, None, None]) & (ys < y1[:, None, None])
        & (xs >= x0[:, None, None]) & (xs < x1[:, None, None])
        & valid[:, None, None]
    ).astype(mask.dtype)
    return box[:, None] if squeeze else box


def _shift(m: jax.Array, dy: int, dx: int) -> jax.Array:
    """Shift (B, H, W) by (dy, dx), zero fill."""
    return jnp.roll(m, (dy, dx), axis=(-2, -1)) * _shift_mask(m.shape, dy, dx, m.dtype)


def _shift_mask(shape, dy, dx, dtype):
    b, h, w = shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    ok_y = (ys >= dy) if dy >= 0 else (ys < h + dy)
    ok_x = (xs >= dx) if dx >= 0 else (xs < w + dx)
    return (ok_y & ok_x).astype(dtype)


def mask_dilate_random(mask: jax.Array, key: jax.Array, max_thickness: int = 10) -> jax.Array:
    """Random directional mask dilation (mask_dilate.py:10-47), batched.

    A direction code in [0, 10) disables one/two of the four expansion
    directions exactly as the reference; each enabled direction expands by an
    independent random 1..max_thickness pixels.  mask: (B, H, W) in {0, 1}.
    """
    b = mask.shape[0]
    kd, k0, k1, k2, k3 = jax.random.split(key, 5)
    direction = jax.random.randint(kd, (b,), 0, 10)
    thick = [
        jax.random.randint(k, (b,), 1, max_thickness + 1) for k in (k0, k1, k2, k3)
    ]
    # Direction d expands: down unless d in {0,1,4}; up unless d in {1,2,5};
    # right unless d in {2,3,6}; left unless d in {0,3,7}.
    def blocked(d, codes):
        return (d == codes[0]) | (d == codes[1]) | (d == codes[2])

    enabled = [
        ~blocked(direction, (0, 1, 4)),
        ~blocked(direction, (1, 2, 5)),
        ~blocked(direction, (2, 3, 6)),
        ~blocked(direction, (0, 3, 7)),
    ]
    deltas = [(1, 0), (-1, 0), (0, 1), (0, -1)]
    out = mask
    for (sy, sx), en, th in zip(deltas, enabled, thick):
        # Expand by t pixels == OR of shifts 1..t; realized as a scan over the
        # static max_thickness with per-sample enables (branchless).
        shifted = mask
        acc = jnp.zeros_like(mask)
        for step in range(1, max_thickness + 1):
            shifted = _shift(mask, sy * step, sx * step)
            use = (en & (th >= step)).astype(mask.dtype)[:, None, None]
            acc = jnp.maximum(acc, shifted * use)
        out = jnp.maximum(out, acc)
    return out
