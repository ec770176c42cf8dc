"""FlowNetS-style matching network with SE(3), flow and mask heads.

Re-implementation (flax.linen, NHWC, optional bfloat16 compute) of the
reference's single model architecture deepim/symbols/deepIM_flownet.py:

* encoder get_convs (:63-107): conv ladder 64/128/256/256/512/512/512/512/
  1024/1024, LeakyReLU(0.1), strides 2 at conv1/2/3/4/5/6; explicit MXNet
  padding arithmetic so feature shapes match exactly
  (480x640 -> 240x320 -> 120x160 -> 60x80 -> 30x40 -> 15x20 -> 8x10).
* SE(3) head (:110-117, :210-225): Flatten -> FC256 -> FC256 -> {FC4 rot
  (L2-normalized quaternion), FC3 trans in zoomed-pixel units}.
* flow decoder (:121-168, :174-207): deconv5/deconv4 skip refinement with
  per-scale flow predictions, x16 fixed-bilinear upsample + crop(8).
* mask head (:315-341): 1-channel conv on the decoder feature, x16 fixed
  bilinear upsample + crop(8), sigmoid applied by the caller.

The x16 fixed bilinear deconvolution (kernel 32, stride 16, lr_mult=0,
init _init_bilinear) is mathematically separable; it is implemented here as
two static interpolation-matrix multiplies (MXU work instead of a huge
transposed convolution).

Weight init follows init_weights (:753-845): zero FCs + Xavier, the
quaternion head's "near-identity" trick (row w ~ U(0.01, 1.01), rest
~ U(0, 0.01)), zero trans head, N(0, 0.01) mask conv.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def leaky(x):
    return nn.leaky_relu(x, negative_slope=0.1)


def _rot_kernel_init(key, shape, dtype=jnp.float32):
    """Quaternion head init (deepIM_flownet.py:793-800): all entries
    U(0, 0.01), except the w-output column U(0.01, 1.01), biasing the initial
    prediction toward the identity rotation.  flax kernels are (in, out);
    with grouped heads (REGRESSOR_NUM > 1) every 4th column is a w column."""
    k1, k2 = jax.random.split(key)
    w = jax.random.uniform(k1, shape, dtype) * 0.01
    w_cols = jax.random.uniform(k2, (shape[0], (shape[1] + 3) // 4), dtype) + 0.01
    return w.at[:, 0::4].set(w_cols)


@lru_cache(maxsize=None)
def _bilinear_matrix(size_in: int, size_out: int, factor: int, offset: int) -> np.ndarray:
    """Interpolation matrix of the MXNet fixed-bilinear deconvolution
    (kernel 2f, stride f) followed by crop at `offset`.

    MXNet _init_bilinear: kernel[i] = 1 - |i/f - c| with c = (2f-1-f%2)/(2f);
    deconv: out[o + k] += in[j] * kernel[k] at o = j*f, then out cropped by
    `offset`.  Returns (size_out, size_in)."""
    f = factor
    k = 2 * f
    c = (2 * f - 1 - f % 2) / (2.0 * f)
    kern = np.array([1 - abs(i / f - c) for i in range(k)], np.float32)
    m = np.zeros((size_out, size_in), np.float32)
    for j in range(size_in):
        for ki in range(k):
            o = j * f + ki - offset
            if 0 <= o < size_out:
                m[o, j] += kern[ki]
    return m


def fixed_bilinear_upsample(x: jax.Array, out_h: int, out_w: int, factor: int = 16, offset: int = 8) -> jax.Array:
    """x: (B, h, w, C) -> (B, out_h, out_w, C) via the reference's frozen
    bilinear x16 deconv + crop(8) (deepIM_flownet.py:185-199), computed as
    two static matmuls."""
    b, h, w, ch = x.shape
    mh = jnp.asarray(_bilinear_matrix(h, out_h, factor, offset), x.dtype)
    mw = jnp.asarray(_bilinear_matrix(w, out_w, factor, offset), x.dtype)
    y = jnp.einsum("oh,bhwc->bowc", mh, x, preferred_element_type=jnp.float32).astype(x.dtype)
    return jnp.einsum("pw,bowc->bopc", mw, y, preferred_element_type=jnp.float32).astype(x.dtype)


class Conv(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    pad: int = 0
    dtype: Any = jnp.float32
    name_: str | None = None

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((self.pad, self.pad), (self.pad, self.pad)),
            dtype=self.dtype,
            name=self.name_,
        )(x)


class Deconv(nn.Module):
    """MXNet Deconvolution kernel 4 stride 2 pad 0: out = 2*in + 2, followed
    by Crop(offset=(1,1)) to the skip feature's shape
    (deepIM_flownet.py:127-143)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, out_h: int, out_w: int):
        y = nn.ConvTranspose(
            self.features, (4, 4), strides=(2, 2), padding="VALID", dtype=self.dtype
        )(x)
        return y[:, 1 : 1 + out_h, 1 : 1 + out_w, :]


class FlowNetDeepIM(nn.Module):
    """The matching network.  Input: (B, H, W, C) zoomed, concatenated
    observed/rendered images (already /255) plus optional depth/mask channels
    (get_convs input assembly, deepIM_flownet.py:32-62).

    Returns dict with 'rot' (B, 4) L2-normalized quaternion, 'trans' (B, 3)
    in zoomed-pixel units, and optionally 'flow' (B, H, W, 2),
    'mask_logit' (B, H, W, 1)."""

    pred_flow: bool = True
    pred_mask: bool = True
    # REGRESSOR_NUM (config.py:40): >1 = one SE(3) head group per class,
    # selected per sample by class_index (the GroupPicker path,
    # deepim/operator_py/group_picker.py:16-86).
    num_regressors: int = 1
    # network.ROT_TYPE (config.py:40): 4 = quaternion (L2-normalized), 3 =
    # 'sxyz' Euler angles (rot_param at deepIM_flownet.py:715; EULER head is
    # zero-initialized per init_weights :791-792 so the initial delta is the
    # identity rotation, the role the quat w-column trick plays for QUAT).
    rot_dim: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, class_index: jax.Array | None = None) -> dict[str, jax.Array]:
        h_in, w_in = x.shape[1], x.shape[2]
        dt = self.dtype
        x = x.astype(dt)

        c1 = leaky(Conv(64, 7, 2, 3, dt, name_="flow_conv1")(x))
        c2 = leaky(Conv(128, 5, 2, 2, dt, name_="conv2")(c1))
        c3 = leaky(Conv(256, 5, 2, 2, dt, name_="conv3")(c2))
        c3_1 = leaky(Conv(256, 3, 1, 1, dt, name_="conv3_1")(c3))
        c4 = leaky(Conv(512, 3, 2, 1, dt, name_="conv4")(c3_1))
        c4_1 = leaky(Conv(512, 3, 1, 1, dt, name_="conv4_1")(c4))  # ReLU6
        c5 = leaky(Conv(512, 3, 2, 1, dt, name_="conv5")(c4_1))
        c5_1 = leaky(Conv(512, 3, 1, 1, dt, name_="conv5_1")(c5))  # ReLU8
        c6 = leaky(Conv(1024, 3, 2, 1, dt, name_="conv6")(c5_1))
        c6_1 = leaky(Conv(1024, 3, 1, 1, dt, name_="conv6_1")(c6))  # ReLU10

        # SE(3) head.
        flat = c6_1.reshape(c6_1.shape[0], -1)
        fc6 = leaky(nn.Dense(256, dtype=dt, name="fc6", kernel_init=nn.initializers.xavier_uniform())(flat))
        fc7 = leaky(nn.Dense(256, dtype=dt, name="fc7", kernel_init=nn.initializers.xavier_uniform())(fc6))
        g = self.num_regressors
        if self.rot_dim == 4:
            rot_init = _rot_kernel_init
        elif self.rot_dim == 3:
            rot_init = nn.initializers.zeros
        else:
            raise ValueError(f"rot_dim must be 3 (EULER) or 4 (QUAT), got {self.rot_dim}")
        rot = nn.Dense(self.rot_dim * g, dtype=dt, name="rot", kernel_init=rot_init)(fc7)
        trans = nn.Dense(3 * g, dtype=dt, name="trans", kernel_init=nn.initializers.zeros)(fc7)
        if g > 1:
            from deepim_tpu.ops.group_picker import group_pick

            if class_index is None:
                raise ValueError("num_regressors > 1 requires class_index")
            rot = group_pick(rot, class_index, g)
            trans = group_pick(trans, class_index, g)
        rot = rot.astype(jnp.float32)
        if self.rot_dim == 4:
            # L2Normalization of the quaternion head (deepIM_flownet.py:216).
            rot = rot / jnp.maximum(jnp.linalg.norm(rot, axis=-1, keepdims=True), 1e-12)
        out = {"rot": rot, "trans": trans.astype(jnp.float32)}

        if self.pred_flow or self.pred_mask:
            # flow6 prediction @ conv6 scale.
            flow6 = Conv(2, 3, 1, 1, dt, name_="Convolution1")(c6_1)
            d5 = leaky(Deconv(512, dt, name="deconv5")(c6_1, c5_1.shape[1], c5_1.shape[2]))
            up6 = Deconv(2, dt, name="upsample_flow6to5")(flow6, c5_1.shape[1], c5_1.shape[2])
            cat2 = jnp.concatenate([c5_1, d5, up6], axis=-1)  # 1026 ch
            flow5 = Conv(2, 3, 1, 1, dt, name_="Convolution2")(cat2)
            d4 = leaky(Deconv(256, dt, name="deconv4")(cat2, c4_1.shape[1], c4_1.shape[2]))
            up5 = Deconv(2, dt, name="upsample_flow5to4")(flow5, c4_1.shape[1], c4_1.shape[2])
            cat3 = jnp.concatenate([c4_1, d4, up5], axis=-1)  # 770 ch

            if self.pred_flow:
                flow4 = Conv(2, 3, 1, 1, dt, name_="Convolution3")(cat3)
                out["flow"] = fixed_bilinear_upsample(flow4, h_in, w_in).astype(jnp.float32)
            if self.pred_mask:
                mask4 = nn.Conv(
                    1, (3, 3), padding=((1, 1), (1, 1)), dtype=dt, name="mask_conv3",
                    kernel_init=nn.initializers.normal(0.01), bias_init=nn.initializers.zeros,
                )(cat3)
                out["mask_logit"] = fixed_bilinear_upsample(mask4, h_in, w_in).astype(jnp.float32)
        return out


def assemble_input(
    image_observed: jax.Array,
    image_rendered: jax.Array,
    depth_observed: jax.Array | None = None,
    depth_rendered: jax.Array | None = None,
    mask_observed: jax.Array | None = None,
    mask_rendered: jax.Array | None = None,
) -> jax.Array:
    """Concatenate network inputs, images scaled by /255
    (deepIM_flownet.py:32-62).  All inputs NHWC; images raw [0, 255]."""
    parts = [image_observed / 255.0, image_rendered / 255.0]
    if depth_observed is not None:
        parts += [depth_observed / 255.0, depth_rendered / 255.0]
    if mask_observed is not None:
        parts += [mask_observed, mask_rendered]
    return jnp.concatenate(parts, axis=-1)
