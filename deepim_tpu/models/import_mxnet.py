"""Import reference MXNet checkpoints into the flax FlowNetDeepIM tree.

The reference initializes from a pretrained FlowNet ``.params`` file and
saves trained checkpoints in the same format (deepim/train.py:165-195,
deepim/symbols/deepIM_flownet.py:753-845 init_weights).  This module maps
those parameters into our NHWC flax model, handling every layout delta:

* conv weights   (O, I, kH, kW)        -> (kH, kW, I, O)
* deconv weights (I, O, kH, kW)        -> (kH, kW, I, O) with a spatial
  flip: MXNet ``Deconvolution`` is the gradient of a correlation (i.e. a
  full convolution with the flipped kernel), while flax ``ConvTranspose``
  (transpose_kernel=False) correlates the zero-dilated input with the
  kernel as given.
* FC weights     (O, I)                -> (I, O); fc6 additionally needs
  its input dimension permuted from MXNet's NCHW flatten order (c, h, w)
  to our NHWC flatten order (h, w, c) (deepIM_flownet.py:110 Flatten).
* first-conv channels: the reference is BGR (cv2), the new stack is RGB —
  the two image blocks of flow_conv1 are reversed per 3-channel block;
  extra depth/mask input channels are zero-initialized when the checkpoint
  has fewer input channels than the model (init_weights :766-775).

The fixed x16 bilinear upsamplers (``upsampling_weight`` /
``mask_upsampling_weight``, lr_mult=0) have no parameters in our model —
they are static interpolation matmuls (models/flownet.py:52-81) — so those
entries are ignored on import and synthesized on export.
"""
from __future__ import annotations

import numpy as np

# Encoder + decoder convolutions: mx name -> (is present iff)
_CONV_NAMES = [
    "flow_conv1", "conv2", "conv3", "conv3_1", "conv4", "conv4_1",
    "conv5", "conv5_1", "conv6", "conv6_1",
    "Convolution1", "Convolution2", "Convolution3", "mask_conv3",
]
_DECONV_NAMES = ["deconv5", "deconv4", "upsample_flow6to5", "upsample_flow5to4"]
_DENSE_NAMES = ["fc6", "fc7", "rot", "trans"]

# MXNet output-padding arithmetic of the encoder ladder (kernel, stride,
# pad), deepIM_flownet.py:63-107.
_LADDER = [(7, 2, 3), (5, 2, 2), (5, 2, 2), (3, 1, 1), (3, 2, 1),
           (3, 1, 1), (3, 2, 1), (3, 1, 1), (3, 2, 1), (3, 1, 1)]


def conv6_hw(input_hw: tuple[int, int]) -> tuple[int, int]:
    h, w = input_hw
    for k, s, p in _LADDER:
        h = (h + 2 * p - k) // s + 1
        w = (w + 2 * p - k) // s + 1
    return h, w


def _find_leaf(tree, name: str):
    """Locate the {kernel, bias} dict for layer `name` anywhere in the flax
    tree (our Conv wrapper nests it under an auto-named parent; Deconv
    wraps an auto-named ConvTranspose under `name`)."""
    if isinstance(tree, dict):
        if name in tree:
            node = tree[name]
            if isinstance(node, dict):
                if "kernel" in node:
                    return node
                for v in node.values():
                    if isinstance(v, dict) and "kernel" in v:
                        return v
        for v in tree.values():
            found = _find_leaf(v, name)
            if found is not None:
                return found
    return None


def _bgr_perm(n_channels: int) -> np.ndarray:
    """Input-channel permutation reversing each of the two 3-channel image
    blocks (observed, rendered); depth/mask extras untouched."""
    perm = np.arange(n_channels)
    perm[0:3] = [2, 1, 0]
    if n_channels >= 6:
        perm[3:6] = [5, 4, 3]
    return perm


def flax_from_mxnet(
    mx_params: dict[str, np.ndarray],
    params_template,
    *,
    input_hw: tuple[int, int] = (480, 640),
    bgr_to_rgb: bool = True,
    strict: bool = True,
):
    """Return a new flax variables dict (same structure as
    `params_template` = model.init(...)) filled from `mx_params`
    (name -> NDArray from utils/mxnet_io.load_mxnet_params).

    Missing decoder/mask layers (e.g. a FAST_TEST or flow-less checkpoint)
    are left at template values unless `strict`.
    """
    import jax

    out = jax.tree_util.tree_map(np.asarray, params_template)
    tree = out["params"] if "params" in out else out

    def take(name: str) -> tuple[np.ndarray, np.ndarray] | None:
        wk, bk = f"{name}_weight", f"{name}_bias"
        if wk not in mx_params:
            if strict:
                raise KeyError(f"checkpoint is missing {wk}")
            return None
        return np.asarray(mx_params[wk], np.float32), np.asarray(
            mx_params.get(bk, np.zeros(mx_params[wk].shape[0], np.float32)), np.float32
        )

    for name in _CONV_NAMES:
        leaf = _find_leaf(tree, name)
        if leaf is None:
            continue  # model built without flow/mask heads
        got = take(name)
        if got is None:
            continue
        w, b = got
        k = w.transpose(2, 3, 1, 0)  # (O,I,kH,kW) -> (kH,kW,I,O)
        if name == "flow_conv1":
            c_model = leaf["kernel"].shape[2]
            c_ckpt = k.shape[2]
            if c_ckpt > c_model:
                raise ValueError(
                    f"checkpoint flow_conv1 has {c_ckpt} input channels, model expects {c_model}"
                )
            if c_ckpt < c_model:  # widen with zeros (init_weights :766-775)
                pad = np.zeros(k.shape[:2] + (c_model - c_ckpt, k.shape[3]), k.dtype)
                k = np.concatenate([k, pad], axis=2)
            if bgr_to_rgb:
                k = k[:, :, _bgr_perm(k.shape[2]), :]
        if leaf["kernel"].shape != k.shape:
            raise ValueError(f"{name}: shape {k.shape} != model {leaf['kernel'].shape}")
        leaf["kernel"], leaf["bias"] = k, b

    for name in _DECONV_NAMES:
        leaf = _find_leaf(tree, name)
        if leaf is None:
            continue
        got = take(name)
        if got is None:
            continue
        w, b = got
        k = w.transpose(2, 3, 0, 1)[::-1, ::-1]  # (I,O,kH,kW) -> flipped (kH,kW,I,O)
        if leaf["kernel"].shape != k.shape:
            raise ValueError(f"{name}: shape {k.shape} != model {leaf['kernel'].shape}")
        leaf["kernel"], leaf["bias"] = np.ascontiguousarray(k), b

    h6, w6 = conv6_hw(input_hw)
    for name in _DENSE_NAMES:
        leaf = _find_leaf(tree, name)
        got = take(name)
        if leaf is None or got is None:
            continue
        w, b = got
        if name == "fc6":
            c = w.shape[1] // (h6 * w6)
            if c * h6 * w6 != w.shape[1]:
                raise ValueError(
                    f"fc6 input {w.shape[1]} inconsistent with conv6 grid {h6}x{w6}"
                )
            # (256, C*H*W) with (c,h,w) order -> (H*W*C, 256) with (h,w,c).
            k = w.reshape(w.shape[0], c, h6, w6).transpose(2, 3, 1, 0).reshape(-1, w.shape[0])
        else:
            k = w.T
        if leaf["kernel"].shape != k.shape:
            raise ValueError(f"{name}: shape {k.shape} != model {leaf['kernel'].shape}")
        leaf["kernel"], leaf["bias"] = np.ascontiguousarray(k), b

    return jax.tree_util.tree_map(lambda x: np.asarray(x), out)


def mxnet_from_flax(
    variables,
    *,
    input_hw: tuple[int, int] = (480, 640),
    rgb_to_bgr: bool = True,
) -> dict[str, np.ndarray]:
    """Inverse of flax_from_mxnet: export our params as a reference-format
    name->array dict (writable with utils/mxnet_io.save_mxnet_params), so
    models trained here can be evaluated with the reference stack."""
    import jax

    variables = jax.tree_util.tree_map(np.asarray, variables)
    tree = variables["params"] if "params" in variables else variables
    out: dict[str, np.ndarray] = {}

    for name in _CONV_NAMES:
        leaf = _find_leaf(tree, name)
        if leaf is None:
            continue
        k = np.asarray(leaf["kernel"], np.float32)
        if name == "flow_conv1" and rgb_to_bgr:
            k = k[:, :, _bgr_perm(k.shape[2]), :]  # permutation is involutive
        out[f"{name}_weight"] = np.ascontiguousarray(k.transpose(3, 2, 0, 1))
        out[f"{name}_bias"] = np.asarray(leaf["bias"], np.float32)

    for name in _DECONV_NAMES:
        leaf = _find_leaf(tree, name)
        if leaf is None:
            continue
        k = np.asarray(leaf["kernel"], np.float32)[::-1, ::-1]
        out[f"{name}_weight"] = np.ascontiguousarray(k.transpose(2, 3, 0, 1))
        out[f"{name}_bias"] = np.asarray(leaf["bias"], np.float32)

    h6, w6 = conv6_hw(input_hw)
    for name in _DENSE_NAMES:
        leaf = _find_leaf(tree, name)
        if leaf is None:
            continue
        k = np.asarray(leaf["kernel"], np.float32)
        if name == "fc6":
            c = k.shape[0] // (h6 * w6)
            k = k.reshape(h6, w6, c, k.shape[1]).transpose(3, 2, 0, 1).reshape(k.shape[1], -1)
        else:
            k = k.T
        out[f"{name}_weight"] = np.ascontiguousarray(k)
        out[f"{name}_bias"] = np.asarray(leaf["bias"], np.float32)

    # Synthesize the frozen x16 bilinear upsampler weights the reference
    # symbol expects (deepIM_flownet.py:185-199, :328-335); lr_mult=0 so
    # values only need to match _init_bilinear.
    def bilinear_kernel(ch: int) -> np.ndarray:
        f, k = 16, 32
        c = (2 * 16 - 1 - 16 % 2) / 32.0
        line = 1 - np.abs(np.arange(k) / f - c)
        kern2d = np.outer(line, line).astype(np.float32)
        w = np.zeros((ch, ch, k, k), np.float32)
        for i in range(ch):
            w[i, i] = kern2d
        return w

    if "Convolution3_weight" in out:
        out["upsampling_weight"] = bilinear_kernel(2)
    if "mask_conv3_weight" in out:
        out["mask_upsampling_weight"] = bilinear_kernel(1)
    return out
