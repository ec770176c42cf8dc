"""MXNet checkpoint import: file-format round trip + numerical parity.

Parity is tested against an emulation of MXNet's operator semantics built
on lax.conv_general_dilated with NCHW/OIHW dimension numbers (MXNet
Convolution is exactly this cross-correlation; Deconvolution is its input
gradient = lax.conv_transpose with transpose_kernel=True), so the
layout-mapping code (transposes, deconv flips, fc6 flatten permutation,
BGR block swap) is what is actually under test.

Reference behaviors covered: deepim/symbols/deepIM_flownet.py:63-230
(symbol), :753-845 (init_weights channel widening), lib/utils/
load_model.py:10-37 (.params loading).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from deepim_tpu.models import FlowNetDeepIM
from deepim_tpu.models.import_mxnet import (
    conv6_hw,
    flax_from_mxnet,
    mxnet_from_flax,
)
from deepim_tpu.utils.mxnet_io import load_mxnet_params, save_mxnet_params

HW = (64, 64)  # tiny but ladder-compatible: conv6_1 grid = 1x1


def _mx_conv(x, w, b, stride, pad):
    y = lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return y + b[None, :, None, None]


def _mx_deconv(x, w, b, stride=2, kernel=4, pad=0):
    # MXNet Deconvolution (weight (I, O, kH, kW)) is the input-gradient of a
    # correlation whose forward weight is the same array viewed as
    # (O_conv=I, I_conv=O, kH, kW) — hence OIHW + transpose_kernel=True.
    assert pad == 0
    y = lax.conv_transpose(
        x, w, (stride, stride), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        transpose_kernel=True,
    )
    return y + b[None, :, None, None]


def _leaky(x):
    return jnp.where(x >= 0, x, 0.1 * x)


def _bilinear_weight(ch, factor=16):
    k = 2 * factor
    c = (2 * factor - 1 - factor % 2) / (2.0 * factor)
    line = 1 - np.abs(np.arange(k) / factor - c)
    kern = np.outer(line, line).astype(np.float32)
    w = np.zeros((ch, ch, k, k), np.float32)
    for i in range(ch):
        w[i, i] = kern
    return w


def _random_mx_params(rng, in_ch=6):
    """Random parameters with the reference's exact shapes at 64x64."""
    specs = {
        "flow_conv1": (64, in_ch, 7, 7), "conv2": (128, 64, 5, 5),
        "conv3": (256, 128, 5, 5), "conv3_1": (256, 256, 3, 3),
        "conv4": (512, 256, 3, 3), "conv4_1": (512, 512, 3, 3),
        "conv5": (512, 512, 3, 3), "conv5_1": (512, 512, 3, 3),
        "conv6": (1024, 512, 3, 3), "conv6_1": (1024, 1024, 3, 3),
        "Convolution1": (2, 1024, 3, 3), "Convolution2": (2, 1026, 3, 3),
        "Convolution3": (2, 770, 3, 3), "mask_conv3": (1, 770, 3, 3),
    }
    h6, w6 = conv6_hw(HW)
    dense = {
        "fc6": (256, 1024 * h6 * w6), "fc7": (256, 256),
        "rot": (4, 256), "trans": (3, 256),
    }
    deconv = {
        "deconv5": (1024, 512, 4, 4), "deconv4": (1026, 256, 4, 4),
        "upsample_flow6to5": (2, 2, 4, 4), "upsample_flow5to4": (2, 2, 4, 4),
    }
    p = {}
    for name, shape in {**specs, **dense, **deconv}.items():
        p[f"{name}_weight"] = rng.randn(*shape).astype(np.float32) * 0.05
        out_dim = shape[1] if name in deconv else shape[0]
        p[f"{name}_bias"] = rng.randn(out_dim).astype(np.float32) * 0.05
    return p


def _mx_forward(p, x_nchw):
    """Emulate the reference train/test symbol forward (rot/trans + flow +
    mask logits before sigmoid), deepIM_flownet.py:63-230, :315-341."""
    acts = {}
    x = x_nchw
    ladder = [
        ("flow_conv1", 2, 3), ("conv2", 2, 2), ("conv3", 2, 2),
        ("conv3_1", 1, 1), ("conv4", 2, 1), ("conv4_1", 1, 1),
        ("conv5", 2, 1), ("conv5_1", 1, 1), ("conv6", 2, 1),
        ("conv6_1", 1, 1),
    ]
    for name, s, pad in ladder:
        x = _leaky(_mx_conv(x, p[f"{name}_weight"], p[f"{name}_bias"], s, pad))
        acts[name] = x
    c6_1, c5_1, c4_1 = acts["conv6_1"], acts["conv5_1"], acts["conv4_1"]

    flat = c6_1.reshape(c6_1.shape[0], -1)  # NCHW flatten: (c, h, w) order
    fc6 = _leaky(flat @ p["fc6_weight"].T + p["fc6_bias"])
    fc7 = _leaky(fc6 @ p["fc7_weight"].T + p["fc7_bias"])
    rot = fc7 @ p["rot_weight"].T + p["rot_bias"]
    rot = rot / jnp.maximum(jnp.linalg.norm(rot, axis=-1, keepdims=True), 1e-12)
    trans = fc7 @ p["trans_weight"].T + p["trans_bias"]

    def crop_to(y, ref):
        return y[:, :, 1 : 1 + ref.shape[2], 1 : 1 + ref.shape[3]]

    flow6 = _mx_conv(c6_1, p["Convolution1_weight"], p["Convolution1_bias"], 1, 1)
    d5 = _leaky(crop_to(_mx_deconv(c6_1, p["deconv5_weight"], p["deconv5_bias"]), c5_1))
    up6 = crop_to(
        _mx_deconv(flow6, p["upsample_flow6to5_weight"], p["upsample_flow6to5_bias"]),
        c5_1,
    )
    cat2 = jnp.concatenate([c5_1, d5, up6], axis=1)
    flow5 = _mx_conv(cat2, p["Convolution2_weight"], p["Convolution2_bias"], 1, 1)
    d4 = _leaky(crop_to(_mx_deconv(cat2, p["deconv4_weight"], p["deconv4_bias"]), c4_1))
    up5 = crop_to(
        _mx_deconv(flow5, p["upsample_flow5to4_weight"], p["upsample_flow5to4_bias"]),
        c4_1,
    )
    cat3 = jnp.concatenate([c4_1, d4, up5], axis=1)
    flow4 = _mx_conv(cat3, p["Convolution3_weight"], p["Convolution3_bias"], 1, 1)
    mask4 = _mx_conv(cat3, p["mask_conv3_weight"], p["mask_conv3_bias"], 1, 1)

    # Fixed x16 bilinear deconvolution + crop(8) (deepIM_flownet.py:185-199).
    def upsample(y):
        w = jnp.asarray(_bilinear_weight(y.shape[1]))
        z = lax.conv_transpose(
            y, w, (16, 16), "VALID",
            dimension_numbers=("NCHW", "IOHW", "NCHW"), transpose_kernel=True,
        )
        return z[:, :, 8 : 8 + HW[0], 8 : 8 + HW[1]]

    return {
        "rot": rot, "trans": trans,
        "flow": upsample(flow4), "mask_logit": upsample(mask4),
    }


@pytest.fixture(scope="module")
def imported():
    rng = np.random.RandomState(0)
    mx_params = _random_mx_params(rng)
    model = FlowNetDeepIM(pred_flow=True, pred_mask=True)
    template = model.init(jax.random.PRNGKey(1), jnp.zeros((1, *HW, 6)))
    variables = flax_from_mxnet(mx_params, template, input_hw=HW)
    return mx_params, model, template, variables


def test_params_file_roundtrip(tmp_path, imported):
    mx_params = imported[0]
    for legacy in (False, True):
        path = str(tmp_path / f"ckpt_{legacy}.params")
        save_mxnet_params(path, mx_params, legacy_uint32_dims=legacy)
        back = load_mxnet_params(path)
        assert set(back) == set(mx_params)
        for k in mx_params:
            np.testing.assert_array_equal(back[k], mx_params[k])


def test_forward_parity_with_mxnet_semantics(imported):
    mx_params, model, _, variables = imported
    rng = np.random.RandomState(3)
    x_rgb = rng.rand(2, *HW, 6).astype(np.float32)  # our NHWC RGB input
    # The reference's input is NCHW with BGR image blocks.
    perm = np.array([2, 1, 0, 5, 4, 3])
    x_mx = jnp.asarray(x_rgb[..., perm].transpose(0, 3, 1, 2))
    ref = _mx_forward({k: jnp.asarray(v) for k, v in mx_params.items()}, x_mx)
    got = model.apply(variables, jnp.asarray(x_rgb))
    # Tolerances cover float32 accumulation-order differences through the
    # 10-conv ladder + 1024-wide dense layers; a layout-mapping bug (the
    # thing under test) produces O(1) errors, not 1e-4.
    np.testing.assert_allclose(got["rot"], ref["rot"], atol=1e-4)
    np.testing.assert_allclose(got["trans"], ref["trans"], atol=1e-4)
    np.testing.assert_allclose(
        got["flow"], np.transpose(ref["flow"], (0, 2, 3, 1)), atol=2e-4
    )
    np.testing.assert_allclose(
        got["mask_logit"], np.transpose(ref["mask_logit"], (0, 2, 3, 1)), atol=2e-4
    )


def test_channel_widening(imported):
    """Pretrained 6-channel FlowNet imported into an 8-channel (mask-input)
    model: extra input channels zero-initialized (init_weights :766-775),
    so zeroed extra inputs reproduce the 6-channel output."""
    mx_params, _, _, _ = imported
    model8 = FlowNetDeepIM(pred_flow=False, pred_mask=False)
    template8 = model8.init(jax.random.PRNGKey(2), jnp.zeros((1, *HW, 8)))
    vars8 = flax_from_mxnet(mx_params, template8, input_hw=HW, strict=False)
    model6 = FlowNetDeepIM(pred_flow=False, pred_mask=False)
    template6 = model6.init(jax.random.PRNGKey(2), jnp.zeros((1, *HW, 6)))
    vars6 = flax_from_mxnet(mx_params, template6, input_hw=HW, strict=False)

    rng = np.random.RandomState(4)
    x6 = rng.rand(1, *HW, 6).astype(np.float32)
    x8 = np.concatenate([x6, np.zeros((1, *HW, 2), np.float32)], axis=-1)
    out6 = model6.apply(vars6, jnp.asarray(x6))
    out8 = model8.apply(vars8, jnp.asarray(x8))
    np.testing.assert_allclose(out8["rot"], out6["rot"], atol=1e-5)
    np.testing.assert_allclose(out8["trans"], out6["trans"], rtol=1e-4, atol=1e-5)


def test_export_import_identity(imported):
    """flax -> mxnet dict -> flax is the identity (same input size)."""
    _, model, _, variables = imported
    exported = mxnet_from_flax(variables, input_hw=HW)
    template = jax.tree_util.tree_map(np.zeros_like, variables)
    back = flax_from_mxnet(exported, template, input_hw=HW)
    flat_a = jax.tree_util.tree_leaves_with_path(variables)
    flat_b = dict(
        (jax.tree_util.keystr(p), l)
        for p, l in jax.tree_util.tree_leaves_with_path(back)
    )
    for path, leaf in flat_a:
        np.testing.assert_allclose(
            flat_b[jax.tree_util.keystr(path)], np.asarray(leaf), atol=1e-6,
            err_msg=str(path),
        )


def test_train_pretrained_init(tmp_path, imported):
    """network.pretrained accepts raw .params and imported .npz
    (deepim/train.py:165-195 pretrained init path)."""
    from deepim_tpu.config import Config, update_config_dict
    from deepim_tpu.tools.convert_mxnet_checkpoint import save_npz_params
    from deepim_tpu.tools.train_net import build_model, init_pretrained

    mx_params, _, _, variables = imported
    params_path = str(tmp_path / "flownet-0005.params")
    save_mxnet_params(params_path, mx_params)
    cfg = update_config_dict(
        Config(),
        {"SCALES": [HW[0], HW[1]],
         "network": {"pretrained": str(tmp_path / "flownet"),
                     "pretrained_epoch": 5,
                     "PRED_FLOW": True, "PRED_MASK": True}},
    )
    _, params = build_model(cfg)
    loaded = init_pretrained(cfg, params)
    # conv2 kernel must equal the transposed checkpoint weight wherever it
    # lives in the tree.
    from deepim_tpu.models.import_mxnet import _find_leaf
    leaf = _find_leaf(loaded["params"] if "params" in loaded else loaded, "conv2")
    np.testing.assert_allclose(
        np.asarray(leaf["kernel"]),
        mx_params["conv2_weight"].transpose(2, 3, 1, 0), atol=0,
    )

    npz_path = str(tmp_path / "init.npz")
    save_npz_params(npz_path, variables)
    cfg2 = update_config_dict(
        Config(),
        {"SCALES": [HW[0], HW[1]],
         "network": {"pretrained": npz_path,
                     "PRED_FLOW": True, "PRED_MASK": True}},
    )
    _, params2 = build_model(cfg2)
    loaded2 = init_pretrained(cfg2, params2)
    for (pa, la), (pb, lb) in zip(
        jax.tree_util.tree_leaves_with_path(loaded2),
        jax.tree_util.tree_leaves_with_path(variables),
    ):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=0)


def test_cli_roundtrip(tmp_path, imported):
    mx_params = imported[0]
    src = str(tmp_path / "flownet-0000.params")
    save_mxnet_params(src, mx_params)
    npz = str(tmp_path / "imported.npz")
    from deepim_tpu.tools.convert_mxnet_checkpoint import load_npz_params, main

    main(["import", "--params", src, "--out", npz,
          "--height", str(HW[0]), "--width", str(HW[1])])
    tree = load_npz_params(npz)
    assert "params" in tree
    out = str(tmp_path / "exported.params")
    main(["export", "--npz", npz, "--out", out,
          "--height", str(HW[0]), "--width", str(HW[1])])
    back = load_mxnet_params(out)
    np.testing.assert_allclose(
        back["conv2_weight"], mx_params["conv2_weight"], atol=1e-6
    )
    np.testing.assert_allclose(
        back["fc6_weight"], mx_params["fc6_weight"], atol=1e-6
    )
    np.testing.assert_allclose(
        back["deconv5_weight"], mx_params["deconv5_weight"], atol=1e-6
    )
    np.testing.assert_allclose(
        back["flow_conv1_weight"], mx_params["flow_conv1_weight"], atol=1e-6
    )