"""Shape/semantic tests for the matching network (the reference validates
shapes at startup via Symbol.infer_shape, lib/utils/symbol.py:37-70)."""
import numpy as np

import jax
import jax.numpy as jnp

from deepim_tpu.models import FlowNetDeepIM, assemble_input, fixed_bilinear_upsample
from deepim_tpu.models.flownet import _bilinear_matrix


def small_inputs(rng, b=2, h=96, w=128, masks=True):
    obs = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)
    rend = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)
    if masks:
        mo = jnp.asarray((rng.rand(b, h, w, 1) > 0.5).astype(np.float32))
        mr = jnp.asarray((rng.rand(b, h, w, 1) > 0.5).astype(np.float32))
        return assemble_input(obs, rend, mask_observed=mo, mask_rendered=mr)
    return assemble_input(obs, rend)


def test_forward_shapes(rng):
    x = small_inputs(rng)
    model = FlowNetDeepIM(pred_flow=True, pred_mask=True)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out["rot"].shape == (2, 4)
    assert out["trans"].shape == (2, 3)
    assert out["flow"].shape == (2, 96, 128, 2)
    assert out["mask_logit"].shape == (2, 96, 128, 1)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out["rot"]), axis=1), 1.0, atol=1e-5)


def test_input_channels(rng):
    x = small_inputs(rng, masks=True)
    assert x.shape[-1] == 8
    x2 = small_inputs(rng, masks=False)
    assert x2.shape[-1] == 6


def test_init_biases_identity_rotation(rng):
    """The rot-head init trick makes the initial quaternion near (1,0,0,0)
    (deepIM_flownet.py:793-800: w column dominates)."""
    x = small_inputs(rng)
    model = FlowNetDeepIM(pred_flow=False, pred_mask=False)
    params = model.init(jax.random.PRNGKey(1), x)
    out = model.apply(params, x)
    rot = np.asarray(out["rot"])
    assert np.all(rot[:, 0] > 0.5), rot
    # trans head is zero-initialized (deepIM_flownet.py:801-802).
    np.testing.assert_allclose(np.asarray(out["trans"]), 0.0, atol=1e-6)


def test_bilinear_matrix_interpolates():
    """The separable fixed-upsample reproduces exact values at aligned
    positions and linear interpolation between them."""
    m = _bilinear_matrix(4, 64, 16, 8)
    x = np.array([0.0, 1.0, 2.0, 3.0], np.float32)
    y = m @ x
    # Kernel center c*f = 15.5 => input j contributes peak at 16j + 15.5 - 8.
    # Interior should be monotone and bounded by input range.
    assert y.max() <= 3.0 + 1e-5
    assert np.all(np.diff(y[8:48]) >= -1e-5)


def test_fixed_upsample_shape(rng):
    x = jnp.asarray(rng.rand(1, 6, 8, 2).astype(np.float32))
    y = fixed_bilinear_upsample(x, 96, 128)
    assert y.shape == (1, 96, 128, 2)


def test_bfloat16_forward(rng):
    x = small_inputs(rng)
    model = FlowNetDeepIM(pred_flow=True, pred_mask=True, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out["rot"].dtype == jnp.float32
    assert np.isfinite(np.asarray(out["flow"])).all()


def test_spatial_dims_at_reference_resolution():
    """Encoder output at 480x640 must be 8x10 (fc6 input 81920), matching the
    MXNet shape arithmetic the pretrained checkpoints assume."""
    model = FlowNetDeepIM(pred_flow=False, pred_mask=False)
    x = jnp.zeros((1, 480, 640, 6))
    params = model.init(jax.random.PRNGKey(0), x)
    fc6_kernel = params["params"]["fc6"]["kernel"]
    assert fc6_kernel.shape == (1024 * 8 * 10, 256)


def test_group_picker_forward_and_grad(rng):
    """group_pick vs numpy gather; gradient is a scatter to the picked group
    (group_picker.py:43-56 hand-written backward, here via autodiff)."""
    from deepim_tpu.ops.group_picker import group_pick

    b, g, c = 5, 4, 3
    x = jnp.asarray(rng.rand(b, g * c).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, g, size=b).astype(np.int32))
    out = group_pick(x, idx, g)
    ref = np.stack([np.asarray(x)[i].reshape(g, c)[int(idx[i])] for i in range(b)])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6)

    # Ids >= num_groups are interpreted 1-based (the pairdb mask_idx
    # convention): idx+1 < g picks group idx+1; idx+1 == g wraps to idx.
    out1 = group_pick(x, idx + 1, g)
    expect = np.stack([
        np.asarray(x)[i].reshape(g, c)[int(idx[i]) + 1 if int(idx[i]) + 1 < g else int(idx[i])]
        for i in range(b)
    ])
    np.testing.assert_allclose(np.asarray(out1), expect, rtol=1e-6)

    grad = jax.grad(lambda xx: group_pick(xx, idx, g).sum())(x)
    gref = np.zeros((b, g, c), np.float32)
    for i in range(b):
        gref[i, int(idx[i])] = 1.0
    np.testing.assert_allclose(np.asarray(grad).reshape(b, g, c), gref, rtol=1e-6)


def test_multi_regressor_heads(rng):
    """REGRESSOR_NUM>1: per-class SE(3) head groups selected by class index;
    different classes give different predictions for the same input."""
    x = small_inputs(rng, b=2)
    model = FlowNetDeepIM(pred_flow=False, pred_mask=False, num_regressors=3)
    ci = jnp.asarray([0, 2], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, ci)
    out = model.apply(params, x, ci)
    assert out["rot"].shape == (2, 4)
    assert out["trans"].shape == (2, 3)
    # quaternion normalized, w-biased init near identity for every group
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out["rot"]), axis=-1), 1.0, rtol=1e-5)
    assert np.all(np.asarray(out["rot"])[:, 0] > 0.5)

    x0 = small_inputs(rng, b=1)
    o_a = model.apply(params, x0, jnp.asarray([0], jnp.int32))
    o_b = model.apply(params, x0, jnp.asarray([1], jnp.int32))
    assert not np.allclose(np.asarray(o_a["rot"]), np.asarray(o_b["rot"]))


def test_cross_resolution_seed_merge():
    """merge_matching_params transfers every resolution-independent param
    across frame sizes; only fc6 (flattened conv6 input) stays fresh."""
    from deepim_tpu.engine.checkpoint import merge_matching_params

    model = FlowNetDeepIM(pred_flow=True, pred_mask=True)
    p_small = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 8)))
    p_big = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 96, 128, 8)))
    merged, skipped = merge_matching_params(p_big, p_small)
    assert skipped == ["['params']['fc6']['kernel']"], skipped
    # Transferred leaves equal the source; fc6 kernel keeps the fresh init.
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["Conv_0"]["flow_conv1"]["kernel"]),
        np.asarray(p_small["params"]["Conv_0"]["flow_conv1"]["kernel"]),
    )
    assert (
        merged["params"]["fc6"]["kernel"].shape
        == p_big["params"]["fc6"]["kernel"].shape
    )
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["fc6"]["kernel"]),
        np.asarray(p_big["params"]["fc6"]["kernel"]),
    )
    # The big model runs with the merged tree.
    out = model.apply(merged, jnp.zeros((2, 96, 128, 8)))
    assert out["rot"].shape == (2, 4) and np.isfinite(np.asarray(out["rot"])).all()
