"""Tests for the on-device flow-from-depth op against a direct numpy port of
the reference CUDA kernel (lib/flow_c/gpu_flow_kernel.cu:32-69)."""
import numpy as np
from scipy.spatial.transform import Rotation as R

import jax.numpy as jnp

from deepim_tpu.geometry.se3 import se3_inverse, se3_mul
from deepim_tpu.ops import flow_from_depth, flow_from_depth_kt


def np_flow_kernel(depth_src, depth_tgt, KT, Kinv):
    """Line-for-line numpy port of flow_kernel (gpu_flow_kernel.cu:32-69)."""
    b, h, w_ = depth_src.shape
    flow = np.zeros((b, 2, h, w_), np.float32)
    valid = np.zeros((b, h, w_), np.float32)
    for bi in range(b):
        for hh in range(h):
            for ww in range(w_):
                d = depth_src[bi, hh, ww]
                x = (ww * Kinv[0, 0] + hh * Kinv[0, 1] + Kinv[0, 2]) * d
                y = (ww * Kinv[1, 0] + hh * Kinv[1, 1] + Kinv[1, 2]) * d
                z = d
                if d > 1e-3:
                    kt = KT[bi]
                    xp = x * kt[0, 0] + y * kt[0, 1] + z * kt[0, 2] + kt[0, 3]
                    yp = x * kt[1, 0] + y * kt[1, 1] + z * kt[1, 2] + kt[1, 3]
                    zp = x * kt[2, 0] + y * kt[2, 1] + z * kt[2, 2] + kt[2, 3] + 1e-15
                    wp = xp / zp
                    hp = yp / zp
                    wi, hi = int(round(wp)), int(round(hp))
                    if 0 <= wp <= w_ - 1 and 0 <= hp <= h - 1:
                        dt = depth_tgt[bi, hi, wi]
                        if abs(zp - dt) < 3e-3:
                            flow[bi, 0, hh, ww] = hp - hh
                            flow[bi, 1, hh, ww] = wp - ww
                            valid[bi, hh, ww] = 1
    return flow, valid


def make_scene(rng, b=2, h=24, w=32):
    k = np.array([[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]], np.float32)
    depth_src = np.zeros((b, h, w), np.float32)
    depth_src[:, 6:18, 8:24] = 1.0 + 0.01 * rng.rand(b, 12, 16).astype(np.float32)
    return k, depth_src


def test_flow_matches_cuda_port_identity(rng):
    k, depth_src = make_scene(rng)
    kt = np.tile(np.concatenate([k, np.zeros((3, 1), np.float32)], 1), (2, 1, 1))
    kinv = np.linalg.inv(k).astype(np.float32)
    got_f, got_v = map(
        np.asarray,
        flow_from_depth_kt(jnp.asarray(depth_src), jnp.asarray(depth_src), jnp.asarray(kt), jnp.asarray(kinv)),
    )
    want_f, want_v = np_flow_kernel(depth_src, depth_src, kt, kinv)
    np.testing.assert_allclose(got_v, want_v)
    np.testing.assert_allclose(got_f, want_f, atol=1e-4)
    # Identity transform: flow must be ~0 and all source pixels visible.
    assert got_v[depth_src > 1e-3].all()
    np.testing.assert_allclose(got_f, 0.0, atol=1e-3)


def test_flow_matches_cuda_port_translated(rng):
    k, depth_src = make_scene(rng)
    b, h, w = depth_src.shape
    # Shift the scene a few pixels: tgt depth shifted right by 3 px.
    depth_tgt = np.roll(depth_src, 3, axis=2)
    # Relative transform that moves points right by 3 px at z=1: dx = 3/fx.
    rel = np.tile(np.eye(3, 4, dtype=np.float32), (b, 1, 1))
    rel[:, 0, 3] = 3.0 / 40.0
    kt = np.einsum("ij,bjk->bik", k, rel).astype(np.float32)
    kinv = np.linalg.inv(k).astype(np.float32)
    got_f, got_v = map(
        np.asarray,
        flow_from_depth_kt(jnp.asarray(depth_src), jnp.asarray(depth_tgt), jnp.asarray(kt), jnp.asarray(kinv)),
    )
    want_f, want_v = np_flow_kernel(depth_src, depth_tgt, kt, kinv)
    np.testing.assert_allclose(got_v, want_v)
    np.testing.assert_allclose(got_f, want_f, atol=1e-4)
    inner = got_v[0, 8:16, 10:20] > 0
    assert inner.any()
    np.testing.assert_allclose(got_f[0, 1, 8:16, 10:20][inner], 3.0, atol=0.1)


def test_gather_at_flow_target_occlusion_gate(rng):
    """'viz_visible' supervision: the visible-instance mask sampled at each
    pixel's flow TARGET — a correspondence landing on an occluder-covered
    target pixel gets weight 0 even though the object-alone depth check
    passes (the gpu_flow_kernel.cu:56 semantics the reference uses)."""
    from deepim_tpu.ops.flow import gather_at_flow_target

    k, depth_src = make_scene(rng)
    b, h, w = depth_src.shape
    depth_tgt = np.roll(depth_src, 3, axis=2)  # scene shifted right 3 px
    rel = np.tile(np.eye(3, 4, dtype=np.float32), (b, 1, 1))
    rel[:, 0, 3] = 3.0 / 40.0
    kt = np.einsum("ij,bjk->bik", k, rel).astype(np.float32)
    flow, valid = map(np.asarray, flow_from_depth_kt(
        jnp.asarray(depth_src), jnp.asarray(depth_tgt), jnp.asarray(kt),
        jnp.asarray(np.linalg.inv(k).astype(np.float32))))
    # Observed-frame visible mask: object's own shifted footprint, but an
    # occluder covers target columns >= 20.
    vis = (depth_tgt > 1e-3).astype(np.float32)
    vis[:, :, 20:] = 0.0
    vis_tgt = np.asarray(gather_at_flow_target(jnp.asarray(vis), jnp.asarray(flow)))
    gated = valid * vis_tgt
    # Pixels whose target column is < 20 keep their weight; ones landing in
    # the occluded band lose it.
    src_cols = np.arange(w)[None, None, :] + flow[:, 1]
    landing_occ = (valid > 0) & (np.round(src_cols) >= 20)
    landing_vis = (valid > 0) & (np.round(src_cols) < 20)
    assert landing_occ.any() and landing_vis.any()
    assert (gated[landing_occ] == 0).all()
    assert (gated[landing_vis] == 1).all()
    # Default (non-occlusion-aware) weights would keep all valid pixels.
    assert (valid[landing_occ] == 1).all()


def test_flow_from_poses_composition(rng):
    """flow_from_depth composes KT = K (pose_tgt pose_src^-1) (flow.py:29)."""
    k, depth_src = make_scene(rng)
    b = depth_src.shape[0]
    r_src = R.random(b, random_state=rng).as_matrix().astype(np.float32)
    t_src = np.tile(np.array([0, 0, 1.5], np.float32), (b, 1))
    pose_src = np.concatenate([r_src, t_src[:, :, None]], 2)
    pose_tgt = pose_src.copy()
    pose_tgt[:, 0, 3] += 0.02

    got_f, got_v = map(
        np.asarray,
        flow_from_depth(
            jnp.asarray(depth_src), jnp.asarray(depth_src),
            jnp.asarray(pose_src), jnp.asarray(pose_tgt), jnp.asarray(k),
        ),
    )
    rel = np.asarray(se3_mul(jnp.asarray(pose_tgt), se3_inverse(jnp.asarray(pose_src))))
    kt = np.einsum("ij,bjk->bik", k, rel).astype(np.float32)
    want_f, want_v = np_flow_kernel(depth_src, depth_src, kt, np.linalg.inv(k).astype(np.float32))
    np.testing.assert_allclose(got_v, want_v)
    np.testing.assert_allclose(got_f, want_f, atol=1e-3)
