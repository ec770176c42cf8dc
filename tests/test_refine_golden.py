"""Full-refine-step golden test: the jitted render->zoom->match->update step
vs an independent numpy/step-by-step port of the reference pipeline, with
MXNet-layout weights imported into the flax model.

Composes the already-golden-tested building blocks into ONE end-to-end
check, so the moment a real reference checkpoint is available it can be
dropped in (imported via tools/convert_mxnet_checkpoint) and the whole
refinement trajectory validated against the reference semantics:

  observed/rendered images -> box_rendered mask strategy (numpy) ->
  zoom-factor math (numpy port of zoom_mask.py:47-103) -> affine bilinear
  crop (numpy) -> MXNet-semantics network forward (tests/test_mxnet_import
  _mx_forward) -> invZoomTrans (/wx -> *wx) -> untangled RT_transform
  (scipy-based numpy).
"""
import numpy as np
from scipy.spatial.transform import Rotation as R

import jax
import jax.numpy as jnp

from deepim_tpu.engine.refine import EngineConfig, MeshBuffers, Observation, refine_step, render_at_pose
from deepim_tpu.models import FlowNetDeepIM
from deepim_tpu.models.import_mxnet import flax_from_mxnet
from deepim_tpu.ops.masks import box_fill
from deepim_tpu.render.mesh import MeshBank, make_icosphere, make_test_cube
from deepim_tpu.render.rasterizer import RasterConfig

from test_mxnet_import import HW, _mx_forward, _random_mx_params
from test_zoom import np_bilinear_sample

H, W = HW  # 64x64 (the shapes _random_mx_params is built for)
K_MAT = np.array([[90.0, 0.0, 32.0], [0.0, 90.0, 32.0], [0.0, 0.0, 1.0]], np.float32)

ECFG = EngineConfig(
    height=H, width=W,
    raster=RasterConfig(height=H, width=W, tile_h=16, tile_w=16,
                        max_faces_per_tile=128, chunk=16, znear=0.05, zfar=10.0),
    update_mask="box_rendered",
    input_mask=True, pred_flow=True, pred_mask=True,
    pixel_means=(80.0, 90.0, 100.0),
    num_iters=2,
)


def _np_box(mask):
    """(H, W) -> filled bbox rectangle, end-exclusive like the reference
    (image.py:375 `[y_start:y_end, x_start:x_end]` drops the last row/col)."""
    out = np.zeros_like(mask)
    ys, xs = np.nonzero(mask)
    if len(ys):
        out[ys.min() : ys.max(), xs.min() : xs.max()] = 1.0
    return out


def _np_zoom_factor(mask_obs, mask_gt, mask_rend, pose, k):
    """Reference zoom-factor math (zoom_mask.py:47-103): union bbox of the
    masks around the projected object center, half-extent
    max(0.75*l, 0.75*r, u, d) * 1.4, square in normalized units."""
    obj_c = k @ pose[:, 3]
    cx, cy = obj_c[0] / obj_c[2], obj_c[1] / obj_c[2]

    def bbox(m):
        ys, xs = np.nonzero(m)
        if not len(ys):
            return cx, cx, cy, cy
        return xs.min(), xs.max(), ys.min(), ys.max()

    x0s, x1s, y0s, y1s = zip(*(bbox(m) for m in (mask_obs, mask_gt, mask_rend)))
    left = cx - min(x0s)
    right = max(x1s) - cx
    up = cy - min(y0s)
    down = max(y1s) - cy
    crop_h = 2 * max(0.75 * left, 0.75 * right, up, down) * 1.4
    crop_h = max(crop_h, 1e-4 * H)
    wx = crop_h / H
    wy = wx
    tx = cx / W * 2 - 1
    ty = cy / H * 2 - 1
    return wx, wy, tx, ty


def test_refine_step_matches_numpy_port(rng):
    # Scene: cube + sphere, observed rendered at gt pose.
    bank = MeshBank.from_meshes([make_test_cube(0.07), make_icosphere(0.045, 2)], pad_multiple=64)
    bank_arrays = (
        jnp.asarray(bank.vertices), jnp.asarray(bank.colors),
        jnp.asarray(bank.faces), jnp.asarray(bank.face_valid),
    )
    b = 2
    cls_idx = jnp.asarray([0, 1], jnp.int32)
    meshes = MeshBuffers.gather(bank_arrays, cls_idx)
    rot = R.from_euler("xyz", rng.uniform(-0.4, 0.4, (b, 3))).as_matrix().astype(np.float32)
    pose_gt = np.concatenate([rot, np.zeros((b, 3, 1), np.float32)], 2)
    pose_gt[:, 2, 3] = 0.45
    pose0 = pose_gt.copy()
    pose0[:, 0, 3] += 0.01
    pose0[:, 2, 3] += 0.04

    img, depth, mask = render_at_pose(meshes, jnp.asarray(pose_gt), jnp.asarray(K_MAT), ECFG)

    # MXNet-layout random weights (8 input channels: rgb pair + mask pair)
    # imported into the flax model — the exact path a real reference
    # checkpoint takes.
    mx_params = _random_mx_params(rng, in_ch=8)
    model = FlowNetDeepIM(pred_flow=True, pred_mask=True)
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 8)))
    params = flax_from_mxnet(mx_params, template, input_hw=(H, W), bgr_to_rgb=False)

    obs = Observation(
        image_observed=img, mask_observed=box_fill(mask), mask_gt_observed=None,
        depth_observed=None, k=jnp.asarray(K_MAT),
    )
    pose_new, aux = jax.jit(
        lambda p, o, m, p0: refine_step(p, model, o, m, p0, ECFG)
    )(params, obs, meshes, jnp.asarray(pose0))
    pose_new = np.asarray(pose_new)

    # ---- independent numpy port ----
    from deepim_tpu.geometry.rotations import quat2mat as jquat2mat

    img_rend = np.asarray(aux["image_rendered"])     # rendering itself is
    depth_rend = np.asarray(aux["depth_rendered"])   # golden-tested separately
    pm = np.asarray(ECFG.pixel_means, np.float32).reshape(1, 3, 1, 1)
    img_obs_np = np.asarray(img)

    for j in range(b):
        mask_rend = (depth_rend[j, 0] > 0.2).astype(np.float32)
        mask_obs = _np_box(mask_rend)  # box_rendered strategy
        wx, wy, tx, ty = _np_zoom_factor(mask_obs, mask_obs, mask_rend, pose0[j], K_MAT)

        def crop(x_1chw):  # mean-subtract around sampling as the engine does
            return np_bilinear_sample(
                x_1chw,
                np.array([wx], np.float32), np.array([wy], np.float32),
                np.array([tx], np.float32), np.array([ty], np.float32),
            )

        # ZoomImageWithFactor samples the raw image and subtracts the means
        # after (out-of-frame ends at -mean); ZoomMask rounds after sampling.
        z_obs = crop(img_obs_np[j : j + 1]) - pm
        z_rend = crop(img_rend[j : j + 1]) - pm
        z_mobs = np.round(crop(mask_obs[None, None]))
        z_mrend = np.round(crop(mask_rend[None, None]))
        x = np.concatenate(
            [z_obs / 255.0, z_rend / 255.0, z_mobs, z_mrend], axis=1
        ).astype(np.float32)
        out = _mx_forward(mx_params, jnp.asarray(x))
        quat = np.asarray(out["rot"][0])
        trans_zoom = np.asarray(out["trans"][0])

        # invZoomTrans: multiply (vx, vy) by wx (zoom_trans.py:35-44).
        vx, vy, vz = trans_zoom[0] * wx, trans_zoom[1] * wx, trans_zoom[2]
        # Untangled update (RT_transform.py:74-95, CAMERA frame).
        r_delta = np.asarray(jquat2mat(jnp.asarray(quat / np.linalg.norm(quat))))
        r_new = r_delta @ pose0[j, :, :3]
        zs = pose0[j, 2, 3]
        z2 = zs / np.exp(vz)
        x2 = z2 * (vx + pose0[j, 0, 3] / zs)
        y2 = z2 * (vy + pose0[j, 1, 3] / zs)
        want = np.concatenate([r_new, np.array([[x2], [y2], [z2]], np.float32)], axis=1)

        np.testing.assert_allclose(pose_new[j, :, :3], want[:, :3], atol=2e-4,
                                   err_msg=f"rotation sample {j}")
        np.testing.assert_allclose(pose_new[j, :, 3], want[:, 3], atol=5e-4,
                                   err_msg=f"translation sample {j}")
        # The delta is genuinely nonzero (random weights move the pose).
        assert np.abs(pose_new[j] - pose0[j]).max() > 1e-4
