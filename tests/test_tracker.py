"""Video pose tracking: frame t initialized from frame t-1's refined pose,
the whole track one jitted scan, dp-shardable over videos (BASELINE config
"video pose tracking"; the reference ships no tracking driver at all).

The matching network is replaced by an analytic centroid/scale matcher (a
classical render-and-compare tracker) so the test can assert *bounded
tracking error over a long moving sequence* without training: lateral error
is corrected from the foreground-centroid shift between the zoomed observed
and rendered views, depth from their area ratio — exercising exactly the
zoom -> predict -> untangled-update -> re-render loop the learned model
uses."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepim_tpu.engine import EngineConfig, MeshBuffers, make_tracker, render_at_pose, track_video_sharded
from deepim_tpu.engine.tracker import make_tracker as _make_tracker  # noqa: F401
from deepim_tpu.render.mesh import MeshBank, make_icosphere, make_test_cube
from deepim_tpu.render.rasterizer import RasterConfig

H, W = 96, 128
FX = FY = 140.0
K_MAT = np.array([[FX, 0.0, 64.0], [0.0, FY, 48.0], [0.0, 0.0, 1.0]], np.float32)

ECFG = EngineConfig(
    height=H,
    width=W,
    raster=RasterConfig(height=H, width=W, tile_h=8, tile_w=64, max_faces_per_tile=128, chunk=16, znear=0.05, zfar=10.0),
    update_mask="box_rendered",
    num_iters=2,
)


class CentroidOracle:
    """Analytic stand-in for FlowNetDeepIM: predicts the untangled delta
    from foreground centroid shift (vx, vy) and area ratio (vz) of the
    zoomed (observed, rendered) pair — same input, same output contract.

    Units: the zoomed crop is the wx-scaled full frame, so a zoomed-pixel
    centroid shift du corresponds to vx_zoomed = du / fx (zoom_trans then
    multiplies by wx and T_transform converts to metric); the projected area
    scales with 1/z^2, so vz = 0.5 log(area_obs / area_rend)."""

    num_regressors = 1

    def __init__(self, gain: float = 0.8):
        self.gain = gain

    def apply(self, params, x):
        obs = jnp.sum(x[..., 0:3], axis=-1)   # (B, h, w) luminance
        rend = jnp.sum(x[..., 3:6], axis=-1)
        fo = (obs > 0.02).astype(jnp.float32)
        fr = (rend > 0.02).astype(jnp.float32)
        h, w = fo.shape[1], fo.shape[2]
        ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
        xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
        area_o = jnp.maximum(jnp.sum(fo, axis=(1, 2)), 1.0)
        area_r = jnp.maximum(jnp.sum(fr, axis=(1, 2)), 1.0)
        cx_o = jnp.sum(fo * xs, axis=(1, 2)) / area_o
        cy_o = jnp.sum(fo * ys, axis=(1, 2)) / area_o
        cx_r = jnp.sum(fr * xs, axis=(1, 2)) / area_r
        cy_r = jnp.sum(fr * ys, axis=(1, 2)) / area_r
        vx = self.gain * (cx_o - cx_r) / FX
        vy = self.gain * (cy_o - cy_r) / FY
        vz = self.gain * 0.5 * jnp.log(area_o / area_r)
        rot = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0, 0.0]]), (x.shape[0], 1))
        return {"rot": rot, "trans": jnp.stack([vx, vy, vz], axis=-1)}


def make_orbit(n_frames: int, b: int = 2):
    """Objects translating along a slow Lissajous path, fixed rotation."""
    t = np.arange(n_frames, dtype=np.float32)
    poses = np.zeros((n_frames, b, 3, 4), np.float32)
    poses[:, :, :3, :3] = np.eye(3, dtype=np.float32)
    for j in range(b):
        phase = j * 1.3
        poses[:, j, 0, 3] = 0.05 * np.sin(0.12 * t + phase)
        poses[:, j, 1, 3] = 0.04 * np.cos(0.09 * t + phase)
        poses[:, j, 2, 3] = 0.55 + 0.06 * np.sin(0.07 * t + phase)
    return poses


@pytest.fixture(scope="module")
def scene():
    bank = MeshBank.from_meshes([make_icosphere(0.05, 2), make_test_cube(0.07)], pad_multiple=64)
    bank_arrays = (
        jnp.asarray(bank.vertices), jnp.asarray(bank.colors),
        jnp.asarray(bank.faces), jnp.asarray(bank.face_valid),
    )
    cls_idx = jnp.asarray([0, 1], jnp.int32)
    meshes = MeshBuffers.gather(bank_arrays, cls_idx)
    n_frames = 60
    poses_gt = make_orbit(n_frames, b=2)
    # Render the whole video (T*B batched render).
    flat = jnp.asarray(poses_gt.reshape(n_frames * 2, 3, 4))
    meshes_flat = MeshBuffers.gather(bank_arrays, jnp.tile(cls_idx, n_frames))
    img, _, _ = render_at_pose(meshes_flat, flat, jnp.asarray(K_MAT), ECFG)
    frames = np.asarray(img).reshape(n_frames, 2, 3, H, W)
    return meshes, jnp.asarray(frames), poses_gt


def _errors(poses, poses_gt):
    trans_err = np.linalg.norm(poses[..., 3] - poses_gt[..., 3], axis=-1)
    return trans_err  # (T, B)


def test_tracking_error_stays_bounded(scene):
    meshes, frames, poses_gt = scene
    model = CentroidOracle()
    track = jax.jit(make_tracker(model, ECFG, iters_per_frame=2))
    # Init: frame-0 pose with a real offset (1-2 cm lateral, 4 cm depth).
    pose0 = poses_gt[0].copy()
    pose0[:, 0, 3] += 0.015
    pose0[:, 1, 3] -= 0.01
    pose0[:, 2, 3] += 0.04
    _, poses = track(None, frames, meshes, jnp.asarray(K_MAT), jnp.asarray(pose0))
    poses = np.asarray(poses)
    err = _errors(poses, poses_gt)  # (T, B)
    # Converges from the perturbed init and stays locked over 60 frames.
    assert err[0].max() < 0.05
    assert err[5:].max() < 0.03, f"tracking lost: max err {err[5:].max():.4f}"
    assert err[-10:].mean() < 0.015
    # No drift: late-window error no worse than early-window.
    assert err[-10:].mean() < err[5:15].mean() + 0.005


def test_tracking_beats_static_init(scene):
    """Without frame-to-frame propagation (re-initializing every frame from
    the frame-0 pose) the moving object escapes; propagation keeps it."""
    meshes, frames, poses_gt = scene
    model = CentroidOracle()
    track = jax.jit(make_tracker(model, ECFG, iters_per_frame=2))
    pose0 = jnp.asarray(poses_gt[0])
    _, poses = track(None, frames, meshes, jnp.asarray(K_MAT), pose0)
    err_tracked = _errors(np.asarray(poses), poses_gt)
    err_static = _errors(np.broadcast_to(poses_gt[0], poses_gt.shape), poses_gt)
    assert err_tracked[10:].mean() < 0.5 * err_static[10:].mean()


def test_tracking_dp_sharded(scene):
    """The same track pjit-ed over an 8-device dp mesh gives identical
    results (videos are the sharded axis)."""
    from deepim_tpu.parallel import make_mesh

    meshes, frames, poses_gt = scene
    b = 8
    reps = b // frames.shape[1]
    frames8 = jnp.tile(frames, (1, reps, 1, 1, 1))
    meshes8 = MeshBuffers(
        *[None if x is None else jnp.tile(x, (reps,) + (1,) * (x.ndim - 1)) for x in meshes]
    )
    pose0 = jnp.tile(jnp.asarray(poses_gt[0]), (reps, 1, 1))
    model = CentroidOracle()
    mesh = make_mesh(8)
    _, poses_sh = track_video_sharded(
        None, model, frames8, meshes8, K_MAT, pose0, ECFG, mesh=mesh, iters_per_frame=2
    )
    _, poses_1 = track_video_sharded(
        None, model, frames8, meshes8, K_MAT, pose0, ECFG, mesh=None, iters_per_frame=2
    )
    np.testing.assert_allclose(np.asarray(poses_sh), np.asarray(poses_1), atol=2e-3)
