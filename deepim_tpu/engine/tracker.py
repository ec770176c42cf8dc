"""Video pose tracking: refine frame t initialized from frame t-1's result.

The reference has no tracking driver — it only ships offline refinement
*visualization* videos (toolkit/gen_video_iter_zoom_with_factor.py); this is
the BASELINE "video pose tracking" configuration built TPU-first: the whole
video is one `lax.scan` over frames, each frame running the (itself scanned)
render->zoom->match->update refinement from the previous frame's pose, so a
T-frame track is a single jitted program with zero host round-trips.  The
batch dimension carries independent videos (or objects), which is the dp
sharding axis: tracking N videos on M chips is the same program pjit-ed over
a dp mesh.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from deepim_tpu.engine.refine import EngineConfig, MeshBuffers, Observation, refine


def make_tracker(model: Any, ecfg: EngineConfig, iters_per_frame: int | None = None,
                 init_iters: int = 0, with_stats: bool = False):
    """Build the jittable tracking function.

    Returns track(params, frames, meshes, k, pose0, masks_observed=None):
      frames: (T, B, 3, H, W) RGB [0, 255] video(s), leading time axis;
      meshes: MeshBuffers for the B tracked objects;
      k: (3, 3) intrinsics;
      pose0: (B, 3, 4) initial pose for frame 0 (e.g. a PoseCNN estimate);
      masks_observed: optional (T, B, 1, H, W); defaults to full-frame ones
        (the shipped update_mask='box_rendered' rebuilds the observed box
        from the current render every refinement iteration anyway).
    -> (pose_final (B, 3, 4), poses (T, B, 3, 4)): the per-frame estimates;
       with_stats adds {'raster_dropped': int32} (total CSR truncated pairs
       over the whole track — 0 means every render was exact; nonzero means
       the binning budget must be raised, see rasterize()).

    init_iters > 0 runs that many EXTRA refinement iterations on frame 0
    before the per-frame scan starts ("lock-on"): a detection-quality
    initial pose (PoseCNN noise: 15 deg / 5 cm z) can sit outside the
    basin that iters_per_frame=1-2 recovers within one frame, and an
    un-locked frame 0 poisons every later frame.  Matches the reference's
    own asymmetry between initial refinement (TEST.test_iter=4) and
    frame-to-frame motion.
    """
    n = iters_per_frame if iters_per_frame is not None else ecfg.num_iters

    def track(params, frames, meshes: MeshBuffers, k, pose0, masks_observed=None):
        if masks_observed is None:
            t, b = frames.shape[0], frames.shape[1]
            masks_observed = jnp.ones((t, b, 1) + frames.shape[3:], frames.dtype)

        dropped0 = jnp.zeros((), jnp.int32)
        if init_iters:
            obs0 = Observation(
                image_observed=frames[0],
                mask_observed=masks_observed[0],
                mask_gt_observed=None,
                depth_observed=None,
                k=k,
            )
            pose0, _, st0 = refine(params, model, obs0, meshes, pose0, ecfg,
                                   init_iters, with_stats=True)
            dropped0 = st0["raster_dropped"]

        def step(pose, frame_and_mask):
            frame, mask = frame_and_mask
            obs = Observation(
                image_observed=frame,
                mask_observed=mask,
                mask_gt_observed=None,
                depth_observed=None,
                k=k,
            )
            pose_new, _, st = refine(params, model, obs, meshes, pose, ecfg, n,
                                     with_stats=True)
            return pose_new, (pose_new, st["raster_dropped"])

        pose_final, (poses, dropped) = jax.lax.scan(
            step, pose0, (frames, masks_observed)
        )
        if with_stats:
            return pose_final, poses, {"raster_dropped": dropped0 + jnp.sum(dropped)}
        return pose_final, poses

    return track


def track_video_sharded(
    params,
    model: Any,
    frames,
    meshes: MeshBuffers,
    k,
    pose0,
    ecfg: EngineConfig,
    mesh=None,
    iters_per_frame: int | None = None,
):
    """dp-sharded tracking: batch (videos) sharded over the device mesh,
    params/meshes replicated — BASELINE config #5 ("per-frame tracking
    sharded across chips").  With mesh=None runs single-device."""
    track = make_tracker(model, ecfg, iters_per_frame)
    if mesh is None:
        return jax.jit(track)(params, frames, meshes, k, pose0)

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(None, "dp"))  # (T, B, ...) -> shard B
    mesh_sh = NamedSharding(mesh, P("dp"))

    def put(x, sh):
        return jax.device_put(x, sh)

    params = jax.tree_util.tree_map(lambda x: put(x, repl), params)
    frames = put(frames, batch_sh)
    meshes = jax.tree_util.tree_map(lambda x: put(x, mesh_sh), meshes)
    pose0 = put(pose0, mesh_sh)
    k = put(jnp.asarray(k), repl)
    return jax.jit(track)(params, frames, meshes, k, pose0)
