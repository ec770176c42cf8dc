"""The render-and-compare refinement engine.

One refinement iteration = render the mesh at the current pose estimate,
compute the zoom crop, run the matching network on the (observed, rendered)
pair, and apply the untangled SE(3) delta.  The whole loop is a
`jax.lax.scan` inside a single jitted function, so the 4-iteration test-time
refinement never leaves the chip — replacing the reference's host loop of
predict -> numpy RT_transform -> OpenGL re-render -> update_data_batch ->
predict (deepim/core/tester.py:389-485) and the training-time
batchUpdaterPyMulti host round trip (lib/pair_matching/
batch_updater_py_multi.py:91-328).

Mask-update strategies mirror TEST.UPDATE_MASK / TRAIN.UPDATE_MASK
(lib/pair_matching/data_pair.py:93-123): 'box_rendered' rebuilds the
observed-mask rectangle from the current rendered mask every iteration;
'init'/'box_gt'/'mask_gt' keep the loader-provided observed mask fixed.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from deepim_tpu.config import Config
from deepim_tpu.geometry.se3 import RT_transform
from deepim_tpu.models.flownet import assemble_input
from deepim_tpu.ops.masks import box_fill
from deepim_tpu.ops.zoom import (
    zoom_depths,
    zoom_factor_from_images,
    zoom_factor_from_masks,
    zoom_images,
    zoom_mask,
    zoom_masks,
    zoom_trans,
)
from deepim_tpu.render.rasterizer import RasterConfig, rasterize, render_mask


@dataclass(frozen=True)
class EngineConfig:
    """Static refinement-engine parameters (hashable; safe as a jit static)."""

    height: int = 480
    width: int = 640
    raster: RasterConfig = RasterConfig()
    rot_coord: str = "CAMERA"
    rot_type: str = "QUAT"  # network.ROT_TYPE: 'QUAT' (4-dim) | 'EULER' (3-dim)
    trans_means: tuple[float, float, float] = (0.0, 0.0, 0.0)
    trans_stds: tuple[float, float, float] = (1.0, 1.0, 1.0)
    pixel_means: tuple[float, float, float] = (0.0, 0.0, 0.0)
    input_depth: bool = False
    input_mask: bool = True
    pred_flow: bool = True
    pred_mask: bool = True
    update_mask: str = "box_rendered"
    normalize_flow: float = 20.0
    normalize_3d_point: float = 0.1
    # network.STANDARD_FLOW_REP (config.py:36): False = the shipped [dh, dw]
    # channel order, True = standard [dw, dh] (lib/pair_matching/flow.py:55-59).
    standard_flow_rep: bool = False
    mask_thresh: float = 0.2
    depth_factor_for_input: float = 255.0  # reference divides depth by 255 (deepIM_flownet.py:38-39)
    num_iters: int = 4
    # Exact per-fragment texture sampling in the on-device render
    # (rasterize_textured) instead of vertex-baked colors; requires a mesh
    # bank built with keep_textures (dataset.TEXTURE_SAMPLING).
    texture_sampling: bool = False
    # True = the loader built a real initial observed mask on host (e.g.
    # TEST.MASK_DILATE dilated box, image.py:357-381) that must be used for
    # the FIRST iteration even under update_mask='box_rendered'; later
    # iterations refresh from the on-device render (data_pair.py:93-105).
    init_mask_host: bool = False
    # Dtype of the IMAGE zoom resample's MXU matmuls ('float32' |
    # 'bfloat16').  The network consumes the zoomed images in bfloat16
    # anyway and the crop is non-differentiable (stop_gradient), so
    # sampling them in bf16 costs ~0.5% pixel noise and runs the
    # resample's two matmuls at the MXU's bf16 rate (~4x f32 on v5e) —
    # the zoom was ~8-16 ms/iteration at production batch in f32.  Masks,
    # depths and flow labels always resample in f32 (their rounding /
    # threshold semantics are exact).
    zoom_dtype: str = "float32"

    @staticmethod
    def from_config(
        cfg: Config, train: bool = False, bank_arrays=None, k=None
    ) -> "EngineConfig":
        """Build from a Config.  Pass the mesh bank (`bank_arrays`, tuple or
        dict as fed to MeshBuffers.gather) so the CSR binning budget is
        sized from the actual face geometry (tune_raster_for_bank) — the
        safe default for every production driver; without it big-triangle
        meshes fall back to the S=8 per-face budget and rely on the
        runtime dropped-pair warning."""
        # The Pallas per-tile kernel is the production path on TPU; the pure
        # XLA pipeline is used on CPU (tests) where Pallas runs interpreted.
        # Image zoom likewise runs bf16 on TPU (f32 on CPU keeps the golden
        # tests bit-stable).
        use_pallas = jax.default_backend() == "tpu"
        ecfg = EngineConfig(
            height=cfg.height,
            width=cfg.width,
            raster=RasterConfig(
                height=cfg.height,
                width=cfg.width,
                znear=cfg.dataset.ZNEAR,
                zfar=cfg.dataset.ZFAR,
                use_pallas=use_pallas,
            ),
            rot_coord=cfg.network.ROT_COORD,
            rot_type=cfg.network.ROT_TYPE,
            trans_means=cfg.dataset.trans_means,
            trans_stds=cfg.dataset.trans_stds,
            pixel_means=cfg.network.PIXEL_MEANS,
            input_depth=cfg.network.INPUT_DEPTH,
            input_mask=cfg.network.INPUT_MASK,
            pred_flow=cfg.network.PRED_FLOW,
            pred_mask=cfg.network.PRED_MASK,
            update_mask=(cfg.TRAIN.UPDATE_MASK if train else cfg.TEST.UPDATE_MASK),
            normalize_flow=cfg.dataset.NORMALIZE_FLOW,
            normalize_3d_point=cfg.dataset.NORMALIZE_3D_POINT,
            standard_flow_rep=cfg.network.STANDARD_FLOW_REP,
            num_iters=(cfg.network.TRAIN_ITER_SIZE if train else cfg.TEST.test_iter),
            init_mask_host=(not train) and cfg.TEST.MASK_DILATE,
            texture_sampling=cfg.dataset.TEXTURE_SAMPLING,
            zoom_dtype="bfloat16" if use_pallas else "float32",
        )
        if bank_arrays is not None:
            ecfg = tune_raster_for_bank(
                ecfg, bank_arrays,
                cfg.dataset.intrinsic_matrix() if k is None else k,
            )
        return ecfg


def tune_raster_for_bank(
    ecfg: EngineConfig, bank_arrays, k=None, max_pairs_per_sample: int = 4_000_000,
    z_min: float | None = None,
) -> EngineConfig:
    """Size the CSR binning pair budget from the bank's actual face geometry.

    The CSR path's per-face tile budget S = bin_pairs / F silently capped
    big-triangle meshes at S=8 tiles per face; the reference GL renderer is
    exact for any mesh (render_py_multi.py:84-99).  This computes a
    pose-independent worst case per bank: a face whose model-space corner
    spread is d projects (for faces that survive the znear cull and the
    on-screen test) to a screen bbox of at most
    d * (f + 2*image_extent) / znear pixels per axis — |u1-u2| =
    fx*|x1/z1 - x2/z2| <= (fx*|x1-x2| + |u2 - cx|*|z1-z2|) / z1 with
    |u2 - cx| bounded by the screen for non-culled faces — which spans at
    most (ceil(px/tile_w)+1) * (ceil(py/tile_h)+1) tiles.  bin_pairs is set
    to cover that exactly; if the exact budget exceeds
    `max_pairs_per_sample` (giant-face CAD meshes at close znear) the
    budget is clamped and a host-side warning is logged — the rasterizer
    additionally counts and warns about actual dropped pairs at runtime.

    Heavy-tailed meshes: a uniform budget is sized by the WORST unit, so a
    few wide triangles force a huge slot range on every tiny unit (the
    4M-pair cap then truncates).  When the per-unit spans vary by >2x the
    tuner instead emits TIERED budgets (RasterConfig.csr_tiers): runs of
    similar-span units each get their own budget.  Tiers compress well only
    when the bank's faces are ordered by size bucket — see
    mesh.order_faces_for_binning; an unordered mixed bank degrades to many
    runs and falls back to the uniform worst-case budget.

    z_min (optional): size screen spans at this camera depth instead of the
    frustum znear.  The frustum bound is safe for any pose but wildly
    conservative when the workload's objects never approach the near plane
    (a 0.08 m face at znear 0.05 "could" span the screen); with z_min the
    budget is exact for all poses with z >= z_min, and violations are
    OBSERVABLE: rasterize's returned dropped-pair counter (asserted by
    every production driver) catches any pose that truncates.

    No-op for configurations that resolve to dense binning (F <= 2048 under
    'auto', or binning='dense'), which has no per-face budget.
    """
    import dataclasses

    import numpy as np

    if isinstance(bank_arrays, dict):
        verts = bank_arrays["vertices"]
        faces = bank_arrays["faces"]
        fvalid = bank_arrays["face_valid"]
    else:
        verts, _, faces, fvalid = bank_arrays[:4]
    verts, faces, fvalid = np.asarray(verts), np.asarray(faces), np.asarray(fvalid)
    f_padded = faces.shape[1]
    rcfg = ecfg.raster
    csr = rcfg.binning == "csr" or (rcfg.binning == "auto" and f_padded > 2048)
    if not csr or rcfg.bin_pairs:
        return ecfg  # dense path, or an explicitly sized budget

    corners = np.take_along_axis(
        verts, faces.reshape(faces.shape[0], -1)[..., None], axis=1
    ).reshape(faces.shape[0], f_padded, 3, 3)
    # Binning granularity: with csr_pack > 1 the rasterizer bins UNION
    # bboxes of `pack` consecutive faces, so the budget must cover the
    # worst-case pack-unit diameter (not the single-face one).
    pack = 1
    if rcfg.csr_pack > 1 and f_padded % rcfg.csr_pack == 0 \
            and rcfg.csr_chunk % rcfg.csr_pack == 0:
        pack = rcfg.csr_pack
    n_units = f_padded // pack
    c = corners.shape[0]
    if pack > 1:
        c4 = corners.reshape(c, n_units, pack, 3, 3)
        v4 = fvalid.reshape(c, n_units, pack)
        # Invalid (padded/degenerate) faces must not inflate the union —
        # binning excludes them too.  Collapse their corners onto corner 0
        # of the unit's first valid face (zero extra spread).
        first = np.argmax(v4, axis=2)
        ref = np.take_along_axis(
            c4[:, :, :, 0, :], first[..., None, None], axis=2
        )[:, :, 0]  # (C, U, 3)
        corners = np.where(v4[..., None, None], c4, ref[:, :, None, None, :]).reshape(
            c, n_units, pack * 3, 3
        )
        fvalid = v4.any(axis=2)
    # True max pairwise corner distance (the rotation-invariant unit
    # diameter): per-axis spread under-estimates the camera-plane extent of
    # a diagonal face by up to sqrt(3), which made the budget bound only
    # empirically (not provably) conservative.
    diffs = corners[:, :, :, None, :] - corners[:, :, None, :, :]
    diam = np.linalg.norm(diffs, axis=-1).max(axis=(2, 3))  # (C, U)
    diam = np.where(fvalid, diam, 0.0)
    if not fvalid.any():
        return ecfg
    if k is not None:
        kk = np.asarray(k, np.float32).reshape(3, 3)
        fx, fy = float(kk[0, 0]), float(kk[1, 1])
    else:
        fx = fy = float(max(rcfg.width, rcfg.height))
    zlo = max(rcfg.znear, z_min or 0.0)
    # The CSR path bins into its own fine tiles (csr_tile_h x csr_tile_w).
    th, tw = rcfg.csr_tile_h, rcfg.csr_tile_w
    n_tiles = (-(-rcfg.height // th)) * (-(-rcfg.width // tw))
    # Per-unit worst-case span; the budget at each unit index must cover
    # EVERY class (the bank shares one face layout across classes).
    d_u = diam.max(axis=0)  # (U,)
    px = d_u * (fx + 2.0 * rcfg.width) / zlo
    py = d_u * (fy + 2.0 * rcfg.height) / zlo
    span_u = np.minimum(
        (np.ceil(px / tw).astype(np.int64) + 1)
        * (np.ceil(py / th).astype(np.int64) + 1),
        n_tiles,
    )
    span_u = np.maximum(span_u, 1)
    s_max = int(span_u.max())
    if s_max <= 2 * max(1, int(span_u.min())) or n_units < 2:
        # Near-uniform spans: the single-budget layout (historical path).
        s = min(s_max, max(1, max_pairs_per_sample // n_units))
        if s < s_max:
            from deepim_tpu.utils.logger import logger

            logger.warning(
                "tune_raster_for_bank: exact CSR budget needs %d tiles/unit "
                "but the %d-pair memory cap allows only %d; renders of faces "
                "wider than the budget will drop pairs (the rasterizer warns "
                "at runtime when that actually happens)",
                s_max, max_pairs_per_sample, s,
            )
        return dataclasses.replace(
            ecfg, raster=dataclasses.replace(rcfg, bin_pairs=n_units * s, csr_tiers=())
        )
    # Heavy-tailed spans: tiered budgets.  Quantize each unit's span to the
    # next power-of-two level >= 8 and merge consecutive equal levels into
    # runs; on a size-ordered bank this yields a handful of tiers.
    lvl = np.maximum(8, 1 << np.ceil(np.log2(span_u)).astype(np.int64))
    lvl = np.minimum(lvl, n_tiles)
    tiers: list[tuple[int, int]] = []
    run_lvl = int(lvl[0])
    for i in range(1, n_units):
        if int(lvl[i]) != run_lvl:
            tiers.append((i, run_lvl))
            run_lvl = int(lvl[i])
    tiers.append((n_units, run_lvl))
    total = sum((end - (tiers[i - 1][0] if i else 0)) * s for i, (end, s) in enumerate(tiers))
    if len(tiers) > 16 or total > max_pairs_per_sample:
        # Too fragmented (unordered bank) or still too big: collapse to the
        # capped uniform budget and let the runtime counter police drops.
        from deepim_tpu.utils.logger import logger

        s = min(s_max, max(1, max_pairs_per_sample // n_units))
        logger.warning(
            "tune_raster_for_bank: %d tier runs / %d total pairs exceed the "
            "budget shape; falling back to a capped uniform %d tiles/unit "
            "(order the bank's faces with mesh.order_faces_for_binning for "
            "tight tiers)", len(tiers), total, s,
        )
        return dataclasses.replace(
            ecfg, raster=dataclasses.replace(rcfg, bin_pairs=n_units * s, csr_tiers=())
        )
    return dataclasses.replace(
        ecfg,
        raster=dataclasses.replace(
            rcfg, bin_pairs=int(total), csr_tiers=tuple(tiers)
        ),
    )


class MeshBuffers(NamedTuple):
    """Per-sample mesh data, gathered from a MeshBank by class index."""

    vertices: jax.Array   # (B, V, 3)
    colors: jax.Array     # (B, V, 3)
    faces: jax.Array      # (B, F, 3)
    face_valid: jax.Array  # (B, F)
    normals: jax.Array | None = None  # (B, V, 3), for the lit (ModelNet) path
    uv: jax.Array | None = None        # (B, V, 2), texture-sampling path
    textures: jax.Array | None = None  # (B, TH, TW, 3)
    # Pre-expanded face corners (vertices[faces] / colors[faces], both
    # (B, F, 3, 3)).  Pose-independent, so expanding once per batch here
    # keeps the per-render (x4 scan iterations) pipeline gather-free —
    # rasterize() projects corners directly (bit-identical results).
    corners: jax.Array | None = None
    corner_colors: jax.Array | None = None

    def expand_corners(self) -> "MeshBuffers":
        """Fill `corners`/`corner_colors` from vertices/colors/faces."""
        if self.corners is not None:
            return self
        b, nf, _ = self.faces.shape
        vattr = jnp.concatenate([self.vertices, self.colors], axis=-1)
        fattr = jnp.take_along_axis(
            vattr, self.faces.reshape(b, nf * 3)[..., None], axis=1
        ).reshape(b, nf, 3, 6)
        return self._replace(corners=fattr[..., 0:3], corner_colors=fattr[..., 3:6])

    @staticmethod
    def gather(bank_arrays, class_index: jax.Array) -> "MeshBuffers":
        """bank_arrays: legacy tuple (verts, cols, faces, valid[, normals])
        or a dict with those keys plus optional 'uv'/'textures'."""
        if isinstance(bank_arrays, dict):
            def g(key):
                arr = bank_arrays.get(key)
                return None if arr is None else arr[class_index]

            return MeshBuffers(
                g("vertices"), g("colors"), g("faces"), g("face_valid"),
                g("normals"), g("uv"), g("textures"),
            ).expand_corners()
        verts, cols, faces, valid = bank_arrays[:4]
        normals = bank_arrays[4][class_index] if len(bank_arrays) > 4 else None
        return MeshBuffers(
            verts[class_index], cols[class_index], faces[class_index],
            valid[class_index], normals,
        ).expand_corners()


class LightParams(NamedTuple):
    """Per-sample point-light parameters for the unseen-object render path
    (render_py_light_modelnet_multi.py:131 render() arguments)."""

    position: jax.Array          # (B, 3) camera frame
    intensity: jax.Array         # (B, 3)
    brightness_ratio: jax.Array  # (B,) or scalar


class Observation(NamedTuple):
    """Per-batch data that stays fixed across refinement iterations."""

    image_observed: jax.Array          # (B, 3, H, W) RGB, raw [0, 255]
    mask_observed: jax.Array           # (B, 1, H, W) strategy-applied mask
    mask_gt_observed: jax.Array | None  # (B, 1, H, W); None at test time
    depth_observed: jax.Array | None   # (B, 1, H, W) or None
    k: jax.Array                       # (3, 3)
    light: "LightParams | None" = None  # unseen-object (ModelNet) rendering
    class_index: jax.Array | None = None  # (B,) for REGRESSOR_NUM>1 heads


def render_at_pose(
    meshes: MeshBuffers, pose: jax.Array, k: jax.Array, ecfg: EngineConfig,
    light: "LightParams | None" = None, with_stats: bool = False,
):
    """Render the batch at `pose` -> (image (B,3,H,W) RGB [0,255],
    depth (B,1,H,W), mask (B,1,H,W)[, dropped int32 when with_stats]).
    Gradients are stopped: rendering is a label/input generator, as in the
    reference (SURVEY.md §7.4).  `dropped` is the rasterizer's CSR
    truncated-pair counter (0 = exact render on every backend).

    With `light` (and mesh normals), vertex colors are lit with the
    reference's point-light model first (render/lighting.py)."""
    colors = meshes.colors
    corners, corner_colors = meshes.corners, meshes.corner_colors
    if light is not None and meshes.normals is not None:
        from deepim_tpu.render.lighting import lit_vertex_colors

        colors = lit_vertex_colors(
            meshes.vertices, meshes.normals, colors, pose,
            light.position, light.intensity, light.brightness_ratio,
        )
        corner_colors = None  # lit colors are pose-dependent; re-expand inside
        corners = None
    if ecfg.texture_sampling and meshes.uv is not None and meshes.textures is not None and light is None:
        from deepim_tpu.render.rasterizer import rasterize_textured

        rgb, depth, dropped = rasterize_textured(
            meshes.vertices, meshes.uv, meshes.textures,
            meshes.faces, meshes.face_valid, pose, k, ecfg.raster,
            with_stats=True,
        )
    else:
        rgb, depth, dropped = rasterize(
            meshes.vertices, colors, meshes.faces, meshes.face_valid, pose, k,
            ecfg.raster, corners=corners, corner_colors=corner_colors,
            with_stats=True,
        )
    rgb = jax.lax.stop_gradient(jnp.transpose(rgb, (0, 3, 1, 2)))
    depth = jax.lax.stop_gradient(depth[:, None])
    mask = render_mask(depth, ecfg.mask_thresh)
    if with_stats:
        return rgb, depth, mask, dropped
    return rgb, depth, mask


def refine_step(
    params: Any,
    model: Any,
    obs: Observation,
    meshes: MeshBuffers,
    pose: jax.Array,
    ecfg: EngineConfig,
    mask_observed_state: jax.Array | None = None,
    iter_index: jax.Array | None = None,
):
    """One render->zoom->match->update iteration.

    `mask_observed_state` is the iteration-carried observed mask: under
    UPDATE_MASK='box_observed' the reference replaces the observed mask with
    the box of the network's *predicted* full-frame mask from the previous
    iteration (test symbol emits the inverse-zoomed sigmoid mask,
    deepIM_flownet.py:350-358; update_data_batch boxes it,
    data_pair.py:106-123).  None falls back to the loader-provided mask.

    Returns (pose_new (B, 3, 4), aux dict with the network outputs, the zoom
    factor, the rendered buffers for loss computation / inspection, and —
    when the model has a mask head — 'mask_pred_full', the un-zoomed
    binarized predicted mask to carry into the next iteration).
    """
    k = obs.k
    pm = jnp.asarray(ecfg.pixel_means, jnp.float32)
    t_means = jnp.asarray(ecfg.trans_means, jnp.float32)
    t_stds = jnp.asarray(ecfg.trans_stds, jnp.float32)

    image_rendered, depth_rendered, mask_rendered, raster_dropped = render_at_pose(
        meshes, pose, k, ecfg, obs.light, with_stats=True
    )

    if ecfg.update_mask == "box_rendered":
        mask_obs = box_fill(mask_rendered)
        if ecfg.init_mask_host and iter_index is not None:
            # First iteration keeps the host-built (e.g. dilated) mask; the
            # reference builds iteration 0's input on host (image.py:357-381)
            # and only refreshes from renders in update_data_batch.
            mask_obs = jnp.where(iter_index == 0, obs.mask_observed, mask_obs)
    elif ecfg.update_mask == "box_observed":
        carried = (
            mask_observed_state if mask_observed_state is not None else obs.mask_observed
        )
        mask_obs = box_fill(carried)
    else:  # 'init', 'box_gt', 'mask_gt', ... : keep the loader-provided mask
        mask_obs = obs.mask_observed
    mask_gt_obs = obs.mask_gt_observed if obs.mask_gt_observed is not None else mask_obs

    # Images enter the zoom mean-subtracted (train.py feeds transformed
    # images; zoom adds/removes the means around sampling).  zoom_dtype
    # picks the resample matmuls' MXU precision for the IMAGES only.
    zdt = jnp.dtype(ecfg.zoom_dtype)
    img_obs_norm = obs.image_observed - pm.reshape(1, 3, 1, 1)
    img_rend_norm = image_rendered - pm.reshape(1, 3, 1, 1)

    if ecfg.input_mask:
        zf = zoom_factor_from_masks(mask_obs, mask_gt_obs, mask_rendered, pose, k)
    else:
        # Foreground thresholding for the factor stays f32.
        zf = zoom_factor_from_images(img_obs_norm, img_rend_norm, pose, k, pm)
    z_img_obs, z_img_rend = zoom_images(
        img_obs_norm.astype(zdt), img_rend_norm.astype(zdt), zf, pm
    )

    kwargs = {}
    if ecfg.input_mask:
        z_mask_obs, z_mask_gt, z_mask_rend = zoom_masks(mask_obs, mask_gt_obs, mask_rendered, zf)
        kwargs["mask_observed"] = jnp.transpose(z_mask_obs, (0, 2, 3, 1))
        kwargs["mask_rendered"] = jnp.transpose(z_mask_rend, (0, 2, 3, 1))
    else:
        z_mask_gt = None
    if ecfg.input_depth:
        z_d_obs, z_d_rend = zoom_depths(obs.depth_observed, depth_rendered, zf)
        kwargs["depth_observed"] = jnp.transpose(z_d_obs, (0, 2, 3, 1)) * (
            255.0 / ecfg.depth_factor_for_input
        )
        kwargs["depth_rendered"] = jnp.transpose(z_d_rend, (0, 2, 3, 1)) * (
            255.0 / ecfg.depth_factor_for_input
        )

    # The network consumes (img - mean) / 255 (get_convs: zoomed image / 255).
    x = assemble_input(
        jnp.transpose(z_img_obs, (0, 2, 3, 1)),
        jnp.transpose(z_img_rend, (0, 2, 3, 1)),
        **kwargs,
    )
    if getattr(model, "num_regressors", 1) > 1:
        out = model.apply(params, x, obs.class_index)
    else:
        out = model.apply(params, x)

    trans = zoom_trans(out["trans"], zf.as_array(), True, False)  # un-zoom (B, 3)
    pose_new = RT_transform(pose, out["rot"], trans, t_means, t_stds, ecfg.rot_coord)

    # Full-frame predicted mask for the next iteration's 'box_observed'
    # update: inverse-zoom the sigmoid mask and binarize, matching the test
    # symbol's ZoomMaskWithFactor(b_inv_zoom=True) output
    # (deepIM_flownet.py:350-358, zoom_mask_with_factor.py:35-64).
    mask_pred_full = None
    if "mask_logit" in out:
        mask_prob = jax.nn.sigmoid(jnp.transpose(out["mask_logit"], (0, 3, 1, 2)))
        mask_pred_full = jnp.round(
            zoom_mask(mask_prob, zf, binarize_input=True, inverse=True)
        )

    aux = {
        "net": out,
        "mask_pred_full": mask_pred_full,
        # CSR truncated-pair counter for THIS render (0 = exact).  Carried
        # so every jitted driver can observe truncation on backends without
        # debug-callback support (the tunneled TPU) — see rasterize().
        "raster_dropped": raster_dropped,
        "rot": out["rot"],
        "trans": trans,
        "zoom_trans": out["trans"],
        "zoom_factor": zf,
        "image_rendered": image_rendered,
        "depth_rendered": depth_rendered,
        "mask_rendered": mask_rendered,
        "zoom_mask_gt_observed": z_mask_gt,
        "zoom_image_observed": z_img_obs,
        "zoom_image_rendered": z_img_rend,
    }
    return pose_new, aux


def refine(
    params: Any,
    model: Any,
    obs: Observation,
    meshes: MeshBuffers,
    pose0: jax.Array,
    ecfg: EngineConfig,
    num_iters: int | None = None,
    with_stats: bool = False,
):
    """Iterative refinement: `lax.scan` of refine_step (test_iter=4 default,
    TEST.test_iter).  Returns (pose_final (B,3,4), poses (num_iters, B,3,4))
    — all intermediate poses, matching pred_eval's per-iteration error tables
    (tester.py:389-410).  With `with_stats`, also a stats dict
    {'raster_dropped': int32} (total CSR truncated pairs over all
    iterations; 0 = every render was exact)."""
    n = num_iters if num_iters is not None else ecfg.num_iters
    carry_mask = ecfg.update_mask == "box_observed"

    def step(carry, it):
        pose, mask_state = carry
        pose_new, aux = refine_step(
            params, model, obs, meshes, pose, ecfg,
            mask_observed_state=mask_state, iter_index=it,
        )
        if carry_mask and aux["mask_pred_full"] is not None:
            mask_state = aux["mask_pred_full"]
        return (pose_new, mask_state), (pose_new, aux["raster_dropped"])

    (pose_final, _), (poses, dropped) = jax.lax.scan(
        step, (pose0, obs.mask_observed), jnp.arange(n), length=n
    )
    if with_stats:
        return pose_final, poses, {"raster_dropped": jnp.sum(dropped)}
    return pose_final, poses
