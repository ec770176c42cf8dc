"""Host-side sample preprocessing: image/depth/mask loading, mask strategies,
VOC background substitution, model-point sampling.

Re-implements lib/utils/image.py (get_pair_image :58-163, get_gt_observed_depth
:166-187, get_pair_depth :190-227, get_pair_mask :230-399, point sampling
:452-485) and lib/utils/mask_dilate.py.  Differences from the reference:

* images are RGB (not BGR) — the whole new stack is RGB-consistent, with
  PIXEL_MEANS given in RGB order;
* rendered color images are NOT loaded: the engine re-renders on device from
  pose_rendered with the TPU rasterizer (the stored rendered images exist
  only for parity/debug);
* output layout is NCHW float32 numpy, one batch at a time.
"""
from __future__ import annotations

import os
import random

import cv2
import numpy as np

from deepim_tpu.config import Config


class DecodeCache:
    """In-memory cache of decoded+resized arrays, keyed by (kind, path, ...).

    The reference hides PNG-decode latency behind a multiprocessing pool
    (lib/utils/PrefetchingIter.py + loader.py:111-360); on hosts with few
    cores the decode itself is the epoch bottleneck (a TPU train step at
    256^2 is ~10x faster than decoding its batch on 2 cores).  Decoded
    records are immutable inputs — every augmentation downstream
    (VOC background, mask strategies, dilation) allocates fresh arrays — so
    caching the post-resize arrays across epochs is exact: epoch 2+ pays
    only augmentation + stacking.

    Entries are inserted until `budget_mb` is reached, then the cache stops
    growing (no eviction — epoch access order is a reshuffle, so LRU would
    thrash; a stable prefix keeps the hit rate proportional to capacity).
    Thread-safe under the GIL: worst case two workers decode the same record
    once each.
    """

    def __init__(self, budget_mb: int = 4096):
        self.data: dict = {}
        self.budget = budget_mb * (1 << 20)
        self.bytes = 0
        self.hits = 0
        self.misses = 0

    def get(self, key, fn):
        out = self.data.get(key)
        if out is not None:
            self.hits += 1
            return out
        self.misses += 1
        out = fn()
        if self.bytes + out.nbytes <= self.budget:
            # Cached entries are returned by reference (downstream consumers
            # copy before mutating); freeze them so an accidental in-place
            # edit raises instead of silently corrupting every later epoch.
            # Note self.bytes can double-count under the benign two-thread
            # same-key race (both decode, both insert) — an accounting
            # over-estimate only, never a correctness issue.
            out.flags.writeable = False
            self.data[key] = out
            self.bytes += out.nbytes
        return out


def _cached(cache: DecodeCache | None, key, fn):
    return fn() if cache is None else cache.get(key, fn)


def resize_to(im: np.ndarray, target_size: int, max_size: int) -> tuple[np.ndarray, float]:
    """Scale so the short side == target_size, capped by max_size on the long
    side (lib/utils/image.py:552-580)."""
    h, w = im.shape[:2]
    short, long_ = min(h, w), max(h, w)
    scale = float(target_size) / short
    if round(scale * long_) > max_size:
        scale = float(max_size) / long_
    if scale == 1.0:
        return im, 1.0
    out = cv2.resize(im, None, None, fx=scale, fy=scale, interpolation=cv2.INTER_LINEAR)
    return out, scale


def load_image_rgb(path: str) -> np.ndarray:
    im = cv2.imread(path, cv2.IMREAD_COLOR)
    assert im is not None, path
    return im[:, :, ::-1].astype(np.float32)  # BGR -> RGB


def load_depth(path: str, depth_factor: float) -> np.ndarray:
    d = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    assert d is not None, path
    return d.astype(np.float32) / depth_factor


def load_label_mask(path: str, mask_idx: int) -> np.ndarray:
    m = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    assert m is not None, path
    return (m == mask_idx).astype(np.float32)


def load_gt_observed_mask(pair_rec: dict, depth_factor: float) -> np.ndarray:
    """Unresized gt mask of the observed side: the label image when present,
    else the gt-observed depth > 0.2 (flipped pairs, where the 'observed'
    side is a stored render with no label file)."""
    if pair_rec.get("mask_gt_observed"):
        return load_label_mask(pair_rec["mask_gt_observed"], pair_rec["mask_idx"])
    d = load_depth(pair_rec["depth_gt_observed"], depth_factor)
    return (d > 0.2).astype(np.float32)


def min_rect(mask: np.ndarray) -> tuple[int, int, int, int]:
    """(x_start, y_start, x_end, y_end) of the nonzero region
    (lib/utils/get_min_rect.py:9-23)."""
    nz_y, nz_x = np.nonzero(mask)
    return int(nz_x.min()), int(nz_y.min()), int(nz_x.max()), int(nz_y.max())


def box_mask_from(mask: np.ndarray) -> np.ndarray:
    out = np.zeros_like(mask)
    if mask.any():
        x0, y0, x1, y1 = min_rect(mask)
        out[y0:y1, x0:x1] = 1.0  # [start, end) as in the reference
    return out


def mask_dilate_np(mask: np.ndarray, rng: random.Random, max_thickness: int = 10) -> np.ndarray:
    """Random directional dilation (lib/utils/mask_dilate.py:10-47)."""
    direction = rng.randrange(10)
    out = mask.copy()

    def expand(m, t, axis, sign):
        if axis == 0 and sign > 0:
            out[t:, :] = np.maximum(out[t:, :], m[:-t, :])
        elif axis == 0:
            out[:-t, :] = np.maximum(out[:-t, :], m[t:, :])
        elif sign > 0:
            out[:, t:] = np.maximum(out[:, t:], m[:, :-t])
        else:
            out[:, :-t] = np.maximum(out[:, :-t], m[:, t:])

    if direction not in (0, 1, 4):
        expand(mask, rng.randrange(max_thickness) + 1, 0, +1)
    if direction not in (1, 2, 5):
        expand(mask, rng.randrange(max_thickness) + 1, 0, -1)
    if direction not in (2, 3, 6):
        expand(mask, rng.randrange(max_thickness) + 1, 1, +1)
    if direction not in (0, 3, 7):
        expand(mask, rng.randrange(max_thickness) + 1, 1, -1)
    return np.clip(out, 0, 1)


class VOCBackgrounds:
    """VOC2012 background pool for synthetic observed images
    (lib/utils/image.py:97-155)."""

    def __init__(self, root_path: str):
        self.voc_root = os.path.join(root_path, "VOCdevkit/VOC2012")
        list_path = os.path.join(self.voc_root, "ImageSets/Main/diningtable_trainval.txt")
        self.bg_list: list[str] = []
        if os.path.exists(list_path):
            with open(list_path) as f:
                for line in f:
                    parts = line.strip().split()
                    if len(parts) == 2 and parts[1] == "1":
                        self.bg_list.append(parts[0])

    def replace_background(self, im_observed: np.ndarray, fg_mask: np.ndarray, rng: random.Random) -> np.ndarray:
        if not self.bg_list:
            return im_observed
        h, w = im_observed.shape[:2]
        idx = self.bg_list[rng.randrange(len(self.bg_list))]
        bg = cv2.imread(os.path.join(self.voc_root, f"JPEGImages/{idx}.jpg"), cv2.IMREAD_COLOR)
        if bg is None:
            return im_observed
        bg = bg[:, :, ::-1].astype(np.float32)
        ratio = h / w
        bh, bw = bg.shape[:2]
        # Crop bg to the observed aspect then resize (image.py:117-146).
        if bh >= bw * ratio:
            bg = bg[: int(np.ceil(bw * ratio)), :bw]
        else:
            bg = bg[:bh, : int(np.ceil(bh / ratio))]
        bg = cv2.resize(bg, (w, h), interpolation=cv2.INTER_LINEAR)
        out = bg.copy()
        fg = fg_mask > 0
        out[fg] = im_observed[fg]
        return out


def sample_model_points(points: np.ndarray, num_sample: int, rng: np.random.RandomState):
    """Random NUM_3D_SAMPLE point subset, zero-padded, with weights
    (lib/utils/image.py:452-478)."""
    n = points.shape[0]
    keep = min(n, num_sample)
    idx = rng.permutation(n)[:keep]
    out = np.zeros((num_sample, 3), np.float32)
    out[:keep] = points[idx]
    weights = np.zeros((num_sample,), np.float32)
    weights[:keep] = 1.0
    return out, weights


def make_train_sample(
    pair_rec: dict,
    cfg: Config,
    points: np.ndarray,
    rng: random.Random,
    nprng: np.random.RandomState,
    voc: VOCBackgrounds | None = None,
    cache: DecodeCache | None = None,
) -> dict[str, np.ndarray]:
    """Build one training sample (numpy, NCHW) from a pair record.

    Combines data_pair.get_data_pair_train_batch (lib/pair_matching/
    data_pair.py:135-248) with the image.py loaders; the rendered side and
    all labels that depend on it (flow, delta pose) are produced on-device by
    the training engine.  `cache` (optional DecodeCache) memoizes the pure
    decode+resize stage across epochs; all augmentation stays per-call.
    """
    target_size, max_size = cfg.SCALES[0]
    ts_ms = (target_size, max_size)
    im_obs = _cached(
        cache, ("img", pair_rec["image_observed"], ts_ms),
        lambda: resize_to(load_image_rgb(pair_rec["image_observed"]), *ts_ms)[0],
    )

    mask_gt = _cached(
        cache,
        ("maskgt_raw", pair_rec.get("mask_gt_observed") or pair_rec["depth_gt_observed"],
         pair_rec.get("mask_idx")),
        lambda: load_gt_observed_mask(pair_rec, cfg.dataset.DEPTH_FACTOR),
    )
    if pair_rec.get("data_syn", False) or (
        voc is not None and cfg.TRAIN.REPLACE_OBSERVED_BG_RATIO > 0
        and rng.random() < cfg.TRAIN.REPLACE_OBSERVED_BG_RATIO
    ):
        if voc is not None:
            im_obs = voc.replace_background(im_obs, mask_gt, rng)

    mask_gt_r = _cached(
        cache,
        ("maskgt", pair_rec.get("mask_gt_observed") or pair_rec["depth_gt_observed"],
         pair_rec.get("mask_idx"), ts_ms),
        lambda: (resize_to(mask_gt, *ts_ms)[0] >= 0.5).astype(np.float32),
    )

    # INIT_MASK strategy (image.py:263-292).
    if cfg.TRAIN.INIT_MASK == "mask_gt":
        mask_obs = mask_gt_r.copy()
    elif cfg.TRAIN.INIT_MASK == "box_gt":
        mask_obs = box_mask_from(mask_gt_r)
    elif cfg.TRAIN.INIT_MASK == "box_rendered":
        depth_rend = _cached(
            cache, ("depth", pair_rec["depth_rendered"], ts_ms),
            lambda: resize_to(
                load_depth(pair_rec["depth_rendered"], cfg.dataset.DEPTH_FACTOR), *ts_ms
            )[0],
        )
        mask_obs = box_mask_from((depth_rend > 0.2).astype(np.float32))
    else:
        raise ValueError(f"Unknown INIT_MASK {cfg.TRAIN.INIT_MASK}")
    if cfg.TRAIN.MASK_DILATE:
        mask_obs = mask_dilate_np(mask_obs, rng)

    depth_gt_obs = _cached(
        cache, ("depth", pair_rec["depth_gt_observed"], ts_ms),
        lambda: resize_to(
            load_depth(pair_rec["depth_gt_observed"], cfg.dataset.DEPTH_FACTOR), *ts_ms
        )[0],
    )

    sample = {
        "image_observed": im_obs.transpose(2, 0, 1),  # (3, H, W) raw RGB
        "mask_observed": mask_obs[None],
        "mask_gt_observed": mask_gt_r[None],
        "depth_gt_observed": depth_gt_obs,
        "pose_rendered": np.asarray(pair_rec["pose_rendered"], np.float32),
        "pose_observed": np.asarray(pair_rec["pose_observed"], np.float32),
        "class_index": np.int32(0),  # filled by the loader (class-name table)
    }
    if cfg.network.INPUT_DEPTH:
        d_obs = _cached(
            cache, ("depth", pair_rec["depth_observed"], ts_ms),
            lambda: resize_to(
                load_depth(pair_rec["depth_observed"], cfg.dataset.DEPTH_FACTOR), *ts_ms
            )[0],
        )
        sample["depth_observed"] = d_obs[None]
    if cfg.train_iter.SE3_PM_LOSS:
        pts, w = sample_model_points(points, cfg.train_iter.NUM_3D_SAMPLE, nprng)
        sample["points_model"] = pts
        sample["points_weights"] = w
    return sample


def make_test_sample(
    pair_rec: dict, cfg: Config, rng: random.Random | None = None,
    cache: DecodeCache | None = None,
) -> dict[str, np.ndarray]:
    """Build one test sample.  The observed mask follows TEST.INIT_MASK
    (image.py:297-378).  For the 'box_rendered' default without MASK_DILATE
    the engine reproduces the box on-device from its own render of
    pose_rendered (identical to the stored rendered depth's box), so a
    placeholder is emitted; with TEST.MASK_DILATE (image.py:380-381) the mask
    must be built and dilated on host, and the engine keeps it for the first
    iteration (EngineConfig.init_mask_host)."""
    target_size, max_size = cfg.SCALES[0]
    ts_ms = (target_size, max_size)
    im_obs = _cached(
        cache, ("img", pair_rec["image_observed"], ts_ms),
        lambda: resize_to(load_image_rgb(pair_rec["image_observed"]), *ts_ms)[0],
    )
    h, w = im_obs.shape[:2]

    init = cfg.TEST.INIT_MASK
    host_mask = True
    if init in ("mask_gt_observed", "box_gt_observed"):
        m = load_gt_observed_mask(pair_rec, cfg.dataset.DEPTH_FACTOR)
        m, _ = resize_to(m, target_size, max_size)
        m = (m >= 0.5).astype(np.float32)
        mask_obs = box_mask_from(m) if init.startswith("box") else m
    elif init in ("mask_observed", "box_"):
        # PoseCNN-predicted observed mask (image.py:314-356).
        m = load_label_mask(pair_rec["mask_observed"], pair_rec["mask_idx"])
        m, _ = resize_to(m, target_size, max_size)
        m = (m >= 0.5).astype(np.float32)
        mask_obs = box_mask_from(m) if init.startswith("box") else m
    elif init in ("box_rendered", "init"):
        if cfg.TEST.MASK_DILATE and "depth_rendered" in pair_rec:
            # Dilation needs the real box: build it from the stored rendered
            # depth like the reference (image.py:357-375).
            depth_rend = load_depth(pair_rec["depth_rendered"], cfg.dataset.DEPTH_FACTOR)
            depth_rend, _ = resize_to(depth_rend, target_size, max_size)
            mask_obs = box_mask_from((depth_rend > 0.2).astype(np.float32))
        else:
            # Engine recomputes from the on-device render; placeholder here.
            mask_obs = np.ones((h, w), np.float32)
            host_mask = False
    else:
        raise ValueError(f"Unsupported TEST.INIT_MASK {init}")
    if cfg.TEST.MASK_DILATE and host_mask:
        mask_obs = mask_dilate_np(mask_obs, rng if rng is not None else random.Random(0))

    sample = {
        "image_observed": im_obs.transpose(2, 0, 1),
        "mask_observed": mask_obs[None],
        "pose_rendered": np.asarray(pair_rec["pose_rendered"], np.float32),
        "pose_observed": np.asarray(pair_rec["pose_observed"], np.float32),
        "class_index": np.int32(0),
    }
    if cfg.network.INPUT_DEPTH:
        d_obs = load_depth(pair_rec["depth_observed"], cfg.dataset.DEPTH_FACTOR)
        d_obs, _ = resize_to(d_obs, target_size, max_size)
        sample["depth_observed"] = d_obs[None]
    return sample
