"""TrainLoader determinism under threads + multi-host sharding.

The reference's multiprocessing loader (deepim/core/loader.py:184-354) gives
no reproducibility guarantee at all; our loader must be bit-deterministic:
every draw is keyed by (seed, epoch, global_slot), so thread scheduling and
process sharding cannot change results.  These tests run the full
augmentation surface (MASK_DILATE + VOC background substitution + model
point sampling) and assert that two processes of a 2-host run see the same
global batch composition for >= 2 epochs, with each process's local slice
bit-identical to the corresponding slice of a single-process run.
"""
import os

import cv2
import numpy as np
import pytest

from deepim_tpu.config import Config, replace, update_config_dict
from deepim_tpu.data.loader import TrainLoader
from deepim_tpu.data.pairdb import PairDB
from deepim_tpu.render.mesh import make_icosphere, make_test_cube
from deepim_tpu.tools.synth_data import generate_dataset

H = W = 64
K_MAT = np.array([[80.0, 0.0, 32.0], [0.0, 80.0, 32.0], [0.0, 0.0, 1.0]], np.float32)


@pytest.fixture(scope="module")
def devkit(tmp_path_factory):
    from deepim_tpu.render.rasterizer import RasterConfig

    path = str(tmp_path_factory.mktemp("LM6d_loader_rng"))
    meshes = {"cube": make_test_cube(0.08), "sphere": make_icosphere(0.05, 1)}
    generate_dataset(
        path, meshes, K_MAT, n_train=8, n_val=2, height=H, width=W,
        z_range=(0.45, 0.6),
        raster_cfg=RasterConfig(
            height=H, width=W, tile_h=16, tile_w=16,
            max_faces_per_tile=128, chunk=16, znear=0.05, zfar=10.0,
        ),
    )
    # Fake VOC2012 background pool (image.py:97-155 layout) so the
    # substitution path draws from the rng.
    voc = os.path.join(path, "VOCdevkit", "VOC2012")
    os.makedirs(os.path.join(voc, "ImageSets", "Main"), exist_ok=True)
    os.makedirs(os.path.join(voc, "JPEGImages"), exist_ok=True)
    rng = np.random.RandomState(7)
    with open(os.path.join(voc, "ImageSets", "Main", "diningtable_trainval.txt"), "w") as f:
        for i in range(3):
            name = f"bg{i:06d}"
            img = rng.randint(0, 255, (80, 100, 3), np.uint8)
            cv2.imwrite(os.path.join(voc, "JPEGImages", f"{name}.jpg"), img)
            f.write(f"{name}  1\n")
    return path


def make_cfg(devkit_path) -> Config:
    return update_config_dict(
        Config(),
        {
            "SCALES": [H, W],
            "dataset": {
                "dataset": "LM6D_REFINE",
                "dataset_path": devkit_path,
                "root_path": devkit_path,
                "image_set": "train_",
                "test_image_set": "val_",
                "model_dir": os.path.join(devkit_path, "models"),
                "class_name": ["cube", "sphere"],
                "INTRINSIC_MATRIX": K_MAT.flatten().tolist(),
                "ZNEAR": 0.05,
                "ZFAR": 10.0,
            },
            "network": {"INPUT_MASK": True, "TRAIN_ITER": True, "TRAIN_ITER_SIZE": 2},
            "train_iter": {"SE3_PM_LOSS": True, "LW_PM": 0.1, "NUM_3D_SAMPLE": 16},
            "TRAIN": {
                "BATCH_PAIRS": 1,
                "INIT_MASK": "box_gt",
                "UPDATE_MASK": "box_gt",
                "MASK_DILATE": True,
                "REPLACE_OBSERVED_BG_RATIO": 0.5,
            },
        },
    )


def _load_pairdb(devkit_path, cfg):
    merged, pts = [], {}
    for cls in cfg.dataset.class_name:
        db = PairDB(
            name="LM6D_REFINE", devkit_path=devkit_path,
            image_set=f"train_{cls}", cur_class=cls,
        )
        merged.extend(db.gt_pairdb())
        pts[cls] = db.points(cls)
    return merged, pts


def _epoch_arrays(loader, epoch):
    batches = list(loader.epoch(epoch))
    return [
        {k: np.asarray(v) for k, v in b._asdict().items() if v is not None}
        for b in batches
    ]


def test_two_process_global_batches_match_single_process(devkit):
    """Each process's local slice must equal the corresponding slice of the
    single-process global batch, bit-for-bit, for 2 epochs — the invariant
    the dp training loop relies on (every process shuffles identically and
    assembles only its contiguous slice)."""
    cfg = make_cfg(devkit)
    pairdb, pts = _load_pairdb(devkit, cfg)
    glob = TrainLoader(pairdb, cfg, pts, batch_size=4, seed=3, process_index=0, process_count=1)
    p0 = TrainLoader(pairdb, cfg, pts, batch_size=4, seed=3, process_index=0, process_count=2)
    p1 = TrainLoader(pairdb, cfg, pts, batch_size=4, seed=3, process_index=1, process_count=2)
    assert p0.local_batch_size == 2

    for epoch in range(2):
        g = _epoch_arrays(glob, epoch)
        a = _epoch_arrays(p0, epoch)
        b = _epoch_arrays(p1, epoch)
        assert len(g) == len(a) == len(b) == 4
        for gb, ab, bb in zip(g, a, b):
            for key in gb:
                if key == "k":
                    continue
                np.testing.assert_array_equal(gb[key][:2], ab[key], err_msg=f"{key} (proc 0)")
                np.testing.assert_array_equal(gb[key][2:], bb[key], err_msg=f"{key} (proc 1)")


def test_epochs_reproducible_and_distinct(devkit):
    """Same (seed, epoch) -> identical batches across fresh loader instances;
    different epochs -> different shuffle/augmentations."""
    cfg = make_cfg(devkit)
    pairdb, pts = _load_pairdb(devkit, cfg)
    l1 = TrainLoader(pairdb, cfg, pts, batch_size=4, seed=5, process_index=0, process_count=1)
    l2 = TrainLoader(pairdb, cfg, pts, batch_size=4, seed=5, process_index=0, process_count=1)
    e0_a = _epoch_arrays(l1, 0)
    e0_b = _epoch_arrays(l2, 0)
    e1 = _epoch_arrays(l2, 1)
    for ba, bb in zip(e0_a, e0_b):
        for key in ba:
            np.testing.assert_array_equal(ba[key], bb[key], err_msg=key)
    # Epoch 1 differs from epoch 0 (shuffle order and/or augmentation draws).
    diff = any(
        not np.array_equal(ba["pose_observed"], bb["pose_observed"])
        or not np.array_equal(ba["mask_observed"], bb["mask_observed"])
        for ba, bb in zip(e0_a, e1)
    )
    assert diff


def test_thread_pool_size_does_not_change_results(devkit):
    """Per-sample seeding means the number of worker threads (and hence
    scheduling order) cannot affect the output."""
    cfg = make_cfg(devkit)
    pairdb, pts = _load_pairdb(devkit, cfg)
    l1 = TrainLoader(pairdb, cfg, pts, batch_size=4, seed=9, num_workers=1)
    l4 = TrainLoader(pairdb, cfg, pts, batch_size=4, seed=9, num_workers=4)
    for ba, bb in zip(_epoch_arrays(l1, 0), _epoch_arrays(l4, 0)):
        for key in ba:
            np.testing.assert_array_equal(ba[key], bb[key], err_msg=key)


def test_augmentations_actually_draw(devkit):
    """Sanity: VOC substitution and dilation actually fire in this config
    (guards against the test passing because augmentation is dead)."""
    cfg = make_cfg(devkit)
    pairdb, pts = _load_pairdb(devkit, cfg)
    loader = TrainLoader(pairdb, cfg, pts, batch_size=4, seed=11)
    assert loader.voc.bg_list, "VOC fixture not found"
    batches = _epoch_arrays(loader, 0)
    # Dilation: observed box mask strictly larger than the gt box for some sample.
    grew = any(
        (b["mask_observed"].sum(axis=(1, 2, 3)) > b["mask_gt_observed"].sum(axis=(1, 2, 3))).any()
        for b in batches
    )
    assert grew
    # VOC: with ratio 0.5 over 8 samples, at least one background replaced ->
    # nonzero pixels outside the gt mask.
    bg_nonzero = any(
        (
            (b["image_observed"].sum(axis=1) * (1 - b["mask_gt_observed"][:, 0])).sum(axis=(1, 2))
            > 1.0
        ).any()
        for b in batches
    )
    assert bg_nonzero


def test_decode_cache_bit_exact(devkit):
    """The DecodeCache memoizes only the pure decode+resize stage, so cached
    and uncached loaders must produce bit-identical batches — including on
    the second epoch, where every decode is a cache hit."""
    cfg = make_cfg(devkit)
    pairdb, pts = _load_pairdb(devkit, cfg)
    cold = TrainLoader(pairdb, cfg, pts, batch_size=4, seed=13, decode_cache_mb=0)
    warm = TrainLoader(pairdb, cfg, pts, batch_size=4, seed=13, decode_cache_mb=256)
    assert cold.cache is None and warm.cache is not None
    for epoch in range(2):
        for ba, bb in zip(_epoch_arrays(cold, epoch), _epoch_arrays(warm, epoch)):
            for key in ba:
                np.testing.assert_array_equal(ba[key], bb[key], err_msg=key)
    assert warm.cache.hits > 0  # epoch 2 actually exercised cached entries
