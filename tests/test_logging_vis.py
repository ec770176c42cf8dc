"""TensorBoard logger and batch-visualizer tests (reference: mxboard logging
module.py:1096-1158 and the visualizer metrics metric.py:140-486)."""
import os

import numpy as np


def test_tb_logger_writes_events(tmp_path):
    from deepim_tpu.utils.tb import TBLogger

    tb = TBLogger(str(tmp_path / "tb"), enabled=True)
    if not tb.enabled:  # tensorboard not installed in this env: no-op path
        tb.scalars({"loss": 1.0}, 0)
        tb.close()
        return
    tb.scalars({"total": 0.5, "pm_loss": 0.1}, step=1)
    tb.weight_norms({"dense": {"kernel": np.ones((4, 4))}}, step=1)
    tb.flush()
    tb.close()
    files = os.listdir(tmp_path / "tb")
    assert any("tfevents" in f for f in files)


def test_tb_logger_disabled_is_noop(tmp_path):
    from deepim_tpu.utils.tb import TBLogger

    tb = TBLogger(str(tmp_path / "tb2"), enabled=False)
    assert not tb.enabled
    tb.scalars({"x": 1.0}, 0)
    tb.weight_norms({}, 0)
    tb.close()
    assert not os.path.exists(tmp_path / "tb2") or not os.listdir(tmp_path / "tb2")


def test_visualizers_write_grids(tmp_path, rng):
    import cv2

    from deepim_tpu.utils.visualize import (
        visualize_masks,
        visualize_minibatch,
        visualize_pair_grid,
    )

    b, h, w = 3, 32, 40
    obs = rng.rand(b, 3, h, w).astype(np.float32) * 255
    rend = rng.rand(b, 3, h, w).astype(np.float32) * 255
    p1 = str(tmp_path / "pairs.png")
    visualize_pair_grid(p1, obs, rend, max_samples=2)
    img = cv2.imread(p1)
    assert img.shape == (2 * h, 3 * w, 3)  # 2 samples x [obs|rend|diff]

    masks = (rng.rand(b, 1, h, w) > 0.5).astype(np.float32)
    p2 = str(tmp_path / "masks.png")
    visualize_masks(p2, masks, masks, masks, max_samples=3)
    assert cv2.imread(p2).shape == (3 * h, 3 * w, 3)

    flow = rng.randn(b, 2, h, w).astype(np.float32) * 5
    p3 = str(tmp_path / "mb.png")
    visualize_minibatch(p3, {"obs": obs, "rend": rend}, flow=flow, max_samples=2)
    assert cv2.imread(p3).shape == (2 * h, 3 * w, 3)
