"""Test driver: the deepim/test.py:57-176 (test_deepim) equivalent —
build the test model, restore a checkpoint, run batched sharded refinement
over every test class and evaluate."""
from __future__ import annotations

import os

import jax.numpy as jnp

from deepim_tpu.config import Config
from deepim_tpu.data.pairdb import load_gt_pairdb
from deepim_tpu.engine.checkpoint import load_checkpoint
from deepim_tpu.engine.tester import eval_flow_epe, eval_precomputed_poses, pred_eval
from deepim_tpu.engine.train import TrainState
from deepim_tpu.tools.train_net import build_mesh_bank, build_model
from deepim_tpu.utils.logger import create_logger, logger


def test_deepim(cfg: Config, output_dir: str | None = None, params=None, batch_size: int = 16) -> dict:
    if output_dir is None:
        output_dir = create_logger(
            cfg.output_path, cfg.TRAIN.model_prefix, cfg.dataset.test_image_set
        )
    model, init_params = build_model(cfg)
    if params is None:
        prefix = os.path.join(output_dir, cfg.TRAIN.model_prefix)
        state = TrainState(init_params, None, 0)
        try:
            state = load_checkpoint(prefix, cfg.TEST.test_epoch, state)
            params = state.params
            logger.info("loaded params for test epoch %d", cfg.TEST.test_epoch)
        except Exception as e:
            params = init_params
            logger.warning(
                "no checkpoint restored from %s epoch %d (%s); using init params",
                prefix, cfg.TEST.test_epoch, e,
            )

    bank_arrays = build_mesh_bank(cfg)
    dataset_name = cfg.dataset.dataset.split("+")[0]
    iset = cfg.dataset.test_image_set
    class_dbs = []
    for cls in cfg.dataset.class_name:
        db, pairdb = load_gt_pairdb(
            cfg, dataset_name, iset + cls if iset.endswith("_") else iset,
            cls, cfg.dataset.root_path, cfg.dataset.dataset_path,
        )
        class_dbs.append((db, pairdb))
    # Precomputed-pose evaluation shortcuts (tester.py:193-279): evaluate the
    # stored ICP-refined (or initial) poses instead of running the network.
    if cfg.TEST.PRECOMPUTED_ICP:
        return eval_precomputed_poses(cfg, class_dbs, icp=True)
    if cfg.TEST.BEFORE_ICP:
        return eval_precomputed_poses(cfg, class_dbs, icp=False)
    results = pred_eval(cfg, params, model, class_dbs, bank_arrays, output_dir, batch_size)
    if cfg.network.PRED_FLOW and not cfg.TEST.FAST_TEST:
        results["flow_epe"] = eval_flow_epe(cfg, params, model, class_dbs, bank_arrays, batch_size)
    return results
