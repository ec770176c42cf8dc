"""Training driver: the deepim/train.py:52-344 (train_net) equivalent.

Loads pair databases for every dataset x image-set x class combination,
builds the class-indexed mesh bank, compiles the dp-sharded train step over
a device mesh and runs the epoch loop with per-epoch checkpointing and
throughput logging.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from deepim_tpu.config import Config
from deepim_tpu.data.loader import TrainLoader
from deepim_tpu.data.pairdb import load_gt_pairdb, merge_pairdb
from deepim_tpu.engine.checkpoint import save_checkpoint, load_checkpoint
from deepim_tpu.engine.lr_schedule import lr_steps_from_config, warmup_multifactor_schedule
from deepim_tpu.engine.refine import EngineConfig
from deepim_tpu.engine.train import TrainState, make_optimizer, make_train_step
from deepim_tpu.models import FlowNetDeepIM
from deepim_tpu.parallel import jit_train_step_dp, make_mesh, replicate_pytree, shard_pytree_batch
from deepim_tpu.render.mesh import MeshBank, load_textured_mesh
from deepim_tpu.utils.logger import create_logger, logger
from deepim_tpu.utils.speedometer import Speedometer
from deepim_tpu.utils.tb import TBLogger


def load_pairdbs(cfg: Config):
    """Per (dataset x image_set x class) pairdbs, merged
    (deepim/train.py:89-102)."""
    datasets = cfg.dataset.dataset.split("+")
    image_sets = cfg.dataset.image_set.split("+")
    dbs, merged = [], []
    for ds_name, iset in zip(datasets, image_sets):
        for cls in cfg.dataset.class_name:
            db, pairdb = load_gt_pairdb(
                cfg, ds_name, iset + cls if iset.endswith("_") else iset,
                cls, cfg.dataset.root_path, cfg.dataset.dataset_path,
            )
            dbs.append(db)
            merged.append(pairdb)
    return dbs, merge_pairdb(merged)


def build_mesh_bank(cfg: Config):
    keep_tex = cfg.dataset.TEXTURE_SAMPLING
    meshes = [
        load_textured_mesh(os.path.join(cfg.dataset.model_dir, cls), keep_texture=keep_tex)
        for cls in cfg.dataset.class_name
    ]
    bank = MeshBank.from_meshes(meshes, keep_textures=keep_tex)
    if keep_tex:
        return {
            "vertices": jnp.asarray(bank.vertices), "colors": jnp.asarray(bank.colors),
            "faces": jnp.asarray(bank.faces), "face_valid": jnp.asarray(bank.face_valid),
            "uv": jnp.asarray(bank.uv), "textures": jnp.asarray(bank.textures),
        }
    return (
        jnp.asarray(bank.vertices), jnp.asarray(bank.colors),
        jnp.asarray(bank.faces), jnp.asarray(bank.face_valid),
    )


def build_model(cfg: Config, dtype=jnp.bfloat16):
    model = FlowNetDeepIM(
        pred_flow=cfg.network.PRED_FLOW, pred_mask=cfg.network.PRED_MASK,
        num_regressors=cfg.network.REGRESSOR_NUM,
        rot_dim=3 if cfg.network.ROT_TYPE == "EULER" else 4, dtype=dtype,
    )
    channels = 6 + (2 if cfg.network.INPUT_DEPTH else 0) + (2 if cfg.network.INPUT_MASK else 0)
    x = jnp.zeros((1, cfg.height, cfg.width, channels))
    if cfg.network.REGRESSOR_NUM > 1:
        params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32))
    else:
        params = model.init(jax.random.PRNGKey(0), x)
    return model, params


def init_pretrained(cfg: Config, params):
    """Initialize params from `network.pretrained` (deepim/train.py:165-195:
    the reference always fine-tunes from a pretrained FlowNet).  Accepts
    either an imported ``.npz`` tree (tools/convert_mxnet_checkpoint) or a
    raw MXNet ``.params`` file (imported on the fly); layers absent from the
    checkpoint — fc/rot/trans/mask heads of a vanilla FlowNet — keep the
    reference init scheme already applied at model.init
    (deepIM_flownet.py:753-845)."""
    path = cfg.network.pretrained
    if not path.endswith((".npz", ".params")) and cfg.network.pretrained_epoch:
        # reference prefix convention: <prefix>-%04d.params (load_model.py:10)
        path = f"{path}-{cfg.network.pretrained_epoch:04d}.params"
    if path.endswith(".npz"):
        from deepim_tpu.tools.convert_mxnet_checkpoint import load_npz_params

        loaded = load_npz_params(path)
        by_key = {
            jax.tree_util.keystr(p): leaf
            for p, leaf in jax.tree_util.tree_leaves_with_path(loaded)
        }

        def pick(p, leaf):
            key = jax.tree_util.keystr(p)
            if key not in by_key:
                raise KeyError(f"pretrained npz {path} is missing {key}")
            if by_key[key].shape != leaf.shape:
                raise ValueError(
                    f"{key}: npz shape {by_key[key].shape} != model {leaf.shape}"
                )
            return jnp.asarray(by_key[key])

        return jax.tree_util.tree_map_with_path(pick, params)
    from deepim_tpu.models.import_mxnet import flax_from_mxnet
    from deepim_tpu.utils.mxnet_io import load_mxnet_params

    mx_params = load_mxnet_params(path)
    # network.init_from_flownet (deepIM_flownet.py:781-805): the checkpoint is
    # a vanilla FlowNet — the fc/rot/trans/mask heads are absent and keep the
    # reference init scheme already applied at model.init.  Without the flag
    # the checkpoint is a full DeepIM model and every layer must be present.
    return flax_from_mxnet(
        mx_params, params, input_hw=(cfg.height, cfg.width),
        strict=not cfg.network.init_from_flownet,
    )


def train_net(
    cfg: Config,
    output_dir: str | None = None,
    n_devices: int | None = None,
    init_params=None,
) -> TrainState:
    """`init_params` (optional): use these parameters instead of the fresh
    init / network.pretrained import — e.g. a cross-resolution seed built
    with engine.checkpoint.merge_matching_params.  Ignored when resuming."""
    if output_dir is None:
        output_dir = create_logger(cfg.output_path, cfg.TRAIN.model_prefix, cfg.dataset.image_set)
    dbs, pairdb = load_pairdbs(cfg)
    logger.info("num pairs: %d", len(pairdb))
    points_by_class = {cls: dbs[0].points(cls) for cls in cfg.dataset.class_name}
    bank_arrays = build_mesh_bank(cfg)

    mesh = make_mesh(n_devices)
    batch_size = cfg.TRAIN.BATCH_PAIRS * mesh.size
    loader = TrainLoader(pairdb, cfg, points_by_class, batch_size)
    epoch_size = loader.epoch_size

    model, params = build_model(cfg)
    if init_params is not None:
        params = init_params
        logger.info("initialized from caller-provided params")
    elif cfg.network.pretrained and not cfg.network.skip_initialize:
        params = init_pretrained(cfg, params)
        logger.info("initialized from pretrained %s", cfg.network.pretrained)
    schedule = warmup_multifactor_schedule(
        cfg.TRAIN.lr,
        lr_steps_from_config(cfg.TRAIN.lr_step, epoch_size * cfg.network.TRAIN_ITER_SIZE, cfg.TRAIN.begin_epoch),
        warmup=cfg.TRAIN.warmup,
        warmup_lr=cfg.TRAIN.warmup_lr,
        warmup_step=cfg.TRAIN.warmup_step,
    )
    tx = make_optimizer(cfg, schedule)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))

    begin_epoch = cfg.TRAIN.begin_epoch
    prefix = os.path.join(output_dir, cfg.TRAIN.model_prefix)
    if cfg.TRAIN.RESUME and begin_epoch > 0:
        state = load_checkpoint(prefix, begin_epoch, state)
        logger.info("resumed from epoch %d (step %d)", begin_epoch, int(state.step))

    ecfg = EngineConfig.from_config(cfg, train=True, bank_arrays=bank_arrays)
    step_fn = make_train_step(model, tx, ecfg, cfg.train_iter, cfg.TRAIN.FLOW_WEIGHT_TYPE)

    state_d = replicate_pytree(state, mesh)
    bank_d = replicate_pytree(bank_arrays, mesh)
    pstep = None
    speedo = Speedometer(batch_size, frequent=20)
    # Dispatch backpressure: jax dispatch is async and the host loop (with
    # the decode cache) can produce batches ~40x faster than a device step
    # completes, so without a bound the in-flight queue pins every
    # transferred batch on the host until the OOM killer fires (observed:
    # 130 GB anon RSS at ~30 MB/s leak rate).  Keep at most 3 steps in
    # flight by blocking on the metrics of the step from 3 batches ago —
    # usually already complete, so the block costs one tunnel round trip,
    # not a pipeline stall.
    from collections import deque

    inflight: deque = deque()
    # TensorBoard scalars (module.py:1096-1158 when TENSORBOARD_LOG).
    tb = TBLogger(os.path.join(output_dir, "tb"), enabled=cfg.TRAIN.TENSORBOARD_LOG)

    for epoch in range(begin_epoch, cfg.TRAIN.end_epoch):
        for nbatch, batch in enumerate(loader.epoch(epoch)):
            batch_d = shard_pytree_batch(batch, mesh)
            if pstep is None:
                pstep = jit_train_step_dp(step_fn, mesh, state_d, batch_d, bank_d)
            state_d, metrics, _ = pstep(state_d, batch_d, bank_d)
            inflight.append(metrics["total"])
            if len(inflight) > 3:
                jax.block_until_ready(inflight.popleft())
            # Per-inner-iteration losses (the reference logs every iteration,
            # module.py:1096-1158; they are the main refinement diagnostic).
            # Fetched every `frequent` steps (and on the epoch's last step)
            # with ONE batched device_get: a per-array, per-step fetch costs
            # a full host<->device round-trip each — on tunneled backends
            # that is ~0.5-1 s per step, dwarfing the step itself — and any
            # fetch blocks dispatch pipelining against the host loader.
            host_metrics = None
            if nbatch % speedo.frequent == 0 or nbatch == epoch_size - 1 or tb.enabled:
                metrics_np = jax.device_get(metrics)
                host_metrics = {}
                for k, vals in metrics_np.items():
                    for it in range(vals.shape[0]):
                        host_metrics[f"{k}/iter{it}"] = float(vals[it])
                    host_metrics[k] = float(vals[-1])
            if host_metrics is not None and host_metrics.get("raster_dropped", 0) > 0:
                # The render had holes this step: the CSR binning budget is
                # too small for this mesh/pose (tune_raster_for_bank was
                # bypassed or overridden).  Loud, works on every backend.
                logger.warning(
                    "rasterizer dropped %d face-tile pairs at epoch %d batch %d "
                    "- renders have holes; raise RasterConfig.bin_pairs",
                    int(sum(v for k, v in host_metrics.items()
                            if k.startswith("raster_dropped/"))), epoch, nbatch,
                )
            speedo(epoch, nbatch, host_metrics)
            if tb.enabled:
                step = int(np.asarray(state_d.step))
                host_metrics["lr"] = float(schedule(step))
                tb.scalars(host_metrics, step)
            if cfg.TRAIN.VISUALIZE and nbatch % 100 == 0:
                _dump_batch_vis(batch, os.path.join(output_dir, "vis"), f"e{epoch}_b{nbatch}")
        if tb.enabled:
            tb.weight_norms(jax.device_get(state_d.params), epoch + 1)
            tb.flush()
        if (epoch + 1) % cfg.TRAIN.CHECKPOINT_INTERVAL == 0 or epoch + 1 == cfg.TRAIN.end_epoch:
            save_checkpoint(prefix, epoch + 1, jax.device_get(state_d))
            logger.info("saved checkpoint epoch %d", epoch + 1)
    tb.close()
    return jax.device_get(state_d)


def _dump_batch_vis(batch, vis_dir: str, tag: str) -> None:
    """TRAIN.VISUALIZE: dump the current batch as PNG grids (headless
    analog of the reference's SimpleVisualize/MaskVisualize metrics,
    deepim/core/metric.py:140-486)."""
    from deepim_tpu.utils.visualize import visualize_masks, visualize_pair_grid

    obs = np.asarray(batch.image_observed)
    visualize_pair_grid(os.path.join(vis_dir, f"{tag}_pairs.png"), obs, obs * 0)
    visualize_masks(
        os.path.join(vis_dir, f"{tag}_masks.png"),
        np.asarray(batch.mask_observed),
        np.asarray(batch.mask_gt_observed),
    )
