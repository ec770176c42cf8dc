"""Checkpoint save/load/resume via Orbax.

Replaces the reference's per-epoch MXNet checkpointing: save_checkpoint
writes prefix-symbol.json + prefix-%04d.params + .states
(deepim/core/module.py:120-188) with resume via TRAIN.RESUME + load_param
(deepim/train.py:177-179) and optimizer-state preload
(module.py:571-573,961-970).  Here one Orbax checkpoint per epoch holds
{params, opt_state, step}; legacy param-name migration (the reference's
_i2r/_test renames, module.py:150-158) is supported via a rename map.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from deepim_tpu.engine.train import TrainState


def checkpoint_dir(prefix: str) -> str:
    return os.path.abspath(prefix + "_ckpt")


def save_checkpoint(prefix: str, epoch: int, state: TrainState) -> str:
    """Write checkpoint for `epoch` under <prefix>_ckpt/<epoch>, replacing
    any previous checkpoint for the same epoch (the reference's per-epoch
    module_checkpoint overwrites on re-run, deepim/train.py:242)."""
    path = os.path.join(checkpoint_dir(prefix), str(epoch))
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(
        path,
        {"params": state.params, "opt_state": state.opt_state, "step": np.asarray(state.step)},
        force=True,
    )
    return path


def load_checkpoint(prefix: str, epoch: int, state_like: TrainState, rename_map: dict[str, str] | None = None) -> TrainState:
    """Restore the checkpoint saved for `epoch`.

    rename_map applies substring renames to parameter path names (legacy
    checkpoint migration, module.py:150-158)."""
    path = os.path.join(checkpoint_dir(prefix), str(epoch))
    ckptr = ocp.PyTreeCheckpointer()
    if state_like.opt_state is None:
        # Inference-only restore (Predictor path, tester/gen_video): no
        # optimizer-state template — take the checkpoint's own structure.
        restored = ckptr.restore(path)
    else:
        target = {
            "params": state_like.params,
            "opt_state": state_like.opt_state,
            "step": np.asarray(state_like.step),
        }
        try:
            restored = ckptr.restore(path, item=target)
        except Exception as e:
            # The opt_state pytree STRUCTURE depends on TRAIN.skip_nonfinite
            # (optax.apply_if_finite wraps the inner state), so a checkpoint
            # saved with the flag on cannot restore into a template built
            # with it off (and vice versa).  Surface the likely cause
            # instead of orbax's raw structure-mismatch traceback — this
            # bites the chunked-resume workflow first.
            raise RuntimeError(
                f"checkpoint restore failed for {path} with an optimizer-state "
                "template mismatch; if the run config changed since the "
                "checkpoint was saved, check TRAIN.skip_nonfinite (it wraps "
                "opt_state in apply_if_finite and changes its structure) and "
                "TRAIN.optimizer/grad_clip"
            ) from e
    params = restored["params"]
    if rename_map:
        flat = jax.tree_util.tree_flatten_with_path(params)
        # Renames operate on checkpoints saved under old layer names; apply
        # by rebuilding the dict keys.
        params = _rename_tree(params, rename_map)
    return TrainState(params=params, opt_state=restored["opt_state"], step=restored["step"])


def _rename_tree(tree: Any, rename_map: dict[str, str]) -> Any:
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            nk = k
            for old, new in rename_map.items():
                nk = nk.replace(old, new)
            out[nk] = _rename_tree(v, rename_map)
        return out
    return tree


def merge_matching_params(fresh: Any, loaded: Any) -> tuple[Any, list[str]]:
    """Copy every leaf of `loaded` whose path AND shape match into `fresh`;
    leaves missing or shape-mismatched keep the fresh init.

    Cross-resolution transfer: the FlowNetS trunk, decoder and heads are
    resolution-independent, but fc6 consumes the flattened conv6 feature
    (deepIM_flownet.py:110-117), whose size scales with the frame — so a
    256^2-trained checkpoint seeds a 480x640 model everywhere except fc6
    (which relearns quickly next to pretrained features; this mirrors the
    reference's fine-tune-from-pretrained-FlowNet regime,
    deepim/train.py:165-195).  Returns (merged, skipped_path_list)."""
    import jax.numpy as jnp

    flat_loaded = {
        jax.tree_util.keystr(p): leaf
        for p, leaf in jax.tree_util.tree_leaves_with_path(loaded)
    }
    skipped: list[str] = []

    def pick(path, leaf):
        key = jax.tree_util.keystr(path)
        src = flat_loaded.get(key)
        if src is not None and tuple(np.shape(src)) == tuple(np.shape(leaf)):
            return jnp.asarray(src, leaf.dtype) if hasattr(leaf, "dtype") else src
        skipped.append(key)
        return leaf

    merged = jax.tree_util.tree_map_with_path(pick, fresh)
    return merged, skipped


def latest_epoch(prefix: str) -> int | None:
    d = checkpoint_dir(prefix)
    if not os.path.isdir(d):
        return None
    epochs = [int(x) for x in os.listdir(d) if x.isdigit()]
    return max(epochs) if epochs else None
