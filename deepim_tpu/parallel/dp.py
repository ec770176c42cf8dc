"""Data-parallel jit wrappers for the train step and batched inference.

`pjit`-style sharded compilation: the train step built by
engine.train.make_train_step is jitted with the batch sharded over 'dp' and
state/mesh-bank replicated.  XLA inserts the gradient all-reduce over ICI
(the kvstore replacement, SURVEY.md §2.9).
"""
from __future__ import annotations

from functools import partial
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deepim_tpu.parallel.mesh import batch_specs_like, replicated_specs_like


def jit_train_step_dp(train_step, mesh: Mesh, state_example: Any, batch_example: Any, bank_example: Any):
    """Compile the train step with dp shardings.

    state: replicated; batch: leading dim over 'dp'; mesh bank: replicated.
    Returns the compiled function; call with device arrays placed accordingly
    (parallel.mesh.shard_pytree_batch / replicate_pytree).
    """
    state_s = jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), replicated_specs_like(state_example))
    batch_s = jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), batch_specs_like(batch_example, mesh))
    bank_s = jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), replicated_specs_like(bank_example))
    metrics_s = NamedSharding(mesh, P())
    pose_s = NamedSharding(mesh, P("dp"))
    return jax.jit(
        train_step,
        in_shardings=(state_s, batch_s, bank_s),
        out_shardings=(state_s, metrics_s, pose_s),
    )


def jit_refine_dp(refine_fn, mesh: Mesh, params_example: Any, obs_example: Any, meshes_example: Any):
    """Compile batched iterative refinement with the batch sharded over 'dp'
    (replaces pred_eval's batch-1-per-GPU loop, tester.py:83-85).

    refine_fn(params, obs, meshes, pose0) -> (pose_final, poses); obs/meshes
    leaves with a leading batch dim are dp-sharded, the rest replicated.
    """
    dp = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())
    params_s = jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), replicated_specs_like(params_example))
    obs_s = jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), batch_specs_like(obs_example, mesh))
    meshes_s = jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), batch_specs_like(meshes_example, mesh))
    return jax.jit(
        refine_fn,
        in_shardings=(params_s, obs_s, meshes_s, dp),
        out_shardings=(dp, NamedSharding(mesh, P(None, "dp"))),
    )
