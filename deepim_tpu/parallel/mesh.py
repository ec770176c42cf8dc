"""Device mesh + sharding helpers for data-parallel training and sharded eval.

The reference's only parallelism is data parallelism: one executor per GPU
with kvstore('device') parameter-server gradient aggregation
(deepim/core/DataParallelExecutorGroup.py:509, deepim/core/module.py:496-569).
The TPU-native equivalent (SURVEY.md §2.9): a 1-D `jax.sharding.Mesh` over
all chips with the batch sharded along the 'dp' axis and parameters/optimizer
state replicated; XLA compiles the gradient mean into reduce-scatter/
all-gather collectives over ICI (DCN across hosts via
jax.distributed.initialize) — there is no parameter server.

The matching network is ~40M params (replicating is the right call at this
scale); the same helpers shard batched multi-object evaluation across chips
(replacing pred_eval's enforced batch-1 host loop, tester.py:83).
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("dp",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim across 'dp'."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_pytree_batch(tree: Any, mesh: Mesh) -> Any:
    """Device_put a host pytree with every array leaf sharded on its leading
    dim (scalars and rank-0 leaves replicated)."""
    bs = batch_sharding(mesh)
    rep = replicated(mesh)

    def put(x):
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] % mesh.size == 0:
            return jax.device_put(x, bs)
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(put, tree)


def replicate_pytree(tree: Any, mesh: Mesh) -> Any:
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)


def batch_specs_like(tree: Any, mesh: Mesh | None = None) -> Any:
    """PartitionSpec pytree: leading-dim 'dp' for every array leaf whose
    leading dim is shardable (divisible by the mesh size when given)."""
    n = mesh.size if mesh is not None else None

    def spec(x):
        ndim = getattr(x, "ndim", 0)
        if ndim < 1:
            return P()
        if n is not None and x.shape[0] % n != 0:
            return P()
        return P("dp")

    return jax.tree_util.tree_map(spec, tree)


def replicated_specs_like(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: P(), tree)
