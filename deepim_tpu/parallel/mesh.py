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


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host init (DCN): wraps jax.distributed.initialize.

    The reference recognizes kvstore 'dist*_sync' types but ships no
    multi-machine launcher (deepim/core/module.py:523-525); here multi-host
    runs are first-class.  With no arguments, initialization is driven by
    the cluster environment (JAX_COORDINATOR_ADDRESS / NUM_PROCESSES /
    PROCESS_ID, or the TPU pod metadata) and silently skipped when neither
    arguments nor environment are present (single-process run)."""
    import os

    env_driven = "JAX_COORDINATOR_ADDRESS" in os.environ or "COORDINATOR_ADDRESS" in os.environ
    if coordinator_address is None and not env_driven:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the given (default: all) devices.

    In a multi-process run this is the GLOBAL mesh (jax.devices() lists
    every chip in the slice); each process feeds its addressable shard via
    shard_pytree_batch."""
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
    """Place a host pytree with every array leaf sharded on its leading dim
    (scalars and rank-0 leaves replicated).

    Single-process: leaves are the global batch.  Multi-process: each
    process passes its LOCAL batch slice (global_batch / process_count
    samples, as produced by a loader with process sharding) and the leaves
    are assembled into global arrays over DCN-addressable devices."""
    bs = batch_sharding(mesh)
    rep = replicated(mesh)
    multi = jax.process_count() > 1
    local_frac = mesh.size // jax.process_count() if multi else mesh.size

    def put(x):
        x = np.asarray(x)
        if multi:
            if x.ndim >= 1 and x.shape[0] % max(local_frac, 1) == 0:
                return jax.make_array_from_process_local_data(bs, x)
            return jax.make_array_from_process_local_data(rep, x)
        if x.ndim >= 1 and x.shape[0] % mesh.size == 0:
            return jax.device_put(x, bs)
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(put, tree)


def replicate_pytree(tree: Any, mesh: Mesh) -> Any:
    rep = replicated(mesh)
    if jax.process_count() > 1:
        # Every process holds the full value; the replicated global array is
        # assembled from identical local copies.
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(rep, np.asarray(x)), tree
        )
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
