"""Worker process for the multi-host (2-process) distributed test.

Each process owns 2 virtual CPU devices; together they form a 4-device
global dp mesh connected through the JAX coordination service — the CPU
stand-in for a multi-host TPU slice over DCN.  Builds the same tiny scene
on both processes, feeds each process its local half of the global batch,
runs two train steps, and prints a parameter checksum that must agree
across processes (gradient all-reduce correctness).

Usage: _distributed_worker.py <coordinator_port> <process_id> <num_processes>
"""
import os
import sys

PORT, PID, NPROC = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"127.0.0.1:{PORT}", num_processes=NPROC, process_id=PID)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from __graft_entry__ import _build_scene  # noqa: E402
from deepim_tpu.config import Config, TrainIterConfig  # noqa: E402
from deepim_tpu.engine import TrainBatch, TrainState, make_train_step  # noqa: E402
from deepim_tpu.engine.lr_schedule import warmup_multifactor_schedule  # noqa: E402
from deepim_tpu.engine.train import make_optimizer  # noqa: E402
from deepim_tpu.models import FlowNetDeepIM  # noqa: E402
from deepim_tpu.ops.masks import box_fill  # noqa: E402
from deepim_tpu.parallel import (  # noqa: E402
    jit_train_step_dp,
    make_mesh,
    replicate_pytree,
    shard_pytree_batch,
)


def main() -> None:
    assert jax.process_count() == NPROC, jax.process_count()
    n_global = len(jax.devices())
    assert n_global == 2 * NPROC, n_global
    mesh = make_mesh()

    b, h, w = n_global, 64, 64
    b_local = b // NPROC
    k_mat = np.array([[80.0, 0, 32.0], [0, 80.0, 32.0], [0, 0, 1]], np.float32)
    ecfg, bank_arrays, cls_idx, meshes, pose_gt, pose0, img, depth, mask = _build_scene(
        b, h, w, k_mat, num_iters=2, update_mask="box_gt"
    )
    model = FlowNetDeepIM(pred_flow=True, pred_mask=True)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 8)))
    ticfg = TrainIterConfig(
        SE3_PM_LOSS=True, LW_PM=0.1, NUM_3D_SAMPLE=16, LW_FLOW=0.25, LW_MASK=0.03
    )
    tx = make_optimizer(Config(), warmup_multifactor_schedule(1e-4, (1000,)))
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))

    n_pts = 16
    lo, hi = PID * b_local, (PID + 1) * b_local
    batch_local = TrainBatch(
        image_observed=np.asarray(img)[lo:hi],
        mask_observed=np.asarray(box_fill(mask))[lo:hi],
        mask_gt_observed=np.asarray(mask)[lo:hi],
        depth_gt_observed=np.asarray(depth[:, 0])[lo:hi],
        pose_rendered=np.asarray(pose0)[lo:hi],
        pose_observed=np.asarray(pose_gt)[lo:hi],
        class_index=np.asarray(cls_idx)[lo:hi],
        points_model=np.asarray(meshes.vertices[:, :n_pts])[lo:hi],
        points_weights=np.ones((b_local, n_pts), np.float32),
        k=k_mat,
    )
    step = make_train_step(model, tx, ecfg, ticfg, "viz")
    state_d = replicate_pytree(state, mesh)
    batch_d = shard_pytree_batch(batch_local, mesh)
    bank_d = replicate_pytree(bank_arrays, mesh)
    pstep = jit_train_step_dp(step, mesh, state_d, batch_d, bank_d)
    for _ in range(2):
        state_d, metrics, _ = pstep(state_d, batch_d, bank_d)
    jax.block_until_ready(state_d)

    checksum = float(
        sum(
            float(jnp.sum(jnp.abs(leaf.astype(jnp.float32))))
            for leaf in jax.tree_util.tree_leaves(state_d.params)
        )
    )
    total = float(np.asarray(jax.device_get(metrics["total"]))[-1])
    print(f"RESULT pid={PID} step={int(state_d.step)} checksum={checksum:.6f} total={total:.6f}", flush=True)


if __name__ == "__main__":
    main()
