"""Weak-scaling benchmark: refinement frames/s and train step-time vs mesh size.

Runs the SAME dp-sharded programs the production drivers use (pjit over a
1-D 'dp' mesh; parallel/dp.py) at a fixed per-device batch, growing the mesh
over 1, 2, 4, ... devices, and reports throughput + scaling efficiency vs
the 1-device run (north star: >=80% at 2+ hosts, SURVEY.md §6).

On TPU hardware this measures real ICI scaling.  On CPU (default test
environment: 8 virtual devices via xla_force_host_platform_device_count)
the numbers validate the PLUMBING only — virtual CPU "devices" share the
same cores, so efficiency is meaningless and the output is labeled
`plumbing_only` accordingly.  On a multi-host pod, launch one process per
host with jax.distributed configured (parallel.initialize_distributed);
each process contributes its addressable devices to the same global mesh.

Usage: python experiments/bench_scaling.py [--per-device-batch 8]
       [--sizes 1,2,4,8] [--train] [--hw H W] [--steps 5]
Prints one JSON line per mesh size plus a summary line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def bench_size(n_dev: int, per_dev_batch: int, h: int, w: int, steps: int, train: bool,
               mesh_detail: int = 2):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _build_scene
    from deepim_tpu.config import Config, TrainIterConfig
    from deepim_tpu.engine import Observation, TrainBatch, TrainState, make_train_step, refine
    from deepim_tpu.engine.lr_schedule import warmup_multifactor_schedule
    from deepim_tpu.engine.train import make_optimizer
    from deepim_tpu.models import FlowNetDeepIM
    from deepim_tpu.ops.masks import box_fill
    from deepim_tpu.parallel import (
        jit_refine_dp,
        jit_train_step_dp,
        make_mesh,
        replicate_pytree,
        shard_pytree_batch,
    )

    mesh = make_mesh(n_dev)
    assert mesh.size == n_dev, (
        f"requested {n_dev} devices but only {mesh.size} available "
        f"(backend {jax.default_backend()}); use --cpu-mesh for a virtual mesh"
    )
    b = per_dev_batch * n_dev
    k_mat = np.array(
        [[572.4114, 0.0, 325.2611], [0.0, 573.57043, 242.04899], [0.0, 0.0, 1.0]], np.float32
    ) if (h, w) == (480, 640) else np.array(
        [[1.25 * w, 0, w / 2], [0, 1.25 * w, h / 2], [0, 0, 1]], np.float32
    )
    ecfg, bank_arrays, cls_idx, meshes, pose_gt, pose0, img, depth, mask = _build_scene(
        b, h, w, k_mat, num_iters=4,
        update_mask="box_rendered" if not train else "box_gt",
        mesh_detail=mesh_detail,
    )
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    full_model = FlowNetDeepIM(pred_flow=True, pred_mask=True, dtype=dtype)
    params = full_model.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 8)))

    bank_d = replicate_pytree(bank_arrays, mesh)

    if train:
        ticfg = TrainIterConfig(
            SE3_PM_LOSS=True, LW_PM=0.1, NUM_3D_SAMPLE=64, LW_FLOW=0.25, LW_MASK=0.03
        )
        tx = make_optimizer(Config(), warmup_multifactor_schedule(1e-4, (10_000,)))
        state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
        batch = TrainBatch(
            image_observed=np.asarray(img),
            mask_observed=np.asarray(box_fill(mask)),
            mask_gt_observed=np.asarray(mask),
            depth_gt_observed=np.asarray(depth[:, 0]),
            pose_rendered=pose0,
            pose_observed=pose_gt,
            class_index=np.asarray(cls_idx),
            points_model=np.asarray(meshes.vertices[:, :64]),
            points_weights=np.ones((b, 64), np.float32),
            k=k_mat,
        )
        step_fn = make_train_step(full_model, tx, ecfg, ticfg, "viz")
        state_d = replicate_pytree(state, mesh)
        batch_d = shard_pytree_batch(batch, mesh)
        pstep = jit_train_step_dp(step_fn, mesh, state_d, batch_d, bank_d)
        jax.block_until_ready(pstep(state_d, batch_d, bank_d))  # compile
        t0 = time.time()
        for _ in range(steps):
            state_d, metrics, _ = pstep(state_d, batch_d, bank_d)
        jax.block_until_ready(state_d)
        dt = (time.time() - t0) / steps
        return {"mode": "train", "n_devices": n_dev, "batch": b,
                "step_s": round(dt, 4), "frames_per_s": round(b / dt, 2)}

    eval_model = FlowNetDeepIM(pred_flow=False, pred_mask=False, dtype=dtype)
    obs = Observation(
        image_observed=np.asarray(img),
        mask_observed=np.asarray(box_fill(mask)),
        mask_gt_observed=None,
        depth_observed=None,
        k=k_mat,
    )

    def refine_fn(p, o, m, p0):
        return refine(p, eval_model, o, m, p0, ecfg)

    params_d = replicate_pytree(params, mesh)
    obs_d = shard_pytree_batch(obs, mesh)
    meshes_d = shard_pytree_batch(meshes, mesh)
    pose0_d = shard_pytree_batch(np.asarray(pose0), mesh)
    prun = jit_refine_dp(refine_fn, mesh, params_d, obs_d, meshes_d)
    jax.block_until_ready(prun(params_d, obs_d, meshes_d, pose0_d))  # compile
    t0 = time.time()
    outs = [prun(params_d, obs_d, meshes_d, pose0_d) for _ in range(steps)]
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / steps
    return {"mode": "refine", "n_devices": n_dev, "batch": b,
            "step_s": round(dt, 4), "frames_per_s": round(b / dt, 2)}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--per-device-batch", type=int, default=8)
    ap.add_argument("--sizes", default=None, help="comma list, default 1..n_devices pow2")
    ap.add_argument("--train", action="store_true", help="bench the train step instead of eval refine")
    ap.add_argument("--hw", type=int, nargs=2, default=(480, 640))
    ap.add_argument("--mesh-detail", type=int, default=2,
                    help="icosphere subdivision of the scene meshes: 2 = "
                    "~320 faces (light), 5 = 20,480 faces (LINEMOD scale). "
                    "Every emitted row records the resulting face count.")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument(
        "--cpu-mesh", action="store_true",
        help="force a virtual CPU device mesh (plumbing validation; the TPU "
        "plugin otherwise overrides JAX_PLATFORMS)",
    )
    args = ap.parse_args()

    if args.cpu_mesh:
        want = max(int(s) for s in args.sizes.split(",")) if args.sizes else 8
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={want}"
            ).strip()

    import jax

    if args.cpu_mesh:
        jax.config.update("jax_platforms", "cpu")

    n_avail = len(jax.devices())
    if args.sizes:
        sizes = [int(s) for s in args.sizes.split(",")]
    else:
        sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= n_avail]
    plumbing_only = jax.default_backend() == "cpu"
    results = []
    for n in sizes:
        r = bench_size(n, args.per_device_batch, args.hw[0], args.hw[1], args.steps,
                       args.train, mesh_detail=args.mesh_detail)
        r["plumbing_only"] = plumbing_only
        r["faces_per_mesh"] = 20 * 4 ** args.mesh_detail
        results.append(r)
        print(json.dumps(r), flush=True)
    base = results[0]["frames_per_s"]
    summary = {
        "metric": "weak_scaling_efficiency",
        "per_device_batch": args.per_device_batch,
        "sizes": sizes,
        "frames_per_s": [r["frames_per_s"] for r in results],
        "efficiency_pct": [
            round(100.0 * r["frames_per_s"] / (base * r["n_devices"]), 1) for r in results
        ],
        "plumbing_only": plumbing_only,
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
