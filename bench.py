"""Benchmark: end-to-end refinement throughput (frames/s/chip).

One "frame" = one full 4-iteration render-and-compare refinement of one
object pose at 480x640 (the reference's TEST.test_iter=4 protocol,
deepim/core/tester.py:389-485) — render, zoom, FlowNet matching forward and
untangled SE(3) update all on chip.  The scene uses LINEMOD-scale meshes
(icosphere subdiv 5: 20,480 faces / 10,242 vertices per object — the real
LINEMOD models are ~10k-60k vertices), rendered through the CSR-binned
Pallas rasterizer, so the number reflects production mesh complexity.

Baseline: the MXNet reference publishes no throughput numbers
(BASELINE.md); its test loop is batch-1 per GPU with four host round-trips
per iteration (OpenGL render, numpy pose math, data-batch rebuild).  We use
an estimated 5 frames/s/GPU for the reference (4 iterations x ~(25 ms
forward + 15 ms render + host overhead) per frame on a GTX 1080Ti) as the
denominator for vs_baseline.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_BASELINE_FPS = 5.0


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _build_scene
    from deepim_tpu.engine import Observation, refine
    from deepim_tpu.models import FlowNetDeepIM
    from deepim_tpu.ops.masks import box_fill

    # Batch 64 per chip: eval-time refinement is embarrassingly batch-
    # parallel (the reference is locked to batch-1 per GPU, tester.py:83);
    # larger per-chip batch raises MXU utilization (64% vs 34% at 16).
    b, h, w, iters = 64, 480, 640, 4
    k_mat = np.array(
        [[572.4114, 0.0, 325.2611], [0.0, 573.57043, 242.04899], [0.0, 0.0, 1.0]],
        np.float32,
    )
    ecfg, bank_arrays, cls_idx, meshes, pose_gt, pose0, img, depth, mask = _build_scene(
        b, h, w, k_mat, num_iters=iters, mesh_detail=5, active_tiles=48
    )
    # FAST_TEST protocol: the reference's shipped eval configs run with
    # TEST.FAST_TEST=True + UPDATE_MASK='box_rendered', which drops the flow
    # decoder and mask head from the test graph (deepIM_flownet.py:624-676)
    # — only the encoder + SE(3) head run at eval time.  Params are still
    # created for the full model (as a trained checkpoint would have).
    full_model = FlowNetDeepIM(pred_flow=True, pred_mask=True, dtype=jnp.bfloat16)
    params = full_model.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 8)))
    model = FlowNetDeepIM(pred_flow=False, pred_mask=False, dtype=jnp.bfloat16)
    obs = Observation(
        image_observed=img,
        mask_observed=box_fill(mask),
        mask_gt_observed=None,
        depth_observed=None,
        k=jnp.asarray(k_mat),
    )

    @jax.jit
    def run(params, pose0):
        return refine(params, model, obs, meshes, pose0, ecfg)[0]

    # Distinct initial poses per repetition (defeats any execution-result
    # caching between identical dispatches).
    n_rep = 10
    rng = np.random.RandomState(1)
    pose0_list = []
    for _ in range(n_rep + 1):
        p = pose0.copy()
        p[:, :, 3] += rng.uniform(-0.01, 0.01, (b, 3)).astype(np.float32)
        pose0_list.append(jnp.asarray(p))
    jax.block_until_ready(run(params, pose0_list[-1]))  # compile + warmup
    t0 = time.time()
    outs = [run(params, p) for p in pose0_list[:n_rep]]
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / n_rep
    fps = b / dt
    print(
        json.dumps(
            {
                "metric": "refinement_frames_per_s_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s (480x640, 20k-face meshes, 4 refine iters, FAST_TEST, batch %d)" % b,
                "vs_baseline": round(fps / REFERENCE_BASELINE_FPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
