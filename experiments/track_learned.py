"""Closed-loop video tracking with a LEARNED checkpoint.

The oracle tracker test (tests/test_tracker.py) proves the scan plumbing with
an analytic pose oracle; this harness closes the loop with the network the
13-class benchmark trained (experiments/benchmark_multiclass.py): it
synthesizes a smoothly moving sequence per class, renders the observed frames
with the on-device rasterizer, tracks from a PoseCNN-noise initial pose using
`engine.tracker.make_tracker` (the whole video is ONE jitted lax.scan — the
reference has no tracking driver at all, only offline visualization videos,
toolkit/gen_video_iter_zoom_with_factor.py), and reports per-frame ADD
against the ground-truth trajectory.

Run AFTER benchmark_multiclass has trained its checkpoint:
  python experiments/track_learned.py [--epochs 30] [--frames 60]
Emits one JSON line + a README-ready table.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30, help="checkpoint epoch to load")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--classes", type=int, default=13, help="must match the benchmark run")
    ap.add_argument("--track-classes", type=int, default=4, help="videos tracked (batch)")
    ap.add_argument("--subdiv", type=int, default=3)
    ap.add_argument("--iters-per-frame", type=int, default=2)
    ap.add_argument("--init-iters", type=int, default=0,
                    help="extra frame-0 lock-on refinement iterations "
                    "(round-3 diagnosis: obj00's detection-noise init sits "
                    "outside the 2-iteration basin and never recovers)")
    ap.add_argument("--devkit", default=None)
    ap.add_argument("--prefix", default="bench13",
                    help="checkpoint prefix in <devkit>/run (e.g. 'trackft' "
                    "for the tracking-precision fine-tune)")
    ap.add_argument("--run-dir", default=None,
                    help="checkpoint directory (default <devkit>/run)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation as R

    from deepim_tpu.engine.checkpoint import load_checkpoint
    from deepim_tpu.engine.refine import EngineConfig, MeshBuffers, tune_raster_for_bank
    from deepim_tpu.engine.tracker import make_tracker
    from deepim_tpu.engine.train import TrainState
    from deepim_tpu.eval.evaluator import _add_errors
    from deepim_tpu.models import FlowNetDeepIM
    from deepim_tpu.render.mesh import MeshBank, make_benchmark_classes
    from deepim_tpu.render.rasterizer import RasterConfig, rasterize

    h = w = args.size
    k = np.array([[1.35 * h, 0.0, w / 2], [0.0, 1.35 * h, h / 2], [0.0, 0.0, 1.0]], np.float32)
    import tempfile

    devkit = args.devkit or os.path.join(
        tempfile.gettempdir(), f"bench13_{args.classes}c_{h}_{args.subdiv}"
    )
    run_dir = args.run_dir or os.path.join(devkit, "run")
    meshes_by_name = make_benchmark_classes(args.classes, subdiv=args.subdiv)
    classes = sorted(meshes_by_name.keys())[: args.track_classes]
    mesh_list = [meshes_by_name[c] for c in classes]
    bank = MeshBank.from_meshes(mesh_list)
    bank_arrays = (
        jnp.asarray(bank.vertices), jnp.asarray(bank.colors),
        jnp.asarray(bank.faces), jnp.asarray(bank.face_valid),
    )
    b = len(classes)
    cls_idx = jnp.arange(b, dtype=jnp.int32)
    mb = MeshBuffers.gather(bank_arrays, cls_idx)

    model = FlowNetDeepIM(pred_flow=True, pred_mask=True, dtype=jnp.bfloat16)
    params0 = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 8))
    )
    state = load_checkpoint(os.path.join(run_dir, args.prefix), args.epochs,
                            TrainState(params0, None, 0))
    params = state.params

    ecfg = EngineConfig(
        height=h, width=w,
        raster=RasterConfig(height=h, width=w, znear=0.05, zfar=10.0,
                            use_pallas=jax.default_backend() == "tpu"),
        update_mask="box_rendered", num_iters=args.iters_per_frame,
        pixel_means=(123.68, 116.779, 103.939),
    )
    ecfg = tune_raster_for_bank(ecfg, bank_arrays, k)

    # Smooth trajectory: ~2.5 deg/frame tumble + a slow (x, y, z) orbit —
    # harder than the LINEMOD test set's inter-frame motion.
    t_frames = args.frames
    rng = np.random.RandomState(7)
    axis = rng.randn(b, 3)
    axis /= np.linalg.norm(axis, axis=1, keepdims=True)
    rot0 = R.random(b, random_state=rng).as_matrix()
    poses_gt = np.zeros((t_frames, b, 3, 4), np.float32)
    for t in range(t_frames):
        ang = np.deg2rad(2.5) * t
        for i in range(b):
            rstep = R.from_rotvec(axis[i] * ang).as_matrix()
            poses_gt[t, i, :, :3] = rstep @ rot0[i]
        poses_gt[t, :, 0, 3] = 0.03 * np.sin(2 * np.pi * t / t_frames + np.arange(b))
        poses_gt[t, :, 1, 3] = 0.02 * np.cos(2 * np.pi * t / t_frames + np.arange(b))
        poses_gt[t, :, 2, 3] = 0.6 + 0.05 * np.sin(2 * np.pi * t / t_frames)

    render = jax.jit(lambda pose: rasterize(
        mb.vertices, mb.colors, mb.faces, mb.face_valid, pose, jnp.asarray(k),
        ecfg.raster, corners=mb.corners, corner_colors=mb.corner_colors))
    frames = np.zeros((t_frames, b, 3, h, w), np.float32)
    for t in range(t_frames):
        rgb, _ = render(jnp.asarray(poses_gt[t]))
        frames[t] = np.transpose(np.asarray(rgb), (0, 3, 1, 2))

    # PoseCNN-style init noise on frame 0 (LM6d_1_gen_rendered_pose.py:51-55).
    pose0 = poses_gt[0].copy()
    for i in range(b):
        noise = R.from_euler("xyz", rng.normal(0, 15, 3), degrees=True).as_matrix()
        pose0[i, :, :3] = noise @ pose0[i, :, :3]
    pose0[:, 0, 3] += rng.normal(0, 0.01, b)
    pose0[:, 1, 3] += rng.normal(0, 0.01, b)
    pose0[:, 2, 3] += rng.normal(0, 0.05, b)

    track = jax.jit(make_tracker(model, ecfg, args.iters_per_frame,
                                 init_iters=args.init_iters))
    _, poses_est = track(
        params, jnp.asarray(frames), mb, jnp.asarray(k), jnp.asarray(pose0)
    )
    poses_est = np.asarray(poses_est)  # (T, B, 3, 4)

    from deepim_tpu.eval.evaluator import _adi_errors

    rows = []
    for i, cls in enumerate(classes):
        pts = mesh_list[i].vertices
        d = mesh_list[i].diameter()
        add = _add_errors(
            poses_est[:, i].astype(np.float64), poses_gt[:, i].astype(np.float64), pts
        )
        add_init = _add_errors(
            np.tile(pose0[i][None], (t_frames, 1, 1)).astype(np.float64),
            poses_gt[:, i].astype(np.float64), pts,
        )
        # Failure-mode decomposition (round-3's obj00 never locked): split
        # the pose error into rotation (geodesic deg), translation (m), and
        # ADI (closest-point — insensitive to appearance symmetry).  A class
        # with small trans + ADI error but large rot/ADD error is tracking
        # the SHAPE fine while the rotation is visually unobservable.
        re = poses_est[:, i, :, :3] @ np.transpose(poses_gt[:, i, :, :3], (0, 2, 1))
        tr = np.clip((np.trace(re, axis1=1, axis2=2) - 1) / 2, -1, 1)
        rot_deg = np.degrees(np.arccos(tr))
        trans_m = np.linalg.norm(poses_est[:, i, :, 3] - poses_gt[:, i, :, 3], axis=1)
        adi = _adi_errors(
            poses_est[:, i].astype(np.float64), poses_gt[:, i].astype(np.float64), pts
        )
        rows.append({
            "class": cls,
            "add_lt_0.1d_pct": float(np.mean(add < 0.1 * d) * 100),
            "mean_add_over_d": float(np.mean(add / d)),
            "max_add_over_d": float(np.max(add / d)),
            "final_add_over_d": float(add[-1] / d),
            "frame0_init_add_over_d": float(add_init[0] / d),
            "adi_lt_0.1d_pct": float(np.mean(adi < 0.1 * d) * 100),
            "mean_adi_over_d": float(np.mean(adi / d)),
            "mean_rot_deg": float(np.mean(rot_deg)),
            "final_rot_deg": float(rot_deg[-1]),
            "mean_trans_over_d": float(np.mean(trans_m / d)),
        })
    summary = {
        "frames": t_frames,
        "iters_per_frame": args.iters_per_frame,
        "init_iters": args.init_iters,
        "prefix": args.prefix,
        "epochs": args.epochs,
        "mean_add_lt_0.1d_pct": float(np.mean([r["add_lt_0.1d_pct"] for r in rows])),
        "mean_add_over_d": float(np.mean([r["mean_add_over_d"] for r in rows])),
        "per_class": rows,
    }
    print("TRACK_JSON " + json.dumps(summary))
    print("\n| class | ADD<0.1d %frames | mean ADD/d | max ADD/d | final ADD/d | init ADD/d |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print("| %s | %.1f | %.3f | %.3f | %.3f | %.3f |" % (
            r["class"], r["add_lt_0.1d_pct"], r["mean_add_over_d"],
            r["max_add_over_d"], r["final_add_over_d"], r["frame0_init_add_over_d"]))


if __name__ == "__main__":
    main()
