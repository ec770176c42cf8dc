"""Data-preparation toolkit: generate an LM6d_refine-layout dataset.

TPU-native equivalent of the reference's offline data pipeline
(toolkit/LM6d_0_gen_gt_observed.py, LM6d_1_gen_rendered_pose.py,
LM6d_2_gen_rendered.py and prepare_data.sh): renders gt-observed and
perturbed-pose images with the deepim_tpu rasterizer (instead of
glumpy/OpenGL) and writes the directory layout consumed by data.pairdb:

    data/observed/<scene>/<idx>-color.png/-depth.png/-label.png
    data/gt_observed/<class>/<idx>-color.png/-depth.png/-pose.txt
    data/rendered/<class>/<idx>_<k>-color.png/-depth.png/-pose.txt
    image_set/train_<class>.txt, val_<class>.txt
    models/<class>/points.xyz, models/models_info.txt

The perturbed init-pose noise model matches
toolkit/LM6d_1_gen_rendered_pose.py:51-55: per-axis euler noise
N(0, 15 deg) clipped at 45 deg and translation noise N(0, (0.01, 0.01,
0.05)) m.

Also usable with synthetic procedural meshes (cube/icosphere) to produce a
self-contained test fixture when no LINEMOD assets are present.
"""
from __future__ import annotations

import os

import numpy as np

ROT_NOISE_STD_DEG = 15.0
ROT_NOISE_MAX_DEG = 45.0
TRANS_NOISE_STD = (0.01, 0.01, 0.05)


def sample_perturbed_pose(
    pose: np.ndarray,
    rng: np.random.RandomState,
    rot_std_deg: float = ROT_NOISE_STD_DEG,
    rot_max_deg: float = ROT_NOISE_MAX_DEG,
    trans_std: tuple = TRANS_NOISE_STD,
) -> np.ndarray:
    """Perturb a gt pose with the reference's noise model
    (LM6d_1_gen_rendered_pose.py:51-55).  The std/max overrides support
    near-convergence curricula (small-delta pairs for tracking precision
    fine-tunes) — the defaults are the reference's PoseCNN-like model."""
    from scipy.spatial.transform import Rotation as R

    ang = rng.normal(0, rot_std_deg, 3)
    ang = np.clip(ang, -rot_max_deg, rot_max_deg)
    r_noise = R.from_euler("xyz", ang, degrees=True).as_matrix()
    t_noise = rng.normal(0, trans_std, 3)
    out = pose.copy().astype(np.float32)
    out[:, :3] = r_noise @ pose[:, :3]
    out[:, 3] = pose[:, 3] + t_noise
    return out


def generate_dataset(
    devkit_path: str,
    meshes: dict[str, "object"],  # class name -> render.mesh.Mesh
    k: np.ndarray,
    n_train: int = 16,
    n_val: int = 4,
    rendered_per_observed: int = 1,
    height: int = 480,
    width: int = 640,
    seed: int = 0,
    depth_factor: float = 1000.0,
    z_range: tuple[float, float] = (0.5, 0.9),
    raster_cfg=None,
    noise_mix: list | None = None,
) -> None:
    """Render and write a complete LM6d_refine-layout dataset.

    noise_mix: optional list of (weight, rot_std_deg, rot_max_deg,
    (tx, ty, tz) std) tuples — each rendered init pose draws its noise model
    from this distribution (weights normalized).  None = the reference's
    single PoseCNN-like model.  A mix listing a small-delta model alongside
    the standard one builds the near-convergence curriculum used by the
    tracking-precision fine-tune (experiments/track_finetune.py)."""
    import cv2
    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation as R

    from deepim_tpu.render.rasterizer import RasterConfig, rasterize_single

    rng = np.random.RandomState(seed)
    cfg = raster_cfg or RasterConfig(height=height, width=width)
    os.makedirs(devkit_path, exist_ok=True)
    classes = sorted(meshes.keys())

    # models/: points.xyz + textured.obj + models_info.txt (id x diameter_mm).
    from deepim_tpu.render.mesh import write_obj

    info_lines = []
    for ci, cls in enumerate(classes, start=1):
        mesh = meshes[cls]
        mdir = os.path.join(devkit_path, "models", cls)
        os.makedirs(mdir, exist_ok=True)
        np.savetxt(os.path.join(mdir, "points.xyz"), mesh.vertices)
        write_obj(os.path.join(mdir, "textured.obj"), mesh)
        diameter_mm = mesh.diameter() * 1000.0
        info_lines.append(f"{ci} d {diameter_mm:.4f}")
    with open(os.path.join(devkit_path, "models", "models_info.txt"), "w") as f:
        f.write("\n".join(info_lines) + "\n")

    from deepim_tpu.data.pairdb import save_pose_file

    def write_depth(path, depth):
        cv2.imwrite(path, (np.asarray(depth) * depth_factor).astype(np.uint16))

    def write_color(path, rgb):
        cv2.imwrite(path, np.asarray(rgb).astype(np.uint8)[:, :, ::-1])  # RGB -> BGR png

    image_set_dir = os.path.join(devkit_path, "image_set")
    os.makedirs(image_set_dir, exist_ok=True)

    for ci, cls in enumerate(classes, start=1):
        mesh = meshes[cls]
        verts = jnp.asarray(mesh.vertices)
        cols = jnp.asarray(mesh.colors)
        faces = jnp.asarray(mesh.faces)
        fvalid = jnp.ones(mesh.num_faces, bool)
        obs_dir = os.path.join(devkit_path, "data", "observed", cls)
        gt_dir = os.path.join(devkit_path, "data", "gt_observed", cls)
        rend_dir = os.path.join(devkit_path, "data", "rendered", cls)
        for d in (obs_dir, gt_dir, rend_dir):
            os.makedirs(d, exist_ok=True)

        train_lines, val_lines = [], []
        n_total = n_train + n_val
        for i in range(n_total):
            idx = f"{i:06d}"
            # Random gt pose looking at the object.
            rot = R.random(random_state=rng).as_matrix().astype(np.float32)
            t = np.array(
                [rng.uniform(-0.05, 0.05), rng.uniform(-0.05, 0.05), rng.uniform(*z_range)],
                np.float32,
            )
            pose = np.concatenate([rot, t[:, None]], axis=1)
            rgb, depth = rasterize_single(verts, cols, faces, fvalid, jnp.asarray(pose), jnp.asarray(k), cfg)
            rgb, depth = np.asarray(rgb), np.asarray(depth)
            label = (depth > 0).astype(np.uint8) * ci

            write_color(os.path.join(obs_dir, f"{idx}-color.png"), rgb)
            write_depth(os.path.join(obs_dir, f"{idx}-depth.png"), depth)
            cv2.imwrite(os.path.join(obs_dir, f"{idx}-label.png"), label)
            write_color(os.path.join(gt_dir, f"{idx}-color.png"), rgb)
            write_depth(os.path.join(gt_dir, f"{idx}-depth.png"), depth)
            save_pose_file(os.path.join(gt_dir, f"{idx}-pose.txt"), pose)

            for kk in range(rendered_per_observed):
                ridx = f"{idx}_{kk}"
                if noise_mix:
                    wts = np.array([m[0] for m in noise_mix], np.float64)
                    _, rsd, rmd, tsd = noise_mix[rng.choice(len(noise_mix), p=wts / wts.sum())]
                    rpose = sample_perturbed_pose(pose, rng, rsd, rmd, tsd)
                else:
                    rpose = sample_perturbed_pose(pose, rng)
                rrgb, rdepth = rasterize_single(
                    verts, cols, faces, fvalid, jnp.asarray(rpose), jnp.asarray(k), cfg
                )
                write_color(os.path.join(rend_dir, f"{ridx}-color.png"), np.asarray(rrgb))
                write_depth(os.path.join(rend_dir, f"{ridx}-depth.png"), np.asarray(rdepth))
                save_pose_file(os.path.join(rend_dir, f"{ridx}-pose.txt"), rpose)
                line = f"{cls}/{idx} {cls}/{ridx}"
                (train_lines if i < n_train else val_lines).append(line)

        with open(os.path.join(image_set_dir, f"train_{cls}.txt"), "w") as f:
            f.write("\n".join(train_lines) + "\n")
        with open(os.path.join(image_set_dir, f"val_{cls}.txt"), "w") as f:
            f.write("\n".join(val_lines) + "\n")


def generate_occlusion_dataset(
    devkit_path: str,
    meshes: dict[str, "object"],
    k: np.ndarray,
    n_scenes: int = 8,
    n_train: int = 0,
    height: int = 480,
    width: int = 640,
    seed: int = 0,
    depth_factor: float = 1000.0,
    z_range: tuple[float, float] = (0.5, 0.9),
    lateral_spread: float = 0.04,
    raster_cfg=None,
) -> None:
    """Multi-instance occlusion scenes in the LM6d_occ-style layout.

    Every scene contains ALL classes at jittered nearby positions, so objects
    genuinely occlude each other (the Occlusion-LINEMOD setting,
    README.md:43-49).  The observed frame is the depth-composited render of
    all instances; its label image carries one class id per pixel, so
    per-class masks come out of the same multi-instance label file the real
    LM6d_occ data uses.  gt_observed / rendered stay per class (each object
    rendered alone at its gt / perturbed pose, as in
    toolkit/LM6d_0_gen_gt_observed.py), and each class gets its own
    image_set over the SAME scene frames.
    """
    import cv2
    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation as R

    from deepim_tpu.data.pairdb import save_pose_file
    from deepim_tpu.render.mesh import write_obj
    from deepim_tpu.render.rasterizer import RasterConfig, rasterize_single

    rng = np.random.RandomState(seed)
    cfg = raster_cfg or RasterConfig(height=height, width=width)
    classes = sorted(meshes.keys())

    info_lines = []
    for ci, cls in enumerate(classes, start=1):
        mesh = meshes[cls]
        mdir = os.path.join(devkit_path, "models", cls)
        os.makedirs(mdir, exist_ok=True)
        np.savetxt(os.path.join(mdir, "points.xyz"), mesh.vertices)
        write_obj(os.path.join(mdir, "textured.obj"), mesh)
        info_lines.append(f"{ci} d {mesh.diameter() * 1000.0:.4f}")
    with open(os.path.join(devkit_path, "models", "models_info.txt"), "w") as f:
        f.write("\n".join(info_lines) + "\n")

    def write_depth(path, depth):
        cv2.imwrite(path, (np.asarray(depth) * depth_factor).astype(np.uint16))

    def write_color(path, rgb):
        cv2.imwrite(path, np.asarray(rgb).astype(np.uint8)[:, :, ::-1])

    obs_dir = os.path.join(devkit_path, "data", "observed", "scenes")
    os.makedirs(obs_dir, exist_ok=True)
    image_set_dir = os.path.join(devkit_path, "image_set")
    os.makedirs(image_set_dir, exist_ok=True)
    lines = {cls: [] for cls in classes}

    for i in range(n_scenes):
        idx = f"{i:06d}"
        z0 = rng.uniform(*z_range)
        rgb_stack, depth_stack, poses = [], [], {}
        for ci, cls in enumerate(classes, start=1):
            mesh = meshes[cls]
            rot = R.random(random_state=rng).as_matrix().astype(np.float32)
            # Jittered around a shared center so silhouettes overlap.
            t = np.array(
                [
                    rng.uniform(-lateral_spread, lateral_spread),
                    rng.uniform(-lateral_spread, lateral_spread),
                    z0 + rng.uniform(-0.05, 0.05),
                ],
                np.float32,
            )
            pose = np.concatenate([rot, t[:, None]], axis=1)
            poses[cls] = pose
            rgb, depth = rasterize_single(
                jnp.asarray(mesh.vertices), jnp.asarray(mesh.colors),
                jnp.asarray(mesh.faces), jnp.ones(mesh.num_faces, bool),
                jnp.asarray(pose), jnp.asarray(k), cfg,
            )
            rgb_stack.append(np.asarray(rgb))
            depth_stack.append(np.asarray(depth))

        # Depth compositing: nearest instance wins each pixel.
        depth_all = np.stack(depth_stack)                     # (C, H, W)
        depth_inf = np.where(depth_all > 0, depth_all, np.inf)
        winner = np.argmin(depth_inf, axis=0)                 # (H, W)
        any_hit = np.isfinite(depth_inf.min(axis=0))
        scene_rgb = np.take_along_axis(
            np.stack(rgb_stack), winner[None, :, :, None], axis=0
        )[0] * any_hit[:, :, None]
        scene_depth = np.where(
            any_hit, np.take_along_axis(depth_all, winner[None], axis=0)[0], 0.0
        )
        label = np.where(any_hit, winner + 1, 0).astype(np.uint8)

        write_color(os.path.join(obs_dir, f"{idx}-color.png"), scene_rgb)
        write_depth(os.path.join(obs_dir, f"{idx}-depth.png"), scene_depth)
        cv2.imwrite(os.path.join(obs_dir, f"{idx}-label.png"), label)

        for ci, cls in enumerate(classes, start=1):
            mesh = meshes[cls]
            gt_dir = os.path.join(devkit_path, "data", "gt_observed", cls)
            rend_dir = os.path.join(devkit_path, "data", "rendered", cls)
            os.makedirs(gt_dir, exist_ok=True)
            os.makedirs(rend_dir, exist_ok=True)
            pose = poses[cls]
            write_color(os.path.join(gt_dir, f"{idx}-color.png"), rgb_stack[ci - 1])
            write_depth(os.path.join(gt_dir, f"{idx}-depth.png"), depth_stack[ci - 1])
            save_pose_file(os.path.join(gt_dir, f"{idx}-pose.txt"), pose)
            rpose = sample_perturbed_pose(pose, rng)
            rrgb, rdepth = rasterize_single(
                jnp.asarray(mesh.vertices), jnp.asarray(mesh.colors),
                jnp.asarray(mesh.faces), jnp.ones(mesh.num_faces, bool),
                jnp.asarray(rpose), jnp.asarray(k), cfg,
            )
            write_color(os.path.join(rend_dir, f"{idx}_0-color.png"), np.asarray(rrgb))
            write_depth(os.path.join(rend_dir, f"{idx}_0-depth.png"), np.asarray(rdepth))
            save_pose_file(os.path.join(rend_dir, f"{idx}_0-pose.txt"), rpose)
            lines[cls].append(f"scenes/{idx} {cls}/{idx}_0")

    for cls in classes:
        with open(os.path.join(image_set_dir, f"val_{cls}.txt"), "w") as f:
            f.write("\n".join(lines[cls][n_train:]) + "\n")
        if n_train:
            with open(os.path.join(image_set_dir, f"train_{cls}.txt"), "w") as f:
                f.write("\n".join(lines[cls][:n_train]) + "\n")


def main():
    import argparse

    from deepim_tpu.render.mesh import make_icosphere, make_test_cube

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True, help="devkit output path")
    ap.add_argument("--n-train", type=int, default=64)
    ap.add_argument("--n-val", type=int, default=16)
    ap.add_argument("--per-observed", type=int, default=1)
    ap.add_argument(
        "--occlusion", action="store_true",
        help="multi-instance occlusion scenes (LM6d_occ-style) instead of the single-object layout",
    )
    args = ap.parse_args()
    k = np.array(
        [[572.4114, 0.0, 325.2611], [0.0, 573.57043, 242.04899], [0.0, 0.0, 1.0]], np.float32
    )
    meshes = {"cube": make_test_cube(0.08), "sphere": make_icosphere(0.05, 3)}
    if args.occlusion:
        generate_occlusion_dataset(args.out, meshes, k, n_scenes=args.n_val + args.n_train, n_train=args.n_train)
    else:
        generate_dataset(args.out, meshes, k, args.n_train, args.n_val, args.per_observed)
    print("wrote dataset to", args.out)


if __name__ == "__main__":
    main()
