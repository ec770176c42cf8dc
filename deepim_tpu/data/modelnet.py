"""Unseen-object (ModelNet-style) dataset: class-agnostic refinement on CAD
models never seen at training time.

The reference's drivers branch on dataset.startswith("ModelNet")
(deepim/train.py:74, deepim/core/tester.py:114,
lib/pair_matching/batch_updater_py_multi.py:35) and read the model/pose lists
from config (model_file/pose_file, deepim/config/config.py:52-53); its
rendering path is the point-light renderer
(render_py_light_modelnet_multi.py).  The dataset class itself is not in the
reference snapshot; this module provides the equivalent capability:

* `model_file`: one mesh path per line (.obj, vertex-colored or textured).
* `pose_file`: one sample per line: `<model_idx> r00 r01 ... t2` (12 floats,
  row-major [R|t]); the observed frame is rendered on device at that pose
  with a randomized point light, and the initial pose is sampled with the
  standard perturbation model (tools/synth_data.sample_perturbed_pose).

Because the matching network is class-agnostic (REGRESSOR_NUM=1, the only
shipped mode), testing on ModelNet means simply loading a bank of novel
meshes and running the same refinement engine with lighting enabled.
"""
from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from deepim_tpu.render.mesh import Mesh, MeshBank, load_textured_mesh


def load_model_list(model_file: str) -> list[str]:
    with open(model_file) as f:
        return [line.strip() for line in f if line.strip()]


def load_pose_list(pose_file: str) -> tuple[np.ndarray, np.ndarray]:
    """Returns (model_indices (N,), poses (N, 3, 4))."""
    idx, poses = [], []
    with open(pose_file) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            idx.append(int(parts[0]))
            poses.append(np.asarray([float(x) for x in parts[1:13]], np.float32).reshape(3, 4))
    return np.asarray(idx, np.int32), np.stack(poses)


@dataclass
class ModelNetDB:
    """Unseen-object pair database backed by model/pose list files."""

    model_file: str
    pose_file: str
    seed: int = 0

    def __post_init__(self):
        self.model_paths = load_model_list(self.model_file)
        self.model_idx, self.poses_gt = load_pose_list(self.pose_file)
        assert self.model_idx.max() < len(self.model_paths)
        self._meshes: list[Mesh] | None = None

    def meshes(self) -> list[Mesh]:
        if self._meshes is None:
            self._meshes = [
                load_textured_mesh(os.path.dirname(p), obj_name=os.path.basename(p))
                for p in self.model_paths
            ]
        return self._meshes

    def mesh_bank(self) -> MeshBank:
        meshes = self.meshes()
        return MeshBank.from_meshes(meshes).with_normals(meshes)

    def sample_records(self, rng: np.random.RandomState | None = None):
        """Pair records: gt pose + perturbed init pose + random light."""
        from deepim_tpu.tools.synth_data import sample_perturbed_pose

        rng = rng or np.random.RandomState(self.seed)
        records = []
        for i in range(len(self.model_idx)):
            pose_gt = self.poses_gt[i]
            records.append(
                {
                    "model_index": int(self.model_idx[i]),
                    "pose_observed": pose_gt,
                    "pose_rendered": sample_perturbed_pose(pose_gt, rng),
                    "light_position": rng.uniform(-0.5, 0.5, 3).astype(np.float32)
                    + np.array([0, 0, -0.5], np.float32),
                    "light_intensity": rng.uniform(0.8, 1.2, 3).astype(np.float32),
                    "brightness_ratio": np.float32(rng.choice([0.4, 0.3, 0.2])),
                }
            )
        return records


def write_modelnet_lists(out_dir: str, mesh_paths: list[str], poses: list[tuple[int, np.ndarray]]):
    """Helper to author model_file/pose_file pairs (toolkit use)."""
    os.makedirs(out_dir, exist_ok=True)
    model_file = os.path.join(out_dir, "models.txt")
    pose_file = os.path.join(out_dir, "poses.txt")
    with open(model_file, "w") as f:
        f.write("\n".join(mesh_paths) + "\n")
    with open(pose_file, "w") as f:
        for idx, pose in poses:
            vals = " ".join(f"{v:.8f}" for v in np.asarray(pose).reshape(12))
            f.write(f"{idx} {vals}\n")
    return model_file, pose_file
