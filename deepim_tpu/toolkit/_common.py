"""Shared helpers for the data-prep toolkit: devkit paths, pose-file IO with
the class-index header, and a batched on-device pose-list renderer that
replaces the per-image Render_Py OpenGL calls of the reference scripts."""
from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from deepim_tpu.data.pairdb import LM_IDX2CLASS

DEFAULT_K = np.array(
    [[572.4114, 0.0, 325.2611], [0.0, 573.57043, 242.04899], [0.0, 0.0, 1.0]], np.float32
)
WIDTH, HEIGHT = 640, 480
ZNEAR, ZFAR = 0.25, 6.0
DEPTH_FACTOR = 1000.0


@dataclass
class Devkit:
    """Paths of an LM6d_refine-layout devkit (toolkit/LM6d_*.py globals)."""

    root: str

    @property
    def observed_set_dir(self):
        return os.path.join(self.root, "image_set", "observed")

    @property
    def pair_set_dir(self):
        return os.path.join(self.root, "image_set")

    @property
    def observed_dir(self):
        return os.path.join(self.root, "data", "observed")

    @property
    def gt_observed_dir(self):
        return os.path.join(self.root, "data", "gt_observed")

    @property
    def rendered_dir(self):
        return os.path.join(self.root, "data", "rendered")

    @property
    def rendered_pose_dir(self):
        return os.path.join(self.root, "rendered_poses")

    @property
    def models_dir(self):
        return os.path.join(self.root, "models")

    def observed_indices(self, cls_name: str, image_set: str = "all") -> list[str]:
        path = os.path.join(self.observed_set_dir, f"{cls_name}_{image_set}.txt")
        with open(path) as f:
            return [x.strip() for x in f if x.strip()]


def resolve_classes(classes: list[str] | None) -> dict[int, str]:
    """CLI --classes filter over the LINEMOD table (LM6d_*.py idx2class)."""
    if not classes:
        return dict(LM_IDX2CLASS)
    name2idx = {v: k for k, v in LM_IDX2CLASS.items()}
    out = {}
    for i, c in enumerate(classes):
        out[name2idx.get(c, i + 1)] = c
    return out


def write_pose_file_with_class(path: str, class_idx: int, pose: np.ndarray) -> None:
    """-pose.txt with the class index as the header line
    (LM6d_0_gen_gt_observed.py write_pose_file)."""
    pose = np.asarray(pose).reshape(3, 4)
    with open(path, "w") as f:
        f.write(f"{class_idx}\n")
        f.write("\n".join(" ".join(str(v) for v in row) for row in pose))


def load_observed_pose(dk: Devkit, cls_name: str, cls_idx: int, observed_idx: str) -> np.ndarray:
    """GT pose of `cls` in an observed frame.  Prefers the reference's
    -meta.mat (cls_indexes + poses, LM6d_0_gen_gt_observed.py:110-117), falls
    back to an adapted gt_observed/<cls>/<prefix>-pose.txt."""
    prefix = observed_idx.split("/")[-1]
    meta_path = os.path.join(dk.observed_dir, f"{observed_idx}-meta.mat")
    if os.path.exists(meta_path):
        import scipy.io as sio

        meta = sio.loadmat(meta_path)
        if meta["poses"].ndim == 2:
            return np.asarray(meta["poses"], np.float64).reshape(3, 4)
        inner = np.where(np.squeeze(meta["cls_indexes"]) == cls_idx)
        return np.squeeze(meta["poses"][:, :, inner]).reshape(3, 4)
    pose_path = os.path.join(dk.gt_observed_dir, cls_name, f"{prefix}-pose.txt")
    return np.loadtxt(pose_path, skiprows=1).reshape(3, 4)


class BatchRenderer:
    """Batched pose-list renderer on the deepim_tpu rasterizer.

    Replaces the per-image `Render_Py.render` OpenGL loop of the reference
    toolkit: poses are rendered `batch` at a time in one jitted call, so the
    MXU renders while the host writes PNGs of the previous batch."""

    def __init__(self, model_dir: str, k: np.ndarray = DEFAULT_K,
                 width: int = WIDTH, height: int = HEIGHT,
                 znear: float = ZNEAR, zfar: float = ZFAR, batch: int = 8,
                 raster_cfg=None):
        import jax
        import jax.numpy as jnp

        from deepim_tpu.render.mesh import load_textured_mesh
        from deepim_tpu.render.rasterizer import RasterConfig, rasterize

        mesh = load_textured_mesh(model_dir)
        self._verts = jnp.asarray(np.tile(mesh.vertices[None], (batch, 1, 1)))
        self._cols = jnp.asarray(np.tile(mesh.colors[None], (batch, 1, 1)))
        self._faces = jnp.asarray(np.tile(mesh.faces[None], (batch, 1, 1)))
        self._fvalid = jnp.ones((batch, mesh.num_faces), bool)
        self._k = jnp.asarray(k)
        self.batch = batch
        cfg = raster_cfg or RasterConfig(height=height, width=width, znear=znear, zfar=zfar,
                                         use_pallas=jax.default_backend() == "tpu")

        @jax.jit
        def _render(poses):
            return rasterize(self._verts, self._cols, self._faces, self._fvalid, poses, self._k, cfg)

        self._render = _render

        from deepim_tpu.render.lighting import lit_vertex_colors

        normals = mesh.vertex_normals()
        self._normals = jnp.asarray(np.tile(normals[None], (batch, 1, 1)))

        @jax.jit
        def _render_lit(poses, light_pos, light_int, brightness_k):
            cols = lit_vertex_colors(
                self._verts, self._normals, self._cols, poses, light_pos, light_int, brightness_k
            )
            return rasterize(self._verts, cols, self._faces, self._fvalid, poses, self._k, cfg)

        self._render_lit = _render_lit

    def render_many(self, poses: np.ndarray):
        """poses (N, 3, 4) -> yields (rgb (H,W,3) uint8-range float, depth
        (H,W) meters) per pose, rendered in device batches."""
        import jax.numpy as jnp

        poses = np.asarray(poses, np.float32).reshape(-1, 3, 4)
        n = poses.shape[0]
        for start in range(0, n, self.batch):
            chunk = poses[start : start + self.batch]
            pad = self.batch - chunk.shape[0]
            if pad:
                chunk = np.concatenate([chunk, np.tile(chunk[-1:], (pad, 1, 1))])
            rgb, depth = self._render(jnp.asarray(chunk))
            rgb, depth = np.asarray(rgb), np.asarray(depth)
            for j in range(self.batch - pad):
                yield rgb[j], depth[j]

    def render_many_lit(
        self, poses: np.ndarray, light_pos: np.ndarray, light_int: np.ndarray,
        brightness_k: np.ndarray,
    ):
        """Point-light variant (render_py_light model, render/lighting.py):
        per-pose light position/intensity (N, 3) and brightness ratio (N,)."""
        import jax.numpy as jnp

        poses = np.asarray(poses, np.float32).reshape(-1, 3, 4)
        n = poses.shape[0]

        def pad_to(x, b):
            x = np.asarray(x, np.float32)
            reps = (b - x.shape[0],) + (1,) * (x.ndim - 1)
            return np.concatenate([x, np.tile(x[-1:], reps)]) if x.shape[0] < b else x

        for start in range(0, n, self.batch):
            sl = slice(start, start + self.batch)
            chunk = pad_to(poses[sl], self.batch)
            lp = pad_to(light_pos[sl], self.batch)
            li = pad_to(light_int[sl], self.batch)
            bk = pad_to(brightness_k[sl], self.batch)
            rgb, depth = self._render_lit(
                jnp.asarray(chunk), jnp.asarray(lp), jnp.asarray(li), jnp.asarray(bk)
            )
            rgb, depth = np.asarray(rgb), np.asarray(depth)
            for j in range(min(self.batch, n - start)):
                yield rgb[j], depth[j]


def write_color_png(path: str, rgb: np.ndarray) -> None:
    import cv2

    cv2.imwrite(path, np.clip(np.asarray(rgb), 0, 255).astype(np.uint8)[:, :, ::-1])


def write_depth_png(path: str, depth: np.ndarray, depth_factor: float = DEPTH_FACTOR) -> None:
    import cv2

    cv2.imwrite(path, (np.asarray(depth) * depth_factor).astype(np.uint16))
