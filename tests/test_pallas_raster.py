"""The Pallas per-tile rasterizer kernel must agree with the XLA visibility
path (interpret mode on CPU; the TPU-compiled path is exercised by bench)."""
import dataclasses

import numpy as np
from scipy.spatial.transform import Rotation as R

import jax.numpy as jnp

from deepim_tpu.render.mesh import make_icosphere, make_test_cube
from deepim_tpu.render.rasterizer import RasterConfig, rasterize

K_MAT = np.array([[120.0, 0.0, 64.0], [0.0, 120.0, 64.0], [0.0, 0.0, 1.0]], np.float32)
BASE = RasterConfig(
    height=128, width=128, tile_h=16, tile_w=16, max_faces_per_tile=128,
    chunk=16, znear=0.05, zfar=10.0, active_tiles=32,
)


def render_both(mesh, poses):
    b = poses.shape[0]
    verts = jnp.asarray(np.tile(mesh.vertices[None], (b, 1, 1)))
    cols = jnp.asarray(np.tile(mesh.colors[None], (b, 1, 1)))
    faces = jnp.asarray(np.tile(mesh.faces[None], (b, 1, 1)))
    fvalid = jnp.ones((b, mesh.num_faces), bool)
    out = {}
    for use_pallas in (False, True):
        cfg = dataclasses.replace(BASE, use_pallas=use_pallas)
        rgb, depth = rasterize(verts, cols, faces, fvalid, jnp.asarray(poses), jnp.asarray(K_MAT), cfg)
        out[use_pallas] = (np.asarray(rgb), np.asarray(depth))
    return out


def test_pallas_matches_xla_cube(rng):
    mesh = make_test_cube(0.1)
    rot = R.from_euler("xyz", [[0.3, 0.5, 0.1], [-0.4, 0.2, 0.6]]).as_matrix().astype(np.float32)
    poses = np.concatenate([rot, np.zeros((2, 3, 1), np.float32)], 2)
    poses[:, 2, 3] = [0.5, 0.6]
    out = render_both(mesh, poses)
    rgb_x, d_x = out[False]
    rgb_p, d_p = out[True]
    assert (d_x > 0).sum() > 500
    np.testing.assert_allclose(d_p, d_x, atol=1e-4)
    np.testing.assert_allclose(rgb_p, rgb_x, atol=0.5)


def test_pallas_matches_xla_sphere(rng):
    mesh = make_icosphere(0.06, 2)
    poses = np.tile(np.eye(3, 4, dtype=np.float32), (1, 1, 1))
    poses[:, 2, 3] = 0.55
    out = render_both(mesh, poses)
    rgb_x, d_x = out[False]
    rgb_p, d_p = out[True]
    assert (d_x > 0).sum() > 300
    np.testing.assert_allclose(d_p, d_x, atol=1e-4)
    np.testing.assert_allclose(rgb_p, rgb_x, atol=0.5)
