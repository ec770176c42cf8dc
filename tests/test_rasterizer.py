"""Rasterizer golden tests against a brute-force numpy scanline renderer with
identical conventions (the reference validates its GL renderer by diffing
against dataset-stored renders, render_py_multi.py:163-268; we validate
against an independent per-pixel implementation instead)."""
import numpy as np
from scipy.spatial.transform import Rotation as R

import jax.numpy as jnp

from deepim_tpu.render.mesh import MeshBank, make_icosphere, make_test_cube
from deepim_tpu.render.rasterizer import RasterConfig, rasterize, rasterize_single, render_mask

CFG = RasterConfig(height=64, width=128, tile_h=8, tile_w=64, max_faces_per_tile=256, chunk=16, znear=0.05, zfar=10.0)
K = np.array([[120.0, 0.0, 64.0], [0.0, 120.0, 32.0], [0.0, 0.0, 1.0]], np.float32)


def np_rasterize(verts, cols, faces, pose, k, h, w, znear, zfar):
    """Brute-force per-pixel triangle rasterizer: perspective-correct 1/z
    z-buffer, inclusive edge test, pixel (i,j) at u=j, v=i."""
    cam = verts @ pose[:, :3].T + pose[:, 3]
    z = cam[:, 2]
    u = k[0, 0] * cam[:, 0] / z + k[0, 2]
    v = k[1, 1] * cam[:, 1] / z + k[1, 2]
    q = 1.0 / z
    rgb = np.zeros((h, w, 3), np.float32)
    depth = np.zeros((h, w), np.float32)
    qbuf = np.full((h, w), -1e30, np.float32)
    for f in faces:
        fz = z[f]
        if np.any(fz <= znear) or np.any(fz >= zfar):
            continue
        fu, fv, fq = u[f], v[f], q[f]
        area = (fu[1] - fu[0]) * (fv[2] - fv[0]) - (fv[1] - fv[0]) * (fu[2] - fu[0])
        if abs(area) < 1e-12:
            continue
        x0 = max(int(np.ceil(fu.min())), 0)
        x1 = min(int(np.floor(fu.max())), w - 1)
        y0 = max(int(np.ceil(fv.min())), 0)
        y1 = min(int(np.floor(fv.max())), h - 1)
        s = np.sign(area)
        for i in range(y0, y1 + 1):
            for j in range(x0, x1 + 1):
                w0 = (fu[2] - fu[1]) * (i - fv[1]) - (fv[2] - fv[1]) * (j - fu[1])
                w1 = (fu[0] - fu[2]) * (i - fv[2]) - (fv[0] - fv[2]) * (j - fu[2])
                w2 = (fu[1] - fu[0]) * (i - fv[0]) - (fv[1] - fv[0]) * (j - fu[0])
                if w0 * s >= 0 and w1 * s >= 0 and w2 * s >= 0:
                    l = np.array([w0, w1, w2]) / area
                    qi = float(l @ fq)
                    if qi > qbuf[i, j]:
                        qbuf[i, j] = qi
                        depth[i, j] = 1.0 / qi
                        rgb[i, j] = (l * fq) @ cols[f] / qi
    return rgb, depth


def run_both(mesh, pose):
    fv = np.ones(mesh.num_faces, bool)
    rgb_j, depth_j = rasterize_single(
        jnp.asarray(mesh.vertices), jnp.asarray(mesh.colors), jnp.asarray(mesh.faces),
        jnp.asarray(fv), jnp.asarray(pose), jnp.asarray(K), CFG,
    )
    rgb_n, depth_n = np_rasterize(
        mesh.vertices, mesh.colors, mesh.faces, pose, K, CFG.height, CFG.width, CFG.znear, CFG.zfar
    )
    return np.asarray(rgb_j), np.asarray(depth_j), rgb_n, depth_n


def frontal_pose(tz=0.5, rot=None):
    pose = np.eye(3, 4, dtype=np.float32)
    if rot is not None:
        pose[:, :3] = rot
    pose[2, 3] = tz
    return pose


def test_cube_matches_bruteforce(rng):
    mesh = make_test_cube(0.1)
    rot = R.from_euler("xyz", [0.4, 0.6, 0.2]).as_matrix().astype(np.float32)
    rgb_j, depth_j, rgb_n, depth_n = run_both(mesh, frontal_pose(0.45, rot))
    assert (depth_n > 0).sum() > 200, "degenerate test scene"
    # Allow a tiny fraction of edge pixels to differ (tie-breaking on shared
    # edges / exact-boundary coverage).
    diff_mask = (depth_j > 0) != (depth_n > 0)
    assert diff_mask.mean() < 0.01
    both = (depth_j > 0) & (depth_n > 0) & ~diff_mask
    np.testing.assert_allclose(depth_j[both], depth_n[both], atol=1e-4)
    np.testing.assert_allclose(rgb_j[both], rgb_n[both], atol=1.0)


def test_sphere_matches_bruteforce(rng):
    mesh = make_icosphere(0.06, subdiv=2)
    rgb_j, depth_j, rgb_n, depth_n = run_both(mesh, frontal_pose(0.5))
    assert (depth_n > 0).sum() > 100
    diff_mask = (depth_j > 0) != (depth_n > 0)
    assert diff_mask.mean() < 0.01
    both = (depth_j > 0) & (depth_n > 0)
    np.testing.assert_allclose(depth_j[both], depth_n[both], atol=1e-4)


def test_depth_is_metric_z():
    mesh = make_test_cube(0.1)
    rgb, depth = run_both(mesh, frontal_pose(0.5))[:2]
    # Front face of the cube sits at z = 0.5 - 0.05 = 0.45.
    center = depth[28:36, 60:68]
    assert np.all(np.abs(center - 0.45) < 1e-3)


def test_offscreen_object_renders_empty():
    mesh = make_test_cube(0.1)
    pose = frontal_pose(0.5)
    pose[0, 3] = 10.0  # far off to the right
    fv = np.ones(mesh.num_faces, bool)
    rgb, depth = rasterize_single(
        jnp.asarray(mesh.vertices), jnp.asarray(mesh.colors), jnp.asarray(mesh.faces),
        jnp.asarray(fv), jnp.asarray(pose), jnp.asarray(K), CFG,
    )
    assert float(jnp.sum(depth)) == 0.0


def test_near_plane_culling():
    mesh = make_test_cube(0.02)
    pose = frontal_pose(0.03)  # entirely in front of znear (z in [0.02, 0.04])
    fv = np.ones(mesh.num_faces, bool)
    _, depth = rasterize_single(
        jnp.asarray(mesh.vertices), jnp.asarray(mesh.colors), jnp.asarray(mesh.faces),
        jnp.asarray(fv), jnp.asarray(pose), jnp.asarray(K), CFG,
    )
    assert float(jnp.sum(depth)) == 0.0


def test_batched_rasterize_and_meshbank(rng):
    cube = make_test_cube(0.1)
    sphere = make_icosphere(0.05, subdiv=1)
    bank = MeshBank.from_meshes([cube, sphere], pad_multiple=64)
    cls_idx = np.array([0, 1, 0])
    poses = np.stack([frontal_pose(0.5), frontal_pose(0.6), frontal_pose(0.4)])
    rgb, depth = rasterize(
        jnp.asarray(bank.vertices[cls_idx]),
        jnp.asarray(bank.colors[cls_idx]),
        jnp.asarray(bank.faces[cls_idx]),
        jnp.asarray(bank.face_valid[cls_idx]),
        jnp.asarray(poses),
        jnp.asarray(K),
        CFG,
    )
    assert rgb.shape == (3, CFG.height, CFG.width, 3)
    d = np.asarray(depth)
    assert (d[0] > 0).sum() > 100 and (d[1] > 0).sum() > 50 and (d[2] > 0).sum() > 100
    # Padded (invalid) faces must not draw anything: the padding triangle is
    # vertex 0 repeated -> zero area anyway, but face_valid masks it too.
    mask = np.asarray(render_mask(depth))
    assert set(np.unique(mask).tolist()) <= {0.0, 1.0}


def test_occlusion_two_objects():
    """Two cubes at different depths: nearer one wins the z-test."""
    near = make_test_cube(0.08)
    far = make_test_cube(0.3)
    verts = np.concatenate([near.vertices + [0, 0, 0.4], far.vertices + [0, 0, 1.2]])
    cols = np.concatenate([np.full_like(near.colors, 200.0), np.full_like(far.colors, 50.0)])
    faces = np.concatenate([near.faces, far.faces + near.num_vertices])
    fv = np.ones(faces.shape[0], bool)
    pose = np.eye(3, 4, dtype=np.float32)
    rgb, depth = rasterize_single(
        jnp.asarray(verts), jnp.asarray(cols), jnp.asarray(faces),
        jnp.asarray(fv), jnp.asarray(pose), jnp.asarray(K), CFG,
    )
    center_rgb = np.asarray(rgb)[32, 64]
    center_d = float(np.asarray(depth)[32, 64])
    np.testing.assert_allclose(center_rgb, 200.0, atol=1.0)
    assert abs(center_d - 0.36) < 1e-3
