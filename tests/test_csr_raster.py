"""CSR (sparse-binning) rasterizer path: golden equality against the dense
Pallas path and the pure-XLA pipeline, on both a giant-face mesh (cube — the
bbox-span expansion worst case) and a dense mesh (the regime CSR exists
for).  The dense path pre-gathers a (work_items, K, 32) padded record table
whose SMEM window caps K at ~200 on a 1 MB part; CSR packs exact per-tile
segments so memory/DMA scale with the actual face-tile overlaps."""
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

import jax
import jax.numpy as jnp

from deepim_tpu.config import replace
from deepim_tpu.render.mesh import MeshBank, make_icosphere, make_test_cube
from deepim_tpu.render.rasterizer import RasterConfig, bin_faces_csr, rasterize

BASE = RasterConfig(
    height=96, width=128, tile_h=8, tile_w=128, max_faces_per_tile=512,
    chunk=16, znear=0.05, zfar=10.0, active_tiles=0,
)
K_MAT = np.array([[300.0, 0, 64.0], [0, 300.0, 48.0], [0, 0, 1.0]], np.float32)


def _scene(mesh, b=3, seed=0):
    bank = MeshBank.from_meshes([mesh], pad_multiple=64)
    rng = np.random.RandomState(seed)
    rot = R.random(b, random_state=rng).as_matrix().astype(np.float32)
    pose = np.concatenate([rot, np.zeros((b, 3, 1), np.float32)], 2)
    pose[:, 2, 3] = 0.5
    pose[:, 0, 3] = rng.uniform(-0.05, 0.05, b)
    pose[:, 1, 3] = rng.uniform(-0.03, 0.03, b)
    tile = lambda x: jnp.tile(jnp.asarray(x), (b,) + (1,) * (np.asarray(x).ndim - 1))
    return (
        tile(bank.vertices), tile(bank.colors), tile(bank.faces),
        tile(bank.face_valid), jnp.asarray(pose),
    )


@pytest.mark.parametrize("mesh_fn", [lambda: make_test_cube(0.08), lambda: make_icosphere(0.05, 3)],
                         ids=["cube", "ico3"])
def test_csr_matches_dense_and_xla(mesh_fn):
    verts, cols, faces, fval, pose = _scene(mesh_fn())
    k = jnp.asarray(K_MAT)
    outs = {}
    # The cube's faces span many tiles; give csr the exact T*F pair budget
    # (the default per-face budget targets dense small-face meshes).
    full_budget = BASE.num_tiles * int(faces.shape[1])
    for name, cfg in [
        ("xla", BASE),
        ("dense", replace(BASE, use_pallas=True, binning="dense")),
        ("csr", replace(BASE, use_pallas=True, binning="csr", bin_pairs=full_budget)),
    ]:
        rgb, depth = rasterize(verts, cols, faces, fval, pose, k, cfg)
        outs[name] = (np.asarray(rgb), np.asarray(depth))
    # The three variants are separately compiled programs; the compiler may
    # FMA-contract the plane/edge evaluations differently, so depth agrees
    # to ~1 ulp rather than bit-for-bit.  Hit masks (coverage + z-winner
    # structure) must agree exactly; depth gets a metric-negligible
    # tolerance.
    for name in ("dense", "csr"):
        np.testing.assert_array_equal(
            outs[name][1] > 0, outs["xla"][1] > 0, err_msg=f"{name} hits"
        )
        np.testing.assert_allclose(
            outs[name][1], outs["xla"][1], atol=1e-5, err_msg=f"{name} depth"
        )
        np.testing.assert_allclose(outs[name][0], outs["xla"][0], atol=5e-3, err_msg=f"{name} rgb")
    assert (outs["csr"][1] > 0).mean() > 0.05  # scene actually rendered


def test_csr_multi_group_merge():
    """Force several pallas_call groups (tiny s_chunk would need a huge
    scene; instead use a small csr_chunk so tiles span many chunks) — the
    cross-group z-merge and forced re-init must not change the image."""
    verts, cols, faces, fval, pose = _scene(make_icosphere(0.05, 3))
    k = jnp.asarray(K_MAT)
    ref = rasterize(verts, cols, faces, fval, pose, k,
                    replace(BASE, use_pallas=True, binning="csr"))
    small = rasterize(verts, cols, faces, fval, pose, k,
                      replace(BASE, use_pallas=True, binning="csr", csr_chunk=32))
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(small[1]))
    np.testing.assert_allclose(np.asarray(ref[0]), np.asarray(small[0]), atol=5e-3)


def test_bin_faces_csr_exact_pairs(rng):
    """CSR pair list reproduces the dense overlap matrix exactly (same
    per-tile face sets, ascending face order)."""
    from deepim_tpu.render.rasterizer import bin_faces

    f = 40
    fu = jnp.asarray(rng.uniform(-20, 148, (f, 3)).astype(np.float32))
    fv = jnp.asarray(rng.uniform(-20, 116, (f, 3)).astype(np.float32))
    valid = jnp.asarray(rng.rand(f) > 0.2)
    # Giant random triangles span many tiles: give the pair list the full
    # T*F worst-case budget so nothing is dropped (the 4*F default targets
    # small faces).
    cfg = replace(BASE, bin_pairs=BASE.num_tiles * f)
    tile_faces, counts_d = bin_faces(fu, fv, valid, cfg)
    sorted_face, offsets, counts_s = bin_faces_csr(fu, fv, valid, cfg)
    np.testing.assert_array_equal(np.asarray(counts_d), np.asarray(counts_s))
    tf = np.asarray(tile_faces)
    sf = np.asarray(sorted_face)
    off = np.asarray(offsets)
    for t in range(BASE.num_tiles):
        c = int(np.asarray(counts_d)[t])
        np.testing.assert_array_equal(tf[t, :c], sf[off[t] : off[t] + c], err_msg=f"tile {t}")
