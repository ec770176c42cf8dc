"""Native meshio library vs the pure-Python parsers (skipped when the .so
has not been built; `make -C native`)."""
import os
import time

import numpy as np
import pytest

from deepim_tpu.render.mesh import make_icosphere, write_obj
from deepim_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib not built")


def _python_parse(path):
    """Reference pure-Python OBJ parse (the fallback body in parse_obj)."""
    verts, vcols, faces = [], [], []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                p = line.split()
                verts.append([float(x) for x in p[1:4]])
                if len(p) >= 7:
                    vcols.append([float(x) for x in p[4:7]])
            elif line.startswith("f "):
                p = [tok.split("/")[0] for tok in line.split()[1:]]
                idx = [int(x) - 1 for x in p]
                for i in range(1, len(idx) - 1):
                    faces.append([idx[0], idx[i], idx[i + 1]])
    return (
        np.asarray(verts, np.float32),
        np.asarray(faces, np.int32),
        np.asarray(vcols, np.float32),
    )


def test_native_obj_matches_python(tmp_path):
    mesh = make_icosphere(0.05, 3)
    path = str(tmp_path / "m.obj")
    write_obj(path, mesh)
    v_py, f_py, c_py = _python_parse(path)
    out = native.parse_obj_native(path)
    assert out is not None
    v_n, _, f_n, _, c_n = out
    np.testing.assert_allclose(v_n, v_py, atol=1e-6)
    np.testing.assert_array_equal(f_n, f_py)
    np.testing.assert_allclose(c_n, c_py, atol=1e-6)


def test_native_xyz_matches_numpy(tmp_path, rng):
    pts = rng.randn(500, 3).astype(np.float32)
    path = str(tmp_path / "points.xyz")
    np.savetxt(path, pts)
    out = native.load_points_xyz(path)
    np.testing.assert_allclose(out, pts, atol=1e-5)


def test_native_is_faster_on_large_mesh(tmp_path):
    mesh = make_icosphere(0.05, 5)  # ~20k faces
    path = str(tmp_path / "big.obj")
    write_obj(path, mesh)
    t0 = time.time()
    native.parse_obj_native(path)
    t_native = time.time() - t0
    t0 = time.time()
    _python_parse(path)
    t_python = time.time() - t0
    # The native parser should never be slower (usually 10-30x faster).
    assert t_native < t_python, (t_native, t_python)


def test_missing_file_returns_none():
    assert native.parse_obj_native("/nonexistent/x.obj") is None
