"""Mesh loading and device-ready mesh buffers for the TPU rasterizer.

Replaces the reference's glumpy data.objload + per-class gloo.Program setup
(lib/render_glumpy/render_py_multi.py:69-81) with a host-side loader that
bakes textures into per-vertex colors and packs all classes into padded,
class-indexable device buffers (SURVEY.md §7.4 "multi-class batched
rendering").

Texture baking: the reference samples texture_map.png per fragment in GLSL
(render_py_multi.py:40-52).  On TPU, per-fragment texture gathers are
hostile to the hardware; LINEMOD meshes are dense (~10k-60k vertices over
small objects), so sampling the texture once per vertex at load time and
interpolating vertex colors perspective-correctly in the rasterizer gives a
visually equivalent render without any gather in the hot loop.
"""
from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np


@dataclass
class Mesh:
    """A single triangle mesh with per-vertex colors, host-side."""

    vertices: np.ndarray  # (V, 3) float32, model frame (meters)
    faces: np.ndarray     # (F, 3) int32
    colors: np.ndarray    # (V, 3) float32 in [0, 255] (RGB)
    normals: np.ndarray | None = None  # (V, 3) float32, lazy
    # Optional per-vertex texture coordinates + the texture image, for the
    # exact per-fragment texture-sampling render path (render_py_multi.py
    # GLSL texture2D equivalent); None = vertex colors only.
    uv: np.ndarray | None = None        # (V, 2) float32 in [0, 1]
    texture: np.ndarray | None = None   # (TH, TW, 3) float32 RGB [0, 255]

    def vertex_normals(self) -> np.ndarray:
        if self.normals is None:
            from deepim_tpu.render.lighting import compute_vertex_normals

            self.normals = compute_vertex_normals(self.vertices, self.faces)
        return self.normals

    @property
    def num_vertices(self) -> int:
        return self.vertices.shape[0]

    @property
    def num_faces(self) -> int:
        return self.faces.shape[0]

    def diameter(self) -> float:
        """Max pairwise extent approximation via bbox diagonal upper bound and
        exact for eval usage compute via points (lib/utils/misc.py:56 computes
        exact max pairwise distance; datasets ship models_info.txt instead)."""
        lo = self.vertices.min(axis=0)
        hi = self.vertices.max(axis=0)
        return float(np.linalg.norm(hi - lo))


def parse_obj(path: str) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Minimal Wavefront OBJ parser.

    Returns (vertices (V,3), texcoords (T,2), faces_v (F,3), faces_vt (F,3),
    vertex_normals_unused).  Handles 'v', 'vt', 'f a/b/c' forms; polygons are
    fan-triangulated.  Equivalent coverage to glumpy's data.objload for the
    LINEMOD 'textured.obj' assets.
    """
    from deepim_tpu.utils.native import parse_obj_native

    native = parse_obj_native(path)
    if native is not None:
        v, vt, fv, fvt, vc = native
        return v, vt, fv, np.maximum(fvt, 0), vc

    verts: list[list[float]] = []
    vcols: list[list[float]] = []
    texs: list[list[float]] = []
    faces_v: list[list[int]] = []
    faces_vt: list[list[int]] = []
    with open(path, "r") as f:
        for line in f:
            if line.startswith("v "):
                p = line.split()
                verts.append([float(p[1]), float(p[2]), float(p[3])])
                if len(p) >= 7:  # 'v x y z r g b' vertex-color extension
                    vcols.append([float(p[4]), float(p[5]), float(p[6])])
            elif line.startswith("vt "):
                p = line.split()
                texs.append([float(p[1]), float(p[2])])
            elif line.startswith("f "):
                p = line.split()[1:]
                idx = []
                for tok in p:
                    sub = tok.split("/")
                    vi = int(sub[0])
                    ti = int(sub[1]) if len(sub) > 1 and sub[1] else 0
                    idx.append((vi, ti))
                for i in range(1, len(idx) - 1):  # fan triangulation
                    tri = [idx[0], idx[i], idx[i + 1]]
                    faces_v.append([t[0] - 1 if t[0] > 0 else len(verts) + t[0] for t in tri])
                    faces_vt.append([t[1] - 1 if t[1] > 0 else len(texs) + t[1] for t in tri])
    v = np.asarray(verts, np.float32)
    vt = np.asarray(texs, np.float32) if texs else np.zeros((1, 2), np.float32)
    fv = np.asarray(faces_v, np.int32)
    fvt = np.asarray(faces_vt, np.int32)
    vc = (
        np.asarray(vcols, np.float32)
        if len(vcols) == len(verts)
        else np.zeros((0, 3), np.float32)
    )
    return v, vt, fv, fvt, vc


def _sample_texture(texture: np.ndarray, uv: np.ndarray) -> np.ndarray:
    """Bilinear texture lookup at uv in [0,1]^2 (v up, OpenGL convention —
    the reference flips the texture rows at load, render_py_multi.py:76)."""
    th, tw = texture.shape[:2]
    u = np.clip(uv[:, 0], 0.0, 1.0) * (tw - 1)
    v = (1.0 - np.clip(uv[:, 1], 0.0, 1.0)) * (th - 1)
    x0 = np.floor(u).astype(np.int64)
    y0 = np.floor(v).astype(np.int64)
    x1 = np.minimum(x0 + 1, tw - 1)
    y1 = np.minimum(y0 + 1, th - 1)
    fx = (u - x0)[:, None]
    fy = (v - y0)[:, None]
    t = texture.astype(np.float32)
    return (
        t[y0, x0] * (1 - fx) * (1 - fy)
        + t[y0, x1] * fx * (1 - fy)
        + t[y1, x0] * (1 - fx) * fy
        + t[y1, x1] * fx * fy
    )


def split_uv_seams(
    v: np.ndarray, vt: np.ndarray, fv: np.ndarray, fvt: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Duplicate vertices per unique (position, texcoord) pair so every face
    corner carries its exact uv — what GL does implicitly with indexed
    vertex+texcoord attribute pairs (glumpy data.objload builds the same
    split buffers).  Returns (vertices (V',3), uv (V',2), faces (F,3))."""
    key = fv.astype(np.int64) * (len(vt) + 1) + (fvt.astype(np.int64) + 1)
    uniq, inv = np.unique(key.reshape(-1), return_inverse=True)
    new_faces = inv.reshape(fv.shape).astype(np.int32)
    vi = (uniq // (len(vt) + 1)).astype(np.int64)
    ti = (uniq % (len(vt) + 1)).astype(np.int64) - 1
    new_v = v[vi]
    new_uv = np.where((ti >= 0)[:, None], vt[np.maximum(ti, 0)], 0.0).astype(np.float32)
    return new_v, new_uv, new_faces


def load_textured_mesh(
    model_dir: str,
    obj_name: str = "textured.obj",
    tex_name: str = "texture_map.png",
    keep_texture: bool = False,
) -> Mesh:
    """Load a LINEMOD-style model directory (textured.obj + texture_map.png)
    into a vertex-colored Mesh (render_py_multi.py:69-81 equivalent).

    Vertices are split at uv seams so each corner's texcoord is exact; the
    baked color is the texture sampled at the vertex uv.  With
    `keep_texture`, the uv + texture image are retained for the exact
    per-fragment texture-sampling render path (rasterize_textured)."""
    import cv2

    v, vt, fv, fvt, vc = parse_obj(os.path.join(model_dir, obj_name))
    tex_path = os.path.join(model_dir, tex_name)
    if vc.shape[0] == v.shape[0] and not os.path.exists(tex_path):
        # Vertex-colored OBJ (the toolkit's synthetic assets): colors are
        # stored in [0, 1] per the common 'v x y z r g b' extension.
        scale = 255.0 if vc.max() <= 1.0 + 1e-6 else 1.0
        colors = (vc * scale).astype(np.float32)
    elif os.path.exists(tex_path):
        tex = cv2.imread(tex_path, cv2.IMREAD_COLOR)[:, :, ::-1]  # BGR -> RGB
        v, vert_uv, fv = split_uv_seams(v, vt, fv, fvt)
        colors = _sample_texture(tex, vert_uv).astype(np.float32)
        return Mesh(
            vertices=v, faces=fv, colors=colors,
            uv=vert_uv if keep_texture else None,
            texture=tex.astype(np.float32) if keep_texture else None,
        )
    else:
        colors = np.full((v.shape[0], 3), 128.0, np.float32)
    return Mesh(vertices=v, faces=fv, colors=colors)


def load_ply(path: str, scale: float = 1.0) -> Mesh:
    """PLY mesh loader (ascii / binary_little_endian) covering the BOP model
    format: vertex x,y,z [+ normals] [+ red,green,blue], triangular faces
    (lib/utils/inout.py:196-394, pysixd load_ply equivalent).

    `scale` converts units (BOP models are millimeters; pass 0.001 for
    meters, cf. toolkit/LM6d_devkit model rescaling)."""
    import struct

    with open(path, "rb") as f:
        assert f.readline().strip() == b"ply", "not a PLY file"
        fmt = None
        elems: list[tuple[str, int, list[tuple[str, str]]]] = []
        cur_props: list[tuple[str, str]] = []
        while True:
            line = f.readline().decode("ascii", "ignore").strip()
            if line.startswith("format"):
                fmt = line.split()[1]
            elif line.startswith("element"):
                _, name, count = line.split()
                cur_props = []
                elems.append((name, int(count), cur_props))
            elif line.startswith("property"):
                parts = line.split()
                if parts[1] == "list":
                    cur_props.append((parts[-1], f"list:{parts[2]}:{parts[3]}"))
                else:
                    cur_props.append((parts[-1], parts[1]))
            elif line.startswith("end_header"):
                break

        type_map = {
            "float": ("f", 4), "float32": ("f", 4), "double": ("d", 8),
            "float64": ("d", 8), "int": ("i", 4), "int32": ("i", 4),
            "uint": ("I", 4), "uint32": ("I", 4), "short": ("h", 2),
            "ushort": ("H", 2), "uchar": ("B", 1), "uint8": ("B", 1),
            "char": ("b", 1), "int8": ("b", 1),
        }
        verts, cols, norms, faces = [], [], [], []
        for name, count, props in elems:
            for _ in range(count):
                if fmt == "ascii":
                    vals = f.readline().split()
                    record: dict[str, float] = {}
                    vi = 0
                    for pname, ptype in props:
                        if ptype.startswith("list"):
                            n = int(vals[vi]); vi += 1
                            record[pname] = [float(v) for v in vals[vi : vi + n]]
                            vi += n
                        else:
                            record[pname] = float(vals[vi]); vi += 1
                else:
                    record = {}
                    for pname, ptype in props:
                        if ptype.startswith("list"):
                            _, cnt_t, val_t = ptype.split(":")
                            cf, cs = type_map[cnt_t]
                            n = struct.unpack("<" + cf, f.read(cs))[0]
                            vf, vs = type_map[val_t]
                            record[pname] = list(struct.unpack(f"<{n}{vf}", f.read(vs * n)))
                        else:
                            vf, vs = type_map[ptype]
                            record[pname] = struct.unpack("<" + vf, f.read(vs))[0]
                if name == "vertex":
                    verts.append([record["x"], record["y"], record["z"]])
                    if "red" in record:
                        cols.append([record["red"], record["green"], record["blue"]])
                    if "nx" in record:
                        norms.append([record["nx"], record["ny"], record["nz"]])
                elif name == "face":
                    idx = record.get("vertex_indices", record.get("vertex_index"))
                    idx = [int(i) for i in idx]
                    for i in range(1, len(idx) - 1):
                        faces.append([idx[0], idx[i], idx[i + 1]])

    v = np.asarray(verts, np.float32) * scale
    colors = (
        np.asarray(cols, np.float32)
        if len(cols) == len(verts)
        else np.full((len(verts), 3), 128.0, np.float32)
    )
    normals = np.asarray(norms, np.float32) if len(norms) == len(verts) else None
    return Mesh(
        vertices=v,
        faces=np.asarray(faces, np.int32),
        colors=colors,
        normals=normals,
    )


def write_obj(path: str, mesh: Mesh) -> None:
    """Write a vertex-colored OBJ ('v x y z r g b', colors in [0, 1])."""
    with open(path, "w") as f:
        for p, c in zip(mesh.vertices, mesh.colors / 255.0):
            f.write(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} {c[0]:.4f} {c[1]:.4f} {c[2]:.4f}\n")
        for tri in mesh.faces:
            f.write(f"f {tri[0] + 1} {tri[1] + 1} {tri[2] + 1}\n")


def make_colored_mesh(vertices: np.ndarray, faces: np.ndarray, colors: np.ndarray | None = None) -> Mesh:
    if colors is None:
        colors = np.full((vertices.shape[0], 3), 180.0, np.float32)
    return Mesh(
        vertices=np.asarray(vertices, np.float32),
        faces=np.asarray(faces, np.int32),
        colors=np.asarray(colors, np.float32),
    )


@dataclass
class MeshBank:
    """All object classes packed into padded device-uploadable arrays,
    gathered by class index inside the jitted render step (replaces the
    reference's one-gloo-program-per-class list, render_py_multi.py:66-81)."""

    vertices: np.ndarray   # (C, Vmax, 3) float32, padded with zeros
    colors: np.ndarray     # (C, Vmax, 3) float32
    faces: np.ndarray      # (C, Fmax, 3) int32, padded with 0
    face_valid: np.ndarray  # (C, Fmax) bool
    num_vertices: np.ndarray  # (C,) int32
    num_faces: np.ndarray     # (C,) int32
    normals: np.ndarray | None = None  # (C, Vmax, 3), for the lit render path
    uv: np.ndarray | None = None       # (C, Vmax, 2), for texture sampling
    textures: np.ndarray | None = None  # (C, TH, TW, 3) padded texture images

    def with_normals(self, meshes: list[Mesh]) -> "MeshBank":
        c, vmax, _ = self.vertices.shape
        normals = np.zeros((c, vmax, 3), np.float32)
        for i, m in enumerate(meshes):
            normals[i, : m.num_vertices] = m.vertex_normals()
        self.normals = normals
        return self

    @staticmethod
    def from_meshes(
        meshes: list[Mesh], pad_multiple: int = 256, keep_textures: bool = False
    ) -> "MeshBank":
        def rnd(n):
            return ((n + pad_multiple - 1) // pad_multiple) * pad_multiple

        vmax = rnd(max(m.num_vertices for m in meshes))
        fmax = rnd(max(m.num_faces for m in meshes))
        c = len(meshes)
        verts = np.zeros((c, vmax, 3), np.float32)
        cols = np.zeros((c, vmax, 3), np.float32)
        faces = np.zeros((c, fmax, 3), np.int32)
        valid = np.zeros((c, fmax), bool)
        nv = np.zeros(c, np.int32)
        nf = np.zeros(c, np.int32)
        for i, m in enumerate(meshes):
            verts[i, : m.num_vertices] = m.vertices
            cols[i, : m.num_vertices] = m.colors
            faces[i, : m.num_faces] = m.faces
            valid[i, : m.num_faces] = True
            nv[i] = m.num_vertices
            nf[i] = m.num_faces
        bank = MeshBank(verts, cols, faces, valid, nv, nf)
        if keep_textures:
            if any(m.uv is None or m.texture is None for m in meshes):
                raise ValueError("keep_textures requires uv + texture on every mesh")
            th = max(m.texture.shape[0] for m in meshes)
            tw = max(m.texture.shape[1] for m in meshes)
            uv = np.zeros((c, vmax, 2), np.float32)
            tex = np.zeros((c, th, tw, 3), np.float32)
            for i, m in enumerate(meshes):
                # Rescale uv so [0,1] maps to this mesh's texture extent
                # inside the padded (th, tw) canvas.
                mh, mw = m.texture.shape[:2]
                uv[i, : m.num_vertices, 0] = m.uv[:, 0] * ((mw - 1) / max(tw - 1, 1))
                uv[i, : m.num_vertices, 1] = 1.0 - (1.0 - m.uv[:, 1]) * ((mh - 1) / max(th - 1, 1))
                tex[i, :mh, :mw] = m.texture
            bank.uv = uv
            bank.textures = tex
        return bank


def make_test_cube(size: float = 0.1) -> Mesh:
    """Axis-aligned cube mesh with distinct face colors — used by golden
    tests (replacing the reference's render-vs-dataset-image self-test,
    render_py_multi.py:163-268, which needs dataset assets)."""
    s = size / 2
    corners = np.array(
        [[-s, -s, -s], [s, -s, -s], [s, s, -s], [-s, s, -s],
         [-s, -s, s], [s, -s, s], [s, s, s], [-s, s, s]], np.float32
    )
    quads = [
        (0, 1, 2, 3), (4, 7, 6, 5), (0, 4, 5, 1),
        (3, 2, 6, 7), (0, 3, 7, 4), (1, 5, 6, 2),
    ]
    face_colors = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255],
         [255, 255, 0], [255, 0, 255], [0, 255, 255]], np.float32
    )
    verts, cols, faces = [], [], []
    for qi, q in enumerate(quads):
        base = len(verts)
        for ci in q:
            verts.append(corners[ci])
            cols.append(face_colors[qi])
        faces.append([base, base + 1, base + 2])
        faces.append([base, base + 2, base + 3])
    return Mesh(
        vertices=np.asarray(verts, np.float32),
        faces=np.asarray(faces, np.int32),
        colors=np.asarray(cols, np.float32),
    )


def make_bumpy_mesh(radius: float = 0.05, subdiv: int = 3, seed: int = 0,
                    bump: float = 0.35) -> Mesh:
    """Asymmetric 'asteroid' mesh: icosphere with a smooth random radial
    displacement field and a smooth random vertex-color field.  Used by the
    multi-class synthetic benchmark as LINEMOD stand-ins: asymmetric (so
    rotation is identifiable), dense, textured via vertex colors."""
    base = make_icosphere(radius, subdiv)
    rng = np.random.RandomState(seed)
    v = base.vertices / radius  # unit sphere directions

    def smooth_field(channels: int) -> np.ndarray:
        """Low-frequency random field over the sphere: sum of a few random
        spherical harmonics-ish lobes (dot products with random directions)."""
        out = np.zeros((v.shape[0], channels), np.float32)
        for _ in range(6):
            d = rng.randn(3)
            d /= np.linalg.norm(d)
            freq = rng.uniform(1.0, 3.0)
            phase = rng.uniform(0, 2 * np.pi)
            amp = rng.uniform(0.3, 1.0, channels)
            out += np.cos(freq * np.pi * (v @ d) + phase)[:, None] * amp
        return out

    disp = smooth_field(1)[:, 0]
    disp = 1.0 + bump * (disp - disp.min()) / max(np.ptp(disp), 1e-6) - bump / 2
    verts = (v * disp[:, None] * radius).astype(np.float32)
    col = smooth_field(3)
    col = (col - col.min(0)) / np.maximum(np.ptp(col, axis=0), 1e-6)
    colors = (40.0 + 200.0 * col).astype(np.float32)
    return Mesh(vertices=verts, faces=base.faces.copy(), colors=colors)


def make_benchmark_classes(n: int = 13, subdiv: int = 3) -> dict:
    """The 13-class synthetic LINEMOD stand-in set: distinct asymmetric
    shapes/sizes/color fields (the LINEMOD set spans ~0.05-0.3 m diameters)."""
    out = {}
    for i in range(n):
        radius = 0.035 + 0.005 * i
        out[f"obj{i:02d}"] = make_bumpy_mesh(radius, subdiv, seed=100 + i,
                                             bump=0.25 + 0.02 * i)
    return out


def merge_meshes(meshes: list[Mesh]) -> Mesh:
    """Concatenate meshes into one (face ids offset per part; colors kept).
    Face ordering stays part-major, so consecutive face ids remain spatially
    coherent within each part (what csr_pack binning exploits)."""
    verts, faces, cols = [], [], []
    off = 0
    for m in meshes:
        verts.append(m.vertices)
        faces.append(m.faces + off)
        cols.append(m.colors)
        off += m.num_vertices
    return Mesh(
        vertices=np.concatenate(verts).astype(np.float32),
        faces=np.concatenate(faces).astype(np.int32),
        colors=np.concatenate(cols).astype(np.float32),
    )


def order_faces_for_binning(mesh: Mesh) -> Mesh:
    """Reorder faces into descending size buckets (factor-2 diameter bands,
    stable within a band) for the CSR rasterizer's tiered budgets.

    tune_raster_for_bank emits per-RUN budgets (RasterConfig.csr_tiers), so
    similar-size faces must be contiguous; stable sort keeps the original
    order inside each band, preserving the spatial coherence csr_pack's
    union-bbox binning relies on.  Only face ORDER changes — coverage and
    depth are identical; exact z-ties (shared edges of coplanar neighbors)
    may resolve to a different face id, which interpolates the same
    attributes on the shared edge.  Apply before MeshBank.from_meshes for
    heavy-tailed meshes (real scans, make_mixed_detail_mesh)."""
    c = mesh.vertices[mesh.faces]  # (F, 3, 3)
    d = np.maximum(
        np.linalg.norm(c[:, 0] - c[:, 1], axis=-1),
        np.maximum(
            np.linalg.norm(c[:, 1] - c[:, 2], axis=-1),
            np.linalg.norm(c[:, 2] - c[:, 0], axis=-1),
        ),
    )
    d_max = max(float(d.max()), 1e-12)
    band = np.ceil(np.log2(d_max / np.maximum(d, 1e-12))).astype(np.int64)
    order = np.argsort(band, kind="stable")
    out = Mesh(
        vertices=mesh.vertices, faces=mesh.faces[order].copy(),
        colors=mesh.colors, normals=mesh.normals, uv=mesh.uv, texture=mesh.texture,
    )
    return out


def make_mixed_detail_mesh(seed: int = 0) -> Mesh:
    """Heavy-tailed triangle-size scene mesh (~20.9k faces): an icosphere
    union mixing subdiv-5 (~2 px faces at the benchmark z — the LINEMOD
    bulk), subdiv-2 (~15-25 px) and subdiv-1 (~30-60 px) parts.  The uniform
    20k-face benchmark icosphere has near-constant face sizes, which is the
    FRIENDLY case for the CSR per-unit tile budget; real scan meshes mix
    scales (load_object_points.py:11-25-scale assets), and a few wide
    triangles both inflate the uniform per-unit budget (it is sized from the
    worst unit) and serialize long per-tile worklists.  This mesh is the
    benchmark stand-in for that regime (VERDICT r4 weak #5)."""
    rng = np.random.RandomState(seed)
    parts = [
        make_icosphere(0.045, 5),   # 20480 tiny faces
        make_icosphere(0.058, 2),   # 320 mid faces
        make_icosphere(0.072, 1),   # 80 wide faces
    ]
    # Offset the coarser shells so all three are partially visible (the big
    # faces must actually rasterize, not hide inside the detailed shell).
    parts[1].vertices = parts[1].vertices + np.float32([0.035, 0.012, 0.0])
    parts[2].vertices = parts[2].vertices + np.float32([-0.038, -0.015, 0.01])
    for i, m in enumerate(parts):
        hue = rng.uniform(80, 220, 3).astype(np.float32)
        m.colors = np.clip(m.colors * 0.5 + hue, 0, 255).astype(np.float32)
    return order_faces_for_binning(merge_meshes(parts))


def make_icosphere(radius: float = 0.05, subdiv: int = 2) -> Mesh:
    """Icosphere for rasterizer tests (many small triangles)."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array(
        [[-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
         [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
         [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], np.float64
    )
    faces = np.array(
        [[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
         [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
         [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
         [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]], np.int64
    )
    for _ in range(subdiv):
        edge_mid: dict[tuple[int, int], int] = {}
        new_faces = []
        verts_list = verts.tolist()

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in edge_mid:
                m = (np.asarray(verts_list[a]) + np.asarray(verts_list[b])) / 2
                verts_list.append(m.tolist())
                edge_mid[key] = len(verts_list) - 1
            return edge_mid[key]

        for f in faces:
            a, b, c = int(f[0]), int(f[1]), int(f[2])
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        verts = np.asarray(verts_list)
        faces = np.asarray(new_faces, np.int64)
    verts = verts / np.linalg.norm(verts, axis=1, keepdims=True) * radius
    colors = (verts / radius * 0.5 + 0.5) * 255.0
    return Mesh(
        vertices=verts.astype(np.float32),
        faces=faces.astype(np.int32),
        colors=colors.astype(np.float32),
    )
