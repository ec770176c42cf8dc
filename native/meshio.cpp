// Fast mesh / point-cloud file parsing for the host data path.
//
// The reference keeps its native code in CUDA (lib/flow_c/gpu_flow_kernel.cu)
// and checked-in Cython bindings; in the TPU rebuild all per-pixel compute
// lives on-device (Pallas/XLA), so the native layer moves to where the host
// actually spends time: parsing multi-megabyte OBJ / points.xyz assets at
// startup (MeshBank construction loads every class;
// deepim_tpu/render/mesh.py).  Exposed via a plain C ABI for ctypes.
//
// Two-pass API: *_counts sizes the output buffers, *_parse fills them.
// Returns 0 on success, negative error codes otherwise.

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct ObjData {
  std::vector<float> verts;    // 3 per vertex
  std::vector<float> colors;   // 3 per vertex (optional)
  std::vector<float> texs;     // 2 per texcoord
  std::vector<int> tris;       // 3 vertex ids per triangle
  std::vector<int> tri_tex;    // 3 texcoord ids per triangle (-1 if none)
  bool has_colors = false;
};

// Parse up to `max_vals` whitespace-separated floats from s; returns count.
int parse_floats(const char* s, float* out, int max_vals) {
  int n = 0;
  char* end = nullptr;
  while (n < max_vals) {
    while (*s == ' ' || *s == '\t') s++;
    if (*s == '\0' || *s == '\n' || *s == '\r') break;
    float v = strtof(s, &end);
    if (end == s) break;
    out[n++] = v;
    s = end;
  }
  return n;
}

// Parse a face token "v", "v/t", "v//n" or "v/t/n"; 1-based or negative.
bool parse_face_token(const char*& s, int n_verts, int n_texs, int* vi, int* ti) {
  while (*s == ' ' || *s == '\t') s++;
  if (*s == '\0' || *s == '\n' || *s == '\r') return false;
  char* end = nullptr;
  long v = strtol(s, &end, 10);
  if (end == s) return false;
  s = end;
  long t = 0;
  bool has_t = false;
  if (*s == '/') {
    s++;
    if (*s != '/' && *s != ' ' && *s != '\0') {
      t = strtol(s, &end, 10);
      has_t = end != s;
      s = end;
    }
    if (*s == '/') {  // skip normal index
      s++;
      strtol(s, &end, 10);
      s = end;
    }
  }
  *vi = v > 0 ? static_cast<int>(v - 1) : static_cast<int>(n_verts + v);
  *ti = has_t ? (t > 0 ? static_cast<int>(t - 1) : static_cast<int>(n_texs + t)) : -1;
  return true;
}

int parse_obj_file(const char* path, ObjData* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char line[4096];
  float vals[8];
  bool any_colors = false;
  while (fgets(line, sizeof(line), f)) {
    if (line[0] == 'v' && line[1] == ' ') {
      int n = parse_floats(line + 2, vals, 6);
      if (n < 3) continue;
      out->verts.push_back(vals[0]);
      out->verts.push_back(vals[1]);
      out->verts.push_back(vals[2]);
      if (n >= 6) {
        out->colors.push_back(vals[3]);
        out->colors.push_back(vals[4]);
        out->colors.push_back(vals[5]);
        any_colors = true;
      } else {
        out->colors.push_back(0.f);
        out->colors.push_back(0.f);
        out->colors.push_back(0.f);
      }
    } else if (line[0] == 'v' && line[1] == 't' && line[2] == ' ') {
      int n = parse_floats(line + 3, vals, 2);
      if (n < 2) continue;
      out->texs.push_back(vals[0]);
      out->texs.push_back(vals[1]);
    } else if (line[0] == 'f' && line[1] == ' ') {
      const char* s = line + 2;
      int vi[64], ti[64], cnt = 0;
      int nv = static_cast<int>(out->verts.size() / 3);
      int nt = static_cast<int>(out->texs.size() / 2);
      while (cnt < 64 && parse_face_token(s, nv, nt, &vi[cnt], &ti[cnt])) cnt++;
      for (int i = 1; i + 1 < cnt; i++) {  // fan triangulation
        out->tris.push_back(vi[0]);
        out->tris.push_back(vi[i]);
        out->tris.push_back(vi[i + 1]);
        out->tri_tex.push_back(ti[0]);
        out->tri_tex.push_back(ti[i]);
        out->tri_tex.push_back(ti[i + 1]);
      }
    }
  }
  fclose(f);
  out->has_colors = any_colors;
  return 0;
}

}  // namespace

extern "C" {

// Opaque-handle API so counts and data come from one parse.
void* meshio_obj_open(const char* path) {
  ObjData* d = new ObjData();
  if (parse_obj_file(path, d) != 0) {
    delete d;
    return nullptr;
  }
  return d;
}

int meshio_obj_counts(void* handle, int* n_verts, int* n_texs, int* n_tris, int* has_colors) {
  if (!handle) return -1;
  ObjData* d = static_cast<ObjData*>(handle);
  *n_verts = static_cast<int>(d->verts.size() / 3);
  *n_texs = static_cast<int>(d->texs.size() / 2);
  *n_tris = static_cast<int>(d->tris.size() / 3);
  *has_colors = d->has_colors ? 1 : 0;
  return 0;
}

int meshio_obj_fill(void* handle, float* verts, float* colors, float* texs, int* tris, int* tri_tex) {
  if (!handle) return -1;
  ObjData* d = static_cast<ObjData*>(handle);
  memcpy(verts, d->verts.data(), d->verts.size() * sizeof(float));
  memcpy(colors, d->colors.data(), d->colors.size() * sizeof(float));
  if (!d->texs.empty()) memcpy(texs, d->texs.data(), d->texs.size() * sizeof(float));
  memcpy(tris, d->tris.data(), d->tris.size() * sizeof(int));
  memcpy(tri_tex, d->tri_tex.data(), d->tri_tex.size() * sizeof(int));
  return 0;
}

void meshio_obj_close(void* handle) {
  delete static_cast<ObjData*>(handle);
}

// points.xyz: N rows of >= 3 floats (lib/pair_matching/load_object_points.py).
int meshio_xyz_count(const char* path, int* n_points) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char line[1024];
  int n = 0;
  while (fgets(line, sizeof(line), f)) {
    float vals[3];
    if (parse_floats(line, vals, 3) >= 3) n++;
  }
  fclose(f);
  *n_points = n;
  return 0;
}

int meshio_xyz_fill(const char* path, float* out, int n_points) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char line[1024];
  int n = 0;
  while (n < n_points && fgets(line, sizeof(line), f)) {
    float vals[3];
    if (parse_floats(line, vals, 3) >= 3) {
      memcpy(out + 3 * n, vals, 3 * sizeof(float));
      n++;
    }
  }
  fclose(f);
  return n == n_points ? 0 : -2;
}

}  // extern "C"
