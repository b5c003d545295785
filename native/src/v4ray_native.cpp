// Native host-side runtime for ray_tracing_tpu: OBJ parsing, LBVH
// construction, and BMP output.
//
// The reference implements its host pipeline in Rust (tobj mesh loading,
// src/hittables/obj.rs; binned-SAH BVH build, src/bvh/bvh.rs; the image
// crate's BMP writer, src/main.rs:65-79).  The TPU framework keeps the
// same split: device compute is JAX/XLA, while the scene-compile path has
// this C++ implementation (ctypes ABI, no pybind11 dependency) with a
// pure-Python fallback producing identical results (tests assert parity).
//
// Build: `make -C native` -> libv4raynative.so

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

extern "C" {

// --------------------------------------------------------------------
// OBJ loading (semantics of reference obj.rs + tobj triangulate=true:
// fan triangulation, per-face index triples, smooth vertex normals when
// the file has none)
// --------------------------------------------------------------------

struct ObjModel {
  std::string name;
  std::vector<int64_t> indices;           // (F*3) position indices
  std::vector<int64_t> normal_indices;    // (F*3) or empty
  std::vector<int64_t> texcoord_indices;  // (F*3) or empty
};

struct ObjFile {
  std::vector<float> positions;  // (V*3)
  std::vector<float> normals;    // (VN*3)
  std::vector<float> texcoords;  // (VT*2)
  std::vector<ObjModel> models;
};

static int64_t resolve_index(long idx, size_t count) {
  return idx > 0 ? idx - 1 : static_cast<int64_t>(count) + idx;
}

void* rt_obj_load(const char* path) {
  std::ifstream in(path);
  if (!in) return nullptr;
  auto* obj = new ObjFile();
  obj->models.emplace_back();

  std::string line;
  // per-corner scratch: (position, texcoord, normal) triples
  std::vector<std::array<int64_t, 3>> corners;
  while (std::getline(in, line)) {
    if (line.empty() || line[0] == '#') continue;
    std::istringstream ss(line);
    std::string tag;
    ss >> tag;
    if (tag == "v") {
      float x, y, z;
      ss >> x >> y >> z;
      obj->positions.insert(obj->positions.end(), {x, y, z});
    } else if (tag == "vn") {
      float x, y, z;
      ss >> x >> y >> z;
      obj->normals.insert(obj->normals.end(), {x, y, z});
    } else if (tag == "vt") {
      float u, v;
      ss >> u >> v;
      obj->texcoords.insert(obj->texcoords.end(), {u, v});
    } else if (tag == "o" || tag == "g") {
      std::string name;
      ss >> name;
      if (!obj->models.back().indices.empty()) {
        obj->models.emplace_back();
        obj->models.back().name = name;
      } else {
        obj->models.back().name = name;
      }
    } else if (tag == "f") {
      corners.clear();
      std::string spec;
      while (ss >> spec) {
        long vi = 0, ti = 0, ni = 0;
        bool has_t = false, has_n = false;
        size_t p1 = spec.find('/');
        if (p1 == std::string::npos) {
          vi = std::stol(spec);
        } else {
          vi = std::stol(spec.substr(0, p1));
          size_t p2 = spec.find('/', p1 + 1);
          if (p2 == std::string::npos) {
            if (p1 + 1 < spec.size()) {
              ti = std::stol(spec.substr(p1 + 1));
              has_t = true;
            }
          } else {
            if (p2 > p1 + 1) {
              ti = std::stol(spec.substr(p1 + 1, p2 - p1 - 1));
              has_t = true;
            }
            if (p2 + 1 < spec.size()) {
              ni = std::stol(spec.substr(p2 + 1));
              has_n = true;
            }
          }
        }
        corners.push_back({
            resolve_index(vi, obj->positions.size() / 3),
            has_t ? resolve_index(ti, obj->texcoords.size() / 2) : -1,
            has_n ? resolve_index(ni, obj->normals.size() / 3) : -1,
        });
      }
      auto& m = obj->models.back();
      for (size_t a = 1; a + 1 < corners.size(); ++a) {
        const std::array<int64_t, 3>* tri[3] = {&corners[0], &corners[a],
                                                &corners[a + 1]};
        // keep the per-corner index arrays ALIGNED with indices even
        // for faces that omit vn/vt (-1 sentinel); a mixed file would
        // otherwise pair face i with face j's normals or read past the
        // end of the vector
        for (auto* c : tri) m.indices.push_back((*c)[0]);
        for (auto* c : tri) m.normal_indices.push_back((*c)[2]);
        for (auto* c : tri) m.texcoord_indices.push_back((*c)[1]);
      }
    }
  }
  // drop an empty trailing model
  while (!obj->models.empty() && obj->models.back().indices.empty())
    obj->models.pop_back();
  if (obj->models.empty()) obj->models.emplace_back();
  return obj;
}

void rt_obj_free(void* handle) { delete static_cast<ObjFile*>(handle); }

int rt_obj_n_models(void* handle) {
  return static_cast<int>(static_cast<ObjFile*>(handle)->models.size());
}

const char* rt_obj_model_name(void* handle, int model) {
  return static_cast<ObjFile*>(handle)->models[model].name.c_str();
}

int64_t rt_obj_n_triangles(void* handle, int model) {
  return static_cast<ObjFile*>(handle)->models[model].indices.size() / 3;
}

// Fill per-face vertex positions (F,3,3), shading normals (F,3,3) and
// uvs (F,3,2) for one model; smooth vertex normals computed exactly as
// reference obj.rs:35-38, 64-70, 86-97 when the file has none.
void rt_obj_fill(void* handle, int model, float* pts, float* nrm, float* uv) {
  auto* obj = static_cast<ObjFile*>(handle);
  auto& m = obj->models[model];
  const int64_t f = m.indices.size() / 3;

  for (int64_t i = 0; i < f * 3; ++i) {
    const int64_t vi = m.indices[i];
    pts[i * 3 + 0] = obj->positions[vi * 3 + 0];
    pts[i * 3 + 1] = obj->positions[vi * 3 + 1];
    pts[i * 3 + 2] = obj->positions[vi * 3 + 2];
  }

  // use file normals only when EVERY corner has one (the reference's
  // tobj path is all-or-nothing per mesh, obj.rs:64-70); any -1 falls
  // back to smooth vertex normals for the whole model
  bool all_n = !m.normal_indices.empty();
  for (int64_t i = 0; all_n && i < f * 3; ++i)
    all_n = m.normal_indices[i] >= 0;
  if (all_n) {
    for (int64_t i = 0; i < f * 3; ++i) {
      const int64_t ni = m.normal_indices[i];
      nrm[i * 3 + 0] = obj->normals[ni * 3 + 0];
      nrm[i * 3 + 1] = obj->normals[ni * 3 + 1];
      nrm[i * 3 + 2] = obj->normals[ni * 3 + 2];
    }
  } else {
    // accumulate per-vertex normals from (p2-p1) x (p3-p2), normalized
    // per face, then re-normalized per vertex
    std::vector<double> vsum(obj->positions.size(), 0.0);
    for (int64_t t = 0; t < f; ++t) {
      const float* p1 = pts + (t * 3 + 0) * 3;
      const float* p2 = pts + (t * 3 + 1) * 3;
      const float* p3 = pts + (t * 3 + 2) * 3;
      double e1[3] = {p2[0] - p1[0], p2[1] - p1[1], p2[2] - p1[2]};
      double e2[3] = {p3[0] - p2[0], p3[1] - p2[1], p3[2] - p2[2]};
      double n[3] = {e1[1] * e2[2] - e1[2] * e2[1],
                     e1[2] * e2[0] - e1[0] * e2[2],
                     e1[0] * e2[1] - e1[1] * e2[0]};
      double len = std::sqrt(n[0] * n[0] + n[1] * n[1] + n[2] * n[2]);
      if (len < 1e-30) len = 1e-30;
      for (int k = 0; k < 3; ++k) n[k] /= len;
      for (int c = 0; c < 3; ++c) {
        const int64_t vi = m.indices[t * 3 + c];
        for (int k = 0; k < 3; ++k) vsum[vi * 3 + k] += n[k];
      }
    }
    for (size_t vi = 0; vi < obj->positions.size() / 3; ++vi) {
      double len = std::sqrt(vsum[vi * 3] * vsum[vi * 3] +
                             vsum[vi * 3 + 1] * vsum[vi * 3 + 1] +
                             vsum[vi * 3 + 2] * vsum[vi * 3 + 2]);
      if (len < 1e-30) len = 1e-30;
      for (int k = 0; k < 3; ++k) vsum[vi * 3 + k] /= len;
    }
    for (int64_t i = 0; i < f * 3; ++i) {
      const int64_t vi = m.indices[i];
      nrm[i * 3 + 0] = static_cast<float>(vsum[vi * 3 + 0]);
      nrm[i * 3 + 1] = static_cast<float>(vsum[vi * 3 + 1]);
      nrm[i * 3 + 2] = static_cast<float>(vsum[vi * 3 + 2]);
    }
  }

  std::memset(uv, 0, sizeof(float) * f * 3 * 2);
  for (int64_t i = 0; i < static_cast<int64_t>(m.texcoord_indices.size()); ++i) {
    const int64_t ti = m.texcoord_indices[i];
    if (ti < 0) continue;  // corner without vt keeps (0, 0)
    uv[i * 2 + 0] = obj->texcoords[ti * 2 + 0];
    uv[i * 2 + 1] = obj->texcoords[ti * 2 + 1];
  }
}

// --------------------------------------------------------------------
// LBVH build (same algorithm as ops/bvh.py: Morton sort by centroid,
// median-split binary tree in DFS pre-order, skip links)
// --------------------------------------------------------------------

static uint64_t expand_bits(uint64_t v) {
  v = (v | (v << 16)) & 0x030000FFull;
  v = (v | (v << 8)) & 0x0300F00Full;
  v = (v | (v << 4)) & 0x030C30C3ull;
  v = (v | (v << 2)) & 0x09249249ull;
  return v;
}

// Morton-sort permutation of triangle AABBs; out_order gets n indices.
void rt_morton_order(const float* tmin, const float* tmax, int64_t n,
                     int32_t* out_order) {
  std::vector<double> cx(n), cy(n), cz(n);
  double lo[3] = {1e300, 1e300, 1e300}, hi[3] = {-1e300, -1e300, -1e300};
  for (int64_t i = 0; i < n; ++i) {
    double c[3];
    for (int k = 0; k < 3; ++k) {
      c[k] = 0.5 * (static_cast<double>(tmin[i * 3 + k]) + tmax[i * 3 + k]);
      lo[k] = std::min(lo[k], c[k]);
      hi[k] = std::max(hi[k], c[k]);
    }
    cx[i] = c[0]; cy[i] = c[1]; cz[i] = c[2];
  }
  std::vector<uint64_t> code(n);
  for (int64_t i = 0; i < n; ++i) {
    uint64_t q[3];
    const double c[3] = {cx[i], cy[i], cz[i]};
    for (int k = 0; k < 3; ++k) {
      double span = hi[k] - lo[k];
      if (span < 1e-30) span = 1e-30;
      double f = (c[k] - lo[k]) / span * 1024.0;
      long v = static_cast<long>(f);
      q[k] = static_cast<uint64_t>(std::min(std::max(v, 0L), 1023L));
    }
    code[i] = (expand_bits(q[0]) << 2) | (expand_bits(q[1]) << 1) |
              expand_bits(q[2]);
  }
  std::vector<int32_t> order(n);
  for (int64_t i = 0; i < n; ++i) order[i] = static_cast<int32_t>(i);
  std::stable_sort(order.begin(), order.end(),
                   [&](int32_t a, int32_t b) { return code[a] < code[b]; });
  std::memcpy(out_order, order.data(), sizeof(int32_t) * n);
}

// Build from AABBs already in Morton order.  Buffers sized for the
// caller by rt_lbvh_max_nodes(n, leaf_size).  Returns node count.
int64_t rt_lbvh_max_nodes(int64_t n, int32_t leaf_size) {
  (void)leaf_size;
  return std::max<int64_t>(2 * n - 1, 1);
}

int64_t rt_lbvh_build(const float* tmin, const float* tmax, int64_t n,
                      int32_t leaf_size, float* node_min, float* node_max,
                      int32_t* miss_link, int32_t* leaf_start,
                      int32_t* leaf_count) {
  struct Range { int64_t lo, hi; };
  std::vector<Range> stack{{0, n}};
  std::vector<Range> node_ranges;
  int64_t m = 0;
  while (!stack.empty()) {
    Range r = stack.back();
    stack.pop_back();
    float mn[3] = {1e30f, 1e30f, 1e30f}, mx[3] = {-1e30f, -1e30f, -1e30f};
    for (int64_t i = r.lo; i < r.hi; ++i)
      for (int k = 0; k < 3; ++k) {
        mn[k] = std::min(mn[k], tmin[i * 3 + k]);
        mx[k] = std::max(mx[k], tmax[i * 3 + k]);
      }
    for (int k = 0; k < 3; ++k) {
      node_min[m * 3 + k] = mn[k];
      node_max[m * 3 + k] = mx[k];
    }
    node_ranges.push_back(r);
    if (r.hi - r.lo <= leaf_size) {
      leaf_start[m] = static_cast<int32_t>(r.lo);
      leaf_count[m] = static_cast<int32_t>(r.hi - r.lo);
    } else {
      leaf_start[m] = -1;
      leaf_count[m] = 0;
      const int64_t mid = (r.lo + r.hi) / 2;
      stack.push_back({mid, r.hi});  // right pushed first:
      stack.push_back({r.lo, mid});  // DFS pre-order visits left next
    }
    ++m;
  }
  // skip links via one monotone stack pass (see ops/bvh.py)
  std::vector<std::pair<int64_t, int64_t>> open;  // (hi_bound, node)
  for (int64_t i = 0; i < m; ++i) {
    while (!open.empty() && open.back().first <= node_ranges[i].lo) {
      miss_link[open.back().second] = static_cast<int32_t>(i);
      open.pop_back();
    }
    open.emplace_back(node_ranges[i].hi, i);
  }
  while (!open.empty()) {
    miss_link[open.back().second] = static_cast<int32_t>(m);
    open.pop_back();
  }
  return m;
}

// --------------------------------------------------------------------
// BMP writer (24-bit bottom-up, the format the reference CLI emits via
// the image crate, src/main.rs:65-79)
// --------------------------------------------------------------------

int rt_write_bmp(const char* path, const uint8_t* rgb, int32_t width,
                 int32_t height) {
  const int32_t row = (width * 3 + 3) & ~3;  // 4-byte aligned rows
  const uint32_t data_size = row * height;
  const uint32_t file_size = 54 + data_size;
  uint8_t header[54] = {0};
  header[0] = 'B'; header[1] = 'M';
  std::memcpy(header + 2, &file_size, 4);
  const uint32_t off = 54; std::memcpy(header + 10, &off, 4);
  const uint32_t ih = 40; std::memcpy(header + 14, &ih, 4);
  std::memcpy(header + 18, &width, 4);
  std::memcpy(header + 22, &height, 4);
  const uint16_t planes = 1; std::memcpy(header + 26, &planes, 2);
  const uint16_t bpp = 24; std::memcpy(header + 28, &bpp, 2);
  std::memcpy(header + 34, &data_size, 4);

  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  std::fwrite(header, 1, 54, f);
  std::vector<uint8_t> line(row, 0);
  for (int32_t y = height - 1; y >= 0; --y) {  // bottom-up
    for (int32_t x = 0; x < width; ++x) {
      const uint8_t* px = rgb + (y * width + x) * 3;
      line[x * 3 + 0] = px[2];  // BGR
      line[x * 3 + 1] = px[1];
      line[x * 3 + 2] = px[0];
    }
    std::fwrite(line.data(), 1, row, f);
  }
  std::fclose(f);
  return 0;
}

}  // extern "C"
