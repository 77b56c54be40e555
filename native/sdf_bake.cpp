// sdf_bake — native mesh→SDF grid baker.
//
// The TPU build's counterpart of the reference's offline native asset
// pipeline: kaolin's CUDA point_to_mesh_distance + check_sign
// (utils/mesh2sdf.py:201-237) and the ManifoldPlus watertighting binary
// (utils/mesh2sdf.py:158-167).  One tool, no CUDA, no watertight
// requirement:
//
//   * exact point-triangle distances through an AABB BVH;
//   * sign from the generalized winding number (Jacobson et al. 2013),
//     robust on open/dirty meshes — which is why ManifoldPlus becomes
//     unnecessary;
//   * output: NumPy .npy (float32, C-order, shape [X, Y, Z]) plus a JSON
//     sidecar {"bbox_min": [...], "voxel_size": v} — the same grid format
//     the JAX ops (partmanip_tpu/ops/sdf.py) and the reference's .npy
//     caches use.
//
// Build:  make -C native        (produces native/sdf_bake)
// Usage:  sdf_bake input.obj output.npy [voxel_size=0.002] [trunc=0.08]
//
// Supports ASCII OBJ (v/f lines, polygonal faces fan-triangulated) and
// binary STL.

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

struct V3 {
  float x = 0, y = 0, z = 0;
  V3() = default;
  V3(float a, float b, float c) : x(a), y(b), z(c) {}
  V3 operator-(const V3& o) const { return {x - o.x, y - o.y, z - o.z}; }
  V3 operator+(const V3& o) const { return {x + o.x, y + o.y, z + o.z}; }
  V3 operator*(float s) const { return {x * s, y * s, z * s}; }
};
static inline float dot(const V3& a, const V3& b) {
  return a.x * b.x + a.y * b.y + a.z * b.z;
}
static inline V3 cross(const V3& a, const V3& b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z,
          a.x * b.y - a.y * b.x};
}
static inline float norm(const V3& a) { return std::sqrt(dot(a, a)); }
static inline V3 vmin(const V3& a, const V3& b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
static inline V3 vmax(const V3& a, const V3& b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}

struct Tri {
  V3 a, b, c;
};

// ---------------------------------------------------------------------------
// mesh loading
// ---------------------------------------------------------------------------

static bool load_obj(const std::string& path, std::vector<Tri>& tris) {
  std::ifstream f(path);
  if (!f) return false;
  std::vector<V3> verts;
  std::string line;
  while (std::getline(f, line)) {
    if (line.size() < 2) continue;
    std::istringstream ss(line);
    std::string tag;
    ss >> tag;
    if (tag == "v") {
      V3 v;
      ss >> v.x >> v.y >> v.z;
      verts.push_back(v);
    } else if (tag == "f") {
      std::vector<int> idx;
      std::string tok;
      while (ss >> tok) {
        // "i", "i/j", "i//k", "i/j/k"
        idx.push_back(std::atoi(tok.c_str()));
      }
      for (size_t k = 2; k < idx.size(); ++k) {
        auto at = [&](int i) -> V3 {
          int j = i > 0 ? i - 1 : (int)verts.size() + i;
          return verts[j];
        };
        tris.push_back({at(idx[0]), at(idx[k - 1]), at(idx[k])});
      }
    }
  }
  return !tris.empty();
}

static bool load_stl(const std::string& path, std::vector<Tri>& tris) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  char header[80];
  f.read(header, 80);
  uint32_t n = 0;
  f.read(reinterpret_cast<char*>(&n), 4);
  if (!f || n == 0 || n > 50'000'000) return false;
  tris.reserve(n);
  for (uint32_t i = 0; i < n; ++i) {
    float buf[12];
    uint16_t attr;
    f.read(reinterpret_cast<char*>(buf), 48);
    f.read(reinterpret_cast<char*>(&attr), 2);
    if (!f) return false;
    tris.push_back({{buf[3], buf[4], buf[5]},
                    {buf[6], buf[7], buf[8]},
                    {buf[9], buf[10], buf[11]}});
  }
  return true;
}

// ---------------------------------------------------------------------------
// BVH over triangles (median split)
// ---------------------------------------------------------------------------

struct Node {
  V3 lo, hi;
  int left = -1, right = -1;  // children, or
  int start = 0, count = 0;   // leaf triangle range
};

struct BVH {
  std::vector<Node> nodes;
  std::vector<int> order;
  const std::vector<Tri>* tris = nullptr;

  void build(const std::vector<Tri>& t) {
    tris = &t;
    order.resize(t.size());
    for (size_t i = 0; i < t.size(); ++i) order[i] = (int)i;
    nodes.reserve(2 * t.size());
    build_node(0, (int)t.size());
  }

  int build_node(int start, int count) {
    Node n;
    n.lo = {1e30f, 1e30f, 1e30f};
    n.hi = {-1e30f, -1e30f, -1e30f};
    for (int i = start; i < start + count; ++i) {
      const Tri& tr = (*tris)[order[i]];
      n.lo = vmin(n.lo, vmin(tr.a, vmin(tr.b, tr.c)));
      n.hi = vmax(n.hi, vmax(tr.a, vmax(tr.b, tr.c)));
    }
    int id = (int)nodes.size();
    nodes.push_back(n);
    if (count <= 4) {
      nodes[id].start = start;
      nodes[id].count = count;
      return id;
    }
    V3 ext = n.hi - n.lo;
    int axis = ext.x > ext.y ? (ext.x > ext.z ? 0 : 2)
                             : (ext.y > ext.z ? 1 : 2);
    auto centroid = [&](int ti) {
      const Tri& tr = (*tris)[ti];
      V3 c = (tr.a + tr.b + tr.c) * (1.0f / 3.0f);
      return axis == 0 ? c.x : axis == 1 ? c.y : c.z;
    };
    std::nth_element(order.begin() + start, order.begin() + start + count / 2,
                     order.begin() + start + count,
                     [&](int x, int y) { return centroid(x) < centroid(y); });
    int mid = count / 2;
    int l = build_node(start, mid);
    int r = build_node(start + mid, count - mid);
    nodes[id].left = l;
    nodes[id].right = r;
    nodes[id].count = 0;
    return id;
  }

  static float box_dist_sq(const Node& n, const V3& p) {
    float d = 0;
    auto ax = [&](float v, float lo, float hi) {
      float e = v < lo ? lo - v : (v > hi ? v - hi : 0);
      d += e * e;
    };
    ax(p.x, n.lo.x, n.hi.x);
    ax(p.y, n.lo.y, n.hi.y);
    ax(p.z, n.lo.z, n.hi.z);
    return d;
  }

  float closest_sq(const V3& p) const {
    float best = 1e30f;
    std::array<int, 128> stack;
    int sp = 0;
    stack[sp++] = 0;
    while (sp) {
      int id = stack[--sp];
      const Node& n = nodes[id];
      if (box_dist_sq(n, p) >= best) continue;
      if (n.count > 0) {
        for (int i = n.start; i < n.start + n.count; ++i)
          best = std::min(best, tri_dist_sq((*tris)[order[i]], p));
      } else {
        // visit nearer child first
        float dl = box_dist_sq(nodes[n.left], p);
        float dr = box_dist_sq(nodes[n.right], p);
        if (dl < dr) {
          if (sp < 126) stack[sp++] = n.right;
          stack[sp++] = n.left;
        } else {
          if (sp < 126) stack[sp++] = n.left;
          stack[sp++] = n.right;
        }
      }
    }
    return best;
  }

  static float tri_dist_sq(const Tri& t, const V3& p) {
    // Ericson, Real-Time Collision Detection §5.1.5
    V3 ab = t.b - t.a, ac = t.c - t.a, ap = p - t.a;
    float d1 = dot(ab, ap), d2 = dot(ac, ap);
    if (d1 <= 0 && d2 <= 0) return dot(p - t.a, p - t.a);
    V3 bp = p - t.b;
    float d3 = dot(ab, bp), d4 = dot(ac, bp);
    if (d3 >= 0 && d4 <= d3) return dot(p - t.b, p - t.b);
    float vc = d1 * d4 - d3 * d2;
    if (vc <= 0 && d1 >= 0 && d3 <= 0) {
      float v = d1 / (d1 - d3);
      V3 q = t.a + ab * v;
      return dot(p - q, p - q);
    }
    V3 cp = p - t.c;
    float d5 = dot(ab, cp), d6 = dot(ac, cp);
    if (d6 >= 0 && d5 <= d6) return dot(p - t.c, p - t.c);
    float vb = d5 * d2 - d1 * d6;
    if (vb <= 0 && d2 >= 0 && d6 <= 0) {
      float w = d2 / (d2 - d6);
      V3 q = t.a + ac * w;
      return dot(p - q, p - q);
    }
    float va = d3 * d6 - d5 * d4;
    if (va <= 0 && (d4 - d3) >= 0 && (d5 - d6) >= 0) {
      float w = (d4 - d3) / ((d4 - d3) + (d5 - d6));
      V3 q = t.b + (t.c - t.b) * w;
      return dot(p - q, p - q);
    }
    float denom = 1.0f / (va + vb + vc);
    float v = vb * denom, w = vc * denom;
    V3 q = t.a + ab * v + ac * w;
    return dot(p - q, p - q);
  }
};

// generalized winding number (exact sum; could be BVH-accelerated with
// dipole approximations — exact is fine at bake scale)
static double winding(const std::vector<Tri>& tris, const V3& p) {
  double w = 0;
  for (const Tri& t : tris) {
    V3 a = t.a - p, b = t.b - p, c = t.c - p;
    double la = norm(a), lb = norm(b), lc = norm(c);
    double num = dot(a, cross(b, c));
    double den = la * lb * lc + (double)dot(a, b) * lc +
                 (double)dot(b, c) * la + (double)dot(c, a) * lb;
    w += 2.0 * std::atan2(num, den);
  }
  return w / (4.0 * M_PI);
}

// ---------------------------------------------------------------------------
// .npy writer (float32, C order)
// ---------------------------------------------------------------------------

static void write_npy(const std::string& path, const std::vector<float>& data,
                      int nx, int ny, int nz) {
  std::ostringstream hdr;
  hdr << "{'descr': '<f4', 'fortran_order': False, 'shape': (" << nx << ", "
      << ny << ", " << nz << "), }";
  std::string h = hdr.str();
  size_t total = 10 + h.size() + 1;
  size_t pad = (64 - total % 64) % 64;
  h += std::string(pad, ' ');
  h += '\n';
  uint16_t hlen = (uint16_t)h.size();

  std::ofstream f(path, std::ios::binary);
  f.write("\x93NUMPY\x01\x00", 8);
  f.write(reinterpret_cast<char*>(&hlen), 2);
  f.write(h.data(), h.size());
  f.write(reinterpret_cast<const char*>(data.data()),
          data.size() * sizeof(float));
}

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr,
                 "usage: sdf_bake input.{obj,stl} output.npy "
                 "[voxel_size=0.002] [trunc=0.08]\n");
    return 2;
  }
  std::string in = argv[1], out = argv[2];
  float voxel = argc > 3 ? std::atof(argv[3]) : 0.002f;
  float trunc = argc > 4 ? std::atof(argv[4]) : 0.08f;

  std::vector<Tri> tris;
  bool ok = in.size() > 4 && in.substr(in.size() - 4) == ".stl"
                ? load_stl(in, tris)
                : load_obj(in, tris);
  if (!ok) {
    std::fprintf(stderr, "failed to load %s\n", in.c_str());
    return 1;
  }

  V3 lo{1e30f, 1e30f, 1e30f}, hi{-1e30f, -1e30f, -1e30f};
  for (const Tri& t : tris) {
    lo = vmin(lo, vmin(t.a, vmin(t.b, t.c)));
    hi = vmax(hi, vmax(t.a, vmax(t.b, t.c)));
  }
  V3 margin{2 * trunc, 2 * trunc, 2 * trunc};
  lo = lo - margin;
  hi = hi + margin;
  int nx = (int)std::ceil((hi.x - lo.x) / voxel);
  int ny = (int)std::ceil((hi.y - lo.y) / voxel);
  int nz = (int)std::ceil((hi.z - lo.z) / voxel);

  BVH bvh;
  bvh.build(tris);

  std::vector<float> grid((size_t)nx * ny * nz);
#pragma omp parallel for schedule(dynamic, 4)
  for (int i = 0; i < nx; ++i) {
    for (int j = 0; j < ny; ++j) {
      for (int k = 0; k < nz; ++k) {
        V3 p{lo.x + i * voxel, lo.y + j * voxel, lo.z + k * voxel};
        float d = std::sqrt(bvh.closest_sq(p));
        float s = 1.0f;
        if (d < trunc) {  // sign only matters inside the truncation band
          s = winding(tris, p) > 0.5 ? -1.0f : 1.0f;
        }
        float v = std::min(std::max(s * d, -trunc), trunc);
        grid[((size_t)i * ny + j) * nz + k] = v;
      }
    }
  }

  write_npy(out, grid, nx, ny, nz);
  std::string meta = out.substr(0, out.find_last_of('.')) + ".json";
  std::ofstream mf(meta);
  mf << "{\"bbox_min\": [" << lo.x << ", " << lo.y << ", " << lo.z
     << "], \"voxel_size\": " << voxel << ", \"shape\": [" << nx << ", " << ny
     << ", " << nz << "]}\n";
  std::printf("baked %zu tris -> %dx%dx%d grid (%s)\n", tris.size(), nx, ny,
              nz, out.c_str());
  return 0;
}
