// Mesh -> occupancy-grid voxelizer (C++, exposed via a C ABI for ctypes).
//
// The asset-ingestion path of the framework: converts triangle meshes
// (Houses3K-style OBJ buildings; the reference loads them through Isaac Gym's
// URDF/mesh pipeline, gennbv/env/env_train_gennbv.py:21-54) into the dense
// occupancy grids consumed by the TPU depth renderer and the GT-surface
// derivation (gennbv_tpu/env/scene.py).
//
// Algorithm:
//  1. surface rasterization: each triangle is super-sampled on a barycentric
//     lattice fine enough that adjacent samples are < half a voxel apart;
//     every sample marks its voxel.  Guarantees no thin-wall gaps.
//  2. solid fill: per (x, y) voxel column, cast a +z ray through all
//     triangles (Moller-Trumbore), sort crossings, fill between odd/even
//     pairs (parity rule; robust for watertight meshes, degrades gracefully
//     otherwise because the surface shell from step 1 is always present).
//
// Build:  g++ -O3 -shared -fPIC -o libvoxelizer.so voxelizer.cpp
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Vec3 {
  double x, y, z;
};

static inline Vec3 sub(const Vec3& a, const Vec3& b) {
  return {a.x - b.x, a.y - b.y, a.z - b.z};
}
static inline Vec3 cross(const Vec3& a, const Vec3& b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
static inline double dot(const Vec3& a, const Vec3& b) {
  return a.x * b.x + a.y * b.y + a.z * b.z;
}

struct Mesh {
  std::vector<Vec3> verts;
  std::vector<int> tris;  // 3 indices per triangle
};

bool load_obj(const char* path, Mesh* mesh) {
  FILE* f = fopen(path, "r");
  if (!f) return false;
  char line[1024];
  while (fgets(line, sizeof(line), f)) {
    if (line[0] == 'v' && (line[1] == ' ' || line[1] == '\t')) {
      Vec3 v;
      if (sscanf(line + 1, "%lf %lf %lf", &v.x, &v.y, &v.z) == 3)
        mesh->verts.push_back(v);
    } else if (line[0] == 'f' && (line[1] == ' ' || line[1] == '\t')) {
      // faces may be "f a b c", "f a/at b/bt c/ct", "f a//an ..."; may be
      // polygons -> fan-triangulate
      std::vector<int> idx;
      char* p = line + 1;
      while (*p) {
        while (*p == ' ' || *p == '\t') p++;
        if (*p == '\0' || *p == '\n' || *p == '\r') break;
        long v = strtol(p, &p, 10);
        if (v < 0) v = (long)mesh->verts.size() + v + 1;
        if (v > 0) idx.push_back((int)v - 1);
        while (*p && *p != ' ' && *p != '\t' && *p != '\n') p++;  // skip /vt/vn
      }
      for (size_t k = 2; k < idx.size(); ++k) {
        mesh->tris.push_back(idx[0]);
        mesh->tris.push_back(idx[k - 1]);
        mesh->tris.push_back(idx[k]);
      }
    }
  }
  fclose(f);
  return !mesh->verts.empty() && !mesh->tris.empty();
}

// Moller-Trumbore; ray (origin o, direction +z). Returns t or NaN.
double ray_z_triangle(const Vec3& o, const Vec3& v0, const Vec3& v1,
                      const Vec3& v2) {
  const Vec3 dir = {0.0, 0.0, 1.0};
  Vec3 e1 = sub(v1, v0), e2 = sub(v2, v0);
  Vec3 pvec = cross(dir, e2);
  double det = dot(e1, pvec);
  if (std::fabs(det) < 1e-12) return NAN;
  double inv_det = 1.0 / det;
  Vec3 tvec = sub(o, v0);
  double u = dot(tvec, pvec) * inv_det;
  if (u < 0.0 || u > 1.0) return NAN;
  Vec3 qvec = cross(tvec, e1);
  double v = dot(dir, qvec) * inv_det;
  if (v < 0.0 || u + v > 1.0) return NAN;
  return dot(e2, qvec) * inv_det;
}

}  // namespace

extern "C" {

// Voxelize mesh at `path` into out_occ[res^3] (C-order x, y, z).
// If *box_lo == *box_hi (degenerate box), the mesh bounding box + 5% padding
// is used and written back into box_lo/box_hi.
// scale/offset: world = vertex * scale + offset (applied before voxelizing).
// solid: 1 -> parity fill; 0 -> surface shell only.
// Returns 0 on success.
int voxelize_obj(const char* path, int res, double scale,
                 const double* offset_xyz, double* box_lo, double* box_hi,
                 int solid, uint8_t* out_occ) {
  Mesh mesh;
  if (!load_obj(path, &mesh)) return 1;
  for (auto& v : mesh.verts) {
    v.x = v.x * scale + offset_xyz[0];
    v.y = v.y * scale + offset_xyz[1];
    v.z = v.z * scale + offset_xyz[2];
  }

  bool auto_box = true;
  for (int i = 0; i < 3; ++i)
    if (box_lo[i] != box_hi[i]) auto_box = false;
  if (auto_box) {
    Vec3 lo = mesh.verts[0], hi = mesh.verts[0];
    for (const auto& v : mesh.verts) {
      lo.x = std::min(lo.x, v.x); hi.x = std::max(hi.x, v.x);
      lo.y = std::min(lo.y, v.y); hi.y = std::max(hi.y, v.y);
      lo.z = std::min(lo.z, v.z); hi.z = std::max(hi.z, v.z);
    }
    double pad = 0.05 * std::max({hi.x - lo.x, hi.y - lo.y, hi.z - lo.z});
    box_lo[0] = lo.x - pad; box_lo[1] = lo.y - pad; box_lo[2] = lo.z - pad;
    box_hi[0] = hi.x + pad; box_hi[1] = hi.y + pad; box_hi[2] = hi.z + pad;
  }
  const double vx = (box_hi[0] - box_lo[0]) / res;
  const double vy = (box_hi[1] - box_lo[1]) / res;
  const double vz = (box_hi[2] - box_lo[2]) / res;
  if (vx <= 0 || vy <= 0 || vz <= 0) return 2;
  const double min_v = std::min({vx, vy, vz});

  std::memset(out_occ, 0, (size_t)res * res * res);
  auto mark = [&](double wx, double wy, double wz) {
    int ix = (int)std::floor((wx - box_lo[0]) / vx);
    int iy = (int)std::floor((wy - box_lo[1]) / vy);
    int iz = (int)std::floor((wz - box_lo[2]) / vz);
    if (ix < 0 || iy < 0 || iz < 0 || ix >= res || iy >= res || iz >= res)
      return;
    out_occ[((size_t)ix * res + iy) * res + iz] = 1;
  };

  // 1) surface shell
  const size_t ntri = mesh.tris.size() / 3;
  for (size_t t = 0; t < ntri; ++t) {
    const Vec3& a = mesh.verts[mesh.tris[3 * t]];
    const Vec3& b = mesh.verts[mesh.tris[3 * t + 1]];
    const Vec3& c = mesh.verts[mesh.tris[3 * t + 2]];
    Vec3 ab = sub(b, a), ac = sub(c, a), bc = sub(c, b);
    double max_edge = std::sqrt(std::max({dot(ab, ab), dot(ac, ac), dot(bc, bc)}));
    int n = std::max(1, (int)std::ceil(max_edge / (0.5 * min_v)));
    if (n > 4096) n = 4096;  // cap degenerate triangles
    for (int i = 0; i <= n; ++i) {
      for (int j = 0; j <= n - i; ++j) {
        double u = (double)i / n, w = (double)j / n;
        double q = 1.0 - u - w;
        mark(a.x * q + b.x * u + c.x * w,
             a.y * q + b.y * u + c.y * w,
             a.z * q + b.z * u + c.z * w);
      }
    }
  }

  // 2) solid parity fill per z-column
  if (solid) {
    std::vector<double> hits;
    for (int ix = 0; ix < res; ++ix) {
      for (int iy = 0; iy < res; ++iy) {
        Vec3 o = {box_lo[0] + (ix + 0.5) * vx, box_lo[1] + (iy + 0.5) * vy,
                  box_lo[2] - 1.0};
        hits.clear();
        for (size_t t = 0; t < ntri; ++t) {
          const Vec3& a = mesh.verts[mesh.tris[3 * t]];
          const Vec3& b = mesh.verts[mesh.tris[3 * t + 1]];
          const Vec3& c = mesh.verts[mesh.tris[3 * t + 2]];
          double tt = ray_z_triangle(o, a, b, c);
          if (!std::isnan(tt) && tt > 0) hits.push_back(tt);
        }
        if (hits.size() < 2) continue;
        std::sort(hits.begin(), hits.end());
        // dedupe near-identical crossings (shared edges)
        std::vector<double> uniq;
        for (double h : hits) {
          if (uniq.empty() || h - uniq.back() > 1e-9) uniq.push_back(h);
        }
        for (size_t k = 0; k + 1 < uniq.size(); k += 2) {
          double z0 = o.z + uniq[k], z1 = o.z + uniq[k + 1];
          int iz0 = std::max(0, (int)std::ceil((z0 - box_lo[2]) / vz - 0.5));
          int iz1 = std::min(res - 1, (int)std::floor((z1 - box_lo[2]) / vz - 0.5));
          for (int iz = iz0; iz <= iz1; ++iz)
            out_occ[((size_t)ix * res + iy) * res + iz] = 1;
        }
      }
    }
  }
  return 0;
}

// Library self-test hook.
int voxelizer_abi_version() { return 1; }

}  // extern "C"
