// Voxel-grid -> OBJ surface mesher (C++, C ABI for ctypes).
//
// The inverse of native/voxelizer.cpp: converts a scanned occupancy grid
// (the reconstruction the policy builds, gennbv_tpu EnvState.scanned_gt or
// any [G,G,G] {0,1} grid) into a quad mesh OBJ viewable in any 3D tool —
// the export the reference gets from open3d point clouds (gennbv/utils.py:
// 363-367), upgraded to watertight surface geometry.
//
// Emits one quad per face between an occupied voxel and free space (or the
// grid boundary), with vertices deduplicated through a hash map so the mesh
// is connected and compact.
//
// Build:  g++ -O3 -shared -fPIC -o libmesher.so mesher.cpp
#include <cstdint>
#include <cstdio>
#include <unordered_map>
#include <vector>

namespace {

struct Key {
  int32_t x, y, z;
  bool operator==(const Key& o) const {
    return x == o.x && y == o.y && z == o.z;
  }
};
struct KeyHash {
  size_t operator()(const Key& k) const {
    return (static_cast<size_t>(k.x) * 73856093u) ^
           (static_cast<size_t>(k.y) * 19349663u) ^
           (static_cast<size_t>(k.z) * 83492791u);
  }
};

}  // namespace

extern "C" {

// grid: [g*g*g] uint8 C-order (x-major); origin/vsize: world placement.
// Writes an OBJ to `path`.  Returns the number of quads, or -1 on IO error.
int64_t mesh_voxels_to_obj(const uint8_t* grid, int32_t g,
                           const double* origin, const double* vsize,
                           const char* path) {
  auto occ = [&](int x, int y, int z) -> bool {
    if (x < 0 || y < 0 || z < 0 || x >= g || y >= g || z >= g) return false;
    return grid[(static_cast<int64_t>(x) * g + y) * g + z] != 0;
  };

  std::unordered_map<Key, int64_t, KeyHash> vert_ids;
  std::vector<Key> verts;
  std::vector<int64_t> quads;  // 4 vertex ids per quad

  auto vid = [&](int x, int y, int z) -> int64_t {
    Key k{x, y, z};
    auto it = vert_ids.find(k);
    if (it != vert_ids.end()) return it->second;
    int64_t id = static_cast<int64_t>(verts.size());
    vert_ids.emplace(k, id);
    verts.push_back(k);
    return id;
  };

  // face corner tables: for each axis/direction, the 4 corners of the face
  // in counter-clockwise order seen from outside.
  static const int kCorners[6][4][3] = {
      // +x face of voxel (x,y,z): corners at x+1
      {{1, 0, 0}, {1, 1, 0}, {1, 1, 1}, {1, 0, 1}},
      // -x
      {{0, 0, 0}, {0, 0, 1}, {0, 1, 1}, {0, 1, 0}},
      // +y
      {{0, 1, 0}, {0, 1, 1}, {1, 1, 1}, {1, 1, 0}},
      // -y
      {{0, 0, 0}, {1, 0, 0}, {1, 0, 1}, {0, 0, 1}},
      // +z
      {{0, 0, 1}, {1, 0, 1}, {1, 1, 1}, {0, 1, 1}},
      // -z
      {{0, 0, 0}, {0, 1, 0}, {1, 1, 0}, {1, 0, 0}},
  };
  static const int kNeighbor[6][3] = {{1, 0, 0},  {-1, 0, 0}, {0, 1, 0},
                                      {0, -1, 0}, {0, 0, 1},  {0, 0, -1}};

  for (int x = 0; x < g; ++x)
    for (int y = 0; y < g; ++y)
      for (int z = 0; z < g; ++z) {
        if (!occ(x, y, z)) continue;
        for (int f = 0; f < 6; ++f) {
          if (occ(x + kNeighbor[f][0], y + kNeighbor[f][1],
                  z + kNeighbor[f][2]))
            continue;
          for (int c = 0; c < 4; ++c) {
            quads.push_back(vid(x + kCorners[f][c][0], y + kCorners[f][c][1],
                                z + kCorners[f][c][2]));
          }
        }
      }

  FILE* out = fopen(path, "w");
  if (!out) return -1;
  fprintf(out, "# gennbv-tpu reconstruction mesh: %zu verts, %zu quads\n",
          verts.size(), quads.size() / 4);
  for (const Key& v : verts) {
    fprintf(out, "v %.6f %.6f %.6f\n", origin[0] + v.x * vsize[0],
            origin[1] + v.y * vsize[1], origin[2] + v.z * vsize[2]);
  }
  for (size_t i = 0; i < quads.size(); i += 4) {
    fprintf(out, "f %lld %lld %lld %lld\n",
            static_cast<long long>(quads[i] + 1),
            static_cast<long long>(quads[i + 1] + 1),
            static_cast<long long>(quads[i + 2] + 1),
            static_cast<long long>(quads[i + 3] + 1));
  }
  fclose(out);
  return static_cast<int64_t>(quads.size() / 4);
}

}  // extern "C"
