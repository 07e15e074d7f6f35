// softtopo: native host-side topology tooling for softbodysim_tpu.
//
// TPU-native counterpart of the reference's native layers:
//   - the binary-only tetrahedralizer plugin (reference:
//     Assets/Hanzzz/Tetrahedralizer/..., C ABI tetrahedralize/load/unload) is
//     replaced by a voxel tetrahedralizer (closed mesh -> conforming 5-tet
//     grid of its interior);
//   - the C# topology builders (unique edges + boundary surface with outward
//     winding, SoftBodyTetMeshAsset.cs:139-203) and the new graph coloring
//     the TPU solver needs run here at native speed for large meshes.
//
// All entry points are C ABI, consumed via ctypes
// (softbodysim_tpu/core/native.py).  Results are bit-identical to the NumPy
// fallbacks (same orderings, same greedy coloring scan).

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct Topo {
  std::vector<int32_t> edges;       // (E,2) sorted pairs, lex order
  std::vector<int32_t> surface;     // (S,3) outward wound, lex-sorted rows
  std::vector<int32_t> edge_colors; // (E,)
  std::vector<int32_t> tet_colors;  // (T,)
};

struct VoxMesh {
  std::vector<float> verts;   // (V,3)
  std::vector<int32_t> tets;  // (T,4)
};

inline double tet_signed_volume(const float* v, int a, int b, int c, int d) {
  double ax = v[3 * b + 0] - v[3 * a + 0], ay = v[3 * b + 1] - v[3 * a + 1],
         az = v[3 * b + 2] - v[3 * a + 2];
  double bx = v[3 * c + 0] - v[3 * a + 0], by = v[3 * c + 1] - v[3 * a + 1],
         bz = v[3 * c + 2] - v[3 * a + 2];
  double cx = v[3 * d + 0] - v[3 * a + 0], cy = v[3 * d + 1] - v[3 * a + 1],
         cz = v[3 * d + 2] - v[3 * a + 2];
  double nx = ay * bz - az * by, ny = az * bx - ax * bz, nz = ax * by - ay * bx;
  return (nx * cx + ny * cy + nz * cz) / 6.0;
}

// Greedy coloring, identical scan to core/topology.py::greedy_color:
// ascending constraint order, smallest color unused among colors already
// assigned to constraints sharing a vertex.
std::vector<int32_t> greedy_color(const int32_t* cons, int64_t n, int arity,
                                  int64_t nverts) {
  std::vector<int32_t> colors(n, 0);
  std::vector<std::vector<int32_t>> used_at(nverts);
  std::vector<uint8_t> used;  // color usage scratch
  for (int64_t i = 0; i < n; ++i) {
    size_t need = 0;
    for (int k = 0; k < arity; ++k)
      need += used_at[cons[i * arity + k]].size();
    used.assign(need + 1, 0);
    for (int k = 0; k < arity; ++k)
      for (int32_t c : used_at[cons[i * arity + k]])
        if ((size_t)c < used.size()) used[c] = 1;
    int32_t col = 0;
    while ((size_t)col < used.size() && used[col]) ++col;
    colors[i] = col;
    for (int k = 0; k < arity; ++k) used_at[cons[i * arity + k]].push_back(col);
  }
  return colors;
}

// Open-addressing u64->payload table (linear probing, power-of-two size).
// unordered_map's node allocations dominate the topology build at millions
// of keys; this flat table is the same dedup at ~5x the speed.  Key 0 is
// reserved as "empty" -- callers bias keys so 0 never occurs.
struct FlatTable {
  std::vector<uint64_t> keys;
  std::vector<int64_t> vals;   // empty when used as a pure set
  uint64_t mask;
  int64_t size = 0;
  bool with_vals;
  explicit FlatTable(int64_t expected, bool values = true)
      : with_vals(values) {
    int64_t cap = 64;
    while (cap < expected * 2) cap <<= 1;
    keys.assign(cap, 0);
    if (with_vals) vals.assign(cap, 0);
    mask = (uint64_t)cap - 1;
  }
  static inline uint64_t hash(uint64_t k) {
    k ^= k >> 33;
    k *= 0xff51afd7ed558ccdULL;
    k ^= k >> 33;
    return k;
  }
  void grow() {
    FlatTable bigger((int64_t)keys.size(), with_vals);  // cap*2
    for (size_t i = 0; i < keys.size(); ++i) {
      if (!keys[i]) continue;
      bool ins;
      size_t s = bigger.slot_nogrow(keys[i], &ins);
      if (with_vals) bigger.vals[s] = vals[i];
    }
    bigger.size = size;
    keys.swap(bigger.keys);
    vals.swap(bigger.vals);
    mask = bigger.mask;
  }
  inline size_t slot_nogrow(uint64_t key, bool* inserted) {
    size_t i = hash(key) & mask;
    while (true) {
      if (keys[i] == key) {
        *inserted = false;
        return i;
      }
      if (keys[i] == 0) {
        keys[i] = key;
        ++size;
        *inserted = true;
        return i;
      }
      i = (i + 1) & mask;
    }
  }
  // returns slot index; *inserted true if the key was new (val zeroed)
  inline size_t slot(uint64_t key, bool* inserted) {
    if ((uint64_t)size * 10 >= (mask + 1) * 7) grow();  // 70% load cap
    return slot_nogrow(key, inserted);
  }
};

}  // namespace

extern "C" {

// ---------- topology build ----------

void* st_build_topology(const float* verts, int64_t nverts,
                        const int32_t* tets, int64_t ntets) {
  auto* topo = new Topo();

  // unique sorted-pair edges, lexicographic order (matches np.unique):
  // flat-table dedup (6 per tet), then sort the unique set only.
  {
    FlatTable seen(ntets * 2, /*values=*/false);
    std::vector<uint64_t> keys;
    keys.reserve(ntets * 3);
    static const int P[6][2] = {{0, 1}, {0, 2}, {0, 3}, {1, 2}, {1, 3}, {2, 3}};
    for (int64_t t = 0; t < ntets; ++t) {
      for (auto& pr : P) {
        uint64_t a = (uint64_t)tets[t * 4 + pr[0]];
        uint64_t b = (uint64_t)tets[t * 4 + pr[1]];
        if (a > b) std::swap(a, b);
        uint64_t key = (a << 32) | b;
        bool inserted;
        seen.slot(key + 1, &inserted);  // +1: key 0 means empty
        if (inserted) keys.push_back(key);
      }
    }
    std::sort(keys.begin(), keys.end());
    topo->edges.reserve(keys.size() * 2);
    for (uint64_t k : keys) {
      topo->edges.push_back((int32_t)(k >> 32));
      topo->edges.push_back((int32_t)(k & 0xffffffffu));
    }
  }

  // boundary faces: count unordered keys over the 4 faces per tet
  // (a,b,c|d), (a,d,b|c), (a,c,d|b), (b,d,c|a); faces seen once are
  // boundary; flip winding so the opposite vertex is behind the normal.
  // A boundary face has exactly ONE occurrence, so its stored orientation
  // record is unambiguous (no first-seen dependence).
  {
    struct FaceVal {
      int32_t i0, i1, i2, opp;
      int32_t count;
    };
    FlatTable table(ntets * 5 / 2);
    std::vector<FaceVal> recs;
    recs.reserve(ntets * 2 + 4);
    auto fkey = [](int32_t x, int32_t y, int32_t z) {
      int32_t a = x, b = y, c = z;
      if (a > b) std::swap(a, b);
      if (b > c) std::swap(b, c);
      if (a > b) std::swap(a, b);
      // 21 bits each is plenty for <2M vertices
      return ((uint64_t)a << 42) | ((uint64_t)b << 21) | (uint64_t)c;
    };
    auto add_face = [&](int32_t i0, int32_t i1, int32_t i2, int32_t opp) {
      bool inserted;
      size_t s = table.slot(fkey(i0, i1, i2) + 1, &inserted);
      if (inserted) {
        table.vals[s] = (int64_t)recs.size();
        recs.push_back(FaceVal{i0, i1, i2, opp, 1});
      } else {
        recs[table.vals[s]].count++;
      }
    };
    for (int64_t t = 0; t < ntets; ++t) {
      int32_t a = tets[t * 4], b = tets[t * 4 + 1], c = tets[t * 4 + 2],
              d = tets[t * 4 + 3];
      add_face(a, b, c, d);
      add_face(a, d, b, c);
      add_face(a, c, d, b);
      add_face(b, d, c, a);
    }
    std::vector<std::array<int32_t, 3>> tris;
    for (auto& rec : recs) {
      if (rec.count != 1) continue;
      int32_t i0 = rec.i0, i1 = rec.i1, i2 = rec.i2;
      double s = tet_signed_volume(verts, i0, i1, i2, rec.opp) * 6.0;
      if (s > 0.0) std::swap(i1, i2);
      tris.push_back({i0, i1, i2});
    }
    std::sort(tris.begin(), tris.end());
    topo->surface.reserve(tris.size() * 3);
    for (auto& t : tris) {
      topo->surface.push_back(t[0]);
      topo->surface.push_back(t[1]);
      topo->surface.push_back(t[2]);
    }
  }

  topo->edge_colors = greedy_color(topo->edges.data(),
                                   (int64_t)topo->edges.size() / 2, 2, nverts);
  topo->tet_colors = greedy_color(tets, ntets, 4, nverts);
  return topo;
}

// In-place positive orientation (SoftBodyTetMeshAsset.cs:83-102): swap
// (b, c) of any tet whose fp32 signed volume is negative.  Arithmetic is
// plain float (no FMA contraction with the default build flags), matching
// core/topology.py::orient_tets_positive bit-for-bit.
void st_orient(const float* verts, int32_t* tets, int64_t ntets) {
  for (int64_t t = 0; t < ntets; ++t) {
    const float* a = verts + 3 * tets[t * 4 + 0];
    const float* b = verts + 3 * tets[t * 4 + 1];
    const float* c = verts + 3 * tets[t * 4 + 2];
    const float* d = verts + 3 * tets[t * 4 + 3];
    float ax = b[0] - a[0], ay = b[1] - a[1], az = b[2] - a[2];
    float bx = c[0] - a[0], by = c[1] - a[1], bz = c[2] - a[2];
    float cx = d[0] - a[0], cy = d[1] - a[1], cz = d[2] - a[2];
    float nx = ay * bz - az * by, ny = az * bx - ax * bz,
          nz = ax * by - ay * bx;
    float vol = (nx * cx + ny * cy + nz * cz) / 6.0f;
    if (vol < 0.0f) std::swap(tets[t * 4 + 1], tets[t * 4 + 2]);
  }
}

int64_t st_num_edges(void* h) { return ((Topo*)h)->edges.size() / 2; }
int64_t st_num_surface(void* h) { return ((Topo*)h)->surface.size() / 3; }

void st_get_edges(void* h, int32_t* out) {
  auto& e = ((Topo*)h)->edges;
  std::memcpy(out, e.data(), e.size() * sizeof(int32_t));
}
void st_get_surface(void* h, int32_t* out) {
  auto& s = ((Topo*)h)->surface;
  std::memcpy(out, s.data(), s.size() * sizeof(int32_t));
}
void st_get_edge_colors(void* h, int32_t* out) {
  auto& c = ((Topo*)h)->edge_colors;
  std::memcpy(out, c.data(), c.size() * sizeof(int32_t));
}
void st_get_tet_colors(void* h, int32_t* out) {
  auto& c = ((Topo*)h)->tet_colors;
  std::memcpy(out, c.data(), c.size() * sizeof(int32_t));
}
void st_free(void* h) { delete (Topo*)h; }

// standalone coloring entry (used for cloth / custom constraint sets)
void st_greedy_color(const int32_t* cons, int64_t n, int32_t arity,
                     int64_t nverts, int32_t* out) {
  auto colors = greedy_color(cons, n, arity, nverts);
  std::memcpy(out, colors.data(), colors.size() * sizeof(int32_t));
}

// ---------- voxel tetrahedralizer ----------
//
// Closed triangle mesh -> tet mesh of its interior: voxelize by cell-center
// parity ray casts (+x), then split each inside cell into 5 tets with
// alternating parity so shared faces conform (same pattern as
// core/meshes.py::tet_cube).

void* st_voxelize(const float* verts, int64_t nverts, const int32_t* tris,
                  int64_t ntris, float cell) {
  auto* out = new VoxMesh();
  if (nverts == 0 || ntris == 0 || cell <= 0.0f) return out;

  float lo[3] = {1e30f, 1e30f, 1e30f}, hi[3] = {-1e30f, -1e30f, -1e30f};
  for (int64_t i = 0; i < nverts; ++i)
    for (int k = 0; k < 3; ++k) {
      lo[k] = std::min(lo[k], verts[i * 3 + k]);
      hi[k] = std::max(hi[k], verts[i * 3 + k]);
    }

  int nx = std::max(1, (int)std::ceil((hi[0] - lo[0]) / cell));
  int ny = std::max(1, (int)std::ceil((hi[1] - lo[1]) / cell));
  int nz = std::max(1, (int)std::ceil((hi[2] - lo[2]) / cell));
  if ((int64_t)nx * ny * nz > (int64_t)64 * 1024 * 1024) return out;  // guard

  // inside test per cell center: parity of +x ray / triangle crossings
  std::vector<uint8_t> inside((size_t)nx * ny * nz, 0);
  for (int j = 0; j < ny; ++j) {
    double cy = lo[1] + (j + 0.5) * cell;
    for (int k = 0; k < nz; ++k) {
      double cz = lo[2] + (k + 0.5) * cell;
      // collect x-crossings of the ray (y=cy, z=cz)
      std::vector<double> xs;
      for (int64_t t = 0; t < ntris; ++t) {
        const float* p0 = verts + 3 * tris[t * 3 + 0];
        const float* p1 = verts + 3 * tris[t * 3 + 1];
        const float* p2 = verts + 3 * tris[t * 3 + 2];
        // 2D point-in-triangle in (y,z), then solve x on the plane
        double d0y = p1[1] - p0[1], d0z = p1[2] - p0[2];
        double d1y = p2[1] - p0[1], d1z = p2[2] - p0[2];
        double det = d0y * d1z - d0z * d1y;
        if (std::fabs(det) < 1e-18) continue;
        double wy = cy - p0[1], wz = cz - p0[2];
        double u = (wy * d1z - wz * d1y) / det;
        double v = (d0y * wz - d0z * wy) / det;
        if (u < 0.0 || v < 0.0 || u + v > 1.0) continue;
        double x = p0[0] + u * (p1[0] - p0[0]) + v * (p2[0] - p0[0]);
        xs.push_back(x);
      }
      std::sort(xs.begin(), xs.end());
      for (int i = 0; i < nx; ++i) {
        double cx = lo[0] + (i + 0.5) * cell;
        size_t cross =
            std::lower_bound(xs.begin(), xs.end(), cx) - xs.begin();
        size_t after = xs.size() - cross;
        if (after % 2 == 1)
          inside[((size_t)i * ny + j) * nz + k] = 1;
      }
    }
  }

  // emit shared grid vertices for inside cells
  std::unordered_map<uint64_t, int32_t> vid_map;
  auto grid_vid = [&](int i, int j, int k) -> int32_t {
    uint64_t key = ((uint64_t)i << 42) | ((uint64_t)j << 21) | (uint64_t)k;
    auto it = vid_map.find(key);
    if (it != vid_map.end()) return it->second;
    int32_t id = (int32_t)(out->verts.size() / 3);
    vid_map[key] = id;
    out->verts.push_back(lo[0] + i * cell);
    out->verts.push_back(lo[1] + j * cell);
    out->verts.push_back(lo[2] + k * cell);
    return id;
  };

  static const int EVEN[5][4] = {
      {0, 1, 2, 4}, {1, 3, 2, 7}, {1, 4, 5, 7}, {2, 4, 7, 6}, {1, 2, 4, 7}};
  static const int ODD[5][4] = {
      {0, 1, 3, 5}, {0, 3, 2, 6}, {0, 5, 4, 6}, {3, 5, 6, 7}, {0, 3, 5, 6}};

  for (int i = 0; i < nx; ++i)
    for (int j = 0; j < ny; ++j)
      for (int k = 0; k < nz; ++k) {
        if (!inside[((size_t)i * ny + j) * nz + k]) continue;
        int32_t c[8] = {grid_vid(i, j, k),         grid_vid(i, j, k + 1),
                        grid_vid(i, j + 1, k),     grid_vid(i, j + 1, k + 1),
                        grid_vid(i + 1, j, k),     grid_vid(i + 1, j, k + 1),
                        grid_vid(i + 1, j + 1, k), grid_vid(i + 1, j + 1, k + 1)};
        const int(*pat)[4] = ((i + j + k) % 2 == 0) ? EVEN : ODD;
        for (int t = 0; t < 5; ++t)
          for (int m = 0; m < 4; ++m) out->tets.push_back(c[pat[t][m]]);
      }

  return out;
}

int64_t st_vox_num_verts(void* h) { return ((VoxMesh*)h)->verts.size() / 3; }
int64_t st_vox_num_tets(void* h) { return ((VoxMesh*)h)->tets.size() / 4; }
void st_vox_get_verts(void* h, float* out) {
  auto& v = ((VoxMesh*)h)->verts;
  std::memcpy(out, v.data(), v.size() * sizeof(float));
}
void st_vox_get_tets(void* h, int32_t* out) {
  auto& t = ((VoxMesh*)h)->tets;
  std::memcpy(out, t.data(), t.size() * sizeof(int32_t));
}
void st_vox_free(void* h) { delete (VoxMesh*)h; }

// ---------------------------------------------------------------------------
// Super-block constraint packer (kernels/sweep.py::pack_superblocks): the
// greedy window-slot packing for the Pallas sweep kernels.  Bit-identical to
// the NumPy/Python fallback (same stable ordering, same greedy scan, same
// sublane choice), ~20x faster at 100k-constraint scale.
// ---------------------------------------------------------------------------

struct SuperPack {
  int32_t arity = 0;
  int32_t slots_cap = 0;
  int32_t layer_cap = 0;
  int32_t dmax = 1;
  int64_t nsup = 0;
  // per block: slot list + lanes per sublane (constraint ids)
  std::vector<std::vector<int32_t>> slot_lists;
  std::vector<std::array<std::vector<int64_t>, 8>> lanes;
  std::vector<int64_t> cons;  // copy of (n, arity)
};

void* st_pack_super(const int64_t* cons, int64_t n, int32_t arity,
                    int32_t slots_cap, int32_t layer_cap,
                    int32_t order_mode) {
  const int32_t LANES = 128;
  auto* sp = new SuperPack();
  sp->arity = arity;
  sp->slots_cap = slots_cap;
  sp->layer_cap = layer_cap;
  sp->cons.assign(cons, cons + n * arity);

  // Scan order (mirrors kernels/sweep.py::_pack_order):
  //   0: stable lexicographic by per-role window tuple (round-2 order;
  //      best on structured meshes where roles are pre-sorted bands)
  //   1: stable (min window, max window) -- keeps the slot pool a
  //      slowly-sliding band; measured on the merged BatchTest mesh:
  //      tets S=8 fill 0.43 -> 0.88 slot-limited.
  // pack_best tries both and keeps the cheaper plan.
  auto wminmax = [&](int64_t i) {
    int64_t lo = cons[i * arity] / LANES, hi = lo;
    for (int r = 1; r < arity; r++) {
      int64_t w = cons[i * arity + r] / LANES;
      lo = std::min(lo, w);
      hi = std::max(hi, w);
    }
    return std::make_pair(lo, hi);
  };
  // Sort keys are precomputed: the comparators otherwise recompute the
  // window tuples O(n log n) times, which is measurable at 10M+ scale.
  std::vector<int64_t> order(n);
  for (int64_t i = 0; i < n; i++) order[i] = i;
  if (order_mode == 1) {
    std::vector<uint64_t> key(n);
    for (int64_t i = 0; i < n; i++) {
      auto mm = wminmax(i);
      key[i] = ((uint64_t)mm.first << 32) | (uint64_t)(uint32_t)mm.second;
    }
    std::stable_sort(order.begin(), order.end(),
                     [&](int64_t a, int64_t b) { return key[a] < key[b]; });
  } else {
    std::vector<std::array<int32_t, 4>> key(n);
    for (int64_t i = 0; i < n; i++) {
      std::array<int32_t, 4> k{0, 0, 0, 0};
      for (int r = 0; r < arity; r++)
        k[r] = (int32_t)(cons[i * arity + r] / LANES);
      key[i] = k;
    }
    std::stable_sort(order.begin(), order.end(),
                     [&](int64_t a, int64_t b) { return key[a] < key[b]; });
  }

  std::vector<int64_t> remaining = order;
  std::vector<int64_t> spill;
  std::vector<int32_t> cur_slots;
  std::array<std::vector<int64_t>, 8> cur_lanes;
  int cur_n = 0, streak = 0;

  // Per-(sublane, vertex) multiplicity within the current block.  The
  // original unordered_map dominated the scan at megascale; this is the
  // same data as epoch-stamped flat arrays (epoch bump == map.clear()),
  // bit-identical plan, O(1) un-hashed probes.
  int64_t maxv = 0;
  for (int64_t i = 0; i < n * arity; i++) maxv = std::max(maxv, cons[i]);
  const int64_t vstride = maxv + 1;
  std::vector<int32_t> mult((size_t)(8 * vstride), 0);
  std::vector<int32_t> mstamp((size_t)(8 * vstride), -1);
  // window -> present-in-cur_slots, same trick (windows <= maxv/128)
  const int64_t nwin_ub = maxv / LANES + 1;
  std::vector<int32_t> wstamp((size_t)nwin_ub, -1);
  int32_t epoch = 0;

  auto close = [&]() {
    if (cur_n) {
      sp->slot_lists.push_back(cur_slots);
      sp->lanes.push_back(cur_lanes);
    }
    cur_slots.clear();
    for (auto& l : cur_lanes) l.clear();
    epoch++;
    cur_n = 0;
    streak = 0;
  };

  while (!remaining.empty()) {
    spill.clear();
    for (int64_t i : remaining) {
      // distinct new windows of this constraint
      int32_t ws[4];
      int nw = 0;
      for (int r = 0; r < arity; r++) {
        int32_t w = (int32_t)(cons[i * arity + r] / LANES);
        bool dup = false;
        for (int k = 0; k < nw; k++) dup |= (ws[k] == w);
        if (!dup) ws[nw++] = w;
      }
      int n_new = 0;
      for (int k = 0; k < nw; k++)
        if (wstamp[ws[k]] != epoch) n_new++;
      if (cur_n >= 8 * LANES ||
          (int)cur_slots.size() + n_new > slots_cap) {
        if (cur_n >= 8 * LANES || streak >= 256) {
          close();
        } else {
          spill.push_back(i);
          streak++;
          continue;
        }
      }
      // sublane with a free lane where the vertices have min multiplicity
      int best_g = -1, best_m = layer_cap;
      for (int off = 0; off < 8; off++) {
        int g = (cur_n + off) % 8;
        if ((int)cur_lanes[g].size() >= LANES) continue;
        int m = 0;
        for (int r = 0; r < arity; r++) {
          size_t idx = (size_t)g * vstride + cons[i * arity + r];
          if (mstamp[idx] == epoch && mult[idx] > m) m = mult[idx];
        }
        if (m < best_m) {
          best_g = g;
          best_m = m;
          if (m == 0) break;
        }
      }
      if (best_g < 0) {
        spill.push_back(i);
        streak++;
        continue;
      }
      for (int k = 0; k < nw; k++) {
        if (wstamp[ws[k]] != epoch) {
          wstamp[ws[k]] = epoch;
          cur_slots.push_back(ws[k]);
        }
      }
      cur_lanes[best_g].push_back(i);
      cur_n++;
      streak = 0;
      for (int r = 0; r < arity; r++) {
        size_t idx = (size_t)best_g * vstride + cons[i * arity + r];
        if (mstamp[idx] != epoch) {
          mstamp[idx] = epoch;
          mult[idx] = 0;
        }
        mult[idx]++;
      }
    }
    close();
    remaining.swap(spill);
  }

  int64_t nb = (int64_t)sp->slot_lists.size();
  if (nb < 1) nb = 1;
  sp->nsup = ((nb + 7) / 8) * 8;

  // dmax needs the layer assignment scan (same as fill, dry run).  Flat
  // epoch-stamped counters (g, slot, lane) replace the per-block
  // unordered_map; a per-block window->slot table kills the linear slot
  // search.  Identical layer assignment.
  {
    const int64_t smax = slots_cap > 0 ? slots_cap : 1;
    std::vector<int32_t> lcnt((size_t)(8 * smax * LANES), 0);
    std::vector<int32_t> lstamp((size_t)(8 * smax * LANES), -1);
    std::vector<int32_t> slot_of((size_t)nwin_ub, 0);
    std::vector<int32_t> sstamp((size_t)nwin_ub, -1);
    for (size_t b = 0; b < sp->slot_lists.size(); b++) {
      const int32_t ep = (int32_t)b;
      const auto& sl = sp->slot_lists[b];
      for (size_t t = 0; t < sl.size(); t++) {
        slot_of[sl[t]] = (int32_t)t;
        sstamp[sl[t]] = ep;
      }
      for (int g = 0; g < 8; g++)
        for (int64_t i : sp->lanes[b][g])
          for (int r = 0; r < arity; r++) {
            int64_t v = sp->cons[i * arity + r];
            int32_t w = (int32_t)(v / LANES);
            int t = sstamp[w] == ep ? slot_of[w] : (int)smax - 1;
            size_t key = ((size_t)g * smax + t) * LANES + (v % LANES);
            if (lstamp[key] != ep) {
              lstamp[key] = ep;
              lcnt[key] = 0;
            }
            int32_t layer = lcnt[key]++;
            if (layer + 1 > sp->dmax) sp->dmax = layer + 1;
          }
    }
  }
  return sp;
}

int64_t st_pack_num_super(void* h) { return ((SuperPack*)h)->nsup; }
int32_t st_pack_dmax(void* h) { return ((SuperPack*)h)->dmax; }

void st_pack_fill(void* h, int32_t* slots, int32_t* rel, int32_t* inv,
                  int64_t* perm, float* scale) {
  const int32_t LANES = 128;
  auto* sp = (SuperPack*)h;
  const int arity = sp->arity, S = sp->slots_cap, D = sp->dmax;
  const int64_t nsup = sp->nsup;

  std::fill(slots, slots + nsup * LANES, 0);
  std::fill(rel, rel + nsup * arity * 8 * LANES, 0);
  std::fill(inv, inv + nsup * S * D * 8 * LANES, -1);
  std::fill(perm, perm + nsup * 8 * LANES, (int64_t)-1);
  std::fill(scale, scale + nsup * 8 * LANES, 1.0f);

  // Flat epoch-stamped counters replace the per-block unordered_maps (same
  // data, O(1) un-hashed probes -- the maps dominated fill at megascale).
  int64_t maxv = 0;
  for (int64_t x : sp->cons) maxv = std::max(maxv, x);
  const int64_t vstride = maxv + 1, nwin_ub = maxv / LANES + 1;
  std::vector<int32_t> tot((size_t)vstride, 0), tstamp((size_t)vstride, -1);
  std::vector<int32_t> lcnt((size_t)(8 * S * LANES), 0);
  std::vector<int32_t> lstamp((size_t)(8 * S * LANES), -1);
  std::vector<int32_t> slot_of((size_t)nwin_ub, 0);
  std::vector<int32_t> sstamp((size_t)nwin_ub, -1);

  for (size_t b = 0; b < sp->slot_lists.size(); b++) {
    const int32_t ep = (int32_t)b;
    const auto& sl = sp->slot_lists[b];
    for (size_t t = 0; t < sl.size(); t++) slots[b * LANES + t] = sl[t];
    for (size_t t = sl.size(); t < (size_t)S; t++)
      slots[b * LANES + t] = sl.empty() ? 0 : sl[0];
    slots[b * LANES + S] = (int32_t)sl.size();
    for (size_t t = 0; t < sl.size(); t++) {
      slot_of[sl[t]] = (int32_t)t;
      sstamp[sl[t]] = ep;
    }

    for (int g = 0; g < 8; g++) {
      const auto& ln = sp->lanes[b][g];
      for (size_t j = 0; j < ln.size(); j++) {
        int64_t i = ln[j];
        perm[((int64_t)b * 8 + g) * LANES + j] = i;
        for (int r = 0; r < arity; r++) {
          int64_t v = sp->cons[i * arity + r];
          int32_t w = (int32_t)(v / LANES);
          int t = sstamp[w] == ep ? slot_of[w] : (int)sl.size();
          int l_in = (int)(v % LANES);
          rel[(((int64_t)b * arity + r) * 8 + g) * LANES + j] =
              t * LANES + l_in;
          size_t key = ((size_t)g * S + std::min(t, S - 1)) * LANES + l_in;
          if (lstamp[key] != ep) {
            lstamp[key] = ep;
            lcnt[key] = 0;
          }
          int32_t layer = lcnt[key]++;
          inv[((((int64_t)b * S + t) * D + layer) * 8 + g) * LANES + l_in] =
              r * LANES + (int32_t)j;
          if (tstamp[v] != ep) {
            tstamp[v] = ep;
            tot[v] = 0;
          }
          tot[v]++;
        }
      }
    }
    for (int g = 0; g < 8; g++) {
      const auto& ln = sp->lanes[b][g];
      for (size_t j = 0; j < ln.size(); j++) {
        int m = 1;
        for (int r = 0; r < arity; r++) {
          int c = tot[sp->cons[ln[j] * arity + r]];
          if (c > m) m = c;
        }
        scale[((int64_t)b * 8 + g) * LANES + j] = 1.0f / (float)m;
      }
    }
  }
}

void st_pack_free(void* h) { delete (SuperPack*)h; }

// Block-major row permute: dst block i = src block order[i].  The hot
// copy of kernels/sweep.py::regroup_plan's table permutes (numpy fancy
// indexing runs ~3 GB/s on these shapes; a straight memcpy-per-block
// loop is memory-bandwidth bound instead).
void st_permute_rows(const void* src, void* dst, const int64_t* order,
                     int64_t nblocks, int64_t blockbytes) {
  const char* s = (const char*)src;
  char* d = (char*)dst;
  for (int64_t i = 0; i < nblocks; ++i)
    std::memcpy(d + i * blockbytes, s + order[i] * blockbytes,
                (size_t)blockbytes);
}

}  // extern "C"
