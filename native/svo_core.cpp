// svo_core: native host runtime for the voxelraytracing_tpu engine.
//
// The device (TPU) owns all per-pixel/per-voxel bulk compute; this library
// owns the *latency-sensitive host mutations* that sit on the interactive
// path — the role the reference engine's Rust `common::world` core plays
// (common/src/world/mod.rs:137-471): 16-bit SVO node format, group-of-8
// free-list allocation with coalescing, top-down split on write, bottom-up
// merge of identical siblings, plus dense<->SVO conversion used by the
// server authority and region-file loads.
//
// Semantics intentionally match the Python reference implementation in
// core/svo.py (which is itself the executable spec, property-tested); the
// test suite cross-checks this library against it operation-for-operation.
//
// Exposed as a plain C ABI for ctypes. Nodes are int32 holding widened
// 16-bit node values (MSB-of-16 split flag, low 15 bits payload).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int32_t SPLIT_MASK = 0x8000;
constexpr int32_t DATA_MASK = 0x7FFF;
constexpr int CHUNK_SIZE = 32;
constexpr int CHUNK_DEPTH = 5;

inline bool is_split(int32_t n) { return (n & SPLIT_MASK) != 0; }
inline int32_t leaf(int32_t voxel) { return voxel & DATA_MASK; }
inline int32_t split(int32_t child) { return child | SPLIT_MASK; }
inline int32_t payload(int32_t n) { return n & DATA_MASK; }

// Free-list allocator over [start,end) handing out aligned groups of 8,
// coalescing on free (reference semantics: common/src/world/mod.rs:213-313,
// spec: core/svo.py NodeAlloc).
struct Alloc {
  std::vector<int64_t> free_start;
  std::vector<int64_t> free_end;
  int64_t range_end = 0;
  int64_t last_used = 0;

  void init(int64_t used_end, int64_t end) {
    free_start.assign(1, used_end);
    free_end.assign(1, end);
    range_end = end;
    last_used = used_end - 1;
  }

  int64_t next() {
    int best = -1;
    int64_t best_addr = 0;
    for (size_t i = 0; i < free_start.size(); i++) {
      if (free_end[i] - free_start[i] < 8) continue;
      if (best < 0 || free_start[i] < best_addr) {
        best = (int)i;
        best_addr = free_start[i];
      }
    }
    if (best < 0) return -1;
    int64_t result = free_start[best];
    free_start[best] += 8;
    // drop a span once only a single unusable slot remains
    if (free_start[best] + 1 == free_end[best]) {
      free_start.erase(free_start.begin() + best);
      free_end.erase(free_end.begin() + best);
    }
    if (result + 7 > last_used) last_used = result + 7;
    return result;
  }

  void free_group(int64_t addr) {
    int64_t end = addr + 8;
    for (size_t i = 0; i < free_start.size(); i++) {
      if (free_start[i] == end) {
        free_start[i] -= 8;
        return;
      }
      if (free_end[i] == addr) {
        free_end[i] += 8;
        return;
      }
    }
    free_start.push_back(addr);
    free_end.push_back(end);
  }
};

struct Found {
  int64_t idx;
  int depth;
  float cx, cy, cz;
  int size;
};

Found find_node(const int32_t* nodes, float px, float py, float pz,
                int max_depth) {
  Found f{0, 0, CHUNK_SIZE * 0.5f, CHUNK_SIZE * 0.5f, CHUNK_SIZE * 0.5f,
          CHUNK_SIZE};
  while (true) {
    int32_t n = nodes[f.idx];
    if (!is_split(n) || f.depth == max_depth) return f;
    f.size /= 2;
    int cx = px >= f.cx, cy = py >= f.cy, cz = pz >= f.cz;
    f.idx = payload(n) + (cx | (cy << 1) | (cz << 2));
    float h = f.size * 0.5f;
    f.cx += cx ? h : -h;
    f.cy += cy ? h : -h;
    f.cz += cz ? h : -h;
    f.depth++;
  }
}

Found node_parent(const int32_t* nodes, const Found& child) {
  Found f{0, 0, CHUNK_SIZE * 0.5f, CHUNK_SIZE * 0.5f, CHUNK_SIZE * 0.5f,
          CHUNK_SIZE};
  while (true) {
    int32_t n = nodes[f.idx];
    if (!is_split(n) || f.depth == child.depth - 1) return f;
    f.size /= 2;
    int cx = child.cx >= f.cx, cy = child.cy >= f.cy, cz = child.cz >= f.cz;
    f.idx = payload(n) + (cx | (cy << 1) | (cz << 2));
    float h = f.size * 0.5f;
    f.cx += cx ? h : -h;
    f.cy += cy ? h : -h;
    f.cz += cz ? h : -h;
    f.depth++;
  }
}

}  // namespace

extern "C" {

// Opaque allocator handle management (one per chunk span).
void* svo_alloc_new(int64_t used_end, int64_t end) {
  Alloc* a = new Alloc();
  a->init(used_end, end);
  return a;
}

void svo_alloc_delete(void* alloc) { delete static_cast<Alloc*>(alloc); }

int64_t svo_alloc_last_used(void* alloc) {
  return static_cast<Alloc*>(alloc)->last_used;
}

int64_t svo_alloc_total_free(void* alloc) {
  Alloc* a = static_cast<Alloc*>(alloc);
  int64_t total = 0;
  for (size_t i = 0; i < a->free_start.size(); i++)
    total += a->free_end[i] - a->free_start[i];
  return total;
}

// Write `voxel` at (x,y,z)/target_depth into a chunk-relative node array.
// Returns 0 ok, -1 out of memory (pool unchanged semantics not guaranteed
// past the failed split, matching the Python spec's exception point).
int svo_set_node(int32_t* nodes, void* alloc_handle, float x, float y,
                 float z, int32_t voxel, int target_depth) {
  Alloc* alloc = static_cast<Alloc*>(alloc_handle);
  Found f = find_node(nodes, x, y, z, target_depth);
  int32_t parent_voxel = payload(nodes[f.idx]);
  if (parent_voxel == (voxel & DATA_MASK)) return 0;

  while (f.depth < target_depth) {
    int64_t first_child = alloc->next();
    if (first_child < 0) return -1;
    for (int i = 0; i < 8; i++) nodes[first_child + i] = leaf(parent_voxel);
    nodes[f.idx] = split((int32_t)first_child);
    f.size /= 2;
    int cx = x >= f.cx, cy = y >= f.cy, cz = z >= f.cz;
    f.idx = first_child + (cx | (cy << 1) | (cz << 2));
    float h = f.size * 0.5f;
    f.cx += cx ? h : -h;
    f.cy += cy ? h : -h;
    f.cz += cz ? h : -h;
    f.depth++;
  }
  nodes[f.idx] = leaf(voxel);

  // bottom-up merge of 8 identical siblings (mod.rs:442-457)
  while (f.depth > 0) {
    Found parent = node_parent(nodes, f);
    f = parent;
    int64_t base = payload(nodes[f.idx]);
    bool all_eq = true;
    for (int i = 1; i < 8; i++)
      if (nodes[base + i] != nodes[base]) {
        all_eq = false;
        break;
      }
    if (!all_eq) break;
    alloc->free_group(base);
    nodes[f.idx] = leaf(voxel);
  }
  return 0;
}

// Voxel id at (x,y,z) in a chunk-relative node array.
int32_t svo_get_voxel(const int32_t* nodes, float x, float y, float z) {
  Found f = find_node(nodes, x, y, z, CHUNK_DEPTH);
  return payload(nodes[f.idx]);
}

// Expand a chunk SVO into a dense uint16[32][32][32] grid (x-major:
// out[x*1024 + y*32 + z]).
void svo_to_dense(const int32_t* nodes, uint16_t* out) {
  struct Item {
    int64_t idx;
    int mx, my, mz, size;
  };
  std::vector<Item> stack;
  stack.push_back({0, 0, 0, 0, CHUNK_SIZE});
  while (!stack.empty()) {
    Item it = stack.back();
    stack.pop_back();
    int32_t n = nodes[it.idx];
    if (!is_split(n) || it.size == 1) {
      uint16_t v = (uint16_t)payload(n);
      for (int x = it.mx; x < it.mx + it.size; x++)
        for (int y = it.my; y < it.my + it.size; y++) {
          uint16_t* row = out + (size_t)x * 1024 + (size_t)y * 32 + it.mz;
          for (int z = 0; z < it.size; z++) row[z] = v;
        }
      continue;
    }
    int64_t base = payload(n);
    int half = it.size / 2;
    for (int c = 0; c < 8; c++) {
      stack.push_back({base + c, it.mx + (c & 1) * half,
                       it.my + ((c >> 1) & 1) * half,
                       it.mz + ((c >> 2) & 1) * half, half});
    }
  }
}

// Build a compact SVO from a dense grid bottom-up (two passes: uniformity
// pyramid, then BFS addressing) — same output layout as the device builder
// (ops/svo_build.py): root at 0, 8-child blocks in scan order.
// Returns the node count, or -1 if it exceeds `cap`.
int64_t dense_to_svo(const uint16_t* grid, int32_t* out, int64_t cap) {
  // vals[l]: value of each cell if uniform; unis[l]: uniformity flags
  static thread_local std::vector<uint16_t> vals[CHUNK_DEPTH + 1];
  static thread_local std::vector<uint8_t> unis[CHUNK_DEPTH + 1];
  for (int l = 0; l <= CHUNK_DEPTH; l++) {
    int s = 1 << l;
    vals[l].resize((size_t)s * s * s);
    unis[l].resize((size_t)s * s * s);
  }
  // leaves (x-major input)
  {
    int s = CHUNK_SIZE;
    for (int x = 0; x < s; x++)
      for (int y = 0; y < s; y++)
        for (int z = 0; z < s; z++) {
          size_t i = ((size_t)x * s + y) * s + z;
          vals[CHUNK_DEPTH][i] = grid[i];
          unis[CHUNK_DEPTH][i] = 1;
        }
  }
  for (int l = CHUNK_DEPTH - 1; l >= 0; l--) {
    int s = 1 << l, s2 = s * 2;
    for (int x = 0; x < s; x++)
      for (int y = 0; y < s; y++)
        for (int z = 0; z < s; z++) {
          uint16_t v0 = 0;
          bool uni = true;
          for (int c = 0; c < 8; c++) {
            int xx = 2 * x + (c & 1), yy = 2 * y + ((c >> 1) & 1),
                zz = 2 * z + ((c >> 2) & 1);
            size_t ci = ((size_t)xx * s2 + yy) * s2 + zz;
            if (c == 0)
              v0 = vals[l + 1][ci];
            else if (vals[l + 1][ci] != v0)
              uni = false;
            if (!unis[l + 1][ci]) uni = false;
          }
          size_t i = ((size_t)x * s + y) * s + z;
          vals[l][i] = v0;
          unis[l][i] = (uint8_t)uni;
        }
  }
  // Top-down, level-synchronous addressing in cell scan order — child
  // blocks of level l are assigned by exclusive prefix sum over the level's
  // split cells, which makes the output bit-identical to the device
  // builder's (ops/svo_build.py:71-113).
  static thread_local std::vector<int64_t> addr[CHUNK_DEPTH + 1];
  static thread_local std::vector<uint8_t> exists[CHUNK_DEPTH + 1];
  for (int l = 0; l <= CHUNK_DEPTH; l++) {
    int s = 1 << l;
    addr[l].assign((size_t)s * s * s, 0);
    exists[l].assign((size_t)s * s * s, 0);
  }
  exists[0][0] = 1;
  addr[0][0] = 0;
  int64_t next_free = 1;
  for (int l = 0; l <= CHUNK_DEPTH; l++) {
    int s = 1 << l;
    size_t n_cells = (size_t)s * s * s;
    for (size_t i = 0; i < n_cells; i++) {
      if (!exists[l][i]) continue;
      bool do_split = !unis[l][i] && l < CHUNK_DEPTH;
      int64_t a = addr[l][i];
      if (a >= cap) return -1;
      if (!do_split) {
        out[a] = leaf(vals[l][i]);
        continue;
      }
      int64_t base = next_free;
      next_free += 8;
      if (base + 7 >= cap || base > DATA_MASK) return -1;
      out[a] = split((int32_t)base);
      // decompose scan index (x slowest, z fastest)
      int z = (int)(i % s), y = (int)((i / s) % s), x = (int)(i / ((size_t)s * s));
      int s2 = s * 2;
      for (int ch = 0; ch < 8; ch++) {
        int xx = 2 * x + (ch & 1), yy = 2 * y + ((ch >> 1) & 1),
            zz = 2 * z + ((ch >> 2) & 1);
        size_t ci = ((size_t)xx * s2 + yy) * s2 + zz;
        exists[l + 1][ci] = 1;
        addr[l + 1][ci] = base + ch;
      }
    }
  }
  return next_free;
}

// Batched dense->SVO: `count` grids, each 32768 uint16; outputs are
// `stride`-spaced. n_out[i] = node count or -1.
void dense_to_svo_batch(const uint16_t* grids, int64_t count, int32_t* out,
                        int64_t stride, int64_t* n_out) {
  for (int64_t i = 0; i < count; i++) {
    n_out[i] = dense_to_svo(grids + i * 32768, out + i * stride, stride);
  }
}

}  // extern "C"
