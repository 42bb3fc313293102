// Host-side serving runtime: paged-KV block manager + decode batch builder
// + split-KV planner.
//
// TPU-native counterpart of the reference's host-side C++ tier (L3): the
// reference plans split-KV work lists and drives allocator bookkeeping on
// host in C++ (vllm_xpu_kernels/flash_attn_interface.py:83-161 planning,
// csrc/utils/mem_alloc.cpp allocator).  On TPU the device-side kernels are
// Pallas; the per-step host loop (block tables, slot mappings, batch
// assembly — run every decode step for every batch) is the piece that
// belongs in native code.  Exposed as a C ABI consumed via ctypes
// (vllm_xpu_kernels_tpu/native.py); models/runtime.py falls back to the
// pure-Python implementation when the library is unavailable.
//
// Build: g++ -O2 -shared -fPIC -o libvxkhost.so host_runtime.cpp

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct BlockManager {
  int32_t block_size;
  std::vector<int32_t> free_blocks;                       // LIFO
  std::unordered_map<int64_t, std::vector<int32_t>> tables;
  std::unordered_map<int64_t, int64_t> lens;
};

inline int64_t cdiv(int64_t a, int64_t b) { return (a + b - 1) / b; }

}  // namespace

extern "C" {

void* vxk_bm_create(int32_t num_blocks, int32_t block_size) {
  auto* bm = new BlockManager();
  bm->block_size = block_size;
  bm->free_blocks.reserve(num_blocks);
  for (int32_t i = 0; i < num_blocks; ++i) {
    bm->free_blocks.push_back(num_blocks - 1 - i);
  }
  return bm;
}

void vxk_bm_destroy(void* h) { delete static_cast<BlockManager*>(h); }

int64_t vxk_bm_num_free(void* h) {
  return static_cast<BlockManager*>(h)->free_blocks.size();
}

// 0 on success, -1 = out of blocks
int32_t vxk_bm_allocate(void* h, int64_t seq_id, int64_t n_tokens) {
  auto* bm = static_cast<BlockManager*>(h);
  int64_t need = cdiv(n_tokens, bm->block_size);
  if (static_cast<int64_t>(bm->free_blocks.size()) < need) return -1;
  auto& tbl = bm->tables[seq_id];
  tbl.clear();
  for (int64_t i = 0; i < need; ++i) {
    tbl.push_back(bm->free_blocks.back());
    bm->free_blocks.pop_back();
  }
  bm->lens[seq_id] = n_tokens;
  return 0;
}

int32_t vxk_bm_release(void* h, int64_t seq_id) {
  auto* bm = static_cast<BlockManager*>(h);
  auto it = bm->tables.find(seq_id);
  if (it == bm->tables.end()) return -1;
  for (auto b = it->second.rbegin(); b != it->second.rend(); ++b) {
    bm->free_blocks.push_back(*b);
  }
  bm->tables.erase(it);
  bm->lens.erase(seq_id);
  return 0;
}

int64_t vxk_bm_seq_len(void* h, int64_t seq_id) {
  auto* bm = static_cast<BlockManager*>(h);
  auto it = bm->lens.find(seq_id);
  return it == bm->lens.end() ? -1 : it->second;
}

// Advance every sequence by one token and emit the decode-step arrays:
// positions[i] = new_len-1, slot_mapping[i] = global cache slot,
// kv_lens[i] = new_len, block_table row-major [n x max_blocks].
// Returns 0, or -1 if a table would overflow the free pool / max_blocks.
int32_t vxk_bm_build_decode_batch(void* h, const int64_t* seq_ids, int64_t n,
                                  int64_t max_blocks, int32_t* positions,
                                  int32_t* slot_mapping, int32_t* kv_lens,
                                  int32_t* block_table) {
  auto* bm = static_cast<BlockManager*>(h);
  const int32_t bs = bm->block_size;
  for (int64_t i = 0; i < n; ++i) {
    auto& tbl = bm->tables[seq_ids[i]];
    int64_t& len = bm->lens[seq_ids[i]];
    if (len == static_cast<int64_t>(tbl.size()) * bs) {
      if (bm->free_blocks.empty()) return -1;
      tbl.push_back(bm->free_blocks.back());
      bm->free_blocks.pop_back();
    }
    const int64_t pos = len;   // position of the new token
    len += 1;
    if (static_cast<int64_t>(tbl.size()) > max_blocks) return -1;
    positions[i] = static_cast<int32_t>(pos);
    slot_mapping[i] =
        tbl[pos / bs] * bs + static_cast<int32_t>(pos % bs);
    kv_lens[i] = static_cast<int32_t>(len);
    int32_t* row = block_table + i * max_blocks;
    std::memset(row, 0, sizeof(int32_t) * max_blocks);
    std::memcpy(row, tbl.data(), sizeof(int32_t) * tbl.size());
  }
  return 0;
}

// Prefill slot mapping for one sequence: slots[p] for p in [0, n_tokens).
int32_t vxk_bm_prefill_slots(void* h, int64_t seq_id, int64_t n_tokens,
                             int32_t* slots) {
  auto* bm = static_cast<BlockManager*>(h);
  auto it = bm->tables.find(seq_id);
  if (it == bm->tables.end()) return -1;
  const int32_t bs = bm->block_size;
  for (int64_t p = 0; p < n_tokens; ++p) {
    slots[p] = it->second[p / bs] * bs + static_cast<int32_t>(p % bs);
  }
  return 0;
}

// Split-KV decode planner (mirror of the Python build_decode_split_plan;
// reference contract docs/group_split_kv_design.md:93-106).
void vxk_build_decode_split_plan(const int32_t* kv_lens, int64_t n,
                                 int32_t kv_tile, int32_t num_kv_splits,
                                 int32_t num_cores, int32_t num_heads_kv,
                                 int32_t* splits_out) {
  int64_t total_tiles = 0;
  std::vector<int64_t> tiles(n);
  for (int64_t i = 0; i < n; ++i) {
    tiles[i] = cdiv(kv_lens[i] > 0 ? kv_lens[i] : 1, kv_tile);
    total_tiles += tiles[i];
  }
  int64_t min_wgs = num_cores * 2 / (num_heads_kv > 0 ? num_heads_kv : 1);
  if (min_wgs < 1) min_wgs = 1;
  int64_t target = total_tiles / min_wgs;
  if (target < 4) target = 4;
  const int64_t min_blocks = kv_tile <= 64 ? 32 : 128;
  for (int64_t i = 0; i < n; ++i) {
    if (tiles[i] <= target || tiles[i] < min_blocks || num_kv_splits <= 1) {
      splits_out[i] = 1;
    } else {
      int64_t s = cdiv(tiles[i], target);
      if (s > num_kv_splits) s = num_kv_splits;
      if (s > tiles[i]) s = tiles[i];
      splits_out[i] = static_cast<int32_t>(s);
    }
  }
}

}  // extern "C"
