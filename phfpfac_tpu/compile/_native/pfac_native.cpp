// Native host compiler for phfpfac_tpu: PFAC trie construction and
// FFDM perfect-hash packing.
//
// Semantics contracts (must match the NumPy reference implementations
// in compile/trie.py and compile/phf.py, which in turn replicate
// CreateTable/create_table_reorder.c:277-378 and PHF/phf.c:151-291 of
// the reference):
//
//   * trie: patterns arrive sorted; final state for pattern i is i
//     (duplicates overwrite), initial state = k+1, interiors from k+2
//     in insertion order; dense int32 table [state][256], -1 = dead.
//   * FFDM: keys = state*256+ch for live transitions; rows of `width`;
//     rows processed in descending fullness, ties by ascending row
//     number; first-fit displacement from -min_col; r[row]=offset,
//     HT[slot]=row, val[slot]=next; HTSize = last occupied slot + 1.
//
// The C ABI below is allocation-free: Python (ctypes) allocates
// upper-bound buffers, C++ fills them and returns sizes.  Exact-parity
// tests in tests/test_native.py diff every table against the NumPy
// path.

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

namespace {
constexpr int kCharSet = 256;
}

extern "C" {

// Build the failureless-AC dense table for one shard.
//
//   blob/offsets: concatenated pattern bytes; pattern i occupies
//                 blob[offsets[i], offsets[i+1]).  Patterns must be
//                 pre-sorted (memcmp order, shorter-first ties).
//   table:        caller buffer [cap_states * 256] int32, pre-filled -1.
//   cap_states:   must be >= k + 2 + total_pattern_bytes.
//   max_pat_len:  out param.
//
// Returns state_count, or -1 on capacity overflow.
int64_t pfac_build_trie(const uint8_t* blob, const int64_t* offsets,
                        int64_t n_patterns, int32_t* table,
                        int64_t cap_states, int32_t* max_pat_len) {
  const int64_t initial_state = n_patterns + 1;
  int64_t state_count = initial_state + 1;
  int32_t maxlen = 0;
  if (state_count > cap_states) return -1;

  for (int64_t i = 0; i < n_patterns; ++i) {
    const int64_t lo = offsets[i], hi = offsets[i + 1];
    const int64_t len = hi - lo;
    if (len <= 0) return -2;  // empty patterns unsupported
    if (len > maxlen) maxlen = static_cast<int32_t>(len);
    int64_t state = initial_state;
    for (int64_t j = lo; j < hi - 1; ++j) {
      const int c = blob[j];
      int32_t nxt = table[state * kCharSet + c];
      if (nxt == -1) {
        if (state_count >= cap_states) return -1;
        table[state * kCharSet + c] = static_cast<int32_t>(state_count);
        state = state_count++;
      } else {
        state = nxt;
      }
    }
    table[state * kCharSet + blob[hi - 1]] = static_cast<int32_t>(i);
  }
  *max_pat_len = maxlen;
  return state_count;
}

// FFDM perfect-hash packing of a dense table.
//
//   table:     int32 [state_num * 256], -1 = dead.
//   width:     power of two.
//   r:         caller buffer [(state_num*256)/width + 1] int32; filled
//              with displacements (-1 for empty rows).
//   ht, val:   caller buffers [ht_cap] int32 (pre-filled -1).
//   stats:     out int64[4] = {num_keys, max_key, max_offset, ht_size}.
//
// Returns ht_size, or -1 when a row cannot be placed within ht_cap
// (caller should raise "try increasing the hash table size").
int64_t pfac_ffdm(const int32_t* table, int64_t state_num, int64_t width,
                  int32_t* r, int64_t r_len, int32_t* ht, int32_t* val,
                  int64_t ht_cap, int64_t* stats) {
  const int64_t n_keys_space = state_num * kCharSet;
  // collect keys per row; rows are contiguous since keys ascend
  struct Row {
    int32_t number;
    std::vector<int32_t> cols;
    std::vector<int32_t> vals;
  };
  std::vector<Row> rows;
  int64_t num_keys = 0, max_key = 0;
  int64_t cur_row = -1;
  for (int64_t key = 0; key < n_keys_space; ++key) {
    const int32_t v = table[key];
    if (v < 0) continue;
    const int64_t rowno = key / width;
    if (rowno != cur_row) {
      rows.push_back(Row{static_cast<int32_t>(rowno), {}, {}});
      cur_row = rowno;
    }
    rows.back().cols.push_back(static_cast<int32_t>(key % width));
    rows.back().vals.push_back(v);
    ++num_keys;
    max_key = key;
  }
  std::fill(r, r + r_len, -1);

  // descending fullness, ties by ascending row number (stable)
  std::vector<int32_t> order(rows.size());
  for (size_t i = 0; i < order.size(); ++i) order[i] = static_cast<int32_t>(i);
  std::stable_sort(order.begin(), order.end(), [&](int32_t a, int32_t b) {
    return rows[a].cols.size() > rows[b].cols.size();
  });

  // occupancy bitset over ht slots
  std::vector<uint64_t> occ((ht_cap + 63) / 64 + 1, 0);
  auto occupied = [&](int64_t s) {
    return (occ[s >> 6] >> (s & 63)) & 1u;
  };
  auto occupy = [&](int64_t s) { occ[s >> 6] |= (uint64_t{1} << (s & 63)); };
  // first slot >= s that is free (word-scan)
  auto next_free = [&](int64_t s) {
    int64_t w = s >> 6;
    uint64_t m = ~occ[w] & (~uint64_t{0} << (s & 63));
    while (m == 0) m = ~occ[++w];
    return (w << 6) + static_cast<int64_t>(__builtin_ctzll(m));
  };

  // Two EXACT accelerations of the reference's first-fit scan
  // (phf.c:184-222 tries every offset from -cols[0] upward):
  //  * first_free: slots below it are all occupied, so offsets with
  //    offset+cols[0] < first_free are provably blocked — the long
  //    tail of 1-col rows lands at the first hole instead of
  //    rescanning the table front (this removes the quadratic term);
  //  * run jump: when column c is blocked at slot offset+c, every
  //    offset until that occupied run ends is blocked at c too, so
  //    jump straight past it.
  int64_t max_offset = 0, max_slot = -1;
  const int64_t max_off_excl = ht_cap - width;
  int64_t first_free = 0;
  for (int32_t oi : order) {
    const Row& row = rows[oi];
    while (first_free < ht_cap && occupied(first_free)) ++first_free;
    const int64_t base = -static_cast<int64_t>(row.cols[0]);
    int64_t offset = std::max(base, first_free - row.cols[0]);
    while (offset < max_off_excl) {
      bool ok = true;
      for (int32_t c : row.cols) {
        const int64_t s = offset + c;
        if (occupied(s)) {
          offset = next_free(s) - c;
          ok = false;
          break;
        }
      }
      if (ok) break;
    }
    if (offset >= max_off_excl) return -1;
    r[row.number] = static_cast<int32_t>(offset);
    for (size_t i = 0; i < row.cols.size(); ++i) {
      const int64_t slot = offset + row.cols[i];
      occupy(slot);
      ht[slot] = row.number;
      val[slot] = row.vals[i];
      if (slot > max_slot) max_slot = slot;
    }
    if (offset > max_offset) max_offset = offset;
  }

  const int64_t ht_size = max_slot + 1;
  stats[0] = num_keys;
  stats[1] = max_key;
  stats[2] = max_offset;
  stats[3] = ht_size;
  return ht_size;
}

}  // extern "C"
