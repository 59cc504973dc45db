// Native host-side graph kernels for incagg_gnn_tpu.
//
// Plays the role of the reference's native layer (csrc/cpu/relabel_cpu.cpp and
// the torch-sparse METIS binding used by metis.py): one-hop subgraph
// relabeling (full IB+OB variant and the IB-only "within batch" variant used
// by the Reverb loader) and balanced locality partitioning.  Everything works
// on plain C arrays so Python binds via ctypes over numpy buffers — no torch,
// no pybind11.
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC graph_ops.cpp -o libincagg_graph.so

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <queue>
#include <random>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// One-hop relabel, full variant (reference semantics: relabel_cpu.cpp:5-108).
//
// Given the global CSR (rowptr int64, col int32) and batch node ids idx, emit
// the induced one-hop subgraph with local ids: rows are the idx nodes in
// order; cols are relabeled so idx nodes map to their position and new
// out-of-batch (OB) neighbors get ids num_idx, num_idx+1, ... in first-seen
// order.  out_n_id receives idx followed by the OB global ids.
//
// node_map is caller-provided scratch of n int64s filled with -1 on entry;
// it is restored to -1 before returning (amortized O(touched)).
// Returns the total number of nodes in out_n_id (num_idx + num_ob).
int64_t relabel_one_hop(const int64_t* rowptr, const int32_t* col,
                        const float* value,  // nullable
                        const int64_t* idx, int64_t num_idx, int64_t n,
                        int64_t* node_map, int64_t* out_rowptr,
                        int32_t* out_col, float* out_value,
                        int64_t* out_n_id) {
  for (int64_t i = 0; i < num_idx; ++i) {
    node_map[idx[i]] = i;
    out_n_id[i] = idx[i];
  }
  int64_t next_id = num_idx;
  int64_t off = 0;
  out_rowptr[0] = 0;
  for (int64_t i = 0; i < num_idx; ++i) {
    const int64_t v = idx[i];
    for (int64_t j = rowptr[v]; j < rowptr[v + 1]; ++j) {
      const int64_t w = col[j];
      int64_t c = node_map[w];
      if (c < 0) {
        c = next_id++;
        node_map[w] = c;
        out_n_id[c] = w;
      }
      out_col[off] = (int32_t)c;
      if (value) out_value[off] = value[j];
      ++off;
    }
    out_rowptr[i + 1] = off;
  }
  // restore scratch
  for (int64_t i = 0; i < next_id; ++i) node_map[out_n_id[i]] = -1;
  return next_id;
}

// IB-only variant (reference semantics: relabel_cpu.cpp:112-214): edges whose
// endpoint is outside idx are dropped entirely.  Returns the number of kept
// edges.
int64_t relabel_one_hop_within_batch(const int64_t* rowptr, const int32_t* col,
                                     const float* value,  // nullable
                                     const int64_t* idx, int64_t num_idx,
                                     int64_t n, int64_t* node_map,
                                     int64_t* out_rowptr, int32_t* out_col,
                                     float* out_value) {
  for (int64_t i = 0; i < num_idx; ++i) node_map[idx[i]] = i;
  int64_t off = 0;
  out_rowptr[0] = 0;
  for (int64_t i = 0; i < num_idx; ++i) {
    const int64_t v = idx[i];
    for (int64_t j = rowptr[v]; j < rowptr[v + 1]; ++j) {
      const int64_t c = node_map[col[j]];
      if (c >= 0) {
        out_col[off] = (int32_t)c;
        if (value) out_value[off] = value[j];
        ++off;
      }
    }
    out_rowptr[i + 1] = off;
  }
  for (int64_t i = 0; i < num_idx; ++i) node_map[idx[i]] = -1;
  return off;
}

// ---------------------------------------------------------------------------
// Balanced locality partitioning (role of METIS_PartGraphKway in the
// reference, metis.py:31).  Greedy BFS graph growing from low-degree seeds
// followed by FM-style boundary refinement sweeps.
void partition(const int64_t* rowptr, const int32_t* col, int64_t n,
               int32_t num_parts, int32_t refine_passes, uint64_t seed,
               int64_t* out_cluster) {
  const int64_t target = (n + num_parts - 1) / num_parts;
  std::fill(out_cluster, out_cluster + n, (int64_t)-1);

  // seeds ordered by degree ascending (peripheral nodes first)
  std::vector<int64_t> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    return (rowptr[a + 1] - rowptr[a]) < (rowptr[b + 1] - rowptr[b]);
  });

  std::vector<int64_t> frontier, next_frontier;
  int64_t seed_cursor = 0;
  int64_t assigned = 0;
  for (int32_t part = 0; part < num_parts && assigned < n; ++part) {
    int64_t budget = std::min<int64_t>(target, n - assigned);
    int64_t size = 0;
    while (size < budget) {
      while (seed_cursor < n && out_cluster[order[seed_cursor]] >= 0) ++seed_cursor;
      if (seed_cursor >= n) break;
      const int64_t s = order[seed_cursor];
      out_cluster[s] = part;
      ++size;
      frontier.assign(1, s);
      // BFS growth of this component until budget
      while (size < budget && !frontier.empty()) {
        next_frontier.clear();
        for (int64_t v : frontier) {
          for (int64_t j = rowptr[v]; j < rowptr[v + 1] && size < budget; ++j) {
            const int64_t w = col[j];
            if (out_cluster[w] < 0) {
              out_cluster[w] = part;
              ++size;
              next_frontier.push_back(w);
            }
          }
          if (size >= budget) break;
        }
        frontier.swap(next_frontier);
      }
    }
    assigned += size;
  }
  for (int64_t v = 0; v < n; ++v)
    if (out_cluster[v] < 0) out_cluster[v] = num_parts - 1;

  // FM-style refinement: move boundary nodes to their majority-neighbor part
  // when balance allows.
  if (refine_passes > 0 && num_parts > 1) {
    std::vector<int64_t> sizes(num_parts, 0);
    for (int64_t v = 0; v < n; ++v) ++sizes[out_cluster[v]];
    const int64_t max_size = (int64_t)(target * 1.05) + 1;
    std::vector<int64_t> cnt(num_parts, 0);
    std::vector<int32_t> touched;
    for (int32_t pass = 0; pass < refine_passes; ++pass) {
      int64_t moved = 0;
      for (int64_t v = 0; v < n; ++v) {
        const int64_t cv = out_cluster[v];
        touched.clear();
        for (int64_t j = rowptr[v]; j < rowptr[v + 1]; ++j) {
          const int32_t pc = (int32_t)out_cluster[col[j]];
          if (cnt[pc]++ == 0) touched.push_back(pc);
        }
        int32_t best = (int32_t)cv;
        int64_t best_cnt = cnt[cv];
        for (int32_t pc : touched) {
          if (cnt[pc] > best_cnt && sizes[pc] < max_size) {
            best = pc;
            best_cnt = cnt[pc];
          }
        }
        for (int32_t pc : touched) cnt[pc] = 0;
        if (best != (int32_t)cv && sizes[cv] > 1) {
          --sizes[cv];
          ++sizes[best];
          out_cluster[v] = best;
          ++moved;
        }
      }
      if (moved == 0) break;
    }
  }
}

// ---------------------------------------------------------------------------
// Per-row uniform neighbor sampling without replacement, capping each row of a
// local CSR at num_neighbors entries (fixes the reference's broken python
// sample_neighbors, loader.py:32-93).  Outputs a compacted CSR.
// Returns the number of sampled edges.
int64_t sample_neighbors(const int64_t* rowptr, const int32_t* col,
                         const float* value,  // nullable
                         int64_t num_rows, int32_t num_neighbors,
                         uint64_t seed, int64_t* out_rowptr, int32_t* out_col,
                         float* out_value) {
  std::mt19937_64 rng(seed);
  int64_t off = 0;
  out_rowptr[0] = 0;
  std::vector<int64_t> pick;
  for (int64_t i = 0; i < num_rows; ++i) {
    const int64_t start = rowptr[i], end = rowptr[i + 1];
    const int64_t deg = end - start;
    if (deg <= num_neighbors) {
      for (int64_t j = start; j < end; ++j) {
        out_col[off] = col[j];
        if (value) out_value[off] = value[j];
        ++off;
      }
    } else {
      // Floyd's algorithm for a sorted-ish sample without replacement
      pick.clear();
      for (int64_t k = deg - num_neighbors; k < deg; ++k) {
        const int64_t t = (int64_t)(rng() % (uint64_t)(k + 1));
        if (std::find(pick.begin(), pick.end(), t) == pick.end())
          pick.push_back(t);
        else
          pick.push_back(k);
      }
      std::sort(pick.begin(), pick.end());
      for (int64_t t : pick) {
        out_col[off] = col[start + t];
        if (value) out_value[off] = value[start + t];
        ++off;
      }
    }
    out_rowptr[i + 1] = off;
  }
  return off;
}

}  // extern "C"
