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

#ifdef _OPENMP
#include <omp.h>
#endif

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
#pragma omp parallel for schedule(static) if (num_idx > 4096)
  for (int64_t i = 0; i < num_idx; ++i) node_map[idx[i]] = i;
  out_rowptr[0] = 0;
  if (num_idx > 4096) {
    // two-pass parallel variant: per-row kept-edge counts, prefix sum, then
    // an independent fill per row — identical output to the serial path
    // (edges keep their CSR order within each row)
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < num_idx; ++i) {
      const int64_t v = idx[i];
      int64_t cnt = 0;
      for (int64_t j = rowptr[v]; j < rowptr[v + 1]; ++j)
        cnt += node_map[col[j]] >= 0;
      out_rowptr[i + 1] = cnt;
    }
    for (int64_t i = 0; i < num_idx; ++i) out_rowptr[i + 1] += out_rowptr[i];
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < num_idx; ++i) {
      const int64_t v = idx[i];
      int64_t off = out_rowptr[i];
      for (int64_t j = rowptr[v]; j < rowptr[v + 1]; ++j) {
        const int64_t c = node_map[col[j]];
        if (c >= 0) {
          out_col[off] = (int32_t)c;
          if (value) out_value[off] = value[j];
          ++off;
        }
      }
    }
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < num_idx; ++i) node_map[idx[i]] = -1;
    return out_rowptr[num_idx];
  }
  int64_t off = 0;
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
// Multilevel partitioning (METIS-like): coarsen by heavy-edge matching,
// partition the coarsest graph with greedy growing, then uncoarsen with
// FM-style refinement at every level.  This is the same three-phase scheme
// METIS_PartGraphKway uses (the reference calls it through torch-sparse,
// metis.py:31); quality on locality-rich graphs is far better than one-shot
// greedy growing.

namespace ml {

struct Graph {
  std::vector<int64_t> rowptr;
  std::vector<int32_t> col;
  std::vector<int64_t> wgt;    // edge weights (merged multiplicities)
  std::vector<int64_t> vwgt;   // vertex weights (coarse node sizes)
  int64_t n() const { return (int64_t)rowptr.size() - 1; }
};

// Heavy-edge matching: visit vertices in random order, match with the
// heaviest unmatched neighbor; produce coarse map.
static int64_t match(const Graph& g, std::mt19937_64& rng,
                     std::vector<int64_t>& cmap) {
  const int64_t n = g.n();
  std::vector<int64_t> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::shuffle(order.begin(), order.end(), rng);
  cmap.assign(n, -1);
  int64_t nc = 0;
  for (int64_t v : order) {
    if (cmap[v] >= 0) continue;
    int64_t best = -1, best_w = -1;
    for (int64_t j = g.rowptr[v]; j < g.rowptr[v + 1]; ++j) {
      const int64_t u = g.col[j];
      if (u != v && cmap[u] < 0 && g.wgt[j] > best_w) {
        best = u;
        best_w = g.wgt[j];
      }
    }
    cmap[v] = nc;
    if (best >= 0) cmap[best] = nc;
    ++nc;
  }
  return nc;
}

// Build the coarse graph given the matching map.
static Graph coarsen(const Graph& g, const std::vector<int64_t>& cmap,
                     int64_t nc) {
  Graph c;
  c.vwgt.assign(nc, 0);
  const int64_t n = g.n();
  for (int64_t v = 0; v < n; ++v) c.vwgt[cmap[v]] += g.vwgt[v];
  // accumulate edges with a per-coarse-row dense scratch
  std::vector<int64_t> acc(nc, 0);
  std::vector<int32_t> touched;
  // first pass: count, second: fill — do in one pass with temporary storage
  std::vector<std::pair<int32_t, int64_t>> edges;  // (ccol, w) per crow batch
  c.rowptr.assign(nc + 1, 0);
  // group fine vertices by coarse id
  std::vector<int64_t> head(nc, -1), nxt(n);
  for (int64_t v = 0; v < n; ++v) {
    nxt[v] = head[cmap[v]];
    head[cmap[v]] = v;
  }
  std::vector<int32_t> cols_tmp;
  std::vector<int64_t> w_tmp;
  for (int64_t cv = 0; cv < nc; ++cv) {
    touched.clear();
    for (int64_t v = head[cv]; v >= 0; v = nxt[v]) {
      for (int64_t j = g.rowptr[v]; j < g.rowptr[v + 1]; ++j) {
        const int32_t cu = (int32_t)cmap[g.col[j]];
        if (cu == cv) continue;  // drop self loops
        if (acc[cu] == 0) touched.push_back(cu);
        acc[cu] += g.wgt[j];
      }
    }
    c.rowptr[cv + 1] = c.rowptr[cv] + (int64_t)touched.size();
    for (int32_t cu : touched) {
      cols_tmp.push_back(cu);
      w_tmp.push_back(acc[cu]);
      acc[cu] = 0;
    }
  }
  c.col = std::move(cols_tmp);
  c.wgt = std::move(w_tmp);
  return c;
}

// Greedy weighted graph growing on the (coarsest) graph.
static void grow(const Graph& g, int32_t num_parts, std::mt19937_64& rng,
                 std::vector<int64_t>& part) {
  const int64_t n = g.n();
  int64_t total = 0;
  for (int64_t v = 0; v < n; ++v) total += g.vwgt[v];
  const int64_t target = (total + num_parts - 1) / num_parts;
  part.assign(n, -1);
  std::vector<int64_t> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    return (g.rowptr[a + 1] - g.rowptr[a]) < (g.rowptr[b + 1] - g.rowptr[b]);
  });
  int64_t cursor = 0;
  std::vector<int64_t> frontier, next_frontier;
  for (int32_t p = 0; p < num_parts; ++p) {
    int64_t size = 0;
    while (size < target) {
      while (cursor < n && part[order[cursor]] >= 0) ++cursor;
      if (cursor >= n) break;
      const int64_t s = order[cursor];
      part[s] = p;
      size += g.vwgt[s];
      frontier.assign(1, s);
      while (size < target && !frontier.empty()) {
        next_frontier.clear();
        for (int64_t v : frontier) {
          for (int64_t j = g.rowptr[v]; j < g.rowptr[v + 1] && size < target; ++j) {
            const int64_t w = g.col[j];
            if (part[w] < 0) {
              part[w] = p;
              size += g.vwgt[w];
              next_frontier.push_back(w);
            }
          }
          if (size >= target) break;
        }
        frontier.swap(next_frontier);
      }
    }
  }
  for (int64_t v = 0; v < n; ++v)
    if (part[v] < 0) part[v] = num_parts - 1;
}

// Weighted FM-style refinement with vertex-weight balance constraint.
static void refine(const Graph& g, int32_t num_parts, int32_t passes,
                   std::vector<int64_t>& part) {
  const int64_t n = g.n();
  if (num_parts <= 1) return;
  std::vector<int64_t> sizes(num_parts, 0);
  int64_t total = 0;
  for (int64_t v = 0; v < n; ++v) {
    sizes[part[v]] += g.vwgt[v];
    total += g.vwgt[v];
  }
  const int64_t target = (total + num_parts - 1) / num_parts;
  const int64_t max_size = (int64_t)(target * 1.03) + 1;
  std::vector<int64_t> cnt(num_parts, 0);
  std::vector<int32_t> touched;
  for (int32_t pass = 0; pass < passes; ++pass) {
    int64_t moved = 0;
    for (int64_t v = 0; v < n; ++v) {
      const int64_t pv = part[v];
      touched.clear();
      for (int64_t j = g.rowptr[v]; j < g.rowptr[v + 1]; ++j) {
        const int32_t pu = (int32_t)part[g.col[j]];
        if (cnt[pu] == 0) touched.push_back(pu);
        cnt[pu] += g.wgt[j];
      }
      int32_t best = (int32_t)pv;
      int64_t best_w = cnt[pv];
      for (int32_t pu : touched) {
        if (cnt[pu] > best_w && sizes[pu] + g.vwgt[v] <= max_size) {
          best = pu;
          best_w = cnt[pu];
        }
      }
      for (int32_t pu : touched) cnt[pu] = 0;
      if (best != (int32_t)pv && sizes[pv] - g.vwgt[v] > 0) {
        sizes[pv] -= g.vwgt[v];
        sizes[best] += g.vwgt[v];
        part[v] = best;
        ++moved;
      }
    }
    if (moved == 0) break;
  }
}

}  // namespace ml

extern "C" void partition_multilevel(const int64_t* rowptr, const int32_t* col,
                                     int64_t n, int32_t num_parts,
                                     int32_t refine_passes, uint64_t seed,
                                     int64_t* out_cluster) {
  std::mt19937_64 rng(seed);
  // build level-0 graph with unit weights
  std::vector<ml::Graph> levels(1);
  levels[0].rowptr.assign(rowptr, rowptr + n + 1);
  levels[0].col.assign(col, col + rowptr[n]);
  levels[0].wgt.assign(rowptr[n], 1);
  levels[0].vwgt.assign(n, 1);
  std::vector<std::vector<int64_t>> cmaps;

  // coarsen until small or no progress
  const int64_t stop_n = std::max<int64_t>(4 * (int64_t)num_parts, 256);
  while (levels.back().n() > stop_n) {
    std::vector<int64_t> cmap;
    const int64_t nc = ml::match(levels.back(), rng, cmap);
    if (nc >= levels.back().n() * 0.95) break;  // matching stalled
    ml::Graph cg = ml::coarsen(levels.back(), cmap, nc);
    cmaps.push_back(std::move(cmap));
    levels.push_back(std::move(cg));
  }

  // initial partition at the coarsest level + refine
  std::vector<int64_t> part;
  ml::grow(levels.back(), num_parts, rng, part);
  ml::refine(levels.back(), num_parts, refine_passes + 2, part);

  // uncoarsen with refinement at each level
  for (int64_t lvl = (int64_t)cmaps.size() - 1; lvl >= 0; --lvl) {
    const std::vector<int64_t>& cmap = cmaps[lvl];
    std::vector<int64_t> fine(cmap.size());
    for (size_t v = 0; v < cmap.size(); ++v) fine[v] = part[cmap[v]];
    part = std::move(fine);
    ml::refine(levels[lvl], num_parts, refine_passes, part);
  }
  std::copy(part.begin(), part.end(), out_cluster);
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

// ---------------------------------------------------------------------------
// CSR -> ELL + COO-overflow conversion (the hybrid aggregation format,
// ops/ell.py).  Fills caller-allocated buffers: ell_cols/ell_vals are
// [num_rows_pad * k] row-major (caller pre-fills with trash/zero); overflow
// arrays receive edges beyond k per row.  Returns the overflow count.
int64_t csr_to_ell(const int64_t* rowptr, const int32_t* col,
                   const float* value,  // nullable -> 1.0
                   int64_t r, int64_t k, int32_t* ell_cols, float* ell_vals,
                   int32_t* ovf_rows, int32_t* ovf_cols, float* ovf_vals,
                   int64_t ovf_cap) {
  int64_t ovf = 0;
#pragma omp parallel for schedule(static) if (r > 8192)
  for (int64_t i = 0; i < r; ++i) {
    const int64_t start = rowptr[i], end = rowptr[i + 1];
    const int64_t take = std::min<int64_t>(end - start, k);
    for (int64_t j = 0; j < take; ++j) {
      ell_cols[i * k + j] = col[start + j];
      ell_vals[i * k + j] = value ? value[start + j] : 1.0f;
    }
  }
  // overflow pass (serial: preserves sorted-row order for the COO tail)
  for (int64_t i = 0; i < r; ++i) {
    const int64_t start = rowptr[i], end = rowptr[i + 1];
    for (int64_t j = start + k; j < end; ++j) {
      if (ovf >= ovf_cap) return -1;  // caller must grow and retry
      ovf_rows[ovf] = (int32_t)i;
      ovf_cols[ovf] = col[j];
      ovf_vals[ovf] = value ? value[j] : 1.0f;
      ++ovf;
    }
  }
  return ovf;
}

// Hybrid ELL of the TRANSPOSE of a CSR, built directly (no intermediate
// transposed CSR): result row j collects the sources i of edges (i -> j).
// ell_cols/ell_vals are caller-prefilled [>=c x k] padded slabs; overflow is
// written at counting-sort positions, so ovf_rows comes out sorted (the
// segment-sum path requires it).  Returns the overflow count, or -1 when it
// would exceed ovf_cap.
// When t2f is non-null (prefilled -1, length c*k + ovf_cap) it receives, for
// every transpose slot, the FLAT position of the same edge in the *forward*
// hybrid layout (row-major ELL [r*k_fwd] then row-sorted overflow) — the
// static permutation that lets a transpose-side consumer (e.g. the attention
// backward) gather per-edge values computed on the forward side, with no
// scatter.  k_fwd must then be the forward ELL width.
int64_t csr_to_ell_t(const int64_t* rowptr, const int32_t* col,
                     const float* value,  // nullable -> 1.0
                     int64_t r, int64_t c, int64_t k, int32_t* ell_cols,
                     float* ell_vals, int32_t* ovf_rows, int32_t* ovf_cols,
                     float* ovf_vals, int64_t ovf_cap, int64_t k_fwd,
                     int64_t fwd_ovf_base,  // flat offset of the fwd overflow
                                            // region (= padded_fwd_rows * k_fwd)
                     int64_t* t2f) {
  const int64_t nnz = rowptr[r];
  std::vector<int64_t> fwd_ovf_start;
  if (t2f) {
    fwd_ovf_start.resize(r + 1, 0);
    for (int64_t i = 0; i < r; ++i)
      fwd_ovf_start[i + 1] = fwd_ovf_start[i] +
          std::max<int64_t>(rowptr[i + 1] - rowptr[i] - k_fwd, 0);
  }
#ifdef _OPENMP
  // cap the team by the work so the O(T*c) count matrix and its serial scan
  // stay proportional to the counting they parallelize
  int T = nnz >= (int64_t)1 << 17
              ? (int)std::min<int64_t>(omp_get_max_threads(), nnz >> 16)
              : 1;
#else
  int T = 1;
#endif
#ifdef _OPENMP
  if (T > 1) {
    // Chunked parallel counting sort, bit-identical to the serial placement:
    // edges are ranked within their destination column in global edge order;
    // row-contiguous chunks keep that order, so rank = (edges of this column
    // in earlier chunks) + (in-chunk running count).
    std::vector<int64_t> rb(T + 1, r);  // row-chunk bounds, ~equal edges
    rb[0] = 0;
    for (int t = 1; t < T; ++t) {
      int64_t b = std::lower_bound(rowptr, rowptr + r + 1, nnz * t / T) -
                  rowptr;
      rb[t] = std::min(std::max(b, rb[t - 1]), r);
    }
    std::vector<int64_t> cnt((size_t)T * c, 0);
    // worksharing over chunk ids (not omp_get_thread_num()): correct even
    // when the runtime grants a smaller team than requested
#pragma omp parallel for num_threads(T) schedule(static, 1)
    for (int t = 0; t < T; ++t) {
      int64_t* my = cnt.data() + (size_t)t * c;
      for (int64_t e = rowptr[rb[t]]; e < rowptr[rb[t + 1]]; ++e) ++my[col[e]];
    }
    std::vector<int64_t> ovf_start(c + 1, 0);
    for (int64_t j = 0; j < c; ++j) {
      int64_t deg = 0, run = 0;
      for (int t = 0; t < T; ++t) {  // exclusive scan: chunk base ranks
        int64_t& s = cnt[(size_t)t * c + j];
        const int64_t v = s;
        s = run;
        run += v;
        deg += v;
      }
      ovf_start[j + 1] = ovf_start[j] + std::max<int64_t>(deg - k, 0);
    }
    if (ovf_start[c] > ovf_cap) return -1;
#pragma omp parallel for num_threads(T) schedule(static, 1)
    for (int t = 0; t < T; ++t) {
      int64_t* cursor = cnt.data() + (size_t)t * c;
      for (int64_t i = rb[t]; i < rb[t + 1]; ++i) {
        for (int64_t e = rowptr[i]; e < rowptr[i + 1]; ++e) {
          const int64_t j = col[e];
          const int64_t s = cursor[j]++;
          const float v = value ? value[e] : 1.0f;
          int64_t bwd_flat;
          if (s < k) {
            ell_cols[j * k + s] = (int32_t)i;
            ell_vals[j * k + s] = v;
            bwd_flat = j * k + s;
          } else {
            const int64_t p = ovf_start[j] + (s - k);
            ovf_rows[p] = (int32_t)j;
            ovf_cols[p] = (int32_t)i;
            ovf_vals[p] = v;
            bwd_flat = c * k + p;
          }
          if (t2f) {
            const int64_t p_row = e - rowptr[i];
            t2f[bwd_flat] = p_row < k_fwd
                ? i * k_fwd + p_row
                : fwd_ovf_base + fwd_ovf_start[i] + (p_row - k_fwd);
          }
        }
      }
    }
    return ovf_start[c];
  }
#endif
  std::vector<int64_t> deg(c, 0);
  for (int64_t e = 0; e < nnz; ++e) ++deg[col[e]];
  std::vector<int64_t> ovf_start(c + 1, 0);
  for (int64_t j = 0; j < c; ++j)
    ovf_start[j + 1] = ovf_start[j] + std::max<int64_t>(deg[j] - k, 0);
  if (ovf_start[c] > ovf_cap) return -1;
  std::vector<int64_t>& cursor = deg;  // reuse as per-row slot cursor
  std::fill(cursor.begin(), cursor.end(), 0);
  for (int64_t i = 0; i < r; ++i) {
    for (int64_t e = rowptr[i]; e < rowptr[i + 1]; ++e) {
      const int64_t j = col[e];
      const int64_t s = cursor[j]++;
      const float v = value ? value[e] : 1.0f;
      int64_t bwd_flat;
      if (s < k) {
        ell_cols[j * k + s] = (int32_t)i;
        ell_vals[j * k + s] = v;
        bwd_flat = j * k + s;
      } else {
        const int64_t p = ovf_start[j] + (s - k);
        ovf_rows[p] = (int32_t)j;
        ovf_cols[p] = (int32_t)i;
        ovf_vals[p] = v;
        bwd_flat = c * k + p;
      }
      if (t2f) {
        const int64_t p_row = e - rowptr[i];
        t2f[bwd_flat] = p_row < k_fwd
            ? i * k_fwd + p_row
            : fwd_ovf_base + fwd_ovf_start[i] + (p_row - k_fwd);
      }
    }
  }
  return ovf_start[c];
}

// CSR transpose via counting sort: [r x c] -> [c x r].
void transpose_csr(const int64_t* rowptr, const int32_t* col,
                   const float* value,  // nullable
                   int64_t r, int64_t c, int64_t* t_rowptr, int32_t* t_col,
                   float* t_val) {
  const int64_t nnz = rowptr[r];
  std::fill(t_rowptr, t_rowptr + c + 1, 0);
  for (int64_t e = 0; e < nnz; ++e) ++t_rowptr[col[e] + 1];
  for (int64_t i = 0; i < c; ++i) t_rowptr[i + 1] += t_rowptr[i];
  std::vector<int64_t> cursor(t_rowptr, t_rowptr + c);
  for (int64_t i = 0; i < r; ++i) {
    for (int64_t e = rowptr[i]; e < rowptr[i + 1]; ++e) {
      const int64_t pos = cursor[col[e]]++;
      t_col[pos] = (int32_t)i;
      if (value) t_val[pos] = value[e];
    }
  }
}


// ---------------------------------------------------------------------------
// CSR -> dense 128x128 tiles + remainder CSR (the block-dense MXU tier,
// ops/block.py).  Two phases so Python can lay out the padded tile buffer
// between them (runs per row-block rounded to the kernel's LANES):
//
//   blocks_count: per row-block, the number of dense tiles (blocks holding
//     >= thresh edges) and per-row remainder degrees.
//   blocks_fill:  writes tile values (f32 or bf16-RNE), per-tile column-
//     block ids, and the remainder col/val at exact CSR offsets.
//
// Both parallelize over row-blocks (disjoint output ranges); scratch is a
// per-thread [ncb] count/slot map reset via a touched list.

static inline uint16_t f32_to_bf16(float f) {
  uint32_t x;
  std::memcpy(&x, &f, 4);
  x += 0x7FFFu + ((x >> 16) & 1);  // round to nearest even
  return (uint16_t)(x >> 16);
}

int64_t blocks_count(const int64_t* rowptr, const int32_t* col, int64_t r,
                     int64_t ncb, int64_t thresh, int64_t rb_rows,
                     int64_t* ndense_per_rb, int64_t* rem_deg) {
  // rb_rows: row-tile height (128 = classic square tiles; taller tiles
  // amortize the x-tile DMA over more rows — ops/block.py cost model)
  const int64_t nrb = (r + rb_rows - 1) / rb_rows;
  int64_t total = 0;
#pragma omp parallel reduction(+ : total)
  {
    std::vector<int32_t> cnt(ncb, 0);
    std::vector<int32_t> touched;
#pragma omp for schedule(dynamic, 4)
    for (int64_t rb = 0; rb < nrb; ++rb) {
      const int64_t r0 = rb * rb_rows, r1 = std::min<int64_t>(r0 + rb_rows, r);
      touched.clear();
      for (int64_t j = rowptr[r0]; j < rowptr[r1]; ++j) {
        const int32_t cb = col[j] >> 7;
        if (cnt[cb]++ == 0) touched.push_back(cb);
      }
      int64_t nd = 0;
      for (int32_t cb : touched)
        if (cnt[cb] >= thresh) ++nd;
      ndense_per_rb[rb] = nd;
      total += nd;
      for (int64_t i = r0; i < r1; ++i) {
        int64_t rd = 0;
        for (int64_t j = rowptr[i]; j < rowptr[i + 1]; ++j)
          if (cnt[col[j] >> 7] < thresh) ++rd;
        rem_deg[i] = rd;
      }
      for (int32_t cb : touched) cnt[cb] = 0;
    }
  }
  return total;
}

void blocks_fill(const int64_t* rowptr, const int32_t* col, const float* value,
                 int64_t r, int64_t ncb, int64_t thresh, int64_t rb_rows,
                 const int64_t* tile_start,  // [nrb] padded start per row-block
                 const int64_t* rem_rowptr,  // [r+1] cumsum of rem_deg
                 void* a_out, int32_t a_is_bf16, int32_t* bcol_out,
                 int32_t* rem_col, float* rem_val) {
  const int64_t nrb = (r + rb_rows - 1) / rb_rows;
  const int64_t tile_elems = rb_rows * 128;
#pragma omp parallel
  {
    std::vector<int32_t> cnt(ncb, 0);
    std::vector<int32_t> slot(ncb, -1);
    std::vector<int32_t> touched;
#pragma omp for schedule(dynamic, 4)
    for (int64_t rb = 0; rb < nrb; ++rb) {
      const int64_t r0 = rb * rb_rows, r1 = std::min<int64_t>(r0 + rb_rows, r);
      touched.clear();
      for (int64_t j = rowptr[r0]; j < rowptr[r1]; ++j) {
        const int32_t cb = col[j] >> 7;
        if (cnt[cb]++ == 0) touched.push_back(cb);
      }
      std::sort(touched.begin(), touched.end());
      int32_t nd = 0;
      const int64_t t0 = tile_start[rb];
      for (int32_t cb : touched)
        if (cnt[cb] >= thresh) {
          slot[cb] = nd;
          bcol_out[t0 + nd] = cb;
          ++nd;
        }
      for (int64_t i = r0; i < r1; ++i) {
        int64_t rc = rem_rowptr[i];
        for (int64_t j = rowptr[i]; j < rowptr[i + 1]; ++j) {
          const int32_t c = col[j];
          const int32_t cb = c >> 7;
          const float v = value ? value[j] : 1.0f;
          if (cnt[cb] >= thresh) {
            const int64_t off =
                (t0 + slot[cb]) * tile_elems + (i - r0) * 128 + (c & 127);
            // accumulate: duplicate (row,col) entries must SUM, matching
            // the ELL/COO paths (each duplicate gets its own slot there)
            if (a_is_bf16) {
              uint16_t* p = (uint16_t*)a_out + off;
              uint32_t cur = ((uint32_t)*p) << 16;
              float curf;
              std::memcpy(&curf, &cur, 4);
              *p = f32_to_bf16(curf + v);
            } else {
              ((float*)a_out)[off] += v;
            }
          } else {
            rem_col[rc] = c;
            rem_val[rc] = v;
            ++rc;
          }
        }
      }
      for (int32_t cb : touched) {
        cnt[cb] = 0;
        slot[cb] = -1;
      }
    }
  }
}

}  // extern "C"
