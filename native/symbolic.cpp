// Native symbolic-analysis kernels for cholesky_is_magic_tpu.
//
// The reference's native layer is wrapper.c + CHOLMOD: C code doing the
// host-side graph work (fill-reducing ordering, elimination tree,
// supernode detection) that feeds the numeric factorization.  This is the
// TPU build's equivalent: the same graph algorithms, natively compiled,
// reached from Python via ctypes (sparse/native.py).  The device numeric
// factorization itself is XLA/Pallas — compiled in, no .so needed.
//
// All patterns are 0-based CSC of the *symmetric* matrix (both triangles
// present), int64 indices to match numpy defaults.
//
// Build: `make -C native` (produces libcimsymbolic.so).

#include <cstdint>
#include <cstring>
#include <vector>
#include <unordered_set>
#include <algorithm>

extern "C" {

// Liu's elimination-tree algorithm with path compression.
// parent[j] = -1 for roots.  O(nnz * alpha).
void cim_etree(int64_t n, const int64_t* indptr, const int64_t* indices,
               int64_t* parent) {
  std::vector<int64_t> ancestor(n, -1);
  for (int64_t j = 0; j < n; ++j) parent[j] = -1;
  for (int64_t j = 0; j < n; ++j) {
    for (int64_t p = indptr[j]; p < indptr[j + 1]; ++p) {
      int64_t i = indices[p];
      if (i >= j) continue;
      int64_t k = i;
      while (ancestor[k] != -1 && ancestor[k] != j) {
        int64_t next = ancestor[k];
        ancestor[k] = j;
        k = next;
      }
      if (ancestor[k] == -1) {
        ancestor[k] = j;
        parent[k] = j;
      }
    }
  }
}

// Iterative DFS postorder of the forest given by parent[].
void cim_postorder(int64_t n, const int64_t* parent, int64_t* post) {
  std::vector<int64_t> head(n, -1), next(n, -1);
  // Build child lists in reverse so traversal visits children in order.
  for (int64_t v = n - 1; v >= 0; --v) {
    int64_t p = parent[v];
    if (p != -1) {
      next[v] = head[p];
      head[p] = v;
    }
  }
  int64_t k = 0;
  std::vector<int64_t> stack;
  for (int64_t root = 0; root < n; ++root) {
    if (parent[root] != -1) continue;
    stack.push_back(root);
    while (!stack.empty()) {
      int64_t node = stack.back();
      int64_t child = head[node];
      if (child != -1) {
        head[node] = next[child];  // pop child from the list
        stack.push_back(child);
      } else {
        post[k++] = node;
        stack.pop_back();
      }
    }
  }
}

// Exact column counts of L (incl. diagonal) via row-subtree walks.
// Also returns nnz(L) and the factorization flop count sum(count_j^2).
void cim_colcounts(int64_t n, const int64_t* indptr, const int64_t* indices,
                   const int64_t* parent, int64_t* counts, int64_t* nnz_out,
                   double* flops_out) {
  for (int64_t j = 0; j < n; ++j) counts[j] = 1;  // diagonal
  std::vector<int64_t> marker(n, -1);
  // Row i structure: paths from each k (pattern(i,k), k<i) up the etree.
  // Walk the CSC columns transposed: entry (i, j) with i > j contributes
  // to row i.  We iterate columns and scatter to rows via the symmetric
  // pattern: for column j, entries i > j are row-i entries at column j.
  // Equivalent walk per row requires CSR; since the pattern is symmetric,
  // column j's lower entries are row structures' seeds.
  // Do a proper per-row pass using the symmetric pattern:
  for (int64_t i = 0; i < n; ++i) {
    marker[i] = i;
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
      int64_t j = indices[p];  // symmetric: column i holds row i's pattern
      if (j >= i) continue;
      while (j != -1 && marker[j] != i) {
        counts[j] += 1;
        marker[j] = i;
        j = parent[j];
      }
    }
  }
  int64_t nnz = 0;
  double flops = 0.0;
  for (int64_t j = 0; j < n; ++j) {
    nnz += counts[j];
    flops += double(counts[j]) * double(counts[j]);
  }
  *nnz_out = nnz;
  *flops_out = flops;
}

// Approximate minimum-degree ordering on the QUOTIENT graph (the AMD of
// Amestoy/Davis/Duff 1996, as used by CHOLMOD's default ordering): an
// eliminated pivot becomes an *element* holding its boundary list; fill is
// never materialized as variable-variable edges.  Degrees are the standard
// AMD upper bound d(u) <= |A_u \ Lp| + |Lp \ u| + sum_e |L_e \ Lp|,
// computed for all u in Lp with one scatter pass over the elements.
// Dead elements are absorbed when the pivot consumes them.  (No
// supervariable hashing — quality matches plain AMD minus mass
// elimination; the caller takes best-of vs other orderings anyway.)
// Replaces the old elimination-graph min-degree whose fill cliques made
// banded m=8192 patterns take minutes (measured 612 s -> sub-second).
// perm[k] = k-th pivot (original index).  Returns 0 on success.
int64_t cim_amd(int64_t n, const int64_t* indptr, const int64_t* indices,
                int64_t* perm) {
  std::vector<std::vector<int64_t>> A(n), E(n), L;
  std::vector<int64_t> w;  // per-element scratch for |L_e \ Lp|
  for (int64_t j = 0; j < n; ++j) {
    A[j].reserve(indptr[j + 1] - indptr[j]);
    for (int64_t p = indptr[j]; p < indptr[j + 1]; ++p) {
      int64_t i = indices[p];
      if (i != j) A[j].push_back(i);
    }
  }
  std::vector<char> alive(n, 1);
  std::vector<char> elem_alive;
  std::vector<int64_t> deg(n), mark(n, 0), wstamp;
  // Degree bucket lists for O(1)-amortized min extraction.
  std::vector<int64_t> head(n + 1, -1), nxt(n, -1), prv(n, -1);
  auto bucket_insert = [&](int64_t v, int64_t d) {
    nxt[v] = head[d];
    prv[v] = -1;
    if (head[d] != -1) prv[head[d]] = v;
    head[d] = v;
  };
  auto bucket_remove = [&](int64_t v, int64_t d) {
    if (prv[v] != -1) nxt[prv[v]] = nxt[v];
    else head[d] = nxt[v];
    if (nxt[v] != -1) prv[nxt[v]] = prv[v];
  };
  for (int64_t v = 0; v < n; ++v) {
    deg[v] = int64_t(A[v].size());
    bucket_insert(v, deg[v]);
  }
  int64_t mind = 0, stamp = 0;
  std::vector<int64_t> Lp;
  for (int64_t k = 0; k < n; ++k) {
    while (mind <= n && head[mind] == -1) ++mind;
    int64_t v = head[mind];
    bucket_remove(v, deg[v]);
    perm[k] = v;
    alive[v] = 0;
    // Lp = boundary of the new element: live direct neighbors plus the
    // live members of every adjacent element (which this pivot absorbs).
    ++stamp;
    mark[v] = stamp;
    Lp.clear();
    for (int64_t u : A[v]) {
      if (alive[u] && mark[u] != stamp) {
        mark[u] = stamp;
        Lp.push_back(u);
      }
    }
    for (int64_t e : E[v]) {
      if (!elem_alive[e]) continue;
      for (int64_t u : L[e]) {
        if (alive[u] && mark[u] != stamp) {
          mark[u] = stamp;
          Lp.push_back(u);
        }
      }
      elem_alive[e] = 0;  // absorbed
      L[e].clear();
      L[e].shrink_to_fit();
    }
    if (Lp.empty()) continue;
    int64_t eid = int64_t(L.size());
    L.push_back(Lp);
    elem_alive.push_back(1);
    wstamp.push_back(0);
    w.push_back(0);
    // Scatter pass: w[e] = |L_e \ Lp| for every element adjacent to Lp.
    for (int64_t u : Lp) {
      for (int64_t e : E[u]) {
        if (!elem_alive[e]) continue;
        if (wstamp[e] != stamp) {
          wstamp[e] = stamp;
          int64_t live = 0;
          for (int64_t x : L[e])
            if (alive[x]) ++live;
          w[e] = live;
        }
        --w[e];  // u is in both L_e and Lp
      }
    }
    int64_t lp_sz = int64_t(Lp.size());
    for (int64_t u : Lp) {
      // Prune A_u to live vars outside Lp (inside-Lp adjacency is now
      // carried by element eid); drop dead elements from E_u.
      int64_t wr = 0;
      for (int64_t x : A[u])
        if (alive[x] && mark[x] != stamp) A[u][wr++] = x;
      A[u].resize(wr);
      wr = 0;
      for (int64_t e : E[u])
        if (elem_alive[e]) E[u][wr++] = e;
      E[u].resize(wr);
      E[u].push_back(eid);
      // AMD approximate degree.
      int64_t d = int64_t(A[u].size()) + (lp_sz - 1);
      for (int64_t e : E[u]) {
        if (e == eid) continue;
        if (w[e] > 0) d += w[e];
      }
      int64_t cap = n - k - 1;
      if (d > cap) d = cap;
      bucket_remove(u, deg[u]);
      deg[u] = d;
      bucket_insert(u, d);
      if (d < mind) mind = d;
    }
  }
  return 0;
}

// Block-tile structure of L: for each row i, walk the etree from every
// seed (pattern(i, j), j < i) and mark tile (i/block, j/block).  Also marks
// the diagonal tiles.  out_mask is a row-major (B x B) byte matrix.
void cim_block_mask(int64_t n, const int64_t* indptr, const int64_t* indices,
                    const int64_t* parent, int64_t block, unsigned char* out_mask) {
  int64_t B = (n + block - 1) / block;
  std::vector<int64_t> marker(n, -1);
  for (int64_t i = 0; i < n; ++i) {
    int64_t bi = i / block;
    out_mask[bi * B + bi] = 1;
    marker[i] = i;
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
      int64_t j = indices[p];
      if (j >= i) continue;
      while (j != -1 && marker[j] != i) {
        out_mask[bi * B + j / block] = 1;
        marker[j] = i;
        j = parent[j];
      }
    }
  }
}

// Pair schedule for O(nnz) device-side normal-equation assembly
// (TiledCholesky.build_ell_assembly): N = (A D)(A D)^T expands as
// N[p, q] = sum_k A[p,k] A[q,k] d_k^2; for every column k of A (CSC) and
// every unordered row pair sharing it, emit
//   weight = A[p,k]*A[q,k], source column k, and the flat destination in
//   the compact tile array: t*b*b + (shi%b)*b + (slo%b)
// where (shi, slo) are the pair's slot indices (slot_of[] maps matrix row
// -> supernode-aligned slot) and t = tilemap[shi/b, slo/b] (row-major,
// -1 = non-resident).  Off-diagonal entries inside DIAGONAL tiles are
// mirrored (device cholesky reads the full tile).  Returns the entry
// count, or -1 if any pair lands outside the resident tile set (the
// Python caller's assertion analog).  Caller allocates ws/ks/dst with
// capacity 2 * sum_k nnz_k (nnz_k + 1) / 2.
int64_t cim_pair_schedule(int64_t ncols, const int64_t* indptr,
                          const int64_t* indices, const double* data,
                          const int64_t* slot_of, int64_t b,
                          const int64_t* tilemap, int64_t B,
                          double* ws, int64_t* ks, int64_t* dst) {
  int64_t cnt = 0;
  for (int64_t k = 0; k < ncols; ++k) {
    int64_t lo = indptr[k], hi = indptr[k + 1];
    for (int64_t a = lo; a < hi; ++a) {
      int64_t sa = slot_of[indices[a]];
      double va = data[a];
      for (int64_t c = lo; c <= a; ++c) {
        int64_t sc = slot_of[indices[c]];
        int64_t shi = sa >= sc ? sa : sc;
        int64_t slo = sa >= sc ? sc : sa;
        int64_t t = tilemap[(shi / b) * B + (slo / b)];
        if (t < 0) return -1;
        double w = va * data[c];
        ws[cnt] = w;
        ks[cnt] = k;
        dst[cnt] = t * b * b + (shi % b) * b + (slo % b);
        ++cnt;
        if (shi != slo && shi / b == slo / b) {
          ws[cnt] = w;
          ks[cnt] = k;
          dst[cnt] = t * b * b + (slo % b) * b + (shi % b);
          ++cnt;
        }
      }
    }
  }
  return cnt;
}

// Slot-grid variant of cim_block_mask: tile of element i is
// slots[i] / block, where slots[] is the (gapped) supernode-aligned slot
// assignment from pack_supernodes.  out_mask is row-major (B x B), B given
// by the caller (panel count).
void cim_block_mask_slots(int64_t n, const int64_t* indptr,
                          const int64_t* indices, const int64_t* parent,
                          int64_t block, const int64_t* slots, int64_t B,
                          unsigned char* out_mask) {
  std::vector<int64_t> marker(n, -1);
  for (int64_t i = 0; i < n; ++i) {
    int64_t bi = slots[i] / block;
    out_mask[bi * B + bi] = 1;
    marker[i] = i;
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
      int64_t j = indices[p];
      if (j >= i) continue;
      while (j != -1 && marker[j] != i) {
        out_mask[bi * B + slots[j] / block] = 1;
        marker[j] = i;
        j = parent[j];
      }
    }
  }
}

}  // extern "C"
