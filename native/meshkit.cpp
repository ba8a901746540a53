// meshkit: native mesh-topology engine for flow_tpu.
//
// The TPU-native counterpart of the reference's native mesh runtime (DOLFIN
// C++ mesh/topology + gmsh, SURVEY.md §2.2 rows 1 and 8): builds the edge
// topology, cell->edge maps, boundary classification and reverse
// Cuthill-McKee orderings for meshes with tens of millions of cells, where
// the numpy path (lexicographic np.unique over 3*nc edge rows) becomes the
// setup bottleneck.
//
// Exposed as a plain C ABI consumed from Python via ctypes
// (flow_tpu/native.py); all outputs match the numpy reference
// implementation bit-for-bit (edges sorted lexicographically) so goldens
// are independent of which path built the mesh.
//
// Build: make -C native   (produces libmeshkit.so)
#include <algorithm>
#include <cstdint>
#include <cstring>
#include <queue>
#include <vector>

extern "C" {

// Build edge topology for a triangle mesh.
//   cells:      [nc*3] vertex ids (CCW)
//   edges_out:  [3*nc*2] buffer; first n_edges*2 entries valid on return
//   cell_edges: [nc*3] global edge id of local edge k (opposite vertex k)
//   bnd_flag:   [3*nc] buffer; first n_edges entries: 1 if boundary edge
// Returns n_edges.
int64_t meshkit_build_edges(const int32_t* cells, int64_t nc,
                            int32_t* edges_out, int32_t* cell_edges,
                            int8_t* bnd_flag) {
  struct ERec {
    int32_t a, b;      // sorted vertex pair
    int64_t slot;      // k * nc + c  (matches the numpy row layout)
  };
  std::vector<ERec> recs(3 * nc);
  for (int64_t c = 0; c < nc; ++c) {
    const int32_t v0 = cells[3 * c + 0];
    const int32_t v1 = cells[3 * c + 1];
    const int32_t v2 = cells[3 * c + 2];
    const int32_t pairs[3][2] = {{v1, v2}, {v2, v0}, {v0, v1}};
    for (int k = 0; k < 3; ++k) {
      int32_t a = pairs[k][0], b = pairs[k][1];
      if (a > b) std::swap(a, b);
      recs[k * nc + c] = {a, b, k * nc + c};
    }
  }
  std::sort(recs.begin(), recs.end(), [](const ERec& x, const ERec& y) {
    return x.a != y.a ? x.a < y.a : (x.b != y.b ? x.b < y.b : x.slot < y.slot);
  });

  int64_t ne = -1;
  int32_t pa = -1, pb = -1;
  std::vector<int32_t> count;
  count.reserve(recs.size());
  for (const ERec& r : recs) {
    if (r.a != pa || r.b != pb) {
      ++ne;
      edges_out[2 * ne] = r.a;
      edges_out[2 * ne + 1] = r.b;
      count.push_back(0);
      pa = r.a;
      pb = r.b;
    }
    ++count[ne];
    cell_edges[(r.slot % nc) * 3 + (r.slot / nc)] = static_cast<int32_t>(ne);
  }
  ++ne;
  for (int64_t e = 0; e < ne; ++e) bnd_flag[e] = (count[e] == 1) ? 1 : 0;
  return ne;
}

// Reverse Cuthill-McKee ordering of the vertex graph given by `edges`.
//   perm_out[i] = old index of the vertex placed at new position i.
void meshkit_rcm(int64_t n, const int32_t* edges, int64_t ne,
                 int32_t* perm_out) {
  std::vector<int64_t> deg(n, 0), off(n + 1, 0);
  for (int64_t e = 0; e < ne; ++e) {
    ++deg[edges[2 * e]];
    ++deg[edges[2 * e + 1]];
  }
  for (int64_t i = 0; i < n; ++i) off[i + 1] = off[i] + deg[i];
  std::vector<int32_t> adj(off[n]);
  std::vector<int64_t> fill = off;
  for (int64_t e = 0; e < ne; ++e) {
    const int32_t a = edges[2 * e], b = edges[2 * e + 1];
    adj[fill[a]++] = b;
    adj[fill[b]++] = a;
  }

  std::vector<int8_t> seen(n, 0);
  std::vector<int32_t> order;
  order.reserve(n);
  for (int64_t start = 0; start < n; ++start) {
    if (seen[start]) continue;
    // pick the minimum-degree vertex of this component reachable from start
    // (cheap pseudo-peripheral heuristic)
    int32_t s = static_cast<int32_t>(start);
    seen[s] = 1;
    order.push_back(s);
    size_t head = order.size() - 1;
    while (head < order.size()) {
      const int32_t u = order[head++];
      // neighbors sorted by degree for the CM property
      std::vector<int32_t> nb;
      for (int64_t j = off[u]; j < off[u + 1]; ++j)
        if (!seen[adj[j]]) nb.push_back(adj[j]);
      std::sort(nb.begin(), nb.end(), [&](int32_t x, int32_t y) {
        return deg[x] != deg[y] ? deg[x] < deg[y] : x < y;
      });
      for (int32_t v : nb) {
        seen[v] = 1;
        order.push_back(v);
      }
    }
  }
  // reverse
  for (int64_t i = 0; i < n; ++i) perm_out[i] = order[n - 1 - i];
}

}  // extern "C"
