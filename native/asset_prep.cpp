// Native offline asset pipeline.
//
// C++ equivalents of the reference's host-side precomputes (reference
// src/mgr.cpp:1155-1211 buildAStarLookup — O(T^2) all-pairs next-hop over
// the navmesh triangle graph — and the adjacency construction inside
// madrona::Navmesh). Exposed as a plain C ABI consumed from Python via
// ctypes (assets/native.py); NumPy fallbacks exist for environments
// without the built library.
//
// Build: make -C native   (produces libmpenv_native.so)

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <queue>
#include <unordered_map>
#include <vector>

extern "C" {

// Triangle adjacency over shared (undirected) edges.
// tri_indices: [num_tris * 3] vertex ids; adjacency_out: [num_tris * 3],
// -1 where edge k (verts k -> k+1) has no neighbor.
void mpenv_tri_adjacency(const int32_t *tri_indices, int32_t num_tris,
                         int32_t *adjacency_out) {
  std::unordered_map<uint64_t, std::pair<int32_t, int32_t>> edge_map;
  edge_map.reserve((size_t)num_tris * 3);

  for (int64_t i = 0; i < (int64_t)num_tris * 3; i++) {
    adjacency_out[i] = -1;
  }

  for (int32_t t = 0; t < num_tris; t++) {
    for (int32_t k = 0; k < 3; k++) {
      int32_t a = tri_indices[t * 3 + k];
      int32_t b = tri_indices[t * 3 + (k + 1) % 3];
      uint64_t lo = (uint64_t)(a < b ? a : b);
      uint64_t hi = (uint64_t)(a < b ? b : a);
      uint64_t key = (lo << 32) | hi;
      auto it = edge_map.find(key);
      if (it != edge_map.end()) {
        int32_t ot = it->second.first;
        int32_t ok = it->second.second;
        adjacency_out[t * 3 + k] = ot;
        adjacency_out[ot * 3 + ok] = t;
      } else {
        edge_map.emplace(key, std::make_pair(t, k));
      }
    }
  }
}

// All-pairs next-hop over the triangle adjacency graph with centroid
// Euclidean edge weights (buildAStarLookup semantics, mgr.cpp:1155-1211):
// next_hop[src * num_tris + dst] = first triangle to step to from src on a
// shortest path to dst (-1 unreachable; dst == src -> src).
//
// Dijkstra per destination: hop-toward-dst = predecessor direction on the
// reverse tree, matching the reference's per-goal relaxation.
void mpenv_astar_next_hop(const float *centroids, const int32_t *adjacency,
                          int32_t num_tris, int32_t *next_hop_out) {
  const float INF = 3.4e38f;

  std::vector<float> dist((size_t)num_tris);
  std::vector<int32_t> hop((size_t)num_tris);

  auto edge_len = [&](int32_t a, int32_t b) {
    float dx = centroids[a * 3 + 0] - centroids[b * 3 + 0];
    float dy = centroids[a * 3 + 1] - centroids[b * 3 + 1];
    float dz = centroids[a * 3 + 2] - centroids[b * 3 + 2];
    return std::sqrt(dx * dx + dy * dy + dz * dz);
  };

  using QE = std::pair<float, int32_t>;

  for (int32_t dst = 0; dst < num_tris; dst++) {
    std::fill(dist.begin(), dist.end(), INF);
    std::fill(hop.begin(), hop.end(), -1);
    std::priority_queue<QE, std::vector<QE>, std::greater<QE>> pq;

    dist[dst] = 0.f;
    hop[dst] = dst;
    pq.push({0.f, dst});

    while (!pq.empty()) {
      auto [d, t] = pq.top();
      pq.pop();
      if (d > dist[t]) continue;

      for (int32_t k = 0; k < 3; k++) {
        int32_t nb = adjacency[t * 3 + k];
        if (nb < 0) continue;
        float nd = d + edge_len(t, nb);
        if (nd < dist[nb]) {
          dist[nb] = nd;
          // from nb, the next hop toward dst is t
          hop[nb] = t;
          pq.push({nd, nb});
        }
      }
    }

    for (int32_t src = 0; src < num_tris; src++) {
      next_hop_out[(int64_t)src * num_tris + dst] = hop[src];
    }
  }
}

}  // extern "C"
