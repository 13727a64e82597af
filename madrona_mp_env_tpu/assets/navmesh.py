"""Navmesh runtime tables, precomputed on host with NumPy.

Replaces the reference's nav runtime (reference src/nav/nav_sys.cpp,
madrona::Navmesh) with precomputed tensors consumed by the jitted sim:

  - triangle adjacency over shared edges,
  - all-pairs A* next-hop table (reference buildAStarLookup,
    src/mgr.cpp:1155-1211 — O(T^2) host precompute, disk-cached),
  - area CDF for uniform point sampling (madrona::Navmesh alias table
    equivalent; we use a CDF + searchsorted which is identical in
    distribution and TPU-friendly).
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass

import numpy as np

from .formats import NavmeshData

_CACHE_DIR = os.environ.get(
    "MPENV_TPU_CACHE", os.path.expanduser("~/.cache/madrona_mp_env_tpu")
)


@dataclass
class NavmeshTables:
    verts: np.ndarray  # [V, 3] f32
    tri_indices: np.ndarray  # [T, 3] i32
    centroids: np.ndarray  # [T, 3] f32
    adjacency: np.ndarray  # [T, 3] i32, -1 = no neighbor across edge k
    next_hop: np.ndarray  # [T, T] i32, next tri on shortest path, -1 = unreachable
    area_cdf: np.ndarray  # [T] f32 cumulative normalized areas


def _tri_adjacency(tri_indices: np.ndarray) -> np.ndarray:
    num_tris = tri_indices.shape[0]
    edge_map: dict = {}
    adjacency = np.full((num_tris, 3), -1, np.int32)
    for t in range(num_tris):
        for k in range(3):
            a = int(tri_indices[t, k])
            b = int(tri_indices[t, (k + 1) % 3])
            key = (min(a, b), max(a, b))
            if key in edge_map:
                ot, ok = edge_map[key]
                adjacency[t, k] = ot
                adjacency[ot, ok] = t
            else:
                edge_map[key] = (t, k)
    return adjacency


def _all_pairs_next_hop(
    centroids: np.ndarray, adjacency: np.ndarray
) -> np.ndarray:
    """Dijkstra from every source over the tri-adjacency graph.

    Edge weight = centroid distance (matches the reference's A* g-cost over
    triangle centers). Returns next_hop[start, goal] = first tri to move to.
    """
    num_tris = centroids.shape[0]
    # dense weights
    inf = np.float64(np.inf)
    dist = np.full((num_tris, num_tris), inf)
    np.fill_diagonal(dist, 0.0)
    w = np.full((num_tris, 3), inf)
    for k in range(3):
        nbr = adjacency[:, k]
        valid = nbr >= 0
        w[valid, k] = np.linalg.norm(
            centroids[valid] - centroids[nbr[valid]], axis=-1
        )
        dist[np.arange(num_tris)[valid], nbr[valid]] = np.minimum(
            dist[np.arange(num_tris)[valid], nbr[valid]], w[valid, k]
        )

    # Floyd-Warshall with successor tracking: succ[i, j] = next node after i
    # on the shortest i->j path. O(T^3) vectorized — fine for map-scale T.
    succ = np.full((num_tris, num_tris), -1, np.int64)
    finite = np.isfinite(dist)
    idx = np.arange(num_tris)
    succ[finite] = np.broadcast_to(idx[None, :], dist.shape)[finite]
    np.fill_diagonal(succ, idx)

    for k in range(num_tris):
        alt = dist[:, k : k + 1] + dist[k : k + 1, :]
        better = alt < dist
        if better.any():
            dist = np.where(better, alt, dist)
            succ = np.where(better, succ[:, k : k + 1], succ)

    return succ.astype(np.int32)


def build_navmesh_tables(
    nav: NavmeshData, cache_key: str | None = None
) -> NavmeshTables:
    tri_indices = nav.tri_indices.astype(np.int32)
    verts = nav.verts.astype(np.float32)
    tri_pts = verts[tri_indices]  # [T, 3, 3]
    centroids = tri_pts.mean(axis=1)

    # native (C++) precompute when built, NumPy fallback otherwise
    from . import native

    adjacency = native.tri_adjacency(tri_indices)
    if adjacency is None:
        adjacency = _tri_adjacency(tri_indices)

    next_hop = None
    cache_path = None
    if cache_key is not None:
        digest = hashlib.sha256(
            tri_indices.tobytes() + verts.tobytes()
        ).hexdigest()[:16]
        os.makedirs(_CACHE_DIR, exist_ok=True)
        cache_path = os.path.join(_CACHE_DIR, f"nexthop_{cache_key}_{digest}.npy")
        if os.path.exists(cache_path):
            next_hop = np.load(cache_path)
    if next_hop is None:
        next_hop = native.astar_next_hop(centroids, adjacency)
        if next_hop is None:
            next_hop = _all_pairs_next_hop(
                centroids.astype(np.float64), adjacency
            )
        if cache_path is not None:
            np.save(cache_path, next_hop)

    e1 = tri_pts[:, 1] - tri_pts[:, 0]
    e2 = tri_pts[:, 2] - tri_pts[:, 0]
    areas = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)
    total = areas.sum()
    area_cdf = np.cumsum(areas / max(total, 1e-12)).astype(np.float32)

    return NavmeshTables(
        verts=verts,
        tri_indices=tri_indices,
        centroids=centroids.astype(np.float32),
        adjacency=adjacency,
        next_hop=next_hop,
        area_cdf=area_cdf,
    )
