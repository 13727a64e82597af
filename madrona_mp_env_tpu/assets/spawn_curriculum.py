"""5-tier navmesh spawn curriculum, precomputed on host.

Port of the reference's buildSpawnCurriculum / buildSpawnCurriculumTier
(reference src/mgr.cpp:884-911, 685-882): for each of 5 desired team
separations (10/20/40/80/160 agent radii), enumerate pairs of navmesh
spawn regions — region A grown by BFS around a seed triangle within the
tier's spawn radius, region B at graph distance within ±25% of the target
separation — each with enough area for a team. At reset the env samples a
tier from the curriculum CDF and a pair within it, and the two teams spawn
facing each other (curriculumSpawnPoint, src/utils.cpp:653-717).

Deviation: the reference measures separation with edge-entry-point
Dijkstra; here distances accumulate between triangle centroids over the
adjacency graph (equivalent up to one triangle's radius, far below the
±separation/4 acceptance band).
"""

from __future__ import annotations

import hashlib
import heapq
import os
from dataclasses import dataclass

import numpy as np

from .. import consts
from .navmesh import NavmeshTables, _CACHE_DIR

NUM_TIERS = 5
MAX_SPAWNS_PER_TIER = 256
MAX_REGION_TRIS = 24

TIER_SEPARATIONS = np.asarray(
    [10.0, 20.0, 40.0, 80.0, 160.0]
) * consts.agent_radius  # mgr.cpp:886-891
_BASE_RADIUS = 3.0 * consts.agent_radius * 2.0
TIER_SPAWN_RADII = np.asarray(
    [1.0, 1.5, 1.5, 1.5, 1.5]
) * _BASE_RADIUS  # mgr.cpp:893-899

MIN_REGION_AREA = 4.0 * np.pi * consts.agent_radius ** 2  # mgr.cpp:770


@dataclass
class SpawnCurriculumTables:
    a_tris: np.ndarray  # [5, S, K] i32 (-1 pad)
    b_tris: np.ndarray  # [5, S, K] i32
    a_yaw: np.ndarray  # [5, S] f32 (facing B)
    b_yaw: np.ndarray  # [5, S] f32 (facing A)
    num_spawns: np.ndarray  # [5] i32


def _tri_geometry(nav: NavmeshTables):
    pts = nav.verts[nav.tri_indices]  # [T, 3, 3]
    centroids = pts.mean(axis=1)
    e1 = pts[:, 1] - pts[:, 0]
    e2 = pts[:, 2] - pts[:, 0]
    areas = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)
    return pts, centroids, areas


def _grow_region(start, pts, centroids, areas, adjacency, radius):
    """BFS region growth: tris whose 3 verts all lie within radius of the
    seed centroid (mgr.cpp:728-775). Returns (tri list, area)."""
    r2 = radius * radius
    center = centroids[start]
    region = []
    area = 0.0
    seen = {start}
    queue = [start]
    while queue and len(region) < MAX_REGION_TRIS:
        t = queue.pop(0)
        if t != start:
            if np.any(np.sum((pts[t] - center) ** 2, axis=-1) > r2):
                continue
        region.append(t)
        area += areas[t]
        for nb in adjacency[t]:
            if nb >= 0 and nb not in seen:
                seen.add(nb)
                queue.append(int(nb))
    return region, area


def build_spawn_curriculum(
    nav: NavmeshTables, cache_key: str | None = None
) -> SpawnCurriculumTables:
    if cache_key is not None:
        digest = hashlib.sha256(
            nav.tri_indices.tobytes() + nav.verts.tobytes() + b"spawncurr_v1"
        ).hexdigest()[:16]
        os.makedirs(_CACHE_DIR, exist_ok=True)
        path = os.path.join(_CACHE_DIR, f"spawncurr_{cache_key}_{digest}.npz")
        if os.path.exists(path):
            z = np.load(path)
            return SpawnCurriculumTables(
                a_tris=z["a_tris"], b_tris=z["b_tris"],
                a_yaw=z["a_yaw"], b_yaw=z["b_yaw"],
                num_spawns=z["num_spawns"],
            )
    else:
        path = None

    pts, centroids, areas = _tri_geometry(nav)
    T = len(centroids)
    adjacency = nav.adjacency

    # adjacency graph edge lengths (centroid to centroid)
    edges = [[] for _ in range(T)]
    for t in range(T):
        for nb in adjacency[t]:
            if nb >= 0:
                w = float(np.linalg.norm(centroids[t] - centroids[nb]))
                edges[t].append((int(nb), w))

    a_tris = np.full((NUM_TIERS, MAX_SPAWNS_PER_TIER, MAX_REGION_TRIS), -1,
                     np.int32)
    b_tris = np.full_like(a_tris, -1)
    a_yaw = np.zeros((NUM_TIERS, MAX_SPAWNS_PER_TIER), np.float32)
    b_yaw = np.zeros_like(a_yaw)
    num_spawns = np.zeros((NUM_TIERS,), np.int32)

    for tier in range(NUM_TIERS):
        sep = TIER_SEPARATIONS[tier]
        radius = TIER_SPAWN_RADII[tier]
        thresh = sep / 4.0
        base = sep + 2.0 * radius
        lo, hi = base - thresh, base + thresh

        count = 0
        for a_start in range(T):
            if count >= MAX_SPAWNS_PER_TIER:
                break
            a_region, a_area = _grow_region(
                a_start, pts, centroids, areas, adjacency, radius
            )
            if a_area < MIN_REGION_AREA:
                continue

            # Dijkstra over the centroid graph
            dist = np.full((T,), np.inf)
            dist[a_start] = 0.0
            heap = [(0.0, a_start)]
            while heap:
                d, t = heapq.heappop(heap)
                if d > dist[t]:
                    continue
                for nb, w in edges[t]:
                    nd = d + w
                    if nd < dist[nb]:
                        dist[nb] = nd
                        heapq.heappush(heap, (nd, nb))

            cands = np.nonzero((dist >= lo) & (dist <= hi))[0]
            for b_start in cands:
                if count >= MAX_SPAWNS_PER_TIER:
                    break
                b_region, b_area = _grow_region(
                    int(b_start), pts, centroids, areas, adjacency, radius
                )
                if b_area < MIN_REGION_AREA:
                    continue

                a_c = centroids[a_start]
                b_c = centroids[int(b_start)]
                to_b = b_c - a_c
                to_b = to_b / max(np.linalg.norm(to_b), 1e-9)
                yaw = -np.arctan2(to_b[0], to_b[1])

                a_tris[tier, count, : len(a_region)] = a_region
                b_tris[tier, count, : len(b_region)] = b_region
                a_yaw[tier, count] = yaw
                b_yaw[tier, count] = yaw - np.pi
                count += 1
        num_spawns[tier] = count

    tables = SpawnCurriculumTables(
        a_tris=a_tris, b_tris=b_tris, a_yaw=a_yaw, b_yaw=b_yaw,
        num_spawns=num_spawns,
    )
    if path is not None:
        np.savez(
            path, a_tris=a_tris, b_tris=b_tris, a_yaw=a_yaw, b_yaw=b_yaw,
            num_spawns=num_spawns,
        )
    return tables
