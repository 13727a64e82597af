"""Per-cell potentially-visible-set (PVS) candidate tables for raycasts.

The TPU replacement for the reference's BVH traversal (src/mesh_bvh.inl
traceRay): instead of a per-ray divergent tree walk, the map is covered by a
coarse 2D grid of columns; for every cell we precompute the small set of
triangles that can possibly be the *nearest* hit of any ray / sphere cast
originating inside that cell (+ a safety margin). At runtime every query
tests only its cell's candidate list — a dense, regular sweep the VPU eats,
typically 3-10x fewer (ray, tri) pairs than the full soup.

Candidate sets are built as the union of
  1. a *near set*: every triangle within ``near_dist`` of the cell column
     (conservative by sub-triangle AABB refinement) — exact coverage for
     short casts (movement, margin drift) regardless of sampling,
  2. a sampled ray-PVS: first-hit triangles of a large random ray battery
     binned by origin cell,
  3. a sampled sphere-cast-PVS (radius = agent capsule radius, the only
     radius the game uses),
  4. margin binning: every sampled hit is credited to all cells within
     QUERY_MARGIN of its origin, so candidate sets stay valid for queries
     originating up to that far outside their cell of record,
plus one extra "dead" cell sampled around the dead-agent teleport box
(0, 0, 10000) (reference src/sim.cpp:1815, applyDmgSystem) for rays cast by
dead agents in NoRespawn/eval episodes.

Exactness: sets 1 and 4 are conservative by construction; 2 and 3 are
sampled, so the tables are verified against the dense sweep by
tests/test_culling.py and the builder's own ``verify_tables`` battery. The
committed simple_map tables pass 1M-query verification with zero mismatches.
"""

from __future__ import annotations

import hashlib
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

TABLE_VERSION = 4  # v4: battery origins include spawn-box sample points
# (v3 tables under-covered map-edge spawn cells: long sensor rays from
# freshly spawned agents missed triangles absent from the sampled PVS —
# caught by tests/test_culling.py::test_step_sorted_culled_vs_dense)

# runtime queries may originate this far outside the cell of record
# (intra-step movement drift: run speed 400 * dt 0.05 = 20, plus slide,
# unstick displacement 2r = 30, spawn-vs-obs drift; 80 is generous)
QUERY_MARGIN = 80.0


class CellTables(NamedTuple):
    """Device-resident candidate tables. C = nx*ny grid cells + 1 dead cell.

    K is the (static) padded candidate count. Rows of ``ray_packed`` follow
    ops/raycast_pallas.pack_tri_consts; rows of ``sc_packed`` follow
    pack_sc2_consts (sphere-cast constants with host-precomputed derived
    terms)."""

    cand_idx: jax.Array  # [C, K] i32 original tri index (-1 pad)
    ray_packed: jax.Array  # [C, 16, K] f32
    ray_dir_packed: jax.Array  # [C, DIR_K, 3K] bf16 (MXU direction dots)
    sc_packed: jax.Array  # [C, 32, K] f32
    # static grid meta (python floats/ints -> hashable in jit closures)
    grid_min_x: float
    grid_min_y: float
    cell_size: float
    nx: int
    ny: int
    K: int

    @property
    def num_cells(self):
        return self.nx * self.ny + 1

    @property
    def dead_cell(self):
        return self.nx * self.ny


def cell_index(tables: CellTables, pos: jax.Array) -> jax.Array:
    """pos [..., 3] -> cell id [...] (i32). Out-of-column z (the dead-agent
    teleport box) maps to the dead cell; xy is clamped into the grid (the
    battery samples origins beyond the border cells, see QUERY_MARGIN)."""
    ix = jnp.clip(
        ((pos[..., 0] - tables.grid_min_x) / tables.cell_size).astype(jnp.int32),
        0,
        tables.nx - 1,
    )
    iy = jnp.clip(
        ((pos[..., 1] - tables.grid_min_y) / tables.cell_size).astype(jnp.int32),
        0,
        tables.ny - 1,
    )
    cid = ix * tables.ny + iy
    dead = pos[..., 2] > 5000.0
    return jnp.where(dead, tables.dead_cell, cid)


# ---------------------------------------------------------------------------
# Builder (host + device; cached)
# ---------------------------------------------------------------------------


def spawn_box_points(spawn_tables, step: float = 60.0) -> np.ndarray:
    """Grid-sample spawn AABBs ([N, 8] rows: aabb_min(3), aabb_max(3),
    yaw range) into battery origin points [M, 3]. Spawn boxes sit at the
    map edges where the navmesh-driven battery under-samples; every
    runtime episode starts sensor fans from inside them, so the PVS
    battery must cover them explicitly."""
    pts = []
    for table in spawn_tables:
        for row in np.asarray(table, np.float32).reshape(-1, 8):
            lo, hi = row[0:3], row[3:6]
            nx = max(int(np.ceil((hi[0] - lo[0]) / step)) + 1, 2)
            ny = max(int(np.ceil((hi[1] - lo[1]) / step)) + 1, 2)
            xs = np.linspace(lo[0], hi[0], nx)
            ys = np.linspace(lo[1], hi[1], ny)
            gx, gy = np.meshgrid(xs, ys)
            z = np.full(gx.size, lo[2], np.float32)
            pts.append(
                np.stack([gx.ravel(), gy.ravel(), z], axis=1)
            )
    if not pts:
        return np.zeros((0, 3), np.float32)
    return np.concatenate(pts, axis=0).astype(np.float32)


def _subdivide_tris(tri_verts: np.ndarray, max_extent: float):
    """Recursively midpoint-split triangles until every piece's AABB extent
    <= max_extent; returns (sub_verts [S,3,3], orig_idx [S]). Used only for
    the conservative near-set distance test (sub-tri AABBs tightly cover the
    original surface)."""
    tris = [(tri_verts[i], i) for i in range(len(tri_verts))]
    out_v, out_i = [], []
    while tris:
        v, idx = tris.pop()
        ext = v.max(axis=0) - v.min(axis=0)
        if ext.max() <= max_extent:
            out_v.append(v)
            out_i.append(idx)
            continue
        m01 = 0.5 * (v[0] + v[1])
        m12 = 0.5 * (v[1] + v[2])
        m20 = 0.5 * (v[2] + v[0])
        tris.append((np.stack([v[0], m01, m20]), idx))
        tris.append((np.stack([m01, v[1], m12]), idx))
        tris.append((np.stack([m12, v[2], m20]), idx))
        tris.append((np.stack([m01, m12, m20]), idx))
    return np.stack(out_v), np.asarray(out_i, np.int32)


def _near_sets(tri_verts, grid_min, cell_size, nx, ny, near_dist):
    """[C_grid, T] bool: tri within near_dist (xy) of each cell column."""
    sub_v, sub_i = _subdivide_tris(tri_verts.astype(np.float64), 0.75 * near_dist)
    sub_min = sub_v.min(axis=1)[:, :2]  # [S, 2]
    sub_max = sub_v.max(axis=1)[:, :2]

    T = len(tri_verts)
    out = np.zeros((nx * ny, T), bool)
    xs = grid_min[0] + cell_size * np.arange(nx)
    ys = grid_min[1] + cell_size * np.arange(ny)
    for ix in range(nx):
        cx0, cx1 = xs[ix] - near_dist, xs[ix] + cell_size + near_dist
        mx = (sub_min[:, 0] <= cx1) & (sub_max[:, 0] >= cx0)
        for iy in range(ny):
            cy0, cy1 = ys[iy] - near_dist, ys[iy] + cell_size + near_dist
            hit = mx & (sub_min[:, 1] <= cy1) & (sub_max[:, 1] >= cy0)
            if hit.any():
                out[ix * ny + iy, np.unique(sub_i[hit])] = True
    return out


def _dense_ray_idx(o, d, v0, e1, e2, valid):
    """Dense nearest-hit with winner index (builder-only, jits fine)."""
    pvec = jnp.cross(d[..., None, :], e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = o[..., None, :] - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d[..., None, :] * qvec, axis=-1) * inv
    t = jnp.sum(e2 * qvec, axis=-1) * inv
    hit = (
        (jnp.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1)
        & (t > 1e-6) & valid
    )
    t = jnp.where(hit, t, jnp.inf)
    idx = jnp.argmin(t, axis=-1)
    tmin = jnp.min(t, axis=-1)
    return tmin, idx


def _ground_heights(xy, soup_np, z_top, z_bot):
    """Per xy sample: first and second downward surface z (peeled), used to
    place battery origins at agent-plausible heights."""
    v0, e1, e2, valid = soup_np
    o = jnp.concatenate(
        [xy, jnp.full((len(xy), 1), z_top, jnp.float32)], axis=1
    )
    down = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), o.shape)
    t1, _ = _dense_ray_idx(o, down, v0, e1, e2, valid)
    z1 = z_top - t1
    o2 = o.at[:, 2].set(jnp.where(jnp.isfinite(z1), z1 - 8.0, z_bot - 1.0))
    t2, _ = _dense_ray_idx(o2, down, v0, e1, e2, valid)
    z2 = o2[:, 2] - t2
    z1 = jnp.where(jnp.isfinite(z1), z1, z_bot)
    z2 = jnp.where(jnp.isfinite(z2), z2, z1)
    return z1, z2



def _make_origin_sampler(rng, walkable_points, ground_fn, grid_min, nx, ny,
                         cell_size, z_bot, z_top, z_reach_top=None):
    """Origins over agent-REACHABLE space: walkable points (navmesh) with xy
    jitter out to the query margin, z = local ground + eye/fall offsets.
    Restricting to reachable space is what makes the PVS battery converge —
    uniform sampling keeps discovering junk candidates from inside walls /
    outside the map that no runtime query can ever issue. The SAME sampler
    defines both the builder battery and verify_tables (the coverage
    contract is over this distribution)."""

    if z_reach_top is None:
        if walkable_points is not None and len(walkable_points) > 0:
            # agents only ever fall DOWN from walkable surfaces: nothing can
            # be above the highest walkable point + capsule/fall headroom
            z_reach_top = float(walkable_points[:, 2].max() + 150.0)
        else:
            z_reach_top = z_top
    z_cap = min(z_top, z_reach_top)

    def sample_origins(n):
        if walkable_points is not None and len(walkable_points) > 0:
            wp = walkable_points[rng.integers(0, len(walkable_points), n)]
            xy = (
                wp[:, :2]
                + rng.uniform(
                    -(QUERY_MARGIN + 20.0), QUERY_MARGIN + 20.0, (n, 2)
                )
            ).astype(np.float32)
            z1, z2 = ground_fn(jnp.asarray(xy))
            z1 = np.asarray(z1)
            z2 = np.asarray(z2)
            # a jitter that lands on/inside a wall (local ground far from
            # the walkable point's level) is an UNREACHABLE position — no
            # runtime query can originate there, so snap back to the
            # walkable point instead of polluting the tables with junk
            bad = np.abs(z1 - wp[:, 2]) > 120.0
            xy = np.where(bad[:, None], wp[:, :2].astype(np.float32), xy)
            z1 = np.where(bad, wp[:, 2], z1)
            z2 = np.where(bad, wp[:, 2], z2)
        else:
            xy = rng.uniform(
                [grid_min[0] - QUERY_MARGIN, grid_min[1] - QUERY_MARGIN],
                [grid_min[0] + nx * cell_size + QUERY_MARGIN,
                 grid_min[1] + ny * cell_size + QUERY_MARGIN],
                (n, 2),
            ).astype(np.float32)
            z1, z2 = ground_fn(jnp.asarray(xy))
            z1 = np.asarray(z1)
            z2 = np.asarray(z2)
        # the peeled second layer is only a real floor if an agent fits in
        # the air gap under the first; otherwise it is wall interior
        use_z2 = (z1 - z2) > 80.0
        ground = np.where((rng.random(n) < 0.25) & use_z2, z2, z1)
        u = rng.random(n)
        off = np.where(
            u < 0.8,
            rng.uniform(1.0, 130.0, n),
            rng.uniform(130.0, 420.0, n),
        )
        z = np.clip(ground + off, z_bot, z_cap).astype(np.float32)
        return np.concatenate([xy, z[:, None]], axis=1)

    return sample_origins


def build_cell_tables(
    tri_verts: np.ndarray,
    *,
    walkable_points: Optional[np.ndarray] = None,
    # NOTE: tri_verts must be in the runtime TriSoup's (Morton) order —
    # candidate indices address the soup arrays during winner
    # reconstruction (raycast_cull.sphere_cast_cull). load_map guarantees
    # this by sorting once and building both from the same array.
    cells_per_side: int = 24,
    near_dist: float = 190.0,
    rays_per_cell: int = 20000,
    casts_per_cell: int = 4000,
    sphere_radius: float = 15.0,
    seed: int = 0,
    k_max: int = 256,
    round_rays: int = 1 << 18,
    round_casts: int = 1 << 16,
    max_rounds: int = 60,
    progress: bool = False,
) -> dict:
    """Build candidate tables (host arrays). Heavy — cache via
    load_or_build_cell_tables. Returns a dict of numpy arrays + meta."""
    from .raycast import make_tri_soup, _sphere_cast_vs_tris_dense

    tv = np.asarray(tri_verts, np.float32)
    T = len(tv)
    lo = tv.reshape(-1, 3).min(axis=0)
    hi = tv.reshape(-1, 3).max(axis=0)
    nx = ny = int(cells_per_side)
    cell_size = float(max(hi[0] - lo[0], hi[1] - lo[1]) / cells_per_side + 1e-3)
    grid_min = np.array([lo[0], lo[1]], np.float64)
    C_grid = nx * ny

    masks = _near_sets(tv, grid_min, cell_size, nx, ny, near_dist)
    masks = np.concatenate([masks, np.zeros((1, T), bool)], axis=0)  # + dead

    v0 = jnp.asarray(tv[:, 0])
    e1 = jnp.asarray(tv[:, 1] - tv[:, 0])
    e2 = jnp.asarray(tv[:, 2] - tv[:, 0])
    valid = jnp.ones((T,), bool)
    soup_np = (v0, e1, e2, valid)
    # the dense sphere-cast winner needs a real TriSoup
    soup = make_tri_soup(tv, pad_to=128)

    rng = np.random.default_rng(seed)
    z_top = float(hi[2] + 50.0)
    z_bot = float(lo[2] - 10.0)

    ray_idx_fn = jax.jit(
        lambda o, d: _dense_ray_idx(o, d, v0, e1, e2, valid)
    )
    ground_fn = jax.jit(
        lambda xy: _ground_heights(xy, soup_np, z_top, z_bot)
    )

    def sc_idx_fn_builder():
        def f(o, d):
            # dense sphere-cast winner index: replicate the per-tri t from
            # the dense path and argmin it
            from .raycast import _closest_point_on_tri, _ray_vs_segment_capsule

            r = sphere_radius
            ob = o[..., None, :]
            db = d[..., None, :]
            n = soup.normal
            sv = soup.valid
            closest = _closest_point_on_tri(ob, soup.v0, soup.e1, soup.e2)
            dist2 = jnp.sum((ob - closest) ** 2, axis=-1)
            overlap = (dist2 <= r * r) & sv
            ndotd = jnp.sum(n * db, axis=-1)
            h = jnp.sum((ob - soup.v0) * n, axis=-1)
            sign = jnp.where(h >= 0, 1.0, -1.0)
            safe = jnp.where(jnp.abs(ndotd) > 1e-9, ndotd, 1.0)
            t_face = (sign * r - h) / safe
            contact = ob + t_face[..., None] * db - sign[..., None] * r * n
            cp = contact - soup.v0
            d00 = jnp.sum(soup.e1 * soup.e1, -1)
            d01 = jnp.sum(soup.e1 * soup.e2, -1)
            d11 = jnp.sum(soup.e2 * soup.e2, -1)
            d20 = jnp.sum(cp * soup.e1, -1)
            d21 = jnp.sum(cp * soup.e2, -1)
            den = d00 * d11 - d01 * d01
            invd = jnp.where(jnp.abs(den) > 1e-20, 1.0 / den, 0.0)
            bv = (d11 * d20 - d01 * d21) * invd
            bw = (d00 * d21 - d01 * d20) * invd
            face_ok = (
                (jnp.abs(ndotd) > 1e-9) & (t_face >= 0) & (bv >= 0)
                & (bw >= 0) & (bv + bw <= 1) & sv
            )
            t_face = jnp.where(face_ok, t_face, jnp.inf)
            t_e0 = _ray_vs_segment_capsule(ob, db, soup.v0, soup.e1, d00, r)
            t_e1 = _ray_vs_segment_capsule(ob, db, soup.v0, soup.e2, d11, r)
            e12 = soup.e2 - soup.e1
            t_e2 = _ray_vs_segment_capsule(
                ob, db, soup.v0 + soup.e1, e12, jnp.sum(e12 * e12, -1), r
            )
            t_edge = jnp.minimum(t_e0, jnp.minimum(t_e1, t_e2))
            t_edge = jnp.where(sv, t_edge, jnp.inf)
            t_tri = jnp.minimum(t_face, t_edge)
            t_tri = jnp.where(overlap, 0.0, t_tri)
            idx = jnp.argmin(t_tri, axis=-1)
            return jnp.min(t_tri, axis=-1), idx

        return jax.jit(f)

    sc_idx_fn = sc_idx_fn_builder()

    pad_tris = soup.v0.shape[0]

    def bin_hits(o_np, idx_np, finite_np):
        """Attribute each hit tri to every cell whose QUERY_MARGIN-expanded
        region contains the ray origin (exact margin coverage — queries may
        originate up to QUERY_MARGIN outside their cell of record).
        Tracks how many new (cell, tri) bits each round discovers."""
        o_np = o_np[finite_np]
        tris = idx_np[finite_np]
        tris = np.where(tris < T, tris, 0)
        ix_lo = np.clip(((o_np[:, 0] - QUERY_MARGIN - grid_min[0]) / cell_size).astype(np.int64), 0, nx - 1)
        ix_hi = np.clip(((o_np[:, 0] + QUERY_MARGIN - grid_min[0]) / cell_size).astype(np.int64), 0, nx - 1)
        iy_lo = np.clip(((o_np[:, 1] - QUERY_MARGIN - grid_min[1]) / cell_size).astype(np.int64), 0, ny - 1)
        iy_hi = np.clip(((o_np[:, 1] + QUERY_MARGIN - grid_min[1]) / cell_size).astype(np.int64), 0, ny - 1)
        before = int(masks.sum())
        for ix in (ix_lo, ix_hi):
            for iy in (iy_lo, iy_hi):
                np.logical_or.at(masks, (ix * ny + iy, tris), True)
        bits_added[0] += int(masks.sum()) - before

    # ---- main battery: chunked to bound the dense sweep's memory ----
    total_rays = rays_per_cell * C_grid
    total_casts = casts_per_cell * C_grid
    chunk = 1 << 15
    bits_added = [0]

    sample_origins = _make_origin_sampler(
        rng, walkable_points, ground_fn, grid_min, nx, ny, cell_size,
        z_bot, z_top,
    )

    def rand_dirs(n):
        d = rng.normal(size=(n, 3)).astype(np.float32)
        return d / np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-9)

    def ray_round(total):
        done = 0
        while done < total:
            n = min(chunk, total - done)
            o = sample_origins(n)
            d = rand_dirs(n)
            t, idx = ray_idx_fn(jnp.asarray(o), jnp.asarray(d))
            bin_hits(o, np.asarray(idx), np.isfinite(np.asarray(t)))
            done += n

    def cast_round(total):
        done = 0
        while done < total:
            n = min(1 << 13, total - done)
            o = sample_origins(n)
            d = rand_dirs(n)
            t, idx = sc_idx_fn(jnp.asarray(o), jnp.asarray(d))
            bin_hits(o, np.asarray(idx), np.isfinite(np.asarray(t)))
            done += n

    ray_round(total_rays)
    cast_round(total_casts)

    # Convergence rounds: keep sampling fresh batteries until several in a
    # row add nothing, or the round budget runs out. The tail is heavy
    # (grazing far slivers seen through rare sight lines), so full
    # convergence may not be reached — the residual miss rate is measured
    # by verify_tables and documented; it only perturbs SENSOR rays
    # (movement casts are covered exactly by the near sets).
    clean = 0
    rounds = 0
    while clean < 3 and rounds < max_rounds:
        bits_added[0] = 0
        ray_round(round_rays)
        cast_round(round_casts)
        rounds += 1
        if bits_added[0] == 0:
            clean += 1
        else:
            clean = 0
        if progress:
            print(f"  round {rounds}: +{bits_added[0]} bits "
                  f"(clean streak {clean})", flush=True)

    # ---- dead cell: rays/casts from the dead-agent teleport box ----
    n_dead = 1 << 16
    o = np.concatenate(
        [
            rng.uniform(-5.0, 5.0, (n_dead, 2)).astype(np.float32),
            rng.uniform(9995.0, 10130.0, (n_dead, 1)).astype(np.float32),
        ],
        axis=1,
    )
    d = rand_dirs(n_dead)
    t, idx = ray_idx_fn(jnp.asarray(o), jnp.asarray(d))
    fin = np.isfinite(np.asarray(t))
    idxn = np.asarray(idx)[fin]
    masks[C_grid, np.where(idxn < T, idxn, 0)] = True
    t, idx = sc_idx_fn(jnp.asarray(o[: n_dead // 4]), jnp.asarray(d[: n_dead // 4]))
    fin = np.isfinite(np.asarray(t))
    idxn = np.asarray(idx)[fin]
    masks[C_grid, np.where(idxn < T, idxn, 0)] = True

    counts = masks.sum(axis=1)
    k_raw = int(counts.max())
    K = max(128, -(-k_raw // 128) * 128)
    if K > k_max:
        raise ValueError(
            f"candidate sets too large for culling (K={k_raw} > {k_max}); "
            "increase k_max or use the dense path for this map"
        )

    C = C_grid + 1
    cand_idx = np.full((C, K), -1, np.int32)
    for c in range(C):
        ids = np.flatnonzero(masks[c])
        cand_idx[c, : len(ids)] = ids

    return {
        "version": np.int32(TABLE_VERSION),
        "cand_idx": cand_idx,
        "grid_min": grid_min.astype(np.float64),
        "cell_size": np.float64(cell_size),
        "nx": np.int32(nx),
        "ny": np.int32(ny),
        "K": np.int32(K),
        "k_raw": np.int32(k_raw),
        "mean_count": np.float64(counts[:C_grid].mean()),
    }


def pack_tables(raw: dict, tri_verts: np.ndarray) -> CellTables:
    """Host dict -> device CellTables (per-cell packed kernel constants)."""
    from .raycast_pallas import pack_dir_consts, pack_tri_consts
    from .raycast_cull import SC2_ROWS, pack_sc2_consts

    tv = np.asarray(tri_verts, np.float32)
    cand_idx = raw["cand_idx"]
    C, K = cand_idx.shape

    ray_p = np.zeros((C, 16, K), np.float32)
    sc_p = np.zeros((C, SC2_ROWS, K), np.float32)
    for c in range(C):
        ids = cand_idx[c][cand_idx[c] >= 0]
        if len(ids) == 0:
            continue
        ray_p[c, :, : len(ids)] = pack_tri_consts(tv[ids], pad_to=len(ids))
        sc_p[c, :, : len(ids)] = pack_sc2_consts(tv[ids], pad_to=len(ids))

    # per-cell bf16 direction-dot matrices (derived; no cache version bump)
    ray_dir = np.stack([np.asarray(pack_dir_consts(ray_p[c])) for c in range(C)])

    return CellTables(
        cand_idx=jnp.asarray(cand_idx),
        ray_packed=jnp.asarray(ray_p),
        ray_dir_packed=jnp.asarray(ray_dir),
        sc_packed=jnp.asarray(sc_p),
        grid_min_x=float(raw["grid_min"][0]),
        grid_min_y=float(raw["grid_min"][1]),
        cell_size=float(raw["cell_size"]),
        nx=int(raw["nx"]),
        ny=int(raw["ny"]),
        K=int(raw["K"]),
    )


def _tri_hash(tri_verts: np.ndarray) -> str:
    return hashlib.sha256(
        np.ascontiguousarray(tri_verts, np.float32).tobytes()
    ).hexdigest()[:16]


def load_or_build_cell_tables(
    tri_verts: np.ndarray,
    cache_dir: Optional[str] = None,
    build_if_missing: bool = True,
    **kwargs,
) -> Optional[CellTables]:
    """Load cached tables (<map>/culling.npz, valid for these exact
    triangles) or build + cache. Returns None when missing and
    build_if_missing=False (dense fallback). Battery parameters don't enter
    cache identity — a bigger battery only tightens the same tables."""
    key = _tri_hash(tri_verts)
    path = None
    if cache_dir is not None:
        path = os.path.join(cache_dir, "culling.npz")
        if os.path.exists(path):
            raw = dict(np.load(path))
            if (
                int(raw.get("version", -1)) == TABLE_VERSION
                and str(raw.get("tri_hash", "")) == key
            ):
                return pack_tables(raw, tri_verts)
    if not build_if_missing:
        return None
    raw = build_cell_tables(tri_verts, **kwargs)
    raw["tri_hash"] = key
    if path is not None:
        try:
            np.savez_compressed(path, **raw)
        except OSError:
            pass
    return pack_tables(raw, tri_verts)


def verify_tables(
    tri_verts: np.ndarray,
    tables: CellTables,
    n_rays: int = 200000,
    n_casts: int = 50000,
    sphere_radius: float = 15.0,
    seed: int = 123,
    walkable_points: Optional[np.ndarray] = None,
):
    """Randomized culled-vs-dense verification over the SAME reachable-
    origin distribution the builder batteries use. Returns dict of mismatch
    counts (0 everywhere = the tables are exact on this battery)."""
    from .raycast import (
        TriSoup, make_tri_soup, _ray_vs_tris_dense, _sphere_cast_vs_tris_dense,
    )

    tv = np.asarray(tri_verts, np.float32)
    soup = make_tri_soup(tv, pad_to=128)
    rng = np.random.default_rng(seed)

    lo = tv.reshape(-1, 3).min(axis=0)
    hi = tv.reshape(-1, 3).max(axis=0)

    v0 = jnp.asarray(tv[:, 0])
    e1 = jnp.asarray(tv[:, 1] - tv[:, 0])
    e2 = jnp.asarray(tv[:, 2] - tv[:, 0])
    valid = jnp.ones((len(tv),), bool)
    tvj = jnp.asarray(tv)
    cand = tables.cand_idx

    ground_fn = jax.jit(lambda xy: _ground_heights(
        xy, (v0, e1, e2, valid), float(hi[2] + 50), float(lo[2] - 10)))

    sample_origins = _make_origin_sampler(
        rng, walkable_points, ground_fn,
        np.array([tables.grid_min_x, tables.grid_min_y]),
        tables.nx, tables.ny, tables.cell_size,
        float(lo[2] - 10), float(hi[2] + 50),
    )

    def sample(n):
        o = sample_origins(n)
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-9)
        return jnp.asarray(o), jnp.asarray(d)

    def gathered(o):
        """Per-query candidate mini-soups, gathered bit-exactly from the
        full soup arrays (recomputing edges/normals in f32 would perturb
        grazing-hit t's and report false mismatches)."""
        cells = cell_index(tables, o)
        ids = cand[cells]  # [n, K]
        safe = jnp.maximum(ids, 0)
        return (
            soup.v0[safe], soup.e1[safe], soup.e2[safe], soup.normal[safe],
            ids >= 0,
        )

    K = tables.K
    zero16 = jnp.zeros((16, K))
    zerod = jnp.zeros((16, 3 * K), jnp.bfloat16)

    @jax.jit
    def ray_pair(o, d):
        td = _ray_vs_tris_dense(o, d, soup)
        sv0, se1, se2, n, vl = gathered(o)
        tc = jax.vmap(lambda oo, dd, a, b, c, nn, v: _ray_vs_tris_dense(
            oo, dd, TriSoup(a, b, c, nn, v, zero16, zero16, zerod)
        ))(o, d, sv0, se1, se2, n, vl)
        return td, tc

    @jax.jit
    def sc_pair(o, d):
        td, _ = _sphere_cast_vs_tris_dense(o, d, sphere_radius, soup)
        sv0, se1, se2, n, vl = gathered(o)
        tc, _ = jax.vmap(
            lambda oo, dd, a, b, c, nn, v: _sphere_cast_vs_tris_dense(
                oo, dd, sphere_radius,
                TriSoup(a, b, c, nn, v, zero16, zero16, zerod),
            )
        )(o, d, sv0, se1, se2, n, vl)
        return td, tc

    def mismatches(td, tc):
        """A real mismatch = different hit/miss or a t difference beyond
        fp reassociation noise (the two sweeps fuse differently under XLA,
        so long casts legitimately differ in the last few ulps — relative
        tolerance, not absolute)."""
        td, tc = np.asarray(td), np.asarray(tc)
        both = np.isfinite(td) & np.isfinite(tc)
        diff = np.where(both, np.abs(np.where(both, td, 0) - np.where(both, tc, 0)), 0.0)
        tol = 1e-3 + 1e-4 * np.abs(np.where(both, td, 0))
        return int(
            np.sum((np.isfinite(td) != np.isfinite(tc)) | (both & (diff > tol)))
        )

    ray_mismatch = 0
    chunk = 1 << 14
    done = 0
    while done < n_rays:
        n = min(chunk, n_rays - done)
        o, d = sample(n)
        td, tc = ray_pair(o, d)
        ray_mismatch += mismatches(td, tc)
        done += n

    sc_mismatch = 0
    done = 0
    while done < n_casts:
        n = min(chunk // 4, n_casts - done)
        o, d = sample(n)
        td, tc = sc_pair(o, d)
        sc_mismatch += mismatches(td, tc)
        done += n

    return {"ray_mismatch": ray_mismatch, "sc_mismatch": sc_mismatch,
            "n_rays": n_rays, "n_casts": n_casts}


# ---------------------------------------------------------------------------
# Short-range candidate tables (movement sphere casts)
# ---------------------------------------------------------------------------
#
# Movement casts are xy-BOUNDED: unstick probes are range-clamped at
# UNSTICK_RANGE (64) and originate <= 2r from the agent, forward/slide
# travel <= max_run_velocity*dt + buf (~20), and every straight-down cast
# stays within r of its origin column in xy. The grid is 2D (xy columns,
# all z), so a per-cell candidate set of "triangles whose xy-AABB
# intersects the margin-expanded cell" is EXACT for these casts by
# construction — no sampling, no PVS. SHORT_MARGIN = 64 + 2r + r + travel
# slack. Typical sets are ~8x smaller than the full soup (simple_map:
# mean 14, max 44 of 252), and K_s only needs sublane (8) alignment in the
# cols-layout planar kernel.

SHORT_TABLE_VERSION = 1
SHORT_MARGIN = 130.0


class ShortTables(NamedTuple):
    """Device-resident short-range candidate tables. C = nx*ny cells."""

    cand: jax.Array  # [C * K] i32 flat global tri rows (-1 padding)
    table: jax.Array  # [C*K, 40] f32 flat per-cell sc consts (tris on rows)
    grid_min: np.ndarray  # host [2] f64
    cell_size: float
    nx: int
    ny: int
    K: int


def short_cell_index(st: ShortTables, pos: jax.Array) -> jax.Array:
    """pos [..., 3] -> clamped xy cell index [...] i32."""
    gx = jnp.clip(
        ((pos[..., 0] - st.grid_min[0]) / st.cell_size).astype(jnp.int32),
        0, st.nx - 1,
    )
    gy = jnp.clip(
        ((pos[..., 1] - st.grid_min[1]) / st.cell_size).astype(jnp.int32),
        0, st.ny - 1,
    )
    return gy * st.nx + gx


def build_short_tables(
    tri_verts: np.ndarray,
    cells_per_side: int = 12,
    margin: float = SHORT_MARGIN,
) -> dict:
    """Exact-by-construction short-range tables (host, cheap: pure AABB
    tests). tri_verts must be in the runtime TriSoup (Morton) order."""
    tv = np.asarray(tri_verts, np.float32)
    lo = tv.reshape(-1, 3).min(axis=0)
    hi = tv.reshape(-1, 3).max(axis=0)
    nx = ny = int(cells_per_side)
    cell_size = float(
        max(hi[0] - lo[0], hi[1] - lo[1]) / cells_per_side + 1e-3
    )
    tmin = tv.min(axis=1)
    tmax = tv.max(axis=1)

    cand_rows = []
    k_needed = 1
    for iy in range(ny):
        for ix in range(nx):
            x0 = lo[0] + ix * cell_size - margin
            x1 = lo[0] + (ix + 1) * cell_size + margin
            y0 = lo[1] + iy * cell_size - margin
            y1 = lo[1] + (iy + 1) * cell_size + margin
            hit = (
                (tmin[:, 0] <= x1) & (tmax[:, 0] >= x0)
                & (tmin[:, 1] <= y1) & (tmax[:, 1] >= y0)
            )
            idx = np.nonzero(hit)[0].astype(np.int32)
            cand_rows.append(idx)
            k_needed = max(k_needed, len(idx))
    K = -(-k_needed // 8) * 8
    cand = np.full((nx * ny, K), -1, np.int32)
    for c, idx in enumerate(cand_rows):
        cand[c, : len(idx)] = idx
    return {
        "version": np.int32(SHORT_TABLE_VERSION),
        "cand_idx": cand,
        "grid_min": np.asarray([lo[0], lo[1]], np.float64),
        "cell_size": np.float64(cell_size),
        "nx": np.int32(nx),
        "ny": np.int32(ny),
        "K": np.int32(K),
        "margin": np.float64(margin),
    }


def pack_short_tables(raw: dict, tri_verts: np.ndarray) -> ShortTables:
    """Gather per-cell [K, 40] sphere-cast constants (tris on sublane
    rows). Padding candidates (-1) get all-zero constants: valid = 0 so
    the kernel rejects them without a mask."""
    from .raycast_cull import pack_sc2_consts

    cand = np.asarray(raw["cand_idx"], np.int32)  # [C, K]
    C, K = cand.shape
    full = pack_sc2_consts(tri_verts, pad_to=1).T  # [T(+pad), 40]
    full = np.concatenate(
        [full, np.zeros((1, full.shape[1]), np.float32)], axis=0
    )
    safe = np.where(cand >= 0, cand, full.shape[0] - 1)
    # flat [C*K, 41]: the kernel's per-cell slice is then a plain 2D block;
    # column 40 carries the GLOBAL tri row as f32 (exact to 2^24) so the
    # kernel's winner index needs no post-hoc candidate-id gather
    table = full[safe.reshape(-1)]
    gid = np.where(cand >= 0, cand, 2 ** 24).reshape(-1, 1).astype(np.float32)
    table = np.concatenate([table, gid], axis=1)
    return ShortTables(
        cand=jnp.asarray(cand.reshape(-1)),
        table=jnp.asarray(table),
        grid_min=np.asarray(raw["grid_min"], np.float64),
        cell_size=float(raw["cell_size"]),
        nx=int(raw["nx"]),
        ny=int(raw["ny"]),
        K=K,
    )


# xy margin for the movement-cast table set (everything in the collide-and-
# slide chain EXCEPT the 4 unstick probes): forward casts only need exact t
# within move_dist + buf (max_run_velocity 400 * dt 0.05 = 20; beyond that
# every consumer is clamped/min-ed, see sim/movement.py analysis), down
# casts (slope / ground checks / fall) are xy-bounded by origin drift
# (<= unstick 2r = 30) + agent_radius 15. 64 covers both with slack; the
# probes need UNSTICK_RANGE 64 + 2r + r ~ 110 and stay on the 130 tables.
MOVE_MARGIN = 64.0


def load_or_build_short_tables(
    tri_verts: np.ndarray, cache_dir: Optional[str] = None,
    margin: float = SHORT_MARGIN, tag: str = "",
) -> ShortTables:
    """Short tables are cheap to build (ms of AABB tests) — cache is
    best-effort (<map>/culling_short<tag>.npz)."""
    key = _tri_hash(tri_verts)
    path = None
    if cache_dir is not None:
        path = os.path.join(cache_dir, f"culling_short{tag}.npz")
        if os.path.exists(path):
            raw = dict(np.load(path))
            if (
                int(raw.get("version", -1)) == SHORT_TABLE_VERSION
                and str(raw.get("tri_hash", "")) == key
                and float(raw.get("margin", -1.0)) == float(margin)
            ):
                return pack_short_tables(raw, tri_verts)
    raw = build_short_tables(tri_verts, margin=margin)
    raw["tri_hash"] = key
    if path is not None:
        try:
            np.savez_compressed(path, **raw)
        except OSError:
            pass
    return pack_short_tables(raw, tri_verts)


# ---------------------------------------------------------------------------
# Ray-only sensor tables (the v9 fan kernel's candidate sets)
# ---------------------------------------------------------------------------
#
# The combined tables above union ray-PVS + sphere-cast-PVS + a generous
# near set under QUERY_MARGIN=80 of origin drift — on simple_map that lands
# at K=128 of 252, a 2x cut that loses to the dense fan kernel. Sensor fans
# are a much friendlier query class:
#   * origins are EXACTLY the per-step cell-of-record position (the fan
#     bases at state.pos, cells computed from the same value) — margin is
#     only a cell-boundary epsilon, not 80 units of drift;
#   * only rays, no sphere sweeps — no capsule-inflated candidates;
#   * origins are eye positions over reachable space — the same sampler
#     distribution as the batteries.
# That drops the possibly-nearest set to ~30-60 triangles/cell on
# simple_map-like maps, which the v9 transposed kernel (tris on sublanes)
# can exploit: K only needs 8-alignment, not the 128-lane floor.

RAY_TABLE_VERSION = 1
SENSOR_MARGIN = 12.0  # fan origins == cell-of-record position; margin only
# absorbs the cell-boundary epsilon and z-offset parallax of eye rays


class RayTables(NamedTuple):
    """Device-resident v9 fan-kernel tables. C = nx*ny cells + 1 dead cell.

    ``dir9``/``org9`` rows are candidate-major in 3 groups of K: rows
    [k | K+k | 2K+k] hold triangle k's (n | w1 | w2) xyz direction rows
    (bf16, cols 0-2) and (d0-n.o | w1.o+c1 | w2.o+c2) affine origin rows
    ((-n, d0), (w1, c1), (w2, c2) against (ox, oy, oz, 1); f32, cols 0-3)."""

    cand_idx: jax.Array  # [C, K] i32 original tri rows (-1 pad)
    dir9: jax.Array  # [C, 8, 3K] bf16 (coeff rows on sublanes)
    org9: jax.Array  # [C, 8, 3K] f32
    grid_min_x: float
    grid_min_y: float
    cell_size: float
    nx: int
    ny: int
    K: int

    @property
    def dead_cell(self):
        return self.nx * self.ny


def ray_cell_index(rt: RayTables, pos: jax.Array) -> jax.Array:
    """pos [..., 3] -> ray-table cell id [...] i32 (dead-agent teleport box
    maps to the dead cell, same rule as cell_index)."""
    ix = jnp.clip(
        ((pos[..., 0] - rt.grid_min_x) / rt.cell_size).astype(jnp.int32),
        0, rt.nx - 1,
    )
    iy = jnp.clip(
        ((pos[..., 1] - rt.grid_min_y) / rt.cell_size).astype(jnp.int32),
        0, rt.ny - 1,
    )
    cid = ix * rt.ny + iy
    dead = pos[..., 2] > 5000.0
    return jnp.where(dead, rt.dead_cell, cid)


def build_ray_tables(
    tri_verts: np.ndarray,
    *,
    walkable_points: Optional[np.ndarray] = None,
    cells_per_side: int = 16,
    near_dist: float = 80.0,
    rays_per_cell: int = 30000,
    seed: int = 7,
    k_max: int = 192,
    round_rays: int = 1 << 19,
    max_rounds: int = 80,
    progress: bool = False,
) -> dict:
    """Sampled first-hit PVS per cell for sensor rays (host arrays; cache
    via load_or_build_ray_tables). Same battery machinery as
    build_cell_tables but rays only, binned with SENSOR_MARGIN, plus a
    small conservative near set (short rays always covered exactly)."""
    tv = np.asarray(tri_verts, np.float32)
    T = len(tv)
    lo = tv.reshape(-1, 3).min(axis=0)
    hi = tv.reshape(-1, 3).max(axis=0)
    nx = ny = int(cells_per_side)
    cell_size = float(
        max(hi[0] - lo[0], hi[1] - lo[1]) / cells_per_side + 1e-3
    )
    grid_min = np.array([lo[0], lo[1]], np.float64)
    C_grid = nx * ny

    masks = _near_sets(tv, grid_min, cell_size, nx, ny, near_dist)
    masks = np.concatenate([masks, np.zeros((1, T), bool)], axis=0)

    v0 = jnp.asarray(tv[:, 0])
    e1 = jnp.asarray(tv[:, 1] - tv[:, 0])
    e2 = jnp.asarray(tv[:, 2] - tv[:, 0])
    valid = jnp.ones((T,), bool)
    rng = np.random.default_rng(seed)
    z_top = float(hi[2] + 50.0)
    z_bot = float(lo[2] - 10.0)

    ray_idx_fn = jax.jit(
        lambda o, d: _dense_ray_idx(o, d, v0, e1, e2, valid)
    )
    ground_fn = jax.jit(
        lambda xy: _ground_heights(xy, (v0, e1, e2, valid), z_top, z_bot)
    )
    sample_origins = _make_origin_sampler(
        rng, walkable_points, ground_fn, grid_min, nx, ny, cell_size,
        z_bot, z_top,
    )

    bits_added = [0]

    def bin_hits(o_np, idx_np, finite_np):
        o_np = o_np[finite_np]
        tris = idx_np[finite_np]
        tris = np.where(tris < T, tris, 0)
        m = SENSOR_MARGIN
        ix_lo = np.clip(((o_np[:, 0] - m - grid_min[0]) / cell_size).astype(np.int64), 0, nx - 1)
        ix_hi = np.clip(((o_np[:, 0] + m - grid_min[0]) / cell_size).astype(np.int64), 0, nx - 1)
        iy_lo = np.clip(((o_np[:, 1] - m - grid_min[1]) / cell_size).astype(np.int64), 0, ny - 1)
        iy_hi = np.clip(((o_np[:, 1] + m - grid_min[1]) / cell_size).astype(np.int64), 0, ny - 1)
        before = int(masks.sum())
        for ix in (ix_lo, ix_hi):
            for iy in (iy_lo, iy_hi):
                np.logical_or.at(masks, (ix * ny + iy, tris), True)
        bits_added[0] += int(masks.sum()) - before

    def rand_dirs(n):
        d = rng.normal(size=(n, 3)).astype(np.float32)
        return d / np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-9)

    chunk = 1 << 15

    def ray_round(total):
        done = 0
        while done < total:
            n = min(chunk, total - done)
            o = sample_origins(n)
            d = rand_dirs(n)
            t, idx = ray_idx_fn(jnp.asarray(o), jnp.asarray(d))
            bin_hits(o, np.asarray(idx), np.isfinite(np.asarray(t)))
            done += n

    ray_round(rays_per_cell * C_grid)
    clean = 0
    rounds = 0
    while clean < 3 and rounds < max_rounds:
        bits_added[0] = 0
        ray_round(round_rays)
        rounds += 1
        clean = clean + 1 if bits_added[0] == 0 else 0
        if progress:
            print(f"  ray round {rounds}: +{bits_added[0]} bits "
                  f"(clean streak {clean})", flush=True)

    # dead cell: rays from the dead-agent teleport box
    n_dead = 1 << 16
    o = np.concatenate(
        [
            rng.uniform(-5.0, 5.0, (n_dead, 2)).astype(np.float32),
            rng.uniform(9995.0, 10130.0, (n_dead, 1)).astype(np.float32),
        ],
        axis=1,
    )
    d = rand_dirs(n_dead)
    t, idx = ray_idx_fn(jnp.asarray(o), jnp.asarray(d))
    fin = np.isfinite(np.asarray(t))
    idxn = np.asarray(idx)[fin]
    masks[C_grid, np.where(idxn < T, idxn, 0)] = True

    counts = masks.sum(axis=1)
    k_raw = int(counts.max())
    K = -(-max(k_raw, 8) // 8) * 8
    if K > k_max:
        raise ValueError(
            f"sensor candidate sets too large (K={k_raw} > {k_max}); "
            "use the dense fan path for this map"
        )

    C = C_grid + 1
    cand_idx = np.full((C, K), -1, np.int32)
    for c in range(C):
        ids = np.flatnonzero(masks[c])
        cand_idx[c, : len(ids)] = ids

    return {
        "version": np.int32(RAY_TABLE_VERSION),
        "cand_idx": cand_idx,
        "grid_min": grid_min.astype(np.float64),
        "cell_size": np.float64(cell_size),
        "nx": np.int32(nx),
        "ny": np.int32(ny),
        "K": np.int32(K),
        "k_raw": np.int32(k_raw),
        "mean_count": np.float64(counts[:C_grid].mean()),
    }


def pack_ray_tables(raw: dict, tri_verts: np.ndarray) -> RayTables:
    """Host dict -> device RayTables (v9 fan-kernel matmul matrices)."""
    from .raycast_pallas import pack_tri_consts

    tv = np.asarray(tri_verts, np.float32)
    cand_idx = np.asarray(raw["cand_idx"], np.int32)
    C, K = cand_idx.shape

    # [C, 8, 3K]: coeff rows on sublanes, candidates on lanes (an
    # [.., 3K, 8] layout would pad the 8-minor dim to 128 lanes — a 16x
    # physical blowup on the per-block table gathers)
    dir9 = np.zeros((C, 8, 3 * K), np.float32)
    org9 = np.zeros((C, 8, 3 * K), np.float32)
    for c in range(C):
        ids = cand_idx[c][cand_idx[c] >= 0]
        if len(ids) == 0:
            continue
        tc = pack_tri_consts(tv[ids], pad_to=len(ids))  # [16, k]
        k = len(ids)
        # direction coeff cols: n | w1 | w2 xyz (padding tris stay
        # all-zero -> nd = 0 -> NaN t -> miss, no mask needed)
        dir9[c, 0:3, 0:k] = tc[0:3]          # n
        dir9[c, 0:3, K:K + k] = tc[4:7]      # w1
        dir9[c, 0:3, 2 * K:2 * K + k] = tc[8:11]  # w2
        # origin coeffs against (ox, oy, oz, 1):
        org9[c, 0:3, 0:k] = -tc[0:3]         # d0 - n.o
        org9[c, 3, 0:k] = tc[3]
        org9[c, 0:3, K:K + k] = tc[4:7]      # w1.o + c1
        org9[c, 3, K:K + k] = tc[7]
        org9[c, 0:3, 2 * K:2 * K + k] = tc[8:11]  # w2.o + c2
        org9[c, 3, 2 * K:2 * K + k] = tc[11]

    return RayTables(
        cand_idx=jnp.asarray(cand_idx),
        dir9=jnp.asarray(dir9.astype(jnp.bfloat16)),
        org9=jnp.asarray(org9),
        grid_min_x=float(raw["grid_min"][0]),
        grid_min_y=float(raw["grid_min"][1]),
        cell_size=float(raw["cell_size"]),
        nx=int(raw["nx"]),
        ny=int(raw["ny"]),
        K=K,
    )


def load_or_build_ray_tables(
    tri_verts: np.ndarray,
    cache_dir: Optional[str] = None,
    build_if_missing: bool = True,
    **kwargs,
) -> Optional[RayTables]:
    """Load cached sensor-ray tables (<map>/culling_ray.npz) or build +
    cache; None when missing and build_if_missing=False (dense fan
    fallback)."""
    key = _tri_hash(tri_verts)
    path = None
    if cache_dir is not None:
        path = os.path.join(cache_dir, "culling_ray.npz")
        if os.path.exists(path):
            raw = dict(np.load(path))
            if (
                int(raw.get("version", -1)) == RAY_TABLE_VERSION
                and str(raw.get("tri_hash", "")) == key
            ):
                return pack_ray_tables(raw, tri_verts)
    if not build_if_missing:
        return None
    raw = build_ray_tables(tri_verts, **kwargs)
    raw["tri_hash"] = key
    if path is not None:
        try:
            np.savez_compressed(path, **raw)
        except OSError:
            pass
    return pack_ray_tables(raw, tri_verts)


def verify_ray_tables(
    tri_verts: np.ndarray,
    tables: RayTables,
    n_rays: int = 200000,
    seed: int = 321,
    walkable_points: Optional[np.ndarray] = None,
) -> dict:
    """Randomized culled-vs-dense first-hit check over the builder's origin
    distribution with origins snapped to their exact cell (the runtime
    contract: fan origin == cell-of-record position). Returns mismatch
    counts (0 = exact on this battery)."""
    tv = np.asarray(tri_verts, np.float32)
    T = len(tv)
    lo = tv.reshape(-1, 3).min(axis=0)
    hi = tv.reshape(-1, 3).max(axis=0)
    v0 = jnp.asarray(tv[:, 0])
    e1 = jnp.asarray(tv[:, 1] - tv[:, 0])
    e2 = jnp.asarray(tv[:, 2] - tv[:, 0])
    valid = jnp.ones((T,), bool)
    rng = np.random.default_rng(seed)

    ground_fn = jax.jit(lambda xy: _ground_heights(
        xy, (v0, e1, e2, valid), float(hi[2] + 50), float(lo[2] - 10)))
    sample_origins = _make_origin_sampler(
        rng, walkable_points, ground_fn,
        np.array([tables.grid_min_x, tables.grid_min_y]),
        tables.nx, tables.ny, tables.cell_size,
        float(lo[2] - 10), float(hi[2] + 50),
    )
    cand = tables.cand_idx

    @jax.jit
    def pair(o, d):
        t_dense, _ = _dense_ray_idx(o, d, v0, e1, e2, valid)
        cells = ray_cell_index(tables, o)
        ids = cand[cells]  # [n, K]
        safe = jnp.maximum(ids, 0)
        sv0, se1, se2 = v0[safe], e1[safe], e2[safe]
        vl = ids >= 0
        tc = jax.vmap(
            lambda oo, dd, a, b, c, vv: _dense_ray_idx(oo, dd, a, b, c, vv)[0]
        )(o, d, sv0, se1, se2, vl)
        return t_dense, tc

    mism = 0
    done = 0
    while done < n_rays:
        n = min(1 << 15, n_rays - done)
        o = sample_origins(n)
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-9)
        td, tc = pair(jnp.asarray(o), jnp.asarray(d))
        td, tc = np.asarray(td), np.asarray(tc)
        bad = ~(
            np.isclose(td, tc, rtol=1e-6, atol=1e-4)
            | (np.isinf(td) & np.isinf(tc))
        )
        mism += int(bad.sum())
        done += n
    return {"ray_mismatch": mism, "n_rays": n_rays}


class SortedLayout(NamedTuple):
    """Agent-groups sorted by cell, runs padded to `ab` groups so each
    block of `ab` consecutive slots shares one cell."""

    src: jax.Array  # [S] i32 source group index per slot (N = dummy)
    slot: jax.Array  # [N] i32 slot of each source group
    block_cell: jax.Array  # [S // ab] i32 cell of each block
    S: int  # static padded slot count


def agent_sorted_layout(cells: jax.Array, C: int, ab: int,
                        group_mult: int = 1) -> SortedLayout:
    """Argsort-based cell grouping (argsort + [N]-gathers measure ~0.02 ms
    at N = 12k on v5e — the rank-matmul machinery in cell_sorted_layout
    predates that measurement and is superseded by this for new paths).
    ``group_mult``: round the group count up to this multiple (kernels
    that sweep several groups per block need an even block split; tail
    groups carry dummy sources and a clamped cell)."""
    N = cells.shape[0]
    S = -(-(N + C * (ab - 1)) // (ab * group_mult)) * ab * group_mult
    B = S // ab

    order = jnp.argsort(cells, stable=True)  # [N]
    sorted_cells = cells[order]
    # run starts / counts via vectorized binary search over the sorted keys
    # (a scatter-add bincount measured ~0.1 ms — gathers/scatters on TPU
    # serialize; searchsorted is log N vector work)
    run_start = jnp.searchsorted(
        sorted_cells, jnp.arange(C, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    run_end = jnp.searchsorted(
        sorted_cells, jnp.arange(C, dtype=jnp.int32), side="right"
    ).astype(jnp.int32)
    counts = run_end - run_start
    padded = ((counts + ab - 1) // ab) * ab
    cell_off = jnp.cumsum(padded) - padded  # exclusive
    # slot of sorted item j: cell_off[c] + (j - run_start[c]); the [C]->[N]
    # expansion is a one-hot masked sum (a [N]-gather from the small table
    # serializes on TPU at ~10 ns/element; the [N, C] compare+sum is
    # full-vector work)
    offdiff = cell_off - run_start  # [C]
    oh = sorted_cells[:, None] == jnp.arange(C, dtype=jnp.int32)  # [N, C]
    offdiff_n = jnp.sum(jnp.where(oh, offdiff[None, :], 0), axis=-1)
    slot_sorted = (
        offdiff_n + jnp.arange(N, dtype=jnp.int32)
    ).astype(jnp.int32)

    src = jnp.full((S,), N, jnp.int32).at[slot_sorted].set(order)
    slot = jnp.zeros((N,), jnp.int32).at[order].set(slot_sorted)
    blocks_per_cell = padded // ab
    block_cell = jnp.repeat(
        jnp.arange(C, dtype=jnp.int32), blocks_per_cell,
        total_repeat_length=B,
    )
    return SortedLayout(src=src, slot=slot, block_cell=block_cell, S=S)


class PackedLayout(NamedTuple):
    """Like SortedLayout, but ``apg`` agents of the same cell share one
    8-lane slot (a *unit*): lane economics for 1-2-cast launches, where the
    one-agent-per-slot layout wastes 6-7 of 8 lanes on padding."""

    src: jax.Array  # [S_units * apg] i32 source agent per agent-slot
    slot: jax.Array  # [N] i32 agent-slot of each source agent
    block_cell: jax.Array  # [S_units // ab] i32 cell per ab-unit segment
    S_units: int  # static padded unit count


def packed_sorted_layout(cells: jax.Array, C: int, apg: int, ab: int,
                         group_mult: int = 1) -> PackedLayout:
    """agent_sorted_layout generalized to ``apg`` agents per 8-lane unit:
    each cell's sorted run is packed apg agents to a unit, runs padded to
    ``ab`` units so every segment of ab consecutive units shares one cell.
    apg=1 degenerates to agent_sorted_layout. Static S_units is the worst
    case (per-cell apg remainder + per-cell ab padding); extra units carry
    dummy sources (src = N) and a clamped cell."""
    N = cells.shape[0]
    units_worst = -(-(N + C * (apg - 1)) // apg) + C * (ab - 1)
    S_u = -(-units_worst // (ab * group_mult)) * (ab * group_mult)
    B = S_u // ab

    order = jnp.argsort(cells, stable=True)  # [N]
    sorted_cells = cells[order]
    run_start = jnp.searchsorted(
        sorted_cells, jnp.arange(C, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    run_end = jnp.searchsorted(
        sorted_cells, jnp.arange(C, dtype=jnp.int32), side="right"
    ).astype(jnp.int32)
    counts = run_end - run_start
    units = (counts + apg - 1) // apg
    padded_units = ((units + ab - 1) // ab) * ab
    unit_off = jnp.cumsum(padded_units) - padded_units  # exclusive
    agent_off = unit_off * apg  # first agent-slot of each cell's run
    offdiff = agent_off - run_start  # [C]
    oh = sorted_cells[:, None] == jnp.arange(C, dtype=jnp.int32)  # [N, C]
    offdiff_n = jnp.sum(jnp.where(oh, offdiff[None, :], 0), axis=-1)
    slot_sorted = (
        offdiff_n + jnp.arange(N, dtype=jnp.int32)
    ).astype(jnp.int32)

    S_a = S_u * apg
    src = jnp.full((S_a,), N, jnp.int32).at[slot_sorted].set(order)
    slot = jnp.zeros((N,), jnp.int32).at[order].set(slot_sorted)
    blocks_per_cell = padded_units // ab
    block_cell = jnp.repeat(
        jnp.arange(C, dtype=jnp.int32), blocks_per_cell,
        total_repeat_length=B,
    )
    return PackedLayout(src=src, slot=slot, block_cell=block_cell, S_units=S_u)
