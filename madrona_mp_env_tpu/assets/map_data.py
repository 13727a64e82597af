"""Device-resident map data bundle.

The TPU equivalent of everything Manager::Impl::init uploads to the GPU
(reference src/mgr.cpp:1213-1913): collision geometry, navmesh + A* next-hop
table, spawn tables, zones, weapon stats, goal regions. All leaves are
jnp arrays captured as constants by the jitted step.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import consts
from ..config import EnvConfig
from ..ops.raycast import TriSoup, make_tri_soup
from . import formats
from .navmesh import build_navmesh_tables


class MapData(NamedTuple):
    # collision geometry
    tris: TriSoup
    world_min: jax.Array  # [3]
    world_max: jax.Array  # [3]

    # per-cell raycast candidate tables (ops/culling.py); None -> the
    # kernels sweep the full soup (dense fallback)
    cells: Optional[object]
    # short-range (movement-cast) candidate tables — exact by construction
    # (ops/culling.py ShortTables); None -> dense movement casts
    short: Optional[object]

    # navmesh
    nav_verts: jax.Array  # [V, 3]
    nav_tri_indices: jax.Array  # [T, 3] i32
    nav_centroids: jax.Array  # [T, 3]
    nav_adjacency: jax.Array  # [T, 3] i32
    nav_next_hop: jax.Array  # [T, T] i32
    nav_area_cdf: jax.Array  # [T]

    # spawns (Spawn = aabb_min(3), aabb_max(3), yaw_min, yaw_max)
    # a/b spawns are stacked into one [2, N, 8] table (padded) so the
    # team->side selection is a dynamic gather; layout per side is
    # [defaults..., extras...] like the reference (mgr.cpp:1248-1300).
    side_spawns: jax.Array  # [2, N, 8]
    num_default_side_spawns: jax.Array  # [2] i32
    num_extra_side_spawns: jax.Array  # [2] i32
    common_respawns: jax.Array  # [Nc, 8]
    num_common_respawns: int  # static

    # zones
    zone_min: jax.Array  # [Z, 3]
    zone_max: jax.Array  # [Z, 3]
    zone_rot: jax.Array  # [Z]
    num_zones: int  # static

    # weapon stats [NW]
    weapon_mag_size: jax.Array
    weapon_reload_time: jax.Array
    weapon_dmg: jax.Array
    weapon_accuracy: jax.Array

    # goal regions (reference mgr.cpp:913-944): [G, S, 7] = zobb
    # (min3, max3, rot) per sub-region, plus masks/config
    goal_sub_min: jax.Array  # [G, S, 3]
    goal_sub_max: jax.Array  # [G, S, 3]
    goal_sub_rot: jax.Array  # [G, S]
    goal_num_sub: jax.Array  # [G] i32
    goal_attacker_team: jax.Array  # [G] bool
    goal_reward_strength: jax.Array  # [G]
    num_goal_regions: int  # static

    # trajectory curriculum snapshots (built by analytics tooling;
    # reference mgr.cpp:1424-1441). Zero-size arrays when absent.
    curriculum_match_state: jax.Array  # [S, 5] i32: step, zone, controller, steps_remaining, until_point
    curriculum_players: jax.Array  # [S, 12, 9] f32: pos3, yaw, pitch, bullets, reloading, hp, flags
    num_curriculum_snapshots: int  # static

    # 5-tier navmesh spawn curriculum (buildSpawnCurriculum,
    # mgr.cpp:884-911; assets/spawn_curriculum.py)
    curr_spawn_a_tris: jax.Array  # [5, S, K] i32 (-1 pad)
    curr_spawn_b_tris: jax.Array  # [5, S, K] i32
    curr_spawn_a_yaw: jax.Array  # [5, S]
    curr_spawn_b_yaw: jax.Array  # [5, S]
    curr_spawn_counts: jax.Array  # [5] i32
    has_spawn_curriculum: bool  # static

    # sensor-ray candidate tables for the v9 transposed fan kernel
    # (ops/culling.py RayTables); None -> dense fan fallback
    ray_cells: Optional[object] = None

    # small-margin (MOVE_MARGIN) short tables for the 1-2-cast movement
    # launches (L2/L3/fall packed culled casts); None -> dense fallback
    short_mv: Optional[object] = None

    @property
    def max_dist(self):
        return jnp.linalg.norm(self.world_max - self.world_min)


_HARDCODED_GOAL_REGIONS = [
    # (sub_regions [(min, max, rot)], attacker_team, reward_strength)
    (
        [((625.0, 510.0, -64.0), (900.0, 540.0, -56.0 + consts.stand_height * 1.5), 0.0)],
        True,
        1.0,
    ),
    (
        [
            ((938.0, 440.0, -56.0), (1030.0, 539.0, -56.0 + consts.stand_height * 1.5), 0.0),
            ((545.0, 102.0, -64.0), (630.0, 134.0, -56.0 + consts.stand_height * 1.5), 0.0),
        ],
        True,
        1.0,
    ),
]


def load_map(
    scene_dir: str,
    cfg: EnvConfig,
    curriculum_snapshots: Optional[np.ndarray] = None,
    tri_pad: int = 128,
    build_culling: bool = False,
) -> MapData:
    """Load a map directory (collisions.bin, navmesh.bin, spawns.bin,
    zones.bin) into device arrays. Raycast culling tables are loaded from
    the map dir's cache when present (tools/build_culling.py builds them);
    ``build_culling=True`` builds them on the fly (slow)."""
    col = formats.load_collision_data(os.path.join(scene_dir, "collisions.bin"))
    nav = formats.load_navmesh(os.path.join(scene_dir, "navmesh.bin"))
    spawns = formats.load_spawns(os.path.join(scene_dir, "spawns.bin"))
    zones = formats.load_zones(os.path.join(scene_dir, "zones.bin"))

    tables = build_navmesh_tables(nav, cache_key=os.path.basename(os.path.normpath(scene_dir)))

    # one canonical triangle order (Morton) shared by the soup and the
    # culling tables — candidate indices must address the same array the
    # kernels' winner-reconstruction gathers from
    from ..ops.raycast_pallas import morton_sort_tris

    tri_verts = morton_sort_tris(col.tri_verts)
    soup = make_tri_soup(tri_verts, pad_to=tri_pad)

    from ..ops.culling import load_or_build_cell_tables, spawn_box_points

    # battery origins: navmesh verts + centroids + spawn-box grids (spawn
    # boxes sit at map edges the navmesh-driven sampler under-covers; every
    # episode's first sensor fans originate inside them)
    walkable = np.concatenate(
        [
            nav.verts,
            nav.verts[nav.tri_indices].mean(axis=1),
            spawn_box_points(
                (spawns.a_spawns, spawns.b_spawns, spawns.common_respawns)
            ),
        ],
        axis=0,
    ).astype(np.float32)
    cell_tables = load_or_build_cell_tables(
        tri_verts,
        cache_dir=scene_dir,
        build_if_missing=build_culling,
        walkable_points=walkable,
    )

    a_sp = spawns.a_spawns
    b_sp = spawns.b_spawns
    num_default = np.array([len(a_sp), len(b_sp)], np.int32)
    extra_a, extra_b = _mid_map_extra_spawns(cfg, col.tri_verts)
    a_sp = np.concatenate([a_sp, extra_a], axis=0)
    b_sp = np.concatenate([b_sp, extra_b], axis=0)
    num_extra = np.array([len(extra_a), len(extra_b)], np.int32)
    n_side = max(len(a_sp), len(b_sp), 1)
    side = np.zeros((2, n_side, 8), np.float32)
    side[0, : len(a_sp)] = a_sp
    side[1, : len(b_sp)] = b_sp

    nz = zones.aabb_min.shape[0]
    zmin = np.zeros((consts.max_zones, 3), np.float32)
    zmax = np.zeros((consts.max_zones, 3), np.float32)
    zrot = np.zeros((consts.max_zones,), np.float32)
    zmin[:nz] = zones.aabb_min
    zmax[:nz] = zones.aabb_max
    zrot[:nz] = zones.rotations

    weapons = cfg.effective_weapons
    mag = np.array([w.mag_size for w in weapons], np.int32)
    rel = np.array([w.reload_time for w in weapons], np.int32)
    dmg = np.array([w.dmg_per_bullet for w in weapons], np.float32)
    acc = np.array([w.accuracy_scale for w in weapons], np.float32)

    num_goals = len(_HARDCODED_GOAL_REGIONS)
    max_sub = 3
    gmin = np.zeros((num_goals, max_sub, 3), np.float32)
    gmax = np.zeros((num_goals, max_sub, 3), np.float32)
    grot = np.zeros((num_goals, max_sub), np.float32)
    gnum = np.zeros((num_goals,), np.int32)
    gatt = np.zeros((num_goals,), bool)
    gstr = np.zeros((num_goals,), np.float32)
    for gi, (subs, att, strength) in enumerate(_HARDCODED_GOAL_REGIONS):
        gnum[gi] = len(subs)
        gatt[gi] = att
        gstr[gi] = strength
        for si, (mn, mx, rot) in enumerate(subs):
            gmin[gi, si] = mn
            gmax[gi, si] = mx
            grot[gi, si] = rot

    if curriculum_snapshots is not None and len(curriculum_snapshots) > 0:
        cms = jnp.asarray(curriculum_snapshots["match_state"])
        cpl = jnp.asarray(curriculum_snapshots["players"])
        n_snap = int(cms.shape[0])
    else:
        cms = jnp.zeros((1, 5), jnp.int32)
        cpl = jnp.zeros((1, consts.max_team_size * 2, 9), jnp.float32)
        n_snap = 0

    # 5-tier navmesh spawn curriculum (built lazily only when enabled)
    if cfg.enable_spawn_curriculum:
        from .spawn_curriculum import build_spawn_curriculum

        sc = build_spawn_curriculum(
            tables,
            cache_key=os.path.basename(os.path.normpath(scene_dir)),
        )
        sc_a, sc_b = sc.a_tris, sc.b_tris
        sc_ay, sc_by = sc.a_yaw, sc.b_yaw
        sc_counts = sc.num_spawns
        has_sc = bool((sc_counts > 0).all())
    else:
        sc_a = np.full((5, 1, 1), -1, np.int32)
        sc_b = np.full((5, 1, 1), -1, np.int32)
        sc_ay = np.zeros((5, 1), np.float32)
        sc_by = np.zeros((5, 1), np.float32)
        sc_counts = np.zeros((5,), np.int32)
        has_sc = False

    from ..ops.culling import (
        load_or_build_ray_tables, load_or_build_short_tables,
    )

    short_tables = load_or_build_short_tables(tri_verts, cache_dir=scene_dir)
    from ..ops.culling import MOVE_MARGIN

    short_mv_tables = load_or_build_short_tables(
        tri_verts, cache_dir=scene_dir, margin=MOVE_MARGIN, tag="_mv"
    )
    ray_tables = load_or_build_ray_tables(
        tri_verts,
        cache_dir=scene_dir,
        build_if_missing=build_culling,
        walkable_points=walkable,
    )

    return MapData(
        tris=soup,
        world_min=jnp.asarray(col.world_bounds_min),
        world_max=jnp.asarray(col.world_bounds_max),
        cells=cell_tables,
        short=short_tables,
        short_mv=short_mv_tables,
        nav_verts=jnp.asarray(tables.verts),
        nav_tri_indices=jnp.asarray(tables.tri_indices),
        nav_centroids=jnp.asarray(tables.centroids),
        nav_adjacency=jnp.asarray(tables.adjacency),
        nav_next_hop=jnp.asarray(tables.next_hop),
        nav_area_cdf=jnp.asarray(tables.area_cdf),
        side_spawns=jnp.asarray(side),
        num_default_side_spawns=jnp.asarray(num_default),
        num_extra_side_spawns=jnp.asarray(num_extra),
        common_respawns=jnp.asarray(spawns.common_respawns),
        num_common_respawns=int(spawns.common_respawns.shape[0]),
        zone_min=jnp.asarray(zmin),
        zone_max=jnp.asarray(zmax),
        zone_rot=jnp.asarray(zrot),
        num_zones=nz,
        weapon_mag_size=jnp.asarray(mag),
        weapon_reload_time=jnp.asarray(rel),
        weapon_dmg=jnp.asarray(dmg),
        weapon_accuracy=jnp.asarray(acc),
        goal_sub_min=jnp.asarray(gmin),
        goal_sub_max=jnp.asarray(gmax),
        goal_sub_rot=jnp.asarray(grot),
        goal_num_sub=jnp.asarray(gnum),
        goal_attacker_team=jnp.asarray(gatt),
        goal_reward_strength=jnp.asarray(gstr),
        num_goal_regions=num_goals,
        curriculum_match_state=cms,
        curriculum_players=cpl,
        num_curriculum_snapshots=n_snap,
        curr_spawn_a_tris=jnp.asarray(sc_a),
        curr_spawn_b_tris=jnp.asarray(sc_b),
        curr_spawn_a_yaw=jnp.asarray(sc_ay),
        curr_spawn_b_yaw=jnp.asarray(sc_by),
        curr_spawn_counts=jnp.asarray(sc_counts),
        has_spawn_curriculum=has_sc,
        ray_cells=ray_tables,
    )


def _mid_map_extra_spawns(cfg: EnvConfig, tri_verts: np.ndarray):
    """Mid-map randomized spawn cells for SpawnInMiddle
    (reference src/mgr.cpp:1243-1300): 20x20 grid over [-280,-200]..[280,200],
    cells that overlap no collision triangle (by AABB) become spawns; left
    half -> side A extras, right half -> side B extras."""
    from ..config import SimFlags

    empty = np.zeros((0, 8), np.float32)
    if not cfg.has_flag(SimFlags.SpawnInMiddle):
        return empty, empty

    region_min = np.array([-280.0, -200.0, 0.5], np.float32)
    region_max = np.array([280.0, 200.0, 0.5], np.float32)
    cell_dim = 20
    diff = region_max - region_min
    cw, ch = diff[0] / cell_dim, diff[1] / cell_dim

    tri_min = tri_verts.min(axis=1)  # [T, 3]
    tri_max = tri_verts.max(axis=1)

    a_rows, b_rows = [], []
    for y in range(cell_dim):
        for x in range(cell_dim):
            cmin = region_min + np.array([cw * x, ch * y, 0.5], np.float32)
            cmax = cmin + np.array([cw, ch, 0.5], np.float32)
            overlaps = np.any(
                np.all(tri_min <= cmax, axis=-1) & np.all(tri_max >= cmin, axis=-1)
            )
            if not overlaps:
                row = np.concatenate(
                    [cmin, cmax, [0.0, 2.0 * np.pi]]
                ).astype(np.float32)
                (b_rows if x >= cell_dim // 2 else a_rows).append(row)

    a = np.stack(a_rows) if a_rows else empty
    b = np.stack(b_rows) if b_rows else empty
    return a, b


def default_map_dir() -> str:
    """Locate the bundled simple_map (vendored reference data)."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    candidates = [
        os.path.join(os.path.dirname(here), "data", "simple_map"),
        "/root/reference/data/simple_map",
    ]
    for c in candidates:
        if os.path.isdir(c):
            return c
    raise FileNotFoundError("simple_map data directory not found")
