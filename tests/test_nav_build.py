"""Navmesh construction from raw collision geometry (assets/nav_build.py).

The reference builds its navmesh with vendored Recast
(src/nav/nav_build.cpp buildNavmeshFromSourceObjects); these tests verify
the mini-Recast pipeline end to end on a synthetic arena: walkable floors
found, wall footprints eroded, regions partitioned, and the resulting mesh
routable by the A* tables the scripted bot uses.
"""

import numpy as np
import pytest

from madrona_mp_env_tpu.assets.nav_build import (
    NavBuildParams,
    build_navmesh,
    result_to_tris,
)


def box_tris(lo, hi):
    x0, y0, z0 = lo
    x1, y1, z1 = hi
    v = np.array(
        [
            [x0, y0, z0], [x1, y0, z0], [x1, y1, z0], [x0, y1, z0],
            [x0, y0, z1], [x1, y0, z1], [x1, y1, z1], [x0, y1, z1],
        ],
        np.float32,
    )
    faces = [
        (0, 2, 1), (0, 3, 2),  # bottom (down-facing)
        (4, 5, 6), (4, 6, 7),  # top (up-facing)
        (0, 1, 5), (0, 5, 4),
        (1, 2, 6), (1, 6, 5),
        (2, 3, 7), (2, 7, 6),
        (3, 0, 4), (3, 4, 7),
    ]
    return v[np.asarray(faces)]


@pytest.fixture(scope="module")
def arena():
    """Floor slab + central wall + border walls (collision soup only)."""
    tris = [
        box_tris((-500, -500, -20), (500, 500, 0)),
        box_tris((-60, -200, 0), (60, 200, 150)),
        box_tris((-500, -520, 0), (500, -500, 150)),
        box_tris((-500, 500, 0), (500, 520, 150)),
        box_tris((-520, -500, 0), (-500, 500, 150)),
        box_tris((500, -500, 0), (520, 500, 150)),
    ]
    return np.concatenate(tris, axis=0)


@pytest.fixture(scope="module")
def built(arena):
    seeds = np.array([[-300.0, 0.0, 5.0], [300.0, 0.0, 5.0]], np.float32)
    res = build_navmesh(
        arena, NavBuildParams(cell_size=25.0), keep_seeds=seeds
    )
    return res


def test_builder_produces_polys(built):
    assert len(built.polys) > 0
    assert built.num_regions >= 1
    for poly in built.polys:
        assert 3 <= len(poly) <= 6  # navMaxVertsPerPoly (nav/consts.hpp:7)


def test_ground_level_and_wall_erosion(built):
    verts, tris = result_to_tris(built)
    cent = verts[tris].mean(axis=1)
    ground = cent[:, 2] < 100
    assert ground.any()
    # the eroded navmesh never enters the wall footprint
    inside_wall = (
        ground & (np.abs(cent[:, 0]) < 50) & (np.abs(cent[:, 1]) < 190)
    )
    assert inside_wall.sum() == 0
    # with seed pruning, sealed-interior and wall-top islands are gone
    assert np.all(verts[:, 2] < 100)


def test_mesh_covers_both_sides(built):
    verts, tris = result_to_tris(built)
    cent = verts[tris].mean(axis=1)
    ground = cent[:, 2] < 100
    assert (ground & (cent[:, 0] > 100)).any()
    assert (ground & (cent[:, 0] < -100)).any()


def test_bot_pathfinds_around_wall(built):
    """A* next-hop tables built from the generated mesh route west -> east
    around the central wall (the scripted bot's navigation path,
    sim/bot.py)."""
    from madrona_mp_env_tpu.assets.formats import NavmeshData
    from madrona_mp_env_tpu.assets.navmesh import build_navmesh_tables

    verts, tris = result_to_tris(built)
    tbl = build_navmesh_tables(
        NavmeshData(verts=verts.astype(np.float32),
                    tri_indices=tris.astype(np.uint32))
    )
    west = int(np.argmin(
        np.linalg.norm(tbl.centroids[:, :2] - np.array([-300, 0]), axis=1)
    ))
    east = int(np.argmin(
        np.linalg.norm(tbl.centroids[:, :2] - np.array([300, 0]), axis=1)
    ))
    cur, hops = west, 0
    path = [cur]
    while cur != east and hops < 1000:
        nxt = int(tbl.next_hop[cur, east])
        assert nxt >= 0, "no route on generated navmesh"
        cur = nxt
        hops += 1
        path.append(cur)
    assert cur == east
    # the route leaves the wall's y-span or detours: every hop centroid is
    # outside the wall footprint
    for t in path:
        c = tbl.centroids[t]
        assert not (abs(c[0]) < 50 and abs(c[1]) < 190)


def test_bot_drives_built_navmesh_to_zone(tmp_path):
    """Full-loop VERDICT criterion: convert a collision-only map (no
    pre-authored walkable mesh), then scripted A* bots pathfind across the
    generated navmesh into the zone (reference e2e role:
    src/sim.cpp planAStarAISystem on a Recast-built mesh)."""
    import json

    import jax
    import jax.numpy as jnp

    import madrona_mp_env_tpu as mp
    from madrona_mp_env_tpu.tools.convert_assets import convert

    s = 400.0
    obj = tmp_path / "col.obj"
    lines = [
        f"v {-s} {-s} -20", f"v {s} {-s} -20",
        f"v {s} {s} -20", f"v {-s} {s} -20",
        f"v {-s} {-s} 0", f"v {s} {-s} 0", f"v {s} {s} 0", f"v {-s} {s} 0",
        "f 1 4 3 2", "f 5 6 7 8",
        # central wall box between the west spawns and the east zone
        "v -40 -150 0", "v 40 -150 0", "v 40 150 0", "v -40 150 0",
        "v -40 -150 120", "v 40 -150 120", "v 40 150 120", "v -40 150 120",
        "f 9 10 14 13", "f 10 11 15 14", "f 11 12 16 15", "f 12 9 13 16",
        "f 13 14 15 16",
    ]
    obj.write_text("\n".join(lines))
    scene = {
        "a_spawns": [
            {"min": [-350, -100, 0], "max": [-250, 100, 0], "yaw": [0, 0]}
        ],
        "b_spawns": [
            {"min": [250, -100, 0], "max": [350, 100, 0],
             "yaw": [3.14, 3.14]}
        ],
        "respawns": [
            {"min": [-350, -350, 0], "max": [350, 350, 0], "yaw": [0, 6.28]}
        ],
        "zones": [
            {"min": [150, -80, 0], "max": [330, 80, 150], "rotation": 0.0}
        ],
    }
    scene_json = tmp_path / "scene.json"
    scene_json.write_text(json.dumps(scene))
    out = tmp_path / "map"
    convert(str(obj), None, str(scene_json), str(out))

    cfg = mp.EnvConfig(task=mp.Task.Zone, team_size=2, episode_len=200)
    env = mp.Env(cfg, str(out), num_worlds=1, seed=3)
    state, _ = env.reset()
    state = state.replace(policy_idx=jnp.full((1, 4), -1, jnp.int32))
    step = env.step_fn()
    sc = env.default_sim_ctrl()
    nr = jnp.zeros((1,), jnp.int32)

    @jax.jit
    def run(state):
        def body(s, _):
            s, _ = step(s, env.zero_actions(), sc, nr)
            return s, s.pos[:, :2, :2]  # team-0 agents only
        return jax.lax.scan(body, state, None, length=120)

    _, pos_hist = run(state)
    pos_hist = np.asarray(pos_hist)[:, 0]  # [T, 2, 2]
    in_zone = (
        (pos_hist[..., 0] > 150) & (pos_hist[..., 0] < 330)
        & (pos_hist[..., 1] > -80) & (pos_hist[..., 1] < 80)
    )
    # a west bot must cross the wall into the zone within 120 steps
    assert in_zone.any(), (
        "no team-0 bot reached the zone on the built navmesh; "
        f"final x positions {pos_hist[-1, :, 0]}"
    )


def test_empty_and_degenerate_inputs():
    res = build_navmesh(np.zeros((0, 3, 3), np.float32))
    assert len(res.polys) == 0
    # a single vertical quad has no walkable surface
    wall = box_tris((0, 0, 0), (10, 300, 300))[4:]
    res = build_navmesh(wall, NavBuildParams(cell_size=25.0))
    verts, tris = result_to_tris(res)
    assert len(tris) == 0 or np.all(verts[:, 2] >= 290)
