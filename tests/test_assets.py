import numpy as np

from madrona_mp_env_tpu.assets import formats
from madrona_mp_env_tpu.assets.navmesh import build_navmesh_tables
import os


def test_collision_loader(simple_map_dir):
    col = formats.load_collision_data(
        os.path.join(simple_map_dir, "collisions.bin")
    )
    assert col.tri_verts.shape == (252, 3, 3)
    assert np.all(col.world_bounds_min < col.world_bounds_max)
    # triangles inside world bounds
    assert np.all(col.tri_verts.reshape(-1, 3) >= col.world_bounds_min - 1)
    assert np.all(col.tri_verts.reshape(-1, 3) <= col.world_bounds_max + 1)


def test_navmesh_loader_and_tables(simple_map_dir):
    nav = formats.load_navmesh(os.path.join(simple_map_dir, "navmesh.bin"))
    assert nav.tri_indices.shape == (155, 3)
    tables = build_navmesh_tables(nav)
    T = 155
    assert tables.next_hop.shape == (T, T)
    # next hop of (i, i) is i
    assert np.all(np.diag(tables.next_hop) == np.arange(T))
    # next hops are adjacent to the start tri (or the start itself)
    for s in range(0, T, 17):
        for g in range(0, T, 13):
            nh = tables.next_hop[s, g]
            if s == g or nh == -1:
                continue
            assert nh in tables.adjacency[s], (s, g, nh)
    # area cdf monotone, ends at 1
    assert np.all(np.diff(tables.area_cdf) >= -1e-6)
    assert abs(tables.area_cdf[-1] - 1.0) < 1e-5


def test_spawns_zones(simple_map_dir):
    sp = formats.load_spawns(os.path.join(simple_map_dir, "spawns.bin"))
    assert sp.a_spawns.shape == (8, 8)
    assert sp.b_spawns.shape == (8, 8)
    assert sp.common_respawns.shape == (16, 8)
    z = formats.load_zones(os.path.join(simple_map_dir, "zones.bin"))
    assert z.aabb_min.shape == (3, 3)
    assert np.all(z.aabb_min <= z.aabb_max)
