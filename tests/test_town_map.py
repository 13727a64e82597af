"""End-to-end pipeline test for the procedural big-map generator
(tools/make_town_map.py): geometry -> collision bin -> navmesh built from
collision (assets/nav_build.py) -> spawns/zones -> playable Env.

This is the new-map onboarding path the reference covers with
convert_assets + Recast (src/convert_assets.cpp, src/nav/nav_build.cpp);
the big 6-block town variant is the culling benchmark scene
(bench.py --scene data/town_map)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def town_dir(tmp_path_factory):
    from madrona_mp_env_tpu.tools.make_town_map import main

    out = str(tmp_path_factory.mktemp("town"))
    # tiny 2x2-block town, coarse voxels: seconds, not minutes
    main(["--out", out, "--blocks", "2", "--seed", "3",
          "--cell-size", "20.0"])
    return out


def test_map_loads_and_routes(town_dir):
    import madrona_mp_env_tpu as mp
    from madrona_mp_env_tpu.assets.map_data import load_map

    cfg = mp.EnvConfig(task=mp.Task.Zone, team_size=2)
    m = load_map(town_dir, cfg)
    assert m.nav_centroids.shape[0] > 20
    # every navmesh tri reaches every other (seed-pruned single component):
    # next-hop table has no unreachable sentinel rows off-diagonal
    nh = np.asarray(m.nav_next_hop)
    n = nh.shape[0]
    off_diag = ~np.eye(n, dtype=bool)
    assert (nh[off_diag] >= 0).all(), "navmesh has unreachable tri pairs"


def test_env_steps_on_town(town_dir):
    import jax
    import jax.numpy as jnp

    import madrona_mp_env_tpu as mp

    cfg = mp.EnvConfig(
        task=mp.Task.Zone, team_size=2,
        sim_flags=mp.SimFlags.StaggerStarts,
    )
    env = mp.Env(cfg, town_dir, num_worlds=2, seed=11)
    state, obs = env.reset()
    acts = env.zero_actions()
    for _ in range(5):
        state, out = env.step(state, acts)
    assert bool(jnp.isfinite(state.pos).all())
    assert bool(jnp.isfinite(out["reward"]).all())
    # agents stand on the floor, not inside it / falling forever
    alive_z = np.asarray(state.pos[..., 2])[np.asarray(state.alive) > 0]
    assert (alive_z > -50.0).all() and (alive_z < 400.0).all()


@pytest.fixture(scope="module")
def town_cached_dir():
    """The committed data/town_map scene (with its culling cache)."""
    import os
    d = os.path.join(os.path.dirname(__file__), "..", "data", "town_map")
    d = os.path.abspath(d)
    if not os.path.exists(os.path.join(d, "culling.npz")):
        pytest.skip("town culling cache not built")
    return d


def test_town_big_map_path_selected(town_cached_dir):
    """The committed culling cache makes load_map attach cell tables, and
    the fan dispatch gate (ops/raycast.py fan_cull_wins: T >= 4K) selects
    the cell-culled kernel on the big map while simple_map stays dense —
    the TPU stand-in for the reference's size-independent MeshBVH
    (src/mesh_bvh.inl traceRay)."""
    import madrona_mp_env_tpu as mp
    from madrona_mp_env_tpu.assets.map_data import load_map

    cfg = mp.EnvConfig(task=mp.Task.Zone, team_size=6)
    m = load_map(town_cached_dir, cfg)
    assert m.cells is not None, "town culling cache missing"
    T = m.tris.packed.shape[1]
    assert T >= 4 * m.cells.K, (T, m.cells.K)

    m_small = load_map("data/simple_map", cfg)
    if m_small.cells is not None:
        assert m_small.tris.packed.shape[1] < 4 * m_small.cells.K


@pytest.mark.slow
def test_town_culled_fan_parity(town_cached_dir, monkeypatch):
    """Cell-culled fan vs dense sweep on the real town geometry."""
    monkeypatch.setenv("MPENV_PALLAS", "interpret")
    import jax.numpy as jnp

    import madrona_mp_env_tpu as mp
    from madrona_mp_env_tpu.assets.map_data import load_map
    from madrona_mp_env_tpu.ops import culling
    from madrona_mp_env_tpu.ops import raycast as rc
    from madrona_mp_env_tpu.ops.raycast_cull import ray_fans_cull

    cfg = mp.EnvConfig(task=mp.Task.Zone, team_size=6)
    m = load_map(town_cached_dir, cfg)
    tables, soup = m.cells, m.tris

    rng = np.random.default_rng(5)
    cents = np.asarray(m.nav_centroids)
    N, F = 16, 24
    base = cents[rng.integers(0, len(cents), N)].astype(np.float32)
    zoffs = rng.uniform(10, 60, (N, F)).astype(np.float32)
    d = rng.normal(size=(N, F, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    base, zoffs, d = jnp.asarray(base), jnp.asarray(zoffs), jnp.asarray(d)

    cells = culling.cell_index(tables, base)
    t_k = np.asarray(ray_fans_cull(base, zoffs, d, cells, tables))
    o = base[:, None, :] + jnp.stack(
        [jnp.zeros_like(zoffs), jnp.zeros_like(zoffs), zoffs], axis=-1
    )
    t_d = np.asarray(rc._ray_vs_tris_dense(o, d, soup))
    both = np.isfinite(t_k) & np.isfinite(t_d)
    assert (np.isfinite(t_k) == np.isfinite(t_d)).mean() >= 0.995
    rel = np.abs(t_k[both] - t_d[both]) / np.maximum(t_d[both], 1.0)
    assert rel.max() <= 1e-4
