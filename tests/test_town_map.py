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
    """The production planar culled fan (the kernel the T >= 4K auto-gate
    selects on big maps, ops/raycast_pallas.py ray_fans_culled_planar) vs
    the dense sweep on the real town geometry, driven through the public
    ray_fans_vs_tris dispatcher exactly like sim/observations.py does."""
    monkeypatch.setenv("MPENV_PALLAS", "interpret")
    monkeypatch.setenv("MPENV_FAN_CULL", "1")
    import jax.numpy as jnp

    import madrona_mp_env_tpu as mp
    from madrona_mp_env_tpu.assets.map_data import load_map
    from madrona_mp_env_tpu.ops import culling
    from madrona_mp_env_tpu.ops import raycast as rc

    cfg = mp.EnvConfig(task=mp.Task.Zone, team_size=6)
    m = load_map(town_cached_dir, cfg)
    tables, soup = m.cells, m.tris

    rng = np.random.default_rng(5)
    cents = np.asarray(m.nav_centroids)
    N = 16
    zgroups = (8, 8, 8)
    F = sum(zgroups)
    base = cents[rng.integers(0, len(cents), N)].astype(np.float32)
    # one z offset per group (dispatcher contract: uniform within a run)
    zg = rng.uniform(10, 60, (N, len(zgroups))).astype(np.float32)
    d = rng.normal(size=(N, F, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    dx, dy, dz = (jnp.asarray(d[..., i]) for i in range(3))
    base, zg = jnp.asarray(base), jnp.asarray(zg)

    t_k = np.asarray(rc.ray_fans_vs_tris(
        base, zg, (dx, dy, dz), soup,
        cells=culling.cell_index(tables, base), tables=tables,
        zgroups=zgroups,
    ))
    zoffs = np.repeat(np.asarray(zg), 8, axis=-1)
    o = jnp.asarray(base)[:, None, :] + jnp.stack(
        [jnp.zeros_like(jnp.asarray(zoffs)), jnp.zeros_like(jnp.asarray(zoffs)),
         jnp.asarray(zoffs)], axis=-1,
    )
    t_d = np.asarray(rc._ray_vs_tris_dense(o, jnp.asarray(d), soup))
    both = np.isfinite(t_k) & np.isfinite(t_d)
    assert (np.isfinite(t_k) == np.isfinite(t_d)).mean() >= 0.995
    rel = np.abs(t_k[both] - t_d[both]) / np.maximum(t_d[both], 1.0)
    assert rel.max() <= 2e-2  # bf16 MXU direction dots in the fan kernel
