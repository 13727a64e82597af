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
