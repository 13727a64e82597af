"""5-tier navmesh spawn curriculum tests (buildSpawnCurriculum /
curriculumSpawnPoint equivalents)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import madrona_mp_env_tpu as mp
from madrona_mp_env_tpu.assets.navmesh import build_navmesh_tables
from madrona_mp_env_tpu.assets import formats
from madrona_mp_env_tpu.assets.spawn_curriculum import (
    MIN_REGION_AREA,
    TIER_SEPARATIONS,
    build_spawn_curriculum,
)


@pytest.fixture(scope="module")
def tables(simple_map_dir):
    import os

    nav = formats.load_navmesh(os.path.join(simple_map_dir, "navmesh.bin"))
    return build_navmesh_tables(nav, cache_key="simple_map")


def test_build_tiers(tables):
    sc = build_spawn_curriculum(tables)
    assert sc.a_tris.shape[0] == 5
    # small maps can't fit the largest separations, but early tiers must
    assert int(sc.num_spawns[0]) > 0, "tier 0 (10 radii) must have spawns"

    cents = tables.centroids
    for tier in range(5):
        n = int(sc.num_spawns[tier])
        for s in range(min(n, 16)):
            a = sc.a_tris[tier, s]
            b = sc.b_tris[tier, s]
            a = a[a >= 0]
            b = b[b >= 0]
            assert len(a) > 0 and len(b) > 0
            # straight-line separation can undershoot the PATH separation
            # but never exceed the acceptance upper bound
            d = np.linalg.norm(cents[a[0]] - cents[b[0]])
            sep = TIER_SEPARATIONS[tier]
            assert d <= (sep + 2 * 135.0) * 1.25 + 1e-3
            # facing yaws are opposed
            assert np.isclose(
                abs(sc.a_yaw[tier, s] - sc.b_yaw[tier, s]), np.pi, atol=1e-5
            )


def test_env_with_spawn_curriculum(simple_map_dir):
    cfg = mp.EnvConfig(
        task=mp.Task.Zone,
        team_size=2,
        enable_spawn_curriculum=True,
        use_curriculum_spawn_prob=1.0,
        curriculum_tier_probs=(1.0, 0.0, 0.0, 0.0, 0.0),
        episode_len=32,
    )
    env = mp.Env(cfg, simple_map_dir, num_worlds=4, seed=21)
    assert env.map_data.has_spawn_curriculum
    state, obs = env.reset()
    assert bool(np.all(np.asarray(state.curr_spawn_active)))

    # tier 0: teams spawn ~10 agent radii apart (within the acceptance band
    # + region radii) — far closer than the standard A/B side spawns
    pos = np.asarray(state.pos)
    team_a_center = pos[:, :2, :2].mean(axis=1)
    team_b_center = pos[:, 2:, :2].mean(axis=1)
    d = np.linalg.norm(team_a_center - team_b_center, axis=-1)
    assert np.all(d < 600.0), f"curriculum tier 0 spawn separation: {d}"

    # env steps fine from curriculum spawns
    state, out = env.step(state, env.zero_actions())
    assert np.all(np.isfinite(np.asarray(out["reward"])))
