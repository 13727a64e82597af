"""Turret task tests (turretFireSystem / turretMatchInfoSystem /
turretRewardSystem equivalents)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import madrona_mp_env_tpu as mp
from madrona_mp_env_tpu.sim.turret import turret_mask


@pytest.fixture(scope="module")
def turret_env(simple_map_dir):
    cfg = mp.EnvConfig(
        task=mp.Task.Turret,
        team_size=2,
        sim_flags=mp.SimFlags.NoRespawn,
        episode_len=64,
    )
    env = mp.Env(cfg, simple_map_dir, num_worlds=2, seed=13)
    state, obs = env.reset()
    return cfg, env, state, obs


def test_turret_setup(turret_env):
    cfg, env, state, obs = turret_env
    assert cfg.num_agents == 4  # 2 agents + 2 turrets
    assert cfg.num_weapon_types == 2

    mask = np.asarray(turret_mask(cfg))
    assert list(mask) == [False, False, True, True]

    # turret rows carry the turret weapon; agents the default
    wt = np.asarray(state.weapon_type)
    # the turret weapon is appended after the user weapon table
    assert np.all(wt[:, 2:] == len(cfg.weapons))
    assert np.all(wt[:, :2] == 0)
    assert np.all(np.asarray(state.alive) == 1.0)


def test_turrets_hold_position_and_fight(turret_env):
    cfg, env, state, obs = turret_env
    t_pos0 = np.asarray(state.pos)[:, 2:, :2].copy()

    acts = env.zero_actions()
    acts = acts.replace(move_amount=jnp.ones_like(acts.move_amount))
    fired_any = False
    for _ in range(30):
        state, out = env.step(state, acts)
        fired = np.asarray(state.fired_shot_t)[:, 2:] >= 0
        fired_any = fired_any or bool(fired.any())

    # turrets never move in XY
    t_pos1 = np.asarray(state.pos)[:, 2:, :2]
    alive_t = np.asarray(state.alive)[:, 2:] > 0
    np.testing.assert_allclose(t_pos1[alive_t], t_pos0[alive_t], atol=1e-3)

    # turret rewards are zeroed; agent rewards finite
    r = np.asarray(out["reward"])
    assert np.all(r[:, 2:] == 0.0)
    assert np.all(np.isfinite(r[:, :2]))


def test_turret_match_ends_when_side_dies(turret_env):
    cfg, env, state, obs = turret_env
    # kill all turrets: match should finish with win_result 0 (agents win)
    state = state.replace(
        hp=state.hp.at[:, 2:].set(0.0),
        alive=state.alive.at[:, 2:].set(0.0),
    )
    state, out = env.step(state, env.zero_actions())
    assert bool(np.all(np.asarray(out["episode_result"]["match_finished"])))
    assert np.all(np.asarray(out["episode_result"]["win_result"]) == 0)
