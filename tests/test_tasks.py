"""Per-task smoke coverage: every Task variant steps under jit with finite
outputs and sane match-state transitions."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import madrona_mp_env_tpu as mp


@pytest.mark.parametrize(
    "task,flags,team_size",
    [
        (mp.Task.Zone, mp.SimFlags.Default, 2),
        (mp.Task.TDM, mp.SimFlags.Default, 2),
        (mp.Task.ZoneCaptureDefend, mp.SimFlags.HardcodedSpawns, 2),
        (mp.Task.Explore, mp.SimFlags.NavmeshSpawn, 1),
    ],
)
def test_task_smoke(simple_map_dir, task, flags, team_size):
    cfg = mp.EnvConfig(
        task=task, sim_flags=flags, team_size=team_size, episode_len=24
    )
    env = mp.Env(cfg, simple_map_dir, num_worlds=2, seed=3)
    state, obs = env.reset()
    acts = env.zero_actions()
    acts = acts.replace(move_amount=jnp.ones_like(acts.move_amount))
    for _ in range(4):
        state, out = env.step(state, acts)
    for k, v in out["obs"].items():
        assert np.all(np.isfinite(np.asarray(v))), f"{task}: obs {k}"
    assert np.all(np.isfinite(np.asarray(out["reward"]))), task
    assert np.all(np.asarray(state.cur_step) >= 4) or np.any(
        np.asarray(out["episode_result"]["match_finished"])
    )


def test_zcd_win_conditions(simple_map_dir):
    """ZoneCaptureDefend: attacker wins at 1 objective point; defender wins
    when attackers all die with no respawn (zones.py ZCD branch,
    reference sim.cpp:4637-4660)."""
    cfg = mp.EnvConfig(
        task=mp.Task.ZoneCaptureDefend,
        sim_flags=mp.SimFlags.HardcodedSpawns | mp.SimFlags.NoRespawn,
        team_size=2,
        episode_len=64,
    )
    env = mp.Env(cfg, simple_map_dir, num_worlds=1, seed=5)
    state, _ = env.reset()
    # ZCD pins the active zone to index 3 (jax_train.py flag path)
    assert int(state.zone_cur[0]) == 3
