"""Sub-zones + high-level-move battle mode tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import madrona_mp_env_tpu as mp
from madrona_mp_env_tpu.sim.subzones import (
    NUM_SUBZONES,
    subzone_boxes,
    subzone_system,
)


def test_subzone_boxes(simple_map_dir):
    cfg = mp.EnvConfig(task=mp.Task.Zone, team_size=2)
    env = mp.Env(cfg, simple_map_dir, num_worlds=1, seed=1)
    mins, maxs, rots = subzone_boxes(env.map_data)
    assert mins.shape == (NUM_SUBZONES, 3)
    # sub-zones 0-1 mirror map zones 1-2
    np.testing.assert_allclose(
        np.asarray(mins[0]), np.asarray(env.map_data.zone_min[1])
    )
    np.testing.assert_allclose(
        np.asarray(maxs[1]), np.asarray(env.map_data.zone_max[2])
    )


def test_subzone_env_step(simple_map_dir):
    cfg = mp.EnvConfig(
        task=mp.Task.Zone,
        team_size=2,
        sim_flags=mp.SimFlags.SubZones,
        episode_len=32,
    )
    env = mp.Env(cfg, simple_map_dir, num_worlds=2, seed=5)
    state, obs = env.reset()
    # agents assigned to subzone by policy idx; give them distinct ones
    state = state.replace(
        policy_idx=jnp.broadcast_to(jnp.arange(4, dtype=jnp.int32), (2, 4))
    )
    for _ in range(4):
        state, out = env.step(state, env.zero_actions())
    assert np.all(np.isfinite(np.asarray(out["reward"])))
    assert state.subzone_ctrl.shape == (2, 8)
    assert np.all(np.isin(np.asarray(state.subzone_ctrl), [-1, 0, 1]))


def test_subzone_state_machine(simple_map_dir):
    cfg = mp.EnvConfig(task=mp.Task.Zone, team_size=2, sim_flags=mp.SimFlags.SubZones)
    env = mp.Env(cfg, simple_map_dir, num_worlds=1, seed=2)
    state, _ = env.reset()
    m = env.map_data
    mins, maxs, _ = subzone_boxes(m)
    center0 = np.asarray(0.5 * (mins[0] + maxs[0]))

    s0 = jax.tree_util.tree_map(lambda x: x[0], state)
    # put agent 0 (team A) inside subzone 0, everyone else far away
    pos = np.asarray(s0.pos).copy()
    pos[0] = center0
    pos[1] = [10000.0, 10000.0, 0.0]
    pos[2] = [10000.0, 10000.0, 0.0]
    pos[3] = [10000.0, 10000.0, 0.0]
    s0 = s0.replace(
        pos=jnp.asarray(pos),
        policy_idx=jnp.zeros((4,), jnp.int32),
        alive=jnp.ones((4,)),
    )
    s0 = subzone_system(cfg, m, s0)
    assert bool(s0.in_subzone[0])
    assert int(s0.subzone_ctrl[0]) == 0
    assert not bool(s0.subzone_contested[0])

    # opponent enters too -> contested
    pos[2] = center0 + np.array([1.0, 0.0, 0.0])
    s1 = s0.replace(pos=jnp.asarray(pos))
    s1 = subzone_system(cfg, m, s1)
    assert bool(s1.subzone_contested[0])
    assert int(s1.subzone_ctrl[0]) == -1


def test_hl_battle_mode(simple_map_dir):
    cfg = mp.EnvConfig(
        task=mp.Task.TDM,
        team_size=2,
        highlevel_move=True,
        sim_flags=mp.SimFlags.NoRespawn,
        episode_len=64,
    )
    env = mp.Env(cfg, simple_map_dir, num_worlds=2, seed=9)
    state, obs = env.reset()

    # face agent 0 directly at opponent 2 at point-blank, no invincibility
    s = state
    pos = np.asarray(s.pos).copy()
    pos[:, 2] = pos[:, 0] + np.array([0.0, 60.0, 0.0])
    to = pos[:, 2] - pos[:, 0]
    yaw0 = -np.arctan2(to[:, 0], to[:, 1])
    yaw = np.asarray(s.yaw).copy()
    yaw[:, 0] = yaw0
    s = s.replace(
        pos=jnp.asarray(pos),
        yaw=jnp.asarray(yaw),
        pitch=s.pitch.at[:, 0].set(0.0),
        respawn_steps=jnp.zeros_like(s.respawn_steps),
    )
    s, out = env.step(s, env.zero_actions())
    # auto-battle: victim 2 took lethal damage from agent 0
    assert np.all(np.asarray(out["events"]["kill_event"])[:, 0]), (
        "hl battle should auto-kill the faced opponent"
    )
    assert np.all(np.asarray(s.alive)[:, 2] == 0.0)
