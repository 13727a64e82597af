"""FullTeamInterface observations + full-team policy network tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import madrona_mp_env_tpu as mp
from madrona_mp_env_tpu.train.full_team_policy import (
    FULL_TEAM_OBS_KEYS,
    FullTeamActorCriticNet,
    build_minimap,
    init_team_rnn_states,
)


@pytest.fixture(scope="module")
def ft_env(simple_map_dir):
    cfg = mp.EnvConfig(
        task=mp.Task.Zone,
        team_size=2,
        sim_flags=mp.SimFlags.FullTeamPolicy,
        episode_len=40,
    )
    env = mp.Env(cfg, simple_map_dir, num_worlds=2, seed=4)
    state, obs = env.reset()
    return cfg, env, state, obs


def test_full_team_obs_shapes(ft_env):
    cfg, env, state, obs = ft_env
    ts = cfg.team_size
    common = 14 + ts
    assert obs["full_team_global"].shape == (2, 2, 16)
    assert obs["full_team_players"].shape == (2, 2, ts, common + 4)
    assert obs["full_team_enemies"].shape == (2, 2, ts, common + 3 + ts)
    assert obs["full_team_last_known_enemies"].shape == (2, 2, ts, common)
    assert obs["full_team_fwd_lidar"].shape == (2, 2, ts, 2, 32, 4)
    assert obs["full_team_rear_lidar"].shape == (2, 2, ts, 2, 8, 4)
    assert obs["full_team_reward"].shape == (2, 2)
    assert obs["full_team_done"].shape == (2, 2)

    # normalized positions of live players are in [0, 1]
    pos_off = 2 + ts
    players = np.asarray(obs["full_team_players"])
    alive = players[..., 1 + ts] > 0.0
    pos = players[..., pos_off : pos_off + 3]
    assert np.all(pos[alive] >= 0.0) and np.all(pos[alive] <= 1.0)

    # global obs: team id one-hots mirror each other
    g = np.asarray(obs["full_team_global"])
    assert np.array_equal(g[:, 0, :2], np.tile([0.0, 1.0], (2, 1)))
    assert np.array_equal(g[:, 1, :2], np.tile([1.0, 0.0], (2, 1)))


def test_full_team_obs_step_and_reward(ft_env):
    cfg, env, state, obs = ft_env
    acts = env.zero_actions()
    state, out = env.step(state, acts)
    ts = cfg.team_size
    # team reward equals the sum of member rewards
    per_agent = np.asarray(out["reward"]).reshape(2, 2, ts)
    team = np.asarray(out["obs"]["full_team_reward"])
    np.testing.assert_allclose(team, per_agent.sum(-1), rtol=1e-5)


def test_build_minimap_mean_semantics():
    B, N, C = 1, 3, 4
    glob = jnp.zeros((B, C))
    feats = jnp.ones((B, N, C)) * jnp.array([[[1.0], [3.0], [10.0]]])
    # two entities land in cell (0,0); third is masked out
    pos = jnp.array([[[0.0, 0.0, 0.5], [0.01, 0.01, 0.5], [0.5, 0.5, 0.5]]])
    valid = jnp.array([[1.0, 1.0, 0.0]])
    mm = build_minimap(glob, feats, pos, valid)
    # mean over background(0) + two entities: (0 + 1 + 3) / 3
    np.testing.assert_allclose(np.asarray(mm[0, 0, 0]), 4.0 / 3.0, rtol=1e-6)
    # masked entity leaves its cell at the background value
    np.testing.assert_allclose(np.asarray(mm[0, 8, 8]), 0.0, atol=1e-6)


def test_full_team_policy_forward_and_sequence(ft_env):
    cfg, env, state, obs = ft_env
    model = FullTeamActorCriticNet(dtype=jnp.float32)

    # teams from both worlds as the batch: [W*2(teams), ...]
    team_obs = {
        k: jnp.asarray(obs[k]).reshape((-1,) + obs[k].shape[2:])
        for k in FULL_TEAM_OBS_KEYS
    }
    B = team_obs["full_team_global"].shape[0]
    rnn = init_team_rnn_states((B,))
    params = model.init(jax.random.PRNGKey(0), rnn, team_obs, False)["params"]

    dists, value, rnn2 = model.apply({"params": params}, rnn, team_obs, False)
    actions, log_probs = dists.sample(jax.random.PRNGKey(1))
    ts = cfg.team_size
    assert actions["discrete"].shape == (B, ts, 4)
    assert actions["aim"].shape == (B, ts, 2)
    assert value.shape == (B,)
    assert rnn2.shape == rnn.shape
    assert np.all(np.isfinite(np.asarray(value)))

    # BPTT sequence path
    T = 3
    obs_seq = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (T,) + x.shape), team_obs
    )
    dones = jnp.zeros((T, B), jnp.int32)
    act_seq = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (T,) + x.shape), actions
    )
    lp, ent, values = model.apply(
        {"params": params},
        rnn,
        dones,
        obs_seq,
        act_seq,
        method=FullTeamActorCriticNet.sequence,
    )
    assert values.shape == (T, B)
    assert lp["discrete"].shape == (T, B, ts)
    assert np.all(np.isfinite(np.asarray(lp["discrete"])))
    assert np.all(np.isfinite(np.asarray(ent["aim"])))
