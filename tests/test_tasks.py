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


def test_flank_reward_los_semantics(simple_map_dir):
    """Hand-built flank scenario matching flankRewardSystem semantics
    (reference src/sim.cpp:4211-4290): +0.001 per teammate that is >=100
    away or not visible, +0.001 per opponent that cannot see the agent,
    behind-shot bonus from yaw difference."""
    from madrona_mp_env_tpu.sim.rewards import reward_system

    cfg = mp.EnvConfig(
        task=mp.Task.Zone,
        team_size=2,
        reward_mode=mp.RewardMode.Flank,
        episode_len=64,
    )
    env = mp.Env(cfg, simple_map_dir, num_worlds=1, seed=0)
    state_b, _ = env.reset()
    s = jax.tree_util.tree_map(lambda x: x[0], state_b)

    pos = jnp.array(
        [[0.0, 0.0, 0.0], [50.0, 0.0, 0.0], [500.0, 0.0, 0.0],
         [600.0, 0.0, 0.0]]
    )
    # own-team slot visibility: 0<->1 see each other; 2/3 do not
    team_vis = jnp.array(
        [[False, True], [True, False], [False, False], [False, False]]
    )
    # opponent visibility rows: agent a sees opponent slot j
    can_see = jnp.array(
        [[True, False], [False, False], [True, False], [False, False]]
    )
    s = s.replace(
        pos=pos,
        alive=jnp.ones((4,), jnp.float32),
        prev_teammate_vis=team_vis,
        prev_can_see=can_see,
        yaw=jnp.array([0.0, 0.0, 3.5, 0.0]),
        landed_shot_on=jnp.array([2, -1, -1, -1], jnp.int32),
        successful_kill=jnp.zeros((4,), bool),
        new_cells=jnp.zeros((4,), jnp.int32),
        crumb_total_penalty=jnp.zeros((4,), jnp.float32),
        reward_coefs=jnp.zeros_like(s.reward_coefs),  # team spirit 0
    )
    out = reward_system(cfg, env.map_data, s)
    r = np.asarray(out.reward)
    # agent0: teammate1 visible at 50 (no term), opp3 can't see it
    # (+0.001), behind-shot on agent2 (|3.5-0| > pi, no kill: +0.2)
    # agent1: both opponents can't see it (+0.002)
    # agent2: teammate3 at exactly 100 (>=100: +0.001), agent1 can't see
    # it (+0.001)
    # agent3: teammate2 at 100 (+0.001), neither opponent sees it (+0.002)
    np.testing.assert_allclose(
        r, [0.201, 0.002, 0.002, 0.003], rtol=0, atol=1e-6
    )


def test_flank_reward_uses_same_step_los(simple_map_dir):
    """The flank reward must consume THIS step's visibility (the reference
    raycasts inside flankRewardSystem, src/sim.cpp:4228-4267), not the
    previous step's fan. Stale prev_* tables are poisoned with the opposite
    booleans: if the wiring regressed to stale reads, agent 0's reward
    would be 0.003 instead of 0."""
    cfg = mp.EnvConfig(
        task=mp.Task.Zone,
        team_size=2,
        reward_mode=mp.RewardMode.Flank,
        episode_len=64,
    )
    env = mp.Env(cfg, simple_map_dir, num_worlds=1, seed=0)
    state, _ = env.reset()

    # open-space scenario: teammates 0,1 are 30 apart facing each other
    # (mutually visible, < 100 -> no teammate term); opponents 2,3 are 100
    # north facing south (both see both -> no opponent term)
    pos = jnp.array(
        [[[0.0, 0.0, 0.0], [30.0, 0.0, 0.0],
          [0.0, 100.0, 0.0], [30.0, 100.0, 0.0]]]
    )
    yaw = jnp.array([[-jnp.pi / 2, jnp.pi / 2, jnp.pi, jnp.pi]])
    state = state.replace(
        pos=pos,
        yaw=yaw,
        pitch=jnp.zeros((1, 4)),
        vel=jnp.zeros((1, 4, 3)),
        alive=jnp.ones((1, 4), jnp.float32),
        hp=jnp.full((1, 4), 100.0),
        policy_idx=jnp.zeros((1, 4), jnp.int32),  # no bot overlay
        # poisoned stale tables: opposite of the fresh geometry
        prev_teammate_vis=jnp.zeros((1, 4, 2), bool),
        prev_can_see=jnp.zeros((1, 4, 2), bool),
        landed_shot_on=jnp.full((1, 4), -1, jnp.int32),
        successful_kill=jnp.zeros((1, 4), bool),
        crumb_total_penalty=jnp.zeros((1, 4)),
        reward_coefs=jnp.zeros_like(state.reward_coefs),
    )
    acts = env.zero_actions()
    _, out = env.step(state, acts)
    r = np.asarray(out["reward"])[0]
    # fresh LOS: teammate near+visible, opponents see everyone -> 0 reward
    np.testing.assert_allclose(r[0], 0.0, atol=1e-7)
    np.testing.assert_allclose(r[1], 0.0, atol=1e-7)


def test_flank_mode_env_smoke(simple_map_dir):
    """Flank-mode env steps end-to-end and writes prev_teammate_vis from
    the extended LOS fan."""
    cfg = mp.EnvConfig(
        task=mp.Task.Zone,
        team_size=2,
        reward_mode=mp.RewardMode.Flank,
        episode_len=24,
    )
    env = mp.Env(cfg, simple_map_dir, num_worlds=2, seed=3)
    state, _ = env.reset()
    acts = env.zero_actions()
    for _ in range(3):
        state, out = env.step(state, acts)
    assert state.prev_teammate_vis.shape == (2, 4, 2)
    assert np.all(np.isfinite(np.asarray(out["reward"])))
    # self slot can never be visible
    self_slots = np.asarray(state.prev_teammate_vis)[
        :, np.arange(4), np.arange(4) % 2
    ]
    assert not self_slots.any()
