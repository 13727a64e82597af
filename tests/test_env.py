import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madrona_mp_env_tpu import Env, EnvConfig, SimFlags, Task
from madrona_mp_env_tpu import consts
from madrona_mp_env_tpu.sim.types import Actions


@pytest.fixture(scope="module")
def env(simple_map_dir):
    cfg = EnvConfig(
        task=Task.Zone,
        team_size=3,
        sim_flags=SimFlags.Default,
    )
    return Env(cfg, simple_map_dir, num_worlds=4, seed=7)


def test_reset_shapes(env):
    state, obs = env.reset()
    W, A, ts = 4, 6, 3
    assert obs["self"].shape == (W, A, 43)
    assert obs["teammates"].shape == (W, A, ts - 1, 32)
    assert obs["opponents"].shape == (W, A, ts, 32)
    assert obs["opponents_last_known"].shape == (W, A, ts, 32)
    assert obs["self_pos"].shape == (W, A, 3)
    assert obs["opponent_masks"].shape == (W, A, ts)
    assert obs["fwd_lidar"].shape == (W, A, 2, 32, 4)
    assert obs["rear_lidar"].shape == (W, A, 2, 8, 4)
    assert obs["hp"].shape == (W, A, 1)
    assert obs["alive"].shape == (W, A, 1)
    # everyone alive at reset
    assert np.all(np.asarray(obs["alive"]) == 1.0)
    # all agents on the ground inside world bounds
    pos = np.asarray(state.pos)
    assert np.all(np.isfinite(pos))


def test_obs_finite(env):
    state, obs = env.reset()
    for k, v in obs.items():
        assert np.all(np.isfinite(np.asarray(v))), k


def test_step_runs_and_advances(env):
    state, obs = env.reset()
    acts = env.zero_actions()
    state2, out = env.step(state, acts)
    assert np.all(np.asarray(state2.cur_step) == np.asarray(state.cur_step) + 1)
    for k, v in out["obs"].items():
        assert np.all(np.isfinite(np.asarray(v))), k
    assert out["reward"].shape == (4, 6)
    assert out["done"].shape == (4, 6)


def test_movement_moves_agents(env):
    state, obs = env.reset()
    acts = env.zero_actions()
    # run forward at full speed
    acts = acts.replace(move_amount=jnp.full((4, 6), 2, jnp.int32))
    p0 = np.asarray(state.pos)
    for _ in range(10):
        state, out = env.step(state, acts)
    p1 = np.asarray(state.pos)
    moved = np.linalg.norm((p1 - p0)[..., :2], axis=-1)
    # most agents should have moved substantially (some may hit walls)
    assert np.median(moved) > 50.0


def test_determinism(env):
    state, obs = env.reset()
    acts = env.zero_actions()
    acts = acts.replace(move_amount=jnp.full((4, 6), 1, jnp.int32))

    s1 = state
    for _ in range(5):
        s1, o1 = env.step(s1, acts)

    s2 = state
    for _ in range(5):
        s2, o2 = env.step(s2, acts)

    for a, b in zip(jax.tree_util.tree_leaves(s1), jax.tree_util.tree_leaves(s2)):
        assert np.array_equal(np.asarray(a), np.asarray(b), equal_nan=True)


def test_worlds_differ(env):
    """Different worlds get different spawns (per-world RNG)."""
    state, obs = env.reset()
    pos = np.asarray(state.pos)
    assert not np.allclose(pos[0], pos[1])


def test_agents_stay_on_ground(env):
    state, obs = env.reset()
    acts = env.zero_actions()
    acts = acts.replace(
        move_amount=jnp.full((4, 6), 2, jnp.int32),
        move_angle=jnp.zeros((4, 6), jnp.int32),
    )
    for _ in range(30):
        state, out = env.step(state, acts)
    z = np.asarray(state.pos[..., 2])
    alive = np.asarray(state.alive) > 0
    # alive agents stay within plausible height band of the map
    assert np.all(z[alive] > -200.0)
    assert np.all(z[alive] < 700.0)


def test_fire_can_damage(simple_map_dir):
    """Two agents facing each other, one fires: victim should lose HP."""
    cfg = EnvConfig(task=Task.TDM, team_size=1)
    env1 = Env(cfg, simple_map_dir, num_worlds=2, seed=3)
    state, obs = env1.reset()

    A = 2
    # place agents manually: 200 units apart, facing each other
    pos = jnp.tile(
        jnp.array([[0.0, -100.0, 1.0], [0.0, 100.0, 1.0]]), (2, 1, 1)
    )
    yaw = jnp.tile(jnp.array([0.0, jnp.pi]), (2, 1))
    state = state.replace(
        pos=pos, yaw=yaw, pitch=jnp.zeros((2, A)),
        vel=jnp.zeros((2, A, 3)),
        # clear spawn invincibility (respawnInvincibleSteps = 5)
        respawn_steps=jnp.zeros((2, A), jnp.int32),
    )

    acts = env1.zero_actions()
    acts = acts.replace(
        fire=jnp.tile(jnp.array([1, 0], jnp.int32), (2, 1))
    )
    hp_before = np.asarray(state.hp)
    state, out = env1.step(state, acts)
    hp_after = np.asarray(state.hp)
    # agent 0 fires at agent 1 (aim noise is small: accuracy 0.005)
    assert np.all(hp_after[:, 1] < hp_before[:, 1])
    assert np.all(hp_after[:, 0] == hp_before[:, 0])


def test_episode_ends_and_resets(simple_map_dir):
    cfg = EnvConfig(task=Task.Zone, team_size=2, episode_len=10)
    env1 = Env(cfg, simple_map_dir, num_worlds=2, seed=11)
    state, obs = env1.reset()
    saw_done = False
    for _ in range(12):
        state, out = env1.step(state, env1.zero_actions())
        if np.any(np.asarray(out["done"])):
            saw_done = True
    assert saw_done
    # after reset, step counter back below episode_len
    assert np.all(np.asarray(state.cur_step) < 10)
