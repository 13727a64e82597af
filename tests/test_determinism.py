"""Determinism contract tests.

The reference keys all episode randomness by (seed, episode, world)
(rand::split_i, sim.cpp:743-749) so trajectories are reproducible and
independent of how many worlds run alongside. Our fold_in chains
(utils/rng.py) preserve that: same seed -> identical trajectories, and
world w's trajectory is identical whether the batch holds 2 or 4 worlds.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import madrona_mp_env_tpu as mp


def _rollout(num_worlds, steps, seed, simple_map_dir, map_data=None):
    cfg = mp.EnvConfig(task=mp.Task.Zone, team_size=2, episode_len=48)
    env = mp.Env(
        cfg, simple_map_dir, num_worlds=num_worlds, seed=seed,
        map_data=map_data,
    )
    state, obs = env.reset()
    state = state.replace(
        policy_idx=jnp.full((num_worlds, 4), -1, jnp.int32)  # scripted bots
    )
    traj = []
    for _ in range(steps):
        state, out = env.step(state, env.zero_actions())
        traj.append(
            (
                np.asarray(state.pos),
                np.asarray(state.hp),
                np.asarray(out["reward"]),
            )
        )
    return env.map_data, traj


def test_same_seed_reproduces(simple_map_dir):
    m, t1 = _rollout(2, 10, 7, simple_map_dir)
    _, t2 = _rollout(2, 10, 7, simple_map_dir, map_data=m)
    for (p1, h1, r1), (p2, h2, r2) in zip(t1, t2):
        np.testing.assert_array_equal(p1, p2)
        np.testing.assert_array_equal(h1, h2)
        np.testing.assert_array_equal(r1, r2)


def test_batch_size_invariance(simple_map_dir):
    """World w's trajectory must not depend on the batch size (the
    counter-based RNG contract, SURVEY.md §7)."""
    m, t2 = _rollout(2, 10, 7, simple_map_dir)
    _, t4 = _rollout(4, 10, 7, simple_map_dir, map_data=m)
    for (p2, h2, r2), (p4, h4, r4) in zip(t2, t4):
        np.testing.assert_allclose(p2, p4[:2], rtol=0, atol=0)
        np.testing.assert_array_equal(h2, h4[:2])
        np.testing.assert_array_equal(r2, r4[:2])


def test_different_worlds_diverge(simple_map_dir):
    m, t = _rollout(2, 3, 7, simple_map_dir)
    p = t[0][0]
    assert not np.allclose(p[0], p[1]), "worlds must be decorrelated"
