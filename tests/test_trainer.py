import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madrona_mp_env_tpu import Env, EnvConfig, SimFlags, Task
from madrona_mp_env_tpu.train import (
    PPOConfig,
    TrainConfig,
    TrainingManager,
    compute_gae,
)


def test_gae_simple():
    # constant reward 1, value 0, no dones, gamma/lambda 1 -> adv = remaining
    T, B = 4, 2
    rewards = jnp.ones((T, B))
    values = jnp.zeros((T, B))
    dones = jnp.zeros((T, B))
    boot = jnp.zeros((B,))
    adv, ret = compute_gae(rewards, values, dones, boot, 1.0, 1.0)
    np.testing.assert_allclose(np.asarray(adv[:, 0]), [4, 3, 2, 1], atol=1e-5)
    np.testing.assert_allclose(np.asarray(ret), np.asarray(adv))


def test_gae_dones_stop_bootstrap():
    T, B = 3, 1
    rewards = jnp.ones((T, B))
    values = jnp.zeros((T, B))
    dones = jnp.array([[0.0], [1.0], [0.0]])
    boot = jnp.full((B,), 100.0)
    adv, _ = compute_gae(rewards, values, dones, boot, 1.0, 1.0)
    # episode ends at t=1: t=0 sees r0 + r1 = 2; t=2 bootstraps
    np.testing.assert_allclose(np.asarray(adv[:, 0]), [2, 1, 101], atol=1e-4)


@pytest.fixture(scope="module")
def mgr_and_state(simple_map_dir):
    cfg = EnvConfig(task=Task.Zone, team_size=2, episode_len=50)
    tcfg = TrainConfig(
        num_worlds=4,
        steps_per_update=8,
        num_bptt_chunks=2,
        num_train_policies=2,
        lr=1e-3,
        ppo=PPOConfig(num_epochs=1, num_minibatches=2),
        seed=3,
    )
    env = Env(cfg, simple_map_dir, num_worlds=4, seed=3)
    mgr = TrainingManager(cfg, tcfg, env)
    ts = mgr.init()
    return mgr, ts


def test_trainer_init(mgr_and_state):
    mgr, ts = mgr_and_state
    # stacked params over 2 policies
    leaf = jax.tree_util.tree_leaves(ts.params)[0]
    assert leaf.shape[0] == 2
    # block permutation round-trips
    x = jnp.arange(4 * 4 * 3, dtype=jnp.float32).reshape(4, 4, 3)
    np.testing.assert_array_equal(
        np.asarray(mgr.from_blocks(mgr.to_blocks(x))), np.asarray(x)
    )
    # assignment is balanced
    counts = np.bincount(np.asarray(mgr.assignment0).reshape(-1), minlength=2)
    assert counts[0] == counts[1]


def test_update_iter_runs_and_learns_shapes(mgr_and_state):
    mgr, ts = mgr_and_state
    params_before = np.asarray(jax.tree_util.tree_leaves(ts.params)[0]).copy()
    # update_iter donates its input state; read anything needed first
    idx_before = int(ts.update_idx)
    ts2, metrics = mgr.update_iter(ts)
    assert int(ts2.update_idx) == idx_before + 1
    # params changed
    params_after = jax.tree_util.tree_leaves(ts2.params)[0]
    assert not np.allclose(np.asarray(params_before), np.asarray(params_after))
    # metrics per policy, finite
    for k, v in metrics.items():
        assert np.all(np.isfinite(np.asarray(v))), k
    assert metrics["loss"].shape == (2,)
    # normalizer stats moved
    assert int(ts2.normalizer.count) > 0

    # second update works from the new state (env state persisted)
    ts3, metrics3 = mgr.update_iter(ts2)
    assert int(ts3.update_idx) == 2
