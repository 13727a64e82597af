"""Parity: the fused scalar-tail Pallas kernel (ops/tail_pallas.py,
interpret mode) must reproduce the jnp system chain autoheal -> zone ->
match-info -> rewards -> done (reference src/sim.cpp:1875-4717) over a
multi-step scripted rollout."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import madrona_mp_env_tpu as mp


def _rollout(simple_map_dir, monkeypatch, tail_flag, steps=60):
    monkeypatch.setenv("MPENV_PALLAS", "interpret")
    monkeypatch.setenv("MPENV_TAIL_FUSED", tail_flag)
    # interpret-mode cast kernels are slow; keep the tail comparison focused
    # by keeping the world/agent count small but the team size big enough to
    # exercise the spread bonus (needs ts >= 3)
    cfg = mp.EnvConfig(task=mp.Task.Zone, team_size=3, episode_len=40)
    env = mp.Env(cfg, simple_map_dir, num_worlds=2, seed=11)
    state, _ = env.reset()
    state = state.replace(
        policy_idx=jnp.full((2, cfg.num_agents), -1, jnp.int32)
    )
    step = env.step_fn()
    sc = env.default_sim_ctrl()
    nr = jnp.zeros((2,), jnp.int32)

    @jax.jit
    def run(state):
        def body(s, _):
            s, out = step(s, env.zero_actions(), sc, nr)
            return s, (out["reward"], out["events"]["capture_event"])
        return jax.lax.scan(body, state, None, length=steps)

    state, (rew, caps) = run(state)
    return state, np.asarray(rew), np.asarray(caps)


def test_tail_fused_parity_smoke(simple_map_dir, monkeypatch):
    """Fast-tier guard for the DEFAULT-ON fused tail kernel (VERDICT r4
    item 6): a short rollout must match the jnp chain on rewards, captures,
    and the scalar state the kernel owns. The exhaustive 60-step version
    below stays in the slow tier."""
    s_ref, r_ref, c_ref = _rollout(simple_map_dir, monkeypatch, "0", steps=6)
    s_fused, r_fused, c_fused = _rollout(
        simple_map_dir, monkeypatch, "1", steps=6
    )
    np.testing.assert_allclose(r_fused, r_ref, rtol=0, atol=1e-5)
    np.testing.assert_array_equal(c_fused, c_ref)
    for name in ("hp", "team_points", "zone_steps_remaining", "reward",
                 "min_dist_to_zone", "autoheal_steps"):
        a = np.asarray(getattr(s_ref, name))
        b = np.asarray(getattr(s_fused, name))
        np.testing.assert_allclose(b, a, rtol=0, atol=2e-4, err_msg=name)


@pytest.mark.slow
def test_tail_fused_matches_jnp_chain(simple_map_dir, monkeypatch):
    s_ref, r_ref, c_ref = _rollout(simple_map_dir, monkeypatch, "0")
    s_fused, r_fused, c_fused = _rollout(simple_map_dir, monkeypatch, "1")

    np.testing.assert_allclose(r_fused, r_ref, rtol=0, atol=1e-5)
    np.testing.assert_array_equal(c_fused, c_ref)

    ref_leaves = jax.tree_util.tree_flatten_with_path(s_ref)[0]
    fused_leaves = jax.tree_util.tree_flatten_with_path(s_fused)[0]
    for (path, a), (_, b) in zip(ref_leaves, fused_leaves):
        a, b = np.asarray(a), np.asarray(b)
        name = jax.tree_util.keystr(path)
        if a.dtype.kind in "fc":
            np.testing.assert_allclose(
                b, a, rtol=0, atol=2e-4, err_msg=name
            )
        else:
            np.testing.assert_array_equal(b, a, err_msg=name)
