"""Eval/inference stack tests: checkpoint load, crossplay eval rollout with
record/event/BC dumps, ELO updates, and the BC fine-tune loop."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import madrona_mp_env_tpu as mp
from madrona_mp_env_tpu.train import PPOConfig, TrainConfig, TrainingManager
from madrona_mp_env_tpu.train.infer import EvalConfig, EvalManager, eval_load_ckpt


@pytest.fixture(scope="module")
def tiny_ckpt(simple_map_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("ckpt")
    cfg = mp.EnvConfig(
        task=mp.Task.Zone,
        team_size=2,
        sim_flags=mp.SimFlags.StaggerStarts | mp.SimFlags.RandomFlipTeams,
        episode_len=32,
    )
    tcfg = TrainConfig(
        num_worlds=4,
        steps_per_update=4,
        num_bptt_chunks=2,
        num_train_policies=2,
        ppo=PPOConfig(num_epochs=1, num_minibatches=2),
        seed=3,
    )
    env = mp.Env(cfg, simple_map_dir, num_worlds=4, seed=3)
    mgr = TrainingManager(cfg, tcfg, env)
    ts = mgr.init()
    ts, _ = mgr.update_iter(ts)
    ckpt_dir = os.path.join(out, "run")
    mgr.save_ckpt(ts, ckpt_dir)
    return {"cfg": cfg, "ckpt": os.path.join(ckpt_dir, "1"), "out": str(out)}


def test_eval_load_ckpt(tiny_ckpt):
    params, normalizer, elo, num_policies = eval_load_ckpt(tiny_ckpt["ckpt"])
    assert num_policies == 2
    assert elo.shape == (2,)

    params1, _, elo1, n1 = eval_load_ckpt(tiny_ckpt["ckpt"], single_policy=1)
    assert n1 == 1
    p0 = jax.tree_util.tree_leaves(params)[0]
    p1 = jax.tree_util.tree_leaves(params1)[0]
    assert np.allclose(np.asarray(p0[1]), np.asarray(p1[0]))


def test_eval_rollout_with_dumps(tiny_ckpt, simple_map_dir):
    params, normalizer, elo, num_policies = eval_load_ckpt(tiny_ckpt["ckpt"])
    cfg = tiny_ckpt["cfg"]
    env = mp.Env(cfg, simple_map_dir, num_worlds=4, seed=9, collect_log=True)
    ecfg = EvalConfig(num_worlds=4, num_eval_steps=20, chunk_steps=5)
    mgr = EvalManager(cfg, ecfg, env, num_policies)

    out = tiny_ckpt["out"]
    record = os.path.join(out, "eval_record.bin")
    events = os.path.join(out, "eval_events")
    bc_dir = os.path.join(out, "bc")

    elo2 = mgr.run(
        params,
        normalizer,
        elo,
        record_path=record,
        event_log_dir=events,
        bc_dump_dir=bc_dir,
        verbose=False,
    )
    assert np.all(np.isfinite(np.asarray(elo2)))

    # record file: 20 steps x 4 worlds
    from madrona_mp_env_tpu.data import ReplayLogReader, read_step_snapshots

    reader = ReplayLogReader(record, num_worlds=4)
    assert len(reader) == 20
    snaps = read_step_snapshots(events)
    assert len(snaps) == 80

    # BC dump: shapes metadata + raw files reload consistently
    from madrona_mp_env_tpu.train.bc import load_bc_data

    data = load_bc_data(bc_dir)
    N = data["actions"].shape[0]
    assert N == 20 * 4 * cfg.num_agents
    assert data["actions"].shape[-1] == 6
    assert data["rnn_states"].shape[1:] == (2, 2, 512)
    assert data["action_logits"].shape[-1] == 3 + 8 + 3 + 3 + 13 + 7


def test_eval_vs_bot(tiny_ckpt, simple_map_dir):
    """vs-bot mode: team 1 routed to the scripted A* bot, per-policy W/D/L
    tallied from finished matches (reference's e2e learning metric)."""
    params, normalizer, elo, num_policies = eval_load_ckpt(tiny_ckpt["ckpt"])
    cfg = tiny_ckpt["cfg"]
    env = mp.Env(cfg, simple_map_dir, num_worlds=4, seed=11)
    # episode_len=32 -> finished matches within 40 eval steps
    ecfg = EvalConfig(num_worlds=4, num_eval_steps=40, chunk_steps=10)
    mgr = EvalManager(cfg, ecfg, env, num_policies, vs_bot=True)

    state, _, _ = mgr.init_state()
    pi = np.asarray(state.policy_idx)
    ts = cfg.team_size
    assert np.all(pi[:, ts:] == -1), "team 1 must be the scripted bot"
    assert np.all(pi[:, :ts] == np.asarray(mgr.assignment)[:, :ts])
    # each ensemble member fields team 0 somewhere
    assert set(np.unique(pi[:, 0])) == set(range(num_policies))

    elo2 = mgr.run(params, normalizer, elo, verbose=False)
    # ELO untouched in vs-bot mode (bot has no rating slot)
    assert np.allclose(np.asarray(elo2), np.asarray(elo))
    wdl = mgr.vs_bot_wdl
    assert wdl.shape == (num_policies, 3)
    assert wdl.sum() >= num_policies, "expected finished matches per policy"


def test_bc_finetune(tiny_ckpt):
    from madrona_mp_env_tpu.train.bc import run_bc

    out = tiny_ckpt["out"]
    bc_dir = os.path.join(out, "bc")
    assert os.path.exists(os.path.join(bc_dir, "shapes"))

    out_dir = os.path.join(out, "bc_run")
    params = run_bc(
        in_ckpt=tiny_ckpt["ckpt"],
        out_ckpt_dir=out_dir,
        bc_data_dir=bc_dir,
        num_epochs=1,
        minibatch_size=64,
        kl_coef=0.1,
    )
    assert all(
        np.all(np.isfinite(np.asarray(x)))
        for x in jax.tree_util.tree_leaves(params)
    )
    # resulting checkpoint is loadable for eval
    from madrona_mp_env_tpu.train.infer import eval_load_ckpt

    p2, _, _, n = eval_load_ckpt(os.path.join(out_dir, "1"))
    assert n == 2
