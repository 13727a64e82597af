#!/usr/bin/env python
"""Headless throughput benchmark.

TPU equivalent of the reference's `headless` executable
(reference src/headless.cpp:24-128: FPS = num_steps * num_worlds / elapsed).
Runs the full Zone 6v6 env step (movement + combat + zone + obs + lidar)
batched over worlds on the default device, and prints ONE JSON line:

    {"metric": "env_steps_per_sec", "value": N, "unit": "steps/s",
     "vs_baseline": N / 1e6}

Baseline: BASELINE.md target of 1,000,000 env-steps/s per host.
"""

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# Persistent compiled-executable cache: the full env-step program takes many
# minutes to compile through the remote-compile tunnel; caching makes repeat
# benchmark runs start in seconds and does not affect the measured steady-state
# throughput (timing starts after an untimed warmup block).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcomp")
jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)


def bench_train(args):
    """Fused actor-learner throughput (rollout + GAE + PPO inside one jit —
    the reference's training FPS metric, scripts/jax_train.py:307-309)."""
    repo = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, repo)

    import madrona_mp_env_tpu as mp
    from madrona_mp_env_tpu.train import PPOConfig, TrainConfig, TrainingManager

    scene = args.scene or os.path.join(repo, "data", "simple_map")
    cfg = mp.EnvConfig(
        task=mp.Task.Zone,
        team_size=args.team_size,
        sim_flags=mp.SimFlags.StaggerStarts | mp.SimFlags.RandomFlipTeams,
    )
    tcfg = TrainConfig(
        num_worlds=args.num_worlds,
        steps_per_update=args.steps_per_update,
        num_bptt_chunks=4,
        num_train_policies=args.pbt,
        ppo=PPOConfig(num_epochs=2, num_minibatches=4),
        compute_dtype=jnp.float32 if args.f32 else jnp.bfloat16,
        seed=5,
    )
    env = mp.Env(cfg, scene, num_worlds=args.num_worlds, seed=5)
    mgr = TrainingManager(cfg, tcfg, env)
    ts = mgr.init()

    ts, metrics = mgr.update_iter(ts)  # compile + warmup
    jax.block_until_ready(metrics["loss"])

    n = max(args.num_updates, 1)
    t0 = time.perf_counter()
    for _ in range(n):
        ts, metrics = mgr.update_iter(ts)
    jax.block_until_ready(metrics["loss"])
    elapsed = time.perf_counter() - t0

    fps = args.num_worlds * args.steps_per_update * n / elapsed
    print(
        json.dumps(
            {
                "metric": "train_env_steps_per_sec",
                "value": round(fps, 1),
                "unit": "steps/s",
                "vs_baseline": round(fps / 1.0e6, 4),
            }
        )
    )


def main():
    ap = argparse.ArgumentParser()
    # 4096 worlds is the measured throughput sweet spot on one v5e chip
    # (BASELINE.md round-4 table: 177.8k vs 173.8k @ 1024, 167.5k @ 8192 —
    # batch scaling turned positive once reset clears went lazy)
    ap.add_argument("--num-worlds", type=int, default=4096)
    ap.add_argument("--num-steps", type=int, default=50)
    ap.add_argument("--team-size", type=int, default=6)
    ap.add_argument("--scene", type=str, default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--train", action="store_true",
                    help="benchmark the fused actor-learner update instead")
    ap.add_argument("--steps-per-update", type=int, default=40)
    ap.add_argument("--num-updates", type=int, default=3)
    ap.add_argument("--pbt", type=int, default=1)
    ap.add_argument("--f32", action="store_true",
                    help="train in f32 (default bf16 — the reference's "
                         "headline curriculum config, BASELINE.md)")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    if args.train:
        bench_train(args)
        return

    repo = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, repo)

    import madrona_mp_env_tpu as mp
    from madrona_mp_env_tpu.sim.types import Actions

    scene = args.scene or os.path.join(repo, "data", "simple_map")

    cfg = mp.EnvConfig(
        task=mp.Task.Zone,
        team_size=args.team_size,
        sim_flags=mp.SimFlags.StaggerStarts | mp.SimFlags.RandomFlipTeams,
    )
    env = mp.Env(cfg, scene, num_worlds=args.num_worlds, seed=5)

    state, obs = env.reset()
    A = cfg.num_agents
    W = args.num_worlds

    sim_ctrl = env.default_sim_ctrl()
    no_reset = jnp.zeros((W,), jnp.int32)
    step_fn = env.step_fn()

    # representative actions: agents run & shoot (exercises combat rays)
    key = jax.random.PRNGKey(0)
    acts = Actions(
        move_amount=jax.random.randint(key, (W, A), 0, 3),
        move_angle=jax.random.randint(key, (W, A), 0, 8),
        fire=jax.random.randint(key, (W, A), 0, 2),
        stand=jnp.zeros((W, A), jnp.int32),
        aim_yaw=jax.random.randint(key, (W, A), 0, 13),
        aim_pitch=jax.random.randint(key, (W, A), 0, 7),
        aim_yaw_rate=jnp.zeros((W, A), jnp.float32),
        aim_pitch_rate=jnp.zeros((W, A), jnp.float32),
    )

    @jax.jit
    def run_block(state, n_unused=None):
        def body(s, _):
            s, out = step_fn(s, acts, sim_ctrl, no_reset)
            return s, out["reward"][0, 0]
        state, _ = jax.lax.scan(body, state, None, length=args.num_steps)
        return state

    # compile + warmup
    state = run_block(state)
    jax.block_until_ready(state.pos)

    t0 = time.perf_counter()
    state = run_block(state)
    jax.block_until_ready(state.pos)
    elapsed = time.perf_counter() - t0

    steps_per_sec = args.num_worlds * args.num_steps / elapsed

    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec",
                "value": round(steps_per_sec, 1),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_sec / 1.0e6, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
