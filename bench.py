#!/usr/bin/env python
"""Headless throughput benchmark.

TPU equivalent of the reference's `headless` executable
(reference src/headless.cpp:24-128: FPS = num_steps * num_worlds / elapsed).
Runs the full Zone 6v6 env step (movement + combat + zone + obs + lidar)
batched over worlds, and prints JSON lines:

    {"metric": "env_steps_per_sec", "value": N, "unit": "steps/s",
     "vs_baseline": N / 1e6}

Baseline: BASELINE.md target of 1,000,000 env-steps/s per host.

Invoked with NO arguments it emits the round-stable suite (VERDICT r4
item 7) — three comparable rows every round:
    env_steps_per_sec_1024x100   (the round-2/3 config)
    train_env_steps_per_sec      (fused actor-learner, 1024 x 40)
    env_steps_per_sec            (headline: 4096 x 50, printed last)

With --devices N (or --all-devices) the world batch is sharded over N
local devices via a 1-D data mesh (parallel/sharding.py) — the multi-chip
host bench path; on this box only 1 real chip exists, so the sharded path
is exercised by tests on the virtual CPU mesh.
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

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def emit(metric, fps):
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(fps, 1),
                "unit": "steps/s",
                "vs_baseline": round(fps / 1.0e6, 4),
            }
        ),
        flush=True,
    )


def bench_env(num_worlds, num_steps, team_size=6, scene=None, devices=1):
    """Env-only throughput; returns steps/s. ``devices`` > 1 shards the
    world axis over a 1-D local-device data mesh."""
    import madrona_mp_env_tpu as mp
    from madrona_mp_env_tpu.sim.types import Actions

    scene = scene or os.path.join(REPO, "data", "simple_map")

    cfg = mp.EnvConfig(
        task=mp.Task.Zone,
        team_size=team_size,
        sim_flags=mp.SimFlags.StaggerStarts | mp.SimFlags.RandomFlipTeams,
    )
    env = mp.Env(cfg, scene, num_worlds=num_worlds, seed=5)

    state, obs = env.reset()
    A = cfg.num_agents
    W = num_worlds

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

    if devices > 1:
        # shard every [W, ...] leaf over the data mesh; the per-world sim
        # is embarrassingly parallel, so the jitted scan partitions cleanly
        from madrona_mp_env_tpu.parallel.sharding import (
            make_data_mesh,
            shard_env_state,
            world_sharding,
        )

        mesh = make_data_mesh(jax.devices()[:devices])
        ws = world_sharding(mesh)
        state = shard_env_state(mesh, state)
        acts = jax.device_put(acts, ws)
        no_reset = jax.device_put(no_reset, ws)

    @jax.jit
    def run_block(state):
        def body(s, _):
            s, out = step_fn(s, acts, sim_ctrl, no_reset)
            return s, out["reward"][0, 0]

        state, _ = jax.lax.scan(body, state, None, length=num_steps)
        return state

    # compile + warmup
    state = run_block(state)
    jax.block_until_ready(state.pos)

    t0 = time.perf_counter()
    state = run_block(state)
    jax.block_until_ready(state.pos)
    elapsed = time.perf_counter() - t0

    return num_worlds * num_steps / elapsed


def bench_train(num_worlds, steps_per_update, num_updates=3, team_size=6,
                scene=None, pbt=1, f32=False, num_minibatches=None):
    """Fused actor-learner throughput (rollout + GAE + PPO inside one jit —
    the reference's training FPS metric, scripts/jax_train.py:307-309).

    num_minibatches=None scales the minibatch COUNT with the world count so
    the per-minibatch unit count stays ~12k sequences (the working set of
    the 1024-world/4-minibatch config): recurrent-PPO backward activations
    are proportional to minibatch size, and a fixed count OOMs at 4096+
    worlds."""
    import madrona_mp_env_tpu as mp
    from madrona_mp_env_tpu.train import PPOConfig, TrainConfig, TrainingManager

    if num_minibatches is None:
        units = 4 * num_worlds * 2 * team_size  # num_bptt_chunks * actors
        num_minibatches = max(4, units // 12288)

    scene = scene or os.path.join(REPO, "data", "simple_map")
    cfg = mp.EnvConfig(
        task=mp.Task.Zone,
        team_size=team_size,
        sim_flags=mp.SimFlags.StaggerStarts | mp.SimFlags.RandomFlipTeams,
    )
    tcfg = TrainConfig(
        num_worlds=num_worlds,
        steps_per_update=steps_per_update,
        num_bptt_chunks=4,
        num_train_policies=pbt,
        ppo=PPOConfig(num_epochs=2, num_minibatches=num_minibatches),
        compute_dtype=jnp.float32 if f32 else jnp.bfloat16,
        seed=5,
    )
    env = mp.Env(cfg, scene, num_worlds=num_worlds, seed=5)
    mgr = TrainingManager(cfg, tcfg, env)
    ts = mgr.init()

    ts, metrics = mgr.update_iter(ts)  # compile + warmup
    jax.block_until_ready(metrics["loss"])

    n = max(num_updates, 1)
    t0 = time.perf_counter()
    for _ in range(n):
        ts, metrics = mgr.update_iter(ts)
    jax.block_until_ready(metrics["loss"])
    elapsed = time.perf_counter() - t0

    return num_worlds * steps_per_update * n / elapsed


def run_suite():
    """The round-stable three-row suite (each row in its own config)."""
    emit("env_steps_per_sec_1024x100", bench_env(1024, 100))
    emit("train_env_steps_per_sec", bench_train(1024, 40))
    # headline LAST: the driver's parsed row
    emit("env_steps_per_sec", bench_env(4096, 50))


def main():
    ap = argparse.ArgumentParser()
    # 4096 worlds is the measured throughput sweet spot on one v5e chip
    # (BASELINE.md round-4 table); no-arg invocations run the full suite
    ap.add_argument("--num-worlds", type=int, default=4096)
    ap.add_argument("--num-steps", type=int, default=50)
    ap.add_argument("--team-size", type=int, default=6)
    ap.add_argument("--scene", type=str, default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--devices", type=int, default=1,
                    help="shard worlds over N local devices (1-D data mesh)")
    ap.add_argument("--all-devices", action="store_true",
                    help="shard worlds over every local device")
    ap.add_argument("--train", action="store_true",
                    help="benchmark the fused actor-learner update instead")
    ap.add_argument("--steps-per-update", type=int, default=40)
    ap.add_argument("--num-updates", type=int, default=3)
    ap.add_argument("--num-minibatches", type=int, default=None,
                    help="default scales with worlds (fixed ~49k units/mb)")
    ap.add_argument("--pbt", type=int, default=1)
    ap.add_argument("--f32", action="store_true",
                    help="train in f32 (default bf16 — the reference's "
                         "headline curriculum config, BASELINE.md)")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    if len(sys.argv) == 1:
        run_suite()
        return

    if args.train:
        fps = bench_train(
            args.num_worlds,
            args.steps_per_update,
            num_updates=args.num_updates,
            team_size=args.team_size,
            scene=args.scene,
            pbt=args.pbt,
            f32=args.f32,
            num_minibatches=args.num_minibatches,
        )
        emit("train_env_steps_per_sec", fps)
        return

    devices = len(jax.devices()) if args.all_devices else args.devices
    fps = bench_env(
        args.num_worlds,
        args.num_steps,
        team_size=args.team_size,
        scene=args.scene,
        devices=devices,
    )
    metric = "env_steps_per_sec"
    if devices > 1:
        metric = f"env_steps_per_sec_{devices}dev"
    emit(metric, fps)


if __name__ == "__main__":
    main()
