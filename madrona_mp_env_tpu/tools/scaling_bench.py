"""Device-count scaling benchmark (BASELINE north star: >= 80% linear to 4
hosts).

Measures env-step and fused-train throughput as the world axis shards over
1, 2, 4, ... devices of a 1-D data mesh, printing one JSON line per point:

    {"metric": "scaling", "devices": n, "env_steps_per_sec": ...,
     "efficiency_vs_1dev": ...}

On real multi-chip hardware run it as-is (collectives ride ICI); on a
single-chip/dev box validate shapes with virtual CPU devices:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m madrona_mp_env_tpu.tools.scaling_bench --worlds-per-device 64

Multi-host: launch one process per host with --distributed flags (same
mesh-building path as train.py; jax.devices() is global after
jax.distributed.initialize)."""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp


def bench_point(n_devices: int, args) -> dict:
    import madrona_mp_env_tpu as mp
    from madrona_mp_env_tpu.parallel.distributed import global_init
    from madrona_mp_env_tpu.parallel.sharding import (
        make_data_mesh,
        shard_env_state,
    )
    from madrona_mp_env_tpu.train import (
        PPOConfig,
        TrainConfig,
        TrainingManager,
    )

    mesh = make_data_mesh(jax.devices()[:n_devices])
    W = args.worlds_per_device * n_devices  # weak scaling

    repo = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    scene = args.scene or os.path.join(repo, "data", "simple_map")
    cfg = mp.EnvConfig(
        task=mp.Task.Zone,
        team_size=args.team_size,
        sim_flags=mp.SimFlags.StaggerStarts | mp.SimFlags.RandomFlipTeams,
    )
    env = mp.Env(cfg, scene, num_worlds=W, seed=5)

    out = {"metric": "scaling", "devices": n_devices, "num_worlds": W}

    # ---- sim-only throughput
    state, _ = env.reset()
    state = shard_env_state(mesh, state)
    sim_ctrl = env.default_sim_ctrl()
    no_reset = jnp.zeros((W,), jnp.int32)
    step_fn = env.step_fn()
    acts = env.zero_actions()

    @jax.jit
    def run_block(state):
        def body(s, _):
            s, _ = step_fn(s, acts, sim_ctrl, no_reset)
            return s, ()
        state, _ = jax.lax.scan(body, state, None, length=args.num_steps)
        return state

    state = run_block(state)
    jax.block_until_ready(state.pos)
    t0 = time.perf_counter()
    state = run_block(state)
    jax.block_until_ready(state.pos)
    out["env_steps_per_sec"] = round(
        W * args.num_steps / (time.perf_counter() - t0), 1
    )

    # ---- fused-train throughput
    if args.train:
        tcfg = TrainConfig(
            num_worlds=W,
            steps_per_update=args.steps_per_update,
            num_bptt_chunks=4,
            num_train_policies=args.pbt,
            ppo=PPOConfig(num_epochs=2, num_minibatches=4),
            compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
            seed=5,
        )
        mgr = TrainingManager(cfg, tcfg, env)
        ts = global_init(mgr, mesh)
        ts, metrics = mgr.update_iter(ts)
        jax.block_until_ready(metrics["loss"])
        t0 = time.perf_counter()
        for _ in range(args.num_updates):
            ts, metrics = mgr.update_iter(ts)
        jax.block_until_ready(metrics["loss"])
        out["train_env_steps_per_sec"] = round(
            W
            * args.steps_per_update
            * args.num_updates
            / (time.perf_counter() - t0),
            1,
        )
    return out


def main(argv=None):
    # honor JAX_PLATFORMS=cpu even when a site plugin force-registers a
    # TPU backend (the env var alone loses to the plugin; the config
    # update after import wins)
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    ap = argparse.ArgumentParser()
    ap.add_argument("--worlds-per-device", type=int, default=512)
    ap.add_argument("--num-steps", type=int, default=50)
    ap.add_argument("--team-size", type=int, default=6)
    ap.add_argument("--scene", type=str, default=None)
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--steps-per-update", type=int, default=40)
    ap.add_argument("--num-updates", type=int, default=3)
    ap.add_argument("--pbt", type=int, default=1)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--max-devices", type=int, default=0,
                    help="cap the sweep (0 = all available)")
    ap.add_argument("--distributed", action="store_true")
    ap.add_argument("--coordinator-address", type=str, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    args = ap.parse_args(argv)

    if args.distributed:
        jax.distributed.initialize(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    n_total = len(jax.devices())
    if args.max_devices:
        n_total = min(n_total, args.max_devices)
    sweep = []
    n = 1
    while n <= n_total:
        sweep.append(n)
        n *= 2

    base = None
    for n in sweep:
        out = bench_point(n, args)
        key = (
            "train_env_steps_per_sec"
            if args.train
            else "env_steps_per_sec"
        )
        if base is None:
            base = out[key]
        out["efficiency_vs_1dev"] = round(out[key] / (base * n), 4)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
