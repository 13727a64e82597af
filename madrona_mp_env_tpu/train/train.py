"""Training CLI.

Equivalent of the reference's scripts/jax_train.py: builds the env + trainer
from flags, runs the fused update loop with buffered metrics flushes, saves
orbax checkpoints every 500 updates.

Usage (mirrors train.sh:20-44):
    python -m madrona_mp_env_tpu.train.train \
        --ckpt-dir ckpts --tb-dir tb --run-name zone6v6 \
        --game-mode Zone --scene data/simple_map \
        --num-worlds 512 --num-updates 10000 --steps-per-update 120 \
        --num-bptt-chunks 4 --pbt-ensemble-size 4 --bf16
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EnvConfig, SimFlags, Task
from ..sim.env import Env
from .metrics import MetricsWriter
from .ppo import PPOConfig
from .trainer import TrainConfig, TrainingManager


def parse_args(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-dir", type=str, default="ckpts")
    ap.add_argument("--tb-dir", type=str, default="tb")
    ap.add_argument("--run-name", type=str, default="run")
    ap.add_argument("--restore", type=int)
    ap.add_argument("--game-mode", type=str, default="Zone")
    ap.add_argument("--scene", type=str, default=None)
    ap.add_argument("--team-size", type=int, default=6)

    ap.add_argument("--randomize-hp-mag", action="store_true")
    ap.add_argument("--use-middle-spawns", action="store_true")

    ap.add_argument("--num-worlds", type=int, default=512)
    ap.add_argument("--num-updates", type=int, default=1000)
    ap.add_argument("--steps-per-update", type=int, default=40)
    ap.add_argument("--num-bptt-chunks", type=int, default=4)
    ap.add_argument("--num-minibatches", type=int, default=4)

    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--gamma", type=float, default=0.998)
    ap.add_argument("--entropy-loss-coef", type=float, default=0.3)
    ap.add_argument("--pbt-ensemble-size", type=int, default=1)

    ap.add_argument("--fp16", action="store_true")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seed", type=int, default=5)
    ap.add_argument("--metrics-buffer-size", type=int, default=5)
    ap.add_argument("--ckpt-frequency", type=int, default=500)
    ap.add_argument("--profile-port", type=int, default=None)
    return ap.parse_args(argv)


def build(args):
    game_mode = getattr(Task, args.game_mode)

    sim_flags = SimFlags.Default
    if args.randomize_hp_mag:
        sim_flags |= SimFlags.RandomizeHPMagazine
    if args.use_middle_spawns:
        sim_flags |= SimFlags.SpawnInMiddle
    sim_flags |= SimFlags.StaggerStarts
    if game_mode == Task.ZoneCaptureDefend:
        sim_flags |= SimFlags.HardcodedSpawns
    sim_flags |= SimFlags.RandomFlipTeams

    cfg = EnvConfig(
        task=game_mode, sim_flags=sim_flags, team_size=args.team_size
    )

    if args.fp16:
        dtype = jnp.float16
    elif args.bf16:
        dtype = jnp.bfloat16
    else:
        dtype = jnp.float32

    tcfg = TrainConfig(
        num_worlds=args.num_worlds,
        steps_per_update=args.steps_per_update,
        num_bptt_chunks=args.num_bptt_chunks,
        lr=args.lr,
        gamma=args.gamma,
        ppo=PPOConfig(
            num_epochs=2,
            num_minibatches=args.num_minibatches,
            clip_coef=0.2,
            value_loss_coef=0.5,
            entropy_coef_discrete=args.entropy_loss_coef,
            entropy_coef_aim=args.entropy_loss_coef,
            max_grad_norm=0.5,
        ),
        num_train_policies=args.pbt_ensemble_size,
        compute_dtype=dtype,
        seed=args.seed,
        metrics_buffer_size=args.metrics_buffer_size,
    )

    scene = args.scene or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "data",
        "simple_map",
    )
    env = Env(cfg, scene, num_worlds=args.num_worlds, seed=args.seed)
    mgr = TrainingManager(cfg, tcfg, env)
    return cfg, tcfg, env, mgr


def main(argv=None):
    args = parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.profile_port:
        jax.profiler.start_server(args.profile_port)

    cfg, tcfg, env, mgr = build(args)
    writer = MetricsWriter(os.path.join(args.tb_dir, args.run_name))

    ts = mgr.init()
    if args.restore:
        ts = mgr.restore_ckpt(
            ts, os.path.join(args.ckpt_dir, args.run_name, str(args.restore))
        )

    last_time = time.time()
    last_update = int(ts.update_idx)

    while int(ts.update_idx) < args.num_updates:
        for _ in range(args.metrics_buffer_size):
            ts, metrics = mgr.update_iter(ts)
        jax.block_until_ready(metrics["loss"])

        update_id = int(ts.update_idx)
        now = time.time()
        fps = (
            args.num_worlds
            * args.steps_per_update
            * (update_id - last_update)
            / (now - last_time)
        )
        last_time, last_update = now, update_id

        print(f"Update: {update_id}  FPS: {fps:.0f}")
        scalars = {}
        for k, v in metrics.items():
            v = np.asarray(v)
            if v.ndim == 0:
                scalars[k] = float(v)
            else:
                for i, vi in enumerate(v.reshape(-1)):
                    scalars[f"p{i}/{k}"] = float(vi)
        scalars["fps"] = fps
        writer.scalars(scalars, update_id)
        writer.flush()

        if update_id % args.ckpt_frequency == 0:
            mgr.save_ckpt(ts, os.path.join(args.ckpt_dir, args.run_name))

    mgr.save_ckpt(ts, os.path.join(args.ckpt_dir, args.run_name))
    writer.close()


if __name__ == "__main__":
    main()
