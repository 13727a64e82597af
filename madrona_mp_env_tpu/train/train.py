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

    # PBT (jax_train.py:146-232)
    ap.add_argument("--pbt-past-policies", type=int, default=0)
    ap.add_argument("--pbt-explore-lr", action="store_true")
    ap.add_argument("--pbt-update-frequency", type=int, default=0,
                    help="population update every N updates (0 = off)")
    ap.add_argument("--eval-elo-steps", type=int, default=1000,
                    help="deterministic eval rollout length for ELO")
    ap.add_argument("--self-play-portion", type=float, default=0.0)
    ap.add_argument("--cross-play-portion", type=float, default=1.0)
    ap.add_argument("--past-play-portion", type=float, default=0.0)

    # scale-out: shard the world axis over local devices; multi-host via
    # jax.distributed (SURVEY.md §2.13 TPU-native plan)
    ap.add_argument("--num-devices", type=int, default=0,
                    help="devices for the data mesh (0 = single device)")
    ap.add_argument("--distributed", action="store_true",
                    help="multi-host: jax.distributed.initialize()")
    ap.add_argument("--coordinator-address", type=str, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--num-processes", type=int, default=None)
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

    pbt = None
    lr_explore = None
    if args.pbt_ensemble_size > 1 or args.pbt_past_policies > 0:
        from .pbt import ParamExplore, PBTConfig

        pbt = PBTConfig(
            num_train_policies=args.pbt_ensemble_size,
            num_past_policies=args.pbt_past_policies,
            self_play_portion=args.self_play_portion,
            cross_play_portion=args.cross_play_portion,
            past_play_portion=args.past_play_portion,
        )
        if args.pbt_explore_lr:
            # lr explored log-uniform x/÷10 (jax_train.py:227-232)
            lr_explore = ParamExplore(
                base=args.lr, min_scale=0.1, max_scale=10.0, log10_scale=True
            )

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
        pbt=pbt,
        lr_explore=lr_explore,
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
    if args.distributed:
        # multi-host scale-out: worlds shard over hosts, gradients reduce
        # over ICI/DCN inside jit (SURVEY.md §2.13)
        jax.distributed.initialize(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    if args.profile_port:
        jax.profiler.start_server(args.profile_port)

    cfg, tcfg, env, mgr = build(args)
    writer = MetricsWriter(os.path.join(args.tb_dir, args.run_name))

    ts = mgr.init()
    if args.restore:
        ts = mgr.restore_ckpt(
            ts, os.path.join(args.ckpt_dir, args.run_name, str(args.restore))
        )

    if args.num_devices:
        from ..parallel.sharding import make_data_mesh, shard_train_state

        mesh = make_data_mesh(jax.devices()[: args.num_devices])
        ts = shard_train_state(mesh, ts)

    last_time = time.time()
    last_update = int(ts.update_idx)

    while int(ts.update_idx) < args.num_updates:
        # one jitted scan of metrics_buffer_size updates; EVERY update's
        # metrics row is captured and logged (reference buffered io_callback
        # metrics, jax_train.py:343-361)
        n = min(
            args.metrics_buffer_size,
            args.num_updates - int(ts.update_idx),
        )
        ts, metrics = mgr.update_loop(ts, n)
        jax.block_until_ready(metrics["loss"])

        if (
            args.pbt_update_frequency
            and int(ts.update_idx) % args.pbt_update_frequency == 0
        ):
            # deterministic eval matches -> ELO (eval_elo,
            # jax_train.py:363-371), then snapshot best into history,
            # ELO-ranked truncation selection, and re-sampled matchmaking
            # (past opponents rotate)
            if mgr.E + mgr.P > 1:
                ts, eval_elos = mgr.eval_elo(
                    ts, num_steps=args.eval_elo_steps
                )
                from .elo import print_elos

                print_elos(eval_elos)
            ts = mgr.store_past_policy(ts)
            ts = mgr.update_population(ts)
            ts = mgr.resample_matchmaking(ts)

        update_id = int(ts.update_idx)
        now = time.time()
        fps = (
            args.num_worlds
            * args.steps_per_update
            * (update_id - last_update)
            / (now - last_time)
        )
        last_time, last_update = now, update_id

        print(f"Update: {update_id}  FPS: {fps:.0f}", flush=True)
        metrics_np = {k: np.asarray(v) for k, v in metrics.items()}
        for row in range(n):
            scalars = {}
            for k, v in metrics_np.items():
                vr = v[row]
                if vr.ndim == 0:
                    scalars[k] = float(vr)
                else:
                    for i, vi in enumerate(vr.reshape(-1)):
                        scalars[f"p{i}/{k}"] = float(vi)
            if row == n - 1:
                scalars["fps"] = fps
            writer.scalars(scalars, update_id - n + 1 + row)
        writer.flush()

        if update_id % args.ckpt_frequency == 0:
            mgr.save_ckpt(ts, os.path.join(args.ckpt_dir, args.run_name))

    mgr.save_ckpt(ts, os.path.join(args.ckpt_dir, args.run_name))
    writer.close()


if __name__ == "__main__":
    main()
