"""Scan-free split timing of the fused trainer: rollout vs PPO, jitted
separately (same config as bench.py --train). Python-loop dispatch noise is
negligible at these program sizes (~100s of ms).

Usage: python tools/probes/train_split_probe.py [worlds] [minibatches]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcomp")

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

import madrona_mp_env_tpu as mp
from madrona_mp_env_tpu.train import PPOConfig, TrainConfig, TrainingManager


def main():
    worlds = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    nmb = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cfg = mp.EnvConfig(
        task=mp.Task.Zone,
        team_size=6,
        sim_flags=mp.SimFlags.StaggerStarts | mp.SimFlags.RandomFlipTeams,
    )
    tcfg = TrainConfig(
        num_worlds=worlds,
        steps_per_update=40,
        num_bptt_chunks=4,
        num_train_policies=1,
        ppo=PPOConfig(num_epochs=2, num_minibatches=nmb),
        compute_dtype=jnp.bfloat16,
        seed=5,
    )
    env = mp.Env(cfg, os.path.join(REPO, "data", "simple_map"),
                 num_worlds=worlds, seed=5)
    mgr = TrainingManager(cfg, tcfg, env)
    ts = mgr.init()

    r_fn = jax.jit(mgr._rollout)
    p_fn = jax.jit(mgr._ppo_update)

    ts2, rnn_starts, outs, boot = r_fn(ts)
    jax.block_until_ready(boot)
    ts3, metrics = p_fn(ts2, rnn_starts, outs, boot)
    jax.block_until_ready(metrics["loss"])

    n = 3
    t0 = time.perf_counter()
    for _ in range(n):
        ts2, rnn_starts, outs, boot = r_fn(ts)
        jax.block_until_ready(boot)
    t_roll = (time.perf_counter() - t0) / n

    t0 = time.perf_counter()
    for _ in range(n):
        ts3, metrics = p_fn(ts2, rnn_starts, outs, boot)
        jax.block_until_ready(metrics["loss"])
    t_ppo = (time.perf_counter() - t0) / n

    steps = worlds * tcfg.steps_per_update
    print(f"worlds={worlds} nmb={nmb} rollout {t_roll*1e3:.1f} ms | "
          f"ppo {t_ppo*1e3:.1f} ms | sum {1e3*(t_roll+t_ppo):.1f} ms "
          f"-> {steps/(t_roll+t_ppo):,.0f} env-steps/s")


if __name__ == "__main__":
    main()
