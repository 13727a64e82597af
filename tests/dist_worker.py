"""Worker process for the 2-process jax.distributed test.

Each process owns 2 virtual CPU devices; the 4-device global data mesh
shards the world axis across processes. Run by tests/test_distributed.py:

    python tests/dist_worker.py <port> <num_processes> <process_id>
"""

import os
import sys


def main():
    port, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass  # newer jax: gloo is the default cross-process CPU backend

    from madrona_mp_env_tpu.parallel.distributed import (
        global_init,
        global_mesh,
        init_distributed,
    )

    init_distributed(f"127.0.0.1:{port}", nproc, pid)
    assert jax.process_count() == nproc
    assert jax.device_count() == 2 * nproc, jax.devices()
    assert jax.local_device_count() == 2

    import jax.numpy as jnp

    from madrona_mp_env_tpu import Env, EnvConfig, SimFlags, Task
    from madrona_mp_env_tpu.train import (
        PPOConfig,
        TrainConfig,
        TrainingManager,
    )

    mesh = global_mesh()
    n_dev = 2 * nproc
    num_worlds = 2 * n_dev

    cfg = EnvConfig(
        task=Task.Zone,
        team_size=2,
        sim_flags=SimFlags.StaggerStarts | SimFlags.RandomFlipTeams,
        episode_len=50,
    )
    tcfg = TrainConfig(
        num_worlds=num_worlds,
        steps_per_update=4,
        num_bptt_chunks=2,
        num_train_policies=2,
        ppo=PPOConfig(num_epochs=1, num_minibatches=2),
        seed=7,
    )
    env = Env(cfg, os.path.join(repo, "data", "simple_map"), num_worlds)
    mgr = TrainingManager(cfg, tcfg, env)

    ts = global_init(mgr, mesh)

    # the env state must actually be partitioned over the global mesh:
    # each process holds only its local shard of the world axis
    pos = ts.env_state.pos
    assert not pos.sharding.is_fully_replicated
    local = pos.addressable_shards
    assert len(local) == 2, len(local)
    for sh in local:
        assert sh.data.shape[0] == num_worlds // n_dev, sh.data.shape

    ts, metrics = mgr.update_iter(ts)
    jax.block_until_ready(metrics["loss"])
    assert int(ts.update_idx) == 1
    assert bool(jnp.all(jnp.isfinite(metrics["loss"])))

    # still sharded after the donated update
    assert not ts.env_state.pos.sharding.is_fully_replicated

    print(f"DIST_OK process={pid}", flush=True)


if __name__ == "__main__":
    main()
