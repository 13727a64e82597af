"""Standalone raycast-kernel microbenchmarks (runs on the real chip).

Isolates the hot kernels from the env step so regressions and engine
choices (MPENV_FAN=mxu|vpu, MPENV_CULL) can be attributed directly:

  * sensor fan kernel at the sim's exact shape (N fans x F rays,
    zgroups = LOS + lidar rows) -> Grays/s,
  * grouped movement sphere-cast kernel -> Gcasts/s,
  * fan-vs-capsules kernel,
  * a full env.step at the same world count for the end-to-end number.

Usage: python -m madrona_mp_env_tpu.tools.kernel_bench [--worlds 1024]
"""

from __future__ import annotations

import argparse
import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def _timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--worlds", type=int, default=1024)
    ap.add_argument("--team-size", type=int, default=6)
    ap.add_argument("--scene", type=str, default=None)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args(argv)

    import madrona_mp_env_tpu as mp
    from madrona_mp_env_tpu import consts
    from madrona_mp_env_tpu.assets.map_data import load_map
    from madrona_mp_env_tpu.ops import raycast as rc

    repo = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
    scene = args.scene or os.path.join(repo, "data", "simple_map")
    ts = args.team_size
    cfg = mp.EnvConfig(
        task=mp.Task.Zone,
        team_size=ts,
        sim_flags=mp.SimFlags.StaggerStarts | mp.SimFlags.RandomFlipTeams,
    )
    m = load_map(scene, cfg)
    T = m.tris.v0.shape[0]
    print(f"scene={scene} padded_tris={T} backend={jax.default_backend()} "
          f"fan_engine={os.environ.get('MPENV_FAN', 'mxu')} "
          f"cull={os.environ.get('MPENV_CULL', '0')}")

    W, A = args.worlds, 2 * args.team_size
    N = W * A
    zgroups = (ts * 4,) + (consts.fwd_lidar_width,) * consts.fwd_lidar_height \
        + (consts.rear_lidar_width,) * consts.rear_lidar_height
    F = sum(zgroups)
    G = len(zgroups)

    key = jax.random.PRNGKey(0)
    origins = jax.random.uniform(key, (N, 3), minval=-1500, maxval=1500)
    origins = origins.at[:, 2].set(10.0)
    zoffs = jax.random.uniform(jax.random.PRNGKey(1), (N, G), minval=20.0,
                               maxval=60.0)
    d = jax.random.normal(jax.random.PRNGKey(2), (N, F, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    # --- sensor fan kernel ---
    @jax.jit
    def fans(o, z, dd):
        return rc.ray_fans_vs_tris(o, z, dd, m.tris, zgroups=zgroups)

    dt = _timeit(fans, origins, zoffs, d, iters=args.iters)
    rays = N * F
    print(f"fan_kernel: {dt * 1e3:.3f} ms for {rays / 1e6:.2f} Mrays "
          f"-> {rays / dt / 1e9:.3f} Grays/s "
          f"({rays * T / dt / 1e9:.1f} Gpairs/s)")

    # --- grouped movement sphere casts (L1 shape: 7 casts/agent) ---
    CPA = 7
    o_sc = jnp.broadcast_to(origins[:, None, :], (N, CPA, 3))
    d_sc = jax.random.normal(jax.random.PRNGKey(3), (N, CPA, 3))
    d_sc = d_sc / jnp.linalg.norm(d_sc, axis=-1, keepdims=True)

    @jax.jit
    def casts(o, dd):
        return rc.sphere_cast_grouped(o, dd, consts.agent_radius, m.tris)

    dt = _timeit(casts, o_sc, d_sc, iters=args.iters)
    n_casts = N * CPA
    print(f"sc_kernel(normals): {dt * 1e3:.3f} ms for {n_casts / 1e6:.2f} "
          f"Mcasts -> {n_casts / dt / 1e9:.3f} Gcasts/s "
          f"({n_casts * T / dt / 1e9:.1f} Gpairs/s)")

    @jax.jit
    def casts_nn(o, dd):
        return rc.sphere_cast_grouped(o, dd, consts.agent_radius, m.tris,
                                      with_normal=False)

    dt = _timeit(casts_nn, o_sc, d_sc, iters=args.iters)
    print(f"sc_kernel(no-normal): {dt * 1e3:.3f} ms "
          f"-> {n_casts / dt / 1e9:.3f} Gcasts/s")

    # --- fan vs capsules ---
    if jax.default_backend() == "tpu" or os.environ.get("MPENV_PALLAS") == \
            "interpret":
        from madrona_mp_env_tpu.ops.raycast_cull import fan_capsules

        o_w = origins.reshape(W, A, 3)
        d_w = d.reshape(W, A, F, 3)
        self_idx = jnp.broadcast_to(
            jnp.arange(A, dtype=jnp.int32)[None, :, None], (W, A, F)
        )
        alive = jnp.ones((W, A), bool)
        seg_h = consts.stand_height - 2.0 * consts.agent_radius
        o4 = o_w[:, :, None, :] + jnp.zeros((W, A, F, 3))

        @jax.jit
        def caps(o, dd):
            return jax.vmap(
                lambda oo, ddd, si, p, al: fan_capsules(
                    oo, ddd, si, p, al, consts.agent_radius, seg_h
                )
            )(o, dd, self_idx, o_w, alive)

        dt = _timeit(caps, o4, d_w, iters=args.iters)
        print(f"fan_capsules: {dt * 1e3:.3f} ms for {rays / 1e6:.2f} Mrays "
              f"-> {rays / dt / 1e9:.3f} Grays/s")

    # --- full env step ---
    env = mp.Env(cfg, scene, num_worlds=W, seed=5, map_data=m)
    st, _ = env.reset()
    acts = env.zero_actions()

    @jax.jit
    def step(s):
        s2, _ = env.step(s, acts)
        return s2

    dt = _timeit(step, st, iters=max(args.iters, 10))
    print(f"env.step: {dt * 1e3:.3f} ms -> "
          f"{W / dt:,.0f} env-steps/s")


if __name__ == "__main__":
    main()
