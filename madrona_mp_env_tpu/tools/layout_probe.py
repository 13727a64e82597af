"""A/B probe: does pinning W-minor (worlds-on-lanes) layouts on the step's
state pytree kill the [W, A]-shaped fusion swarm?

Profiling (tools/profile_step.py) shows ~2.9 ms/step of non-Pallas XLA
compute at 1024 worlds: hundreds of tiny fusions on [W, 12]/[W, 12, 3]
arrays whose minor dims pad 12 -> 128 lanes (>10x wasted lanes/bandwidth).
With worlds as the minor (lane) axis those ops tile [12, W] fully.

Usage: python -m madrona_mp_env_tpu.tools.layout_probe [--worlds 1024]
"""

from __future__ import annotations

import argparse
import os
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--worlds", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--team-size", type=int, default=6)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax.experimental.layout import Format, Layout

    import madrona_mp_env_tpu as mp
    from madrona_mp_env_tpu.sim.types import Actions

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    scene = os.path.join(repo, "data", "simple_map")
    cfg = mp.EnvConfig(
        task=mp.Task.Zone,
        team_size=args.team_size,
        sim_flags=mp.SimFlags.StaggerStarts | mp.SimFlags.RandomFlipTeams,
    )
    W = args.worlds
    env = mp.Env(cfg, scene, num_worlds=W, seed=5)
    state, obs = env.reset()
    A = cfg.num_agents
    sim_ctrl = env.default_sim_ctrl()
    no_reset = jnp.zeros((W,), jnp.int32)
    step_fn = env.step_fn()
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

    def run_block(state):
        def body(s, _):
            s, out = step_fn(s, acts, sim_ctrl, no_reset)
            return s, out["reward"][0, 0]
        state, _ = jax.lax.scan(body, state, None, length=args.steps)
        return state

    from jax.sharding import SingleDeviceSharding

    dev = jax.devices()[0]
    sds = SingleDeviceSharding(dev)

    def w_minor_format(x):
        if not hasattr(x, "shape") or x.ndim == 0 or x.shape[0] != W:
            return Format(sharding=sds)
        mtm = tuple(range(1, x.ndim)) + (0,)
        return Format(Layout(major_to_minor=mtm), sds)

    def timeit(fn, st):
        st = fn(st)
        jax.block_until_ready(st.pos)
        t0 = time.perf_counter()
        st = fn(st)
        jax.block_until_ready(st.pos)
        dt = time.perf_counter() - t0
        return W * args.steps / dt

    base = jax.jit(run_block)
    fps0 = timeit(base, state)
    print(f"baseline: {fps0:,.0f} env-steps/s")

    fmts = jax.tree.map(w_minor_format, state)
    state_t = jax.device_put(state, fmts)
    tuned = jax.jit(run_block, in_shardings=(fmts,), out_shardings=fmts)
    fps1 = timeit(tuned, state_t)
    print(f"W-minor state: {fps1:,.0f} env-steps/s ({fps1 / fps0:.2f}x)")


if __name__ == "__main__":
    main()
