"""Golden-trajectory regression harness.

The reference's de-facto regression mechanism is record/replay
(src/sim.cpp:4750-4843 recordSystem + replay loading): a fixed-seed run is
captured once and later runs must reproduce it. Here the golden is a
committed .npz of per-step positions / HP / rewards / team points from the
dense CPU path with scripted-bot self-play, and `check` replays the same
seed on the current backend:

- CPU vs committed golden: bit-exact (atol=0) — catches any semantic drift
  in the sim step.
- TPU vs committed golden: the Pallas kernels trade exactness for MXU
  throughput (bf16 direction dots, approx reciprocal), so trajectories
  track the CPU reference closely for the first steps then diverge
  chaotically (fp-sensitive combat/contact branches). `check` reports the
  first step where |d_pos| exceeds tolerance and enforces agreement over a
  prefix horizon (`--horizon`).

Usage:
    python -m madrona_mp_env_tpu.tools.golden --generate  # on CPU
    python -m madrona_mp_env_tpu.tools.golden --check [--horizon 20]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

DEFAULT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests",
    "goldens",
    "zone_simple_map.npz",
)

NUM_WORLDS = 2
TEAM_SIZE = 2
NUM_STEPS = 100
SEED = 7


def _rollout():
    """Fixed-seed scripted-bot rollout on simple_map; returns per-step
    arrays."""
    import jax
    import jax.numpy as jnp

    import madrona_mp_env_tpu as mp

    cfg = mp.EnvConfig(
        task=mp.Task.Zone,
        team_size=TEAM_SIZE,
        sim_flags=mp.SimFlags.Default,
        episode_len=200,
    )
    scene = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "data",
        "simple_map",
    )
    env = mp.Env(cfg, scene, num_worlds=NUM_WORLDS, seed=SEED)
    state, _ = env.reset()
    state = state.replace(
        policy_idx=jnp.full(
            (NUM_WORLDS, cfg.num_agents), -1, jnp.int32
        )
    )
    step = env.step_fn()
    sc = env.default_sim_ctrl()
    nr = jnp.zeros((NUM_WORLDS,), jnp.int32)

    @jax.jit
    def run(state):
        def body(s, _):
            s, out = step(s, env.zero_actions(), sc, nr)
            return s, {
                "pos": s.pos,
                "yaw": s.yaw,
                "hp": s.hp,
                "reward": out["reward"],
                "team_points": s.team_points,
            }
        return jax.lax.scan(body, state, None, length=NUM_STEPS)

    _, hist = run(state)
    return {k: np.asarray(v) for k, v in hist.items()}


def generate(path: str = DEFAULT_PATH) -> None:
    # HARD guard (round-3 lesson, VERDICT r4 item 10): the committed golden
    # is the CPU-reference trajectory; a TPU-generated fixture silently
    # launders kernel divergence into the contract. Refuse outright.
    import jax

    backend = jax.default_backend()
    if backend != "cpu":
        raise RuntimeError(
            f"golden regeneration requires the CPU backend, got {backend!r};"
            " run with --generate (which pins CPU) or JAX_PLATFORMS=cpu"
        )
    hist = _rollout()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **hist)
    print(f"wrote golden ({NUM_STEPS} steps) to {path}")


def check(
    path: str = DEFAULT_PATH,
    pos_atol: float = 0.0,
    horizon: int = NUM_STEPS,
    verbose: bool = True,
):
    """Replay the golden seed on the current backend and compare.

    Returns a dict of divergence metrics; raises AssertionError if the
    prefix `horizon` violates `pos_atol`."""
    golden = dict(np.load(path))
    hist = _rollout()

    d_pos = np.abs(hist["pos"] - golden["pos"]).max(axis=(1, 2, 3))  # [T]
    d_hp = np.abs(hist["hp"] - golden["hp"]).max(axis=(1, 2))
    d_rew = np.abs(hist["reward"] - golden["reward"]).max(axis=(1, 2))

    exceed = np.nonzero(d_pos > max(pos_atol, 1e-12))[0]
    first_div = int(exceed[0]) if len(exceed) else NUM_STEPS
    metrics = {
        "first_divergence_step": first_div,
        "max_pos_err_horizon": float(d_pos[:horizon].max()),
        "max_hp_err_horizon": float(d_hp[:horizon].max()),
        "max_reward_err_horizon": float(d_rew[:horizon].max()),
        "max_pos_err_full": float(d_pos.max()),
    }
    if verbose:
        import jax

        print(f"backend: {jax.default_backend()}")
        for k, v in metrics.items():
            print(f"  {k}: {v}")
    assert metrics["max_pos_err_horizon"] <= pos_atol, (
        f"golden mismatch: max |d_pos| {metrics['max_pos_err_horizon']} > "
        f"{pos_atol} within first {horizon} steps "
        f"(first divergence at step {first_div})"
    )
    return metrics


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--generate", action="store_true")
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--path", type=str, default=DEFAULT_PATH)
    ap.add_argument("--pos-atol", type=float, default=0.0)
    ap.add_argument("--horizon", type=int, default=NUM_STEPS)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu or args.generate:
        # The golden contract is the CPU dense path (tests/test_golden.py);
        # this image's sitecustomize force-registers the axon TPU backend
        # and overrides JAX_PLATFORMS, so --generate must pin CPU itself.
        # (Round 3 shipped a TPU-generated golden because it didn't.)
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.generate:
        generate(args.path)
    if args.check:
        check(args.path, args.pos_atol, args.horizon)


if __name__ == "__main__":
    main()
