"""Counter-based RNG discipline.

Mirrors the reference's auditable keying — RandKey episode_rand_key =
rand::split_i(initRandKey, curEpisodeIdx, worldID) (reference
src/sim.cpp:743-749) — using jax.random.fold_in chains. Every random draw in
the sim is keyed by (seed, episode, world, step, system[, agent]), so
trajectories are reproducible regardless of batch size or device layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class Salt:
    """System salts for per-step keys (ordering-independent streams)."""

    INIT_WORLD = 0
    SPAWN = 1
    FIRE = 2
    BOT = 3
    CURRICULUM = 4
    RESET = 5


def episode_key(init_key_data: jax.Array, episode_idx, world_idx) -> jax.Array:
    """Raw uint32[2] key data for an episode."""
    k = jax.random.wrap_key_data(init_key_data, impl="threefry2x32")
    k = jax.random.fold_in(k, episode_idx)
    k = jax.random.fold_in(k, world_idx)
    return jax.random.key_data(k)


def _wrap(key_data: jax.Array):
    return jax.random.wrap_key_data(key_data, impl="threefry2x32")


def step_key(episode_key_data: jax.Array, cur_step) -> jax.Array:
    """Typed key for one sim step of one world."""
    return jax.random.fold_in(_wrap(episode_key_data), cur_step)


def system_key(stepk: jax.Array, salt: int) -> jax.Array:
    return jax.random.fold_in(stepk, salt)
