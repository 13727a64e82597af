"""EMA observation normalizer.

Equivalent of madrona_learn's ObservationsEMANormalizer
(scripts/jax_policy.py:438-459): per-feature running mean/var with decay
0.99999, with a skip-list for observations that are already bounded
(positions, masks, filter bits). Functional: state is a pytree carried in
the train state and updated from each rollout batch.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import struct

SKIP_KEYS = frozenset(
    {
        "filters_state",
        "opponent_masks",
        "self_pos",
        "teammate_positions",
        "opponent_positions",
        "opponent_last_known_positions",
        "agent_map",
        "unmasked_agent_map",
    }
)

EMA_DECAY = 0.99999


@struct.dataclass
class EMANormalizerState:
    mu: Dict[str, jax.Array]
    var: Dict[str, jax.Array]
    count: jax.Array  # update counter


def init_normalizer(obs_example: Dict[str, jax.Array]) -> EMANormalizerState:
    mu = {}
    var = {}
    for k, v in obs_example.items():
        if k in SKIP_KEYS:
            continue
        feat = v.shape[-1]
        mu[k] = jnp.zeros((feat,), jnp.float32)
        var[k] = jnp.ones((feat,), jnp.float32)
    return EMANormalizerState(mu=mu, var=var, count=jnp.zeros((), jnp.int32))


def normalize_obs(
    state: EMANormalizerState, obs: Dict[str, jax.Array], dtype
) -> Dict[str, jax.Array]:
    out = {}
    for k, v in obs.items():
        if k in SKIP_KEYS or k not in state.mu:
            out[k] = v.astype(dtype)
        else:
            inv_std = jax.lax.rsqrt(state.var[k] + 1e-5)
            out[k] = ((v - state.mu[k]) * inv_std).astype(dtype)
    return out


def update_normalizer(
    state: EMANormalizerState,
    obs: Dict[str, jax.Array],
    decay: float = EMA_DECAY,
) -> EMANormalizerState:
    """Fold a batch of raw observations into the EMA stats (all leading dims
    are batch). One batch update with decay^B is equivalent to B sequential
    per-sample EMA updates against the batch statistics."""
    mu = dict(state.mu)
    var = dict(state.var)
    for k in state.mu:
        v = obs[k].astype(jnp.float32)
        axes = tuple(range(v.ndim - 1))
        batch_mu = jnp.mean(v, axis=axes)
        batch_var = jnp.var(v, axis=axes)
        batch_size = 1
        for s in v.shape[:-1]:
            batch_size *= s
        eff_decay = decay ** batch_size
        mu[k] = eff_decay * state.mu[k] + (1.0 - eff_decay) * batch_mu
        var[k] = eff_decay * state.var[k] + (1.0 - eff_decay) * (
            batch_var + (batch_mu - state.mu[k]) ** 2
        )
    return EMANormalizerState(mu=mu, var=var, count=state.count + 1)
