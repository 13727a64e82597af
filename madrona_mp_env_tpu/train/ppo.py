"""PPO losses and GAE.

Matches the reference's training semantics (TrainConfig/PPOConfig,
scripts/jax_train.py:245-284): gamma 0.998, GAE lambda 0.95, 2 epochs,
clip 0.2, value coef 0.5, per-action-group entropy coefs, max grad norm 0.5,
advantages not normalized by default, recurrent minibatches re-run through
the LSTM over BPTT chunks.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Tuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class PPOConfig:
    num_epochs: int = 2
    num_minibatches: int = 4
    clip_coef: float = 0.2
    value_loss_coef: float = 0.5
    entropy_coef_discrete: float = 0.3
    entropy_coef_aim: float = 0.3
    max_grad_norm: float = 0.5
    clip_value_loss: bool = False
    huber_value_loss: bool = False


def compute_gae(rewards, values, dones, bootstrap_value, gamma, gae_lambda):
    """rewards/values/dones: [T, B]; bootstrap_value: [B].
    dones[t] marks that the episode ended AT step t (no bootstrap across).
    Returns (advantages [T, B], returns [T, B])."""

    def body(carry, inp):
        next_value, next_adv = carry
        reward, value, done = inp
        nonterminal = 1.0 - done
        delta = reward + gamma * next_value * nonterminal - value
        adv = delta + gamma * gae_lambda * nonterminal * next_adv
        return (value, adv), adv

    (_, _), advantages = jax.lax.scan(
        body,
        (bootstrap_value, jnp.zeros_like(bootstrap_value)),
        (rewards, values, dones.astype(jnp.float32)),
        reverse=True,
    )
    returns = advantages + values
    return advantages, returns


def ppo_loss(
    new_log_probs: Dict[str, jax.Array],
    entropies: Dict[str, jax.Array],
    new_values: jax.Array,
    old_log_probs: Dict[str, jax.Array],
    old_values: jax.Array,
    advantages: jax.Array,
    returns: jax.Array,
    cfg: PPOConfig,
):
    """All tensors [T, MB]. Returns (loss, metrics dict)."""
    old_lp = old_log_probs["discrete"] + old_log_probs["aim"]
    new_lp = new_log_probs["discrete"] + new_log_probs["aim"]
    log_ratio = new_lp - old_lp
    ratio = jnp.exp(log_ratio)

    pg1 = -advantages * ratio
    pg2 = -advantages * jnp.clip(
        ratio, 1.0 - cfg.clip_coef, 1.0 + cfg.clip_coef
    )
    pg_loss = jnp.mean(jnp.maximum(pg1, pg2))

    if cfg.clip_value_loss:
        v_clipped = old_values + jnp.clip(
            new_values - old_values, -cfg.clip_coef, cfg.clip_coef
        )
        v_loss = 0.5 * jnp.mean(
            jnp.maximum(
                (new_values - returns) ** 2, (v_clipped - returns) ** 2
            )
        )
    elif cfg.huber_value_loss:
        v_loss = jnp.mean(jax.lax.square(jnp.minimum(jnp.abs(new_values - returns), 1.0))
                          * 0.5 + jnp.maximum(jnp.abs(new_values - returns) - 1.0, 0.0))
    else:
        v_loss = 0.5 * jnp.mean((new_values - returns) ** 2)

    ent_discrete = jnp.mean(entropies["discrete"])
    ent_aim = jnp.mean(entropies["aim"])

    loss = (
        pg_loss
        + cfg.value_loss_coef * v_loss
        - cfg.entropy_coef_discrete * ent_discrete
        - cfg.entropy_coef_aim * ent_aim
    )

    approx_kl = jnp.mean((ratio - 1.0) - log_ratio)
    clip_frac = jnp.mean(
        (jnp.abs(ratio - 1.0) > cfg.clip_coef).astype(jnp.float32)
    )

    metrics = {
        "loss": loss,
        "pg_loss": pg_loss,
        "v_loss": v_loss,
        "entropy_discrete": ent_discrete,
        "entropy_aim": ent_aim,
        "approx_kl": approx_kl,
        "clip_frac": clip_frac,
    }
    return loss, metrics
