"""Multi-head discrete action distributions.

Equivalent of madrona_learn's DiscreteActionDistributions (consumed by the
reference policy, scripts/jax_policy.py:38-50): a set of independent
categorical heads over one feature vector; sample / log-prob / entropy /
argmax across all heads at once.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class DiscreteActionDistributions:
    """logits: list of [..., n_buckets_i] arrays, one per sub-action."""

    logits: Tuple[jax.Array, ...]

    def sample(self, key):
        keys = jax.random.split(key, len(self.logits))
        actions = []
        log_probs = []
        for k, lg in zip(keys, self.logits):
            a = jax.random.categorical(k, lg, axis=-1)
            lp = jax.nn.log_softmax(lg, axis=-1)
            alp = jnp.take_along_axis(lp, a[..., None], axis=-1)[..., 0]
            actions.append(a.astype(jnp.int32))
            log_probs.append(alp)
        return (
            jnp.stack(actions, axis=-1),
            jnp.sum(jnp.stack(log_probs, axis=-1), axis=-1),
        )

    def best(self):
        return jnp.stack(
            [jnp.argmax(lg, axis=-1).astype(jnp.int32) for lg in self.logits],
            axis=-1,
        )

    def action_stats(self, actions):
        """actions: [..., num_heads] -> (log_prob [...], entropy [...])."""
        log_probs = []
        entropies = []
        for i, lg in enumerate(self.logits):
            lp = jax.nn.log_softmax(lg, axis=-1)
            p = jnp.exp(lp)
            entropies.append(-jnp.sum(p * lp, axis=-1))
            alp = jnp.take_along_axis(
                lp, actions[..., i][..., None], axis=-1
            )[..., 0]
            log_probs.append(alp)
        return (
            jnp.sum(jnp.stack(log_probs, axis=-1), axis=-1),
            jnp.sum(jnp.stack(entropies, axis=-1), axis=-1),
        )


@struct.dataclass
class ActorDistributions:
    """The two action groups of the env policy: 'discrete' (move/fire/stand)
    and 'aim' (yaw/pitch buckets) — scripts/jax_policy.py:332-366."""

    discrete: DiscreteActionDistributions
    aim: DiscreteActionDistributions

    def sample(self, key):
        k1, k2 = jax.random.split(key)
        da, dlp = self.discrete.sample(k1)
        aa, alp = self.aim.sample(k2)
        return {"discrete": da, "aim": aa}, {"discrete": dlp, "aim": alp}

    def best(self):
        return {"discrete": self.discrete.best(), "aim": self.aim.best()}

    def action_stats(self, actions):
        dlp, dent = self.discrete.action_stats(actions["discrete"])
        alp, aent = self.aim.action_stats(actions["aim"])
        return (
            {"discrete": dlp, "aim": alp},
            {"discrete": dent, "aim": aent},
        )


DISCRETE_BUCKETS = (3, 8, 3, 3)  # moveAmount, moveAngle, fire, stand
AIM_BUCKETS = (13, 7)  # yaw, pitch
