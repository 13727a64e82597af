"""Multi-head discrete action distributions.

Equivalent of madrona_learn's DiscreteActionDistributions (consumed by the
reference policy, scripts/jax_policy.py:38-50): a set of independent
categorical heads over one feature vector; sample / log-prob / entropy /
argmax across all heads at once.

The head logits stay PACKED in one [..., sum(buckets)] array: per-head
[..., b<=13] tensors put a tiny dim on the 128-wide lane axis, so every
log-softmax materialized ~10x padding traffic — measured as a large slice
of the PPO update's f32 fusion smear on v5e. The packed form computes the
per-head log-softmaxes with segment reductions (identical math per head),
one take_along_axis for all heads' chosen-action log-probs, and one full
reduction for the group entropy (= sum of per-head entropies).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class DiscreteActionDistributions:
    """logits: ONE packed [..., sum(buckets)] array; buckets static."""

    logits: jax.Array
    buckets: Tuple[int, ...] = struct.field(pytree_node=False)

    def _segments(self):
        off = 0
        segs = []
        for b in self.buckets:
            segs.append((off, b))
            off += b
        return segs

    @property
    def offsets(self) -> np.ndarray:
        return np.cumsum([0] + list(self.buckets))[:-1]

    def packed_log_probs(self) -> jax.Array:
        """Per-head log-softmax, packed [..., S] (bitwise equal per head to
        jax.nn.log_softmax on the head's slice)."""
        x = self.logits
        segs = self._segments()
        shifted_parts = []
        for o, b in segs:
            sl = x[..., o : o + b]
            m = jax.lax.stop_gradient(
                jnp.max(sl, axis=-1, keepdims=True)
            )
            shifted_parts.append(sl - m)
        shifted = jnp.concatenate(shifted_parts, axis=-1)
        e = jnp.exp(shifted)
        lse_parts = []
        for o, b in segs:
            s = jnp.sum(e[..., o : o + b], axis=-1, keepdims=True)
            lse_parts.append(
                jnp.broadcast_to(jnp.log(s), e[..., o : o + b].shape)
            )
        return shifted - jnp.concatenate(lse_parts, axis=-1)

    def sample(self, key):
        """Gumbel-max per head from one packed noise draw. Returns
        (actions [..., H] i32, total log_prob [...])."""
        lp = self.packed_log_probs()
        g = jax.random.gumbel(key, self.logits.shape, jnp.float32)
        z = lp + g
        actions = []
        for o, b in self._segments():
            actions.append(
                jnp.argmax(z[..., o : o + b], axis=-1).astype(jnp.int32)
            )
        actions = jnp.stack(actions, axis=-1)  # [..., H]
        idx = actions + jnp.asarray(self.offsets, jnp.int32)
        alp = jnp.take_along_axis(lp, idx, axis=-1)
        return actions, jnp.sum(alp, axis=-1)

    def best(self):
        return jnp.stack(
            [
                jnp.argmax(
                    self.logits[..., o : o + b], axis=-1
                ).astype(jnp.int32)
                for o, b in self._segments()
            ],
            axis=-1,
        )

    def action_stats(self, actions):
        """actions: [..., num_heads] -> (log_prob [...], entropy [...])."""
        lp = self.packed_log_probs()
        idx = actions + jnp.asarray(self.offsets, jnp.int32)
        alp = jnp.take_along_axis(lp, idx, axis=-1)
        # group entropy = sum over heads of per-head entropies = one full
        # reduction over the packed axis
        ent = -jnp.sum(jnp.exp(lp) * lp, axis=-1)
        return jnp.sum(alp, axis=-1), ent


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
