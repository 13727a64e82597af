"""The per-agent actor-critic policy.

Faithful re-build of the reference policy architecture
(scripts/jax_policy.py): per-group obs embeddings with 16-frequency
sinusoidal position encoding, opponent masking on the actor side,
MaxPoolNet (concat self+lidars+max-pool over entities -> MLP 512x3) feeding
LSTM(512)+LayerNorm, separate actor/critic encoders, dense discrete heads
{move: [3,8,3,3], aim: [13,7]} and a dense critic.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax import struct

from .distributions import AIM_BUCKETS, DISCRETE_BUCKETS, ActorDistributions
from .models import (
    DenseLayerCritic,
    DenseLayerDiscreteActor,
    EmbedBlock,
    LayerNorm,
    MLP,
    PolicyLSTM,
)

RNN_HIDDEN = 512


def sinusoidal_embedding(pos, num_freqs=16):
    """vaswani_positional_embedding (scripts/jax_policy.py:62-82):
    [sin(p*2^i*pi), cos(p*2^i*pi)] interleaved per frequency, flattened over
    (freq, dim).

    Built by concatenating [..., D] pieces on the minor axis (same feature
    order as the old stack+reshape, so checkpoints/normalizer stats are
    unchanged): the [..., num_freqs, D] intermediate put (16, 3) on the
    two minor dims, which TPU tiles pad 3 -> 128 lanes — measured ~60
    ms/update of pure padding traffic in the PPO loss."""
    outs = []
    for i in range(num_freqs // 2):
        v = pos * (2.0 ** i) * jnp.pi
        outs.append(jnp.sin(v))
        outs.append(jnp.cos(v))
    return jnp.concatenate(outs, axis=-1)  # [..., num_freqs * D]


class PrefixCommon(nn.Module):
    """Shared obs embedding (scripts/jax_policy.py:130-250)."""

    dtype: jnp.dtype
    num_embed_channels: int = 64

    @nn.compact
    def __call__(self, obs: Dict[str, jax.Array], train=False):
        def _flat_lidar(x):
            # accepts structured [..., h, w, 4] (env obs) or pre-flattened
            # [..., h*w*4] (trainer rollout buffers store lidar flat to
            # dodge the TPU minor-dim padding blowup)
            if x.shape[-1] == 4:
                return x.reshape(*x.shape[:-3], -1)
            return x

        fwd = EmbedBlock(self.num_embed_channels, self.dtype,
                         name="fwd_lidar_embed")(_flat_lidar(obs["fwd_lidar"]))
        rear = EmbedBlock(self.num_embed_channels, self.dtype,
                          name="rear_lidar_embed")(_flat_lidar(obs["rear_lidar"]))

        self_pos_enc = sinusoidal_embedding(obs["self_pos"]).astype(self.dtype)
        self_features = jnp.concatenate(
            [obs["self"], obs["reward_coefs"], self_pos_enc], axis=-1
        )
        self_features = EmbedBlock(
            self.num_embed_channels, self.dtype, name="self_embed"
        )(self_features)

        mates = EmbedBlock(
            self.num_embed_channels, self.dtype, name="teammates_embed"
        )(obs["teammates"])
        opps = EmbedBlock(
            self.num_embed_channels, self.dtype, name="opponents_embed"
        )(obs["opponents"])
        last = EmbedBlock(
            self.num_embed_channels, self.dtype, name="opponents_last_known_embed"
        )(obs["opponents_last_known"])

        return {
            "self": self_features,
            "fwd_lidar": fwd,
            "rear_lidar": rear,
            "teammates": mates,
            "opponents": opps,
            "opponents_last_known": last,
            "opponent_masks": obs["opponent_masks"],
        }


class MaxPoolNet(nn.Module):
    """concat(self, lidars, maxpool(entities)) -> MLP 512x3
    (scripts/jax_policy.py:253-277)."""

    dtype: jnp.dtype

    @nn.compact
    def __call__(self, feats, train=False):
        x = jnp.concatenate(
            [
                feats["self"],
                feats["fwd_lidar"],
                feats["rear_lidar"],
                jnp.max(feats["teammates"], axis=-2),
                jnp.max(feats["opponents"], axis=-2),
                jnp.max(feats["opponents_last_known"], axis=-2),
            ],
            axis=-1,
        )
        return MLP(num_channels=512, num_layers=3, dtype=self.dtype)(x, train)


class ActorCriticNet(nn.Module):
    """BackboneSeparate: prefix + (masked actor net + LSTM) and (critic net
    + LSTM), then actor heads + critic head
    (scripts/jax_policy.py:279-436). ``use_attention`` swaps the MaxPoolNet
    encoders for EntitySelfAttentionNet (jax_policy.py:308-313)."""

    dtype: jnp.dtype
    use_attention: bool = False

    def setup(self):
        from .models import EntitySelfAttentionNet

        self.prefix = PrefixCommon(dtype=self.dtype)
        if self.use_attention:
            self.actor_net = EntitySelfAttentionNet(
                num_embed_channels=64, num_out_channels=512, num_heads=4,
                dtype=self.dtype,
            )
            self.critic_net = EntitySelfAttentionNet(
                num_embed_channels=64, num_out_channels=512, num_heads=4,
                dtype=self.dtype,
            )
        else:
            self.actor_net = MaxPoolNet(dtype=self.dtype)
            self.critic_net = MaxPoolNet(dtype=self.dtype)
        self.actor_rnn = PolicyLSTM(hidden_dim=RNN_HIDDEN, dtype=self.dtype)
        self.critic_rnn = PolicyLSTM(hidden_dim=RNN_HIDDEN, dtype=self.dtype)
        self.actor_head_discrete = DenseLayerDiscreteActor(
            buckets=DISCRETE_BUCKETS, dtype=self.dtype
        )
        self.actor_head_aim = DenseLayerDiscreteActor(
            buckets=AIM_BUCKETS, dtype=self.dtype
        )
        self.critic_head = DenseLayerCritic(dtype=self.dtype)

    def _features(self, obs, train):
        feats = self.prefix(obs, train)
        # actor masks opponents the team doesn't know about
        # (scripts/jax_policy.py:289-293)
        masked_opps = jnp.where(
            feats["opponent_masks"][..., None] == 1.0, feats["opponents"], 0.0
        )
        actor_feats = dict(feats)
        actor_feats["opponents"] = masked_opps
        a = self.actor_net(actor_feats, train)
        c = self.critic_net(feats, train)
        return a, c

    def __call__(self, rnn_states, obs, train=False):
        """Single step. rnn_states: [2(actor/critic), 2(c/h), B, H]."""
        a, c = self._features(obs, train)
        a_out, a_state = self.actor_rnn(rnn_states[0], a, train)
        c_out, c_state = self.critic_rnn(rnn_states[1], c, train)
        dists = ActorDistributions(
            discrete=self.actor_head_discrete(a_out),
            aim=self.actor_head_aim(a_out),
        )
        value = self.critic_head(c_out)
        return dists, value, jnp.stack([a_state, c_state])

    def sequence(self, rnn_start_states, dones, obs_seq, actions, train=True):
        """BPTT over [T, B, ...]: recompute distributions and values along a
        stored trajectory chunk for PPO. Returns (log_probs, entropies,
        values)."""
        a, c = self._features(obs_seq, train)
        a_outs = self.actor_rnn.sequence(rnn_start_states[0], dones, a, train)
        c_outs = self.critic_rnn.sequence(rnn_start_states[1], dones, c, train)
        dists = ActorDistributions(
            discrete=self.actor_head_discrete(a_outs),
            aim=self.actor_head_aim(a_outs),
        )
        log_probs, entropies = dists.action_stats(actions)
        values = self.critic_head(c_outs)
        return log_probs, entropies, values


def init_rnn_states(batch_shape) -> jax.Array:
    """[2(actor/critic), 2(c/h), *batch, H] fp32."""
    return jnp.zeros((2, 2, *batch_shape, RNN_HIDDEN), jnp.float32)


def clear_rnn_states(rnn_states, should_clear):
    mask = should_clear[None, None, ..., None]
    return jnp.where(mask, 0.0, rnn_states)


def get_episode_scores(win_result):
    """ELO episode scores from MatchResult winner
    (scripts/jax_policy.py:461-470): 1/0/0.5 per team."""
    a = jnp.where(win_result == 0, 1.0, jnp.where(win_result == 1, 0.0, 0.5))
    return jnp.stack([a, 1.0 - a])
