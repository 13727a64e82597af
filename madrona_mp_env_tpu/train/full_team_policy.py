"""Full-team policy: one policy controls an entire team.

Re-build of the reference's scripts/jax_full_team_policy.py over the
FullTeamInterface observations (sim/full_team.py):

- conv stacks over each member's lidar (:109-140)
- entity embeddings scattered into a 16x16 spatial minimap by normalized
  position with mean pooling per cell over a global-feature background
  (build_map, :208-285) — here a vectorized scatter-add/count divide
  instead of the reference's per-entity loop (TPU-friendly segment ops)
- 3-layer strided conv backbone over the minimap (:287-316)
- LSTM(256) over team features
- per-agent action heads concatenating team+agent features with a residual
  team connection (TeamDiscreteActor, :445-478); critic on team features

Action space matches this repo's env ({discrete [3,8,3,3], aim [13,7]})
rather than the reference's experimental [4,8,5,5,2,2,3] bucket set.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from .distributions import AIM_BUCKETS, DISCRETE_BUCKETS, ActorDistributions
from .models import (
    DenseLayerCritic,
    DenseLayerDiscreteActor,
    LayerNorm,
    PolicyLSTM,
)

MINIMAP_RES = 16
TEAM_RNN_HIDDEN = 256
EMBED_CH = 64


class LidarConv(nn.Module):
    """3x (Conv1d k3 s2 + leaky_relu) over the lidar width
    (jax_full_team_policy.py:104-140)."""

    dtype: jnp.dtype

    @nn.compact
    def __call__(self, lidar):
        # [..., H, W, C] -> [..., W, H*C]
        x = jnp.swapaxes(lidar, -2, -3)
        x = x.reshape(*x.shape[:-2], -1)
        for i in range(3):
            x = nn.Conv(
                features=16, kernel_size=(3,), strides=(2,), padding="SAME",
                dtype=self.dtype,
            )(x)
            if i < 2:
                x = nn.leaky_relu(x)
        x = x.reshape(*x.shape[:-2], -1)
        x = LayerNorm(dtype=self.dtype)(x)
        return nn.leaky_relu(x)


class EmbedEntities(nn.Module):
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, ob):
        o = nn.Dense(
            EMBED_CH,
            kernel_init=jax.nn.initializers.orthogonal(),
            bias_init=jax.nn.initializers.constant(0),
            dtype=self.dtype,
        )(ob)
        o = LayerNorm(dtype=self.dtype)(o)
        return nn.leaky_relu(o)


class TeamPrefixCommon(nn.Module):
    """Shared embedding of the full-team obs groups
    (jax_full_team_policy.py:92-204)."""

    dtype: jnp.dtype

    @nn.compact
    def __call__(self, obs: Dict[str, jax.Array], train=False):
        my_obs = obs["full_team_players"]
        enemy_obs = obs["full_team_enemies"]
        lk_obs = obs["full_team_last_known_enemies"]

        # positions at common-ob offset 8 (static_assert types.hpp:1084-1085)
        ts = my_obs.shape[-2]
        pos_off = 2 + ts  # isValid + id[ts] + isAlive
        my_positions = my_obs[..., pos_off : pos_off + 3]
        enemy_positions = enemy_obs[..., pos_off : pos_off + 3]
        lk_positions = lk_obs[..., pos_off : pos_off + 3]
        enemy_mask = enemy_obs[..., -1:]  # teamKnowsLocation (last field)

        global_features = nn.Dense(
            EMBED_CH,
            kernel_init=jax.nn.initializers.orthogonal(),
            bias_init=jax.nn.initializers.constant(0),
            dtype=self.dtype,
            name="global_embed",
        )(obs["full_team_global"])

        my_features = EmbedEntities(self.dtype, name="my_embed")(my_obs)
        enemy_features = EmbedEntities(self.dtype, name="enemy_embed")(enemy_obs)
        lk_features = EmbedEntities(self.dtype, name="last_known_enemy_embed")(
            lk_obs
        )

        fwd = LidarConv(self.dtype, name="fwd_lidar_conv")(
            obs["full_team_fwd_lidar"]
        )
        rear = LidarConv(self.dtype, name="rear_lidar_conv")(
            obs["full_team_rear_lidar"]
        )
        my_lidar = jnp.concatenate([fwd, rear], axis=-1)

        return {
            "global_features": global_features,
            "my_features": my_features,
            "my_lidar": my_lidar,
            "enemy_features": enemy_features,
            "last_known_enemy_features": lk_features,
            "my_positions": my_positions,
            "enemy_positions": enemy_positions,
            "last_known_enemy_positions": lk_positions,
            "enemy_mask": enemy_mask,
        }


def build_minimap(
    global_features,  # [B, C]
    entity_features,  # [B, N, C]
    entity_positions,  # [B, N, 3] normalized [0,1]
    entity_valid,  # [B, N] 1.0 where the entity should land on the map
):
    """Scatter-mean of entity embeddings into a 16x16 grid over a
    global-feature background (build_map, jax_full_team_policy.py:208-285).
    Vectorized: one scatter-add of features + one of counts, then divide —
    numerically equal to the reference's sequential running mean."""
    B, N, C = entity_features.shape
    res = MINIMAP_RES

    ix = jnp.clip((entity_positions[..., 0] * res).astype(jnp.int32), 0, res - 1)
    iy = jnp.clip((entity_positions[..., 1] * res).astype(jnp.int32), 0, res - 1)
    cell = iy * res + ix  # [B, N]

    valid = entity_valid.astype(jnp.float32)
    feats = entity_features.astype(jnp.float32) * valid[..., None]

    base = jnp.broadcast_to(
        global_features.astype(jnp.float32)[:, None, :], (B, res * res, C)
    )
    counts = jnp.ones((B, res * res), jnp.float32)

    def one(base_b, counts_b, cell_b, feats_b, valid_b):
        summed = base_b.at[cell_b].add(feats_b)
        cnt = counts_b.at[cell_b].add(valid_b)
        return summed / cnt[:, None], cnt

    summed, _ = jax.vmap(one)(base, counts, cell, feats, valid)
    return summed.reshape(B, res, res, C).astype(entity_features.dtype)


class ConvBackbone(nn.Module):
    """3 strided 3x3 convs over the minimap
    (jax_full_team_policy.py:287-316)."""

    dtype: jnp.dtype

    @nn.compact
    def __call__(self, minimap):
        o = nn.Conv(32, (3, 3), strides=(2, 2), dtype=self.dtype)(minimap)
        o = nn.leaky_relu(o)
        o = nn.Conv(64, (3, 3), strides=(2, 2), dtype=self.dtype)(o)
        o = nn.leaky_relu(o)
        o = nn.Conv(64, (3, 3), strides=(2, 2), dtype=self.dtype)(o)
        o = o.reshape(*o.shape[:-3], -1)
        o = LayerNorm(dtype=self.dtype)(o)
        return nn.leaky_relu(o)


class TeamNet(nn.Module):
    """Minimap + conv backbone -> (team_features, agent_features)
    (TeamActorNet/TeamCriticNet, jax_full_team_policy.py:319-443). The
    critic variant sees all enemies (mask of ones)."""

    dtype: jnp.dtype
    mask_enemies: bool

    @nn.compact
    def __call__(self, feats, train=False):
        my = feats["my_features"]
        batch_shape = my.shape[:-2]
        ts, C = my.shape[-2:]

        def flat(x):
            return x.reshape(-1, *x.shape[len(batch_shape):])

        valid_my = jnp.ones(flat(my).shape[:-1], jnp.float32)
        if self.mask_enemies:
            enemy_valid = flat(feats["enemy_mask"])[..., 0]
        else:
            enemy_valid = jnp.ones_like(flat(feats["enemy_mask"])[..., 0])
        # entities: my players, enemies, last-knowns stacked on N axis
        ent_feats = jnp.concatenate(
            [
                flat(my),
                flat(feats["enemy_features"]),
                flat(feats["last_known_enemy_features"]),
            ],
            axis=-2,
        )
        ent_pos = jnp.concatenate(
            [
                flat(feats["my_positions"]),
                flat(feats["enemy_positions"]),
                flat(feats["last_known_enemy_positions"]),
            ],
            axis=-2,
        )
        # validity follows the reference: my/lk entries use their isValid
        # via feature zeroing upstream; enemies additionally masked
        ent_valid = jnp.concatenate(
            [
                valid_my,
                enemy_valid,
                jnp.ones_like(valid_my),
            ],
            axis=-1,
        )

        minimap = build_minimap(
            flat(feats["global_features"]), ent_feats, ent_pos, ent_valid
        )
        team_features = ConvBackbone(self.dtype)(minimap)
        team_features = team_features.reshape(
            *batch_shape, team_features.shape[-1]
        )

        agent_features = jnp.concatenate(
            [my, feats["my_lidar"]], axis=-1
        )
        return team_features, agent_features


class TeamActorHead(nn.Module):
    """Per-agent heads over concat(team, agent) with a residual team
    connection (TeamDiscreteActor, jax_full_team_policy.py:445-478)."""

    dtype: jnp.dtype

    @nn.compact
    def __call__(self, team_features, agent_features):
        team_b = jnp.broadcast_to(
            team_features[..., None, :],
            agent_features.shape[:-1] + (team_features.shape[-1],),
        )
        features = jnp.concatenate([team_b, agent_features], axis=-1)
        features = nn.Dense(
            TEAM_RNN_HIDDEN,
            kernel_init=jax.nn.initializers.orthogonal(),
            bias_init=jax.nn.initializers.constant(0),
            dtype=self.dtype,
            name="actor_merge",
        )(features)
        features = LayerNorm(dtype=self.dtype)(features)
        features = nn.leaky_relu(features)
        features = team_features[..., None, :] + features

        return ActorDistributions(
            discrete=DenseLayerDiscreteActor(
                buckets=DISCRETE_BUCKETS, dtype=self.dtype
            )(features),
            aim=DenseLayerDiscreteActor(buckets=AIM_BUCKETS, dtype=self.dtype)(
                features
            ),
        )


class FullTeamActorCriticNet(nn.Module):
    """BackboneSeparate actor/critic over the team minimap encoders with
    LSTM(256) on the team features (make_policy,
    jax_full_team_policy.py:489-560)."""

    dtype: jnp.dtype

    def setup(self):
        self.prefix = TeamPrefixCommon(dtype=self.dtype)
        self.actor_net = TeamNet(dtype=self.dtype, mask_enemies=True)
        self.critic_net = TeamNet(dtype=self.dtype, mask_enemies=False)
        self.actor_rnn = PolicyLSTM(hidden_dim=TEAM_RNN_HIDDEN, dtype=self.dtype)
        self.critic_rnn = PolicyLSTM(
            hidden_dim=TEAM_RNN_HIDDEN, dtype=self.dtype
        )
        self.actor_head = TeamActorHead(dtype=self.dtype)
        self.critic_head = DenseLayerCritic(dtype=self.dtype)

    def __call__(self, rnn_states, obs, train=False):
        """Single step over [B(teams), ...] obs. rnn_states:
        [2(actor/critic), 2(c/h), B, H]. Returns per-agent dists
        ([B, ts, heads]), team value [B], new rnn states."""
        feats = self.prefix(obs, train)
        a_team, a_agent = self.actor_net(feats, train)
        c_team, _ = self.critic_net(feats, train)
        a_out, a_state = self.actor_rnn(rnn_states[0], a_team, train)
        c_out, c_state = self.critic_rnn(rnn_states[1], c_team, train)
        dists = self.actor_head(a_out, a_agent)
        value = self.critic_head(c_out)
        return dists, value, jnp.stack([a_state, c_state])

    def sequence(self, rnn_start_states, dones, obs_seq, actions, train=True):
        """BPTT over [T, B, ...]."""
        feats = self.prefix(obs_seq, train)
        a_team, a_agent = self.actor_net(feats, train)
        c_team, _ = self.critic_net(feats, train)
        a_outs = self.actor_rnn.sequence(rnn_start_states[0], dones, a_team, train)
        c_outs = self.critic_rnn.sequence(rnn_start_states[1], dones, c_team, train)
        dists = self.actor_head(a_outs, a_agent)
        log_probs, entropies = dists.action_stats(actions)
        values = self.critic_head(c_outs)
        return log_probs, entropies, values


def init_team_rnn_states(batch_shape) -> jax.Array:
    return jnp.zeros((2, 2, *batch_shape, TEAM_RNN_HIDDEN), jnp.float32)


FULL_TEAM_OBS_KEYS = (
    "full_team_global",
    "full_team_players",
    "full_team_enemies",
    "full_team_last_known_enemies",
    "full_team_fwd_lidar",
    "full_team_rear_lidar",
)
