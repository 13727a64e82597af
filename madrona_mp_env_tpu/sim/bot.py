"""Scripted A* bot.

planAStarAISystem (reference src/sim.cpp:5041-5172): agents whose policy idx
is aStarPolicyID (-1) are driven by a navmesh-pathfinding bot — pathfind to
the active zone via the precomputed all-pairs next-hop table, steer toward
the next waypoint, fire when any opponent is visible, avoid walls using the
previous step's forward lidar. applyBotActionsSystem (sim.cpp:2057-2092)
overlays the bot's actions onto the policy action tensors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import consts
from ..config import EnvConfig
from ..assets.map_data import MapData
from .types import Actions, WorldState


def _nearest_nav_tri(m: MapData, p):
    """NearestNavTri (sim.cpp:4975-5013): first containing triangle by 2D
    side-consistency; nearest-centroid fallback. p: [..., 2or3]."""
    tri_pts = m.nav_verts[m.nav_tri_indices]  # [T, 3, 3]
    a2 = tri_pts[:, :, :2]  # [T, 3, 2]
    p2 = p[..., None, :2]  # [..., 1, 2]

    v1 = a2  # [T, 3, 2]
    v2 = jnp.roll(a2, -1, axis=1)
    e = v2 - v1  # [T, 3, 2]
    vp = p2[..., None, :] - v1  # [..., T, 3, 2]
    cz = e[..., 0] * vp[..., 1] - e[..., 1] * vp[..., 0]  # [..., T, 3]
    gtz = cz > 0.0
    contained = (gtz.all(axis=-1) | (~gtz).all(axis=-1))

    any_contained = contained.any(axis=-1)
    first = jnp.argmax(contained, axis=-1)

    cent = m.nav_centroids[:, :2]
    d2 = jnp.sum(
        (p[..., None, :2] - cent) ** 2, axis=-1
    )
    nearest = jnp.argmin(d2, axis=-1)
    return jnp.where(any_contained, first, nearest)


def plan_bot_actions(
    cfg: EnvConfig, m: MapData, state: WorldState, key: jax.Array
) -> Actions:
    """Compute HardcodedBotAction for every agent (applied only to bot-policy
    agents by apply_bot_actions)."""
    A = cfg.num_agents

    r_pitch = jax.random.randint(key, (A,), 0, 2)
    reload = (state.mag_bullets == 0).astype(jnp.int32)

    # fire if any opponent visible
    fire = jnp.any(state.prev_can_see, axis=-1).astype(jnp.int32)

    # pathfind to the zone center
    zone_center = 0.5 * (m.zone_min[state.zone_cur] + m.zone_max[state.zone_cur])
    pos2 = state.pos * jnp.array([1.0, 1.0, 0.0])
    start_tri = _nearest_nav_tri(m, pos2)  # [A]
    goal_tri = _nearest_nav_tri(m, zone_center)  # scalar

    # goal_tri is a per-world scalar: slice its next-hop column
    # (dynamic-slice), then resolve the per-agent entry by a one-hot
    # masked sum — both the fused 2D gather and a batched [A]-gather
    # serialize on TPU (~10 ns/element)
    goal_col = jax.lax.dynamic_index_in_dim(
        m.nav_next_hop, goal_tri, axis=1, keepdims=False
    )  # [T_nav]
    st_oh = start_tri[:, None] == jnp.arange(goal_col.shape[0])  # [A, T]
    next_tri = jnp.sum(jnp.where(st_oh, goal_col[None, :], 0), axis=-1)
    at_goal = next_tri == goal_tri
    unreachable = next_tri == -1
    waypoint = jnp.where(
        at_goal[:, None],
        zone_center[None, :],
        m.nav_centroids[jnp.clip(next_tri, 0, m.nav_centroids.shape[0] - 1)],
    )
    waypoint = jnp.where(unreachable[:, None], 0.0, waypoint)
    waypoint = waypoint * jnp.array([1.0, 1.0, 0.0])

    fwd2 = jnp.stack([-jnp.sin(state.yaw), jnp.cos(state.yaw)], axis=-1)
    to_tgt = waypoint[:, :2] - pos2[:, :2]
    tgt_dir = to_tgt / jnp.maximum(
        jnp.linalg.norm(to_tgt, axis=-1, keepdims=True), 1e-30
    )
    facing = jnp.sum(fwd2 * tgt_dir, axis=-1) > 0.6
    move_amount = facing.astype(jnp.int32)
    cross_z = fwd2[:, 0] * tgt_dir[:, 1] - fwd2[:, 1] * tgt_dir[:, 0]
    r_yaw = jnp.where(cross_z < 0.0, move_amount, 4 - move_amount)
    move_amount = move_amount * 2
    move_angle = jnp.zeros((A,), jnp.int32)

    # lidar-based wall avoidance (sim.cpp:5112-5155)
    depth = state.prev_fwd_depth  # [A, H, W]
    close = depth < 16.0
    w_idx = jnp.arange(consts.fwd_lidar_width, dtype=jnp.float32)
    count = jnp.sum(close, axis=(1, 2)).astype(jnp.float32)
    ang_sum = jnp.sum(close * w_idx[None, None, :], axis=(1, 2))
    has_close = count > 0.0
    coll_ang = jnp.where(has_close, ang_sum / jnp.maximum(count, 1.0), 0.0)

    segment = (coll_ang / consts.fwd_lidar_width * 8.0).astype(jnp.int32)
    avoid_angle = jnp.select(
        [
            segment == 0,
            (segment == 1) | (segment == 2),
            (segment == 3) | (segment == 4),
            (segment == 5) | (segment == 6),
            segment == 7,
        ],
        [2, 3, 4, 5, 6],
        default=0,
    )
    avoid_amount = jnp.where((segment == 3) | (segment == 4), 2, 1)

    move_angle = jnp.where(has_close, avoid_angle, move_angle)
    move_amount = jnp.where(has_close, avoid_amount, move_amount)

    fire = jnp.where(reload == 1, 0, fire)
    r_yaw = jnp.where(fire == 1, 2, r_yaw)

    # HardcodedBotAction carries yaw/pitch rotate buckets [0..4]; converted
    # to continuous aim rates (applyBotActionsSystem, sim.cpp:2077-2090)
    half = consts.num_turn_buckets // 2
    yaw_rate = consts.discrete_turn_delta * (r_yaw - half).astype(jnp.float32)
    pitch_rate = consts.discrete_turn_delta * (r_pitch - half).astype(
        jnp.float32
    )

    # NOTE: applyBotActionsSystem maps only HardcodedBotAction.fire into the
    # discrete action (sim.cpp:2070-2075); the bot's reload intent is dropped
    # in the reference, so bots never reload. Replicated faithfully.
    return Actions(
        move_amount=move_amount,
        move_angle=move_angle,
        fire=fire,
        stand=jnp.zeros((A,), jnp.int32),
        aim_yaw=jnp.full((A,), consts.discrete_aim_num_yaw_buckets // 2, jnp.int32),
        aim_pitch=jnp.full(
            (A,), consts.discrete_aim_num_pitch_buckets // 2, jnp.int32
        ),
        aim_yaw_rate=yaw_rate,
        aim_pitch_rate=pitch_rate,
    )


def apply_bot_actions(
    cfg: EnvConfig, state: WorldState, actions: Actions, bot_actions: Actions
) -> Actions:
    """Overlay bot actions where policy == aStarPolicyID
    (applyBotActionsSystem, sim.cpp:2057-2092)."""
    is_bot = state.policy_idx == consts.a_star_policy_id

    def sel(b, a):
        return jnp.where(is_bot, b, a)

    return Actions(
        move_amount=sel(bot_actions.move_amount, actions.move_amount),
        move_angle=sel(bot_actions.move_angle, actions.move_angle),
        fire=sel(bot_actions.fire, actions.fire),
        stand=sel(bot_actions.stand, actions.stand),
        aim_yaw=sel(bot_actions.aim_yaw, actions.aim_yaw),
        aim_pitch=sel(bot_actions.aim_pitch, actions.aim_pitch),
        aim_yaw_rate=sel(bot_actions.aim_yaw_rate, actions.aim_yaw_rate),
        aim_pitch_rate=sel(bot_actions.aim_pitch_rate, actions.aim_pitch_rate),
    )
