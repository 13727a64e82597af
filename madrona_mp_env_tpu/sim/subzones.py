"""SubZones: per-policy capture sub-objectives (SimFlags.SubZones).

Re-implements subzoneSystem (reference src/sim.cpp:1978-2043) and
subzoneRewardSystem (sim.cpp:3734-3847): 8 static rotated-AABB sub-zones
(zones 1 and 2 of the map + 6 hardcoded boxes, level_gen.cpp:283-326);
each agent is assigned the sub-zone indexed by its policy id (clamped);
a per-sub-zone contested/controlling state machine drives an individual
in-zone / approach / control reward.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as cfgmod
from .. import consts
from ..config import EnvConfig
from ..assets.map_data import MapData
from ..ops import geom
from .types import WorldState

NUM_SUBZONES = 8

# hardcoded sub-zone boxes [2..7] (level_gen.cpp:290-326)
HARDCODED_SUBZONES = np.asarray(
    [
        [[-950.0, -500.0, 0.0], [-50.0, 500.0, 1000.0]],
        [[50.0, -500.0, 0.0], [950.0, 500.0, 1000.0]],
        [[-1000.0, -1650.0, 0.0], [-50.0, -600.0, 1000.0]],
        [[50.0, -1650.0, 0.0], [1000.0, -600.0, 1000.0]],
        [[-1000.0, 600.0, 0.0], [-50.0, 1650.0, 1000.0]],
        [[1000.0, 600.0, 0.0], [50.0, 1650.0, 1000.0]],
    ],
    np.float32,
)


def subzone_boxes(m: MapData):
    """[8, 3] mins / maxs / rot: sub-zones 0-1 are map zones 1-2
    (level_gen.cpp:283-289), 2-7 are hardcoded."""
    mins = jnp.concatenate(
        [m.zone_min[1:3], jnp.asarray(HARDCODED_SUBZONES[:, 0])], axis=0
    )
    maxs = jnp.concatenate(
        [m.zone_max[1:3], jnp.asarray(HARDCODED_SUBZONES[:, 1])], axis=0
    )
    rots = jnp.concatenate(
        [m.zone_rot[1:3], jnp.zeros((6,), jnp.float32)], axis=0
    )
    return mins, maxs, rots


def agent_subzone_idx(cfg: EnvConfig, state: WorldState) -> jax.Array:
    """Per-agent sub-zone assignment = clamped policy id
    (sim.cpp:1996-1998)."""
    return jnp.clip(state.policy_idx, 0, NUM_SUBZONES - 1)


def subzone_system(cfg: EnvConfig, m: MapData, state: WorldState) -> WorldState:
    """Per-sub-zone membership + contested/controlling state machine
    (subzoneSystem, sim.cpp:1978-2043)."""
    A = cfg.num_agents
    teams = jnp.arange(A, dtype=jnp.int32) // cfg.team_size
    mins, maxs, rots = subzone_boxes(m)

    assign = agent_subzone_idx(cfg, state)  # [A]
    pos = state.pos + jnp.array([0.0, 0.0, consts.stand_height / 2.0])

    # membership of each agent in ITS assigned sub-zone (rotated frame)
    rot_a = rots[assign]  # [A]
    p_zf = jax.vmap(geom.rotate_z)(pos, -rot_a)
    mn_zf = jax.vmap(geom.rotate_z)(mins[assign], -rot_a)
    mx_zf = jax.vmap(geom.rotate_z)(maxs[assign], -rot_a)
    inside = jnp.all((p_zf >= mn_zf) & (p_zf <= mx_zf), axis=-1)
    inside = inside & (state.alive > 0.0)

    min_dist = jnp.where(inside, 0.0, state.min_dist_subzone)

    # per-sub-zone team member counts
    onehot = jax.nn.one_hot(assign, NUM_SUBZONES, dtype=jnp.float32)
    w = inside.astype(jnp.float32)[:, None] * onehot  # [A, S]
    num_a = jnp.sum(jnp.where((teams == 0)[:, None], w, 0.0), axis=0)
    num_b = jnp.sum(jnp.where((teams == 1)[:, None], w, 0.0), axis=0)

    contested = (num_a > 0) & (num_b > 0)
    empty = (num_a == 0) & (num_b == 0)
    prev_ctrl = state.subzone_ctrl

    ctrl = jnp.where(
        contested | empty,
        jnp.where(contested | empty, -1, prev_ctrl),
        jnp.where(num_a > 0, 0, 1),
    )
    # keep previous controller only while they still match
    ctrl = jnp.where(contested, -1, ctrl)
    ctrl = jnp.where(empty, -1, ctrl)

    return state.replace(
        in_subzone=inside,
        min_dist_subzone=min_dist,
        subzone_ctrl=ctrl.astype(jnp.int32),
        subzone_contested=contested,
    )


def subzone_reward_system(cfg: EnvConfig, m: MapData,
                          state: WorldState) -> WorldState:
    """subzoneRewardSystem (sim.cpp:3734-3847): breadcrumb penalty, -0.5
    wasted reload, +3 kill, +-shotScale, -1.5 death, explore bonus, in-zone
    bonus, shaped approach to the agent's sub-zone (10x before first death),
    +-zoneTeamCtrlScale while controlled."""
    A = cfg.num_agents
    teams = jnp.arange(A, dtype=jnp.int32) // cfg.team_size
    rc = state.reward_coefs
    mins, maxs, rots = subzone_boxes(m)
    assign = agent_subzone_idx(cfg, state)

    r = -rc[:, cfgmod.RC_BREADCRUMB_SCALE] * state.crumb_total_penalty
    r = r - 0.5 * state.reloaded_full_mag.astype(jnp.float32)
    r = r + 3.0 * state.successful_kill.astype(jnp.float32)
    landed = (state.landed_shot_on >= 0).astype(jnp.float32)
    r = r + rc[:, cfgmod.RC_SHOT_SCALE] * landed
    r = r - 1.5 * state.was_killed.astype(jnp.float32)
    r = r - rc[:, cfgmod.RC_SHOT_SCALE] * (
        state.was_shot_count > 0
    ).astype(jnp.float32)
    r = r + state.new_cells.astype(jnp.float32) * rc[:, cfgmod.RC_EXPLORE_SCALE]

    # in-zone bonus or shaped approach
    center = 0.5 * (mins[assign] + maxs[assign])
    dist = jnp.linalg.norm(center - state.pos, axis=-1)
    closer = dist < state.min_dist_subzone
    dist_scale = rc[:, cfgmod.RC_ZONE_DIST_SCALE] * jnp.where(
        state.has_died, 1.0, 10.0
    )
    approach = jnp.where(
        (~state.in_subzone) & closer,
        dist_scale * (state.min_dist_subzone - dist),
        0.0,
    )
    r = r + jnp.where(state.in_subzone, rc[:, cfgmod.RC_IN_ZONE_SCALE], approach)
    new_min = jnp.where(
        (~state.in_subzone) & closer, dist, state.min_dist_subzone
    )

    # control bonus/penalty for the agent's assigned sub-zone
    ctrl = state.subzone_ctrl[assign]
    r = r + jnp.where(
        ctrl == -1,
        0.0,
        jnp.where(
            ctrl == teams,
            rc[:, cfgmod.RC_ZONE_TEAM_CTRL_SCALE],
            -rc[:, cfgmod.RC_ZONE_TEAM_CTRL_SCALE],
        ),
    )

    dead = state.alive == 0.0
    state = state.replace(
        successful_kill=jnp.where(dead, False, state.successful_kill),
        landed_shot_on=jnp.where(dead, -1, state.landed_shot_on),
        was_killed=jnp.where(dead, False, state.was_killed),
        was_shot_count=jnp.where(dead, 0, state.was_shot_count),
        fired_shot_t=jnp.where(dead, -jnp.inf, state.fired_shot_t),
        min_dist_subzone=new_min,
        new_cells=jnp.zeros_like(state.new_cells),
    )

    # team-spirit blend as in the main path (pvpFinalRewardSystem)
    team_sum = jnp.zeros((2,)).at[teams].add(r)
    team_count = jnp.zeros((2,)).at[teams].add(1.0)
    team_mean = team_sum / jnp.maximum(team_count, 1.0)
    spirit = rc[:, cfgmod.RC_TEAM_SPIRIT]
    blended = r * (1.0 - spirit) + team_mean[teams] * spirit

    return state.replace(reward=blended, team_rewards=team_mean)
