"""Reward systems.

zoneRewardSystem (reference src/sim.cpp:3849-3996), tdmRewardSystem
(sim.cpp:3599-3705), zoneCaptureDefendRewardSystem (sim.cpp:4089-4209),
flankRewardSystem (sim.cpp:4211-4290), learnShootingRewardSystem
(sim.cpp:3707-3733), then pvpTeamRewardSystem (per-team mean,
sim.cpp:4292-4313) and pvpFinalRewardSystem (team-spirit blend,
sim.cpp:4315-4339).

Reward coefficients come from the per-agent reward_coefs tensor
(RewardHyperParams, types.hpp:254-264; PBT-explorable).
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import config as cfgmod
from ..config import EnvConfig, RewardMode, Task
from ..assets.map_data import MapData
from .types import WorldCurriculum, WorldState


def _learn_shooting_reward(state: WorldState):
    r = jnp.zeros_like(state.reward)
    landed = state.landed_shot_on >= 0
    fired = state.fired_shot_t >= 0.0
    r = r + jnp.where(landed, 0.5, jnp.where(fired, -0.05, 0.0))
    r = r - jnp.where(state.reloaded_full_mag, 0.5, 0.0)
    return r


def _common_combat_reward(state: WorldState, rc, kill_reward, death_penalty,
                          reload_penalty):
    """Shared structure of the PvP reward systems."""
    r = -rc[:, cfgmod.RC_BREADCRUMB_SCALE] * state.crumb_total_penalty
    r = r - jnp.where(state.reloaded_full_mag, reload_penalty, 0.0)
    r = r + jnp.where(state.successful_kill, kill_reward, 0.0)
    r = r + jnp.where(
        state.landed_shot_on >= 0, rc[:, cfgmod.RC_SHOT_SCALE], 0.0
    )
    r = r - jnp.where(state.was_killed, death_penalty, 0.0)
    r = r - jnp.where(
        state.was_shot_count > 0, rc[:, cfgmod.RC_SHOT_SCALE], 0.0
    )
    r = r + state.new_cells.astype(jnp.float32) * rc[:, cfgmod.RC_EXPLORE_SCALE]
    return r


def _zone_ctrl_reward(state: WorldState, rc, teams, with_point=True,
                      penalize_other=True):
    ctrl = state.zone_controlling
    mine = ctrl == teams
    other = (ctrl != -1) & (~mine)
    r = jnp.where(mine, rc[:, cfgmod.RC_ZONE_TEAM_CTRL_SCALE], 0.0)
    if with_point:
        r = r + jnp.where(
            mine & state.zone_earned_point,
            rc[:, cfgmod.RC_ZONE_EARNED_POINT_SCALE],
            0.0,
        )
    if penalize_other:
        r = r - jnp.where(other, rc[:, cfgmod.RC_ZONE_TEAM_CTRL_SCALE], 0.0)
        if with_point:
            r = r - jnp.where(
                other & state.zone_earned_point,
                rc[:, cfgmod.RC_ZONE_EARNED_POINT_SCALE],
                0.0,
            )
    return r


def _zone_approach(state: WorldState, m: MapData, rc, enable_reward=True):
    """Shaped approach-to-zone: reward closing min-distance (10x before the
    agent's first death). Updates min_dist_to_zone. Returns (reward, new_min)."""
    zone_center = 0.5 * (m.zone_min[state.zone_cur] + m.zone_max[state.zone_cur])
    dist = jnp.linalg.norm(state.pos - zone_center, axis=-1)
    closer = (~state.in_zone) & (dist < state.min_dist_to_zone)
    scale = rc[:, cfgmod.RC_ZONE_DIST_SCALE] * jnp.where(
        state.has_died, 1.0, 10.0
    )
    r = jnp.where(
        closer & enable_reward, scale * (state.min_dist_to_zone - dist), 0.0
    )
    new_min = jnp.where(closer, dist, state.min_dist_to_zone)
    return r, new_min


def _team_spread_bonus(cfg: EnvConfig, m: MapData, state: WorldState, teams):
    """Team-area bonus (sim.cpp:3969-3995): sum |cross| over consecutive
    teammate pairs relative to self, normalized by world area."""
    A = cfg.num_agents
    ts = cfg.team_size
    # teammate list of agent i: agents on same team, excluding i, in index
    # order. Consecutive pairs (j, j+1) of that list.
    pos_xy = state.pos[:, :2]
    team_mat = teams[:, None] == teams[None, :]
    not_self = ~jnp.eye(A, dtype=bool)
    # build per-agent teammate ordering [A, ts-1]
    order = jnp.argsort(
        jnp.where(team_mat & not_self, jnp.arange(A)[None, :], A), axis=-1
    )[:, : ts - 1]
    t_pos = pos_xy[order]  # [A, ts-1, 2]
    e = t_pos - pos_xy[:, None, :]
    # pairs over i < num_teammates - 1 where num_teammates = ts - 1
    e1 = e[:, :-1, :]
    e2 = e[:, 1:, :]
    cross = jnp.abs(e1[..., 0] * e2[..., 1] - e1[..., 1] * e2[..., 0])
    poly2x = jnp.sum(cross, axis=-1)
    diff = m.world_max[:2] - m.world_min[:2]
    bounds_area = diff[0] * diff[1]
    return poly2x / (2.0 * bounds_area) * 1e-2


def flank_fresh_los(cfg: EnvConfig) -> bool:
    return cfg.task == Task.Zone and cfg.reward_mode == RewardMode.Flank


def refresh_flank_los(cfg: EnvConfig, m: MapData, state: WorldState):
    """flankRewardSystem raycasts LOS with CURRENT (post-movement)
    positions inside the reward system (reference src/sim.cpp:4228-4267).
    Recompute this step's visibility table here and write it into the
    prev_* slots the Flank reward branch reads, so the reward is same-step
    fresh. The observation tail recomputes and overwrites these fields
    after the reset as before, so the scripted bot and next step's
    observations keep their existing semantics."""
    from . import observations

    vis, _ = observations.visibility_system(cfg, m, state)
    ts = cfg.team_size
    return state.replace(
        prev_can_see=vis[:, :ts], prev_teammate_vis=vis[:, ts:]
    )


def reward_system(cfg: EnvConfig, m: MapData, state: WorldState) -> WorldState:
    A = cfg.num_agents
    teams = jnp.arange(A, dtype=jnp.int32) // cfg.team_size
    rc = state.reward_coefs
    dead = state.alive == 0.0

    # sub-zone reward variant replaces the task reward when enabled
    # (subzoneRewardSystem dispatch, sim.cpp:5715-5735)
    if cfg.has_flag(cfgmod.SimFlags.SubZones):
        from .subzones import subzone_reward_system

        return subzone_reward_system(cfg, m, state)

    if cfg.task == Task.Zone and cfg.reward_mode == RewardMode.Default:
        r = _common_combat_reward(state, rc, 1.0, 1.5, 0.5)
        approach, new_min = _zone_approach(state, m, rc)
        r = r + jnp.where(state.in_zone, rc[:, cfgmod.RC_IN_ZONE_SCALE], 0.0)
        r = r + approach
        r = r + _zone_ctrl_reward(state, rc, teams)
        r = r + jnp.where(dead, 0.0, _team_spread_bonus(cfg, m, state, teams))
    elif cfg.task == Task.TDM:
        r = _common_combat_reward(state, rc, 1.0, 1.0, 0.01)
        new_min = state.min_dist_to_zone
        # imitation-goal shaping (sim.cpp:3628-3639) requires TDMEpisode
        # data, which the reference never loads in this snapshot
        # (mgr.cpp:1343-1345); omitted until episode data exists.
    elif cfg.task == Task.ZoneCaptureDefend:
        r = _common_combat_reward(state, rc, 1.0, 1.0, 0.01)
        # note: ZCD uses reload_penalty 0.01 and no breadcrumb term in the
        # reference; re-add breadcrumb correction:
        r = r + rc[:, cfgmod.RC_BREADCRUMB_SCALE] * state.crumb_total_penalty
        r = r + 0.02 * state.goal_team_rewards[jnp.clip(teams, 0, 1)]
        _, new_min = _zone_approach(state, m, rc, enable_reward=False)
        r = r + _zone_ctrl_reward(state, rc, teams, penalize_other=False)
        # terminal win/lose bonus (sim.cpp:4188-4198)
        win = state.win_result
        terminal = jnp.where(
            win == 2,
            -5.0,
            jnp.where(win == teams, 20.0, -20.0),
        )
        r = r + jnp.where(state.is_finished, terminal, 0.0)
    elif cfg.task == Task.Zone and cfg.reward_mode == RewardMode.Flank:
        # flankRewardSystem (sim.cpp:4211-4290). The reference raycasts LOS
        # inside the reward system with current positions; step_world_core
        # calls refresh_flank_los right before this system so the
        # prev_teammate_vis / prev_can_see slots hold THIS step's
        # post-movement visibility (same-step fresh, closing the round-4
        # staleness deviation). Documented remaining deviation: the
        # opponent-positioning term uses each opponent's own frustum for
        # its view of the agent, where the reference passes the agent's
        # aim to isAgentVisible from the opponent's position
        # (sim.cpp:4250-4261) — an apparent argument-reuse quirk.
        ts = cfg.team_size
        r = jnp.zeros((A,))
        new_min = state.min_dist_to_zone

        # teammate positioning (+0.001 per teammate that is >=100 away OR
        # not visible; sim.cpp:4228-4246)
        own_idx = teams[:, None] * ts + jnp.arange(ts)[None, :]  # [A, ts]
        not_self = own_idx != jnp.arange(A)[:, None]
        d = state.pos[own_idx] - state.pos[:, None, :]  # [A, ts, 3]
        dist2 = jnp.sum(d * d, axis=-1)
        flank_dist = 100.0
        spread_ok = (dist2 >= flank_dist * flank_dist) | (
            ~state.prev_teammate_vis
        )
        r = r + 0.001 * jnp.sum(not_self & spread_ok, axis=-1)

        # opponent positioning (+0.001 per opponent that cannot see the
        # agent; sim.cpp:4250-4267). Uses the opponent's own prev-step
        # visibility row: opponent o's slot table lists my team in index
        # order, so my slot there is my team offset.
        opp_idx = (1 - teams[:, None]) * ts + jnp.arange(ts)[None, :]
        offs = jnp.arange(A, dtype=jnp.int32) % ts
        opp_sees_me = state.prev_can_see[opp_idx, offs[:, None]]  # [A, ts]
        r = r + 0.001 * jnp.sum(~opp_sees_me, axis=-1)

        # behind-shot bonus (sim.cpp:4269-4283)
        tgt = state.landed_shot_on
        tgt_c = jnp.clip(tgt, 0, A - 1)
        yaw_diff = jnp.abs(state.yaw[tgt_c] - state.yaw)
        behind = yaw_diff > jnp.pi
        r = r + jnp.where(
            (tgt >= 0) & behind,
            jnp.where(state.successful_kill, 1.0, 0.2),
            0.0,
        )
        r = r + state.new_cells.astype(jnp.float32) * rc[:, cfgmod.RC_EXPLORE_SCALE]
    elif cfg.task == Task.Turret:
        # turretRewardSystem (sim.cpp:4341-4394) — computed in sim/turret.py
        # (no team-spirit blend; turret rows get 0)
        from .turret import turret_reward_system

        return turret_reward_system(cfg, state)
    elif cfg.task == Task.Explore:
        # exploreRewardSystem (sim.cpp:3538-3551): +0.05/new cell, else
        # -0.005 (no team terms)
        new_cells = state.new_cells.astype(jnp.float32)
        r = jnp.where(new_cells > 0, 0.05 * new_cells, -0.005)
        return state.replace(
            reward=r, new_cells=jnp.zeros_like(state.new_cells)
        )
    else:
        r = jnp.zeros((A,))
        new_min = state.min_dist_to_zone

    # LearnShooting curriculum replaces the task reward entirely
    ls = state.world_curriculum == WorldCurriculum.LearnShooting
    if cfg.has_flag(cfgmod.SimFlags.EnableCurriculum):
        r = jnp.where(ls, _learn_shooting_reward(state), r)
        new_min = jnp.where(ls, state.min_dist_to_zone, new_min)

    # explore counter always resets after consumption
    new_cells = jnp.zeros_like(state.new_cells)

    # dead agents: clear transient combat flags (affects obs downstream,
    # sim.cpp:3959-3967)
    state = state.replace(
        successful_kill=jnp.where(dead, False, state.successful_kill),
        landed_shot_on=jnp.where(dead, -1, state.landed_shot_on),
        was_killed=jnp.where(dead, False, state.was_killed),
        was_shot_count=jnp.where(dead, 0, state.was_shot_count),
        fired_shot_t=jnp.where(dead, -jnp.inf, state.fired_shot_t),
        min_dist_to_zone=new_min,
        new_cells=new_cells,
    )

    # --- team mean + team-spirit blend ---
    team_sum = jnp.zeros((2,)).at[teams].add(r)
    team_count = jnp.zeros((2,)).at[teams].add(1.0)
    team_mean = team_sum / jnp.maximum(team_count, 1.0)

    spirit = rc[:, cfgmod.RC_TEAM_SPIRIT]
    blended = r * (1.0 - spirit) + team_mean[teams] * spirit

    return state.replace(reward=blended, team_rewards=team_mean)
