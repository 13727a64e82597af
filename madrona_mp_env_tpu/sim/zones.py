"""Zone state machine + match scoring.

zoneSystem (reference src/sim.cpp:1892-1976): zone rotation every 600
controlled steps, membership in the rotated-AABB frame, contested/controlling
logic. zoneMatchInfoSystem (sim.cpp:4470-4673): step counter, kill tally,
point scoring every 20 controlled steps, win at 125 points,
ZoneCaptureDefend win conditions, zone stats.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import consts
from ..config import EnvConfig, Task
from ..assets.map_data import MapData
from ..ops import geom
from .types import WorldState

# zone_stats columns
ZS_SWAPS = 0
ZS_CAP_A = 1
ZS_CAP_B = 2
ZS_CONTESTED = 3
ZS_ACTIVE = 4


def _zone_membership(m: MapData, zone_idx, pos, z_lift=consts.stand_height / 2.0):
    """Per-agent membership of the rotated zone AABB (sim.cpp:1920-1953)."""
    rot = m.zone_rot[zone_idx]
    zmin = geom.rotate_z(m.zone_min[zone_idx], -rot)
    zmax = geom.rotate_z(m.zone_max[zone_idx], -rot)
    p = pos + jnp.array([0.0, 0.0, z_lift])
    p_f = geom.rotate_z(p, -rot)
    return jnp.all((p_f >= zmin) & (p_f <= zmax), axis=-1)


def zone_system(cfg: EnvConfig, m: MapData, state: WorldState):
    A = cfg.num_agents
    teams = jnp.arange(A, dtype=jnp.int32) // cfg.team_size

    steps_remaining = state.zone_steps_remaining - jnp.where(
        state.zone_controlling != -1, 1, 0
    )

    rotate = steps_remaining == 0
    new_zone = jnp.where(
        state.zone_cur + 1 == m.num_zones, 0, state.zone_cur + 1
    )
    zone_cur = jnp.where(rotate, new_zone, state.zone_cur)
    zone_captured = jnp.where(rotate, False, state.zone_captured)
    steps_remaining = jnp.where(
        rotate, consts.num_steps_per_zone, steps_remaining
    )
    steps_until_point = jnp.where(
        rotate, consts.zone_point_interval, state.zone_steps_until_point
    )

    # on rotation, reset each agent's min dist to the new zone center
    zone_center = 0.5 * (m.zone_min[zone_cur] + m.zone_max[zone_cur])
    dist_center = jnp.linalg.norm(state.pos - zone_center, axis=-1)
    min_dist_to_zone = jnp.where(
        rotate, dist_center, state.min_dist_to_zone
    )

    in_zone = _zone_membership(m, zone_cur, state.pos)

    num_a = jnp.sum((in_zone & (teams == 0)).astype(jnp.int32))
    num_b = jnp.sum((in_zone & (teams == 1)).astype(jnp.int32))

    steps_until_point = steps_until_point - 1
    contested = (num_a > 0) & (num_b > 0)
    nobody = (num_a == 0) & (num_b == 0)

    controlling = state.zone_controlling
    captured = zone_captured

    # contested or empty -> no controller
    reset_ctrl = contested | nobody
    # sole team present and different from current controller -> take over
    a_takes = (num_a > 0) & (num_b == 0) & (controlling != 0)
    b_takes = (num_b > 0) & (num_a == 0) & (controlling != 1)

    new_controlling = jnp.where(
        reset_ctrl, -1, jnp.where(a_takes, 0, jnp.where(b_takes, 1, controlling))
    )
    changed = reset_ctrl | a_takes | b_takes
    captured = jnp.where(changed, False, captured)
    steps_until_point = jnp.where(
        changed, consts.zone_point_interval, steps_until_point
    )

    return state.replace(
        zone_cur=zone_cur,
        zone_controlling=new_controlling,
        zone_contested=contested,
        zone_captured=captured,
        zone_steps_remaining=steps_remaining,
        zone_steps_until_point=steps_until_point,
        in_zone=in_zone,
        min_dist_to_zone=min_dist_to_zone,
    )


def zone_match_info_system(cfg: EnvConfig, m: MapData, state: WorldState, force_reset):
    """zoneMatchInfoSystem (sim.cpp:4470-4673)."""
    A = cfg.num_agents
    teams = jnp.arange(A, dtype=jnp.int32) // cfg.team_size

    cur_step = state.cur_step + 1
    match_finished = (cur_step >= cfg.episode_len) | force_reset

    # reset per-match tallies on the first step
    first = cur_step == 1
    team_kills = jnp.where(first, 0, state.team_kills)
    team_points = jnp.where(first, 0, state.team_points)
    win_result = jnp.where(first, -1, state.win_result)

    # kill tally from victim perspective (sim.cpp:4502-4506)
    kills_on_team = jnp.stack(
        [
            jnp.sum((state.was_killed & (teams == 1)).astype(jnp.int32)),
            jnp.sum((state.was_killed & (teams == 0)).astype(jnp.int32)),
        ]
    )
    team_kills = team_kills + kills_on_team

    # point scoring
    earned = state.zone_steps_until_point == 0
    steps_until_point = jnp.where(
        earned, consts.zone_point_interval, state.zone_steps_until_point
    )
    new_captured = earned & (~state.zone_captured)
    zone_captured = state.zone_captured | earned

    ctrl = jnp.clip(state.zone_controlling, 0, 1)
    team_points = team_points + jnp.where(
        earned, jnp.eye(2, dtype=jnp.int32)[ctrl], 0
    )

    match_finished = match_finished | jnp.any(
        team_points >= consts.zone_win_points
    )

    # ZoneCaptureDefend win conditions (sim.cpp:4534-4571)
    if cfg.task == Task.ZoneCaptureDefend:
        attacker = jnp.where(state.team_a == 1, 1, 0)
        defender = 1 - attacker
        att_win = team_points[attacker] == 1
        def_win = team_points[defender] == 8
        team_all_died = jnp.stack(
            [
                jnp.all(jnp.where(teams == 0, state.has_died, True)),
                jnp.all(jnp.where(teams == 1, state.has_died, True)),
            ]
        )
        att_all_died = team_all_died[attacker]
        match_finished = match_finished | att_win | def_win | att_all_died

    # zone stats accounting (sim.cpp:4573-4589)
    zs = state.zone_stats
    zi = state.zone_cur
    zs = zs.at[zi, ZS_ACTIVE].add(1)
    zs = zs.at[zi, ZS_CAP_A + ctrl].add(
        jnp.where(zone_captured, 1, 0)
    )
    zs = zs.at[zi, ZS_CONTESTED].add(jnp.where(state.zone_contested, 1, 0))
    zs = zs.at[zi, ZS_SWAPS].add(jnp.where(new_captured, 1, 0))

    # final result (sim.cpp:4637-4669)
    if cfg.task == Task.ZoneCaptureDefend:
        attacker = jnp.where(state.team_a == 1, 1, 0)
        defender = 1 - attacker
        att_win = team_points[attacker] == 1
        def_win = (team_points[defender] == 8) | team_all_died[attacker]
        result = jnp.where(
            att_win, attacker, jnp.where(def_win, defender, 2)
        )
    else:
        result = jnp.where(
            team_points[0] > team_points[1],
            0,
            jnp.where(team_points[1] > team_points[0], 1, 2),
        )
    win_result = jnp.where(match_finished, result, win_result)
    # stats reset happens at episode reset (reset.py) — the reference copies
    # zoneStats into MatchResult then clears; we keep them in state and the
    # Env surfaces them in episode_results.

    return state.replace(
        cur_step=cur_step,
        is_finished=match_finished,
        team_kills=team_kills,
        team_points=team_points,
        win_result=win_result,
        zone_captured=zone_captured,
        zone_earned_point=earned,
        zone_steps_until_point=steps_until_point,
        zone_stats=zs,
    ), new_captured


def tdm_match_info_system(cfg: EnvConfig, state: WorldState, force_reset):
    """tdmMatchInfoSystem + updateTDMMatchResultsSystem (sim.cpp:4396-4467)."""
    A = cfg.num_agents
    teams = jnp.arange(A, dtype=jnp.int32) // cfg.team_size

    team_alive = jnp.stack(
        [
            jnp.any((state.alive > 0.0) & (teams == 0)),
            jnp.any((state.alive > 0.0) & (teams == 1)),
        ]
    )
    cur_step = state.cur_step + 1
    match_finished = (
        (~team_alive[0]) | (~team_alive[1]) | (cur_step >= cfg.episode_len)
        | force_reset
    )

    first = cur_step == 1
    team_kills = jnp.where(first, 0, state.team_kills)
    team_points = jnp.where(first, 0, state.team_points)
    win_result = jnp.where(first, -1, state.win_result)

    kills_on_team = jnp.stack(
        [
            jnp.sum((state.was_killed & (teams == 1)).astype(jnp.int32)),
            jnp.sum((state.was_killed & (teams == 0)).astype(jnp.int32)),
        ]
    )
    team_kills = team_kills + kills_on_team

    result = jnp.where(
        team_kills[0] > team_kills[1],
        0,
        jnp.where(team_kills[1] > team_kills[0], 1, 2),
    )
    win_result = jnp.where(match_finished, result, win_result)

    return state.replace(
        cur_step=cur_step,
        is_finished=match_finished,
        team_kills=team_kills,
        team_points=team_points,
        win_result=win_result,
        zone_earned_point=jnp.zeros((), bool),
    ), jnp.zeros((), bool)
