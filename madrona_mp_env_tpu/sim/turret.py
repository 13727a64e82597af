"""Turret task: scripted auto-aim turrets as the opposing team.

The reference gives the Turret task (Task::Turret) a set of static turret
entities that auto-acquire the closest visible agent, slew their aim at a
capped turn rate, and fire with fixed accuracy (turretFireSystem,
reference src/sim.cpp:1617-1792; creation level_gen.cpp:250-266; reset at
navmesh sample points level_gen.cpp:449-470; match end
turretMatchInfoSystem sim.cpp:4675-4708; reward turretRewardSystem
sim.cpp:4341-4394).

TPU-native design: turrets ARE the second team's agent rows (frozen in
place by the movement system, driven by this auto-aim controller, firing
through the regular fire system with a dedicated turret weapon type) — so
every downstream system (visibility, observations, lidar, damage) treats
them like any other agent with zero special cases.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import consts
from ..config import EnvConfig, Task
from ..assets.map_data import MapData
from ..ops import geom
from ..ops.raycast import ray_vs_tris
from .combat import view_height
from .types import Actions, WorldState

# turretFireSystem constants (sim.cpp:1634-1637, 1755)
TURRET_ACCURACY = 0.15
# max_aim_turn = discreteTurnDelta() * (numTurnBuckets / 2) * deltaT
# (sim.cpp:1635-1637)
MAX_AIM_TURN = (
    consts.discrete_turn_delta * (consts.num_turn_buckets // 2) * consts.delta_t
)


def turret_mask(cfg: EnvConfig) -> jax.Array:
    """Static per-agent mask: True for turret rows (team 1 in Turret task)."""
    A = cfg.num_agents
    if cfg.task != Task.Turret:
        return jnp.zeros((A,), bool)
    teams = jnp.arange(A) // cfg.team_size
    return teams == 1


def turret_ai_system(
    cfg: EnvConfig, m: MapData, state: WorldState, actions: Actions
) -> Actions:
    """Overwrite turret rows' actions with the auto-aim controller
    (turretFireSystem targeting/slew logic, sim.cpp:1638-1745):
    pick the most-aligned (then closest) visible agent, slew yaw/pitch at
    <= MAX_AIM_TURN per step, fire when centered, reload when empty."""
    if cfg.task != Task.Turret:
        return actions

    A = cfg.num_agents
    ts = cfg.team_size
    is_turret = turret_mask(cfg)

    fire_from = state.pos + jnp.stack(
        [
            jnp.zeros((A,)),
            jnp.zeros((A,)),
            jnp.full((A,), consts.stand_height - consts.agent_radius),
        ],
        axis=-1,
    )
    fwd, _, _ = geom.aim_vectors(state.yaw, state.pitch)

    # candidate targets: the agent team's rows (first ts rows), sampled at
    # eye height (single LOS sample vs the reference's 4-point
    # isAgentVisible — the capsule-top sample, which dominates visibility)
    tgt_pos = state.pos[:ts] + jnp.stack(
        [
            jnp.zeros((ts,)),
            jnp.zeros((ts,)),
            view_height(state.stand_cur[:ts]),
        ],
        axis=-1,
    )
    tgt_alive = state.alive[:ts] > 0.0

    to_tgt = tgt_pos[None, :, :] - fire_from[:, None, :]  # [A, ts, 3]
    dist = jnp.linalg.norm(to_tgt, axis=-1)
    to_tgt_n = to_tgt / jnp.maximum(dist[..., None], 1e-9)

    # occlusion: LOS ray per (turret, target)
    t_world = ray_vs_tris(
        jnp.broadcast_to(fire_from[:, None, :], to_tgt.shape), to_tgt_n,
        m.tris,
    )
    visible = (t_world >= dist - 1e-3) & tgt_alive[None, :]

    cos_angle = jnp.sum(fwd[:, None, :] * to_tgt_n, axis=-1)
    cos_max = jnp.cos(MAX_AIM_TURN)
    # any angle reachable this frame counts as centered (sim.cpp:1670-1674)
    eff_cos = jnp.where(cos_angle > cos_max, 1.0, cos_angle)
    eff_cos = jnp.where(visible, eff_cos, -jnp.inf)

    # best = max cos, tie-break min dist (sim.cpp:1676-1683)
    score = eff_cos * 1e7 - dist
    best = jnp.argmax(score, axis=-1)  # [A]
    has_tgt = jnp.take_along_axis(visible, best[:, None], axis=1)[:, 0]

    bt = jnp.take_along_axis(to_tgt_n, best[:, None, None], axis=1)[:, 0]
    new_yaw = -jnp.arctan2(bt[:, 0], bt[:, 1])
    new_pitch = jnp.arcsin(jnp.clip(bt[:, 2], -1.0, 1.0))

    yaw_delta = new_yaw - state.yaw
    yaw_delta = jnp.where(yaw_delta > consts.pi, yaw_delta - 2 * consts.pi,
                          yaw_delta)
    yaw_delta = jnp.where(yaw_delta < -consts.pi, yaw_delta + 2 * consts.pi,
                          yaw_delta)
    pitch_delta = new_pitch - state.pitch

    not_centered = (jnp.abs(yaw_delta) > MAX_AIM_TURN) | (
        jnp.abs(pitch_delta) > MAX_AIM_TURN
    )
    yaw_delta = jnp.clip(yaw_delta, -MAX_AIM_TURN, MAX_AIM_TURN)
    pitch_delta = jnp.clip(pitch_delta, -MAX_AIM_TURN, MAX_AIM_TURN)
    yaw_delta = jnp.where(has_tgt, yaw_delta, 0.0)
    pitch_delta = jnp.where(has_tgt, pitch_delta, 0.0)

    # reload when empty (auto, sim.cpp:1728-1732), fire when centered
    reload_now = state.mag_bullets == 0
    reloading = state.mag_reloading > 0
    fire_now = has_tgt & (~not_centered) & (~reloading) & (~reload_now)
    fire_action = jnp.where(reload_now, 2, jnp.where(fire_now, 1, 0))

    def overlay(base, turret_val):
        return jnp.where(is_turret, turret_val, base)

    return actions.replace(
        move_amount=overlay(actions.move_amount, 0),
        move_angle=overlay(actions.move_angle, 0),
        stand=overlay(actions.stand, 0),
        fire=overlay(actions.fire, fire_action.astype(jnp.int32)),
        # continuous aim rates (consumed like the scripted bot's)
        aim_yaw_rate=overlay(
            actions.aim_yaw_rate, yaw_delta / consts.delta_t
        ),
        aim_pitch_rate=overlay(
            actions.aim_pitch_rate, pitch_delta / consts.delta_t
        ),
        aim_yaw=overlay(
            actions.aim_yaw, consts.discrete_aim_num_yaw_buckets // 2
        ),
        aim_pitch=overlay(
            actions.aim_pitch, consts.discrete_aim_num_pitch_buckets // 2
        ),
    )


def turret_match_info_system(cfg: EnvConfig, state: WorldState, force_reset):
    """turretMatchInfoSystem (sim.cpp:4675-4708): match ends when every
    agent or every turret is dead, or at episode end."""
    ts = cfg.team_size
    agents_alive = jnp.any(state.alive[:ts] > 0.0)
    turrets_alive = jnp.any(state.alive[ts:] > 0.0)

    cur_step = state.cur_step + 1
    finished = (
        (~agents_alive)
        | (~turrets_alive)
        | (cur_step >= cfg.episode_len)
        | force_reset
    )
    win = jnp.where(
        finished & (~turrets_alive), 0, jnp.where(finished, 1, -1)
    )
    return (
        state.replace(
            cur_step=cur_step,
            is_finished=finished,
            win_result=win.astype(jnp.int32),
        ),
        jnp.zeros((), bool),
    )


def turret_reward_system(cfg: EnvConfig, state: WorldState) -> WorldState:
    """turretRewardSystem (sim.cpp:4341-4394): -0.0075 base, +0.005/new
    explore cell, +1 per team kill, +0.05 per own landed shot (+0.05 per
    teammate landed shot), -1 killed, -0.05 shot. Turret rows get 0."""
    A = cfg.num_agents
    ts = cfg.team_size
    is_turret = turret_mask(cfg)

    new_cells = state.new_cells.astype(jnp.float32)
    landed = (state.landed_shot_on >= 0).astype(jnp.float32)
    kills = state.successful_kill.astype(jnp.float32)

    # team sums over the agent team only
    team_kills = jnp.sum(jnp.where(is_turret, 0.0, kills))
    team_landed_others = jnp.sum(jnp.where(is_turret, 0.0, landed))

    r = (
        -0.0075
        + 0.005 * new_cells
        + team_kills  # own + teammates' kills (sim.cpp:4360-4383)
        + 0.05 * landed
        + 0.05 * (team_landed_others - landed)  # teammates' landed shots
        - 1.0 * state.was_killed.astype(jnp.float32)
        - 0.05 * (state.was_shot_count > 0).astype(jnp.float32)
    )
    r = jnp.where(is_turret, 0.0, r)
    return state.replace(reward=r, new_cells=jnp.zeros_like(state.new_cells))
