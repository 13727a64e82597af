"""Full-team interface: team-level observations / actions / reward / done.

Equivalent of the reference's FullTeamInterface archetype
(src/types.hpp:1040-1152) filled by fullTeamObservationsSystem
(src/sim.cpp:3054-3302) and fullTeamDoneRewardSystem (sim.cpp:4720-4749):
one policy controls a whole team, seeing every teammate/enemy plus a global
zone/match observation. Feature layouts match the reference structs:

common (per player, 14 + team_size floats):
    isValid, id[ts] one-hot, isAlive, globalXYZ (normalized to [0,1]),
    facingYaw/Pitch (normalized), velocityXYZ (raw), stand one-hot[3],
    inZone
players  = common + hp/100, magazine/30, isReloading, timeBeforeAutoheal
enemies  = common + wasHit, firedShot, hasLOS[ts], teamKnowsLocation (LAST —
    the policy reads the mask from [..., -1], jax_full_team_policy.py:179)
last_known_enemies = common (copied when the team knows the location)
global   = teamID one-hot[2], fractionMatchRemaining, zone obs
    (centerXYZ normalized, myControlling, enemyControlling, isContested,
    isCaptured, stepsUntilPoint/20, stepsRemaining/600, zone id one-hot[4])
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .. import consts
from ..config import EnvConfig, Task
from ..assets.map_data import MapData
from .types import WorldState


def _normalized_pos(m: MapData, pos: jax.Array) -> jax.Array:
    lo, hi = m.world_min, m.world_max
    return (pos - lo) / (hi - lo)


def _common_obs(cfg: EnvConfig, m: MapData, state: WorldState, members):
    """Per-member common observation [ts, 14 + ts] for a fixed index set
    ``members`` [ts] (static slice per team)."""
    ts = cfg.team_size
    alive = state.alive[members] > 0.0
    npos = _normalized_pos(m, state.pos[members])
    yaw_n = 0.5 * (state.yaw[members] / consts.pi + 1.0)
    pitch_n = 0.5 * (state.pitch[members] / (0.25 * consts.pi) + 1.0)
    vel = state.vel[members]
    stand = jax.nn.one_hot(state.stand_cur[members], 3)
    in_zone = state.in_zone[members].astype(jnp.float32)

    live = alive[:, None].astype(jnp.float32)
    ob = jnp.concatenate(
        [
            jnp.ones((ts, 1), jnp.float32),  # isValid
            jnp.eye(ts, dtype=jnp.float32),  # id one-hot
            live,  # isAlive
            npos * live,
            yaw_n[:, None] * live,
            pitch_n[:, None] * live,
            vel * live,
            stand * live,
            in_zone[:, None] * live,
        ],
        axis=-1,
    )
    return ob, alive


def full_team_observations_system(
    cfg: EnvConfig,
    m: MapData,
    state: WorldState,
    can_see: jax.Array,  # [A, ts] viewer x opponent-slot visibility
    fwd_lidar: jax.Array,  # [A, 2, 32, 4]
    rear_lidar: jax.Array,  # [A, 2, 8, 4]
) -> Dict[str, jax.Array]:
    """Both teams' full-team observations; leaves lead with the team axis
    [2, ...]."""
    ts = cfg.team_size
    A = cfg.num_agents

    # global observation per team
    frac_remaining = (
        jnp.float32(cfg.episode_len) - state.cur_step.astype(jnp.float32)
    ) / jnp.float32(cfg.episode_len)

    if cfg.task == Task.TDM:
        zone_ob_base = jnp.concatenate(
            [
                jnp.zeros((7,), jnp.float32),
                jnp.array([1.0, 0.0], jnp.float32),
                jnp.zeros((4,), jnp.float32),
            ]
        )
        zone_obs = jnp.stack([zone_ob_base, zone_ob_base])
    else:
        center = 0.5 * (
            m.zone_min[state.zone_cur] + m.zone_max[state.zone_cur]
        )
        ncenter = _normalized_pos(m, center)
        ctrl = state.zone_controlling
        zid = jax.nn.one_hot(state.zone_cur, 4)

        def team_zone(team):
            return jnp.concatenate(
                [
                    ncenter,
                    jnp.array(
                        [
                            jnp.where(ctrl == team, 1.0, 0.0),
                            jnp.where((ctrl != -1) & (ctrl != team), 1.0, 0.0),
                            state.zone_contested.astype(jnp.float32),
                            state.zone_captured.astype(jnp.float32),
                            state.zone_steps_until_point
                            / jnp.float32(consts.zone_point_interval),
                            state.zone_steps_remaining
                            / jnp.float32(consts.num_steps_per_zone),
                        ]
                    ),
                    zid,
                ]
            )

        zone_obs = jnp.stack([team_zone(0), team_zone(1)])

    team_ids = jnp.array([[0.0, 1.0], [1.0, 0.0]], jnp.float32)
    global_ob = jnp.concatenate(
        [
            team_ids,
            jnp.broadcast_to(frac_remaining[None, None], (2, 1)),
            zone_obs,
        ],
        axis=-1,
    )  # [2, 16]

    # per-team member index sets (teams are contiguous agent ranges)
    members = jnp.stack(
        [jnp.arange(ts), jnp.arange(ts) + ts]
    )  # [2, ts]

    players = []
    enemies = []
    last_knowns = []
    fwd = []
    rear = []
    for team in range(2):
        mine = members[team]
        theirs = members[1 - team]

        common_my, alive_my = _common_obs(cfg, m, state, mine)
        common_en, alive_en = _common_obs(cfg, m, state, theirs)
        live_my = alive_my[:, None].astype(jnp.float32)
        live_en = alive_en[:, None].astype(jnp.float32)

        hp = (state.hp[mine] / 100.0)[:, None]
        mag = (state.mag_bullets[mine].astype(jnp.float32) / 30.0)[:, None]
        rel = (state.mag_reloading[mine] > 0).astype(jnp.float32)[:, None]
        heal = (
            state.autoheal_steps[mine].astype(jnp.float32)
            / jnp.float32(consts.num_out_of_combat_steps_before_autoheal)
        )[:, None]
        players.append(
            jnp.concatenate(
                [common_my, hp * live_my, mag * live_my, rel * live_my,
                 heal * live_my],
                axis=-1,
            )
        )

        was_hit = state.was_shot_count[theirs].astype(jnp.float32)[:, None]
        fired = (state.fired_shot_t[theirs] >= 0.0).astype(jnp.float32)[:, None]
        # hasLOS[j]: teammate j of this team sees enemy slot i.
        # can_see rows are viewers; opponent slot i of viewer j (team t) is
        # enemy agent (1-t)*ts + i, so can_see[mine][:, i] is exactly
        # "my member j sees enemy i" -> transpose to [enemy, teammate].
        has_los = can_see[mine].astype(jnp.float32).T  # [ts(enemy), ts(mate)]
        knows = (
            (jnp.sum(has_los, axis=-1) > 0.0) | (fired[:, 0] > 0.0)
        ).astype(jnp.float32)[:, None]
        enemy_ob = jnp.concatenate(
            [common_en, was_hit * live_en, fired * live_en, has_los * live_en,
             knows * live_en],
            axis=-1,
        )
        enemies.append(enemy_ob)

        # last-known: copy of the enemy common ob while known, cleared on
        # death (sim.cpp:3263-3293); persistent across steps
        # lazy reset clear (fuses into the known/cleared selects below)
        prev = jnp.where(state.was_reset, 0.0, state.ft_last_known[team])
        known_now = (knows[:, 0] > 0.0) & alive_en
        cleared = state.was_killed[theirs]
        lk = jnp.where(known_now[:, None], common_en, prev)
        lk = jnp.where(cleared[:, None], 0.0, lk)
        last_knowns.append(lk)

        fwd.append(fwd_lidar[mine])
        rear.append(rear_lidar[mine])

    new_last_known = jnp.stack(last_knowns)
    obs = {
        "full_team_global": global_ob,
        "full_team_players": jnp.stack(players),
        "full_team_enemies": jnp.stack(enemies),
        "full_team_last_known_enemies": new_last_known,
        "full_team_fwd_lidar": jnp.stack(fwd),
        "full_team_rear_lidar": jnp.stack(rear),
    }
    return obs, new_last_known


def full_team_done_reward(cfg: EnvConfig, state: WorldState):
    """fullTeamDoneRewardSystem (sim.cpp:4720-4749): team reward = sum of
    member rewards; done when all members are done."""
    ts = cfg.team_size
    rewards = state.reward.reshape(2, ts).sum(axis=-1)
    done = jnp.all(state.done.reshape(2, ts) != 0, axis=-1).astype(jnp.int32)
    return rewards, done
