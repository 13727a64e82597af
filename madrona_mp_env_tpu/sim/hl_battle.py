"""High-level-move battle: instant-kill auto-combat.

Re-implements hlBattleSystem (reference src/sim.cpp:1346-1441), the combat
variant used when the env runs in high-level movement mode
(TaskConfig.highlevelMove, hooked at sim.cpp:5465-5468 in place of
fireSystem): each agent auto-targets the most-aligned (tie-break: closest)
visible opponent within one frame's aim slew, and deals a lethal 100 damage
— combat collapses to positioning.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import consts
from ..config import EnvConfig
from ..assets.map_data import MapData
from ..ops import geom
from ..ops.raycast import ray_vs_tris
from .combat import view_height
from .types import WorldState

MAX_AIM_TURN = (
    consts.discrete_turn_delta * (consts.num_turn_buckets // 2) * consts.delta_t
)


def hl_battle_system(cfg: EnvConfig, m: MapData, state: WorldState):
    """Auto-target + instant damage; returns (state, fire_events) with the
    same event interface as combat.fire_system."""
    A = cfg.num_agents
    ts = cfg.team_size
    teams = jnp.arange(A, dtype=jnp.int32) // ts
    offsets = jnp.arange(A, dtype=jnp.int32) % ts
    opp_idx = (1 - teams[:, None]) * ts + jnp.arange(ts)[None, :]  # [A, ts]

    alive = state.alive > 0.0
    fire_from = state.pos + jnp.stack(
        [jnp.zeros((A,)), jnp.zeros((A,)), view_height(state.stand_cur)],
        axis=-1,
    )
    fwd, _, _ = geom.aim_vectors(state.yaw, state.pitch)

    tgt_eye = state.pos + jnp.stack(
        [jnp.zeros((A,)), jnp.zeros((A,)), view_height(state.stand_cur)],
        axis=-1,
    )
    tgt_pos = tgt_eye[opp_idx]  # [A, ts, 3]
    to_tgt = tgt_pos - fire_from[:, None, :]
    dist = jnp.linalg.norm(to_tgt, axis=-1)
    to_n = to_tgt / jnp.maximum(dist[..., None], 1e-9)

    t_world = ray_vs_tris(
        jnp.broadcast_to(fire_from[:, None, :], to_tgt.shape), to_n, m.tris
    )
    visible = t_world >= dist - 1e-3
    tgt_alive = alive[opp_idx]
    tgt_invincible = state.respawn_steps[opp_idx] > 0
    candidate = visible & tgt_alive & (~tgt_invincible) & alive[:, None]

    cos_angle = jnp.sum(fwd[:, None, :] * to_n, axis=-1)
    cos_max = jnp.cos(MAX_AIM_TURN)
    eff_cos = jnp.where(cos_angle > cos_max, 1.0, cos_angle)
    # pick only targets reachable within one slew frame AND in front
    eff_cos = jnp.where(candidate & (eff_cos > 0.0), eff_cos, -jnp.inf)

    score = eff_cos * 1e7 - dist
    best = jnp.argmax(score, axis=-1)
    has_tgt = jnp.isfinite(
        jnp.take_along_axis(eff_cos, best[:, None], axis=1)[:, 0]
    )
    victim = jnp.where(
        has_tgt, jnp.take_along_axis(opp_idx, best[:, None], axis=1)[:, 0], -1
    )

    v_clamped = jnp.clip(victim, 0, A - 1)
    landed = victim >= 0
    hit_dist = jnp.take_along_axis(dist, best[:, None], axis=1)[:, 0]

    # lethal damage into the victim's attacker slot (sim.cpp:1437-1440)
    dmg_updates = jnp.zeros_like(state.damage_dealt)
    dmg_updates = dmg_updates.at[v_clamped, offsets].add(
        jnp.where(landed, 100.0, 0.0)
    )

    state = state.replace(
        landed_shot_on=jnp.where(landed, victim, -1),
        successful_kill=landed,
        fired_shot_t=jnp.where(landed, hit_dist, -jnp.inf),
        damage_dealt=state.damage_dealt + dmg_updates,
    )
    events = {
        "reload_event": jnp.zeros((A,), bool),
        "reload_bullets": state.mag_bullets,
        "shot_event": landed,
        "shot_victim": jnp.where(landed, victim, -1),
        "kill_event": landed,
    }
    return state, events
