"""Combat: hitscan fire, damage application, autoheal.

fireSystem (reference src/sim.cpp:1443-1615): reload handling, Box-Muller
recoil with upward bias, one hitscan ray against world geometry + all agent
capsules, friendly-fire / respawn-invincibility rejection, per-attacker-slot
damage writes. Runs for all agents in parallel (damage slots keyed by
attacker offset make the scatter race-free, exactly like the reference's
parallel-for semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import consts
from ..config import EnvConfig
from ..assets.map_data import MapData
from ..ops import geom
from ..ops.raycast import ray_vs_capsules, ray_vs_tris
from .types import Actions, Pose, WorldState

INF = jnp.inf


def view_height(stand_cur):
    """viewHeight (reference src/utils.hpp:36-57): standing height minus the
    cap radius of the capsule per pose."""
    top = jnp.where(
        stand_cur == Pose.Crouch,
        consts.crouch_height,
        jnp.where(stand_cur == Pose.Prone, consts.prone_height, consts.stand_height),
    )
    return top - consts.agent_radius


def trace_shot_rays(m: MapData, o, d, pos, alive):
    """Hitscan: world tris + all agent capsules (traceRayAgainstWorld,
    utils.cpp:10-72). Returns (t, hit_agent) with hit_agent = -1 for a wall
    or miss; t = inf on total miss."""
    t_world = ray_vs_tris(o, d, m.tris)
    mask = alive > 0.0
    t_caps = ray_vs_capsules(
        o,
        d,
        pos,
        consts.agent_radius,
        consts.stand_height - 2.0 * consts.agent_radius,
        mask,
    )  # [..., A]
    t_cap_min = jnp.min(t_caps, axis=-1)
    cap_idx = jnp.argmin(t_caps, axis=-1)
    cap_hit = t_cap_min < t_world
    t = jnp.minimum(t_world, t_cap_min)
    hit_agent = jnp.where(cap_hit, cap_idx, -1)
    return t, hit_agent


def fire_system(
    cfg: EnvConfig,
    m: MapData,
    state: WorldState,
    actions: Actions,
    key: jax.Array,
    cells=None,
):
    A = cfg.num_agents
    team_size = cfg.team_size
    teams = jnp.arange(A, dtype=jnp.int32) // team_size
    offsets = jnp.arange(A, dtype=jnp.int32) % team_size
    alive = state.alive > 0.0

    mag_size = m.weapon_mag_size[state.weapon_type]
    reload_time = m.weapon_reload_time[state.weapon_type]
    dmg_per_bullet = m.weapon_dmg[state.weapon_type]
    accuracy = m.weapon_accuracy[state.weapon_type]

    # --- reload ---
    reloading_now = alive & (actions.fire == 2)
    reloaded_full = reloading_now & (state.mag_bullets == mag_size)
    bullets = jnp.where(reloading_now, mag_size, state.mag_bullets)
    is_reloading = jnp.where(reloading_now, reload_time, state.mag_reloading)

    reload_in_progress = is_reloading > 0
    is_reloading = jnp.where(
        alive & reload_in_progress, is_reloading - 1, is_reloading
    )

    should_fire = (
        alive & (~reload_in_progress) & (bullets > 0) & (actions.fire == 1)
    )
    bullets = jnp.where(should_fire, bullets - 1, bullets)

    # --- recoil (Box-Muller, sim.cpp:1505-1522) ---
    u = jax.random.uniform(
        key, (2, A), minval=jnp.finfo(jnp.float32).tiny, maxval=1.0
    )
    mag = jnp.sqrt(-2.0 * jnp.log(u[0]))
    z1 = mag * jnp.cos(2.0 * consts.pi * u[1])
    z2 = mag * jnp.sin(2.0 * consts.pi * u[1])
    upward_bias = 1.5
    up_delta = jnp.clip((z1 + upward_bias) * accuracy, 0.0, 4.0 * accuracy)
    right_delta = jnp.clip(z2 * accuracy, -4.0 * accuracy, 4.0 * accuracy)

    yaw = jnp.where(should_fire, state.yaw + right_delta, state.yaw)
    pitch = jnp.where(should_fire, state.pitch + up_delta, state.pitch)
    yaw, pitch = geom.compute_aim(yaw, pitch)

    # --- hitscan ---
    fire_from = state.pos + jnp.stack(
        [
            jnp.zeros((A,)),
            jnp.zeros((A,)),
            view_height(state.stand_cur),
        ],
        axis=-1,
    )
    fire_dir, _, _ = geom.aim_vectors(yaw, pitch)

    # NOTE: an agent's own capsule: the ray starts at view height on the
    # capsule axis -> inside own capsule; ray-capsule returns the exit
    # distance which would shadow real hits, so exclude self explicitly.
    self_idx = jnp.arange(A)
    mask_all = state.alive > 0.0
    t_caps = ray_vs_capsules(
        fire_from,
        fire_dir,
        state.pos,
        consts.agent_radius,
        consts.stand_height - 2.0 * consts.agent_radius,
        mask_all,
    )  # [A, A] (shooter, target)
    t_caps = jnp.where(
        self_idx[:, None] == self_idx[None, :], INF, t_caps
    )
    t_world = ray_vs_tris(
        fire_from, fire_dir, m.tris, cells=cells, tables=m.cells
    )
    t_cap_min = jnp.min(t_caps, axis=-1)
    cap_idx = jnp.argmin(t_caps, axis=-1)
    cap_hit = t_cap_min < t_world
    t_hit = jnp.minimum(t_world, t_cap_min)
    hit_agent = jnp.where(cap_hit, cap_idx, -1)

    hit_any = ~jnp.isinf(t_hit)
    fired_shot_t = jnp.where(
        should_fire,
        jnp.where(hit_any, t_hit, jnp.float32(3.4e38)),
        -INF,
    )

    # --- hit validity ---
    victim = hit_agent  # [A]
    victim_valid = should_fire & (victim >= 0)
    v_clamped = jnp.clip(victim, 0, A - 1)
    # one-hot contractions instead of index gathers: XLA TPU gathers
    # serialize (~10 ns/element); A is 12, so the [A, A] masked sums are
    # full-vector work
    v_oh = v_clamped[:, None] == self_idx[None, :]  # [A, A]
    victim_team = jnp.sum(jnp.where(v_oh, teams[None, :], 0), axis=-1)
    same_team = victim_team == teams
    victim_invincible = jnp.sum(
        jnp.where(v_oh, (state.respawn_steps > 0)[None, :], False), axis=-1
    ).astype(bool)
    hit_success = victim_valid & (~same_team) & (~victim_invincible)

    landed_shot_on = jnp.where(hit_success, victim, -1)

    # kill if victim hp <= dmg (pre-damage hp, parallel semantics)
    victim_hp = jnp.sum(jnp.where(v_oh, state.hp[None, :], 0.0), axis=-1)
    successful_kill = hit_success & (victim_hp <= dmg_per_bullet)

    # --- scatter damage into victims' attacker slots ---
    # damage_dealt[victim, attacker_offset] = dmg
    dmg_updates = jnp.zeros_like(state.damage_dealt)
    dmg_updates = dmg_updates.at[v_clamped, offsets].add(
        jnp.where(hit_success, dmg_per_bullet, 0.0)
    )
    damage_dealt = state.damage_dealt + dmg_updates

    return state.replace(
        yaw=yaw,
        pitch=pitch,
        mag_bullets=bullets,
        mag_reloading=is_reloading,
        reloaded_full_mag=reloaded_full,
        fired_shot_t=fired_shot_t,
        landed_shot_on=landed_shot_on,
        successful_kill=successful_kill,
        damage_dealt=damage_dealt,
    ), {
        "reload_event": reloading_now,
        "reload_bullets": state.mag_bullets,
        "shot_event": hit_success,
        "shot_victim": jnp.where(hit_success, victim, -1),
        "kill_event": successful_kill,
    }


def apply_damage_system(cfg: EnvConfig, state: WorldState):
    """applyDmgSystem (sim.cpp:1794-1836)."""
    was_shot_count = jnp.sum(
        (state.damage_dealt > 0.0).astype(jnp.int32), axis=-1
    )
    got_hit = was_shot_count > 0
    autoheal_steps = jnp.where(
        got_hit,
        consts.num_out_of_combat_steps_before_autoheal,
        state.autoheal_steps,
    )
    respawn_steps = jnp.maximum(state.respawn_steps - 1, 0)

    hp = state.hp - jnp.sum(state.damage_dealt, axis=-1)
    dead_now = hp <= 0.0
    was_killed = (state.alive == 1.0) & dead_now
    has_died = state.has_died | was_killed

    hp = jnp.maximum(hp, 0.0)
    alive = jnp.where(dead_now, 0.0, 1.0)
    pos = jnp.where(
        dead_now[:, None], jnp.array([0.0, 0.0, 10000.0]), state.pos
    )
    vel = jnp.where(dead_now[:, None], 0.0, state.vel)

    return state.replace(
        hp=hp,
        alive=alive,
        pos=pos,
        vel=vel,
        was_shot_count=was_shot_count,
        was_killed=was_killed,
        has_died=has_died,
        autoheal_steps=autoheal_steps,
        respawn_steps=respawn_steps,
        damage_dealt=jnp.zeros_like(state.damage_dealt),
    )


def autoheal_system(cfg: EnvConfig, state: WorldState):
    """autoHealSystem (sim.cpp:1875-1890): +5 HP/step after 150 steps out of
    combat."""
    alive = state.alive > 0.0
    heal_ready = alive & (state.autoheal_steps == 0) & (state.hp < 100.0)
    hp = jnp.where(
        heal_ready,
        jnp.minimum(100.0, state.hp + consts.autoheal_amount_per_step),
        state.hp,
    )
    autoheal_steps = jnp.where(
        alive & (state.autoheal_steps > 0),
        state.autoheal_steps - 1,
        state.autoheal_steps,
    )
    return state.replace(hp=hp, autoheal_steps=autoheal_steps)
