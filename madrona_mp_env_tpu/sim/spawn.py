"""Agent spawning.

TPU re-design of spawnAgents / standardSpawnPoint (reference
src/utils.cpp:273-948). Spawning is inherently sequential (each spawned
agent affects the next one's spawn scoring and usage-recency table), so it
runs as a lax.scan over the A agents — A is small and static, the body is
pure vector math.

All random draws use fold_in chains (utils/rng.py) rather than the
reference's stateful RNG streams; the structure (which decisions consume
randomness) is preserved, the bitstreams are not.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import consts
from ..config import EnvConfig, SimFlags, Task
from ..assets.map_data import MapData
from ..ops import geom
from .types import Pose, WorldCurriculum, WorldState

_BIG = 1e18

# Hardcoded spawn table (reference src/utils.cpp:503-543): 3 per side.
# numpy at module scope; converted lazily under trace.
import numpy as _np

_HARDCODED_SPAWNS = _np.asarray(
    [
        [510.0, 179.1, -64.0, -2.05],
        [525.8, 17.1, -64.0, -0.80],
        [434.3, 184.7, -64.0, -1.80],
        [1037.2, 449.0, -56.0, 2.37],
        [1094.3, 200.1, -56.0, 1.41],
        [1045.8, 416.8, -56.0, 2.37],
    ],
    _np.float32,
)


def _sample_in_spawn(key, spawn_row):
    """Uniform point + yaw inside a Spawn row [min3, max3, yawMin, yawMax]
    (spawnAgent lambda, utils.cpp:312-338)."""
    u = jax.random.uniform(key, (4,))
    mn = spawn_row[0:3]
    mx = spawn_row[3:6]
    pt = mn + u[:3] * (mx - mn)
    yaw = spawn_row[6] + u[3] * (spawn_row[7] - spawn_row[6])
    return pt, yaw


def _sample_navmesh_point(key, m: MapData):
    """Uniform-by-area navmesh point (madrona::Navmesh::samplePoint)."""
    k1, k2 = jax.random.split(key)
    u = jax.random.uniform(k1, ())
    tri = jnp.searchsorted(m.nav_area_cdf, u)
    tri = jnp.clip(tri, 0, m.nav_area_cdf.shape[0] - 1)
    uv = jax.random.uniform(k2, (2,))
    flip = uv[0] + uv[1] > 1.0
    uv = jnp.where(flip, 1.0 - uv, uv)
    w = 1.0 - uv[0] - uv[1]
    pts = m.nav_verts[m.nav_tri_indices[tri]]  # [3, 3]
    return pts[0] * uv[0] + pts[1] * uv[1] + pts[2] * w


def _init_spawn(key, m: MapData, side, use_middle, cur_step_u32, side_used):
    """Initial spawn with usage-recency retry loop
    (standardSpawnPoint init path, utils.cpp:340-389)."""
    n_def = m.num_default_side_spawns[side]
    n_extra = m.num_extra_side_spawns[side]
    offset = jnp.where(use_middle, n_def, 0)
    count = jnp.where(use_middle, n_extra, n_def)
    count = jnp.maximum(count, 1)

    keys = jax.random.split(key, 7)
    cands = jnp.stack(
        [offset + jax.random.randint(keys[k], (), 0, count) for k in range(6)]
    )
    usage = side_used[side]  # [max_spawns] u32
    valid = usage[cands[:5]] != cur_step_u32
    any_valid = jnp.any(valid)
    first_valid = jnp.argmax(valid)
    chosen = jnp.where(any_valid, cands[first_valid], cands[5])

    spawn_row = m.side_spawns[side, jnp.clip(chosen, 0, m.side_spawns.shape[1] - 1)]
    pt, yaw = _sample_in_spawn(keys[6], spawn_row)

    side_used = side_used.at[side, chosen].set(cur_step_u32)
    return pt, yaw, side_used


def _respawn_spawn(
    key,
    m: MapData,
    agent_idx,
    team,
    teams,
    pos,
    alive,
    zone_center,
    cur_step_u32,
    respawn_used,
):
    """Common-respawn scoring (standardSpawnPoint respawn path,
    utils.cpp:391-479): penalize recently-used spawns, spawns near any agent,
    spawns near opponents, spawns near the active zone."""
    rows = m.common_respawns  # [Nc, 8]
    nc = rows.shape[0]
    centers = 0.5 * (rows[:, 0:3] + rows[:, 3:6])  # [Nc, 3]

    used = respawn_used[:nc]
    used_now = used == cur_step_u32
    elapsed_steps = (cur_step_u32 - used).astype(jnp.float32)
    elapsed = jnp.floor(consts.delta_t * elapsed_steps)
    score = jnp.where(elapsed < 3.0, 0.1 * (3.0 - elapsed), 0.0)

    # distance terms over other alive agents
    d = jnp.linalg.norm(centers[:, None, :] - pos[None, :, :], axis=-1)  # [Nc, A]
    others = alive > 0.0
    others = others & (jnp.arange(pos.shape[0]) != agent_idx)
    near = d < 4.0 * consts.agent_radius
    opp = teams != team
    per_agent = jnp.where(
        near, 100000.0, jnp.where(opp, 0.01 / jnp.maximum(d, 1e-6), 0.0)
    )
    score = score + jnp.sum(jnp.where(others[None, :], per_agent, 0.0), axis=-1)

    dist_zone = jnp.linalg.norm(centers - zone_center, axis=-1)
    score = score + jnp.where(dist_zone < 100.0, 1000000.0, 0.0)

    score = jnp.where(used_now, _BIG, score)

    best = jnp.argmin(score)
    pt, yaw = _sample_in_spawn(key, rows[best])
    respawn_used = respawn_used.at[best].set(cur_step_u32)
    return pt, yaw, respawn_used


class _SpawnCarry(NamedTuple):
    pos: jax.Array
    alive: jax.Array
    side_used: jax.Array  # [2, max_spawns]
    respawn_used: jax.Array


def spawn_agents(
    cfg: EnvConfig,
    m: MapData,
    state: WorldState,
    key: jax.Array,
    is_respawn: bool,
) -> WorldState:
    """Spawn every dead agent (spawnAgents, utils.cpp:734-948)."""
    A = cfg.num_agents
    team_size = cfg.team_size
    teams = jnp.arange(A, dtype=jnp.int32) // team_size

    navmesh_spawn = cfg.has_flag(SimFlags.NavmeshSpawn)
    randomize_hp = cfg.has_flag(SimFlags.RandomizeHPMagazine)
    can_middle = cfg.has_flag(SimFlags.SpawnInMiddle)
    enable_curriculum = cfg.has_flag(SimFlags.EnableCurriculum)
    hardcoded = cfg.has_flag(SimFlags.HardcodedSpawns)

    kmid, kbody = jax.random.split(key)
    if can_middle:
        use_middle = jax.random.uniform(kmid, ()) < 0.5
    else:
        use_middle = jnp.asarray(False)

    cur_step_u32 = state.cur_step.astype(jnp.uint32)
    zone_center = 0.5 * (
        m.zone_min[state.zone_cur] + m.zone_max[state.zone_cur]
    )
    dead = state.alive == 0.0

    # Turret task: team-1 rows are turrets — they spawn once at random
    # navmesh points (level_gen.cpp:449-470) and never respawn
    is_turret_row = jnp.zeros((A,), bool)
    if cfg.task == Task.Turret:
        is_turret_row = teams == 1
        if is_respawn:
            dead = dead & (~is_turret_row)

    learn_shooting = enable_curriculum & (
        state.world_curriculum == WorldCurriculum.LearnShooting
    )

    def body(carry: _SpawnCarry, i):
        ki = jax.random.fold_in(kbody, i)
        k_std, k_nav, k_ls, k_weapon, k_hp, k_mag = jax.random.split(ki, 6)

        team = teams[i]
        side = jnp.where(team == state.team_a, 0, 1)

        # --- standard spawn (always computed; cheap) ---
        if is_respawn and m.num_common_respawns > 0:
            std_pt, std_yaw, respawn_used = _respawn_spawn(
                k_std, m, i, team, teams, carry.pos, carry.alive,
                zone_center, cur_step_u32, carry.respawn_used,
            )
            side_used = carry.side_used
        else:
            std_pt, std_yaw, side_used = _init_spawn(
                k_std, m, side, use_middle, cur_step_u32, carry.side_used
            )
            respawn_used = carry.respawn_used

        pt, yaw = std_pt, std_yaw
        pitch = jnp.zeros(())

        # LearnShooting curriculum override (utils.cpp:819-838)
        if enable_curriculum:
            u = jax.random.uniform(k_ls, (2,))
            ls_x = -700.0 + u[0] * 1400.0
            ls_y = jnp.where(std_pt[1] > 0.0, u[1] * 350.0, -u[1] * 350.0)
            ls_pt = jnp.stack([ls_x, ls_y, jnp.zeros(())])
            pt = jnp.where(learn_shooting, ls_pt, pt)

        # navmesh spawn (utils.cpp:807-810)
        if navmesh_spawn:
            nav_pt = _sample_navmesh_point(k_nav, m)
            nav_yaw = jax.random.uniform(k_nav, ()) * 2.0 * consts.pi
            pt, yaw = nav_pt, nav_yaw

        # hardcoded initial spawns (utils.cpp:482-650)
        if hardcoded and not is_respawn:
            base = jnp.where(team == state.team_a, 0, 3)
            idx = jnp.clip(base + (i - team * team_size), 0, 5)
            row = jnp.asarray(_HARDCODED_SPAWNS)[idx]
            pt, yaw = row[0:3], row[3]

        # spawn-curriculum: both teams spawn in facing navmesh regions
        # (curriculumSpawnPoint, utils.cpp:653-717); initial spawns only
        if cfg.enable_spawn_curriculum and m.has_spawn_curriculum and (
            not is_respawn
        ):
            tier = state.curr_spawn_tier
            sidx = state.curr_spawn_idx
            is_a = team == state.team_a
            tri_list = jnp.where(
                is_a,
                m.curr_spawn_a_tris[tier, sidx],
                m.curr_spawn_b_tris[tier, sidx],
            )  # [K]
            base_yaw = jnp.where(
                is_a,
                m.curr_spawn_a_yaw[tier, sidx],
                m.curr_spawn_b_yaw[tier, sidx],
            )
            n_valid = jnp.maximum(jnp.sum((tri_list >= 0)).astype(jnp.int32), 1)
            k_sc_t, k_sc_uv = jax.random.split(jax.random.fold_in(ki, 77))
            pick = jax.random.randint(k_sc_t, (), 0, 2 ** 30) % n_valid
            tri = jnp.clip(tri_list[pick], 0, m.nav_tri_indices.shape[0] - 1)
            uv = jax.random.uniform(k_sc_uv, (2,))
            uv = jnp.where(uv[0] + uv[1] > 1.0, 1.0 - uv, uv)
            w = 1.0 - uv[0] - uv[1]
            tri_pts = m.nav_verts[m.nav_tri_indices[tri]]
            sc_pt = tri_pts[0] * uv[0] + tri_pts[1] * uv[1] + tri_pts[2] * w
            use_sc = state.curr_spawn_active
            pt = jnp.where(use_sc, sc_pt, pt)
            yaw = jnp.where(use_sc, base_yaw, yaw)

        # Turret task: turrets at navmesh points with random yaw
        # (level_gen.cpp:462-470)
        if cfg.task == Task.Turret:
            k_t_pt, k_t_yaw = jax.random.split(jax.random.fold_in(ki, 91))
            t_pt = _sample_navmesh_point(k_t_pt, m)
            t_yaw = jax.random.uniform(k_t_yaw, ()) * 2.0 * consts.pi
            pt = jnp.where(is_turret_row[i], t_pt, pt)
            yaw = jnp.where(is_turret_row[i], t_yaw, yaw)

        # --- spawn bookkeeping (utils.cpp:844-946) ---
        weapon = jax.random.randint(k_weapon, (), 0, len(cfg.weapons))
        if cfg.task == Task.Turret:
            # the turret weapon is appended after the user weapon table
            # (EnvConfig.effective_weapons), not a fixed slot
            weapon = jnp.where(is_turret_row[i], len(cfg.weapons), weapon)
        if randomize_hp:
            hp = jax.random.randint(k_hp, (), 1, 11).astype(jnp.float32) * 10.0
            mag = jax.random.randint(k_mag, (), 0, m.weapon_mag_size[weapon])
        else:
            hp = jnp.asarray(100.0)
            mag = m.weapon_mag_size[weapon]

        # zone membership at spawn
        rot = m.zone_rot[state.zone_cur]
        p_zf = geom.rotate_z(pt, -rot)
        zmin_f = geom.rotate_z(m.zone_min[state.zone_cur], -rot)
        zmax_f = geom.rotate_z(m.zone_max[state.zone_cur], -rot)
        in_zone = jnp.all((p_zf >= zmin_f) & (p_zf <= zmax_f))
        raised = pt + jnp.array([0.0, 0.0, consts.stand_height / 2.0])
        min_dist_zone = jnp.linalg.norm(raised - zone_center)

        do = dead[i]
        new_pos = jnp.where(do, pt, carry.pos[i])
        new_alive = jnp.where(do, 1.0, carry.alive[i])

        carry = _SpawnCarry(
            pos=carry.pos.at[i].set(new_pos),
            alive=carry.alive.at[i].set(new_alive),
            side_used=jnp.where(do, side_used, carry.side_used),
            respawn_used=jnp.where(do, respawn_used, carry.respawn_used),
        )
        out = {
            "yaw": yaw,
            "pitch": pitch,
            "weapon": weapon,
            "hp": hp,
            "mag": mag,
            "in_zone": in_zone,
            "min_dist_zone": min_dist_zone,
        }
        return carry, out

    carry0 = _SpawnCarry(
        pos=state.pos,
        alive=state.alive,
        side_used=jnp.stack([state.spawn_a_used, state.spawn_b_used]),
        respawn_used=state.spawn_respawn_used,
    )
    carry, outs = jax.lax.scan(body, carry0, jnp.arange(A, dtype=jnp.int32))

    d = dead
    df = d.astype(jnp.float32)

    yaw, pitch = geom.compute_aim(outs["yaw"], outs["pitch"])

    def sel(new, old):
        shape_extra = (1,) * (new.ndim - 1)
        return jnp.where(d.reshape((-1,) + shape_extra), new, old)

    respawn_steps = jnp.where(
        d,
        0 if is_respawn else consts.respawn_invincible_steps,
        state.respawn_steps,
    )

    return state.replace(
        pos=carry.pos,
        vel=sel(jnp.zeros_like(state.vel), state.vel),
        yaw=jnp.where(d, yaw, state.yaw),
        pitch=jnp.where(d, pitch, state.pitch),
        alive=jnp.maximum(state.alive, df),
        hp=jnp.where(d, outs["hp"], state.hp),
        mag_bullets=jnp.where(d, outs["mag"], state.mag_bullets),
        mag_reloading=jnp.where(d, 0, state.mag_reloading),
        weapon_type=jnp.where(d, outs["weapon"], state.weapon_type),
        respawn_steps=respawn_steps,
        autoheal_steps=jnp.where(d, 0, state.autoheal_steps),
        in_zone=jnp.where(d, outs["in_zone"], state.in_zone),
        min_dist_to_zone=jnp.where(
            d, outs["min_dist_zone"], state.min_dist_to_zone
        ),
        stand_cur=jnp.where(d, Pose.Stand, state.stand_cur),
        stand_tgt=jnp.where(d, Pose.Stand, state.stand_tgt),
        stand_transition=jnp.where(d, 0, state.stand_transition),
        max_vel=jnp.where(d, consts.max_walk_velocity, state.max_vel),
        aim_vel_yaw=jnp.where(d, 0.0, state.aim_vel_yaw),
        aim_vel_pitch=jnp.where(d, 0.0, state.aim_vel_pitch),
        spawn_a_used=carry.side_used[0],
        spawn_b_used=carry.side_used[1],
        spawn_respawn_used=carry.respawn_used,
    )
