"""Agent spawning.

TPU re-design of spawnAgents / standardSpawnPoint (reference
src/utils.cpp:273-948). Spawn *selection* is inherently sequential (each
spawned agent affects the next one's spawn scoring and usage-recency
table), so that core runs as a lax.scan over the A agents — but every
random draw and every override path (navmesh / LearnShooting / hardcoded /
curriculum / turret points) is batched OUTSIDE the scan: one RNG primitive
per purpose instead of per-agent key chains, which is what dominates the
per-step cost otherwise.

All random draws use fold_in/split chains (utils/rng.py) rather than the
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


def _sample_navmesh_points(u, m: MapData):
    """Uniform-by-area navmesh points, batched: u [A, 3] uniforms ->
    pts [A, 3] (madrona::Navmesh::samplePoint)."""
    tri = jnp.searchsorted(m.nav_area_cdf, u[:, 0])
    tri = jnp.clip(tri, 0, m.nav_area_cdf.shape[0] - 1)
    uv = u[:, 1:3]
    flip = uv.sum(-1) > 1.0
    uv = jnp.where(flip[:, None], 1.0 - uv, uv)
    w = 1.0 - uv[:, 0] - uv[:, 1]
    pts = m.nav_verts[m.nav_tri_indices[tri]]  # [A, 3, 3]
    return (
        pts[:, 0] * uv[:, 0:1] + pts[:, 1] * uv[:, 1:2] + pts[:, 2] * w[:, None]
    )


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

    is_turret_row = jnp.zeros((A,), bool)
    if cfg.task == Task.Turret:
        is_turret_row = teams == 1
        if is_respawn:
            dead = dead & (~is_turret_row)

    learn_shooting = enable_curriculum & (
        state.world_curriculum == WorldCurriculum.LearnShooting
    )

    # ---- batched draws (one primitive per purpose, [A, ...] shaped) ----
    ks = jax.random.split(kbody, 8)
    u_cand = jax.random.uniform(ks[0], (A, 6))  # init candidate picks
    u_box = jax.random.uniform(ks[1], (A, 4))   # point-in-box + yaw
    u_ls = jax.random.uniform(ks[2], (A, 2))    # LearnShooting override
    u_nav = jax.random.uniform(ks[3], (A, 4))   # navmesh tri/uv + yaw
    weapon_all = jax.random.randint(ks[4], (A,), 0, len(cfg.weapons))
    u_hp = jax.random.randint(ks[5], (A,), 1, 11)
    u_mag = jax.random.uniform(ks[6], (A,))
    u_misc = jax.random.uniform(ks[7], (A, 4))  # curriculum pick/uv, turret yaw

    side_all = jnp.where(teams == state.team_a, 0, 1)

    # ---- vectorized override points (no carry dependence) ----
    nav_pts = _sample_navmesh_points(u_nav[:, :3], m)
    nav_yaws = u_nav[:, 3] * 2.0 * consts.pi

    ls_x = -700.0 + u_ls[:, 0] * 1400.0

    if hardcoded and not is_respawn:
        base = jnp.where(side_all == 0, 0, 3)
        hc_idx = jnp.clip(base + (jnp.arange(A) - teams * team_size), 0, 5)
        hc_rows = jnp.asarray(_HARDCODED_SPAWNS)[hc_idx]
    else:
        hc_rows = None

    if cfg.enable_spawn_curriculum and m.has_spawn_curriculum and (
        not is_respawn
    ):
        tier = state.curr_spawn_tier
        sidx = state.curr_spawn_idx
        is_a = (side_all == 0)
        tri_list = jnp.where(
            is_a[:, None],
            m.curr_spawn_a_tris[tier, sidx][None, :],
            m.curr_spawn_b_tris[tier, sidx][None, :],
        )  # [A, K]
        sc_base_yaw = jnp.where(
            is_a, m.curr_spawn_a_yaw[tier, sidx], m.curr_spawn_b_yaw[tier, sidx]
        )
        n_valid = jnp.maximum(
            jnp.sum(tri_list >= 0, axis=-1).astype(jnp.int32), 1
        )
        pick = (u_misc[:, 0] * n_valid.astype(jnp.float32)).astype(jnp.int32)
        pick = jnp.clip(pick, 0, tri_list.shape[1] - 1)
        tri = jnp.clip(
            jnp.take_along_axis(tri_list, pick[:, None], axis=1)[:, 0],
            0, m.nav_tri_indices.shape[0] - 1,
        )
        uv = u_misc[:, 1:3]
        uv = jnp.where((uv.sum(-1) > 1.0)[:, None], 1.0 - uv, uv)
        w = 1.0 - uv[:, 0] - uv[:, 1]
        tri_pts = m.nav_verts[m.nav_tri_indices[tri]]
        sc_pts = (
            tri_pts[:, 0] * uv[:, 0:1]
            + tri_pts[:, 1] * uv[:, 1:2]
            + tri_pts[:, 2] * w[:, None]
        )
        sc_active = state.curr_spawn_active
    else:
        sc_pts = sc_base_yaw = None
        sc_active = None

    # ---- sequential core: standard/respawn spawn selection ----
    rows = m.common_respawns  # [Nc, 8]
    nc = rows.shape[0]
    centers = 0.5 * (rows[:, 0:3] + rows[:, 3:6]) if nc else None

    n_def = m.num_default_side_spawns
    n_extra = m.num_extra_side_spawns

    def sample_in_spawn(u4, spawn_row):
        mn = spawn_row[0:3]
        mx = spawn_row[3:6]
        pt = mn + u4[:3] * (mx - mn)
        yaw = spawn_row[6] + u4[3] * (spawn_row[7] - spawn_row[6])
        return pt, yaw

    # The selection loop is unrolled in *Python* so every per-agent index is
    # a compile-time constant: the old lax.scan(unroll=A) carried traced
    # agent indices, so each table lookup lowered to a tiny serialized
    # gather and each carry commit to a dynamic-update-slice (~12% of step
    # time at 1024 worlds). Here every lookup/commit is one-hot algebra on
    # the small tables ([2, Ns] boxes, [Nc] respawns) that XLA fuses flat.
    ns = m.side_spawns.shape[1]
    ns_full = state.spawn_a_used.shape[0]  # usage tables are padded wider
    agent_iota = jnp.arange(A, dtype=jnp.int32)
    ns_iota = jnp.arange(ns_full, dtype=jnp.int32)

    pos_c = state.pos
    alive_c = state.alive
    side_used_c = jnp.stack([state.spawn_a_used, state.spawn_b_used])
    respawn_used_c = state.spawn_respawn_used

    respawn_scored = is_respawn and m.num_common_respawns > 0
    if respawn_scored:
        # spawn-box-to-agent distances, columns updated as agents respawn
        # (an agent's position only changes at its own iteration, so this
        # matches the reference's fresh per-agent recompute)
        d_mat = jnp.linalg.norm(
            centers[:, None, :] - pos_c[None, :, :], axis=-1
        )  # [Nc, A]
        dist_zone = jnp.linalg.norm(centers - zone_center, axis=-1)
        zone_bonus = jnp.where(dist_zone < 100.0, 1000000.0, 0.0)  # [Nc]

    pts_l, yaws_l = [], []
    for i in range(A):
        team = teams[i]
        side = side_all[i]
        is_a = side == 0
        box_u = u_box[i]

        if respawn_scored:
            # respawn scoring (standardSpawnPoint respawn path,
            # utils.cpp:391-479)
            used = respawn_used_c[:nc]
            used_now = used == cur_step_u32
            elapsed = jnp.floor(
                consts.delta_t * (cur_step_u32 - used).astype(jnp.float32)
            )
            score = jnp.where(elapsed < 3.0, 0.1 * (3.0 - elapsed), 0.0)
            others = (alive_c > 0.0) & (agent_iota != i)
            near = d_mat < 4.0 * consts.agent_radius
            opp = teams != team
            per_agent = jnp.where(
                near, 100000.0,
                jnp.where(opp, 0.01 / jnp.maximum(d_mat, 1e-6), 0.0),
            )
            score = score + jnp.sum(
                jnp.where(others[None, :], per_agent, 0.0), axis=-1
            )
            score = score + zone_bonus
            score = jnp.where(used_now, _BIG, score)
            best = jnp.argmin(score)
            best_oh = jnp.arange(nc) == best  # [Nc]
            spawn_row = jnp.sum(
                jnp.where(best_oh[:, None], rows, 0.0), axis=0
            )  # [8]
            pt, yaw = sample_in_spawn(box_u, spawn_row)
            respawn_used = jnp.where(
                jnp.arange(respawn_used_c.shape[0]) == best, cur_step_u32,
                respawn_used_c,
            )
            side_used = side_used_c
        else:
            # initial spawn with usage-recency retry
            # (standardSpawnPoint init path, utils.cpp:340-389)
            cand_u = u_cand[i]
            nd_s = jnp.where(is_a, n_def[0], n_def[1])
            ne_s = jnp.where(is_a, n_extra[0], n_extra[1])
            offset = jnp.where(use_middle, nd_s, 0)
            count = jnp.maximum(jnp.where(use_middle, ne_s, nd_s), 1)
            cands = offset + jnp.minimum(
                (cand_u * count.astype(jnp.float32)).astype(jnp.int32),
                count - 1,
            )  # [6]
            usage = jnp.where(is_a, side_used_c[0], side_used_c[1])  # [Ns]
            used_now = usage == cur_step_u32
            cand_used = jnp.any(
                (cands[:, None] == ns_iota[None, :]) & used_now[None, :],
                axis=-1,
            )  # [6]
            valid = ~cand_used[:5]
            any_valid = jnp.any(valid)
            first_oh = jnp.arange(5) == jnp.argmax(valid)
            chosen = jnp.where(
                any_valid, jnp.sum(jnp.where(first_oh, cands[:5], 0)),
                cands[5],
            )
            # read clips out-of-range candidates to the last row; the
            # usage write drops them (the reference's scatter is a no-op
            # out of bounds) — hence two separate one-hots
            read_oh = ns_iota[:ns] == jnp.clip(chosen, 0, ns - 1)
            write_oh = ns_iota == chosen
            side_rows = jnp.where(
                is_a, m.side_spawns[0], m.side_spawns[1]
            )  # [Ns, 8]
            spawn_row = jnp.sum(
                jnp.where(read_oh[:, None], side_rows, 0.0), axis=0
            )
            pt, yaw = sample_in_spawn(box_u, spawn_row)
            side_oh = jnp.arange(2) == side
            side_used = jnp.where(
                side_oh[:, None] & write_oh[None, :], cur_step_u32,
                side_used_c,
            )
            respawn_used = respawn_used_c

        # override chain (vectorized values precomputed above)
        if enable_curriculum:
            ls_y = jnp.where(pt[1] > 0.0, u_ls[i, 1] * 350.0, -u_ls[i, 1] * 350.0)
            ls_pt = jnp.stack([ls_x[i], ls_y, jnp.zeros(())])
            pt = jnp.where(learn_shooting, ls_pt, pt)
        if navmesh_spawn:
            pt, yaw = nav_pts[i], nav_yaws[i]
        if hc_rows is not None:
            pt, yaw = hc_rows[i, 0:3], hc_rows[i, 3]
        if sc_pts is not None:
            pt = jnp.where(sc_active, sc_pts[i], pt)
            yaw = jnp.where(sc_active, sc_base_yaw[i], yaw)
        if cfg.task == Task.Turret:
            pt = jnp.where(is_turret_row[i], nav_pts[i], pt)
            yaw = jnp.where(
                is_turret_row[i], u_misc[i, 3] * 2.0 * consts.pi, yaw
            )

        do = dead[i]
        commit = do & (agent_iota == i)  # static one-hot mask
        pos_c = jnp.where(commit[:, None], pt[None, :], pos_c)
        alive_c = jnp.where(commit, 1.0, alive_c)
        side_used_c = jnp.where(do, side_used, side_used_c)
        respawn_used_c = jnp.where(do, respawn_used, respawn_used_c)
        if respawn_scored:
            d_col = jnp.linalg.norm(centers - pt[None, :], axis=-1)  # [Nc]
            d_mat = jnp.where(commit[None, :], d_col[:, None], d_mat)
        pts_l.append(pt)
        yaws_l.append(yaw)

    carry = _SpawnCarry(
        pos=pos_c, alive=alive_c, side_used=side_used_c,
        respawn_used=respawn_used_c,
    )
    pts = jnp.stack(pts_l)
    yaws = jnp.stack(yaws_l)

    # ---- vectorized bookkeeping (utils.cpp:844-946) ----
    weapon = weapon_all
    if cfg.task == Task.Turret:
        # the turret weapon is appended after the user weapon table
        # (EnvConfig.effective_weapons), not a fixed slot
        weapon = jnp.where(is_turret_row, len(cfg.weapons), weapon)
    if randomize_hp:
        hp = u_hp.astype(jnp.float32) * 10.0
        mag_size = m.weapon_mag_size[weapon]
        mag = jnp.minimum(
            (u_mag * mag_size.astype(jnp.float32)).astype(jnp.int32),
            mag_size - 1,
        )
    else:
        hp = jnp.full((A,), 100.0)
        mag = m.weapon_mag_size[weapon]

    # zone membership at spawn
    rot = m.zone_rot[state.zone_cur]
    p_zf = geom.rotate_z(pts, -rot)
    zmin_f = geom.rotate_z(m.zone_min[state.zone_cur], -rot)
    zmax_f = geom.rotate_z(m.zone_max[state.zone_cur], -rot)
    in_zone = jnp.all((p_zf >= zmin_f) & (p_zf <= zmax_f), axis=-1)
    raised = pts + jnp.array([0.0, 0.0, consts.stand_height / 2.0])
    min_dist_zone = jnp.linalg.norm(raised - zone_center, axis=-1)

    d = dead
    df = d.astype(jnp.float32)
    yaw, pitch = geom.compute_aim(yaws, jnp.zeros((A,)))

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
        hp=jnp.where(d, hp, state.hp),
        mag_bullets=jnp.where(d, mag, state.mag_bullets),
        mag_reloading=jnp.where(d, 0, state.mag_reloading),
        weapon_type=jnp.where(d, weapon, state.weapon_type),
        respawn_steps=respawn_steps,
        autoheal_steps=jnp.where(d, 0, state.autoheal_steps),
        in_zone=jnp.where(d, in_zone, state.in_zone),
        min_dist_to_zone=jnp.where(d, min_dist_zone, state.min_dist_to_zone),
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
