"""Observation tail: LOS visibility, opponent masks, egocentric obs, lidar.

Re-implements opponentsWriteVisibilitySystem (reference src/sim.cpp:2526-2560,
isAgentVisible in src/utils.cpp:186-271), pvpOpponentMasksSystem
(sim.cpp:2562-2614), pvpObservationsSystem (sim.cpp:2645-3052), and
pvpLidarSystem (sim.cpp:3324-3506) as batched tensor ops. All LOS + lidar
rays for the whole world are evaluated in a handful of fused sweeps.

Observation dict keys match the reference trainInterface
(mgr.cpp:2383-2430) so a reference policy maps over 1:1.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .. import consts
from ..config import EnvConfig, Task
from ..assets.map_data import MapData
from ..ops import geom
from ..ops.raycast import ray_fans_vs_tris, ray_vs_capsules, ray_vs_tris
from .combat import view_height
from .types import WorldState, SELF_OB_DIM, OTHER_OB_DIM

INF = jnp.inf

# frustum constants (Sim::Sim, sim.cpp:5869-5882): 90 deg fov, 16:9
_F = 1.0  # 1/tan(45deg)
_ASPECT = 16.0 / 9.0
_WX, _WY = (lambda v: (v[0], v[1]))(
    (lambda x, y: (x / math.hypot(x, y), y / math.hypot(x, y)))(_F / _ASPECT, 1.0)
)
_HX, _HY = (lambda x, y: (x / math.hypot(x, y), y / math.hypot(x, y)))(_F, 1.0)


def _trace_world_and_agents(m: MapData, o, d, pos, alive_mask, self_idx=None,
                            t_world=None, t_cap=None, cap_idx=None):
    """Shared ray query: (t, hit_agent) vs world tris + alive agent capsules.
    hit_agent = -1 for wall; t = inf on miss. o/d: [..., 3]. ``t_world`` and
    ``t_cap``/``cap_idx`` may be precomputed (fused sensor kernels)."""
    if t_world is None:
        t_world = ray_vs_tris(o, d, m.tris)
    if t_cap is None:
        t_caps = ray_vs_capsules(
            o,
            d,
            pos,
            consts.agent_radius,
            consts.stand_height - 2.0 * consts.agent_radius,
            alive_mask,
        )  # [..., A]
        if self_idx is not None:
            A = pos.shape[0]
            t_caps = jnp.where(
                self_idx[..., None] == jnp.arange(A), INF, t_caps
            )
        t_cap = jnp.min(t_caps, axis=-1)
        cap_idx = jnp.argmin(t_caps, axis=-1)
    cap_first = t_cap < t_world
    t = jnp.minimum(t_world, t_cap)
    hit_agent = jnp.where(cap_first, cap_idx, -1)
    return t, hit_agent


def _flank_los(cfg: EnvConfig) -> bool:
    """Flank reward mode needs self->teammate LOS too (flankRewardSystem
    teammate positioning term, reference src/sim.cpp:4233-4246)."""
    from ..config import RewardMode

    return cfg.task == Task.Zone and cfg.reward_mode == RewardMode.Flank


def _los_geometry(cfg: EnvConfig, state: WorldState):
    """LOS sample rays: 4 points per opponent (isAgentVisible,
    utils.cpp:186-271). In Flank reward mode the target table additionally
    includes the agent's own team (self slot is never visible: its sample
    rays fail the frustum/self-capsule pretests). Returns the per-ray
    geometry shared by visibility_system and the fused sensor fan."""
    A = cfg.num_agents
    ts = cfg.team_size
    teams = jnp.arange(A, dtype=jnp.int32) // ts
    # opponent index table: opp_idx[a, j] = j-th opponent of agent a
    opp_idx = (1 - teams[:, None]) * ts + jnp.arange(ts)[None, :]  # [A, ts]
    if _flank_los(cfg):
        own_idx = teams[:, None] * ts + jnp.arange(ts)[None, :]  # [A, ts]
        opp_idx = jnp.concatenate([opp_idx, own_idx], axis=1)  # [A, 2*ts]

    eye = state.pos + jnp.stack(
        [jnp.zeros((A,)), jnp.zeros((A,)), view_height(state.stand_cur)],
        axis=-1,
    )
    fwd, right, up = geom.aim_vectors(state.yaw, state.pitch)

    # sample points on each target [A, 4, 3]
    tgt_vh = view_height(state.stand_cur)
    bottom = state.pos + jnp.array([0.0, 0.0, 1.0]) * consts.agent_radius
    top = state.pos + jnp.stack(
        [jnp.zeros((A,)), jnp.zeros((A,)), tgt_vh], axis=-1
    )

    # viewer-dependent left/right samples: delta along the VIEWER's aim right
    delta_r = right * (0.9 * consts.agent_radius)  # [A, 3] per viewer

    # build [A, ts, 4, 3] sample points: target gathered by opp_idx
    t_bottom = bottom[opp_idx]  # [A, ts, 3]
    t_top = top[opp_idx]
    samples = jnp.stack(
        [
            t_bottom,
            t_top,
            t_top - delta_r[:, None, :],
            t_top + delta_r[:, None, :],
        ],
        axis=2,
    )  # [A, ts, 4, 3]

    to_s = samples - eye[:, None, None, :]
    # view space components
    vx = jnp.einsum("atsd,ad->ats", to_s, right)
    vy = jnp.einsum("atsd,ad->ats", to_s, fwd)
    vz = jnp.einsum("atsd,ad->ats", to_s, up)

    in_front = vy > 0.0
    in_frustum = (
        (vy * _WY - jnp.abs(vx) * _WX > -consts.agent_radius)
        & (vy * _HY - jnp.abs(vz) * _HX > -consts.agent_radius)
    )
    dist = jnp.linalg.norm(to_s, axis=-1)
    far_enough = dist >= consts.agent_radius

    ray_d = to_s / jnp.maximum(dist[..., None], 1e-30)
    return {
        "eye": eye,
        "opp_idx": opp_idx,
        "ray_d": ray_d,  # [A, ts, 4, 3]
        "pretests": in_front & in_frustum & far_enough,
    }


def build_sensor_rays(cfg: EnvConfig, m: MapData, state: WorldState,
                      cells=None):
    """ONE fused ray-fan launch for all of an agent's per-step sensor rays
    (LOS samples + fwd/rear lidar): each agent's rays share a base origin
    (its position; per-ray z offset), so the TPU fan kernel hoists the
    origin-dependent intersection terms and sweeps only the agent's cell
    candidates (ops/culling.py) when the map has tables. The agent-capsule
    sweep for the same rays is one fused Pallas launch per step
    (ops/raycast_cull.fan_capsules). Returns geometry + world/capsule hit
    data for visibility_system / lidar_system."""
    A = cfg.num_agents
    ts = cfg.team_size

    los = _los_geometry(cfg, state)
    ray_d = los["ray_d"]  # [A, n_tgt, 4, 3] (n_tgt = ts, or 2*ts in Flank)
    n_tgt = los["opp_idx"].shape[1]
    n_los = n_tgt * 4
    # component planes: the whole sensor pipeline stays [A, F]-shaped so
    # nothing ever materializes a [..., 3]-minor ray array (XLA pads the
    # 3-wide minor dim to 128 lanes — a 32x physical blowup at this scale)
    los_dx = ray_d[..., 0].reshape(A, n_los)
    los_dy = ray_d[..., 1].reshape(A, n_los)
    los_dz = ray_d[..., 2].reshape(A, n_los)
    eye_z = view_height(state.stand_cur)  # LOS origin z offset

    (fwd_dx, fwd_dy, fwd_dz), fwd_z = _lidar_fan_components(
        cfg, state, consts.fwd_lidar_width, consts.fwd_lidar_height,
        0.75 * consts.pi, 0.5 * (1.0 - 0.75) * consts.pi, aim_frame=True,
    )
    (rear_dx, rear_dy, rear_dz), rear_z = _lidar_fan_components(
        cfg, state, consts.rear_lidar_width, consts.rear_lidar_height,
        -consts.pi, 0.0, aim_frame=False,
    )

    n_fwd = consts.fwd_lidar_height * consts.fwd_lidar_width
    n_rear = consts.rear_lidar_height * consts.rear_lidar_width
    dx = jnp.concatenate([los_dx, fwd_dx, rear_dx], axis=1)  # [A, F]
    dy = jnp.concatenate([los_dy, fwd_dy, rear_dy], axis=1)
    dz = jnp.concatenate([los_dz, fwd_dz, rear_dz], axis=1)
    zg = jnp.concatenate([eye_z[:, None], fwd_z, rear_z], axis=1)  # [A, G]

    # static z-group runs: LOS rays share the eye height; each lidar row
    # shares its height (z constant along a row by construction above) —
    # lets the TPU fan kernels hoist every z term out of the pair loop
    zgroups = (n_los,) + (
        (consts.fwd_lidar_width,) * consts.fwd_lidar_height
    ) + ((consts.rear_lidar_width,) * consts.rear_lidar_height)
    ray_cells = None
    if m.ray_cells is not None:
        from ..ops.culling import ray_cell_index

        # the fan origin IS state.pos (z offsets ride the origin stream),
        # so the cell of record is exact — see culling.SENSOR_MARGIN
        ray_cells = ray_cell_index(m.ray_cells, state.pos)
    t = ray_fans_vs_tris(
        state.pos, zg, (dx, dy, dz), m.tris, cells=cells, tables=m.cells,
        zgroups=zgroups, ray_tables=m.ray_cells, ray_cells=ray_cells,
    )

    # capsule sweep for every sensor ray in one pass (self always excluded —
    # both the LOS and lidar paths skip the caster's own capsule)
    F_total = dx.shape[1]
    alive = state.alive > 0.0
    seg_h = consts.stand_height - 2.0 * consts.agent_radius
    from ..ops.raycast import use_pallas

    reps = np.asarray(zgroups)
    if use_pallas():
        from ..ops.raycast_cull import fan_capsules_planar

        zoff_ray = jnp.repeat(
            zg, jnp.asarray(reps), axis=-1, total_repeat_length=F_total
        )  # [A, F]
        t_cap, cap_idx = fan_capsules_planar(
            state.pos, zoff_ray, (dx, dy, dz), alive,
            consts.agent_radius, seg_h,
        )
    else:
        zoffs = jnp.repeat(
            zg, jnp.asarray(reps), axis=-1, total_repeat_length=F_total
        )
        dirs = jnp.stack([dx, dy, dz], axis=-1)  # [A, F, 3]
        o = state.pos[:, None, :] + jnp.stack(
            [jnp.zeros_like(zoffs), jnp.zeros_like(zoffs), zoffs], axis=-1
        )
        self_idx = jnp.broadcast_to(
            jnp.arange(A, dtype=jnp.int32)[:, None], (A, F_total)
        )
        t_caps = ray_vs_capsules(
            o, dirs, state.pos, consts.agent_radius, seg_h, alive
        )  # [A, F, A]
        t_caps = jnp.where(
            self_idx[..., None] == jnp.arange(A), INF, t_caps
        )
        t_cap = jnp.min(t_caps, axis=-1)
        cap_idx = jnp.argmin(t_caps, axis=-1)
        cap_idx = jnp.where(jnp.isinf(t_cap), -1, cap_idx)

    H_f, W_f = consts.fwd_lidar_height, consts.fwd_lidar_width
    H_r, W_r = consts.rear_lidar_height, consts.rear_lidar_width
    s0, s1 = n_los, n_los + n_fwd
    return {
        "los": los,
        "los_t": t[:, :s0].reshape(A, n_tgt, 4),
        "fwd_t": t[:, s0:s1].reshape(A, H_f, W_f),
        "rear_t": t[:, s1:].reshape(A, H_r, W_r),
        "los_cap_t": t_cap[:, :s0].reshape(A, n_tgt, 4),
        "fwd_cap_t": t_cap[:, s0:s1].reshape(A, H_f, W_f),
        "rear_cap_t": t_cap[:, s1:].reshape(A, H_r, W_r),
        "los_cap_idx": cap_idx[:, :s0].reshape(A, n_tgt, 4),
        "fwd_cap_idx": cap_idx[:, s0:s1].reshape(A, H_f, W_f),
        "rear_cap_idx": cap_idx[:, s1:].reshape(A, H_r, W_r),
    }


def _lidar_fan_components(cfg, state, n_w, n_h, theta_range, theta_offset,
                          aim_frame):
    """Lidar beam direction components (dx, dy, dz each [A, H*W], rays
    H-major) + per-row origin z offsets [A, H]. Componentwise so the fused
    sensor fan never materializes a [..., 3]-minor array (XLA pads a rank-N
    3-minor f32 array to 128 lanes — a 32x physical blowup on the ray
    stream). Values match _lidar_fan_dirs bit for bit."""
    A = cfg.num_agents
    if aim_frame:
        fwd, right, _ = geom.aim_vectors(state.yaw, state.pitch)
    else:
        fwd, right = geom.body_fwd_right(state.yaw)

    idx = jnp.arange(n_w, dtype=jnp.float32)
    theta = theta_range * (idx / (n_w - 1)) + theta_offset  # [W]
    x = -jnp.cos(theta)
    y = jnp.sin(theta)
    ux = x[None, :] * right[:, 0:1] + y[None, :] * fwd[:, 0:1]  # [A, W]
    uy = x[None, :] * right[:, 1:2] + y[None, :] * fwd[:, 1:2]
    uz = x[None, :] * right[:, 2:3] + y[None, :] * fwd[:, 2:3]
    # geom.normalize(eps=0.0) semantics, division kept bit-identical
    n = jnp.sqrt(ux * ux + uy * uy + uz * uz)
    nm = jnp.maximum(n, 1e-30)
    ok = n > 0.0
    dx = jnp.tile(jnp.where(ok, ux / nm, 0.0), (1, n_h))  # [A, H*W]
    dy = jnp.tile(jnp.where(ok, uy / nm, 0.0), (1, n_h))
    dz = jnp.tile(jnp.where(ok, uz / nm, 0.0), (1, n_h))

    top_height = view_height(state.stand_cur) + consts.agent_radius
    h_range = top_height - 2.0 * consts.agent_radius
    hs = jnp.arange(n_h, dtype=jnp.float32) / (n_h - 1)  # [H]
    z = consts.agent_radius + h_range[:, None] * hs[None, :]  # [A, H]
    return (dx, dy, dz), z


def _lidar_fan_dirs(cfg, state, n_w, n_h, theta_range, theta_offset,
                    aim_frame):
    """Lidar beam directions [A, H, W, 3] + per-ray origin z offsets [A, H, W]
    (pvpLidarSystem geometry, sim.cpp:3324-3506)."""
    A = cfg.num_agents
    if aim_frame:
        fwd, right, _ = geom.aim_vectors(state.yaw, state.pitch)
    else:
        fwd, right = geom.body_fwd_right(state.yaw)

    idx = jnp.arange(n_w, dtype=jnp.float32)
    theta = theta_range * (idx / (n_w - 1)) + theta_offset  # [W]
    x = -jnp.cos(theta)
    y = jnp.sin(theta)
    d = (
        x[None, :, None] * right[:, None, :]
        + y[None, :, None] * fwd[:, None, :]
    )
    d = geom.normalize(d)  # [A, W, 3]
    d = jnp.broadcast_to(d[:, None, :, :], (A, n_h, n_w, 3))

    top_height = view_height(state.stand_cur) + consts.agent_radius
    h_range = top_height - 2.0 * consts.agent_radius
    hs = jnp.arange(n_h, dtype=jnp.float32) / (n_h - 1)  # [H]
    z = consts.agent_radius + h_range[:, None] * hs[None, :]  # [A, H]
    z = jnp.broadcast_to(z[:, :, None], (A, n_h, n_w))
    return d, z


def visibility_system(cfg: EnvConfig, m: MapData, state: WorldState,
                      sensor=None):
    """can_see[a, o_slot]: agent a sees opponent slot o_slot — frustum +
    occlusion per sample ray (isAgentVisible, utils.cpp:186-271)."""
    A = cfg.num_agents

    if sensor is None:
        los = _los_geometry(cfg, state)
        los_t = cap_t = cap_idx = None
    else:
        los = sensor["los"]
        los_t = sensor["los_t"]  # [A, ts, 4]
        cap_t = sensor["los_cap_t"]
        cap_idx = sensor["los_cap_idx"]

    opp_idx = los["opp_idx"]
    ray_d = los["ray_d"]
    o = jnp.broadcast_to(los["eye"][:, None, None, :], ray_d.shape)
    self_idx = jnp.broadcast_to(
        jnp.arange(A)[:, None, None], ray_d.shape[:-1]
    )
    t_hit, hit_agent = _trace_world_and_agents(
        m, o, ray_d, state.pos, state.alive > 0.0, self_idx, t_world=los_t,
        t_cap=cap_t, cap_idx=cap_idx,
    )
    ray_ok = hit_agent == opp_idx[:, :, None]

    sample_visible = los["pretests"] & ray_ok
    can_see = jnp.any(sample_visible, axis=-1)  # [A, ts]

    viewer_alive = (state.alive > 0.0)[:, None]
    target_alive = (state.alive > 0.0)[opp_idx]
    can_see = can_see & viewer_alive & target_alive
    return can_see, opp_idx


def split_visibility(cfg: EnvConfig, state: WorldState, can_see, opp_idx):
    """Split the visibility table into the opponent half consumed by the
    masks/obs systems and (Flank mode only) write the own-team half into
    state.prev_teammate_vis for next step's flankRewardSystem terms."""
    ts = cfg.team_size
    if _flank_los(cfg):
        state = state.replace(prev_teammate_vis=can_see[:, ts:])
        can_see = can_see[:, :ts]
        opp_idx = opp_idx[:, :ts]
    return state, can_see, opp_idx


def opponent_masks_system(cfg: EnvConfig, state: WorldState, can_see, opp_idx):
    """pvpOpponentMasksSystem (sim.cpp:2562-2614): team-shared knowledge =
    any teammate sees the opponent, or the opponent fired recently."""
    A = cfg.num_agents
    ts = cfg.team_size
    teams = jnp.arange(A, dtype=jnp.int32) // ts

    # OR over each team's members: can_see is [A, ts] with aligned opponent
    # slots within a team.
    team_any = jnp.zeros((2, ts), bool).at[teams].max(can_see)  # [2, ts]
    shared = team_any[teams]  # [A, ts]

    opp_fired = (state.fired_shot_t >= 0.0)[opp_idx]  # [A, ts]

    alive_self = (state.alive > 0.0)[:, None]
    opp_alive = (state.alive > 0.0)[opp_idx]
    masks = (shared | opp_fired) & alive_self & opp_alive
    return masks.astype(jnp.float32)


def _normalized_pos(m: MapData, p):
    rng = m.world_max - m.world_min
    return jnp.clip((p - m.world_min) / rng, 0.0, 1.0)


def _stand_obs(state: WorldState):
    cur = jax.nn.one_hot(state.stand_cur, 3)
    tgt = jax.nn.one_hot(state.stand_tgt, 3)
    trans = (
        state.stand_transition.astype(jnp.float32)
        / consts.pose_transition_speed
    )
    return jnp.concatenate([cur, tgt, trans[:, None]], axis=-1)  # [A, 7]


def _common_ob(cfg: EnvConfig, m: MapData, state: WorldState, observer_yaw):
    """PlayerCommonObservation [A, 23] for every agent, with velocities in
    each OBSERVER's body frame -> returns [A_obs, A_tgt, 23]."""
    A = cfg.num_agents
    alive = state.alive > 0.0

    npos = _normalized_pos(m, state.pos)  # [A, 3]
    facing_yaw = 0.5 * ((state.yaw / consts.pi) + 1.0)
    facing_pitch = 0.5 * (state.pitch / (0.25 * consts.pi) + 1.0)

    # relative velocity: rotate target vel by -observer_yaw
    vel = state.vel  # [A, 3]
    rel_vel = geom.rotate_z(
        vel[None, :, :], -observer_yaw[:, None]
    )  # [A_obs, A_tgt, 3]

    stand = _stand_obs(state)  # [A, 7]
    weapon = jax.nn.one_hot(state.weapon_type, consts.max_num_weapon_types)

    per_target = jnp.concatenate(
        [
            jnp.ones((A, 1)),  # isValid
            alive[:, None].astype(jnp.float32),
            npos,
            facing_yaw[:, None],
            facing_pitch[:, None],
        ],
        axis=-1,
    )  # [A, 7]
    aim_vel = jnp.stack([state.aim_vel_yaw, state.aim_vel_pitch], axis=-1)
    tail = jnp.concatenate(
        [
            aim_vel,
            stand,
            state.in_zone[:, None].astype(jnp.float32),
            weapon,
        ],
        axis=-1,
    )  # [A, 13]

    ob = jnp.concatenate(
        [
            jnp.broadcast_to(per_target[None, :, :], (A, A, 7)),
            rel_vel,
            jnp.broadcast_to(tail[None, :, :], (A, A, 13)),
        ],
        axis=-1,
    )  # [A, A, 23]

    # dead targets: zero everything except isValid (fillCommonOb early out)
    valid_only = jnp.zeros((A, A, 23)).at[..., 0].set(1.0)
    ob = jnp.where(alive[None, :, None], ob, valid_only)
    return ob


def _rel_ob(cfg: EnvConfig, state: WorldState):
    """Relative geometry block [A_obs, A_tgt, 5]: toPlayerDist/Yaw/Pitch,
    relativeFacingYaw/Pitch (fillOtherPlayerCommonOb, sim.cpp:2948-2995)."""
    A = cfg.num_agents
    to_other = state.pos[None, :, :] - state.pos[:, None, :]
    dist = jnp.linalg.norm(to_other, axis=-1)
    close = dist < 1e-2
    dirn = to_other / jnp.maximum(dist[..., None], 1e-30)
    new_yaw, new_pitch = geom.yaw_pitch_to(dirn)
    yaw_delta = geom.wrap_pi(new_yaw - state.yaw[:, None])
    pitch_delta = new_pitch - state.pitch[:, None]

    d = jnp.where(close, 0.0, dist)
    yd = jnp.where(close, 0.0, yaw_delta)
    pd = jnp.where(close, 0.0, pitch_delta)

    rf_yaw = geom.wrap_pi(state.yaw[None, :] - state.yaw[:, None])
    rf_pitch = state.pitch[None, :] - state.pitch[:, None]

    return jnp.stack([d, yd, pd, rf_yaw, rf_pitch], axis=-1)


def _combat_ob(state: WorldState):
    """CombatStateObservation [A, 4] (sim.cpp:2776-2791)."""
    return jnp.stack(
        [
            state.hp / 100.0,
            state.mag_bullets.astype(jnp.float32),
            state.mag_reloading.astype(jnp.float32),
            state.autoheal_steps.astype(jnp.float32)
            / consts.num_out_of_combat_steps_before_autoheal,
        ],
        axis=-1,
    )


def _zone_ob(cfg: EnvConfig, m: MapData, state: WorldState):
    """ZoneObservation [A, 16] (sim.cpp:2800-2874)."""
    A = cfg.num_agents
    teams = jnp.arange(A, dtype=jnp.int32) // cfg.team_size

    zc = 0.5 * (m.zone_min[state.zone_cur] + m.zone_max[state.zone_cur])
    n_center = _normalized_pos(m, zc)

    to_c = zc[None, :] - state.pos
    dist = jnp.linalg.norm(to_c, axis=-1)
    close = dist < 1e-2
    dirn = to_c / jnp.maximum(dist[:, None], 1e-30)
    ny, npi = geom.yaw_pitch_to(dirn)
    yd = geom.wrap_pi(ny - state.yaw)
    pd = npi - state.pitch

    mine = (state.zone_controlling == teams).astype(jnp.float32)
    enemy = (
        (state.zone_controlling != -1) & (state.zone_controlling != teams)
    ).astype(jnp.float32)

    zid = jax.nn.one_hot(state.zone_cur, 4)

    return jnp.concatenate(
        [
            jnp.broadcast_to(n_center[None, :], (A, 3)),
            jnp.where(close, 0.0, dist)[:, None],
            jnp.where(close, 0.0, yd)[:, None],
            jnp.where(close, 0.0, pd)[:, None],
            mine[:, None],
            enemy[:, None],
            jnp.broadcast_to(
                state.zone_contested.astype(jnp.float32), (A,)
            )[:, None],
            jnp.broadcast_to(
                state.zone_captured.astype(jnp.float32), (A,)
            )[:, None],
            jnp.broadcast_to(
                state.zone_steps_until_point.astype(jnp.float32)
                / consts.zone_point_interval,
                (A,),
            )[:, None],
            jnp.broadcast_to(
                state.zone_steps_remaining.astype(jnp.float32)
                / consts.num_steps_per_zone,
                (A,),
            )[:, None],
            jnp.broadcast_to(zid[None, :], (A, 4)),
        ],
        axis=-1,
    )


def observations_system(
    cfg: EnvConfig,
    m: MapData,
    state: WorldState,
    can_see,
    opp_idx,
    opponent_masks,
):
    """pvpObservationsSystem (sim.cpp:2645-3052). Returns (state', obs dict
    without lidar)."""
    A = cfg.num_agents
    ts = cfg.team_size
    teams = jnp.arange(A, dtype=jnp.int32) // ts
    alive = state.alive > 0.0

    common = _common_ob(cfg, m, state, state.yaw)  # [A, A, 23]
    rel = _rel_ob(cfg, state)  # [A, A, 5]
    combat = _combat_ob(state)  # [A, 4]
    npos = _normalized_pos(m, state.pos)  # [A, 3]

    # --- self ---
    self_common = common[jnp.arange(A), jnp.arange(A)]  # [A, 23]
    if cfg.task != Task.TDM:
        zone = _zone_ob(cfg, m, state)
    else:
        zone = jnp.zeros((A, 16))
    self_ob = jnp.concatenate([self_common, combat, zone], axis=-1)
    # dead self: zero everything except isValid
    self_dead = jnp.zeros_like(self_ob).at[:, 0].set(1.0)
    self_ob = jnp.where(alive[:, None], self_ob, self_dead)
    self_pos_ob = jnp.where(alive[:, None], npos, jnp.zeros_like(npos))

    # --- teammates [A, ts-1, 32] ---
    mate_idx = jnp.argsort(
        jnp.where(
            (teams[:, None] == teams[None, :]) & (~jnp.eye(A, dtype=bool)),
            jnp.arange(A)[None, :],
            A,
        ),
        axis=-1,
    )[:, : ts - 1]
    ar = jnp.arange(A)[:, None]
    mate_ob = jnp.concatenate(
        [
            common[ar, mate_idx],
            rel[ar, mate_idx],
            combat[mate_idx],
        ],
        axis=-1,
    )
    mate_alive = alive[mate_idx]
    mate_dead_fill = jnp.zeros_like(mate_ob).at[..., 0].set(1.0)
    mate_ob = jnp.where(mate_alive[..., None], mate_ob, mate_dead_fill)
    mate_pos = jnp.where(
        mate_alive[..., None], npos[mate_idx], jnp.zeros((A, ts - 1, 3))
    )

    # --- opponents [A, ts, 32] ---
    opp_was_hit = state.was_shot_count.astype(jnp.float32)[opp_idx]
    opp_fired = (state.fired_shot_t >= 0.0).astype(jnp.float32)[opp_idx]
    has_los = can_see.astype(jnp.float32)
    knows = opponent_masks  # [A, ts] float

    opp_ob = jnp.concatenate(
        [
            common[ar, opp_idx],
            rel[ar, opp_idx],
            opp_was_hit[..., None],
            opp_fired[..., None],
            has_los[..., None],
            knows[..., None],
        ],
        axis=-1,
    )
    opp_alive = alive[opp_idx]
    opp_dead_fill = jnp.zeros_like(opp_ob).at[..., 0].set(1.0)
    opp_ob = jnp.where(opp_alive[..., None], opp_ob, opp_dead_fill)
    opp_pos = jnp.where(
        opp_alive[..., None], npos[opp_idx], jnp.zeros((A, ts, 3))
    )

    # --- last-known update (sim.cpp:3010-3051) ---
    opp_killed = state.was_killed[opp_idx]
    # lazy reset clear (initWorld's eager clear moved here; this select
    # fuses into the full rewrite below — no extra memory traffic)
    wr = state.was_reset
    last_obs = jnp.where(wr, 0.0, state.last_known_obs)
    last_pos = jnp.where(wr, -1000.0, state.last_known_pos)
    # dead opponent -> cleared; killed this step -> cleared; known -> refresh
    clear = (~opp_alive) | opp_killed
    last_obs = jnp.where(clear[..., None], 0.0, last_obs)
    last_pos = jnp.where(clear[..., None], -1000.0, last_pos)
    known = (knows > 0.0) & opp_alive
    last_obs = jnp.where(known[..., None], opp_ob, last_obs)
    last_pos = jnp.where(known[..., None], opp_pos, last_pos)

    # filters-state observation (sim.cpp:2670-2678)
    team_matched = (
        state.cur_step - state.filters_last_all_matched[jnp.clip(teams, 0, 1)]
        < 5
    ).astype(jnp.float32)

    state = state.replace(
        last_known_obs=last_obs,
        last_known_pos=last_pos,
        prev_can_see=can_see,
    )

    obs = {
        "self": self_ob,
        "self_pos": self_pos_ob,
        "teammates": mate_ob,
        "teammate_positions": mate_pos,
        "opponents": opp_ob,
        "opponent_positions": opp_pos,
        "opponents_last_known": last_obs,
        "opponent_last_known_positions": last_pos,
        "opponent_masks": knows,
        "filters_state": team_matched[:, None],
        "hp": state.hp[:, None] / 100.0,
        "magazine": jnp.stack(
            [
                state.mag_bullets.astype(jnp.float32),
                state.mag_reloading.astype(jnp.float32),
            ],
            axis=-1,
        ),
        "alive": state.alive[:, None],
        "reward_coefs": state.reward_coefs,
        # vestigial minimaps (registered + exported but never written by any
        # system in the reference; see SURVEY.md §2.1)
        "agent_map": jnp.zeros((A, 16, 16, 4)),
        "unmasked_agent_map": jnp.zeros((A, 16, 16, 4)),
    }
    return state, obs


def lidar_system(cfg: EnvConfig, m: MapData, state: WorldState, sensor=None):
    """pvpLidarSystem (sim.cpp:3324-3506): 2x32 forward fan over 0.75*pi in
    the aim frame + 2x8 rear fan over -pi in the body frame; each beam
    returns (depth, isWall, isTeammate, isOpponent)."""
    A = cfg.num_agents
    teams = jnp.arange(A, dtype=jnp.int32) // cfg.team_size
    max_dist = m.max_dist

    def fan(t_world, cap_t, cap_idx):
        # combine precomputed world + capsule hits (the fused sensor sweep
        # already traced every beam; see build_sensor_rays)
        cap_first = cap_t < t_world
        t = jnp.minimum(t_world, cap_t)
        hit_agent = jnp.where(cap_first, cap_idx, -1)
        hit = ~jnp.isinf(t)
        depth = jnp.where(hit, jnp.minimum(t, max_dist), -1.0)
        is_wall = hit & (hit_agent == -1)
        ha = jnp.clip(hit_agent, 0, A - 1)
        is_mate = hit & (hit_agent >= 0) & (teams[ha] == teams[:, None, None])
        is_opp = hit & (hit_agent >= 0) & (~(teams[ha] == teams[:, None, None]))
        return jnp.stack(
            [
                depth,
                is_wall.astype(jnp.float32),
                is_mate.astype(jnp.float32),
                is_opp.astype(jnp.float32),
            ],
            axis=-1,
        )  # [A, H, W, 4]

    if sensor is None:
        sensor = build_sensor_rays(cfg, m, state)

    fwd_lidar = fan(
        sensor["fwd_t"], sensor["fwd_cap_t"], sensor["fwd_cap_idx"]
    )
    rear_lidar = fan(
        sensor["rear_t"], sensor["rear_cap_t"], sensor["rear_cap_idx"]
    )

    state = state.replace(prev_fwd_depth=fwd_lidar[..., 0])
    return state, {"fwd_lidar": fwd_lidar, "rear_lidar": rear_lidar}
