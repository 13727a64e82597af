"""Movement chain: accel/pose -> aim -> collide-and-slide -> fall.

Vectorized over all agents at once; the reference runs these as per-entity
taskgraph nodes (pvpMovementSystem sim.cpp:2093-2199, pvpContinuousAimSystem
sim.cpp:2266-2282, pvpDiscreteAimSystem sim.cpp:2284-2334, applyVelocitySystem
sim.cpp:889-1028, fallSystem sim.cpp:1041-1095). Every sphere cast below is a
batched sweep against the full triangle soup; the ~8 casts per agent per step
are the dominant env compute (SURVEY.md §3.4).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from .. import consts
from ..config import EnvConfig
from ..assets.map_data import MapData
from ..ops import geom
from ..ops.raycast import sphere_cast_grouped
from .types import Actions, Pose, WorldState

INF = jnp.inf

# unstick probes treat anything clear beyond this as fully open (see
# apply_velocity_system; keeps dense and cell-culled backends identical)
UNSTICK_RANGE = 64.0

# nonlinear discrete-aim turn tables (sim.cpp:2300-2323); numpy at module
# scope (device constants are created lazily under trace)
import numpy as _np

_YAW_TURNS = _np.asarray(
    [0.0, 0.00390625, 0.0078125, 0.015625, 0.03125, 0.0625, 0.125], _np.float32
) * consts.pi
_PITCH_TURNS = _np.asarray(
    [0.0, 0.0078125, 0.015625, 0.03125], _np.float32
) * consts.pi


def movement_system(cfg: EnvConfig, state: WorldState, actions: Actions):
    """Deceleration, pose transitions, acceleration, velocity clamp
    (pvpMovementSystem)."""
    alive = state.alive > 0.0

    # decelerate
    v = state.vel
    v_len = jnp.linalg.norm(v, axis=-1)
    v_norm = jnp.where(
        v_len[:, None] > 0.0, v / jnp.maximum(v_len[:, None], 1e-30), 0.0
    )
    v_len_d = jnp.maximum(v_len - consts.deaccelerate_rate * consts.delta_t, 0.0)
    v = v_norm * v_len_d[:, None]

    # pose transition countdown
    trans = state.stand_transition
    cur = state.stand_cur
    tgt = state.stand_tgt
    ticking = trans > 0
    trans = jnp.where(ticking, trans - 1, trans)
    cur = jnp.where(ticking & (trans == 0), tgt, cur)

    # new target pose from action
    action_pose = actions.stand
    changed = action_pose != tgt
    new_tgt = jnp.where(changed, action_pose, tgt)
    dist = jnp.abs(new_tgt - cur)
    trans = jnp.where(
        changed, dist * (consts.pose_transition_speed // 2), trans
    )
    tgt = new_tgt

    # acceleration by move bucket
    accel_max = jnp.where(
        cur == Pose.Crouch, 100.0, jnp.where(cur == Pose.Prone, 50.0, 3000.0)
    )
    move_amount = actions.move_amount.astype(jnp.float32) * (
        accel_max / (consts.num_move_amount_buckets - 1)
    )
    move_angle = actions.move_angle.astype(jnp.float32) * (
        2.0 * consts.pi / consts.num_move_angle_buckets
    )
    f_x = move_amount * jnp.sin(move_angle)
    f_y = move_amount * jnp.cos(move_angle)

    body_fwd, body_right = geom.body_fwd_right(state.yaw)
    accel = body_right * f_x[:, None] + body_fwd * f_y[:, None]
    v = v + accel * consts.delta_t

    respawn_steps = jnp.where(
        (move_amount != 0.0) & alive, 0, state.respawn_steps
    )

    # max-velocity ramp + clamp
    tgt_max = jnp.where(
        cur == Pose.Stand,
        jnp.where(
            actions.move_amount == 2,
            consts.max_run_velocity,
            consts.max_walk_velocity,
        ),
        jnp.where(
            cur == Pose.Crouch,
            consts.max_crouch_velocity,
            consts.max_prone_velocity,
        ),
    )
    max_vel_adjust = jnp.clip(tgt_max - state.max_vel, -510.0, 510.0)

    v_len2 = jnp.linalg.norm(v, axis=-1)
    nonzero = v_len2 > 0.0
    # maxVelocity only updates when velocity is nonzero (early return in ref)
    max_vel = jnp.where(
        nonzero & alive, state.max_vel + max_vel_adjust, state.max_vel
    )
    v_norm2 = jnp.where(
        nonzero[:, None], v / jnp.maximum(v_len2[:, None], 1e-30), 0.0
    )
    v = v_norm2 * jnp.minimum(v_len2, max_vel)[:, None]

    # dead agents: untouched
    return state.replace(
        vel=jnp.where(alive[:, None], v, state.vel),
        stand_cur=jnp.where(alive, cur, state.stand_cur),
        stand_tgt=jnp.where(alive, tgt, state.stand_tgt),
        stand_transition=jnp.where(alive, trans, state.stand_transition),
        max_vel=jnp.where(alive, max_vel, state.max_vel),
        respawn_steps=respawn_steps,
    )


def aim_systems(cfg: EnvConfig, state: WorldState, actions: Actions):
    """Continuous + discrete aim (both run every step in the reference)."""
    alive = state.alive > 0.0

    yaw = state.yaw + actions.aim_yaw_rate * consts.delta_t
    pitch = state.pitch + actions.aim_pitch_rate * consts.delta_t
    yaw, pitch = geom.compute_aim(yaw, pitch)

    yb = actions.aim_yaw - consts.discrete_aim_num_yaw_buckets // 2
    pb = actions.aim_pitch - consts.discrete_aim_num_pitch_buckets // 2
    yaw = yaw + jnp.sign(yb) * jnp.asarray(_YAW_TURNS)[jnp.abs(yb)]
    pitch = pitch + jnp.sign(pb) * jnp.asarray(_PITCH_TURNS)[jnp.abs(pb)]
    yaw, pitch = geom.compute_aim(yaw, pitch)

    return state.replace(
        yaw=jnp.where(alive, yaw, state.yaw),
        pitch=jnp.where(alive, pitch, state.pitch),
    )


def _cast_group(m: MapData, o, d, r, cells, with_normal=True):
    """Grouped sphere casts [A, CPA, 3] against the map (culled kernel when
    the map has candidate tables)."""
    return sphere_cast_grouped(
        o, d, r, m.tris, cells=cells, tables=m.cells, with_normal=with_normal
    )


def _use_planar_casts(m: MapData) -> bool:
    """The TPU default path feeds the planar sphere-cast kernel with
    component rows assembled directly from per-agent scalars (no [R, 8]
    operand packing / layout copies); the culled + CPU paths keep the
    vector-form casts."""
    from ..ops import raycast as rc

    return rc.use_pallas() and m.tris.sc_packedT is not None


def _use_sc_pack(m: MapData) -> bool:
    """Auto-gate for the packed short-table L2/L3/fall casts
    (MPENV_SC_PACK: 1 force, 0 off, auto by map size). The packed launch
    costs a sorted-layout pad + per-block fixed overhead that measured
    -40% end-to-end on simple_map's 256-tri soup (round 3), but on big
    maps the dense planar sweep it replaces grows with T while the packed
    sweep stays at K — the same T >= 4K crossover shape as the sensor-fan
    gate (ops/raycast.py fan_cull_wins)."""
    st = getattr(m, "short_mv", None)
    if st is None:
        return False
    mode = os.environ.get("MPENV_SC_PACK", "auto")
    if mode in ("0", "1"):
        return mode == "1"
    return m.tris.packed.shape[1] >= 4 * st.K


def apply_velocity_system(cfg: EnvConfig, m: MapData, state: WorldState,
                          cells=None):
    """Capsule collide-and-slide via sphere casts (applyVelocitySystem,
    sim.cpp:889-1028). Returns (new_pos, new_vel) committed immediately
    (updateMoveStateSystem).

    The ~10 casts per agent are batched into three launches by data
    dependency: L1 = {slope, low, high, unstick x4} (all from the start
    position), L2 = {slide, unstick ground-check}, L3 = {ground snap}."""
    r = consts.agent_radius
    buf = 0.05 * r
    up = jnp.array([0.0, 0.0, 1.0])

    x = state.pos
    v = state.vel * jnp.array([1.0, 1.0, 0.0])
    v_len = jnp.linalg.norm(v, axis=-1)
    moving = v_len > 0.0
    v_norm = jnp.where(moving[:, None], v / jnp.maximum(v_len[:, None], 1e-30), 0.0)
    move_dist = v_len * consts.delta_t

    cur = state.stand_cur
    top = jnp.where(
        cur == Pose.Crouch,
        consts.crouch_height - r,
        jnp.where(cur == Pose.Prone, consts.prone_height, consts.stand_height - r),
    )
    low = jnp.where(
        cur == Pose.Prone, consts.prone_height - r + buf, consts.prone_height
    )
    is_prone = cur == Pose.Prone

    planar = _use_planar_casts(m)
    use_short = (
        planar and m.short is not None
        and os.environ.get("MPENV_SC_CULL", "1") == "1"
    )

    use_pack = planar and _use_sc_pack(m)

    if planar:
        from ..ops.raycast import sphere_cast_planar
        from ..ops.raycast_pallas import (
            sc_normals_from_idx, sphere_cast_agent_culled,
            sphere_cast_packed,
        )

        if use_short:
            from ..ops.culling import short_cell_index

            short_cells = short_cell_index(m.short, state.pos)  # [A]
        if use_pack:
            from ..ops.culling import short_cell_index

            mv_cells = short_cell_index(m.short_mv, state.pos)  # [A]

        def planar_cast(o_comps, d_comps, with_normal=True):
            # comps [A, CPA] agent-major; returns (t, global winner row).
            # The 7-cast L1 batch rides the one-agent-per-slot culled
            # kernel; the 1-2-cast batches (L2/L3/fall) pack 4-8 same-cell
            # agents per 8-lane slot against the small-margin MOVE_MARGIN
            # tables (exact for these casts — down casts are xy-bounded,
            # forward casts only consumed within move_dist + buf).
            if use_short and o_comps[0].shape[-1] >= 7:
                return sphere_cast_agent_culled(
                    o_comps, d_comps, r, short_cells, m.short,
                    with_normal=with_normal,
                )
            if use_pack and o_comps[0].shape[-1] <= 4:
                return sphere_cast_packed(
                    o_comps, d_comps, r, mv_cells, m.short_mv,
                    with_normal=with_normal,
                )
            return sphere_cast_planar(
                o_comps, d_comps, r, m.tris, with_normal=with_normal
            )

    # ---- L1: slope + two forward casts + 4 unstick probes (all from x) ----
    down = jnp.broadcast_to(-up, x.shape)
    if planar:
        xx, xy, xz = x[:, 0], x[:, 1], x[:, 2]
        vnx, vny = v_norm[:, 0], v_norm[:, 1]
        hb = buf * 0.5
        zero = jnp.zeros_like(xx)
        r2 = 2.0 * r
        # unstick dirs are v_norm rotated by k*pi/2: pure component swaps
        # (replaces 4 rotate_z trig launches)
        o1x = jnp.stack([
            xx, xx + vnx * hb, xx + vnx * hb,
            xx - r2 * vnx, xx + r2 * vny, xx + r2 * vnx, xx - r2 * vny,
        ], axis=1)  # [A, 7]
        o1y = jnp.stack([
            xy, xy + vny * hb, xy + vny * hb,
            xy - r2 * vny, xy - r2 * vnx, xy + r2 * vny, xy + r2 * vnx,
        ], axis=1)
        o1z = jnp.stack([
            xz + top, xz + low, xz + top,
            xz + low, xz + low, xz + low, xz + low,
        ], axis=1)
        d1x = jnp.stack([zero, vnx, vnx, vnx, -vny, -vnx, vny], axis=1)
        d1y = jnp.stack([zero, vny, vny, vny, vnx, -vny, -vnx], axis=1)
        d1z = jnp.stack([-jnp.ones_like(xx)] + [zero] * 6, axis=1)
        t1p, idx1 = planar_cast((o1x, o1y, o1z), (d1x, d1y, d1z))  # [A, 7]
        # normals only for the three casts that consume them
        o3 = jnp.stack([o1x[:, :3], o1y[:, :3], o1z[:, :3]], axis=-1)
        d3 = jnp.stack([d1x[:, :3], d1y[:, :3], d1z[:, :3]], axis=-1)
        n3 = sc_normals_from_idx(
            o3, d3, t1p[:, :3], idx1[:, :3], m.tris
        )  # [A, 3, 3]
        t_s, n_s = t1p[:, 0], n3[:, 0]
        t_low, n_low = t1p[:, 1], n3[:, 1]
        t_high, n_high = t1p[:, 2], n3[:, 2]
        t_un = t1p[:, 3:7]  # [A, 4]
        un_dirs = None  # planar L2 selects the best dir by component
    else:
        o_slope = x + up * top[:, None]
        o_low = x + v_norm * (buf * 0.5) + up * low[:, None]
        o_high = x + v_norm * (buf * 0.5) + up * top[:, None]
        un_dirs = jnp.stack(
            [geom.rotate_z(v_norm, k * consts.pi * 0.5) for k in range(4)],
            axis=1,
        )  # [A, 4, 3]
        o_un = x[:, None, :] - un_dirs * (2.0 * r) + up * low[:, None, None]

        o1 = jnp.concatenate(
            [jnp.stack([o_slope, o_low, o_high], axis=1), o_un], axis=1
        )  # [A, 7, 3]
        d1 = jnp.concatenate(
            [jnp.stack([down, v_norm, v_norm], axis=1), un_dirs], axis=1
        )
        t1, n1 = _cast_group(m, o1, d1, r, cells)
        t_s, n_s = t1[:, 0], n1[:, 0]
        t_low, n_low = t1[:, 1], n1[:, 1]
        t_high, n_high = t1[:, 2], n1[:, 2]
        t_un = t1[:, 3:7]

    slope_block = (
        (n_s[:, 2] > 0.0)
        & (n_s[:, 2] < 0.7)
        & (jnp.einsum("ad,ad->a", n_s, v_norm) < 0.0)
    )

    t_high = jnp.where(is_prone, t_low, t_high)
    n_high = jnp.where(is_prone[:, None], n_low, n_high)

    high_closer = t_high < t_low
    low_dist_raw = jnp.where(high_closer, t_high, t_low)
    normal = jnp.where(high_closer[:, None], n_high, n_low)
    high_hit = high_closer

    stuck = (t_low == 0.0) | (t_high == 0.0)
    low_dist = jnp.maximum(0.0, low_dist_raw - buf)
    hit_pos = x + v_norm * jnp.minimum(low_dist, move_dist)[:, None]

    # unstick resolution (sim.cpp:984-1012); the cast origins only depend
    # on x so the probes rode L1, and the unstick ground check rides L2.
    # Probe distances are range-clamped: any direction clear beyond
    # UNSTICK_RANGE counts as fully open (the reference argmaxes unclamped
    # distances, src/sim.cpp:1000; clamping keeps the choice identical
    # across dense/culled backends and an escape needs only ~2r of room)
    t_un_val = jnp.where(t_un > UNSTICK_RANGE, 3.0e38, t_un)
    furthest = jnp.max(t_un_val, axis=1)
    best_dir_idx = jnp.argmax(t_un_val, axis=1)
    any_dir = furthest > 0.0
    un_step = jnp.minimum(furthest - 2.0 * r, -buf)

    if planar:
        # best unstick dir by component select (no gather)
        i = best_dir_idx
        bdx = jnp.where(
            i == 0, vnx, jnp.where(i == 1, -vny, jnp.where(i == 2, -vnx, vny))
        )
        bdy = jnp.where(
            i == 0, vny, jnp.where(i == 1, vnx, jnp.where(i == 2, -vny, -vnx))
        )
        un_px = xx + bdx * un_step
        un_py = xy + bdy * un_step
        un_gcz = xz + top
        un_pos = jnp.stack([un_px, un_py, xz], axis=-1)
        un_gc = jnp.stack([un_px, un_py, un_gcz], axis=-1)

        # slide dir = normalize(cross(up, normal)), sign-flipped toward v
        nxc, nyc = normal[:, 0], normal[:, 1]
        sl_len = jnp.sqrt(nxc * nxc + nyc * nyc)
        inv_sl = jnp.where(sl_len > 1e-12, 1.0 / jnp.maximum(sl_len, 1e-30),
                           0.0)
        sdx = -nyc * inv_sl
        sdy = nxc * inv_sl
        flip = (sdx * vnx + sdy * vny) < 0.0
        sdx = jnp.where(flip, -sdx, sdx)
        sdy = jnp.where(flip, -sdy, sdy)
        slide_dir = jnp.stack([sdx, sdy, jnp.zeros_like(sdx)], axis=-1)

        h_sel = jnp.where(high_hit, top, low)
        o2x = jnp.stack([xx + vnx * low_dist, un_px], axis=1)  # [A, 2]
        o2y = jnp.stack([xy + vny * low_dist, un_py], axis=1)
        o2z = jnp.stack([xz + h_sel, un_gcz], axis=1)
        d2x = jnp.stack([sdx, jnp.zeros_like(sdx)], axis=1)
        d2y = jnp.stack([sdy, jnp.zeros_like(sdy)], axis=1)
        d2z = jnp.stack(
            [jnp.zeros_like(sdx), -jnp.ones_like(sdx)], axis=1
        )
        t2p, _ = planar_cast(
            (o2x, o2y, o2z), (d2x, d2y, d2z), with_normal=False
        )
        t_slide = t2p[:, 0]
        t_ground_un = t2p[:, 1]
    else:
        best_dir = jnp.take_along_axis(
            un_dirs, best_dir_idx[:, None, None], axis=1
        )[:, 0, :]
        un_pos = x + best_dir * un_step[:, None]
        un_gc = un_pos + up * top[:, None]

        # ---- L2: one slide step + unstick ground check ----
        slide_dir = jnp.cross(jnp.broadcast_to(up, normal.shape), normal)
        slide_dir = geom.normalize(slide_dir)
        flip = jnp.einsum("ad,ad->a", slide_dir, v_norm) < 0.0
        slide_dir = jnp.where(flip[:, None], -slide_dir, slide_dir)
        o_slide = x + v_norm * low_dist[:, None] + up * jnp.where(
            high_hit, top, low
        )[:, None]

        o2 = jnp.stack([o_slide, un_gc], axis=1)
        d2 = jnp.stack([slide_dir, down], axis=1)
        t2, _ = _cast_group(m, o2, d2, r, cells, with_normal=False)
        t_slide = t2[:, 0]
        t_ground_un = t2[:, 1]

    slide_needed = move_dist > low_dist
    slide_dist = jnp.maximum(0.0, t_slide - buf)
    slide_dist = jnp.minimum(slide_dist, jnp.maximum(move_dist - low_dist, 0.0))
    hit_pos = jnp.where(
        (slide_needed & (slide_dist > 0.0))[:, None],
        hit_pos + slide_dir * slide_dist[:, None],
        hit_pos,
    )

    # ---- L3: ground snap under the slid position ----
    gc_pos = hit_pos + up * top[:, None]
    if planar:
        zc = jnp.zeros_like(top)
        t3p, _ = planar_cast(
            (gc_pos[:, 0:1], gc_pos[:, 1:2], gc_pos[:, 2:3]),
            (zc[:, None], zc[:, None], -jnp.ones_like(top)[:, None]),
            with_normal=False,
        )
        t_ground = t3p[:, 0]
    else:
        t3, _ = _cast_group(
            m, gc_pos[:, None, :], down[:, None, :], r, cells,
            with_normal=False,
        )
        t_ground = t3[:, 0]

    need_unstick = (t_ground <= 0.0) | stuck
    hit_pos = jnp.where((need_unstick & any_dir)[:, None], un_pos, hit_pos)
    gc_pos = jnp.where((need_unstick & any_dir)[:, None], un_gc, gc_pos)
    t_ground = jnp.where(need_unstick & any_dir, t_ground_un, t_ground)
    no_ground = jnp.isinf(t_ground)

    # final position: stay top-of-capsule above ground, fall system drops us
    fall_dist = jnp.minimum(t_ground, top) + r
    new_pos = gc_pos - up * fall_dist[:, None]

    to_new = new_pos - x
    to_new_dist = jnp.linalg.norm(to_new, axis=-1)
    valid_move = to_new_dist > 0.0

    no_move = (~moving) | slope_block | no_ground | (~valid_move)
    out_pos = jnp.where(no_move[:, None], x, new_pos)
    out_vel = jnp.where(no_move[:, None], 0.0, to_new / consts.delta_t)
    # the reference zeroes velocity in all early-return paths (newVelocity
    # starts at zero, applyVelocity commits it unconditionally)
    return state.replace(pos=out_pos, vel=out_vel)


def fall_system(cfg: EnvConfig, m: MapData, state: WorldState, cells=None):
    """Gravity-limited ground snap (fallSystem, sim.cpp:1041-1095)."""
    r = consts.agent_radius
    cast_offset = r
    up = jnp.array([0.0, 0.0, 1.0])

    if _use_planar_casts(m):
        from ..ops.raycast import sphere_cast_planar

        zz = jnp.zeros_like(state.pos[:, 0])
        oc = (state.pos[:, 0:1], state.pos[:, 1:2],
              state.pos[:, 2:3] + (r + cast_offset))
        dc = (zz[:, None], zz[:, None], zz[:, None] - 1.0)
        if _use_sc_pack(m):
            # packed culled down cast: xy-bounded by r, exact at any depth
            # against the MOVE_MARGIN tables
            from ..ops.culling import short_cell_index
            from ..ops.raycast_pallas import sphere_cast_packed

            mv_cells = short_cell_index(m.short_mv, state.pos)
            t4p, _ = sphere_cast_packed(
                oc, dc, r, mv_cells, m.short_mv, with_normal=False
            )
        else:
            t4p, _ = sphere_cast_planar(
                oc, dc, r, m.tris, with_normal=False
            )
        t_ground = t4p[:, 0]
    else:
        o = state.pos + up * (r + cast_offset)
        down = jnp.broadcast_to(-up, o.shape)
        t4, _ = _cast_group(
            m, o[:, None, :], down[:, None, :], r, cells, with_normal=False
        )
        t_ground = t4[:, 0]

    no_fall = jnp.isinf(t_ground) | (t_ground < cast_offset)
    fall_dist = jnp.minimum(
        t_ground - cast_offset, consts.fall_rate * consts.delta_t
    )
    new_pos = state.pos - up * fall_dist[:, None]

    alive = state.alive > 0.0
    keep = no_fall | (~alive)
    return state.replace(
        pos=jnp.where(keep[:, None], state.pos, new_pos)
    )
