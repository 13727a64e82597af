"""Fused per-agent system tail: ONE Pallas launch for the scalar
bookkeeping half of the step.

The default XLA lowering of autoHealSystem -> zoneSystem ->
zoneMatchInfoSystem -> zoneRewardSystem -> doneSystem (reference
src/sim.cpp:1875-1890, 1892-1976, 4470-4673, 3849-3996, 4712-4717) emits
hundreds of tiny [W, 12]-shaped fusions whose ~3-5 us fixed cost dominates
the actual work (BASELINE.md round-3 profile: ~3 ms of a 6.9 ms step).
This kernel runs the whole chain in VMEM over [rows, worlds] tiles:
per-agent state rides 12 sublane rows x 128-world lanes, per-world scalars
ride [1, W] rows, and cross-agent reductions (team counts/means, team
spread) are sublane reductions + tiny one-hot MXU matmuls.

Scope: Task.Zone + RewardMode.Default (+ optional LearnShooting curriculum
override), no SubZones, no record collection. breadcrumbs / filters /
goal-regions / explore run BEFORE the kernel (they commute with this chain:
none of them read zone or match state, and filters receives the
post-increment step index explicitly - see sim/step.py).

Layouts:
  AG  [NA*A, W] f32: per-agent input rows (A sublane rows per field)
  WS  [NW,   W] f32: per-world scalar input rows
  AGO [NAO*A, W] f32 / WSO [NWO, W] f32: outputs

All integral quantities stay exact in f32 (everything is < 2^24).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .. import consts
from .. import config as cfgmod
from ..config import EnvConfig, RewardMode, SimFlags, Task


def _interp() -> bool:
    return os.environ.get("MPENV_PALLAS", "") == "interpret"


def use_tail_fused(cfg: EnvConfig, m, collect_log: bool) -> bool:
    """Dispatch gate (MPENV_TAIL_FUSED, default on for the TPU path)."""
    from .raycast import use_pallas

    return (
        use_pallas()
        and os.environ.get("MPENV_TAIL_FUSED", "1") == "1"
        and cfg.task == Task.Zone
        and cfg.reward_mode == RewardMode.Default
        and not cfg.has_flag(SimFlags.SubZones)
        and not collect_log
    )


# --- AG input rows (per-agent, each field spans A sublane rows) -----------
AG_POSX, AG_POSY, AG_POSZ = 0, 1, 2
AG_HP, AG_ALIVE, AG_AH = 3, 4, 5
AG_MIN_DIST, AG_CRUMB, AG_FIRED_T = 6, 7, 8
AG_KILL, AG_LANDED, AG_WSC, AG_WKILLED = 9, 10, 11, 12
AG_RELOADED, AG_HAS_DIED, AG_NEW_CELLS = 13, 14, 15
AG_RC0 = 16  # 9 reward-coef rows
NA = AG_RC0 + cfgmod.NUM_REWARD_COEFS

# --- WS input rows (per-world scalars) ------------------------------------
WS_CUR, WS_WIN, WS_TK0, WS_TK1, WS_TP0, WS_TP1 = 0, 1, 2, 3, 4, 5
WS_ZCUR, WS_ZCTRL, WS_ZCONT, WS_ZCAP = 6, 7, 8, 9
WS_ZREM, WS_ZSUP, WS_FRESET, WS_WC = 10, 11, 12, 13
WS_ZS0 = 14  # max_zones * 5 zone-stats rows
NW = WS_ZS0 + consts.max_zones * 5

# --- AGO output rows ------------------------------------------------------
AO_HP, AO_AH, AO_INZ, AO_MIN_DIST, AO_REWARD = 0, 1, 2, 3, 4
AO_KILL, AO_LANDED, AO_WKILLED, AO_WSC, AO_FIRED_T = 5, 6, 7, 8, 9
AO_DONE = 10
NAO = 11

# --- WSO output rows ------------------------------------------------------
WO_CUR, WO_FIN, WO_WIN, WO_TK0, WO_TK1, WO_TP0, WO_TP1 = 0, 1, 2, 3, 4, 5, 6
WO_ZCUR, WO_ZCTRL, WO_ZCONT, WO_ZCAP, WO_ZEARN = 7, 8, 9, 10, 11
WO_ZREM, WO_ZSUP, WO_TR0, WO_TR1, WO_NEWCAP = 12, 13, 14, 15, 16
WO_ZS0 = 17
NWO = WO_ZS0 + consts.max_zones * 5

WORLD_BLOCK = int(os.environ.get("MPENV_TAIL_WB", "256"))


def _build_zone_consts(m):
    """Bake per-zone membership/centroid constants as python floats.

    Evaluated eagerly on the current default backend so the trig matches the
    jnp zone_system bit for bit (zoneSystem membership frame,
    reference src/sim.cpp:1920-1953)."""
    from ..ops import geom

    nz = int(m.num_zones)
    # eager compile-time eval: this runs while tracing the step, but the
    # constants must be concrete (they are baked into the kernel) and
    # computed with the same backend trig as the jnp zone_system path
    with jax.ensure_compile_time_eval():
        rot = m.zone_rot[:nz]
        zminf = jax.device_get(geom.rotate_z(m.zone_min[:nz], -rot))
        zmaxf = jax.device_get(geom.rotate_z(m.zone_max[:nz], -rot))
        center = jax.device_get(0.5 * (m.zone_min[:nz] + m.zone_max[:nz]))
        cneg = jax.device_get(jnp.cos(-rot))
        sneg = jax.device_get(jnp.sin(-rot))
    return {
        "nz": nz,
        "zminf": np.asarray(zminf, np.float64),
        "zmaxf": np.asarray(zmaxf, np.float64),
        "center": np.asarray(center, np.float64),
        "cneg": np.asarray(cneg, np.float64),
        "sneg": np.asarray(sneg, np.float64),
    }


def _spread_tables(A: int, ts: int):
    """Static teammate-pair row permutations for the team-area bonus
    (sim.cpp:3969-3995): per agent, consecutive pairs of its (index-ordered)
    teammate list. Row permutations lower to static slice+concat in the
    kernel - no gathers."""
    P = max(ts - 2, 0)
    if P == 0:
        return None
    perm1, perm2 = [], []
    for i in range(P):
        perm1.append(
            [[j for j in range(A) if j // ts == a // ts and j != a][i]
             for a in range(A)]
        )
        perm2.append(
            [[j for j in range(A) if j // ts == a // ts and j != a][i + 1]
             for a in range(A)]
        )
    return perm1, perm2


def _make_kernel(cfg: EnvConfig, zc, area: float, spread_g):
    A = cfg.num_agents
    ts = cfg.team_size
    nz = zc["nz"]
    episode_len = float(cfg.episode_len)
    enable_curriculum = cfg.has_flag(SimFlags.EnableCurriculum)
    lift = float(consts.stand_height / 2.0)
    Z = consts.max_zones

    def zsel(zcur, table):
        """Per-world select from a per-zone host-constant table."""
        acc = jnp.full_like(zcur, float(table[0]))
        for z in range(1, nz):
            acc = jnp.where(zcur == float(z), float(table[z]), acc)
        return acc

    def kernel(ag_ref, ws_ref, ago_ref, wso_ref):
        def agf(k):
            return ag_ref[k * A:(k + 1) * A, :]  # [A, WB]

        def wsf(k):
            return ws_ref[k:k + 1, :]  # [1, WB]

        px, py, pz = agf(AG_POSX), agf(AG_POSY), agf(AG_POSZ)
        hp, alive, ah = agf(AG_HP), agf(AG_ALIVE), agf(AG_AH)
        min_dist = agf(AG_MIN_DIST)
        rc = [agf(AG_RC0 + k) for k in range(cfgmod.NUM_REWARD_COEFS)]

        row = jax.lax.broadcasted_iota(jnp.int32, (A, 1), 0)
        team0 = row < ts  # [A, 1] bool
        team_row = jnp.where(team0, 0.0, 1.0)

        # ---- autoHealSystem (sim.cpp:1875-1890) ----
        alive_b = alive > 0.0
        heal = alive_b & (ah == 0.0) & (hp < 100.0)
        hp = jnp.where(
            heal,
            jnp.minimum(100.0, hp + consts.autoheal_amount_per_step),
            hp,
        )
        ah = jnp.where(alive_b & (ah > 0.0), ah - 1.0, ah)

        # ---- zoneSystem (sim.cpp:1892-1976) ----
        zcur = wsf(WS_ZCUR)
        ctrl = wsf(WS_ZCTRL)
        zrem = wsf(WS_ZREM) - jnp.where(ctrl != -1.0, 1.0, 0.0)
        rotate = zrem == 0.0
        new_zone = jnp.where(zcur + 1.0 == float(nz), 0.0, zcur + 1.0)
        zcur = jnp.where(rotate, new_zone, zcur)
        zcap = jnp.where(rotate, 0.0, wsf(WS_ZCAP))
        zrem = jnp.where(rotate, float(consts.num_steps_per_zone), zrem)
        zsup = jnp.where(
            rotate, float(consts.zone_point_interval), wsf(WS_ZSUP)
        )

        cx = zsel(zcur, zc["center"][:, 0])
        cy = zsel(zcur, zc["center"][:, 1])
        cz = zsel(zcur, zc["center"][:, 2])
        dx, dy, dz = px - cx, py - cy, pz - cz
        dist_center = jnp.sqrt(dx * dx + dy * dy + dz * dz)  # [A, WB]
        min_dist = jnp.where(rotate, dist_center, min_dist)

        cn, sn = zsel(zcur, zc["cneg"]), zsel(zcur, zc["sneg"])
        pz2 = pz + lift
        pfx = cn * px - sn * py
        pfy = sn * px + cn * py
        in_zone = (
            (pfx >= zsel(zcur, zc["zminf"][:, 0]))
            & (pfx <= zsel(zcur, zc["zmaxf"][:, 0]))
            & (pfy >= zsel(zcur, zc["zminf"][:, 1]))
            & (pfy <= zsel(zcur, zc["zmaxf"][:, 1]))
            & (pz2 >= zsel(zcur, zc["zminf"][:, 2]))
            & (pz2 <= zsel(zcur, zc["zmaxf"][:, 2]))
        )  # [A, WB]

        inz_f = jnp.where(in_zone, 1.0, 0.0)
        num_a = jnp.sum(
            jnp.where(team0, inz_f, 0.0), axis=0, keepdims=True
        )
        num_b = jnp.sum(
            jnp.where(team0, 0.0, inz_f), axis=0, keepdims=True
        )

        zsup = zsup - 1.0
        contested = (num_a > 0.0) & (num_b > 0.0)
        nobody = (num_a == 0.0) & (num_b == 0.0)
        reset_ctrl = contested | nobody
        a_takes = (num_a > 0.0) & (num_b == 0.0) & (ctrl != 0.0)
        b_takes = (num_b > 0.0) & (num_a == 0.0) & (ctrl != 1.0)
        ctrl = jnp.where(
            reset_ctrl,
            -1.0,
            jnp.where(a_takes, 0.0, jnp.where(b_takes, 1.0, ctrl)),
        )
        changed = reset_ctrl | a_takes | b_takes
        zcap = jnp.where(changed, 0.0, zcap)
        zsup = jnp.where(changed, float(consts.zone_point_interval), zsup)

        # ---- zoneMatchInfoSystem (sim.cpp:4470-4673) ----
        cur_step = wsf(WS_CUR) + 1.0
        finished = (cur_step >= episode_len) | (wsf(WS_FRESET) != 0.0)
        first = cur_step == 1.0
        tk0 = jnp.where(first, 0.0, wsf(WS_TK0))
        tk1 = jnp.where(first, 0.0, wsf(WS_TK1))
        tp0 = jnp.where(first, 0.0, wsf(WS_TP0))
        tp1 = jnp.where(first, 0.0, wsf(WS_TP1))
        win = jnp.where(first, -1.0, wsf(WS_WIN))

        wkilled = agf(AG_WKILLED)
        tk0 = tk0 + jnp.sum(
            jnp.where(team0, 0.0, wkilled), axis=0, keepdims=True
        )
        tk1 = tk1 + jnp.sum(
            jnp.where(team0, wkilled, 0.0), axis=0, keepdims=True
        )

        earned = zsup == 0.0
        zsup = jnp.where(earned, float(consts.zone_point_interval), zsup)
        new_captured = earned & (zcap == 0.0)
        zcap = jnp.where(earned, 1.0, zcap)
        ctrl_cl = jnp.clip(ctrl, 0.0, 1.0)
        tp0 = tp0 + jnp.where(earned & (ctrl_cl == 0.0), 1.0, 0.0)
        tp1 = tp1 + jnp.where(earned & (ctrl_cl == 1.0), 1.0, 0.0)
        finished = finished | (tp0 >= float(consts.zone_win_points)) | (
            tp1 >= float(consts.zone_win_points)
        )

        result = jnp.where(tp0 > tp1, 0.0, jnp.where(tp1 > tp0, 1.0, 2.0))
        win = jnp.where(finished, result, win)

        # ---- zoneRewardSystem (sim.cpp:3849-3996) ----
        dead = alive == 0.0
        landed = agf(AG_LANDED)
        wsc = agf(AG_WSC)
        kill = agf(AG_KILL)
        reloaded = agf(AG_RELOADED)
        fired_t = agf(AG_FIRED_T)
        new_cells = agf(AG_NEW_CELLS)
        has_died = agf(AG_HAS_DIED)

        r = -rc[cfgmod.RC_BREADCRUMB_SCALE] * agf(AG_CRUMB)
        r = r - jnp.where(reloaded > 0.0, 0.5, 0.0)
        r = r + jnp.where(kill > 0.0, 1.0, 0.0)
        r = r + jnp.where(landed >= 0.0, rc[cfgmod.RC_SHOT_SCALE], 0.0)
        r = r - jnp.where(wkilled > 0.0, 1.5, 0.0)
        r = r - jnp.where(wsc > 0.0, rc[cfgmod.RC_SHOT_SCALE], 0.0)
        r = r + new_cells * rc[cfgmod.RC_EXPLORE_SCALE]

        min_dist_post_zone = min_dist
        closer = (~in_zone) & (dist_center < min_dist)
        scale = rc[cfgmod.RC_ZONE_DIST_SCALE] * jnp.where(
            has_died > 0.0, 1.0, 10.0
        )
        r = r + jnp.where(closer, scale * (min_dist - dist_center), 0.0)
        min_dist = jnp.where(closer, dist_center, min_dist)
        r = r + jnp.where(in_zone, rc[cfgmod.RC_IN_ZONE_SCALE], 0.0)

        mine = ctrl == team_row
        other = (ctrl != -1.0) & (~mine)
        r = r + jnp.where(mine, rc[cfgmod.RC_ZONE_TEAM_CTRL_SCALE], 0.0)
        r = r + jnp.where(
            mine & earned, rc[cfgmod.RC_ZONE_EARNED_POINT_SCALE], 0.0
        )
        r = r - jnp.where(other, rc[cfgmod.RC_ZONE_TEAM_CTRL_SCALE], 0.0)
        r = r - jnp.where(
            other & earned, rc[cfgmod.RC_ZONE_EARNED_POINT_SCALE], 0.0
        )

        # team-area spread bonus (sim.cpp:3969-3995)
        if spread_g is not None:
            perm1, perm2 = spread_g

            def prow(x, perm):
                return jnp.concatenate(
                    [x[j:j + 1, :] for j in perm], axis=0
                )

            poly2x = jnp.zeros_like(px)
            for i in range(len(perm1)):
                e1x = prow(px, perm1[i]) - px
                e1y = prow(py, perm1[i]) - py
                e2x = prow(px, perm2[i]) - px
                e2y = prow(py, perm2[i]) - py
                poly2x = poly2x + jnp.abs(e1x * e2y - e1y * e2x)
            spread = poly2x / (2.0 * area) * 1e-2
            r = r + jnp.where(dead, 0.0, spread)

        # LearnShooting curriculum override (sim.cpp:3707-3733)
        if enable_curriculum:
            ls = wsf(WS_WC) == 0.0  # WorldCurriculum.LearnShooting
            r_ls = jnp.where(
                landed >= 0.0,
                0.5,
                jnp.where(fired_t >= 0.0, -0.05, 0.0),
            ) - jnp.where(reloaded > 0.0, 0.5, 0.0)
            r = jnp.where(ls, r_ls, r)
            min_dist = jnp.where(ls, min_dist_post_zone, min_dist)

        # dead agents: clear transient combat flags (sim.cpp:3959-3967)
        kill = jnp.where(dead, 0.0, kill)
        landed = jnp.where(dead, -1.0, landed)
        wkilled_o = jnp.where(dead, 0.0, wkilled)
        wsc = jnp.where(dead, 0.0, wsc)
        fired_t = jnp.where(dead, -jnp.inf, fired_t)

        # team mean + team-spirit blend (sim.cpp:4292-4339)
        sum0 = jnp.sum(jnp.where(team0, r, 0.0), axis=0, keepdims=True)
        sum1 = jnp.sum(jnp.where(team0, 0.0, r), axis=0, keepdims=True)
        mean0 = sum0 / float(ts)
        mean1 = sum1 / float(ts)
        team_mean = jnp.where(team0, mean0, mean1)  # [A, WB]
        spirit = rc[cfgmod.RC_TEAM_SPIRIT]
        blended = r * (1.0 - spirit) + team_mean * spirit

        done = jnp.where(finished, 1.0, 0.0)

        # ---- writes ----
        def w_ag(k, v):
            ago_ref[k * A:(k + 1) * A, :] = jnp.broadcast_to(v, px.shape)

        w_ag(AO_HP, hp)
        w_ag(AO_AH, ah)
        w_ag(AO_INZ, inz_f)
        w_ag(AO_MIN_DIST, min_dist)
        w_ag(AO_REWARD, blended)
        w_ag(AO_KILL, kill)
        w_ag(AO_LANDED, landed)
        w_ag(AO_WKILLED, wkilled_o)
        w_ag(AO_WSC, wsc)
        w_ag(AO_FIRED_T, fired_t)
        w_ag(AO_DONE, done)

        def w_ws(k, v):
            wso_ref[k:k + 1, :] = v

        w_ws(WO_CUR, cur_step)
        w_ws(WO_FIN, jnp.where(finished, 1.0, 0.0))
        w_ws(WO_WIN, win)
        w_ws(WO_TK0, tk0)
        w_ws(WO_TK1, tk1)
        w_ws(WO_TP0, tp0)
        w_ws(WO_TP1, tp1)
        w_ws(WO_ZCUR, zcur)
        w_ws(WO_ZCTRL, ctrl)
        w_ws(WO_ZCONT, jnp.where(contested, 1.0, 0.0))
        w_ws(WO_ZCAP, zcap)
        w_ws(WO_ZEARN, jnp.where(earned, 1.0, 0.0))
        w_ws(WO_ZREM, zrem)
        w_ws(WO_ZSUP, zsup)
        w_ws(WO_TR0, mean0)
        w_ws(WO_TR1, mean1)
        w_ws(WO_NEWCAP, jnp.where(new_captured, 1.0, 0.0))

        # zone stats (sim.cpp:4573-4589): columns
        # [swaps, capturedA, capturedB, contested, active]
        for z in range(Z):
            if z < nz:
                mz = zcur == float(z)
                inc_active = jnp.where(mz, 1.0, 0.0)
                inc_capa = jnp.where(
                    mz & (zcap > 0.0) & (ctrl_cl == 0.0), 1.0, 0.0
                )
                inc_capb = jnp.where(
                    mz & (zcap > 0.0) & (ctrl_cl == 1.0), 1.0, 0.0
                )
                inc_cont = jnp.where(mz & contested, 1.0, 0.0)
                inc_swap = jnp.where(mz & new_captured, 1.0, 0.0)
            else:
                zero = jnp.zeros_like(zcur)
                inc_active = inc_capa = inc_capb = inc_cont = inc_swap = zero
            base = WS_ZS0 + z * 5
            obase = WO_ZS0 + z * 5
            w_ws(obase + 0, wsf(base + 0) + inc_swap)
            w_ws(obase + 1, wsf(base + 1) + inc_capa)
            w_ws(obase + 2, wsf(base + 2) + inc_capb)
            w_ws(obase + 3, wsf(base + 3) + inc_cont)
            w_ws(obase + 4, wsf(base + 4) + inc_active)

    return kernel


_TAIL_CACHE = {}


def _get_tail_call(cfg: EnvConfig, m):
    key = (cfg, id(m), _interp(), WORLD_BLOCK)
    if key in _TAIL_CACHE:
        return _TAIL_CACHE[key]

    A = cfg.num_agents
    zc = _build_zone_consts(m)
    with jax.ensure_compile_time_eval():
        wmin = jax.device_get(m.world_min)
        wmax = jax.device_get(m.world_max)
    area = float(
        (float(wmax[0]) - float(wmin[0])) * (float(wmax[1]) - float(wmin[1]))
    )
    spread_g = _spread_tables(A, cfg.team_size)
    kernel = _make_kernel(cfg, zc, area, spread_g)
    WB = WORLD_BLOCK

    def r8(n):
        return -(-n // 8) * 8

    def call(ag, ws):
        W = ag.shape[1]
        W_pad = -(-W // WB) * WB
        ag = jnp.pad(ag, ((0, r8(NA * A) - NA * A), (0, W_pad - W)))
        ws = jnp.pad(ws, ((0, r8(NW) - NW), (0, W_pad - W)))
        ago, wso = pl.pallas_call(
            kernel,
            grid=(W_pad // WB,),
            in_specs=[
                pl.BlockSpec((r8(NA * A), WB), lambda i: (0, i)),
                pl.BlockSpec((r8(NW), WB), lambda i: (0, i)),
            ],
            out_specs=[
                pl.BlockSpec((r8(NAO * A), WB), lambda i: (0, i)),
                pl.BlockSpec((r8(NWO), WB), lambda i: (0, i)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((r8(NAO * A), W_pad), jnp.float32),
                jax.ShapeDtypeStruct((r8(NWO), W_pad), jnp.float32),
            ],
            interpret=_interp(),
        )(ag, ws)
        return ago[:NAO * A, :W], wso[:NWO, :W]

    _TAIL_CACHE[key] = call
    return call


def _tail_batched(cfg: EnvConfig, m, state, force_reset):
    """Batched entry: state leaves [W, ...]; force_reset [W]."""
    A = cfg.num_agents
    W = state.pos.shape[0]
    f32 = jnp.float32

    def t(x):
        return x.astype(f32).T  # [W, A] -> [A, W]

    ag = jnp.concatenate(
        [
            t(state.pos[..., 0]), t(state.pos[..., 1]), t(state.pos[..., 2]),
            t(state.hp), t(state.alive), t(state.autoheal_steps),
            t(state.min_dist_to_zone), t(state.crumb_total_penalty),
            t(state.fired_shot_t), t(state.successful_kill),
            t(state.landed_shot_on), t(state.was_shot_count),
            t(state.was_killed), t(state.reloaded_full_mag),
            t(state.has_died), t(state.new_cells),
        ]
        + [t(state.reward_coefs[..., k])
           for k in range(cfgmod.NUM_REWARD_COEFS)],
        axis=0,
    )  # [NA*A, W]

    def s(x):
        return x.astype(f32)[None, :]  # [W] -> [1, W]

    ws = jnp.concatenate(
        [
            s(state.cur_step), s(state.win_result),
            s(state.team_kills[:, 0]), s(state.team_kills[:, 1]),
            s(state.team_points[:, 0]), s(state.team_points[:, 1]),
            s(state.zone_cur), s(state.zone_controlling),
            s(state.zone_contested), s(state.zone_captured),
            s(state.zone_steps_remaining), s(state.zone_steps_until_point),
            s(force_reset), s(state.world_curriculum),
            state.zone_stats.astype(f32).reshape(W, -1).T,
        ],
        axis=0,
    )  # [NW, W]

    call = _get_tail_call(cfg, m)
    ago, wso = call(ag, ws)

    def ag_out(k, dtype=None):
        v = ago[k * A:(k + 1) * A, :].T  # [W, A]
        return v if dtype is None else v.astype(dtype)

    def ws_out(k, dtype=None):
        v = wso[k]
        return v if dtype is None else v.astype(dtype)

    i32 = jnp.int32
    state = state.replace(
        hp=ag_out(AO_HP),
        autoheal_steps=ag_out(AO_AH, i32),
        in_zone=ag_out(AO_INZ) > 0.0,
        min_dist_to_zone=ag_out(AO_MIN_DIST),
        reward=ag_out(AO_REWARD),
        successful_kill=ag_out(AO_KILL) > 0.0,
        landed_shot_on=ag_out(AO_LANDED, i32),
        was_killed=ag_out(AO_WKILLED) > 0.0,
        was_shot_count=ag_out(AO_WSC, i32),
        fired_shot_t=ag_out(AO_FIRED_T),
        done=ag_out(AO_DONE, i32),
        new_cells=jnp.zeros((W, A), i32),
        cur_step=ws_out(WO_CUR, i32),
        is_finished=ws_out(WO_FIN) > 0.0,
        win_result=ws_out(WO_WIN, i32),
        team_kills=jnp.stack(
            [ws_out(WO_TK0, i32), ws_out(WO_TK1, i32)], axis=-1
        ),
        team_points=jnp.stack(
            [ws_out(WO_TP0, i32), ws_out(WO_TP1, i32)], axis=-1
        ),
        zone_cur=ws_out(WO_ZCUR, i32),
        zone_controlling=ws_out(WO_ZCTRL, i32),
        zone_contested=ws_out(WO_ZCONT) > 0.0,
        zone_captured=ws_out(WO_ZCAP) > 0.0,
        zone_earned_point=ws_out(WO_ZEARN) > 0.0,
        zone_steps_remaining=ws_out(WO_ZREM, i32),
        zone_steps_until_point=ws_out(WO_ZSUP, i32),
        team_rewards=jnp.stack([ws_out(WO_TR0), ws_out(WO_TR1)], axis=-1),
        zone_stats=wso[WO_ZS0:WO_ZS0 + consts.max_zones * 5].T.reshape(
            W, consts.max_zones, 5
        ).astype(i32),
    )
    new_captured = ws_out(WO_NEWCAP) > 0.0
    return state, new_captured


def _get_tail_vmapped(cfg: EnvConfig, m):
    """custom_vmap wrapper: single-world call that batches into the kernel
    when vmapped over worlds (same pattern as the capsule-fan kernels)."""

    @jax.custom_batching.custom_vmap
    def tail(state, force_reset):
        st_b = jax.tree_util.tree_map(lambda x: x[None], state)
        st_b, new_cap = _tail_batched(
            cfg, m, st_b, jnp.asarray(force_reset)[None]
        )
        return jax.tree_util.tree_map(lambda x: x[0], st_b), new_cap[0]

    @tail.def_vmap
    def _vmap(axis_size, in_batched, state, force_reset):
        W = axis_size

        def bc(x, b):
            return x if b else jnp.broadcast_to(x[None], (W,) + x.shape)

        state = jax.tree_util.tree_map(bc, state, in_batched[0])
        fr = bc(jnp.asarray(force_reset), in_batched[1])
        out = _tail_batched(cfg, m, state, fr)
        return out, (
            jax.tree_util.tree_map(lambda _: True, out[0]), True,
        )

    return tail


_TAIL_VMAP_CACHE = {}


def tail_fused_system(cfg: EnvConfig, m, state, force_reset):
    """Single-world fused tail (vmap-aware). Replaces autoheal -> zone ->
    match-info -> rewards -> done for the Zone/Default scope."""
    key = (cfg, id(m))
    if key not in _TAIL_VMAP_CACHE:
        _TAIL_VMAP_CACHE[key] = _get_tail_vmapped(cfg, m)
    return _TAIL_VMAP_CACHE[key](state, force_reset)
