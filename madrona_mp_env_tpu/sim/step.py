"""One world step: the taskgraph as a function.

Composes the systems in the reference's Step taskgraph order
(setupStepTasks, reference src/sim.cpp:5342-5842; see SURVEY.md §2.2):

  bot plan -> apply bot actions -> movement -> aim -> collide -> fall
  -> fire -> damage -> respawn -> autoheal -> zone -> breadcrumbs
  -> match info (events/filters/snapshot) -> goal regions -> explore
  -> rewards -> done -> [reset] -> visibility -> masks -> obs -> lidar

All functions take single-world state (leading dim = agents) and are
vmapped over worlds by the Env.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .. import consts
from ..config import EnvConfig, SimFlags, Task
from ..assets.map_data import MapData
from ..utils import rng
from . import bot, breadcrumbs, combat, explore, movement, observations
from . import reset as reset_mod
from . import rewards, zones
from .spawn import spawn_agents
from .types import Actions, WorldState


def step_world_core(
    cfg: EnvConfig,
    m: MapData,
    state: WorldState,
    actions: Actions,
    init_key_data: jax.Array,
    sim_ctrl: jax.Array,
    force_reset: jax.Array,
    collect_log: bool = False,
    bot_overlay: bool = True,
) -> Tuple[WorldState, Dict[str, jax.Array]]:
    """Steps 1-14 of the taskgraph (everything before reset + the
    observation tail). ``bot_overlay=False`` skips the per-world bot
    planner — step_batched hoists it behind a global any-bots cond."""
    stepk = rng.step_key(state.episode_key, state.cur_step)

    # raycast-culling cell of record for this step's movement/fire queries
    # (intra-step drift stays within culling.QUERY_MARGIN of these cells)
    if m.cells is not None:
        from ..ops.culling import cell_index

        cells_pre = cell_index(m.cells, state.pos)
    else:
        cells_pre = None

    # 1-2. scripted bot + action overlay
    if bot_overlay:
        bot_acts = bot.plan_bot_actions(
            cfg, m, state, rng.system_key(stepk, rng.Salt.BOT)
        )
        actions = bot.apply_bot_actions(cfg, state, actions, bot_acts)

    # 3. turret auto-aim controller drives team-1 rows (turretFireSystem,
    # sim.cpp:1617-1792)
    if cfg.task == Task.Turret:
        from . import turret as turret_mod

        actions = turret_mod.turret_ai_system(cfg, m, state, actions)

    # 5. movement chain
    state = movement.movement_system(cfg, state, actions)
    state = movement.aim_systems(cfg, state, actions)
    # the split collide-and-slide + fall pipeline is the production path;
    # the fused movement megakernel was measured slower in every config
    # (BASELINE.md round-3 notes) and now lives in
    # tools/probes/movement_fused_probe.py
    state = movement.apply_velocity_system(
        cfg, m, state, cells=cells_pre
    )
    state = movement.fall_system(cfg, m, state, cells=cells_pre)

    # 6. combat (fireSystem, or hlBattleSystem in high-level-move mode)
    if cfg.highlevel_move:
        from . import hl_battle

        state, fire_events = hl_battle.hl_battle_system(cfg, m, state)
    else:
        state, fire_events = combat.fire_system(
            cfg, m, state, actions, rng.system_key(stepk, rng.Salt.FIRE),
            cells=cells_pre,
        )

    # 7. damage / respawn / autoheal
    state = combat.apply_damage_system(cfg, state)
    if not cfg.has_flag(SimFlags.NoRespawn):
        state = spawn_agents(
            cfg, m, state,
            rng.system_key(stepk, rng.Salt.SPAWN), is_respawn=True,
        )
    from ..ops.tail_pallas import tail_fused_system, use_tail_fused

    if use_tail_fused(cfg, m, collect_log):
        # Fused scalar tail: ONE Pallas launch for autoheal -> zone ->
        # match-info -> rewards (ops/tail_pallas.py). breadcrumbs /
        # filters / goal-regions / explore commute with that chain (none
        # read zone or match state) and are hoisted before it; filters
        # receives the post-increment step stamp explicitly.
        step_log = None
        state = breadcrumbs.breadcrumb_system(cfg, state)
        state = explore.filters_system(
            cfg, state, fire_events["shot_victim"],
            step_override=state.cur_step + 1,
        )
        state = explore.goal_regions_system(cfg, m, state)
        state = explore.explore_visited_system(cfg, state)
        state, new_captured = tail_fused_system(
            cfg, m, state, force_reset
        )
    else:
        state = combat.autoheal_system(cfg, state)

        # 8. zone (+ optional sub-zones, sim.cpp:5542-5556)
        if cfg.task in (Task.Zone, Task.ZoneCaptureDefend):
            state = zones.zone_system(cfg, m, state)
        if cfg.has_flag(SimFlags.SubZones):
            from . import subzones

            state = subzones.subzone_system(cfg, m, state)

        # 9. record export (pvpRecordSystem slot, sim.cpp:5557-5563):
        # captures cur_step BEFORE the match-info increment, exactly like
        # the reference graph order (record = step 9, matchInfo step++ =
        # step 11)
        step_log = None
        if collect_log:
            from ..data import export as data_export

            step_log = data_export.step_log_export(cfg, state)

        # 10. breadcrumbs
        state = breadcrumbs.breadcrumb_system(cfg, state)

        # 11. match info + analytics filters
        if cfg.task in (Task.Zone, Task.ZoneCaptureDefend):
            state, new_captured = zones.zone_match_info_system(
                cfg, m, state, force_reset != 0
            )
        elif cfg.task == Task.Turret:
            from . import turret as turret_mod

            state, new_captured = turret_mod.turret_match_info_system(
                cfg, state, force_reset != 0
            )
        else:
            state, new_captured = zones.tdm_match_info_system(
                cfg, state, force_reset != 0
            )
        state = explore.filters_system(cfg, state, fire_events["shot_victim"])

        # 12. goal regions + explore grid
        state = explore.goal_regions_system(cfg, m, state)
        state = explore.explore_visited_system(cfg, state)

        # 13. rewards (+ team + final). Flank mode refreshes the LOS table
        # with current positions first — the reference raycasts inside the
        # reward system itself (src/sim.cpp:4228-4267)
        if rewards.flank_fresh_los(cfg):
            state = rewards.refresh_flank_los(cfg, m, state)
        state = rewards.reward_system(cfg, m, state)

    # 14. done
    done = jnp.broadcast_to(
        state.is_finished.astype(jnp.int32), (cfg.num_agents,)
    )
    state = state.replace(done=done)

    # episode result snapshot BEFORE the reset wipes it (exported like the
    # reference's MatchResult singleton, mgr.cpp:2427)
    episode_result = {
        "win_result": state.win_result,
        "team_kills": state.team_kills,
        "team_points": state.team_points,
        "zone_stats": state.zone_stats,
        "match_finished": state.is_finished,
    }

    # step outputs the trainer/analytics consume
    reward_out = state.reward
    events = {
        **fire_events,
        "capture_event": new_captured,
        "cur_step": state.cur_step,
    }

    # optional event-log exports (writePackedStepSnapshot sim.cpp:41-126,
    # logEvent sites): post match-info, so cur_step here is post-increment;
    # host side packs the binaries
    record_out = {}
    if collect_log:
        from ..data import export as data_export

        ev = data_export.event_export(cfg, state, fire_events, new_captured)
        record_out = {
            "step_log": step_log,
            "snapshot": data_export.packed_snapshot_export(
                cfg, state, ev["num_events"], ev["event_mask"]
            ),
            "game_events": ev,
        }

    outputs = {
        "reward": reward_out,
        "done": done,
        "episode_result": episode_result,
        "events": events,
        **record_out,
    }
    return state, outputs


def observe_tail(
    cfg: EnvConfig, m: MapData, state: WorldState
) -> Tuple[WorldState, Dict[str, jax.Array]]:
    """Observation tail of the Step taskgraph (visibility -> masks ->
    obs -> lidar -> full-team)."""
    if m.cells is not None:
        from ..ops.culling import cell_index

        cells_post = cell_index(m.cells, state.pos)
    else:
        cells_post = None
    sensor = observations.build_sensor_rays(cfg, m, state, cells=cells_post)
    can_see, opp_idx = observations.visibility_system(
        cfg, m, state, sensor=sensor
    )
    state, can_see, opp_idx = observations.split_visibility(
        cfg, state, can_see, opp_idx
    )
    masks = observations.opponent_masks_system(cfg, state, can_see, opp_idx)
    state, obs = observations.observations_system(
        cfg, m, state, can_see, opp_idx, masks
    )
    state, lidar_obs = observations.lidar_system(cfg, m, state, sensor=sensor)
    obs.update(lidar_obs)

    if cfg.has_flag(SimFlags.FullTeamPolicy):
        from . import full_team

        ft_obs, ft_lk = full_team.full_team_observations_system(
            cfg, m, state, can_see, obs["fwd_lidar"], obs["rear_lidar"]
        )
        ft_reward, ft_done = full_team.full_team_done_reward(cfg, state)
        ft_obs["full_team_reward"] = ft_reward
        ft_obs["full_team_done"] = ft_done
        obs.update(ft_obs)
        state = state.replace(ft_last_known=ft_lk)
    return state, obs


def step_world(
    cfg: EnvConfig,
    m: MapData,
    state: WorldState,
    actions: Actions,
    init_key_data: jax.Array,
    sim_ctrl: jax.Array,
    force_reset: jax.Array,
    collect_log: bool = False,
) -> Tuple[WorldState, Dict[str, jax.Array]]:
    """One world's full Step taskgraph (core -> reset -> observations).
    Batched callers should prefer step_batched, which skips the bot
    planner and the reset machinery behind global any() conds."""
    state, outputs = step_world_core(
        cfg, m, state, actions, init_key_data, sim_ctrl, force_reset,
        collect_log=collect_log,
    )
    state = reset_mod.reset_system(
        cfg, m, state, init_key_data, sim_ctrl, force_reset
    )
    state, obs = observe_tail(cfg, m, state)
    return state, {"obs": obs, **outputs}


def step_batched(
    cfg: EnvConfig,
    m: MapData,
    state: WorldState,
    actions: Actions,
    init_key_data: jax.Array,
    sim_ctrl: jax.Array,
    force_reset: jax.Array,
    collect_log: bool = False,
) -> Tuple[WorldState, Dict[str, jax.Array]]:
    """All-worlds step with global early-outs the per-world vmap cannot
    express (the reference's per-entity taskgraph nodes cost nothing for
    entities that don't need them; here the analogue is a batch-level
    lax.cond):

    - the scripted-bot planner runs only when some agent anywhere is
      assigned the A* bot policy (policy_idx == a_star_policy_id) —
      training batches have none, vs-bot eval does;
    - the reset machinery (respawn + curriculum + init) runs only on
      steps where some world actually resets.

    State/action leaves are [W, ...]; sim_ctrl is shared."""
    def overlay(state, actions):
        def f(s, a):
            stepk = rng.step_key(s.episode_key, s.cur_step)
            ba = bot.plan_bot_actions(
                cfg, m, s, rng.system_key(stepk, rng.Salt.BOT)
            )
            return bot.apply_bot_actions(cfg, s, a, ba)

        return jax.vmap(f)(state, actions)

    actions = jax.lax.cond(
        jnp.any(state.policy_idx == consts.a_star_policy_id),
        overlay, lambda s, a: a, state, actions,
    )

    core = functools.partial(
        step_world_core, cfg, m, collect_log=collect_log,
        bot_overlay=False,
    )
    state, outputs = jax.vmap(core, in_axes=(0, 0, None, None, 0))(
        state, actions, init_key_data, sim_ctrl, force_reset
    )

    should_w = force_reset != 0
    if cfg.auto_reset:
        should_w = should_w | state.is_finished
    # set OUTSIDE the cond: the identity branch must not carry last step's
    # flag (the lazily-cleared buffers' owners key on it next step)
    state = state.replace(was_reset=should_w)
    do_reset = jnp.any(should_w)

    def run_reset(state):
        return jax.vmap(
            lambda s, fr: reset_mod.reset_system(
                cfg, m, s, init_key_data, sim_ctrl, fr
            )
        )(state, force_reset)

    state = jax.lax.cond(do_reset, run_reset, lambda s: s, state)

    state, obs = jax.vmap(lambda s: observe_tail(cfg, m, s))(state)
    return state, {"obs": obs, **outputs}


def init_and_observe(
    cfg: EnvConfig,
    m: MapData,
    state: WorldState,
    init_key_data: jax.Array,
    sim_ctrl: jax.Array,
) -> Tuple[WorldState, Dict[str, jax.Array]]:
    """Init taskgraph (setupInitTasks, sim.cpp:5322-5340): force reset, then
    the observation tail."""
    state = reset_mod.reset_system(
        cfg, m, state, init_key_data, sim_ctrl, jnp.ones((), jnp.int32)
    )
    if m.cells is not None:
        from ..ops.culling import cell_index

        cells_post = cell_index(m.cells, state.pos)
    else:
        cells_post = None
    sensor = observations.build_sensor_rays(cfg, m, state, cells=cells_post)
    can_see, opp_idx = observations.visibility_system(
        cfg, m, state, sensor=sensor
    )
    state, can_see, opp_idx = observations.split_visibility(
        cfg, state, can_see, opp_idx
    )
    masks = observations.opponent_masks_system(cfg, state, can_see, opp_idx)
    state, obs = observations.observations_system(
        cfg, m, state, can_see, opp_idx, masks
    )
    state, lidar_obs = observations.lidar_system(cfg, m, state, sensor=sensor)
    obs.update(lidar_obs)

    if cfg.has_flag(SimFlags.FullTeamPolicy):
        from . import full_team

        ft_obs, ft_lk = full_team.full_team_observations_system(
            cfg, m, state, can_see, obs["fwd_lidar"], obs["rear_lidar"]
        )
        ft_reward, ft_done = full_team.full_team_done_reward(cfg, state)
        ft_obs["full_team_reward"] = ft_reward
        ft_obs["full_team_done"] = ft_done
        obs.update(ft_obs)
        state = state.replace(ft_last_known=ft_lk)

    return state, obs
