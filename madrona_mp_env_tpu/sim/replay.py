"""Deterministic replay.

pvpReplaySystem equivalent (reference src/sim.cpp:4794-4843): the
movement/combat half of the step is replaced by force-writing recorded
per-agent state from a StepLog, then the rest of the step graph (zone state
machine, match info, events, rewards, observations) runs normally — so a
recorded match reproduces its full event/analytics stream bit for bit.

Used by the replay viewer and as a regression harness (SURVEY.md §4.2).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import EnvConfig, Task
from ..assets.map_data import MapData
from . import breadcrumbs, explore, observations
from . import reset as reset_mod
from . import rewards, zones
from .types import WorldState


def apply_step_log(
    cfg: EnvConfig, state: WorldState, log: Dict[str, jax.Array]
) -> WorldState:
    """Force-write the recorded per-agent state (sim.cpp:4795-4843).
    ``log`` leaves have a leading 12-player axis; only the first
    ``cfg.num_agents`` entries are live."""
    A = cfg.num_agents

    def take(x):
        return x[:A]

    was_killed = take(log["was_killed"]).astype(bool)
    return state.replace(
        pos=take(log["pos"]),
        yaw=take(log["aim_yaw"]),
        pitch=take(log["aim_pitch"]),
        hp=take(log["hp"]).astype(jnp.float32),
        mag_bullets=take(log["mag_bullets"]).astype(jnp.int32),
        mag_reloading=take(log["mag_reloading"]).astype(jnp.int32),
        stand_cur=take(log["stand_cur"]).astype(jnp.int32),
        stand_tgt=take(log["stand_tgt"]).astype(jnp.int32),
        stand_transition=take(log["stand_transition"]).astype(jnp.int32),
        landed_shot_on=take(log["shot_agent_idx"]).astype(jnp.int32),
        fired_shot_t=take(log["fired_shot_t"]),
        was_killed=was_killed,
        successful_kill=take(log["successful_kill"]).astype(bool),
        has_died=state.has_died | was_killed,
        alive=jnp.where(take(log["hp"]) > 0, 1.0, 0.0).astype(jnp.float32),
        cur_step=log["cur_step"].astype(jnp.int32),
    )


def replay_step_world(
    cfg: EnvConfig,
    m: MapData,
    state: WorldState,
    log: Dict[str, jax.Array],
    init_key_data: jax.Array,
    sim_ctrl: jax.Array,
    force_reset: jax.Array,
) -> Tuple[WorldState, Dict[str, jax.Array]]:
    """One replayed step: force state from the log, then the step-graph tail
    (zones -> match info -> rewards -> done -> reset -> obs), mirroring the
    replay taskgraph (sim.cpp:5587-5605)."""
    prev_bullets = state.mag_bullets  # pre-reload count for Reload events
    state = apply_step_log(cfg, state, log)

    if cfg.task in (Task.Zone, Task.ZoneCaptureDefend):
        state = zones.zone_system(cfg, m, state)

    state = breadcrumbs.breadcrumb_system(cfg, state)

    if cfg.task in (Task.Zone, Task.ZoneCaptureDefend):
        state, new_captured = zones.zone_match_info_system(
            cfg, m, state, force_reset != 0
        )
    else:
        state, new_captured = zones.tdm_match_info_system(
            cfg, state, force_reset != 0
        )

    state = explore.goal_regions_system(cfg, m, state)
    state = explore.explore_visited_system(cfg, state)
    state = rewards.reward_system(cfg, m, state)

    done = jnp.broadcast_to(
        state.is_finished.astype(jnp.int32), (cfg.num_agents,)
    )
    state = state.replace(done=done)

    episode_result = {
        "win_result": state.win_result,
        "team_kills": state.team_kills,
        "team_points": state.team_points,
        "zone_stats": state.zone_stats,
        "match_finished": state.is_finished,
    }

    from ..data import export as data_export

    # the log stores POST-reload magazines (fire_system writes bullets =
    # mag_size and reloading = reload_time - 1 on the reload step), so the
    # reload step is recognizable as reloading == reload_time - 1, and the
    # event's bullet count is the PREVIOUS step's magazine
    reload_time = m.weapon_reload_time[state.weapon_type]
    fire_events = {
        "reload_event": state.mag_reloading == (reload_time - 1),
        "reload_bullets": prev_bullets,
        "shot_event": state.landed_shot_on >= 0,
        "shot_victim": state.landed_shot_on,
        "kill_event": state.successful_kill,
    }
    ev = data_export.event_export(cfg, state, fire_events, new_captured)
    snapshot = data_export.packed_snapshot_export(
        cfg, state, ev["num_events"], ev["event_mask"]
    )

    reward_out = state.reward
    state = reset_mod.reset_system(
        cfg, m, state, init_key_data, sim_ctrl, force_reset
    )

    sensor = observations.build_sensor_rays(cfg, m, state)
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

    return state, {
        "obs": obs,
        "reward": reward_out,
        "done": done,
        "episode_result": episode_result,
        "snapshot": snapshot,
        "game_events": ev,
    }
