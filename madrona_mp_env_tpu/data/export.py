"""Jit-side record/snapshot exports.

Per-world functions producing the tensors that back the binary record
formats. They run inside the jitted step when recording/event logging is
enabled and cost a handful of elementwise ops — the host side
(data/recorder.py) does the struct packing.

Mirrors pvpRecordSystem (reference src/sim.cpp:4750-4792) and
writePackedStepSnapshot (sim.cpp:41-126).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .. import consts
from ..config import EnvConfig
from ..sim.types import Pose, WorldState


def _aim_quat(yaw: jax.Array, pitch: jax.Array) -> jax.Array:
    """Aim.rot = angleAxis(yaw, up) * angleAxis(pitch, right), normalized
    (computeAim, reference src/utils.cpp:140-167). Returns [..., 4] wxyz."""
    hy, hp = yaw * 0.5, pitch * 0.5
    cy, sy = jnp.cos(hy), jnp.sin(hy)
    cp, sp = jnp.cos(hp), jnp.sin(hp)
    # q_yaw = (cy, 0, 0, sy); q_pitch = (cp, sp, 0, 0); q = q_yaw * q_pitch
    w = cy * cp
    x = cy * sp
    y = sy * sp
    z = sy * cp
    q = jnp.stack([w, x, y, z], axis=-1)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def _pad_players(x: jax.Array, fill=0) -> jax.Array:
    """Pad the agent axis to 12 players (maxTeamSize * 2)."""
    pad = 12 - x.shape[0]
    if pad == 0:
        return x
    widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, widths, constant_values=fill)


def step_log_export(cfg: EnvConfig, state: WorldState) -> Dict[str, jax.Array]:
    """Full-precision per-step record of one world (AgentLogData fields,
    types.hpp:574-589). Captured AFTER combat, BEFORE the reset tail —
    same point in the step as pvpRecordSystem (sim.cpp:5557-5563)."""
    return {
        "pos": _pad_players(state.pos),
        "aim_yaw": _pad_players(state.yaw),
        "aim_pitch": _pad_players(state.pitch),
        "aim_rot": _pad_players(_aim_quat(state.yaw, state.pitch)),
        "hp": _pad_players(state.hp),
        "mag_bullets": _pad_players(state.mag_bullets),
        "mag_reloading": _pad_players(state.mag_reloading),
        "stand_cur": _pad_players(state.stand_cur),
        "stand_tgt": _pad_players(state.stand_tgt),
        "stand_transition": _pad_players(state.stand_transition),
        "shot_agent_idx": _pad_players(state.landed_shot_on, fill=-1),
        "fired_shot_t": _pad_players(state.fired_shot_t),
        "was_killed": _pad_players(state.was_killed),
        "successful_kill": _pad_players(state.successful_kill),
        "cur_step": state.cur_step,
    }


def packed_snapshot_export(
    cfg: EnvConfig, state: WorldState, num_events: jax.Array, event_mask: jax.Array
) -> Dict[str, jax.Array]:
    """Quantized PackedStepSnapshot of one world (sim.cpp:41-126):
    i16 positions, i16 angle * 32768/pi, u8 hp/mag, packed pose flags."""
    yaw_q = (state.yaw * (32768.0 / jnp.pi)).astype(jnp.int16)
    pitch_q = (state.pitch * (32768.0 / jnp.pi)).astype(jnp.int16)

    flags = jnp.where(state.landed_shot_on >= 0, 2, 0)  # FiredShot = 1 << 1
    flags = flags | jnp.where(state.stand_cur == Pose.Crouch, 4, 0)
    flags = flags | jnp.where(state.stand_cur == Pose.Prone, 8, 0)

    controller = jnp.where(state.zone_captured, state.zone_controlling, -1)

    return {
        "num_events": num_events.astype(jnp.uint32),
        "event_mask": event_mask.astype(jnp.uint32),
        "world_idx": state.world_idx,
        "episode_idx": state.episode_idx,
        "match_step": state.cur_step,
        "cur_zone": state.zone_cur,
        "cur_zone_controller": controller.astype(jnp.int32),
        "zone_steps_remaining": state.zone_steps_remaining,
        "steps_until_point": state.zone_steps_until_point,
        "player_pos": _pad_players(state.pos.astype(jnp.int16)),
        "player_yaw": _pad_players(yaw_q),
        "player_pitch": _pad_players(pitch_q),
        "player_mag": _pad_players(state.mag_bullets.astype(jnp.uint8)),
        "player_reloading": _pad_players(state.mag_reloading.astype(jnp.uint8)),
        "player_hp": _pad_players(state.hp.astype(jnp.uint8)),
        "player_flags": _pad_players(flags.astype(jnp.uint8)),
    }


def event_export(
    cfg: EnvConfig,
    state: WorldState,
    fire_events: Dict[str, jax.Array],
    new_captured: jax.Array,
) -> Dict[str, jax.Array]:
    """Per-step event flags + payloads for one world, host-compacted into
    GameEvent records (logEvent call sites: reload sim.cpp:1464-1476,
    kill/player-shot sim.cpp:1575-1611, capture sim.cpp:4592-4632)."""
    A = cfg.num_agents
    teams = jnp.arange(A, dtype=jnp.int32) // cfg.team_size

    # capture inZoneMask: controlling-team members inside the zone
    in_mask_bits = (
        state.in_zone & (teams == state.zone_controlling)
    ).astype(jnp.uint32) << jnp.arange(A, dtype=jnp.uint32)
    in_zone_mask = jnp.sum(in_mask_bits).astype(jnp.uint32)

    num_events = (
        jnp.sum(fire_events["reload_event"].astype(jnp.int32))
        + jnp.sum(fire_events["shot_event"].astype(jnp.int32))
        + jnp.sum(fire_events["kill_event"].astype(jnp.int32))
        + new_captured.astype(jnp.int32)
    )
    event_mask = (
        jnp.where(new_captured, 1, 0)
        | jnp.where(jnp.any(fire_events["reload_event"]), 2, 0)
        | jnp.where(jnp.any(fire_events["kill_event"]), 4, 0)
        | jnp.where(jnp.any(fire_events["shot_event"]), 8, 0)
    )

    return {
        "reload_event": fire_events["reload_event"],
        "reload_bullets": fire_events["reload_bullets"],
        "shot_event": fire_events["shot_event"],
        "shot_victim": fire_events["shot_victim"],
        "kill_event": fire_events["kill_event"],
        "capture_event": new_captured,
        "capture_zone": state.zone_cur,
        "capture_team": state.zone_controlling,
        "in_zone_mask": in_zone_mask,
        "num_events": num_events,
        "event_mask": event_mask.astype(jnp.uint32),
        "world_idx": state.world_idx,
        "episode_idx": state.episode_idx,
        "match_step": state.cur_step,
    }
