"""Binary record/event formats.

Numpy structured dtypes matching the reference's raw struct dumps byte for
byte (layouts verified against compiled sizeof/offsetof):

- ``StepLog`` / ``AgentLogData``  (reference src/types.hpp:574-589) —
  full-precision per-step record for deterministic replay, appended as
  ``StepLog[num_worlds]`` per step (mgr.cpp:481-505).
- ``PackedStepSnapshot`` / ``PackedPlayerSnapshot`` / ``PackedMatchState``
  (types.hpp:596-635) — quantized per-step snapshots -> ``steps.bin``.
- ``GameEvent`` tagged union (types.hpp:729-760) -> ``events.bin``
  (writeGameEvents, mgr.cpp:104-117: raw struct append).
- ``CurriculumSnapshot`` (types.hpp:816-819) — packed snapshots consumed by
  trajectory-curriculum resets (mgr.cpp:1424-1441).
- ``TeamConvexHull`` (types.hpp:724-727) — int16 XY hull blob stored in the
  analytics DB (build_db.cpp:9-72).
"""

from __future__ import annotations

import numpy as np


class EventType:
    """EventType bitmask (types.hpp:712-718)."""

    NONE = 0
    CAPTURE = 1 << 0
    RELOAD = 1 << 1
    KILL = 1 << 2
    PLAYER_SHOT = 1 << 3


class PackedPlayerStateFlags:
    """PackedPlayerStateFlags (types.hpp:596-601)."""

    NONE = 0
    FIRED_SHOT = 1 << 1
    CROUCH = 1 << 2
    PRONE = 1 << 3


MAX_PLAYERS = 12  # consts::maxTeamSize * 2

# AgentLogData: 72 bytes (position, aim {yaw,pitch,quat wxyz}, hp, magazine,
# stand state, shotAgentIdx, firedShotT, kill flags + 2 pad)
AGENT_LOG_DTYPE = np.dtype(
    {
        "names": [
            "pos",
            "aim_yaw",
            "aim_pitch",
            "aim_rot",  # quaternion (w, x, y, z)
            "hp",
            "mag_bullets",
            "mag_reloading",
            "stand_cur",
            "stand_tgt",
            "stand_transition",
            "shot_agent_idx",
            "fired_shot_t",
            "was_killed",
            "successful_kill",
        ],
        "formats": [
            ("<f4", (3,)),
            "<f4",
            "<f4",
            ("<f4", (4,)),
            "<f4",
            "<i4",
            "<i4",
            "<i4",
            "<i4",
            "<i4",
            "<i4",
            "<f4",
            "u1",
            "u1",
        ],
        "offsets": [0, 12, 16, 20, 36, 40, 44, 48, 52, 56, 60, 64, 68, 69],
        "itemsize": 72,
    }
)

# StepLog: 868 bytes (12 AgentLogData + curStep)
STEP_LOG_DTYPE = np.dtype(
    {
        "names": ["agent_data", "cur_step"],
        "formats": [(AGENT_LOG_DTYPE, (MAX_PLAYERS,)), "<i4"],
        "offsets": [0, 864],
        "itemsize": 868,
    }
)

# PackedPlayerSnapshot: 14 bytes
PACKED_PLAYER_DTYPE = np.dtype(
    {
        "names": [
            "pos",
            "yaw",
            "pitch",
            "mag_bullets",
            "is_reloading",
            "hp",
            "flags",
        ],
        "formats": [("<i2", (3,)), "<i2", "<i2", "u1", "u1", "u1", "u1"],
        "offsets": [0, 6, 8, 10, 11, 12, 13],
        "itemsize": 14,
    }
)

# PackedMatchState: 8 bytes
PACKED_MATCH_STATE_DTYPE = np.dtype(
    {
        "names": [
            "step",
            "cur_zone",
            "cur_zone_controller",
            "zone_steps_remaining",
            "steps_until_point",
        ],
        "formats": ["<u2", "u1", "i1", "<u2", "<u2"],
        "offsets": [0, 2, 3, 4, 6],
        "itemsize": 8,
    }
)

# PackedStepSnapshot: 192 bytes
PACKED_STEP_SNAPSHOT_DTYPE = np.dtype(
    {
        "names": ["num_events", "event_mask", "match_id", "match_state", "players"],
        "formats": [
            "<u4",
            "<u4",
            "<u8",
            PACKED_MATCH_STATE_DTYPE,
            (PACKED_PLAYER_DTYPE, (MAX_PLAYERS,)),
        ],
        "offsets": [0, 4, 8, 16, 24],
        "itemsize": 192,
    }
)

# GameEvent: 24 bytes. The 4-byte union at offset 20 is exposed as two u8
# fields + one u16 covering every variant:
#   Capture:    a=zoneIDX, b=captureTeam, c=inZoneMask
#   Reload:     a=player,  b=numBulletsAtReloadTime
#   Kill:       a=killer,  b=killed
#   PlayerShot: a=attacker, b=target
GAME_EVENT_DTYPE = np.dtype(
    {
        "names": ["type", "match_id", "step", "a", "b", "c"],
        "formats": ["<u4", "<u8", "<u4", "u1", "u1", "<u2"],
        "offsets": [0, 8, 16, 20, 21, 22],
        "itemsize": 24,
    }
)

# CurriculumSnapshot: 176 bytes
CURRICULUM_SNAPSHOT_DTYPE = np.dtype(
    {
        "names": ["match_state", "players"],
        "formats": [PACKED_MATCH_STATE_DTYPE, (PACKED_PLAYER_DTYPE, (MAX_PLAYERS,))],
        "offsets": [0, 8],
        "itemsize": 176,
    }
)

# TeamConvexHull: 26 bytes (numVerts + 6 XYI16 verts)
TEAM_HULL_DTYPE = np.dtype(
    {
        "names": ["num_verts", "verts"],
        "formats": ["<i2", ("<i2", (6, 2))],
        "offsets": [0, 2],
        "itemsize": 26,
    }
)


def make_match_id(world_idx: np.ndarray, episode_idx: np.ndarray) -> np.ndarray:
    """matchID = (worldIdx << 32) | curEpisodeIdx (sim.cpp:736-738)."""
    return (np.asarray(world_idx, np.uint64) << np.uint64(32)) | np.asarray(
        episode_idx, np.uint64
    )


def load_curriculum_snapshots(path: str) -> np.ndarray:
    """Read a packed CurriculumSnapshot file into the structured layout the
    asset loader consumes (assets/map_data.py): a record array with
    ``match_state`` [S, 5] i32 and ``players`` [S, 12, 9] f32 fields."""
    raw = np.fromfile(path, dtype=CURRICULUM_SNAPSHOT_DTYPE)
    S = len(raw)
    out = np.zeros(
        S,
        dtype=[("match_state", "<i4", (5,)), ("players", "<f4", (12, 9))],
    )
    ms = raw["match_state"]
    out["match_state"][:, 0] = ms["step"]
    out["match_state"][:, 1] = ms["cur_zone"]
    out["match_state"][:, 2] = ms["cur_zone_controller"]
    out["match_state"][:, 3] = ms["zone_steps_remaining"]
    out["match_state"][:, 4] = ms["steps_until_point"]
    pl = raw["players"]
    out["players"][:, :, 0:3] = pl["pos"]
    out["players"][:, :, 3] = pl["yaw"].astype(np.float32) * (np.pi / 32768.0)
    out["players"][:, :, 4] = pl["pitch"].astype(np.float32) * (np.pi / 32768.0)
    out["players"][:, :, 5] = pl["mag_bullets"]
    out["players"][:, :, 6] = pl["is_reloading"]
    out["players"][:, :, 7] = pl["hp"]
    out["players"][:, :, 8] = pl["flags"]
    return out


def save_curriculum_snapshots(
    path: str, match_state: np.ndarray, players_quantized: np.ndarray
) -> None:
    """Write CurriculumSnapshot records (the build_trajectory_curriculum
    output format, build_trajectory_curriculum.cpp:150-160).

    match_state: [S, 5] int (step, zone, controller, remaining, until_point)
    players_quantized: [S, 12] PACKED_PLAYER_DTYPE records
    """
    S = len(match_state)
    raw = np.zeros(S, dtype=CURRICULUM_SNAPSHOT_DTYPE)
    raw["match_state"]["step"] = match_state[:, 0]
    raw["match_state"]["cur_zone"] = match_state[:, 1]
    raw["match_state"]["cur_zone_controller"] = match_state[:, 2]
    raw["match_state"]["zone_steps_remaining"] = match_state[:, 3]
    raw["match_state"]["steps_until_point"] = match_state[:, 4]
    raw["players"] = players_quantized
    raw.tofile(path)
