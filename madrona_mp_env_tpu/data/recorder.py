"""Host-side record/event-log writers and readers.

The TPU-native replacement for the Manager's staging-buffer file I/O
(reference src/mgr.cpp:376-505): the jitted step exports record tensors
(data/export.py); these classes pack them into the byte-compatible binary
formats on the host and append to files. Readers produce numpy structured
arrays (and replay pytrees) from the same files.
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, Optional

import numpy as np

from .formats import (
    AGENT_LOG_DTYPE,
    EventType,
    GAME_EVENT_DTYPE,
    MAX_PLAYERS,
    PACKED_STEP_SNAPSHOT_DTYPE,
    STEP_LOG_DTYPE,
    make_match_id,
)


def _np(tree):
    """Device pytree -> host numpy dict."""
    return {k: np.asarray(v) for k, v in tree.items()}


# ---------------------------------------------------------------- StepLog
def pack_step_logs(log: Dict[str, np.ndarray]) -> np.ndarray:
    """[W, 12, ...] step-log tensors -> StepLog[W] structured records."""
    W = log["pos"].shape[0]
    out = np.zeros(W, dtype=STEP_LOG_DTYPE)
    ad = out["agent_data"]
    ad["pos"] = log["pos"]
    ad["aim_yaw"] = log["aim_yaw"]
    ad["aim_pitch"] = log["aim_pitch"]
    ad["aim_rot"] = log["aim_rot"]
    ad["hp"] = log["hp"]
    ad["mag_bullets"] = log["mag_bullets"]
    ad["mag_reloading"] = log["mag_reloading"]
    ad["stand_cur"] = log["stand_cur"]
    ad["stand_tgt"] = log["stand_tgt"]
    ad["stand_transition"] = log["stand_transition"]
    ad["shot_agent_idx"] = log["shot_agent_idx"]
    ad["fired_shot_t"] = log["fired_shot_t"]
    ad["was_killed"] = log["was_killed"]
    ad["successful_kill"] = log["successful_kill"]
    out["cur_step"] = log["cur_step"]
    return out


def unpack_step_logs(records: np.ndarray) -> Dict[str, np.ndarray]:
    """StepLog[W] structured records -> the replay pytree layout."""
    ad = records["agent_data"]
    return {
        "pos": ad["pos"].copy(),
        "aim_yaw": ad["aim_yaw"].copy(),
        "aim_pitch": ad["aim_pitch"].copy(),
        "aim_rot": ad["aim_rot"].copy(),
        "hp": ad["hp"].copy(),
        "mag_bullets": ad["mag_bullets"].copy(),
        "mag_reloading": ad["mag_reloading"].copy(),
        "stand_cur": ad["stand_cur"].copy(),
        "stand_tgt": ad["stand_tgt"].copy(),
        "stand_transition": ad["stand_transition"].copy(),
        "shot_agent_idx": ad["shot_agent_idx"].copy(),
        "fired_shot_t": ad["fired_shot_t"].copy(),
        "was_killed": ad["was_killed"].copy(),
        "successful_kill": ad["successful_kill"].copy(),
        "cur_step": records["cur_step"].copy(),
    }


class RecordLogWriter:
    """Appends StepLog[num_worlds] per step (mgr.cpp:493-505 format)."""

    def __init__(self, path: str):
        self._f = open(path, "wb")

    def append(self, step_log) -> None:
        pack_step_logs(_np(step_log)).tofile(self._f)

    def close(self) -> None:
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class ReplayLogReader:
    """Reads a record file back as per-step replay pytrees
    (mgr.cpp:481-491 read path)."""

    def __init__(self, path: str, num_worlds: int):
        self.records = np.fromfile(path, dtype=STEP_LOG_DTYPE)
        assert len(self.records) % num_worlds == 0, (
            f"record file has {len(self.records)} StepLogs, "
            f"not a multiple of {num_worlds} worlds"
        )
        self.num_worlds = num_worlds
        self.num_steps = len(self.records) // num_worlds

    def step(self, i: int) -> Dict[str, np.ndarray]:
        chunk = self.records[i * self.num_worlds : (i + 1) * self.num_worlds]
        return unpack_step_logs(chunk)

    def __len__(self) -> int:
        return self.num_steps

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        for i in range(self.num_steps):
            yield self.step(i)


# ------------------------------------------------------------- Event log
def pack_snapshots(snap: Dict[str, np.ndarray]) -> np.ndarray:
    """[W, ...] snapshot tensors -> PackedStepSnapshot[W] records."""
    W = snap["match_step"].shape[0]
    out = np.zeros(W, dtype=PACKED_STEP_SNAPSHOT_DTYPE)
    out["num_events"] = snap["num_events"]
    out["event_mask"] = snap["event_mask"]
    out["match_id"] = make_match_id(snap["world_idx"], snap["episode_idx"])
    ms = out["match_state"]
    ms["step"] = snap["match_step"].astype(np.uint16)
    ms["cur_zone"] = snap["cur_zone"].astype(np.uint8)
    ms["cur_zone_controller"] = snap["cur_zone_controller"].astype(np.int8)
    ms["zone_steps_remaining"] = snap["zone_steps_remaining"].astype(np.uint16)
    ms["steps_until_point"] = snap["steps_until_point"].astype(np.uint16)
    pl = out["players"]
    pl["pos"] = snap["player_pos"]
    pl["yaw"] = snap["player_yaw"]
    pl["pitch"] = snap["player_pitch"]
    pl["mag_bullets"] = snap["player_mag"]
    pl["is_reloading"] = snap["player_reloading"]
    pl["hp"] = snap["player_hp"]
    pl["flags"] = snap["player_flags"]
    return out


def pack_game_events(ev: Dict[str, np.ndarray]) -> np.ndarray:
    """Compact per-step event flags ([W] / [W, A]) into GameEvent records
    (the host-side equivalent of the sim's atomic logEvent, sim.cpp:23-39)."""
    match_id = make_match_id(ev["world_idx"], ev["episode_idx"])
    step = ev["match_step"].astype(np.uint32)
    records = []

    def emit(world_mask, etype, a, b, c=None):
        idx = np.nonzero(world_mask)
        n = len(idx[0])
        if n == 0:
            return
        r = np.zeros(n, dtype=GAME_EVENT_DTYPE)
        r["type"] = etype
        r["match_id"] = match_id[idx[0]]
        r["step"] = step[idx[0]]
        r["a"] = np.asarray(a)[idx].astype(np.uint8)
        r["b"] = np.asarray(b)[idx].astype(np.uint8)
        if c is not None:
            r["c"] = np.asarray(c)[idx[0]].astype(np.uint16)
        records.append(r)

    W, A = ev["reload_event"].shape
    player_idx = np.broadcast_to(np.arange(A, dtype=np.uint8), (W, A))

    emit(
        ev["capture_event"].astype(bool),
        EventType.CAPTURE,
        ev["capture_zone"],
        np.maximum(ev["capture_team"], 0),
        ev["in_zone_mask"],
    )
    emit(
        ev["reload_event"].astype(bool),
        EventType.RELOAD,
        player_idx,
        ev["reload_bullets"],
    )
    emit(
        ev["kill_event"].astype(bool),
        EventType.KILL,
        player_idx,
        np.maximum(ev["shot_victim"], 0),
    )
    emit(
        ev["shot_event"].astype(bool),
        EventType.PLAYER_SHOT,
        player_idx,
        np.maximum(ev["shot_victim"], 0),
    )
    total = sum(len(r) for r in records)
    # NOTE: np.concatenate repacks padded structured dtypes (dropping the
    # union padding), so fill a preallocated array instead
    out = np.zeros(total, dtype=GAME_EVENT_DTYPE)
    at = 0
    for r in records:
        out[at : at + len(r)] = r
        at += len(r)
    return out


class EventLogWriter:
    """Writes events.bin + steps.bin into a directory
    (mgr.cpp:392-412,418-471 + writeGameEvents mgr.cpp:104-117)."""

    def __init__(self, dir_path: str):
        os.makedirs(dir_path, exist_ok=True)
        self._events = open(os.path.join(dir_path, "events.bin"), "wb")
        self._steps = open(os.path.join(dir_path, "steps.bin"), "wb")

    def append(self, snapshot, game_events) -> None:
        snap = _np(snapshot)
        ev = _np(game_events)
        pack_snapshots(snap).tofile(self._steps)
        recs = pack_game_events(ev)
        if len(recs):
            recs.tofile(self._events)

    def close(self) -> None:
        self._events.close()
        self._steps.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_event_log(dir_path: str) -> np.ndarray:
    return np.fromfile(
        os.path.join(dir_path, "events.bin"), dtype=GAME_EVENT_DTYPE
    )


def read_step_snapshots(dir_path: str) -> np.ndarray:
    return np.fromfile(
        os.path.join(dir_path, "steps.bin"), dtype=PACKED_STEP_SNAPSHOT_DTYPE
    )
