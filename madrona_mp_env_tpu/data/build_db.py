"""events.bin + steps.bin -> SQLite analytics database.

Equivalent of the reference's ``build_db`` tool (src/build_db.cpp): same
schema (matches, match_steps, team_states, player_states, capture/reload/
kill/player_shot event tables, step_tokens) including the int16 convex-hull
team_states blobs (build_db.cpp:9-72), so downstream tooling (trajectory
curriculum builder, viewer analytics queries) works against either producer.

Usage:
    python -m madrona_mp_env_tpu.data.build_db <event_log_dir> <out.db>
"""

from __future__ import annotations

import sqlite3
import sys
from typing import Tuple

import numpy as np

from .formats import (
    EventType,
    GAME_EVENT_DTYPE,
    MAX_PLAYERS,
    PACKED_STEP_SNAPSHOT_DTYPE,
    TEAM_HULL_DTYPE,
)
from .recorder import read_event_log, read_step_snapshots

SCHEMA = """
CREATE TABLE matches (
  id INTEGER PRIMARY KEY AUTOINCREMENT,
  orig_id INTEGER NOT NULL,
  num_steps INTEGER NOT NULL
);

CREATE TABLE match_steps (
  id INTEGER PRIMARY KEY AUTOINCREMENT,
  match_id INTEGER NOT NULL,
  step_idx INTEGER NOT NULL,
  cur_zone INTEGER NOT NULL,
  cur_zone_controller INTEGER NOT NULL,
  zone_steps_remaining INTEGER NOT NULL,
  zone_steps_until_point INTEGER NOT NULL,
  num_events INTEGER NOT NULL,
  event_mask INTEGER NOT NULL,
  world_id INTEGER NOT NULL,
  global_idx INTEGER NOT NULL,
  UNIQUE(match_id, step_idx)
);

CREATE TABLE team_states (
  id INTEGER PRIMARY KEY AUTOINCREMENT,
  step_id INTEGER NOT NULL,
  team_idx INTEGER NOT NULL,
  centroid_x INTEGER NOT NULL,
  centroid_y INTEGER NOT NULL,
  extent_x INTEGER NOT NULL,
  extent_y INTEGER NOT NULL,
  hull_data BLOB NOT NULL,
  UNIQUE(step_id, team_idx)
);

CREATE TABLE player_states (
  id INTEGER PRIMARY KEY AUTOINCREMENT,
  step_id INTEGER NOT NULL,
  player_idx INTEGER NOT NULL,
  pos_x INTEGER NOT NULL,
  pos_y INTEGER NOT NULL,
  pos_z INTEGER NOT NULL,
  yaw INTEGER NOT NULL,
  pitch INTEGER NOT NULL,
  num_bullets INTEGER NOT NULL,
  is_reloading INTEGER NOT NULL,
  fired_shot INTEGER NOT NULL,
  hp INTEGER NOT NULL,
  stand_state INTEGER NOT NULL,
  flags INTEGER NOT NULL,
  UNIQUE(step_id, player_idx)
);

CREATE TABLE capture_events (
  id INTEGER PRIMARY KEY AUTOINCREMENT,
  step_id INTEGER NOT NULL,
  zone_idx INTEGER NOT NULL,
  capture_team_idx INTEGER NOT NULL,
  in_zone_mask INTEGER NOT NULL,
  num_in_zone INTEGER NOT NULL,
  UNIQUE(step_id, zone_idx)
);

CREATE TABLE reload_events (
  id INTEGER PRIMARY KEY AUTOINCREMENT,
  step_id INTEGER NOT NULL,
  player_state_id INTEGER NOT NULL,
  num_bullets INTEGER NOT NULL,
  UNIQUE(step_id, player_state_id)
);

CREATE TABLE kill_events (
  id INTEGER PRIMARY KEY AUTOINCREMENT,
  step_id INTEGER NOT NULL,
  killer_id INTEGER NOT NULL,
  killed_id INTEGER NOT NULL,
  UNIQUE(step_id, killer_id, killed_id)
);

CREATE TABLE player_shot_events (
  id INTEGER PRIMARY KEY AUTOINCREMENT,
  step_id INTEGER NOT NULL,
  attacker_id INTEGER NOT NULL,
  target_id INTEGER NOT NULL,
  UNIQUE(step_id, attacker_id, target_id)
);

CREATE TABLE step_tokens (
  id INTEGER PRIMARY KEY AUTOINCREMENT,
  match_id INTEGER NOT NULL,
  tick INTEGER NOT NULL,
  token INTEGER NOT NULL
);

CREATE UNIQUE INDEX idx_find_match_by_orig_id ON matches (orig_id);
"""


def convex_hull_i16(pts: np.ndarray) -> np.ndarray:
    """Monotone-chain hull over int16 XY points, same vertex order/edge-case
    conventions as the reference (build_db.cpp:9-72: collinear points are
    dropped via the <= 0 cross test)."""
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]
    # dedupe exact duplicates to avoid degenerate hulls
    n = len(pts)
    if n <= 1:
        return pts

    def cross(o, a, b):
        return int(a[0] - o[0]) * int(b[1] - o[1]) - int(a[1] - o[1]) * int(
            b[0] - o[0]
        )

    lower = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper = []
    for p in pts[::-1]:
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    hull = lower[:-1] + upper[:-1]
    return np.asarray(hull[:6], dtype=np.int16)


def hull_blob(hull: np.ndarray) -> bytes:
    rec = np.zeros(1, dtype=TEAM_HULL_DTYPE)
    rec["num_verts"] = len(hull)
    rec["verts"][0, : len(hull)] = hull
    return rec.tobytes()


def build_db(
    event_dir: str, out_path: str, team_size: int = 6
) -> Tuple[int, int]:
    """Returns (num_matches, num_steps) inserted."""
    events = read_event_log(event_dir)
    snaps = read_step_snapshots(event_dir)

    db = sqlite3.connect(out_path)
    db.executescript(
        "PRAGMA journal_mode = WAL; PRAGMA synchronous = NORMAL;"
    )
    db.executescript(SCHEMA)
    cur = db.cursor()

    # group snapshots by matchID preserving global write order
    order = np.argsort(snaps["match_id"], kind="stable")
    match_ids, starts = np.unique(snaps["match_id"][order], return_index=True)

    match_row_ids = {}
    for mi, mid in enumerate(match_ids):
        end = starts[mi + 1] if mi + 1 < len(match_ids) else len(order)
        cur.execute(
            "INSERT INTO matches (orig_id, num_steps) VALUES (?, ?)",
            (int(mid), int(end - starts[mi])),
        )
        match_row_ids[int(mid)] = cur.lastrowid

    step_row_ids = {}  # (match_id_row, step_idx) -> match_steps.id
    player_row_ids = {}  # (match_id, step_idx, player_idx) -> player_states.id
    for gi in range(len(snaps)):
        s = snaps[gi]
        mrow = match_row_ids[int(s["match_id"])]
        ms = s["match_state"]
        world_id = int(s["match_id"]) >> 32
        cur.execute(
            """INSERT OR IGNORE INTO match_steps
               (match_id, step_idx, cur_zone, cur_zone_controller,
                zone_steps_remaining, zone_steps_until_point,
                event_mask, num_events, world_id, global_idx)
               VALUES (?,?,?,?,?,?,?,?,?,?)""",
            (
                mrow,
                int(ms["step"]),
                int(ms["cur_zone"]),
                int(ms["cur_zone_controller"]),
                int(ms["zone_steps_remaining"]),
                int(ms["steps_until_point"]),
                int(s["event_mask"]),
                int(s["num_events"]),
                world_id,
                gi,
            ),
        )
        step_id = cur.lastrowid
        step_row_ids[(int(s["match_id"]), int(ms["step"]))] = step_id

        players = s["players"]
        for pi in range(2 * team_size):
            p = players[pi]
            stand = 1 if (p["flags"] & 4) else (2 if (p["flags"] & 8) else 0)
            cur.execute(
                """INSERT OR IGNORE INTO player_states
                   (step_id, player_idx, pos_x, pos_y, pos_z, yaw, pitch,
                    num_bullets, is_reloading, fired_shot, hp, stand_state,
                    flags)
                   VALUES (?,?,?,?,?,?,?,?,?,?,?,?,?)""",
                (
                    step_id,
                    pi,
                    int(p["pos"][0]),
                    int(p["pos"][1]),
                    int(p["pos"][2]),
                    int(p["yaw"]),
                    int(p["pitch"]),
                    int(p["mag_bullets"]),
                    int(p["is_reloading"]),
                    1 if (p["flags"] & 2) else 0,
                    int(p["hp"]),
                    stand,
                    int(p["flags"]),
                ),
            )
            player_row_ids[(int(s["match_id"]), int(ms["step"]), pi)] = (
                cur.lastrowid
            )

        for team in range(2):
            xy = players["pos"][
                team * team_size : (team + 1) * team_size, :2
            ].astype(np.int16)
            hull = convex_hull_i16(xy)
            lo, hi = xy.min(axis=0), xy.max(axis=0)
            centroid = (xy.mean(axis=0)).astype(int)
            cur.execute(
                """INSERT OR IGNORE INTO team_states
                   (step_id, team_idx, centroid_x, centroid_y,
                    extent_x, extent_y, hull_data)
                   VALUES (?,?,?,?,?,?,?)""",
                (
                    step_id,
                    team,
                    int(centroid[0]),
                    int(centroid[1]),
                    int(hi[0] - lo[0]),
                    int(hi[1] - lo[1]),
                    hull_blob(hull),
                ),
            )

    # events reference their step row; player references resolve to
    # player_states ROW IDS for that step, matching the reference's
    # lookupPlayerID (build_db.cpp:465,525-544) so cross-producer joins
    # against player_states.id work
    for e in events:
        key = (int(e["match_id"]), int(e["step"]))
        step_id = step_row_ids.get(key)
        if step_id is None:
            continue

        def prow(player_idx):
            return player_row_ids.get(
                (int(e["match_id"]), int(e["step"]), int(player_idx)), -1
            )

        et = int(e["type"])
        if et == EventType.CAPTURE:
            mask = int(e["c"])
            cur.execute(
                """INSERT OR IGNORE INTO capture_events
                   (step_id, zone_idx, capture_team_idx, in_zone_mask,
                    num_in_zone) VALUES (?,?,?,?,?)""",
                (step_id, int(e["a"]), int(e["b"]), mask, bin(mask).count("1")),
            )
        elif et == EventType.RELOAD:
            cur.execute(
                """INSERT OR IGNORE INTO reload_events
                   (step_id, player_state_id, num_bullets) VALUES (?,?,?)""",
                (step_id, prow(e["a"]), int(e["b"])),
            )
        elif et == EventType.KILL:
            cur.execute(
                """INSERT OR IGNORE INTO kill_events
                   (step_id, killer_id, killed_id) VALUES (?,?,?)""",
                (step_id, prow(e["a"]), prow(e["b"])),
            )
        elif et == EventType.PLAYER_SHOT:
            cur.execute(
                """INSERT OR IGNORE INTO player_shot_events
                   (step_id, attacker_id, target_id) VALUES (?,?,?)""",
                (step_id, prow(e["a"]), prow(e["b"])),
            )

    db.commit()
    n_matches = len(match_ids)
    n_steps = len(snaps)
    db.close()
    return n_matches, n_steps


def main():
    if len(sys.argv) != 3:
        print(f"usage: {sys.argv[0]} EVENT_LOG_DIR OUT_DB", file=sys.stderr)
        sys.exit(1)
    n_matches, n_steps = build_db(sys.argv[1], sys.argv[2])
    print(f"{n_matches} matches, {n_steps} steps")


if __name__ == "__main__":
    main()
