"""Analytics DB + trajectory dump -> trajectory-curriculum snapshot file.

Equivalent of the reference's ``build_trajectory_curriculum`` tool
(src/build_trajectory_curriculum.cpp): reads a DumpItem stream (trajectories
of match_steps row ids, 100 steps each), subsamples every 20th step, loads
the full player/match state for each selected step from the SQLite DB, and
writes packed CurriculumSnapshot records — the file the env's
trajectory-curriculum reset consumes (assets/map_data.py; reference
mgr.cpp:1424-1441, restore at level_gen.cpp:498-581).

Usage:
    python -m madrona_mp_env_tpu.data.build_trajectory_curriculum \\
        <db.sqlite> <trajectories.bin> <curriculum_out.bin>
"""

from __future__ import annotations

import sqlite3
import sys

import numpy as np

from .formats import (
    CURRICULUM_SNAPSHOT_DTYPE,
    MAX_PLAYERS,
    PACKED_PLAYER_DTYPE,
)
from .trajectory_db import DUMP_ITEM_DTYPE

TRAJECTORY_LEN = 100  # build_trajectory_curriculum.cpp:112
SUBSAMPLE = 20  # build_trajectory_curriculum.cpp:113


def load_snapshot(db: sqlite3.Connection, step_id: int) -> np.ndarray:
    """One CurriculumSnapshot record from a match_steps row id
    (loadCurriculumSnapshot, build_trajectory_curriculum.cpp:9-82)."""
    snap = np.zeros(1, dtype=CURRICULUM_SNAPSHOT_DTYPE)

    players = db.execute(
        """SELECT pos_x, pos_y, pos_z, yaw, pitch, num_bullets, is_reloading,
                  fired_shot, hp, stand_state
           FROM player_states WHERE step_id = ? ORDER BY player_idx""",
        (step_id,),
    ).fetchall()
    assert len(players) == MAX_PLAYERS, (
        f"step {step_id}: expected {MAX_PLAYERS} player rows, got {len(players)}"
    )
    pl = snap["players"][0]
    for i, row in enumerate(players):
        (px, py, pz, yaw, pitch, bullets, reloading, fired, hp, stand) = row
        flags = 0
        if fired:
            flags |= 2  # FiredShot
        if stand == 1:
            flags |= 4  # Crouch
        elif stand == 2:
            flags |= 8  # Prone
        pl[i]["pos"] = (px, py, pz)
        pl[i]["yaw"] = yaw
        pl[i]["pitch"] = pitch
        pl[i]["mag_bullets"] = bullets
        pl[i]["is_reloading"] = reloading
        pl[i]["hp"] = hp
        pl[i]["flags"] = flags

    ms_row = db.execute(
        """SELECT step_idx, cur_zone, cur_zone_controller,
                  zone_steps_remaining, zone_steps_until_point
           FROM match_steps WHERE id = ?""",
        (step_id,),
    ).fetchone()
    assert ms_row is not None, f"no match_steps row {step_id}"
    ms = snap["match_state"]
    ms["step"] = ms_row[0]
    ms["cur_zone"] = ms_row[1]
    ms["cur_zone_controller"] = ms_row[2]
    ms["zone_steps_remaining"] = ms_row[3]
    ms["steps_until_point"] = ms_row[4]
    return snap


def build_curriculum(
    db_path: str,
    trajectories_path: str,
    out_path: str,
    trajectory_len: int = TRAJECTORY_LEN,
    subsample: int = SUBSAMPLE,
) -> int:
    db = sqlite3.connect(db_path)
    items = np.fromfile(trajectories_path, dtype=DUMP_ITEM_DTYPE)
    assert len(items) % trajectory_len == 0, (
        f"{len(items)} dump items not divisible by trajectory_len "
        f"{trajectory_len}"
    )
    num_trajectories = len(items) // trajectory_len

    num_dumped = 0
    with open(out_path, "wb") as f:
        for t in range(num_trajectories):
            start = t * trajectory_len
            for off in range(0, trajectory_len, subsample):
                step_id = int(items[start + off]["step_id"])
                load_snapshot(db, step_id).tofile(f)
                num_dumped += 1
    db.close()
    return num_dumped


def main():
    if len(sys.argv) != 4:
        print(
            f"usage: {sys.argv[0]} SQL_DB TRAJECTORIES CURRICULUM_OUT",
            file=sys.stderr,
        )
        sys.exit(1)
    n = build_curriculum(sys.argv[1], sys.argv[2], sys.argv[3])
    print(n)


if __name__ == "__main__":
    main()
