"""Filter-driven trajectory selection from the analytics DB.

The reference's viewer runs filter queries over the analytics DB to find
interesting match windows and dumps them as DumpItem streams
(src/viz.cpp:1229-1348 analytics queries, :1644 stepID dump) which
build_trajectory_curriculum consumes. This tool is the headless
equivalent: select fixed-length step windows whose event masks match a
filter, emit a DumpItem stream.

Usage:
    python -m madrona_mp_env_tpu.data.select_trajectories \\
        <db.sqlite> <out.bin> --event-mask 4 --window 100 --max 50
"""

from __future__ import annotations

import argparse
import sqlite3

import numpy as np

from .trajectory_db import write_dump_items


def select_windows(
    db_path: str,
    event_mask: int = 0,
    window: int = 100,
    max_windows: int = 100,
    team_id: int = 0,
    min_hits: int = 1,
):
    """Step-id windows of length ``window`` containing >= min_hits steps
    whose event_mask intersects ``event_mask`` (0 = any window).
    Returns (step_ids [N*window], team_ids [N*window])."""
    db = sqlite3.connect(db_path)
    matches = db.execute("SELECT id, num_steps FROM matches").fetchall()

    windows = []
    for match_id, num_steps in matches:
        if len(windows) >= max_windows:
            break
        rows = db.execute(
            "SELECT id, event_mask FROM match_steps WHERE match_id = ? "
            "ORDER BY step_idx",
            (match_id,),
        ).fetchall()
        if len(rows) < window:
            continue
        ids = np.asarray([r[0] for r in rows], np.int64)
        masks = np.asarray([r[1] for r in rows], np.int64)
        hit = (
            np.ones_like(masks, bool)
            if event_mask == 0
            else (masks & event_mask) != 0
        )
        # greedy non-overlapping windows with enough matching steps
        csum = np.concatenate([[0], np.cumsum(hit.astype(np.int64))])
        start = 0
        while start + window <= len(ids) and len(windows) < max_windows:
            n_hit = csum[start + window] - csum[start]
            if n_hit >= min_hits:
                windows.append(ids[start : start + window])
                start += window
            else:
                start += window // 4
    db.close()

    if not windows:
        return np.zeros((0,), np.int64), np.zeros((0,), np.int64)
    step_ids = np.concatenate(windows)
    team_ids = np.full_like(step_ids, team_id)
    return step_ids, team_ids


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("db")
    ap.add_argument("out")
    ap.add_argument("--event-mask", type=int, default=0,
                    help="bitmask: 1 capture, 2 reload, 4 kill, 8 shot")
    ap.add_argument("--window", type=int, default=100)
    ap.add_argument("--max", type=int, default=100)
    ap.add_argument("--team", type=int, default=0)
    ap.add_argument("--min-hits", type=int, default=1)
    args = ap.parse_args(argv)

    step_ids, team_ids = select_windows(
        args.db, args.event_mask, args.window, args.max, args.team,
        args.min_hits,
    )
    write_dump_items(args.out, step_ids, team_ids)
    print(f"{len(step_ids) // max(args.window, 1)} windows "
          f"({len(step_ids)} steps) -> {args.out}")


if __name__ == "__main__":
    main()
