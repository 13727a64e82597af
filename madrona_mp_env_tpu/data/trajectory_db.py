"""Tagged trajectory store.

Equivalent of the reference's trajectory DB (src/trajectory_db.hpp:34-54 —
openTrajectoryDB / saveTrajectory / getTrajectorySteps / removeTrajectory /
buildTrajectoryTrainingSet): a SQLite-backed store of tagged agent
trajectories, where each step carries the full observation/action record
(AgentTrajectoryStep, trajectory_db.hpp:14-30).

Steps are stored as one numpy structured blob per trajectory; the dump
format used by the curriculum builder is the reference's ``DumpItem``
{stepID i64, teamID i64} stream (db.hpp:27-30).
"""

from __future__ import annotations

import sqlite3
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np


class TrajectoryType:
    """TrajectoryType (trajectory_db.hpp:7-12)."""

    HUMAN = 0
    RL = 1
    HARDCODED = 2


DUMP_ITEM_DTYPE = np.dtype(
    {"names": ["step_id", "team_id"], "formats": ["<i8", "<i8"], "itemsize": 16}
)

_SCHEMA = """
CREATE TABLE IF NOT EXISTS trajectories (
  id INTEGER PRIMARY KEY AUTOINCREMENT,
  type INTEGER NOT NULL,
  tag TEXT,
  num_steps INTEGER NOT NULL,
  step_dtype TEXT NOT NULL,
  steps BLOB NOT NULL
);
"""


class TrajectoryDB:
    def __init__(self, path: str):
        self.db = sqlite3.connect(path)
        self.db.executescript(_SCHEMA)

    def close(self) -> None:
        self.db.close()

    def save_trajectory(
        self,
        ttype: int,
        tag: Optional[str],
        steps: np.ndarray,
        traj_id: Optional[int] = None,
    ) -> int:
        """steps: any 1-D structured array (one record per step). Returns the
        trajectory id (saveTrajectory, trajectory_db.hpp:37-39)."""
        cur = self.db.cursor()
        if traj_id is not None:
            cur.execute(
                "INSERT OR REPLACE INTO trajectories "
                "(id, type, tag, num_steps, step_dtype, steps) "
                "VALUES (?,?,?,?,?,?)",
                (
                    traj_id,
                    ttype,
                    tag,
                    len(steps),
                    str(steps.dtype.descr),
                    steps.tobytes(),
                ),
            )
        else:
            cur.execute(
                "INSERT INTO trajectories "
                "(type, tag, num_steps, step_dtype, steps) VALUES (?,?,?,?,?)",
                (
                    ttype,
                    tag,
                    len(steps),
                    str(steps.dtype.descr),
                    steps.tobytes(),
                ),
            )
        self.db.commit()
        return cur.lastrowid

    def remove_trajectory(self, traj_id: int) -> None:
        self.db.execute("DELETE FROM trajectories WHERE id = ?", (traj_id,))
        self.db.commit()

    def num_trajectories(self) -> int:
        (n,) = self.db.execute("SELECT COUNT(*) FROM trajectories").fetchone()
        return n

    def trajectory_ids(self) -> List[int]:
        return [
            r[0]
            for r in self.db.execute(
                "SELECT id FROM trajectories ORDER BY id"
            ).fetchall()
        ]

    def advance_n(self, cur_id: int, n: int = 1) -> int:
        """advanceNTrajectories (trajectory_db.hpp:45): the id n rows after
        cur_id, wrapping."""
        ids = self.trajectory_ids()
        if not ids:
            return cur_id
        try:
            i = ids.index(cur_id)
        except ValueError:
            i = -1
        return ids[(i + n) % len(ids)]

    def get_steps(self, traj_id: int) -> np.ndarray:
        row = self.db.execute(
            "SELECT step_dtype, steps FROM trajectories WHERE id = ?",
            (traj_id,),
        ).fetchone()
        if row is None:
            raise KeyError(f"no trajectory {traj_id}")
        dtype = np.dtype(eval(row[0]))  # descr round-trip
        return np.frombuffer(row[1], dtype=dtype)

    def get_type(self, traj_id: int) -> int:
        (t,) = self.db.execute(
            "SELECT type FROM trajectories WHERE id = ?", (traj_id,)
        ).fetchone()
        return t

    def get_tag(self, traj_id: int) -> Optional[str]:
        (t,) = self.db.execute(
            "SELECT tag FROM trajectories WHERE id = ?", (traj_id,)
        ).fetchone()
        return t

    def __iter__(self) -> Iterator[Tuple[int, np.ndarray]]:
        for tid in self.trajectory_ids():
            yield tid, self.get_steps(tid)


def build_training_set(
    db: TrajectoryDB, trajectory_ids: Sequence[int], output_path: str
) -> int:
    """buildTrajectoryTrainingSet (trajectory_db.hpp:52-53): concatenates the
    selected trajectories' step records into one raw binary file. Returns the
    total step count."""
    total = 0
    with open(output_path, "wb") as f:
        for tid in trajectory_ids:
            steps = db.get_steps(tid)
            steps.tofile(f)
            total += len(steps)
    return total


def write_dump_items(path: str, step_ids: np.ndarray, team_ids: np.ndarray) -> None:
    """Write a DumpItem stream (db.hpp:27-30) — the trajectories input of
    the curriculum builder."""
    out = np.zeros(len(step_ids), dtype=DUMP_ITEM_DTYPE)
    out["step_id"] = step_ids
    out["team_id"] = team_ids
    out.tofile(path)
