"""Join the analytics DB with a BC dump -> filtered BC/KL training sets.

Equivalent of the reference's scripts/build_trajectory_training_dataset.py:
given (a) the SQLite analytics DB built from an eval run's event log,
(b) a DumpItem stream of selected trajectory steps (step_id, team_id) —
produced by filter queries over the DB — and (c) the raw BC dump written by
the same eval run, emit:

- a BC training set: per selected trajectory step, the acting team's
  observations/actions/logits/rewards/rnn states
- a KL regularization set: the same data for steps NOT covered by any
  selected trajectory (10x the trajectory count, random teams,
  build_trajectory_training_dataset.py:239-252)

The join key is match_steps.global_idx: the analytics DB records each
snapshot's global write order, which equals the BC dump's step order when
both were written by the same eval run (global_idx = step * num_worlds +
world).

Output layout: 'sequences' — leaves are [S(steps), team_size, ...] with a
'shapes' JSON, consumable by train.bc.load_bc_data.
"""

from __future__ import annotations

import json
import os
import sqlite3
import sys

import numpy as np

from ..data.trajectory_db import DUMP_ITEM_DTYPE

SEQ_LEN = 20  # trajectory length in steps (reference :71)


class BCDump:
    """Random access into a raw BC dump directory (EvalManager layout:
    per-step arrays [P, BP, ...] in block order)."""

    def __init__(self, dump_dir: str, num_worlds: int, num_agents: int,
                 team_size: int):
        with open(os.path.join(dump_dir, "shapes")) as f:
            self.meta = json.load(f)
        self.dir = dump_dir
        self.W = num_worlds
        self.A = num_agents
        self.ts = team_size

        # reconstruct the actor -> block mapping used by EvalManager
        from ..train.trainer import _static_assignment, TrainConfig
        from ..config import EnvConfig, Task

        P = self.meta["actions"][0]
        cfg = EnvConfig(task=Task.Zone, team_size=team_size)
        tcfg = TrainConfig(num_worlds=num_worlds, num_train_policies=P)
        _, perm, _ = _static_assignment(cfg, tcfg)
        # perm: block order -> flat actor id; invert to flat -> (p, i)
        B = num_worlds * num_agents
        self.BP = B // P
        flat_to_block = np.argsort(perm)
        self.block_p = flat_to_block // self.BP
        self.block_i = flat_to_block % self.BP

    def _read_step(self, name, dtype, step_shape, step_idx):
        count = int(np.prod(step_shape))
        with open(os.path.join(self.dir, name), "rb") as f:
            data = np.fromfile(
                f, count=count, dtype=dtype,
                offset=np.dtype(dtype).itemsize * count * step_idx,
            )
        return data.reshape(step_shape)

    def team_slice(self, name, dtype, step_shape, step_idx, world, team):
        """[ts, ...] for one (step, world, team)."""
        block = self._read_step(name, dtype, step_shape, step_idx)
        agents = world * self.A + team * self.ts + np.arange(self.ts)
        return block[self.block_p[agents], self.block_i[agents]]

    def team_rnn(self, step_idx, world, team):
        """rnn states [ts, 2, 2, H] for one (step, world, team)."""
        shape = self.meta["rnn_states"]  # [2, 2, P, BP, H]
        block = self._read_step("rnn_states", np.float32, shape, step_idx)
        agents = world * self.A + team * self.ts + np.arange(self.ts)
        out = block[:, :, self.block_p[agents], self.block_i[agents]]
        return np.moveaxis(out, 2, 0)  # [ts, 2, 2, H]


def dump_trajectories(
    db: sqlite3.Connection,
    bc_dump: BCDump,
    items: np.ndarray,  # [N, seq_len] records (step_id, team_id)
    out_dir: str,
) -> None:
    os.makedirs(out_dir, exist_ok=True)
    files = {}

    def write(name, arr):
        if name not in files:
            files[name] = open(os.path.join(out_dir, name), "wb")
        np.asarray(arr).tofile(files[name])

    obs_keys = list(bc_dump.meta["obs"].keys())
    last_shapes = {}
    for traj in items:
        for step_id, team_id in traj:
            row = db.execute(
                "SELECT global_idx, world_id FROM match_steps WHERE id = ?",
                (int(step_id),),
            ).fetchone()
            assert row is not None, f"no match_steps row {step_id}"
            gi, world = row
            t = gi // bc_dump.W
            assert gi % bc_dump.W == world

            for k in obs_keys:
                ob = bc_dump.team_slice(
                    k, np.float32, bc_dump.meta["obs"][k], t, world, team_id
                )
                write(k, ob)
                last_shapes[k] = list(ob.shape)
            acts = bc_dump.team_slice(
                "actions", np.int32, bc_dump.meta["actions"], t, world, team_id
            )
            write("actions", acts)
            logits = bc_dump.team_slice(
                "action_logits", np.float32, bc_dump.meta["action_logits"],
                t, world, team_id,
            )
            write("action_logits", logits)
            rew = bc_dump.team_slice(
                "rewards", np.float32, bc_dump.meta["rewards"], t, world,
                team_id,
            )
            write("rewards", rew)
            rnn = bc_dump.team_rnn(t, world, team_id)
            write("rnn_states", rnn)
            last = {
                "actions": list(acts.shape),
                "action_logits": list(logits.shape),
                "rewards": list(rew.shape),
                "rnn_states": list(rnn.shape),
            }

    for f in files.values():
        f.close()

    meta = {
        "layout": "sequences",
        "obs": last_shapes,
        **last,
    }
    with open(os.path.join(out_dir, "shapes"), "w") as f:
        json.dump(meta, f, indent=2)


def build(
    db_path: str,
    trajectories_path: str,
    bc_dump_dir: str,
    bc_out_dir: str,
    kl_out_dir: str,
    num_worlds: int,
    team_size: int = 6,
    seq_len: int = SEQ_LEN,
    seed: int = 0,
) -> None:
    db = sqlite3.connect(db_path)
    items = np.fromfile(trajectories_path, dtype=DUMP_ITEM_DTYPE)
    assert len(items) % seq_len == 0
    trajs = np.stack(
        [items["step_id"], items["team_id"]], axis=-1
    ).reshape(-1, seq_len, 2)

    bc_dump = BCDump(bc_dump_dir, num_worlds, 2 * team_size, team_size)
    dump_trajectories(db, bc_dump, trajs, bc_out_dir)

    # KL set: steps not covered by any selected trajectory
    all_steps = np.asarray(
        [
            r[0]
            for r in db.execute(
                "SELECT id FROM match_steps ORDER BY match_id, step_idx"
            ).fetchall()
        ]
    )
    missing = all_steps[~np.isin(all_steps, trajs[..., 0].ravel())]
    truncated = len(missing) // seq_len * seq_len
    missing = missing[:truncated].reshape(-1, seq_len)
    rng = np.random.default_rng(seed)
    take = rng.permutation(missing.shape[0])[: 10 * trajs.shape[0]]
    missing = missing[take]
    teams = rng.integers(0, 2, size=missing.shape)
    kl_trajs = np.stack([missing, teams], axis=-1)
    dump_trajectories(db, bc_dump, kl_trajs, kl_out_dir)
    db.close()


def main():
    if len(sys.argv) != 7:
        print(
            f"usage: {sys.argv[0]} NUM_WORLDS SQL_DB TRAJECTORIES "
            "BC_DUMP_DIR BC_OUT_DIR KL_OUT_DIR",
            file=sys.stderr,
        )
        sys.exit(1)
    build(
        db_path=sys.argv[2],
        trajectories_path=sys.argv[3],
        bc_dump_dir=sys.argv[4],
        bc_out_dir=sys.argv[5],
        kl_out_dir=sys.argv[6],
        num_worlds=int(sys.argv[1]),
    )


if __name__ == "__main__":
    main()
