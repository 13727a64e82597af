"""Record/replay + event-log + analytics-DB data loop tests.

Covers the reference's play -> events -> DB -> curriculum cycle
(SURVEY.md §2.11) end to end on a tiny config.
"""

import os
import sqlite3

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import madrona_mp_env_tpu as mp
from madrona_mp_env_tpu.data import (
    EventLogWriter,
    RecordLogWriter,
    ReplayLogReader,
    formats,
    read_event_log,
    read_step_snapshots,
)
from madrona_mp_env_tpu.data.build_db import build_db
from madrona_mp_env_tpu.data.build_trajectory_curriculum import build_curriculum
from madrona_mp_env_tpu.data.trajectory_db import (
    TrajectoryDB,
    TrajectoryType,
    build_training_set,
    write_dump_items,
)


def test_struct_sizes():
    # byte-compat with the reference raw struct dumps (sizes verified
    # against a compiled sizeof check)
    assert formats.AGENT_LOG_DTYPE.itemsize == 72
    assert formats.STEP_LOG_DTYPE.itemsize == 868
    assert formats.PACKED_PLAYER_DTYPE.itemsize == 14
    assert formats.PACKED_MATCH_STATE_DTYPE.itemsize == 8
    assert formats.PACKED_STEP_SNAPSHOT_DTYPE.itemsize == 192
    assert formats.GAME_EVENT_DTYPE.itemsize == 24
    assert formats.CURRICULUM_SNAPSHOT_DTYPE.itemsize == 176
    assert formats.TEAM_HULL_DTYPE.itemsize == 26


@pytest.fixture(scope="module")
def recorded_run(simple_map_dir, tmp_path_factory):
    """Run a few recorded steps of a small env and write all artifacts."""
    out = tmp_path_factory.mktemp("recording")
    cfg = mp.EnvConfig(task=mp.Task.Zone, team_size=6, episode_len=64)
    env = mp.Env(cfg, simple_map_dir, num_worlds=4, seed=11, collect_log=True)
    state, _ = env.reset()

    record_path = os.path.join(out, "record.bin")
    event_dir = os.path.join(out, "events")
    num_steps = 12

    actions = env.zero_actions()
    actions = actions.replace(
        move_amount=jnp.ones_like(actions.move_amount),
    )

    states = [state]
    with RecordLogWriter(record_path) as rec, EventLogWriter(event_dir) as ev:
        for i in range(num_steps):
            # alternate fire/reload so reload events are guaranteed
            fire_val = 2 if i % 3 == 0 else 1
            acts = actions.replace(
                fire=jnp.full_like(actions.fire, fire_val)
            )
            state, outs = env.step(state, acts)
            rec.append(outs["step_log"])
            ev.append(outs["snapshot"], outs["game_events"])
            states.append(state)

    return {
        "cfg": cfg,
        "env": env,
        "record_path": record_path,
        "event_dir": event_dir,
        "num_steps": num_steps,
        "out": out,
    }


def test_record_file_roundtrip(recorded_run):
    reader = ReplayLogReader(recorded_run["record_path"], num_worlds=4)
    assert len(reader) == recorded_run["num_steps"]
    log0 = reader.step(0)
    assert log0["pos"].shape == (4, 12, 3)
    # live agents have sane positions (dead/teleported agents sit at z=10000)
    assert np.all(np.isfinite(log0["pos"]))


def test_event_log_files(recorded_run):
    snaps = read_step_snapshots(recorded_run["event_dir"])
    # one snapshot per world per step
    assert len(snaps) == 4 * recorded_run["num_steps"]
    # match ids encode (world << 32 | episode)
    worlds = snaps["match_id"] >> 32
    assert set(np.unique(worlds)) == {0, 1, 2, 3}
    events = read_event_log(recorded_run["event_dir"])
    # someone fired every step at point blank: expect some events
    assert len(events) > 0
    assert set(np.unique(events["type"])) <= {1, 2, 4, 8}


def test_replay_reproduces_zone_state(recorded_run):
    """Replaying the recorded log drives the same zone/match-state stream
    (the reference's record/replay determinism contract, SURVEY.md §4.2)."""
    env = recorded_run["env"]
    reader = ReplayLogReader(recorded_run["record_path"], num_worlds=4)
    orig_snaps = read_step_snapshots(recorded_run["event_dir"])

    state, _ = env.reset()
    replayed = []
    for i in range(len(reader)):
        log = {k: jnp.asarray(v) for k, v in reader.step(i).items()}
        state, outs = env.replay_step(state, log)
        replayed.append(np.asarray(outs["snapshot"]["match_step"]))

    # per-step match step counters line up with the recorded snapshots
    orig_steps = orig_snaps["match_state"]["step"].reshape(
        recorded_run["num_steps"], 4
    )
    rep = np.stack(replayed)
    assert np.array_equal(rep.astype(np.uint16), orig_steps)


def test_build_db_and_curriculum(recorded_run):
    out = recorded_run["out"]
    db_path = os.path.join(out, "analytics.db")
    n_matches, n_steps = build_db(recorded_run["event_dir"], db_path)
    assert n_steps == 4 * recorded_run["num_steps"]
    assert n_matches >= 4  # at least one match per world

    db = sqlite3.connect(db_path)
    (n_players,) = db.execute("SELECT COUNT(*) FROM player_states").fetchone()
    assert n_players == n_steps * 12
    (n_hulls,) = db.execute("SELECT COUNT(*) FROM team_states").fetchone()
    assert n_hulls == n_steps * 2

    # pick some step ids as a fake 100-step trajectory (wrapping)
    step_ids = [
        r[0]
        for r in db.execute(
            "SELECT id FROM match_steps ORDER BY id LIMIT 100"
        ).fetchall()
    ]
    db.close()
    step_ids = (step_ids * 100)[:100]

    dump_path = os.path.join(out, "trajectories.bin")
    write_dump_items(
        dump_path, np.asarray(step_ids, np.int64), np.zeros(100, np.int64)
    )

    curr_path = os.path.join(out, "curriculum.bin")
    n = build_curriculum(db_path, dump_path, curr_path)
    assert n == 5  # 100 steps subsampled every 20

    # loadable by the asset pipeline + env accepts it
    snaps = formats.load_curriculum_snapshots(curr_path)
    assert snaps.shape == (5,)
    assert snaps["players"].shape == (5, 12, 9)

    env2 = mp.Env(
        recorded_run["cfg"],
        os.path.dirname(recorded_run["event_dir"]),  # unused (map_data later)
        num_worlds=2,
        map_data=None if False else recorded_run["env"].map_data,
    )
    assert env2.map_data is recorded_run["env"].map_data


def test_trajectory_db_roundtrip(tmp_path):
    db = TrajectoryDB(os.path.join(tmp_path, "traj.db"))
    steps = np.zeros(
        10, dtype=[("pos", "<f4", (3,)), ("yaw", "<f4"), ("action", "<i4")]
    )
    steps["yaw"] = np.arange(10)
    tid = db.save_trajectory(TrajectoryType.RL, "test-tag", steps)
    assert db.num_trajectories() == 1
    got = db.get_steps(tid)
    assert np.array_equal(got["yaw"], steps["yaw"])
    assert db.get_tag(tid) == "test-tag"
    assert db.get_type(tid) == TrajectoryType.RL

    out_path = os.path.join(tmp_path, "train_set.bin")
    n = build_training_set(db, [tid, tid], out_path)
    assert n == 20
    db.remove_trajectory(tid)
    assert db.num_trajectories() == 0


def test_curriculum_reset_in_env(simple_map_dir, recorded_run):
    """Env loads a curriculum file and trajectory-curriculum resets restore
    snapshot state (level_gen.cpp:498-581 equivalent)."""
    out = recorded_run["out"]
    curr_path = os.path.join(out, "curriculum.bin")
    cfg = mp.EnvConfig(
        task=mp.Task.Zone,
        team_size=6,
        episode_len=32,
        trajectory_curriculum_prob=1.0,
    )
    env = mp.Env(
        cfg, simple_map_dir, num_worlds=2, seed=3, curriculum_path=curr_path
    )
    assert env.map_data.num_curriculum_snapshots == 5
    state, obs = env.reset()
    # restored positions come from the snapshot, which was quantized i16
    snaps = formats.load_curriculum_snapshots(curr_path)
    live = np.asarray(state.pos[0, :, :2])
    pool = snaps["players"][:, :12, :2].reshape(-1, 2)
    d = np.abs(live[:, None, :] - pool[None, :, :]).sum(-1).min(1)
    assert np.all(d < 2.0), f"reset positions not from snapshot pool: {d}"
