"""Interactive viewer server (tools/viz_server.py): replay browsing,
analytics-DB background queries, live sim stepping, and map geometry —
the HTTP re-design of the reference's viz.cpp app (analytics browser
viz.cpp:1229-1348, background query thread viz.cpp:1212-1227)."""

import json
import os
import socket
import threading
import urllib.request

import jax.numpy as jnp
import numpy as np
import pytest

import madrona_mp_env_tpu as mp
from madrona_mp_env_tpu.data.build_db import build_db
from madrona_mp_env_tpu.data.recorder import EventLogWriter, RecordLogWriter
from madrona_mp_env_tpu.tools.viz_server import ViewerData, serve


@pytest.fixture(scope="module")
def artifacts(simple_map_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("viz")
    cfg = mp.EnvConfig(task=mp.Task.Zone, team_size=2, episode_len=32)
    env = mp.Env(cfg, simple_map_dir, num_worlds=2, seed=4, collect_log=True)
    state, _ = env.reset()
    record = os.path.join(out, "record.bin")
    events = os.path.join(out, "events")
    acts = env.zero_actions().replace(
        move_amount=jnp.full((2, 4), 2, jnp.int32),
        fire=jnp.ones((2, 4), jnp.int32),
    )
    with RecordLogWriter(record) as rec, EventLogWriter(events) as ev:
        for _ in range(8):
            state, outs = env.step(state, acts)
            rec.append(outs["step_log"])
            ev.append(outs["snapshot"], outs["game_events"])
    db = os.path.join(out, "analytics.db")
    build_db(events, db)
    return {
        "scene": simple_map_dir,
        "record": record,
        "events": events,
        "db": db,
    }


@pytest.fixture(scope="module")
def server(artifacts):
    data = ViewerData(
        scene=artifacts["scene"],
        record=artifacts["record"],
        num_worlds=2,
        event_log=artifacts["events"],
        db=artifacts["db"],
        live=True,
        team_size=2,
    )
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    httpd = serve(data, port)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def get(url):
    with urllib.request.urlopen(url, timeout=300) as r:
        return json.loads(r.read())


def post(url, body):
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(), method="POST"
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        return json.loads(r.read())


def test_index_and_map(server):
    with urllib.request.urlopen(server + "/", timeout=60) as r:
        page = r.read().decode()
    assert "<canvas" in page
    m = get(server + "/api/map")
    assert len(m["collision_tris"]) > 0
    assert len(m["nav_verts"]) > 0
    assert len(m["zones"]["min"]) >= 1
    assert m["bounds_min"][0] < m["bounds_max"][0]


def test_replay_frames(server):
    meta = get(server + "/api/replay/meta")
    assert meta == {"available": True, "num_steps": 8, "num_worlds": 2}
    f = get(server + "/api/replay/frame?step=3&world=1")
    assert len(f["pos"]) == 4 and len(f["pos"][0]) == 3
    assert len(f["hp"]) == 4
    assert all(isinstance(a, bool) for a in f["alive"])
    # out-of-range -> 400, not a crash
    with pytest.raises(urllib.error.HTTPError) as e:
        get(server + "/api/replay/frame?step=99&world=0")
    assert e.value.code == 400


def test_events_endpoint(server):
    ev = get(server + "/api/events?world=0")
    assert ev["available"]
    assert all({"type", "step", "match_id"} <= set(e) for e in ev["events"])


def test_db_background_queries(server):
    canned = get(server + "/api/db/canned")
    assert "kills_near" in canned["queries"]

    t = post(server + "/api/db/submit", {"canned": "matches"})
    res = get(server + f"/api/db/result?ticket={t['ticket']}")
    while res["status"] == "pending":
        res = get(server + f"/api/db/result?ticket={t['ticket']}")
    assert res["status"] == "done"
    assert res["columns"] == ["id", "orig_id", "num_steps"]
    assert len(res["rows"]) >= 2  # one match per world

    # parameterized canned query
    t = post(
        server + "/api/db/submit",
        {"canned": "team_positions", "params": {"match_id": 1}},
    )
    res = get(server + f"/api/db/result?ticket={t['ticket']}")
    while res["status"] == "pending":
        res = get(server + f"/api/db/result?ticket={t['ticket']}")
    assert res["status"] == "done" and len(res["rows"]) > 0

    # free-form SQL works; writes are rejected (read-only browser)
    t = post(server + "/api/db/submit",
             {"sql": "SELECT COUNT(*) AS n FROM player_states"})
    res = get(server + f"/api/db/result?ticket={t['ticket']}")
    while res["status"] == "pending":
        res = get(server + f"/api/db/result?ticket={t['ticket']}")
    assert res["rows"][0][0] > 0
    t = post(server + "/api/db/submit", {"sql": "DELETE FROM matches"})
    res = get(server + f"/api/db/result?ticket={t['ticket']}")
    while res["status"] == "pending":
        res = get(server + f"/api/db/result?ticket={t['ticket']}")
    assert res["status"] == "error"


def test_live_sim(server):
    f = get(server + "/api/live/step?n=2")
    assert f["step"] >= 2
    assert len(f["pos"]) == 4
    f2 = get(server + "/api/live/step?n=1")
    assert f2["step"] == f["step"] + 1
    assert get(server + "/api/live/reset") == {"ok": True}
    f3 = get(server + "/api/live/step?n=1")
    assert f3["step"] <= 2
