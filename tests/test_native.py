"""Native (C++) component tests: asset precompute + record I/O vs the
NumPy reference implementations."""

import numpy as np
import pytest

from madrona_mp_env_tpu.assets import formats, native
from madrona_mp_env_tpu.assets.navmesh import (
    _all_pairs_next_hop,
    _tri_adjacency,
)

pytestmark = pytest.mark.skipif(
    native.load() is None, reason="native library unavailable (no compiler)"
)


@pytest.fixture(scope="module")
def nav(simple_map_dir):
    import os

    return formats.load_navmesh(os.path.join(simple_map_dir, "navmesh.bin"))


def test_native_adjacency_matches(nav):
    tris = nav.tri_indices.astype(np.int32)
    adj_n = native.tri_adjacency(tris)
    adj_p = _tri_adjacency(tris)
    assert np.array_equal(adj_n, adj_p)


def test_native_next_hop_path_equivalence(nav):
    tris = nav.tri_indices.astype(np.int32)
    verts = nav.verts.astype(np.float32)
    cents = verts[tris].mean(axis=1)
    adj = native.tri_adjacency(tris)

    nh_n = native.astar_next_hop(cents, adj)
    nh_p = _all_pairs_next_hop(cents.astype(np.float64), adj)
    assert nh_n.shape == nh_p.shape

    def walk_len(nh, s, g, max_steps=1000):
        t, dist = s, 0.0
        for _ in range(max_steps):
            if t == g:
                return dist
            nxt = nh[t, g]
            if nxt < 0:
                return np.inf
            dist += np.linalg.norm(cents[t] - cents[nxt])
            t = nxt
        return np.inf

    rng = np.random.default_rng(3)
    T = len(tris)
    for _ in range(100):
        s, g = rng.integers(0, T, 2)
        ln = walk_len(nh_n, s, g)
        lp = walk_len(nh_p, s, g)
        assert np.isclose(ln, lp, rtol=1e-4) or (
            np.isinf(ln) and np.isinf(lp)
        ), f"path {s}->{g}: native {ln} vs numpy {lp}"


def test_native_record_io(tmp_path):
    from madrona_mp_env_tpu.data.formats import (
        GAME_EVENT_DTYPE,
        STEP_LOG_DTYPE,
    )

    path = str(tmp_path / "rec.bin")
    recs = np.zeros(16, STEP_LOG_DTYPE)
    recs["cur_step"] = np.arange(16)
    with native.NativeRecordWriter(path) as w:
        n = w.append(recs[:8])
        assert n == 8
        w.append(recs[8:])

    lib = native.load()
    assert lib.mpenv_count_records(path.encode(), STEP_LOG_DTYPE.itemsize) == 16
    back = native.read_records(path, STEP_LOG_DTYPE)
    assert np.array_equal(back["cur_step"], recs["cur_step"])
    # sliced read
    mid = native.read_records(path, STEP_LOG_DTYPE, start=4, count=4)
    assert np.array_equal(mid["cur_step"], np.arange(4, 8))
