"""Per-cell raycast culling: builder soundness + culled-kernel parity.

Three layers of evidence (VERDICT round-1 items #1/#2):
  1. the table BUILDER produces candidate sets that reproduce the dense
     sweep exactly on fresh random batteries (verify_tables == 0),
  2. the culled Pallas kernels (fan / single-ray / grouped sphere-cast /
     capsule), run through the interpreter on CPU, match the dense
     reference sweeps restricted to the same candidates,
  3. a full env step with the kernels forced (interpret mode) matches the
     dense-path step from identical state, step by step.
"""

import os

os.environ["MPENV_PALLAS"] = "interpret"

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madrona_mp_env_tpu import consts
from madrona_mp_env_tpu.ops import culling
from madrona_mp_env_tpu.ops import raycast as rc
from madrona_mp_env_tpu.ops.raycast import make_tri_soup


def synth_map(seed=0, n_walls=12, extent=400.0, h=120.0):
    """A small closed arena: floor + perimeter + random interior walls."""
    rng = np.random.default_rng(seed)
    tris = []

    def quad(p0, p1, p2, p3):
        tris.append([p0, p1, p2])
        tris.append([p0, p2, p3])

    e = extent
    quad([-e, -e, 0], [e, -e, 0], [e, e, 0], [-e, e, 0])  # floor
    for (a, b) in [((-e, -e), (e, -e)), ((e, -e), (e, e)),
                   ((e, e), (-e, e)), ((-e, e), (-e, -e))]:
        quad([a[0], a[1], 0], [b[0], b[1], 0], [b[0], b[1], h],
             [a[0], a[1], h])
    for _ in range(n_walls):
        cx, cy = rng.uniform(-0.7 * e, 0.7 * e, 2)
        L = rng.uniform(60, 220)
        ang = rng.uniform(0, np.pi)
        dx, dy = L * np.cos(ang), L * np.sin(ang)
        quad([cx - dx, cy - dy, 0], [cx + dx, cy + dy, 0],
             [cx + dx, cy + dy, h], [cx - dx, cy - dy, h])
    return np.asarray(tris, np.float32)


@pytest.fixture(scope="module")
def synth():
    from madrona_mp_env_tpu.ops.raycast_pallas import morton_sort_tris

    # the tables/soup order contract: both from the SAME Morton-sorted array
    tv = morton_sort_tris(synth_map(n_walls=30, extent=600.0, h=300.0))
    # walkable: grid over the floor
    g = np.linspace(-560, 560, 17)
    xx, yy = np.meshgrid(g, g)
    wp = np.stack([xx.ravel(), yy.ravel(), np.ones(xx.size)], axis=1)
    raw = culling.build_cell_tables(
        tv.astype(np.float32),
        walkable_points=wp.astype(np.float32),
        cells_per_side=6,
        rays_per_cell=1500,
        casts_per_cell=300,
        round_rays=1 << 13,
        round_casts=1 << 11,
        max_rounds=25,
    )
    tables = culling.pack_tables(raw, tv)
    soup = make_tri_soup(tv, pad_to=128)
    return tv, tables, soup, wp.astype(np.float32)


def sample_queries(tables, n, seed, z_lo=5.0, z_hi=100.0):
    rng = np.random.default_rng(seed)
    span = tables.cell_size * tables.nx
    o = np.stack(
        [
            rng.uniform(tables.grid_min_x + 30, tables.grid_min_x + span - 30, n),
            rng.uniform(tables.grid_min_y + 30, tables.grid_min_y + span - 30, n),
            rng.uniform(z_lo, z_hi, n),
        ],
        axis=1,
    ).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def restricted_soup(tv, tables, cells):
    """Dense mini-soups over each query's candidate set (the kernel's spec)."""
    from madrona_mp_env_tpu.ops.raycast import TriSoup

    ids = np.asarray(tables.cand_idx)[np.asarray(cells)]
    sel = np.where(ids[..., None, None] >= 0, tv[np.maximum(ids, 0)], 0.0)
    n = np.cross(sel[:, :, 1] - sel[:, :, 0], sel[:, :, 2] - sel[:, :, 0])
    ln = np.linalg.norm(n, axis=-1, keepdims=True)
    n = np.where(ln > 1e-20, n / np.maximum(ln, 1e-30), 0.0)
    K = ids.shape[1]
    return TriSoup(
        v0=jnp.asarray(sel[:, :, 0]),
        e1=jnp.asarray(sel[:, :, 1] - sel[:, :, 0]),
        e2=jnp.asarray(sel[:, :, 2] - sel[:, :, 0]),
        normal=jnp.asarray(n.astype(np.float32)),
        valid=jnp.asarray(ids >= 0),
        packed=jnp.zeros((16, K)),
        sc_packed=jnp.zeros((16, K)),
        dir_packed=jnp.zeros((16, 3 * K), jnp.bfloat16),
    )


class TestBuilder:
    def test_tables_shape(self, synth):
        tv, tables, _, _ = synth
        assert tables.K % 128 == 0
        # culling must be non-trivial on the occluded synth arena, else the
        # parity tests below are vacuous
        counts_all = np.asarray((tables.cand_idx >= 0).sum(axis=1))
        assert counts_all[:-1].mean() < 0.8 * len(tv)
        assert tables.cand_idx.shape == (tables.nx * tables.ny + 1, tables.K)
        # every cell has its local floor
        counts = np.asarray((tables.cand_idx >= 0).sum(axis=1))
        assert (counts[:-1] > 0).all()

    def test_verify_zero_mismatch(self, synth):
        tv, tables, _, wp = synth
        res = culling.verify_tables(
            tv, tables, n_rays=20000, n_casts=4000, walkable_points=wp
        )
        assert res["ray_mismatch"] == 0, res
        assert res["sc_mismatch"] == 0, res

    def test_cell_index_dead(self, synth):
        _, tables, _, _ = synth
        pos = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 10000.0]])
        cells = culling.cell_index(tables, pos)
        assert int(cells[1]) == tables.dead_cell
        assert int(cells[0]) != tables.dead_cell


class TestCulledKernels:
    # (round 5) legacy MPENV_CULL kernel tests removed with the kernels:
    # rays_cull / ray_fans_cull / cell-sorted fan + sphere-cast variants
    # were superseded by the auto-gated planar culled fan
    # (ray_fans_culled_planar, tested in tests/test_town_map.py and
    # TestFullStepParity below) and the default-on short tables.

    def test_fan_capsules_vs_dense(self, synth):
        _, tables, _, _ = synth
        A, F = 6, 20
        W = 3
        rng = np.random.default_rng(9)
        pos = np.stack(
            [rng.uniform(-500, 500, (W, A)), rng.uniform(-500, 500, (W, A)),
             np.zeros((W, A))], axis=-1
        ).astype(np.float32)
        alive = rng.random((W, A)) > 0.2
        o = np.repeat(pos[:, :, None, :], F, axis=2)
        o[..., 2] += rng.uniform(10, 60, (W, A, F)).astype(np.float32)
        d = rng.normal(size=(W, A, F, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        self_idx = np.broadcast_to(
            np.arange(A, dtype=np.int32)[None, :, None], (W, A, F)
        )
        seg_h = consts.stand_height - 2 * consts.agent_radius

        from madrona_mp_env_tpu.ops.raycast_cull import fan_capsules

        t_k, idx_k = jax.vmap(
            lambda oo, dd, si, cp, al: fan_capsules(
                oo, dd, si, cp, al, consts.agent_radius, seg_h
            )
        )(jnp.asarray(o), jnp.asarray(d), jnp.asarray(self_idx),
          jnp.asarray(pos), jnp.asarray(alive))

        t_caps = jax.vmap(
            lambda oo, dd, cp, al: rc.ray_vs_capsules(
                oo, dd, cp, consts.agent_radius, seg_h, al
            )
        )(jnp.asarray(o), jnp.asarray(d), jnp.asarray(pos),
          jnp.asarray(alive))  # [W, A, F, A]
        t_caps = jnp.where(
            jnp.asarray(self_idx)[..., None] == jnp.arange(A), jnp.inf, t_caps
        )
        t_d = np.asarray(jnp.min(t_caps, axis=-1))
        idx_d = np.asarray(jnp.argmin(t_caps, axis=-1))
        t_k, idx_k = np.asarray(t_k), np.asarray(idx_k)

        both = np.isfinite(t_k) & np.isfinite(t_d)
        assert (np.isfinite(t_k) == np.isfinite(t_d)).mean() >= 0.999
        assert np.abs(t_k[both] - t_d[both]).max() <= 1e-2
        # winner agrees wherever the min is unambiguous
        close = both & (np.abs(t_k - t_d) <= 1e-3)
        assert (idx_k[close] == idx_d[close]).mean() >= 0.999


class TestFullStepParity:
    def test_step_culled_fan_vs_dense(self, simple_map_dir):
        """One env step with the planar culled fan forced (MPENV_FAN_CULL=1,
        interpret) vs the dense jnp path from identical state — covers the
        big-map production dispatch (the same kernel the T >= 4K auto-gate
        picks on town_map) through the whole step."""
        import madrona_mp_env_tpu as mp
        from madrona_mp_env_tpu.sim.types import Actions

        if not os.path.exists(os.path.join(simple_map_dir, "culling.npz")):
            pytest.skip("simple_map culling tables not built")

        cfg = mp.EnvConfig(
            task=mp.Task.Zone, team_size=3,
            sim_flags=mp.SimFlags.StaggerStarts,
        )
        env = mp.Env(cfg, simple_map_dir, num_worlds=2, seed=9)
        assert env.map_data.cells is not None
        state, _ = env.reset()

        step = env.step_fn()
        sim_ctrl = env.default_sim_ctrl()
        no_reset = jnp.zeros((2,), jnp.int32)

        rng = np.random.default_rng(13)
        A = cfg.num_agents
        try:
            for i in range(6):
                acts = Actions(
                    move_amount=jnp.asarray(rng.integers(0, 3, (2, A))),
                    move_angle=jnp.asarray(rng.integers(0, 8, (2, A))),
                    fire=jnp.asarray(rng.integers(0, 2, (2, A))),
                    stand=jnp.asarray(rng.integers(0, 3, (2, A))),
                    aim_yaw=jnp.asarray(rng.integers(0, 13, (2, A))),
                    aim_pitch=jnp.asarray(rng.integers(0, 7, (2, A))),
                    aim_yaw_rate=jnp.zeros((2, A), jnp.float32),
                    aim_pitch_rate=jnp.zeros((2, A), jnp.float32),
                )
                os.environ["MPENV_PALLAS"] = "interpret"
                os.environ["MPENV_FAN_CULL"] = "1"
                s_k, out_k = step(state, acts, sim_ctrl, no_reset)
                os.environ["MPENV_FAN_CULL"] = "auto"
                os.environ["MPENV_PALLAS"] = "dense"
                s_d, out_d = step(state, acts, sim_ctrl, no_reset)
                os.environ["MPENV_PALLAS"] = "interpret"

                np.testing.assert_allclose(
                    np.asarray(s_k.pos), np.asarray(s_d.pos), atol=2e-2,
                    err_msg=f"pos diverged at step {i}",
                )
                np.testing.assert_array_equal(
                    np.asarray(s_k.hp), np.asarray(s_d.hp),
                    err_msg=f"hp diverged at step {i}",
                )
                np.testing.assert_allclose(
                    np.asarray(out_k["reward"]), np.asarray(out_d["reward"]),
                    atol=1e-3, err_msg=f"reward diverged at step {i}",
                )
                lid_k = np.asarray(out_k["obs"]["fwd_lidar"][..., 0])
                lid_d = np.asarray(out_d["obs"]["fwd_lidar"][..., 0])
                rel = np.abs(lid_k - lid_d) / np.maximum(np.abs(lid_d), 1.0)
                assert (rel > 2e-2).mean() <= 1e-2, (
                    f"lidar flips at step {i}: {(rel > 2e-2).mean():.4f}"
                )
                assert np.quantile(rel, 0.995) <= 2e-2, (
                    f"lidar depth rel err at step {i}: "
                    f"p99.5 {np.quantile(rel, 0.995):.3e}"
                )
                state = s_d  # dense trajectory is the canon
        finally:
            os.environ.pop("MPENV_FAN_CULL", None)

    def test_step_pallas_vs_dense(self, simple_map_dir):
        """One env step via the dense-soup Pallas kernels (interpret) vs the
        dense jnp path from identical state, repeated along a dense-path
        trajectory (MPENV_CULL unset — the culled dispatch is covered by
        test_step_sorted_culled_vs_dense above)."""
        import madrona_mp_env_tpu as mp
        from madrona_mp_env_tpu.sim.types import Actions

        if not os.path.exists(os.path.join(simple_map_dir, "culling.npz")):
            pytest.skip("simple_map culling tables not built")

        cfg = mp.EnvConfig(
            task=mp.Task.Zone, team_size=3,
            sim_flags=mp.SimFlags.StaggerStarts,
        )
        env = mp.Env(cfg, simple_map_dir, num_worlds=2, seed=7)
        assert env.map_data.cells is not None
        state, _ = env.reset()

        import madrona_mp_env_tpu.ops.raycast as rcm

        step = env.step_fn()
        sim_ctrl = env.default_sim_ctrl()
        no_reset = jnp.zeros((2,), jnp.int32)

        rng = np.random.default_rng(11)
        A = cfg.num_agents
        for i in range(8):
            acts = Actions(
                move_amount=jnp.asarray(rng.integers(0, 3, (2, A))),
                move_angle=jnp.asarray(rng.integers(0, 8, (2, A))),
                fire=jnp.asarray(rng.integers(0, 2, (2, A))),
                stand=jnp.zeros((2, A), jnp.int32),
                aim_yaw=jnp.asarray(rng.integers(0, 13, (2, A))),
                aim_pitch=jnp.asarray(rng.integers(0, 7, (2, A))),
                aim_yaw_rate=jnp.zeros((2, A), jnp.float32),
                aim_pitch_rate=jnp.zeros((2, A), jnp.float32),
            )
            os.environ["MPENV_PALLAS"] = "interpret"
            s_k, out_k = step(state, acts, sim_ctrl, no_reset)
            os.environ["MPENV_PALLAS"] = "dense"
            s_d, out_d = step(state, acts, sim_ctrl, no_reset)
            os.environ["MPENV_PALLAS"] = "interpret"

            np.testing.assert_allclose(
                np.asarray(s_k.pos), np.asarray(s_d.pos), atol=2e-2,
                err_msg=f"pos diverged at step {i}",
            )
            np.testing.assert_array_equal(
                np.asarray(s_k.hp), np.asarray(s_d.hp),
                err_msg=f"hp diverged at step {i}",
            )
            np.testing.assert_allclose(
                np.asarray(out_k["reward"]), np.asarray(out_d["reward"]),
                atol=1e-3, err_msg=f"reward diverged at step {i}",
            )
            lid_k = np.asarray(out_k["obs"]["fwd_lidar"][..., 0])
            lid_d = np.asarray(out_d["obs"]["fwd_lidar"][..., 0])
            # bf16 direction dots: ~0.4% relative depth error everywhere,
            # plus rare edge-grazing flips to the hit behind (documented
            # kernel trade-off) — bound the flip fraction and the relative
            # error of the rest
            rel = np.abs(lid_k - lid_d) / np.maximum(np.abs(lid_d), 1.0)
            assert (rel > 2e-2).mean() <= 1e-2, (
                f"lidar flips at step {i}: {(rel > 2e-2).mean():.4f}"
            )
            assert np.quantile(rel, 0.995) <= 2e-2, (
                f"lidar depth rel err at step {i}: "
                f"p99.5 {np.quantile(rel, 0.995):.3e}"
            )
            state = s_d  # dense trajectory is the canon
