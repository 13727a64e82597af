"""Build + verify per-cell raycast culling tables for a map directory.

Usage:
    python -m madrona_mp_env_tpu.tools.build_culling data/simple_map \
        [--cells 16] [--rays-per-cell 60000] [--verify]

Writes data/<map>/culling_<hash>.npz, which load_map picks up automatically.
The TPU equivalent of the reference's offline BVH build step
(src/mesh_bvh_builder.cpp) — run once per map, commit the cache.
"""

from __future__ import annotations

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene_dir")
    ap.add_argument("--cells", type=int, default=16)
    ap.add_argument("--rays-per-cell", type=int, default=60000)
    ap.add_argument("--casts-per-cell", type=int, default=12000)
    ap.add_argument("--k-max", type=int, default=256,
                    help="max candidate-set size; open maps (town) need "
                         "~1.2k — the fan gate still pays at T/K >= 4")
    ap.add_argument("--verify", action="store_true")
    ap.add_argument("--miss-rate-tol", type=float, default=1e-5,
                    help="max acceptable residual PVS miss rate per query")
    ap.add_argument("--verify-rays", type=int, default=500000)
    ap.add_argument("--verify-casts", type=int, default=100000)
    args = ap.parse_args()

    import os

    # honor JAX_PLATFORMS=cpu even when a site plugin force-registers a
    # TPU backend (this is a host-side offline build — never needs a chip)
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from ..assets import formats
    from ..ops import culling

    col = formats.load_collision_data(
        os.path.join(args.scene_dir, "collisions.bin")
    )
    nav = formats.load_navmesh(os.path.join(args.scene_dir, "navmesh.bin"))
    import numpy as np

    from ..ops.raycast_pallas import morton_sort_tris

    tri_verts = morton_sort_tris(col.tri_verts)

    spawns = formats.load_spawns(os.path.join(args.scene_dir, "spawns.bin"))
    walkable = np.concatenate(
        [
            nav.verts,
            nav.verts[nav.tri_indices].mean(axis=1),
            culling.spawn_box_points(
                (spawns.a_spawns, spawns.b_spawns, spawns.common_respawns)
            ),
        ],
        axis=0,
    ).astype(np.float32)

    t0 = time.time()
    tables = culling.load_or_build_cell_tables(
        tri_verts,
        cache_dir=args.scene_dir,
        build_if_missing=True,
        walkable_points=walkable,
        cells_per_side=args.cells,
        rays_per_cell=args.rays_per_cell,
        casts_per_cell=args.casts_per_cell,
        k_max=args.k_max,
        progress=True,
    )
    print(
        f"tables: grid {tables.nx}x{tables.ny}, K={tables.K}, "
        f"built/loaded in {time.time() - t0:.1f}s"
    )

    if args.verify:
        t0 = time.time()
        res = culling.verify_tables(
            tri_verts, tables,
            n_rays=args.verify_rays, n_casts=args.verify_casts,
            walkable_points=walkable,
        )
        print(f"verify ({time.time() - t0:.1f}s): {res}")
        # The PVS battery is Monte-Carlo: a long tail of edge-grazing rays
        # keeps surfacing rare (cell, tri) bits (simple_map: ~3e-6/ray
        # residual after 60 refinement rounds), so exact-zero mismatch is
        # not reachable by sampling. Culled dispatch therefore stays an
        # opt-in approximation (MPENV_CULL) with the measured miss rate
        # reported here; default dispatch is the exact dense sweep.
        ray_rate = res["ray_mismatch"] / max(res["n_rays"], 1)
        sc_rate = res["sc_mismatch"] / max(res["n_casts"], 1)
        print(f"residual miss rate: ray {ray_rate:.2e}, cast {sc_rate:.2e}")
        assert ray_rate <= args.miss_rate_tol and sc_rate <= args.miss_rate_tol, res


if __name__ == "__main__":
    main()
