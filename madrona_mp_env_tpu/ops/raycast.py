"""Batched ray / sphere-cast primitives against a static triangle soup.

TPU-native replacement for the reference's quantized 4-wide MeshBVH
(reference src/mesh_bvh.hpp, src/mesh_bvh.inl). On a vector machine a
divergent BVH traversal wastes lanes; game maps here are a few hundred
triangles, so we evaluate every (ray, tri) pair as a dense, fully-regular
computation the VPU/MXU can eat. All functions are shape-polymorphic on the
ray batch: o/d have shape [..., 3], results broadcast over [...].

Conventions:
  - miss => t = +inf (call sites convert to the reference's FLT_MAX / 0
    conventions where needed).
  - sphere casts return (t, normal) like MeshBVH::sphereCast
    (mesh_bvh.inl:885+, Jolt-style: start-overlap returns t=0 with
    depenetration normal).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import consts

INF = jnp.inf


def pallas_mode() -> str:
    """Kernel dispatch override via MPENV_PALLAS:
    '' (default: pallas on TPU, dense elsewhere), 'interpret' (pallas
    kernels in interpret mode on any backend — the CPU correctness
    harness), 'dense' (force the jnp reference path even on TPU)."""
    return os.environ.get("MPENV_PALLAS", "")


def use_pallas() -> bool:
    mode = pallas_mode()
    if mode == "interpret":
        return True
    if mode == "dense":
        return False
    return jax.default_backend() == "tpu"


def pallas_interpret() -> bool:
    return pallas_mode() == "interpret"


class TriSoup(NamedTuple):
    """Precomputed per-triangle data, padded to a lane-friendly count.

    Padding triangles are degenerate (zero area) and flagged invalid.
    ``packed`` holds the [16, T] plane/barycentric constants consumed by the
    Pallas TPU kernel (ops/raycast_pallas.py), sorted identically.
    """

    v0: jax.Array  # [T, 3]
    e1: jax.Array  # [T, 3]  (v1 - v0)
    e2: jax.Array  # [T, 3]  (v2 - v0)
    normal: jax.Array  # [T, 3] unit geometric normal
    valid: jax.Array  # [T] bool
    packed: jax.Array  # [16, T] Pallas ray-kernel constants
    sc_packed: jax.Array  # [32, T] Pallas sphere-cast constants (pack_sc2_consts)
    dir_packed: jax.Array  # [16, 3T] bf16 fan-kernel direction matrix
    # v8 fan-kernel table (defaulted: ad-hoc dense-only soups skip it)
    dirT_packed: jax.Array = None  # [8, 3T] bf16 direction-dot matrix
    # planar sphere-cast table (transposed sc constants, tris on rows)
    sc_packedT: jax.Array = None  # [T, 40]


def make_tri_soup(tri_verts: np.ndarray, pad_to: int = 128) -> TriSoup:
    """Build a TriSoup from [T, 3, 3] triangle vertices (host-side)."""
    from .raycast_pallas import (
        morton_sort_tris,
        pack_dir_consts,
        pack_dir_consts8,
        pack_tri_consts,
    )
    from .raycast_cull import pack_sc2_consts

    # spatially sort so Pallas lane-tiles of triangles are coherent
    tri_verts = morton_sort_tris(tri_verts)

    t = tri_verts.shape[0]
    padded = -(-max(t, 1) // pad_to) * pad_to
    v = np.zeros((padded, 3, 3), np.float32)
    v[:t] = tri_verts
    valid = np.zeros((padded,), bool)
    valid[:t] = True

    v0 = v[:, 0]
    e1 = v[:, 1] - v[:, 0]
    e2 = v[:, 2] - v[:, 0]
    n = np.cross(e1, e2)
    norm = np.linalg.norm(n, axis=-1, keepdims=True)
    n = np.where(norm > 1e-20, n / np.maximum(norm, 1e-30), 0.0)

    return TriSoup(
        v0=jnp.asarray(v0),
        e1=jnp.asarray(e1),
        e2=jnp.asarray(e2),
        normal=jnp.asarray(n.astype(np.float32)),
        valid=jnp.asarray(valid),
        packed=jnp.asarray(pack_tri_consts(tri_verts, pad_to=padded)),
        sc_packed=jnp.asarray(pack_sc2_consts(tri_verts, pad_to=padded)),
        dir_packed=jnp.asarray(
            pack_dir_consts(pack_tri_consts(tri_verts, pad_to=padded))
        ),
        dirT_packed=jnp.asarray(
            pack_dir_consts8(pack_tri_consts(tri_verts, pad_to=padded))
        ),
        sc_packedT=jnp.asarray(
            pack_sc2_consts(tri_verts, pad_to=padded).T.copy()
        ),
    )


def ray_vs_tris(o, d, soup: TriSoup, t_max=INF, *, cells=None, tables=None):
    """Nearest-hit ray vs the map triangle soup. o, d: [..., 3]; returns t
    [...] (inf on miss) — MeshBVH::traceRay semantics (mesh_bvh.inl).

    Dispatches to the fused Pallas kernel on TPU (per-cell candidate culling
    when ``cells``/``tables`` are given, ops/culling.py); the dense jnp
    sweep below is the portable reference path (CPU tests, interpret mode).
    """
    if use_pallas():
        from .raycast_pallas import ray_vs_tris_pallas

        return ray_vs_tris_pallas(o, d, soup.packed, t_max=t_max)
    return _ray_vs_tris_dense(o, d, soup, t_max)


def ray_fans_vs_tris(origins, zoffs, dirs, soup: TriSoup, t_max=INF, *,
                     cells=None, tables=None, zgroups=None,
                     ray_tables=None, ray_cells=None):
    """Nearest-hit for per-agent sensor ray fans sharing a base origin
    (per-ray origin = base + (0, 0, z_offset)). origins [..., 3];
    zoffs [..., F]; dirs [..., F, 3]. Returns t [..., F] (inf on miss).

    ``zgroups``: optional static tuple of ray-run lengths summing to F;
    rays within a run must share their z offset (the sim's sensor fan has
    5 such runs: LOS + 2 lidar rows x fwd/rear). The TPU kernels then
    hoist all z-dependent terms out of the per-(ray, tri) epilogue and
    stream bf16 directions.

    TPU: fused fan kernel over per-cell candidate sets when tables are
    given, else the dense-soup fan kernel; elsewhere the dense sweep.

    ``dirs`` may also be a (dx, dy, dz) tuple of [..., F] component planes
    (with ``zoffs`` = per-group [..., G] offsets): the TPU path then feeds
    the component-planar v6 kernel with zero host-side relayout; other
    paths stack the components."""
    components = isinstance(dirs, (tuple, list))
    if components:
        assert zgroups is not None
        aligned = all(g % 8 == 0 for g in zgroups)
        # v9 transposed fan kernel over per-cell sensor-ray tables (rays on
        # lanes, K candidates on sublanes — ops/raycast_pallas.py v9 notes)
        # Opt-in for now: the v9 kernel is parity-correct (tests/
        # test_pallas_parity.py TestFanKernelV9) but its end-to-end cost
        # still trails the dense fan path on simple_map (126k vs 141k
        # steps/s measured) — staging is fixed ([C, 8, 3K] tables), the
        # remaining gap is in-kernel; flip to "auto" once it wins.
        v9_mode = os.environ.get("MPENV_FAN_V9", "0")
        use_v9 = (
            use_pallas()
            and ray_tables is not None and ray_cells is not None
            and v9_mode == "1"
        )
        if use_v9:
            from .raycast_pallas import ray_fans_culled_v9

            dx, dy, dz = dirs
            F = dx.shape[-1]
            reps = np.asarray(zgroups)
            zoff_ray = jnp.repeat(
                zoffs, jnp.asarray(reps), axis=-1, total_repeat_length=F
            )
            return ray_fans_culled_v9(
                origins, zoff_ray, dirs, ray_cells, ray_tables, t_max
            )
        # fan culling only pays when the candidate sets are much smaller
        # than the soup: K has a 128-lane floor, and the sorted layout
        # pads ~15-70% extra fan slots, so on small maps (T/K < 4) the
        # dense fan kernel wins (simple_map: T=256, K=128 -> dense)
        fan_cull_wins = (
            tables is not None
            and soup.packed.shape[1] >= 4 * tables.K
        )
        mode = os.environ.get("MPENV_FAN_CULL", "auto")
        fan_cull = mode == "1" or (mode == "auto" and fan_cull_wins)
        if (use_pallas() and aligned and tables is not None
                and cells is not None and fan_cull):
            from .raycast_pallas import ray_fans_culled_planar

            return ray_fans_culled_planar(
                origins, zoffs, dirs, cells, tables, t_max,
                zgroups=zgroups,
            )
        if use_pallas() and aligned:
            from .raycast_pallas import ray_fans_vs_tris_planar

            return ray_fans_vs_tris_planar(
                origins, zoffs, dirs, soup, t_max, zgroups=zgroups
            )
        # fallback paths consume stacked [..., F, 3] dirs + per-ray zoffs
        dirs = jnp.stack(dirs, axis=-1)
        reps = np.asarray(zgroups)
        zoffs = jnp.repeat(
            zoffs, jnp.asarray(reps), axis=-1,
            total_repeat_length=int(reps.sum()),
        )
    if use_pallas():
        zg = None
        if zgroups is not None:
            # one z per run (contract: uniform within each run)
            starts = np.cumsum((0,) + tuple(zgroups))[:-1]
            zg = jnp.stack([zoffs[..., int(s)] for s in starts], axis=-1)
        from .raycast_pallas import ray_fans_vs_tris_pallas

        return ray_fans_vs_tris_pallas(
            origins, zg if zg is not None else zoffs, dirs, soup, t_max,
            zgroups=zgroups,
        )
    o = origins[..., None, :] + jnp.stack(
        [jnp.zeros_like(zoffs), jnp.zeros_like(zoffs), zoffs], axis=-1
    )
    return _ray_vs_tris_dense(o, dirs, soup, t_max)


def sphere_cast_planar(o_comps, d_comps, r, soup: TriSoup, t_max=INF,
                       with_normal=True):
    """Planar-operand sphere cast: o_comps/d_comps = (x, y, z) component
    arrays of identical shape [...]. Returns (t [...], winner tri row idx
    [...] i32). On TPU this feeds the transposed Pallas kernel with zero
    operand repacking; elsewhere the components are stacked into the dense
    jnp sweep. Winner normals via sc_normals_from_idx (so callers
    reconstruct only for the casts that consume them).

    Pair-count reduction for these casts comes from the short-table
    (MPENV_SC_CULL) and packed (MPENV_SC_PACK auto-gate) variants in
    sim/movement.py, not from a culled kernel here."""
    if use_pallas():
        from .raycast_pallas import sphere_cast_planar_pallas

        return sphere_cast_planar_pallas(
            o_comps, d_comps, float(r), soup, t_max=t_max,
            with_normal=with_normal,
        )
    o = jnp.stack(o_comps, axis=-1)
    d = jnp.stack(d_comps, axis=-1)
    t, _n = _sphere_cast_vs_tris_dense(o, d, r, soup, t_max)
    # dense path: recover the winner row for parity with the kernel
    idx = _sphere_cast_winner_idx_dense(o, d, r, soup)
    return t, idx


def _sphere_cast_winner_idx_dense(o, d, r, soup: TriSoup):
    """Winner triangle row of the dense sweep (argmin over per-tri t)."""
    ob = o[..., None, :]
    db = d[..., None, :]
    closest = _closest_point_on_tri(ob, soup.v0, soup.e1, soup.e2)
    to_center = ob - closest
    dist2 = jnp.sum(to_center * to_center, axis=-1)
    overlap = (dist2 <= r * r) & soup.valid

    n = soup.normal
    ndotd = jnp.sum(n * db, axis=-1)
    h = jnp.sum((ob - soup.v0) * n, axis=-1)
    sign = jnp.sign(h)
    sign = jnp.where(sign == 0.0, 1.0, sign)
    safe_ndotd = jnp.where(jnp.abs(ndotd) > 1e-9, ndotd, 1.0)
    t_face = (sign * r - h) / safe_ndotd
    contact = ob + t_face[..., None] * db - sign[..., None] * r * n
    cp = contact - soup.v0
    d00 = jnp.sum(soup.e1 * soup.e1, axis=-1)
    d01 = jnp.sum(soup.e1 * soup.e2, axis=-1)
    d11 = jnp.sum(soup.e2 * soup.e2, axis=-1)
    d20 = jnp.sum(cp * soup.e1, axis=-1)
    d21 = jnp.sum(cp * soup.e2, axis=-1)
    denom = d00 * d11 - d01 * d01
    inv_denom = jnp.where(jnp.abs(denom) > 1e-20, 1.0 / denom, 0.0)
    bv = (d11 * d20 - d01 * d21) * inv_denom
    bw = (d00 * d21 - d01 * d20) * inv_denom
    face_ok = (
        (jnp.abs(ndotd) > 1e-9) & (t_face >= 0.0)
        & (bv >= 0.0) & (bw >= 0.0) & (bv + bw <= 1.0) & soup.valid
    )
    t_face = jnp.where(face_ok, t_face, INF)

    v1 = soup.v0 + soup.e1
    t_e0 = _ray_vs_segment_capsule(
        ob, db, soup.v0, soup.e1, jnp.sum(soup.e1 * soup.e1, axis=-1), r
    )
    t_e1 = _ray_vs_segment_capsule(
        ob, db, soup.v0, soup.e2, jnp.sum(soup.e2 * soup.e2, axis=-1), r
    )
    e12 = soup.e2 - soup.e1
    t_e2 = _ray_vs_segment_capsule(
        ob, db, v1, e12, jnp.sum(e12 * e12, axis=-1), r
    )
    t_edge = jnp.where(soup.valid, jnp.minimum(t_e0, jnp.minimum(t_e1, t_e2)),
                       INF)
    t_tri = jnp.where(overlap, 0.0, jnp.minimum(t_face, t_edge))
    return jnp.argmin(t_tri, axis=-1).astype(jnp.int32)


def sphere_cast_grouped(o, d, r, soup: TriSoup, t_max=INF, *, cells=None,
                        tables=None, with_normal=True):
    """Grouped sphere casts: o, d [..., CPA, 3] — CPA casts per group (the
    casting agent), one culling cell per group. Returns (t [..., CPA],
    normal [..., CPA, 3]) with sphere_cast_vs_tris semantics.
    ``with_normal=False`` lets the TPU kernel skip the winner-normal
    reconstruction (normals zeros) for casts that only consume t."""
    # legacy MPENV_CULL per-fan/sorted kernels removed in round 5: the
    # auto-gated planar culled fan (ray_fans_culled_planar) and default-on
    # short tables (MPENV_SC_CULL) superseded them; cells/tables remain
    # accepted so call sites need no change.
    del cells, tables
    return sphere_cast_vs_tris(o, d, r, soup, t_max,
                               with_normal=with_normal)


def _ray_vs_tris_dense(o, d, soup: TriSoup, t_max=INF):
    """Two-sided Moller-Trumbore over all triangles (reference path)."""
    o = o[..., None, :]  # [..., 1, 3]
    d = d[..., None, :]

    pvec = jnp.cross(d, soup.e2)  # [..., T, 3]
    det = jnp.sum(soup.e1 * pvec, axis=-1)  # [..., T]
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)

    tvec = o - soup.v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, soup.e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(soup.e2 * qvec, axis=-1) * inv_det

    hit = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > 0.0)
        & soup.valid
    )
    t = jnp.where(hit, t, INF)
    t_min = jnp.min(t, axis=-1)
    return jnp.where(t_min <= t_max, t_min, INF)


def _ray_vs_segment_capsule(o, d, p0, seg, seg_len2, r):
    """Nearest t of ray o+t*d against a capsule around segment p0..p0+seg.

    All args broadcast; returns t (inf on miss). Used for sphere-cast edge
    tests and (via z-segments) agent capsule hits.
    """
    # Infinite cylinder: |(x - p0) - ((x - p0).s_hat) s_hat|^2 = r^2
    m = o - p0
    dd = jnp.sum(d * d, axis=-1)
    md = jnp.sum(m * d, axis=-1)
    ms = jnp.sum(m * seg, axis=-1)
    ds = jnp.sum(d * seg, axis=-1)
    mm = jnp.sum(m * m, axis=-1)

    inv_l2 = 1.0 / jnp.maximum(seg_len2, 1e-20)
    a = dd - ds * ds * inv_l2
    b = md - ms * ds * inv_l2
    c = mm - ms * ms * inv_l2 - r * r

    disc = b * b - a * c
    sqrt_disc = jnp.sqrt(jnp.maximum(disc, 0.0))
    safe_a = jnp.where(jnp.abs(a) > 1e-12, a, 1.0)
    t_cyl = (-b - sqrt_disc) / safe_a
    # axial coordinate of hit point along the segment, in [0, len^2] units
    s_hit = ms + t_cyl * ds
    cyl_ok = (
        (jnp.abs(a) > 1e-12)
        & (disc >= 0.0)
        & (t_cyl >= 0.0)
        & (s_hit >= 0.0)
        & (s_hit <= seg_len2)
    )
    t_cyl = jnp.where(cyl_ok, t_cyl, INF)

    # End-cap spheres
    def ray_sphere(center):
        mo = o - center
        bb = jnp.sum(mo * d, axis=-1)
        cc = jnp.sum(mo * mo, axis=-1) - r * r
        dsc = bb * bb - dd * cc
        sq = jnp.sqrt(jnp.maximum(dsc, 0.0))
        t = (-bb - sq) / jnp.maximum(dd, 1e-20)
        ok = (dsc >= 0.0) & (t >= 0.0)
        return jnp.where(ok, t, INF)

    t0 = ray_sphere(p0)
    t1 = ray_sphere(p0 + seg)
    return jnp.minimum(t_cyl, jnp.minimum(t0, t1))


def ray_vs_capsules(o, d, base_pos, radius, seg_height, mask):
    """Ray against Z-aligned agent capsules.

    Mirrors checkCapsuleEntity (reference src/utils.cpp:34-54): the capsule
    segment runs from base_pos + (0,0,radius) up by seg_height
    (= standHeight - 2*radius regardless of pose), radius = agentRadius.

    o, d: [..., 3]; base_pos: [A, 3]; mask: [A] bool (False = skip).
    Returns t: [..., A] (inf on miss/masked).
    """
    p0 = base_pos + jnp.array([0.0, 0.0, 1.0]) * radius  # [A, 3]
    seg = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 1.0]) * seg_height, p0.shape
    )
    o = o[..., None, :]
    d = d[..., None, :]
    t = _ray_vs_segment_capsule(
        o, d, p0, seg, jnp.full(p0.shape[:-1], seg_height * seg_height), radius
    )
    return jnp.where(mask, t, INF)


def _closest_point_on_tri(p, v0, e1, e2):
    """Closest point on triangle (v0, v0+e1, v0+e2) to point p.

    Ericson RTCD 5.1.5, vectorized. All inputs broadcast on leading dims.
    """
    a = v0
    ab = e1
    ac = e2
    ap = p - a

    d1 = jnp.sum(ab * ap, axis=-1)
    d2 = jnp.sum(ac * ap, axis=-1)

    b = a + ab
    bp = p - b
    d3 = jnp.sum(ab * bp, axis=-1)
    d4 = jnp.sum(ac * bp, axis=-1)

    c = a + ac
    cp = p - c
    d5 = jnp.sum(ab * cp, axis=-1)
    d6 = jnp.sum(ac * cp, axis=-1)

    vc = d1 * d4 - d3 * d2
    vb = d5 * d2 - d1 * d6
    va = d3 * d6 - d5 * d4

    denom_vb = d1 - d3
    denom_vc = d2 - d6
    denom_va = (d4 - d3) + (d5 - d6)

    # region masks
    in_a = (d1 <= 0.0) & (d2 <= 0.0)
    in_b = (d3 >= 0.0) & (d4 <= d3)
    in_c = (d6 >= 0.0) & (d5 <= d6)
    on_ab = (vc <= 0.0) & (d1 >= 0.0) & (d3 <= 0.0)
    on_ac = (vb <= 0.0) & (d2 >= 0.0) & (d6 <= 0.0)
    on_bc = (va <= 0.0) & (d4 - d3 >= 0.0) & (d5 - d6 >= 0.0)

    v_ab = d1 / jnp.where(jnp.abs(denom_vb) > 1e-20, denom_vb, 1.0)
    w_ac = d2 / jnp.where(jnp.abs(denom_vc) > 1e-20, denom_vc, 1.0)
    w_bc = (d4 - d3) / jnp.where(jnp.abs(denom_va) > 1e-20, denom_va, 1.0)

    denom_face = va + vb + vc
    inv_face = 1.0 / jnp.where(jnp.abs(denom_face) > 1e-20, denom_face, 1.0)
    v_f = vb * inv_face
    w_f = vc * inv_face

    result = a + v_f[..., None] * ab + w_f[..., None] * ac  # face (default)
    result = jnp.where(
        on_bc[..., None], b + w_bc[..., None] * (c - b), result
    )
    result = jnp.where(on_ac[..., None], a + w_ac[..., None] * ac, result)
    result = jnp.where(on_ab[..., None], a + v_ab[..., None] * ab, result)
    result = jnp.where(in_c[..., None], c, result)
    result = jnp.where(in_b[..., None], b, result)
    result = jnp.where(in_a[..., None], a, result)
    return result


def sphere_cast_vs_tris(o, d, r, soup: TriSoup, t_max=INF,
                        with_normal=True):
    """Sphere cast against the map; dispatches to the fused Pallas kernel on
    TPU, dense jnp sweep elsewhere. Returns (t [...], normal [..., 3]).
    The dense path always returns real normals; ``with_normal=False`` only
    relieves the TPU kernel (callers that ignore normals)."""
    if use_pallas():
        from .raycast_pallas import sphere_cast_vs_tris_pallas

        return sphere_cast_vs_tris_pallas(
            o, d, float(r), soup, t_max=t_max, with_normal=with_normal
        )
    return _sphere_cast_vs_tris_dense(o, d, r, soup, t_max)


def _sphere_cast_vs_tris_dense(o, d, r, soup: TriSoup, t_max=INF):
    """Sweep a sphere of radius r from o along unit d against all triangles.

    Jolt-style semantics matching MeshBVH::sphereCastTriangle
    (mesh_bvh.inl:885+):
      - start-penetration (closest tri point within r of o) => t = 0 with
        depenetration normal,
      - face hit: ray vs triangle plane offset by r toward the sphere,
        contact point inside the face,
      - edge/vertex hits: ray vs capsules of radius r around the edges.

    Returns (t [...], normal [..., 3]); miss => t = inf, normal = 0.
    """
    ob = o[..., None, :]  # [..., T, 3]
    db = d[..., None, :]

    n = soup.normal  # [T, 3]
    valid = soup.valid

    # --- start overlap ---
    closest = _closest_point_on_tri(ob, soup.v0, soup.e1, soup.e2)
    to_center = ob - closest
    dist2 = jnp.sum(to_center * to_center, axis=-1)
    overlap = (dist2 <= r * r) & valid
    dist = jnp.sqrt(jnp.maximum(dist2, 0.0))
    depen_n = jnp.where(
        dist[..., None] > 0.0,
        to_center / jnp.maximum(dist[..., None], 1e-30),
        jnp.array([0.0, 0.0, 1.0]),
    )

    # --- face hit ---
    ndotd = jnp.sum(n * db, axis=-1)  # [..., T]
    # signed distance of sphere center above the plane
    h = jnp.sum((ob - soup.v0) * n, axis=-1)
    sign = jnp.sign(h)
    sign = jnp.where(sign == 0.0, 1.0, sign)
    # center crosses the offset plane h = sign*r at t_face
    # h(t) = h + t*ndotd; the sphere touches the face when h(t) = sign*r
    safe_ndotd = jnp.where(jnp.abs(ndotd) > 1e-9, ndotd, 1.0)
    t_face = (sign * r - h) / safe_ndotd
    contact = ob + t_face[..., None] * db - sign[..., None] * r * n
    # inside test via barycentric coords of contact point
    cp = contact - soup.v0
    d00 = jnp.sum(soup.e1 * soup.e1, axis=-1)
    d01 = jnp.sum(soup.e1 * soup.e2, axis=-1)
    d11 = jnp.sum(soup.e2 * soup.e2, axis=-1)
    d20 = jnp.sum(cp * soup.e1, axis=-1)
    d21 = jnp.sum(cp * soup.e2, axis=-1)
    denom = d00 * d11 - d01 * d01
    inv_denom = jnp.where(jnp.abs(denom) > 1e-20, 1.0 / denom, 0.0)
    bv = (d11 * d20 - d01 * d21) * inv_denom
    bw = (d00 * d21 - d01 * d20) * inv_denom
    face_inside = (bv >= 0.0) & (bw >= 0.0) & (bv + bw <= 1.0)
    face_ok = (
        (jnp.abs(ndotd) > 1e-9) & (t_face >= 0.0) & face_inside & valid
    )
    t_face = jnp.where(face_ok, t_face, INF)
    face_n = sign[..., None] * n

    # --- edge capsules ---
    v1 = soup.v0 + soup.e1
    t_e0 = _ray_vs_segment_capsule(
        ob, db, soup.v0, soup.e1, jnp.sum(soup.e1 * soup.e1, axis=-1), r
    )
    t_e1 = _ray_vs_segment_capsule(
        ob, db, soup.v0, soup.e2, jnp.sum(soup.e2 * soup.e2, axis=-1), r
    )
    e12 = soup.e2 - soup.e1
    t_e2 = _ray_vs_segment_capsule(
        ob, db, v1, e12, jnp.sum(e12 * e12, axis=-1), r
    )
    t_edge = jnp.minimum(t_e0, jnp.minimum(t_e1, t_e2))
    t_edge = jnp.where(valid, t_edge, INF)

    # combine face/edge per tri; compute normal at hit
    t_sweep = jnp.minimum(t_face, t_edge)
    # edge-hit normal: from closest point on tri (at hit time) to center
    hit_center = ob + t_sweep[..., None] * db
    edge_closest = _closest_point_on_tri(hit_center, soup.v0, soup.e1, soup.e2)
    edge_n_raw = hit_center - edge_closest
    edge_n_len = jnp.linalg.norm(edge_n_raw, axis=-1, keepdims=True)
    edge_n = jnp.where(
        edge_n_len > 1e-12,
        edge_n_raw / jnp.maximum(edge_n_len, 1e-30),
        jnp.array([0.0, 0.0, 1.0]),
    )
    tri_n = jnp.where((t_face <= t_edge)[..., None], face_n, edge_n)

    # apply start-overlap override per tri
    t_tri = jnp.where(overlap, 0.0, t_sweep)
    tri_n = jnp.where(overlap[..., None], depen_n, tri_n)

    # reduce over triangles
    t_best = jnp.min(t_tri, axis=-1)
    best_idx = jnp.argmin(t_tri, axis=-1)
    n_best = jnp.take_along_axis(
        tri_n, best_idx[..., None, None], axis=-2
    )[..., 0, :]

    missed = t_best > t_max
    t_out = jnp.where(missed, INF, t_best)
    n_out = jnp.where(missed[..., None], 0.0, n_best)
    return t_out, n_out
