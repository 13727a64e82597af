"""Pallas TPU kernels over per-cell candidate sets (ops/culling.py).

Three kernels replace the dense all-triangles sweeps on the hot path:

  * fan_cull      — per-agent sensor/fire ray fans vs the agent's cell
                    candidates (K tris instead of the whole soup),
  * sphere_cast_cull — grouped movement sphere casts (CPA casts per agent)
                    vs the agent's cell candidates, with host-precomputed
                    per-triangle derived constants,
  * fan_capsules  — per-world sensor rays vs the 12 agent capsules
                    (replaces the HBM-heavy XLA broadcast sweep).

Candidate blocks are streamed per agent straight from the [C, rows, K]
tables in HBM via scalar-prefetch index maps (the same table is declared
once per block slot), so no gathered per-query copies ever hit HBM.

Replaces the reference's per-thread BVH traversal (src/mesh_bvh.inl
traceRay / sphereCast) with regular, divergence-free sweeps over small
candidate sets.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .raycast_pallas import _interp, SC2_ROWS

INF = jnp.inf

# ---------------------------------------------------------------------------
# Packed sphere-cast constants v3: all per-triangle derived terms hoisted to
# the host so the kernel's per-pair work (and live-register count) shrinks.
# Contact-point containment is an affine function of the contact point
# (barycentric row vectors w1/w2, like the ray kernel) instead of the
# two-dot Cramer solve — together with precomputed inverse edge lengths
# this removes ~45 VPU ops and 3 divides per (cast, tri) pair.
# Rows of the [40, T] matrix:
#   0-2  v0        3-5  e1        6-8  e2       9-11 unit normal
#   12   valid     13   d00       14   d11      15   l12 (|e12|^2)
#   16-18 v1       19-21 v2       22-24 e12 (e2-e1)
#   25   1/d00     26   1/d11     27   1/l12
#   28-30 w1       31   c1        32-34 w2      35   c2
#   36   w1.n      37   w2.n      38   n.v0 (plane offset)
# ---------------------------------------------------------------------------


def pack_sc2_consts(tri_verts: np.ndarray, pad_to: int = 128) -> np.ndarray:
    t = tri_verts.shape[0]
    T = -(-max(t, 1) // pad_to) * pad_to
    v = np.zeros((T, 3, 3), np.float64)
    v[:t] = tri_verts
    v0 = v[:, 0]
    e1 = v[:, 1] - v[:, 0]
    e2 = v[:, 2] - v[:, 0]
    n = np.cross(e1, e2)
    ln = np.linalg.norm(n, axis=-1, keepdims=True)
    n = np.where(ln > 1e-20, n / np.maximum(ln, 1e-30), 0.0)
    d00 = np.sum(e1 * e1, axis=-1)
    d01 = np.sum(e1 * e2, axis=-1)
    d11 = np.sum(e2 * e2, axis=-1)
    den = d00 * d11 - d01 * d01
    inv_den = np.where(
        np.abs(den) > 1e-20, 1.0 / np.where(den == 0, 1, den), 0.0
    )
    e12 = e2 - e1
    l12 = np.sum(e12 * e12, axis=-1)
    # barycentric affine rows: bv(x) = w1.x + c1, bw(x) = w2.x + c2
    w1 = (d11[:, None] * e1 - d01[:, None] * e2) * inv_den[:, None]
    w2 = (d00[:, None] * e2 - d01[:, None] * e1) * inv_den[:, None]

    def safe_inv(x):
        return np.where(np.abs(x) > 1e-20, 1.0 / np.where(x == 0, 1, x), 0.0)

    out = np.zeros((SC2_ROWS, T), np.float32)
    out[0:3] = v0.T
    out[3:6] = e1.T
    out[6:9] = e2.T
    out[9:12] = n.T
    out[12] = ((np.arange(T) < t) & (ln[:, 0] > 1e-20)).astype(np.float32)
    out[13] = d00
    out[14] = d11
    out[15] = l12
    out[16:19] = (v0 + e1).T
    out[19:22] = (v0 + e2).T
    out[22:25] = e12.T
    out[25] = safe_inv(d00)
    out[26] = safe_inv(d11)
    out[27] = safe_inv(l12)
    out[28:31] = w1.T
    out[31] = -np.sum(w1 * v0, axis=-1)
    out[32:35] = w2.T
    out[35] = -np.sum(w2 * v0, axis=-1)
    out[36] = np.sum(w1 * n, axis=-1)
    out[37] = np.sum(w2 * n, axis=-1)
    out[38] = np.sum(n * v0, axis=-1)
    return out


# ---------------------------------------------------------------------------
# fan_cull: sensor ray fans vs cell candidates
# ---------------------------------------------------------------------------

FANS_PER_BLOCK = 16

# ray-const row ids (pack_tri_consts layout, raycast_pallas.py)
_NX, _NY, _NZ, _D0 = 0, 1, 2, 3
_W1X, _W1Y, _W1Z, _C1 = 4, 5, 6, 7
_W2X, _W2Y, _W2Z, _C2 = 8, 9, 10, 11
_VALID = 12


def _make_fan_cull_kernel(F: int, K: int):
    FPB = FANS_PER_BLOCK

    def kernel(cells_ref, orig_ref, rays_ref, *rest):
        cand_refs = rest[:FPB]
        out_ref = rest[FPB]
        dirs = rays_ref[:]  # [FPB*F, 8]: dx dy dz zoff
        inf = jnp.float32(np.inf)
        for f in range(FPB):
            tc = cand_refs[f][0]  # [16, K]
            nx, ny, nz = tc[_NX:_NX + 1], tc[_NY:_NY + 1], tc[_NZ:_NZ + 1]
            d0 = tc[_D0:_D0 + 1]
            w1x, w1y, w1z = (
                tc[_W1X:_W1X + 1], tc[_W1Y:_W1Y + 1], tc[_W1Z:_W1Z + 1]
            )
            c1 = tc[_C1:_C1 + 1]
            w2x, w2y, w2z = (
                tc[_W2X:_W2X + 1], tc[_W2Y:_W2Y + 1], tc[_W2Z:_W2Z + 1]
            )
            c2 = tc[_C2:_C2 + 1]
            valid = tc[_VALID:_VALID + 1] > 0.0

            ox = orig_ref[f, 0]
            oy = orig_ref[f, 1]
            oz = orig_ref[f, 2]
            no2 = d0 - (ox * nx + oy * ny + oz * nz)  # [1, K]
            u0 = ox * w1x + oy * w1y + oz * w1z + c1
            v0 = ox * w2x + oy * w2y + oz * w2z + c2

            sl = slice(f * F, (f + 1) * F)
            dx = dirs[sl, 0:1]
            dy = dirs[sl, 1:2]
            dz = dirs[sl, 2:3]
            z = dirs[sl, 3:4]

            nd = dx * nx + dy * ny + dz * nz  # [F, K]
            w1d = dx * w1x + dy * w1y + dz * w1z
            w2d = dx * w2x + dy * w2y + dz * w2z

            t = (no2 - z * nz) / nd
            u = (u0 + z * w1z) + t * w1d
            v = (v0 + z * w2z) + t * w2d
            hit = (
                (t > 0.0) & (u >= 0.0) & (v >= 0.0)
                & (u + v <= 1.0) & valid & (t < inf)
            )
            tt = jnp.where(hit, t, inf)
            out_ref[sl, :] = jnp.min(tt, axis=1, keepdims=True)

    return kernel


_FAN_CULL_CACHE = {}


def _get_fan_cull(F: int, K: int):
    ck = (F, K, _interp())
    if ck in _FAN_CULL_CACHE:
        return _FAN_CULL_CACHE[ck]

    FPB = FANS_PER_BLOCK
    kernel = _make_fan_cull_kernel(F, K)

    def call(cells, origs, dirs8, ray_table):
        N = origs.shape[0]
        grid = (N // FPB,)
        in_specs = [
            pl.BlockSpec((FPB, 8), lambda i, cr: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((FPB * F, 8), lambda i, cr: (i, 0)),
        ]
        for f in range(FPB):
            in_specs.append(
                pl.BlockSpec((1, 16, K),
                             (lambda i, cr, f=f: (cr[i * FPB + f], 0, 0)))
            )
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((FPB * F, 1), lambda i, cr: (i, 0)),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((N * F, 1), jnp.float32),
            interpret=_interp(),
        )(cells, origs, dirs8, *([ray_table] * FPB))

    @jax.custom_batching.custom_vmap
    def fan_cull_flat(origins, zoffs, dirs, cells, ray_table):
        N = origins.shape[0]
        N_pad = -(-max(N, 1) // FPB) * FPB
        origs = jnp.concatenate(
            [origins, jnp.zeros((N, 5), jnp.float32)], axis=1
        )
        origs = jnp.pad(origs, ((0, N_pad - N), (0, 0)))
        dirs8 = jnp.concatenate(
            [
                dirs.reshape(N * F, 3),
                zoffs.reshape(N * F, 1),
                jnp.zeros((N * F, 4), jnp.float32),
            ],
            axis=1,
        )
        dirs8 = jnp.pad(dirs8, ((0, (N_pad - N) * F), (0, 0)))
        cells_p = jnp.pad(cells.astype(jnp.int32), (0, N_pad - N))
        out = call(cells_p, origs, dirs8, ray_table)
        return out[: N * F, 0].reshape(N, F)

    @fan_cull_flat.def_vmap
    def _vmap(axis_size, in_batched, origins, zoffs, dirs, cells, ray_table):
        ob, zb, db, cb, tb = in_batched
        assert not tb, "candidate table must not be batched"
        B = axis_size

        def bcast(x, batched):
            if batched:
                return x.reshape((-1,) + x.shape[2:])
            return jnp.broadcast_to(x[None], (B,) + x.shape).reshape(
                (-1,) + x.shape[1:]
            )

        out = fan_cull_flat(
            bcast(origins, ob), bcast(zoffs, zb), bcast(dirs, db),
            bcast(cells, cb), ray_table,
        )
        return out.reshape((B, -1) + out.shape[1:]), True

    _FAN_CULL_CACHE[ck] = fan_cull_flat
    return fan_cull_flat


def ray_fans_cull(origins, zoffs, dirs, cells, tables, t_max=INF):
    """Culled nearest-hit ray fans: origins [..., 3], zoffs [..., F],
    dirs [..., F, 3], cells [...] (i32 from culling.cell_index).
    Returns t [..., F] (inf on miss). Semantics match ray_fans_vs_tris."""
    batch_shape = origins.shape[:-1]
    F = dirs.shape[-2]
    N = int(np.prod(batch_shape)) if batch_shape else 1
    fan = _get_fan_cull(F, tables.K)
    t = fan(
        origins.reshape(N, 3),
        zoffs.reshape(N, F),
        dirs.reshape(N, F, 3),
        cells.reshape(N),
        tables.ray_packed,
    ).reshape(batch_shape + (F,))
    return jnp.where(t <= t_max, t, INF)


def rays_cull(o, d, cells, tables, t_max=INF):
    """Culled single-ray nearest hit (fire hitscan): o, d [..., 3],
    cells [...]. Returns t [...]. Uses the fan kernel with F=1."""
    t = ray_fans_cull(
        o, jnp.zeros(o.shape[:-1] + (1,), o.dtype), d[..., None, :],
        cells, tables, t_max=t_max,
    )
    return t[..., 0]


# ---------------------------------------------------------------------------
# sphere_cast_cull: grouped movement casts vs cell candidates
# ---------------------------------------------------------------------------

AGENTS_PER_BLOCK = 8


def _make_sc_cull_kernel(CPA: int, K: int, r: float):
    AGB = AGENTS_PER_BLOCK
    rr = float(r)

    def kernel(cells_ref, rays_ref, *rest):
        cand_refs = rest[:AGB]
        t_ref = rest[AGB]
        idx_ref = rest[AGB + 1]
        rays = rays_ref[:]  # [AGB*CPA, 8]
        inf = jnp.float32(np.inf)
        for a in range(AGB):
            tc = cand_refs[a][0]  # [SC2_ROWS, K] pack_sc2_consts v3 layout
            v0 = (tc[0:1], tc[1:2], tc[2:3])
            e1 = (tc[3:4], tc[4:5], tc[5:6])
            e2 = (tc[6:7], tc[7:8], tc[8:9])
            nx, ny, nz = tc[9:10], tc[10:11], tc[11:12]
            valid = tc[12:13] > 0.0
            d00, d11, l12 = tc[13:14], tc[14:15], tc[15:16]
            v1 = (tc[16:17], tc[17:18], tc[18:19])
            v2 = (tc[19:20], tc[20:21], tc[21:22])
            e12 = (tc[22:23], tc[23:24], tc[24:25])
            inv_d00, inv_d11, inv_l12 = tc[25:26], tc[26:27], tc[27:28]
            w1 = (tc[28:29], tc[29:30], tc[30:31])
            c1 = tc[31:32]
            w2 = (tc[32:33], tc[33:34], tc[34:35])
            c2 = tc[35:36]
            w1n, w2n = tc[36:37], tc[37:38]
            nv0 = tc[38:39]

            sl = slice(a * CPA, (a + 1) * CPA)
            ox, oy, oz = rays[sl, 0:1], rays[sl, 1:2], rays[sl, 2:3]
            dx, dy, dz = rays[sl, 3:4], rays[sl, 4:5], rays[sl, 5:6]

            # face: ray vs plane offset by r toward the sphere, contact
            # barycentrics inside (sphereCastTriangle face case,
            # reference src/mesh_bvh.inl); barycentrics are affine in the
            # contact point (w1/w2 rows) — same math as the dense kernel
            nd = nx * dx + ny * dy + nz * dz  # [CPA, K]
            h = (nx * ox + ny * oy + nz * oz) - nv0
            u0 = w1[0] * ox + w1[1] * oy + w1[2] * oz + c1
            v0b = w2[0] * ox + w2[1] * oy + w2[2] * oz + c2
            w1d = w1[0] * dx + w1[1] * dy + w1[2] * dz
            w2d = w2[0] * dx + w2[1] * dy + w2[2] * dz
            rw1n = rr * w1n
            rw2n = rr * w2n
            sign = jnp.where(h >= 0.0, jnp.float32(1.0), jnp.float32(-1.0))
            nd_ok = jnp.abs(nd) > 1e-9
            t_face = (sign * rr - h) / jnp.where(nd_ok, nd, jnp.float32(1.0))
            bv = u0 + t_face * w1d - sign * rw1n
            bw = v0b + t_face * w2d - sign * rw2n
            face_ok = (
                nd_ok & (t_face >= 0.0) & (bv >= 0.0) & (bw >= 0.0)
                & (bv + bw <= 1.0)
            )
            t_face = jnp.where(face_ok, t_face, inf)

            # start-overlap, face region (plane projection p = o - h n)
            pv = u0 - h * w1n
            pw = v0b - h * w2n
            overlap = (
                (jnp.abs(h) <= rr) & (pv >= 0.0) & (pw >= 0.0)
                & (pv + pw <= 1.0)
            )

            def capsule(p0, sx, sy, sz, len2, inv_l2):
                mx, my, mz = ox - p0[0], oy - p0[1], oz - p0[2]
                md = mx * dx + my * dy + mz * dz
                ms = mx * sx + my * sy + mz * sz
                ds = dx * sx + dy * sy + dz * sz
                mm = mx * mx + my * my + mz * mz
                aa = 1.0 - ds * ds * inv_l2
                bb = md - ms * ds * inv_l2
                cc = mm - ms * ms * inv_l2 - rr * rr
                start_in = (cc <= 0.0) & (ms >= 0.0) & (ms <= len2)
                disc = bb * bb - aa * cc
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                safe_a = jnp.where(jnp.abs(aa) > 1e-12, aa, jnp.float32(1.0))
                t_cyl = (-bb - sq) / safe_a
                s_hit = ms + t_cyl * ds
                ok = (
                    (jnp.abs(aa) > 1e-12) & (disc >= 0.0) & (t_cyl >= 0.0)
                    & (s_hit >= 0.0) & (s_hit <= len2)
                )
                return jnp.where(ok, t_cyl, inf), start_in

            def sphere(c):
                mx, my, mz = ox - c[0], oy - c[1], oz - c[2]
                bb = mx * dx + my * dy + mz * dz
                cc = mx * mx + my * my + mz * mz - rr * rr
                disc = bb * bb - cc
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                ts = -bb - sq
                ok = (disc >= 0.0) & (ts >= 0.0)
                return jnp.where(ok, ts, inf), cc <= 0.0

            t_edge, in0 = capsule(v0, e1[0], e1[1], e1[2], d00, inv_d00)
            overlap = overlap | in0
            t_e, in1 = capsule(v0, e2[0], e2[1], e2[2], d11, inv_d11)
            t_edge = jnp.minimum(t_edge, t_e)
            overlap = overlap | in1
            t_e, in2 = capsule(v1, e12[0], e12[1], e12[2], l12, inv_l12)
            t_edge = jnp.minimum(t_edge, t_e)
            overlap = overlap | in2
            for c in (v0, v1, v2):
                t_s, in_s = sphere(c)
                t_edge = jnp.minimum(t_edge, t_s)
                overlap = overlap | in_s

            t = jnp.minimum(t_face, t_edge)
            t = jnp.where(overlap, jnp.float32(0.0), t)
            t = jnp.where(valid, t, inf)

            lane = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
            t_min = jnp.min(t, axis=1, keepdims=True)
            idx = jnp.min(
                jnp.where(t == t_min, lane, jnp.int32(2 ** 30)),
                axis=1, keepdims=True,
            )
            t_ref[sl, :] = t_min
            idx_ref[sl, :] = idx

    return kernel


_SC_CULL_CACHE = {}


def _get_sc_cull(CPA: int, K: int, r: float):
    ck = (CPA, K, r, _interp())
    if ck in _SC_CULL_CACHE:
        return _SC_CULL_CACHE[ck]

    AGB = AGENTS_PER_BLOCK
    kernel = _make_sc_cull_kernel(CPA, K, r)

    def call(cells, rays, sc_table):
        N = cells.shape[0]
        grid = (N // AGB,)
        in_specs = [pl.BlockSpec((AGB * CPA, 8), lambda i, cr: (i, 0))]
        for a in range(AGB):
            in_specs.append(
                pl.BlockSpec((1, SC2_ROWS, K),
                             (lambda i, cr, a=a: (cr[i * AGB + a], 0, 0)))
            )
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((AGB * CPA, 1), lambda i, cr: (i, 0)),
                pl.BlockSpec((AGB * CPA, 1), lambda i, cr: (i, 0)),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=gs,
            out_shape=[
                jax.ShapeDtypeStruct((N * CPA, 1), jnp.float32),
                jax.ShapeDtypeStruct((N * CPA, 1), jnp.int32),
            ],
            interpret=_interp(),
        )(cells, rays, *([sc_table] * AGB))

    @jax.custom_batching.custom_vmap
    def sc_cull_flat(o, d, cells, sc_table):
        """o, d: [N, CPA, 3]; cells [N] -> (t [N, CPA], idx [N, CPA])."""
        N = o.shape[0]
        N_pad = -(-max(N, 1) // AGB) * AGB
        rays = jnp.concatenate(
            [o.reshape(N * CPA, 3), d.reshape(N * CPA, 3),
             jnp.zeros((N * CPA, 2), jnp.float32)],
            axis=1,
        )
        rays = jnp.pad(rays, ((0, (N_pad - N) * CPA), (0, 0)))
        cells_p = jnp.pad(cells.astype(jnp.int32), (0, N_pad - N))
        t, idx = call(cells_p, rays, sc_table)
        return (
            t[: N * CPA, 0].reshape(N, CPA),
            idx[: N * CPA, 0].reshape(N, CPA),
        )

    @sc_cull_flat.def_vmap
    def _vmap(axis_size, in_batched, o, d, cells, sc_table):
        ob, db, cb, tb = in_batched
        assert not tb
        B = axis_size

        def bcast(x, batched):
            if batched:
                return x.reshape((-1,) + x.shape[2:])
            return jnp.broadcast_to(x[None], (B,) + x.shape).reshape(
                (-1,) + x.shape[1:]
            )

        t, idx = sc_cull_flat(bcast(o, ob), bcast(d, db), bcast(cells, cb),
                              sc_table)
        return (
            (t.reshape((B, -1) + t.shape[1:]),
             idx.reshape((B, -1) + idx.shape[1:])),
            (True, True),
        )

    _SC_CULL_CACHE[ck] = sc_cull_flat
    return sc_cull_flat


def sphere_cast_cull(o, d, r: float, cells, tables, soup, t_max=INF):
    """Culled grouped sphere casts. o, d: [..., CPA, 3]; cells [...] — one
    cell per *group* (the casting agent). Returns (t [..., CPA],
    normal [..., CPA, 3]) with ops/raycast.sphere_cast_vs_tris semantics."""
    batch_shape = o.shape[:-2]
    CPA = o.shape[-2]
    N = int(np.prod(batch_shape)) if batch_shape else 1

    sc = _get_sc_cull(CPA, tables.K, float(r))
    t, kidx = sc(
        o.reshape(N, CPA, 3), d.reshape(N, CPA, 3), cells.reshape(N),
        tables.sc_packed,
    )

    # winner-only normal reconstruction (as sphere_cast_vs_tris_pallas):
    # map the in-cell winner lane back to the original triangle
    cells_f = cells.reshape(N)
    kidx_c = jnp.clip(kidx, 0, tables.K - 1)
    orig = tables.cand_idx[cells_f[:, None], kidx_c]  # [N, CPA]
    orig = jnp.clip(orig, 0, soup.v0.shape[0] - 1)

    from .raycast import _closest_point_on_tri

    of = o.reshape(N, CPA, 3)
    df = d.reshape(N, CPA, 3)
    v0 = soup.v0[orig]
    e1 = soup.e1[orig]
    e2 = soup.e2[orig]
    n = soup.normal[orig]

    finite_t = jnp.where(jnp.isfinite(t), t, 0.0)
    hit_center = of + finite_t[..., None] * df
    closest = _closest_point_on_tri(hit_center, v0, e1, e2)
    depen = hit_center - closest
    dlen = jnp.linalg.norm(depen, axis=-1, keepdims=True)
    edge_n = jnp.where(
        dlen > 1e-12, depen / jnp.maximum(dlen, 1e-30),
        jnp.array([0.0, 0.0, 1.0]),
    )
    h = jnp.sum((of - v0) * n, axis=-1)
    sign = jnp.where(h >= 0.0, 1.0, -1.0)
    face_n = sign[..., None] * n
    is_face = jnp.abs(jnp.sum(edge_n * n, axis=-1)) > 0.999
    normal = jnp.where(is_face[..., None], face_n, edge_n)

    missed = ~jnp.isfinite(t) | (t > t_max)
    t_final = jnp.where(missed, INF, t)
    normal = jnp.where(missed[..., None], 0.0, normal)
    return (
        t_final.reshape(batch_shape + (CPA,)),
        normal.reshape(batch_shape + (CPA, 3)),
    )


# ---------------------------------------------------------------------------
# fan_capsules: per-world sensor rays vs agent capsules
# ---------------------------------------------------------------------------
#
# Layout: capsules ride the SUBLANE axis (12 -> 16 rows), rays the LANE axis
# (A*F per world, padded to 128). The XLA formulation materializes
# [W, A, F, A] broadcast temporaries in HBM; here everything stays in VMEM.

_CAP_ROWS = 16
WORLDS_PER_BLOCK = int(os.environ.get("MPENV_CAP_WPB", "8"))


def _make_cap_kernel(AF: int, A: int, radius: float, seg_h: float,
                     derive_origins: bool = False, F_real: int = 0):
    """derive_origins: the rays block carries only [zoff dx dy dz] rows;
    per-ray origin xy/base-z and the caster index are reconstructed
    in-kernel (self = lane // F by exact float floor; origin = one-hot
    masked sum over the capsule rows) — halves the XLA-side operand stack
    and kills the [W, A, F] origin broadcasts."""
    rr = float(radius)
    sh = float(seg_h)
    WPB = WORLDS_PER_BLOCK

    def kernel(rays_ref, caps_ref, t_ref, idx_ref):
        for w in range(WPB):
            r = rays_ref[w]
            caps = caps_ref[w]  # [16, 8]: px py pz alive
            shape = (_CAP_ROWS, AF)

            def col(j):
                return jax.lax.broadcast_in_dim(
                    caps[:, j:j + 1], shape, (0, 1)
                )

            px, py, pz = col(0), col(1), col(2)
            alive = col(3) > 0.0

            cap_i = jax.lax.broadcasted_iota(jnp.int32, shape, 0).astype(
                jnp.float32
            )

            if derive_origins:
                # rows: zoff dx dy dz (per-ray); lanes are a*F_real + f,
                # pad lanes map to agent >= A and always miss
                F = F_real
                zoff = r[0:1, :]
                dx, dy, dz = r[1:2, :], r[2:3, :], r[3:4, :]
                lane = jax.lax.broadcasted_iota(
                    jnp.int32, (1, AF), 1
                ).astype(jnp.float32)
                self_idx = jnp.floor((lane + 0.5) * (1.0 / F))
                oh = cap_i == self_idx  # [16, AF]
                ox = jnp.sum(jnp.where(oh, px, 0.0), axis=0, keepdims=True)
                oy = jnp.sum(jnp.where(oh, py, 0.0), axis=0, keepdims=True)
                ozb = jnp.sum(jnp.where(oh, pz, 0.0), axis=0, keepdims=True)
                oz = ozb + zoff
                not_self = ~oh
            else:
                # rows: ox oy oz dx dy dz self_idx pad
                ox, oy, oz = r[0:1, :], r[1:2, :], r[2:3, :]
                dx, dy, dz = r[3:4, :], r[4:5, :], r[5:6, :]
                self_idx = r[6:7, :]
                not_self = cap_i != self_idx

            # pad rows (cap_i >= A) ship alive=0, so no explicit index check
            valid = alive & not_self

            # per-ray terms hoisted to [1, AF] rows (1/16 tile cost):
            # aa = 1 - dz^2 and its reciprocal replace a full-tile divide
            aa = 1.0 - dz * dz  # [1, AF]
            nondeg = aa > 1e-12
            inv_aa = 1.0 / jnp.where(nondeg, aa, jnp.float32(1.0))

            # capsule segment: p0 = base + (0,0,r), axis +z, length sh
            mx = ox - px
            my = oy - py
            mz = oz - (pz + rr)
            # cylinder: c = mx^2 + my^2 - r^2 (z-aligned axis drops out of
            # b and c); bb/cc are shared with both end-cap sphere tests
            bb = mx * dx + my * dy
            cc = (mx * mx + my * my) - rr * rr
            disc = bb * bb - aa * cc
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            t_cyl = (-bb - sq) * inv_aa
            zh = mz + t_cyl * dz
            inf = jnp.float32(np.inf)
            cyl_ok = (
                nondeg & (disc >= 0.0) & (t_cyl >= 0.0)
                & (zh >= 0.0) & (zh <= sh)
            )
            t = jnp.where(cyl_ok, t_cyl, inf)

            # end-cap spheres at z offsets 0 and sh: b2 = bb + mzz*dz,
            # c2 = cc + mzz^2 (only the z terms differ from the cylinder)
            for z0 in (0.0, sh):
                mzz = mz if z0 == 0.0 else mz - z0
                b2 = bb + mzz * dz
                c2 = cc + mzz * mzz
                disc2 = b2 * b2 - c2
                sq2 = jnp.sqrt(jnp.maximum(disc2, 0.0))
                ts = -b2 - sq2
                ok = (disc2 >= 0.0) & (ts >= 0.0)
                t = jnp.minimum(t, jnp.where(ok, ts, inf))

            t = jnp.where(valid, t, inf)
            t_min = jnp.min(t, axis=0, keepdims=True)
            row = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
            idx = jnp.min(
                jnp.where(t == t_min, row, jnp.int32(2 ** 30)),
                axis=0, keepdims=True,
            )
            t_ref[w] = t_min
            idx_ref[w] = jnp.where(jnp.isfinite(t_min), idx, -1)

    return kernel


_CAP_CACHE = {}


def _get_cap_kernel(AF_pad: int, A: int, radius: float, seg_h: float,
                    derive_origins: bool = False, F_real: int = 0):
    ck = (AF_pad, A, radius, seg_h, derive_origins, F_real, _interp())
    if ck in _CAP_CACHE:
        return _CAP_CACHE[ck]

    kernel = _make_cap_kernel(AF_pad, A, radius, seg_h,
                              derive_origins=derive_origins, F_real=F_real)

    def call(rays, caps):
        W = rays.shape[0]
        WPB = WORLDS_PER_BLOCK
        W_pad = -(-W // WPB) * WPB
        rays = jnp.pad(rays, ((0, W_pad - W), (0, 0), (0, 0)))
        caps = jnp.pad(caps, ((0, W_pad - W), (0, 0), (0, 0)))
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(W_pad // WPB,),
            in_specs=[
                pl.BlockSpec((WPB, 8, AF_pad), lambda i: (i, 0, 0)),
                pl.BlockSpec((WPB, _CAP_ROWS, 8), lambda i: (i, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((WPB, 1, AF_pad), lambda i: (i, 0, 0)),
                pl.BlockSpec((WPB, 1, AF_pad), lambda i: (i, 0, 0)),
            ],
        )

        t, idx = pl.pallas_call(
            kernel,
            grid_spec=gs,
            out_shape=[
                jax.ShapeDtypeStruct((W_pad, 1, AF_pad), jnp.float32),
                jax.ShapeDtypeStruct((W_pad, 1, AF_pad), jnp.int32),
            ],
            interpret=_interp(),
        )(rays, caps)
        return t[:W], idx[:W]

    _CAP_CACHE[ck] = call
    return call


_CAP_FLAT_CACHE = {}


def _get_cap_flat(A: int, F: int, radius: float, seg_h: float):
    ck = (A, F, radius, seg_h, _interp())
    if ck in _CAP_FLAT_CACHE:
        return _CAP_FLAT_CACHE[ck]

    AF = A * F
    AF_pad = -(-AF // 128) * 128

    def _run(o, dirs, self_idx, cap_pos, alive):
        W = o.shape[0]
        # build [W, 8, AF] directly (component slices stack into rows) —
        # a [W, AF, 8] concat + transpose costs a full HBM relayout pass
        rays = jnp.stack(
            [
                o[..., 0].reshape(W, AF),
                o[..., 1].reshape(W, AF),
                o[..., 2].reshape(W, AF),
                dirs[..., 0].reshape(W, AF),
                dirs[..., 1].reshape(W, AF),
                dirs[..., 2].reshape(W, AF),
                self_idx.reshape(W, AF).astype(jnp.float32),
                jnp.zeros((W, AF), jnp.float32),
            ],
            axis=1,
        )  # [W, 8, AF]
        rays = jnp.pad(rays, ((0, 0), (0, 0), (0, AF_pad - AF)))

        caps = jnp.concatenate(
            [cap_pos, alive.astype(jnp.float32)[..., None]], axis=-1
        )  # [W, A, 4]
        caps = jnp.pad(caps, ((0, 0), (0, _CAP_ROWS - A), (0, 4)))

        call = _get_cap_kernel(AF_pad, A, radius, seg_h)
        t, idx = call(rays, caps)
        t = t[:, 0, :AF].reshape(W, A, F)
        idx = idx[:, 0, :AF].reshape(W, A, F)
        return t, idx

    @jax.custom_batching.custom_vmap
    def cap_flat(o, dirs, self_idx, cap_pos, alive):
        """Single world: o/dirs [A, F, 3], self_idx [A, F], cap_pos [A, 3],
        alive [A] -> (t [A, F], idx [A, F])."""
        t, idx = _run(
            o[None], dirs[None], self_idx[None], cap_pos[None], alive[None]
        )
        return t[0], idx[0]

    @cap_flat.def_vmap
    def _vmap(axis_size, in_batched, o, dirs, self_idx, cap_pos, alive):
        W = axis_size

        def bc(x, batched):
            if batched:
                return x
            return jnp.broadcast_to(x[None], (W,) + x.shape)

        t, idx = _run(*[
            bc(x, b) for x, b in zip(
                (o, dirs, self_idx, cap_pos, alive), in_batched
            )
        ])
        return (t, idx), (True, True)

    _CAP_FLAT_CACHE[ck] = cap_flat
    return cap_flat


_CAP_PLANAR_CACHE = {}


def _get_cap_flat_planar(A: int, F: int, radius: float, seg_h: float):
    ck = (A, F, radius, seg_h, _interp())
    if ck in _CAP_PLANAR_CACHE:
        return _CAP_PLANAR_CACHE[ck]

    AF = A * F
    AF_pad = -(-AF // 128) * 128

    def _run(pos, zoff, dx, dy, dz, alive):
        W = pos.shape[0]
        # origins + caster index are reconstructed in-kernel from the
        # capsule table (derive_origins): only per-ray rows ship
        rays = jnp.stack(
            [
                zoff.reshape(W, AF),
                dx.reshape(W, AF), dy.reshape(W, AF), dz.reshape(W, AF),
            ],
            axis=1,
        )  # [W, 4, AF]
        rays = jnp.pad(rays, ((0, 0), (0, 4), (0, AF_pad - AF)))

        caps = jnp.concatenate(
            [pos, alive.astype(jnp.float32)[..., None]], axis=-1
        )  # [W, A, 4]
        caps = jnp.pad(caps, ((0, 0), (0, _CAP_ROWS - A), (0, 4)))

        call = _get_cap_kernel(AF_pad, A, radius, seg_h,
                               derive_origins=True, F_real=F)
        t, idx = call(rays, caps)
        t = t[:, 0, :AF].reshape(W, A, F)
        idx = idx[:, 0, :AF].reshape(W, A, F)
        return t, idx

    @jax.custom_batching.custom_vmap
    def cap_flat(pos, zoff, dx, dy, dz, alive):
        """Single world: pos [A, 3], zoff/dx/dy/dz [A, F], alive [A] ->
        (t [A, F], idx [A, F]); the caster's own capsule is excluded."""
        t, idx = _run(
            pos[None], zoff[None], dx[None], dy[None], dz[None], alive[None]
        )
        return t[0], idx[0]

    @cap_flat.def_vmap
    def _vmap(axis_size, in_batched, pos, zoff, dx, dy, dz, alive):
        W = axis_size

        def bc(x, batched):
            if batched:
                return x
            return jnp.broadcast_to(x[None], (W,) + x.shape)

        t, idx = _run(*[
            bc(x, b) for x, b in zip(
                (pos, zoff, dx, dy, dz, alive), in_batched
            )
        ])
        return (t, idx), (True, True)

    _CAP_PLANAR_CACHE[ck] = cap_flat
    return cap_flat


def fan_capsules_planar(pos, zoff, dxyz, alive, radius, seg_h):
    """Component-planar fan_capsules: per world pos [A, 3], zoff [A, F]
    (per-ray origin z offset above pos), dxyz = (dx, dy, dz) each [A, F],
    alive [A] bool. Self capsule always excluded. Returns (t [A, F],
    hit_idx [A, F], -1 on miss). Avoids the [A, F, 3]-minor operand build
    of ``fan_capsules`` (XLA pads 3-minor arrays to 128 lanes)."""
    dx, dy, dz = dxyz
    A, F = dx.shape[-2], dx.shape[-1]
    cap = _get_cap_flat_planar(A, F, float(radius), float(seg_h))
    return cap(pos, zoff, dx, dy, dz, alive)


def fan_capsules(o, dirs, self_idx, cap_pos, alive, radius, seg_h):
    """Sensor rays vs the world's agent capsules, one world per grid step.

    Per-world shapes (vmap over worlds batches them into the kernel grid):
    o, dirs [A, F, 3]; self_idx [A, F] (capsule to exclude); cap_pos [A, 3];
    alive [A] bool. Returns (t [A, F] (inf miss), hit_idx [A, F] i32, -1 on
    miss). Mirrors ops.raycast.ray_vs_capsules + argmin (checkCapsuleEntity,
    reference src/utils.cpp:34-54)."""
    A, F = o.shape[-3], o.shape[-2]
    cap = _get_cap_flat(A, F, float(radius), float(seg_h))
    return cap(o, dirs, self_idx, cap_pos, alive)


# ---------------------------------------------------------------------------
# Cell-sorted fan kernel: fans are sorted by culling cell and padded so each
# Pallas block covers ONE cell — the block loads a single [16, K] candidate
# table + its bf16 direction-dot matrix (same MXU structure as the dense
# kernel in raycast_pallas, just with K candidates instead of the whole
# soup). This is the layout the per-fan candidate kernel above lacked: it
# re-loaded FPB candidate blocks per grid step and lost the MXU dots.
# Replaces the reference's per-thread BVH descent (mesh_bvh.inl traceRay)
# with a two-phase regular schedule: XLA sort/scatter, then a dense sweep.
# ---------------------------------------------------------------------------

SORTED_FPB = 16


RANK_CHUNK = 256  # integers <= 256 are exact in bf16 (8 mantissa bits)


def cell_sorted_layout(cells, C: int, fpb: int):
    """cells [N] i32 -> (slot [N] i32, block_cell [B] i32, S).

    Slot assignments sort fans by cell and pad each cell's run to a multiple
    of fpb, so slots [b*fpb, (b+1)*fpb) all share cell block_cell[b]. S (and
    B = S // fpb) are static: N_pad + C * (fpb - 1) rounded up.

    The stable rank (count of earlier fans in the same cell) is computed
    WITHOUT a sort: a chunked strict-lower-triangular bf16 matmul over the
    cell one-hot gives within-chunk ranks on the MXU, and an exclusive
    cumsum over the (few) chunk histograms stitches chunks together —
    ~6x cheaper than XLA's TPU argsort at N ~ 12k."""
    N = cells.shape[0]
    S = -(-(N + C * (fpb - 1)) // fpb) * fpb
    B = S // fpb

    CH = RANK_CHUNK
    N_pad = -(-max(N, 1) // CH) * CH
    NC = N_pad // CH
    # pad fans map to a sentinel column C so they never pollute real counts
    cells_p = jnp.concatenate(
        [cells, jnp.full((N_pad - N,), C, jnp.int32)]
    )
    onehot = (
        cells_p[:, None] == jnp.arange(C + 1, dtype=jnp.int32)
    )  # [N_pad, C+1] bool
    oh_b = onehot.reshape(NC, CH, C + 1).astype(jnp.bfloat16)
    tri = jnp.tril(
        jnp.ones((CH, CH), jnp.bfloat16), k=-1
    )  # strict lower: earlier-in-chunk
    local = jnp.einsum(
        "ij,bjc->bic", tri, oh_b, preferred_element_type=jnp.float32
    )  # [NC, CH, C+1] exact integer ranks (<= CH)
    chunk_counts = jnp.sum(oh_b.astype(jnp.float32), axis=1)  # [NC, C+1]
    chunk_excl = jnp.cumsum(chunk_counts, axis=0) - chunk_counts
    rank_mat = local + chunk_excl[:, None, :]
    rank = jnp.sum(
        jnp.where(onehot.reshape(NC, CH, C + 1), rank_mat, 0.0),
        axis=-1,
    ).reshape(N_pad)[:N].astype(jnp.int32)

    counts = (chunk_counts.sum(axis=0)[:C]).astype(jnp.int32)
    padded = ((counts + fpb - 1) // fpb) * fpb
    cell_off = jnp.cumsum(padded) - padded  # exclusive, padded layout
    slot = (cell_off[cells] + rank).astype(jnp.int32)

    # block b covers padded range [b*fpb, ...): owning cell via searchsorted
    # over the padded range ends; tail blocks land on C-1 (computed and
    # discarded — their dirs are zero => miss)
    ends = jnp.cumsum(padded)
    block_cell = jnp.searchsorted(
        ends, jnp.arange(B, dtype=jnp.int32) * fpb, side="right"
    ).astype(jnp.int32)
    block_cell = jnp.minimum(block_cell, C - 1)
    return slot, block_cell, S


def _make_fan_sorted_kernel(F: int, K: int, zgroups=None):
    from .raycast_pallas import _make_fan_kernel

    dense = _make_fan_kernel(F, K, fpb=SORTED_FPB, zgroups=zgroups)

    def kernel(bc_ref, orig_ref, dirs_ref, tri_ref, dirmat_ref, out_ref):
        # same math as the dense fan kernel; candidate blocks picked by the
        # scalar-prefetched block_cell array via the index maps
        dense(orig_ref, dirs_ref, tri_ref[0], dirmat_ref[0], out_ref)

    return kernel


_FAN_SORTED_CACHE = {}


def _get_fan_sorted(F: int, K: int, zgroups=None):
    from .raycast_pallas import DIR_K

    from .raycast_pallas import fan_engine

    ck = (F, K, zgroups, fan_engine() if zgroups is not None else "mxu",
          _interp())
    if ck in _FAN_SORTED_CACHE:
        return _FAN_SORTED_CACHE[ck]

    FPB = SORTED_FPB
    F_out = -(-F // 128) * 128
    kernel = _make_fan_sorted_kernel(F, K, zgroups)

    def call(block_cell, origs, dirs8, ray_table, dir_table):
        S = origs.shape[0]
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(S // FPB,),
            in_specs=[
                # grouped (v4) kernels vector-load origins from VMEM;
                # per-ray-z kernels read them scalarly from SMEM
                pl.BlockSpec((FPB, 8), lambda i, bc: (i, 0),
                             memory_space=(pltpu.VMEM if zgroups is not None
                                           else pltpu.SMEM)),
                pl.BlockSpec((FPB * F, 4), lambda i, bc: (i, 0)),
                pl.BlockSpec((1, 16, K), lambda i, bc: (bc[i], 0, 0)),
                pl.BlockSpec((1, DIR_K, 3 * K), lambda i, bc: (bc[i], 0, 0)),
            ],
            out_specs=pl.BlockSpec((FPB, F_out), lambda i, bc: (i, 0)),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((S, F_out), jnp.float32),
            interpret=_interp(),
        )(block_cell, origs, dirs8, ray_table, dir_table)

    @jax.custom_batching.custom_vmap
    def fan_sorted_flat(origins, zoffs, dirs, cells, ray_table, dir_table):
        from .raycast_pallas import pack_fan_operands

        N, C = origins.shape[0], ray_table.shape[0]
        slot, block_cell, S = cell_sorted_layout(cells, C, FPB)

        from .raycast_pallas import fan_engine

        v5 = zgroups is not None and all(g % 8 == 0 for g in zgroups)
        dirs_dtype = (
            jnp.bfloat16
            if ((zgroups is None or fan_engine() == "mxu") and not v5)
            else jnp.float32
        )
        origins8, dirs4 = pack_fan_operands(
            origins, zoffs, dirs, N, F, zgroups, dirs_dtype=dirs_dtype
        )
        origs = jnp.zeros((S, 8), jnp.float32).at[slot].set(origins8)
        dirs_p = jnp.zeros((S, F, 4), dirs4.dtype).at[slot].set(
            dirs4.reshape(N, F, 4)
        )
        if zgroups is not None and any(g % 8 for g in zgroups):
            # v4 ray-major block layout: row = ray_idx * FPB + fan (the
            # aligned-group v5 kernel reads natural fan-major order)
            dirs_p = dirs_p.reshape(S // FPB, FPB, F, 4).transpose(0, 2, 1, 3)
        dirs_p = dirs_p.reshape(S * F, 4)
        out = call(block_cell, origs, dirs_p, ray_table, dir_table)
        return out[slot, :F]

    @fan_sorted_flat.def_vmap
    def _vmap(axis_size, in_batched, origins, zoffs, dirs, cells,
              ray_table, dir_table):
        ob, zb, db, cb, tb, dtb = in_batched
        assert not tb and not dtb, "tables must not be batched"
        B = axis_size

        def bcast(x, batched):
            if batched:
                return x.reshape((-1,) + x.shape[2:])
            return jnp.broadcast_to(x[None], (B,) + x.shape).reshape(
                (-1,) + x.shape[1:]
            )

        out = fan_sorted_flat(
            bcast(origins, ob), bcast(zoffs, zb), bcast(dirs, db),
            bcast(cells, cb), ray_table, dir_table,
        )
        return out.reshape((B, -1) + out.shape[1:]), True

    _FAN_SORTED_CACHE[ck] = fan_sorted_flat
    return fan_sorted_flat


def ray_fans_cull_sorted(origins, zoffs, dirs, cells, tables, t_max=INF,
                         zgroups=None):
    """Cell-sorted culled nearest-hit ray fans; same contract as
    ray_fans_cull / raycast_pallas.ray_fans_vs_tris_pallas (zoffs is
    [..., G] per-group z when ``zgroups`` is given)."""
    batch_shape = origins.shape[:-1]
    F = dirs.shape[-2]
    N = int(np.prod(batch_shape)) if batch_shape else 1
    fan = _get_fan_sorted(F, tables.K, zgroups)
    t = fan(
        origins.reshape(N, 3),
        zoffs.reshape(N, -1),
        dirs.reshape(N, F, 3),
        cells.reshape(N),
        tables.ray_packed,
        tables.ray_dir_packed,
    ).reshape(batch_shape + (F,))
    return jnp.where(t <= t_max, t, INF)


def rays_cull_sorted(o, d, cells, tables, t_max=INF):
    """Cell-sorted culled single-ray nearest hit (F=1 fan)."""
    t = ray_fans_cull_sorted(
        o, jnp.zeros(o.shape[:-1] + (1,), o.dtype), d[..., None, :],
        cells, tables, t_max=t_max, zgroups=(1,),
    )
    return t[..., 0]


# ---------------------------------------------------------------------------
# Cell-sorted sphere casts: cast groups (agents) sorted by culling cell so
# each Pallas block loads ONE [32, K] candidate table and runs the dense
# sphere-cast kernel over it — replacing sphere_cast_cull's per-agent table
# streaming (which re-loads AGENTS_PER_BLOCK tables per grid step). The
# relayout is tiny relative to the fan path: CPA casts per agent, no F=104
# direction fan to permute.
# ---------------------------------------------------------------------------

SORTED_SCB = 16  # cast groups (agents) per block — one cell per block

_SC_SORTED_CACHE = {}


def _get_sc_sorted(CPA: int, K: int, r: float, with_normal: bool):
    from .raycast_pallas import _make_sc_kernel

    ck = (CPA, K, r, with_normal, _interp())
    if ck in _SC_SORTED_CACHE:
        return _SC_SORTED_CACHE[ck]

    SCB = SORTED_SCB
    dense = _make_sc_kernel(r, K, with_normal)

    def kernel(bc_ref, rays_ref, tri_ref, out_ref):
        # same per-(cast, tri) sweep as the dense kernel; the candidate
        # block is picked by the scalar-prefetched block_cell array
        dense(rays_ref, tri_ref[0], out_ref)

    def call(block_cell, rays, sc_table):
        R = rays.shape[0]  # S * CPA
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(R // (SCB * CPA),),
            in_specs=[
                pl.BlockSpec((SCB * CPA, 8), lambda i, bc: (i, 0)),
                pl.BlockSpec((1, SC2_ROWS, K), lambda i, bc: (bc[i], 0, 0)),
            ],
            out_specs=pl.BlockSpec((SCB * CPA, 8), lambda i, bc: (i, 0)),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((R, 8), jnp.float32),
            interpret=_interp(),
        )(block_cell, rays, sc_table)

    @jax.custom_batching.custom_vmap
    def sc_sorted_flat(o, d, cells, sc_table):
        """o, d: [N, CPA, 3]; cells [N] -> (t [N, CPA], winner lane
        [N, CPA] f32, in-cell candidate index; garbage on miss)."""
        N, C = o.shape[0], sc_table.shape[0]
        slot, block_cell, S = cell_sorted_layout(cells, C, SCB)
        rays8 = jnp.concatenate(
            [o, d, jnp.zeros((N, CPA, 2), jnp.float32)], axis=-1
        )
        rays_p = (
            jnp.zeros((S, CPA, 8), jnp.float32).at[slot].set(rays8)
        ).reshape(S * CPA, 8)
        out = call(block_cell, rays_p, sc_table)
        out = out.reshape(S, CPA, 8)[slot]  # [N, CPA, 8]
        return out[..., 0], out[..., 1]

    @sc_sorted_flat.def_vmap
    def _vmap(axis_size, in_batched, o, d, cells, sc_table):
        ob, db, cb, tb = in_batched
        assert not tb
        B = axis_size

        def bcast(x, batched):
            if batched:
                return x.reshape((-1,) + x.shape[2:])
            return jnp.broadcast_to(x[None], (B,) + x.shape).reshape(
                (-1,) + x.shape[1:]
            )

        t, idx = sc_sorted_flat(
            bcast(o, ob), bcast(d, db), bcast(cells, cb), sc_table
        )
        return (
            (t.reshape((B, -1) + t.shape[1:]),
             idx.reshape((B, -1) + idx.shape[1:])),
            (True, True),
        )

    _SC_SORTED_CACHE[ck] = sc_sorted_flat
    return sc_sorted_flat


def sphere_cast_cull_sorted(o, d, r: float, cells, tables, soup, t_max=INF,
                            with_normal: bool = True):
    """Cell-sorted culled grouped sphere casts; contract of
    sphere_cast_cull (o, d [..., CPA, 3], one cell per group)."""
    batch_shape = o.shape[:-2]
    CPA = o.shape[-2]
    N = int(np.prod(batch_shape)) if batch_shape else 1

    sc = _get_sc_sorted(CPA, tables.K, float(r), with_normal)
    t, kidx_f = sc(
        o.reshape(N, CPA, 3), d.reshape(N, CPA, 3), cells.reshape(N),
        tables.sc_packed,
    )
    missed = ~jnp.isfinite(t) | (t > t_max)
    t_final = jnp.where(missed, INF, t)
    if not with_normal:
        z = jnp.zeros(batch_shape + (CPA, 3), jnp.float32)
        return t_final.reshape(batch_shape + (CPA,)), z

    # winner-only normal reconstruction: map the in-cell winner lane back
    # to the original triangle (as sphere_cast_cull)
    cells_f = cells.reshape(N)
    kidx = jnp.clip(kidx_f.astype(jnp.int32), 0, tables.K - 1)
    orig = tables.cand_idx[cells_f[:, None], kidx]  # [N, CPA]
    orig = jnp.clip(orig, 0, soup.v0.shape[0] - 1)

    from .raycast import _closest_point_on_tri

    of = o.reshape(N, CPA, 3)
    df = d.reshape(N, CPA, 3)
    v0 = soup.v0[orig]
    e1 = soup.e1[orig]
    e2 = soup.e2[orig]
    n = soup.normal[orig]

    finite_t = jnp.where(jnp.isfinite(t), t, 0.0)
    hit_center = of + finite_t[..., None] * df
    closest = _closest_point_on_tri(hit_center, v0, e1, e2)
    depen = hit_center - closest
    dlen = jnp.linalg.norm(depen, axis=-1, keepdims=True)
    edge_n = jnp.where(
        dlen > 1e-12, depen / jnp.maximum(dlen, 1e-30),
        jnp.array([0.0, 0.0, 1.0]),
    )
    h = jnp.sum((of - v0) * n, axis=-1)
    sign = jnp.where(h >= 0.0, 1.0, -1.0)
    face_n = sign[..., None] * n
    is_face = jnp.abs(jnp.sum(edge_n * n, axis=-1)) > 0.999
    normal = jnp.where(is_face[..., None], face_n, edge_n)
    normal = jnp.where(missed[..., None], 0.0, normal)
    return (
        t_final.reshape(batch_shape + (CPA,)),
        normal.reshape(batch_shape + (CPA, 3)),
    )
