"""Pallas TPU kernels for batched raycasts.

The hot op of the whole framework (SURVEY.md §3.4: ~110 rays/agent-step —
movement, hitscan, LOS, lidar — all against one static map). The dense
jnp formulation (ops/raycast.py) materializes [rays, tris] temporaries in
HBM (gigabytes at training batch sizes, memory-bound); these kernels keep
the per-(ray, tri) work in VMEM with a fused min-reduction, streaming only
rays in and hit distances out.

Formulation: plane + barycentric-plane intersection with per-triangle
constants precomputed once (device-resident [16, T] matrix):

    t = (d0 - n.o) / n.d
    u = w1.o + t * (w1.d) + c1      (barycentric u as an affine fn of the
    v = w2.o + t * (w2.d) + c2       hit point x = o + t d)
    hit iff |n.d| > eps, t in (0, t_max], u >= 0, v >= 0, u + v <= 1

All broadcast terms are [BLOCK_RAYS, 1] x [1, T] VPU ops; rays ride the
sublane axis, triangles the lane axis.

Replaces the reference's per-thread quantized-BVH traversal
(src/mesh_bvh.inl traceRay) — divergence-free and regular instead.
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

BLOCK_RAYS = 256
INF = jnp.inf


def _interp() -> bool:
    """Interpret-mode toggle (MPENV_PALLAS=interpret): run the kernels via
    the Pallas interpreter on any backend — the CPU parity harness."""
    return os.environ.get("MPENV_PALLAS", "") == "interpret"

# rows of the packed tri-constants matrix
_NX, _NY, _NZ, _D0 = 0, 1, 2, 3
_W1X, _W1Y, _W1Z, _C1 = 4, 5, 6, 7
_W2X, _W2Y, _W2Z, _C2 = 8, 9, 10, 11
_VALID = 12
TRI_CONST_ROWS = 16  # padded to a sublane multiple
SC2_ROWS = 40  # sphere-cast constants rows (pack_sc2_consts, raycast_cull)


def morton_sort_tris(tri_verts: np.ndarray) -> np.ndarray:
    """Sort triangles by the Morton code of their centroid so consecutive
    lane-tiles of triangles are spatially coherent (host-side, once)."""
    if len(tri_verts) == 0:
        return tri_verts
    c = tri_verts.mean(axis=1)
    lo, hi = c.min(axis=0), c.max(axis=0)
    q = ((c - lo) / np.maximum(hi - lo, 1e-9) * 1023).astype(np.uint32)

    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    code = (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])
    return tri_verts[np.argsort(code, kind="stable")]


def pack_tri_consts(tri_verts: np.ndarray, pad_to: int = 256) -> np.ndarray:
    """[T, 3, 3] triangle vertices -> [16, T_pad] constants (host-side)."""
    t = tri_verts.shape[0]
    T = -(-max(t, 1) // pad_to) * pad_to
    v = np.zeros((T, 3, 3), np.float64)
    v[:t] = tri_verts

    v0 = v[:, 0]
    e1 = v[:, 1] - v[:, 0]
    e2 = v[:, 2] - v[:, 0]
    n = np.cross(e1, e2)

    d00 = np.sum(e1 * e1, axis=-1)
    d01 = np.sum(e1 * e2, axis=-1)
    d11 = np.sum(e2 * e2, axis=-1)
    denom = d00 * d11 - d01 * d01
    safe = np.where(np.abs(denom) > 1e-20, denom, 1.0)
    w1 = (d11[:, None] * e1 - d01[:, None] * e2) / safe[:, None]
    w2 = (d00[:, None] * e2 - d01[:, None] * e1) / safe[:, None]

    out = np.zeros((TRI_CONST_ROWS, T), np.float32)
    valid = (np.arange(T) < t) & (np.abs(denom) > 1e-20)
    # invalid/padding tris get all-zero constants: in the kernels their
    # plane test degenerates to t = 0 * inf = NaN, so every hit comparison
    # fails without an explicit validity mask in the per-pair epilogue
    vm = valid.astype(np.float64)
    out[_NX:_NZ + 1] = (n * vm[:, None]).T
    out[_D0] = np.sum(n * v0, axis=-1) * vm
    out[_W1X:_W1Z + 1] = (w1 * vm[:, None]).T
    out[_C1] = -np.sum(w1 * v0, axis=-1) * vm
    out[_W2X:_W2Z + 1] = (w2 * vm[:, None]).T
    out[_C2] = -np.sum(w2 * v0, axis=-1) * vm
    out[_VALID] = valid.astype(np.float32)
    return out


def _ray_kernel(rays_ref, tri_ref, out_ref):
    """rays_ref: [BLOCK_RAYS, 8] (ox oy oz dx dy dz pad pad);
    tri_ref: [16, T]; out_ref: [BLOCK_RAYS, 1] nearest-hit t (inf miss)."""
    r = rays_ref[:]
    ox, oy, oz = r[:, 0:1], r[:, 1:2], r[:, 2:3]
    dx, dy, dz = r[:, 3:4], r[:, 4:5], r[:, 5:6]

    tc = tri_ref[:]
    nx, ny, nz = tc[_NX:_NX + 1, :], tc[_NY:_NY + 1, :], tc[_NZ:_NZ + 1, :]
    d0 = tc[_D0:_D0 + 1, :]
    w1x, w1y, w1z = tc[_W1X:_W1X + 1, :], tc[_W1Y:_W1Y + 1, :], tc[_W1Z:_W1Z + 1, :]
    c1 = tc[_C1:_C1 + 1, :]
    w2x, w2y, w2z = tc[_W2X:_W2X + 1, :], tc[_W2Y:_W2Y + 1, :], tc[_W2Z:_W2Z + 1, :]
    c2 = tc[_C2:_C2 + 1, :]
    valid = tc[_VALID:_VALID + 1, :] > 0.0

    nd = dx * nx + dy * ny + dz * nz  # [BR, T]
    no = ox * nx + oy * ny + oz * nz
    nd_ok = jnp.abs(nd) > 1e-12
    t = (d0 - no) / jnp.where(nd_ok, nd, 1.0)

    u = (ox * w1x + oy * w1y + oz * w1z) + t * (dx * w1x + dy * w1y + dz * w1z) + c1
    v = (ox * w2x + oy * w2y + oz * w2z) + t * (dx * w2x + dy * w2y + dz * w2z) + c2

    hit = (
        nd_ok
        & (t > 0.0)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & valid
    )
    t = jnp.where(hit, t, jnp.float32(np.inf))
    out_ref[:] = jnp.min(t, axis=1, keepdims=True)


def _ray_pallas_call(rays: jax.Array, tri_consts: jax.Array) -> jax.Array:
    """rays: [R_pad, 8] f32 (R_pad multiple of BLOCK_RAYS);
    tri_consts: [16, T]. Returns t [R_pad]."""
    R = rays.shape[0]
    T = tri_consts.shape[1]
    grid = (R // BLOCK_RAYS,)
    out = pl.pallas_call(
        _ray_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (BLOCK_RAYS, 8), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (TRI_CONST_ROWS, T), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (BLOCK_RAYS, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((R, 1), jnp.float32),
        interpret=_interp(),
    )(rays, tri_consts)
    return out[:, 0]


@jax.custom_batching.custom_vmap
def _ray_vs_tris_flat(o: jax.Array, d: jax.Array,
                      tri_consts: jax.Array) -> jax.Array:
    """o, d: [R, 3] -> t [R]. Under vmap the batch axis is FLATTENED into
    the ray axis (instead of becoming a tiny padded grid dim per world) so
    kernel blocks stay full."""
    R = o.shape[0]
    R_pad = -(-max(R, 1) // BLOCK_RAYS) * BLOCK_RAYS
    rays = jnp.concatenate([o, d, jnp.zeros((R, 2), jnp.float32)], axis=1)
    rays = jnp.pad(rays, ((0, R_pad - R), (0, 0)))
    return _ray_pallas_call(rays, tri_consts)[:R]


@_ray_vs_tris_flat.def_vmap
def _ray_vs_tris_flat_vmap(axis_size, in_batched, o, d, tri_consts):
    ob, db, tb = in_batched
    B = axis_size

    def bcast(x, batched):
        if batched:
            return x.reshape((-1,) + x.shape[2:])
        return jnp.broadcast_to(x[None], (B,) + x.shape).reshape(
            (-1,) + x.shape[1:]
        )

    assert not tb, "triangle constants must not be batched"
    o2 = bcast(o, ob)
    d2 = bcast(d, db)
    out = _ray_vs_tris_flat(o2, d2, tri_consts)
    return out.reshape(B, -1), True


def ray_vs_tris_pallas(o: jax.Array, d: jax.Array, tri_consts: jax.Array,
                       t_max=INF) -> jax.Array:
    """Batched nearest-hit ray vs tri-soup. o, d: [..., 3]; returns [...]
    (inf on miss). Drop-in for ops.raycast.ray_vs_tris's contract."""
    batch_shape = o.shape[:-1]
    R = int(np.prod(batch_shape)) if batch_shape else 1
    t = _ray_vs_tris_flat(
        o.reshape(R, 3), d.reshape(R, 3), tri_consts
    ).reshape(batch_shape)
    return jnp.where(t <= t_max, t, INF)


# ---------------------------------------------------------------------------
# Ray fans (shared-origin bundles: lidar + LOS per agent)
# ---------------------------------------------------------------------------
#
# All of an agent's sensor rays share one origin (eye position), so the
# origin-dependent halves of the intersection test (n.o - d0, w1.o + c1,
# w2.o + c2 — 15 of the ~45 per-pair flops) hoist out of the pair loop, and
# the direction dots (n.d, w1.d, w2.d) become ONE bf16 MXU matmul per fan
# ([F, 4] @ [4, 3T]) — directions are unit-scale so bf16's ~0.3% relative
# error only perturbs sensor distances, not game-state collision.

def _env_int(name, default):
    return int(os.environ.get(name, default))


FANS_PER_BLOCK = _env_int("MPENV_FPB", 32)  # dd intermediate is
# [FPB, F, 3T] f32 (~10 MB at 32) — the dominant VMEM tenant


def _recip(num, den):
    """num / den elementwise; MPENV_RECIP picks the engine (in-situ A/B:
    the microbenchmark issue rates of approx-reciprocal vs exact divide
    do not predict fused-kernel behavior on v5e). bf16 operands always
    divide (pl.reciprocal is f32-only)."""
    mode = os.environ.get("MPENV_RECIP", "approx")
    if mode == "div" or num.dtype == jnp.bfloat16:
        return num / den
    return num * pl.reciprocal(den, approx=True)


DIR_K = 128  # contraction dim padded to the MXU width so Mosaic routes the
# direction dots to the systolic array instead of VPU multiply-adds


def pack_dir_consts(tri_consts: np.ndarray) -> np.ndarray:
    """[16, T] f32 ray constants -> [DIR_K, 3T] bf16 direction-dot matrix
    (column groups: n | w1 | w2; rows 0-2 = xyz, rest zero-padding)."""
    T = tri_consts.shape[1]
    out = np.zeros((DIR_K, 3 * T), np.float32)
    out[0:3, 0:T] = tri_consts[_NX:_NZ + 1]
    out[0:3, T:2 * T] = tri_consts[_W1X:_W1Z + 1]
    out[0:3, 2 * T:3 * T] = tri_consts[_W2X:_W2Z + 1]
    return out.astype(jnp.bfloat16)


MAX_ZGROUPS = 5  # origin SMEM row = x y z + up to 5 per-group z offsets


def _make_fan_kernel(F: int, T: int, fpb: int = FANS_PER_BLOCK,
                     zgroups=None):
    """zgroups: static tuple of ray-run lengths within a fan; rays of one
    group share a per-(fan, group) origin z offset carried in the origin
    SMEM row (cols 3+). All of an agent's sensor rays fall into 5 such
    groups (LOS eye height + 2 lidar rows x fwd/rear), so the z-dependent
    intersection terms hoist out of the per-(ray, tri) loop entirely and
    the direction stream needs no per-ray z column (bf16 [F*fpb, 4])."""
    grouped = zgroups is not None
    if grouped:
        if all(g % 8 == 0 for g in zgroups):
            return _make_fan_kernel_v5(F, T, fpb, zgroups,
                                       engine=fan_engine())
        # odd group sizes (tiny team configs) keep the ray-major layout,
        # whose segments don't need sublane-aligned group boundaries
        return _make_fan_kernel_v4(F, T, fpb, zgroups, engine=fan_engine())

    def kernel(orig_ref, dirs_ref, tri_ref, dirmat_ref, out_ref):
        # orig_ref: [FPB, 8] SMEM f32 (x y z [z_g0..z_g4 when grouped]);
        # dirs_ref: [FPB*F, 4] VMEM — bf16 (dx dy dz 0) when grouped, else
        # f32 (dx dy dz z_offset); tri_ref: [16, T] f32;
        # dirmat_ref: [DIR_K, 3T] bf16
        tc = tri_ref[:]
        nx, ny, nz = tc[_NX:_NX + 1], tc[_NY:_NY + 1], tc[_NZ:_NZ + 1]
        d0 = tc[_D0:_D0 + 1]
        w1x, w1y, w1z = tc[_W1X:_W1X + 1], tc[_W1Y:_W1Y + 1], tc[_W1Z:_W1Z + 1]
        c1 = tc[_C1:_C1 + 1]
        w2x, w2y, w2z = tc[_W2X:_W2X + 1], tc[_W2Y:_W2Y + 1], tc[_W2Z:_W2Z + 1]
        c2 = tc[_C2:_C2 + 1]

        dirs = dirs_ref[:]
        # bf16 MXU matmul over the K-padded direction matrix (rows 3+ are
        # zero, so a z-offset in column 3 is inert here)
        db = jnp.pad(dirs, ((0, 0), (0, DIR_K - 4))).astype(jnp.bfloat16)
        dm = dirmat_ref[:]  # [DIR_K, 3T] bf16
        dd = jnp.dot(db, dm, preferred_element_type=jnp.float32)
        zoff = None if grouped else dirs[:, 3:4]  # per-ray z (f32 mode)

        inf = jnp.float32(np.inf)
        for f in range(fpb):
            ox = orig_ref[f, 0]
            oy = orig_ref[f, 1]
            oz = orig_ref[f, 2]
            no2 = d0 - (ox * nx + oy * ny + oz * nz)  # [1, T]
            u0 = ox * w1x + oy * w1y + oz * w1z + c1
            v0 = ox * w2x + oy * w2y + oz * w2z + c2

            # ND ~ 0 (parallel ray) needs no guard: t -> +-inf or NaN and
            # every comparison below rejects the pair (a +-inf t always
            # drives u or v to inf/NaN). Invalid/padding tris need no mask
            # either: their packed normal is the zero vector, so
            # t = 0 * inf = NaN and every comparison fails. Exact divide:
            # measured ~10x the issue rate of pl.reciprocal(approx=True)
            # on v5e (vpu_probe.py), and exact to boot.
            if grouped:
                # z-dependent terms hoist per (fan, group, tri): all of an
                # agent's rays share one of <=5 origin z offsets
                parts = []
                row = 0
                for g, glen in enumerate(zgroups):
                    zg = orig_ref[f, 3 + g]
                    no2g = no2 - zg * nz
                    u0g = u0 + zg * w1z
                    v0g = v0 + zg * w2z
                    sl = slice(f * F + row, f * F + row + glen)
                    t = _recip(no2g, dd[sl, 0:T])
                    u = u0g + t * dd[sl, T:2 * T]
                    v = v0g + t * dd[sl, 2 * T:3 * T]
                    hit = (
                        (t > 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                    )
                    parts.append(jnp.where(hit, t, inf))
                    row += glen
                tt = (
                    parts[0] if len(parts) == 1
                    else jnp.concatenate(parts, 0)
                )
            else:
                sl = slice(f * F, (f + 1) * F)
                nd = dd[sl, 0:T]
                w1d = dd[sl, T:2 * T]
                w2d = dd[sl, 2 * T:3 * T]
                z = zoff[sl]  # [F, 1]
                t = _recip(no2 - z * nz, nd)
                u = (u0 + z * w1z) + t * w1d
                v = (v0 + z * w2z) + t * w2d
                hit = (t > 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                tt = jnp.where(hit, t, inf)
            # one fan per OUTPUT ROW (in-kernel transpose): a [N*F, 1]
            # output forces a slow 1-lane relayout downstream
            tmin = jnp.min(tt, axis=1, keepdims=True)  # [F, 1]
            out_ref[f:f + 1, :F] = jnp.transpose(tmin, (1, 0))

    return kernel


def fan_engine() -> str:
    """MPENV_FAN: 'mxu' (default — bf16 MXU direction dots) or 'vpu'
    (f32 VPU dots fused into the epilogue). The MXU matmul pads the
    3-long xyz contraction to the systolic width, so it costs the same
    cycles as a K=128 matmul and serializes with the VPU epilogue; on
    paper the fused-VPU variant's extra 9 fma/pair is cheaper than that
    matmul. Both kept for on-chip A/B."""
    return os.environ.get("MPENV_FAN", "mxu")


def pack_dir_consts8(tri_consts: np.ndarray) -> np.ndarray:
    """[16, T] ray constants -> [8, 3T] bf16 direction-dot matrix for the
    v8 kernel's lhs-transposed MXU matmul dd[rays, 3T] = d2^T @ this
    (rows 0-2 = n|w1|w2 xyz, rows 3-7 zero)."""
    T = tri_consts.shape[1]
    out = np.zeros((8, 3 * T), np.float32)
    out[0:3, 0:T] = tri_consts[_NX:_NZ + 1]
    out[0:3, T:2 * T] = tri_consts[_W1X:_W1Z + 1]
    out[0:3, 2 * T:3 * T] = tri_consts[_W2X:_W2Z + 1]
    return out.astype(jnp.bfloat16)


def _make_fan_kernel_v8(F: int, T: int, fpb: int, zgroups):
    """Planar-operand fan kernel: v5's epilogue (z-group hoisting, ray-major
    [fpb, F, 3T] frames, bf16 MXU direction dots) fed from a component-
    planar [4, N*F] bf16 direction stream instead of the interleaved
    [N*F, 4] one. dot_general contracts the stream's MAJOR dim directly
    (the systolic array loads either orientation), so:

      * the operand is the producers' natural [N, F] planes flattened —
        full 128-lane tiles, ~10 MB vs the 655 MB the 4-wide-minor stream
        physically occupied (XLA pads a rank-2 minor dim to 128 lanes);
      * no host-side relayout, pad, or transpose survives — the stack of
        the three component planes is a pure major-axis concat.

    MXU tile count is identical to v5 (tiles are M x N output tiles
    regardless of K), so the kernel keeps v5's compute profile."""
    assert sum(zgroups) == F and len(zgroups) <= MAX_ZGROUPS
    assert all(g % 8 == 0 for g in zgroups)

    def kernel(orig_ref, d2_ref, tri_ref, dirmat_ref, out_ref):
        # orig_ref: [FPB, 8] f32 (x y z z_g0..z_g4); d2_ref: [4, FPB*F]
        # bf16 (rows dx dy dz 0, lanes fan-major); tri_ref: [16, T] f32;
        # dirmat_ref: [8, 3T] bf16; out_ref: [FPB, F_out] f32
        _fan_v8_body(
            orig_ref[:], d2_ref[:], tri_ref[:], dirmat_ref[:],
            out_ref, slice(None), F, T, fpb, zgroups,
        )

    return kernel


def _fan_v8_body(o, d2r, tc, dm, out_ref, out_rows, F, T, fpb, zgroups):
    """The v8 fan sweep on block VALUES: o [fpb, 8]; d2r [4, fpb*F] bf16;
    tc [16, T]; dm [8, 3T] bf16; writes out_ref[out_rows, col-slices].
    (A bf16 epilogue variant was tried: v5e Mosaic rejects bf16 vector
    compares — "Target does not support this comparison".)"""
    cdt = jnp.float32

    nx, ny, nz = tc[_NX:_NX + 1], tc[_NY:_NY + 1], tc[_NZ:_NZ + 1]
    d0 = tc[_D0:_D0 + 1]
    w1x, w1y, w1z = tc[_W1X:_W1X + 1], tc[_W1Y:_W1Y + 1], tc[_W1Z:_W1Z + 1]
    c1 = tc[_C1:_C1 + 1]
    w2x, w2y, w2z = tc[_W2X:_W2X + 1], tc[_W2Y:_W2Y + 1], tc[_W2Z:_W2Z + 1]
    c2 = tc[_C2:_C2 + 1]

    d2 = jnp.pad(d2r, ((0, 4), (0, 0)))  # [8, RL] bf16
    dd = jax.lax.dot_general(
        d2, dm, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,  # MXU acc must be 32-bit
    ).astype(cdt)  # [RL, 3T] ray rows, fan-major
    dd = dd.reshape(fpb, F, 3 * T)

    ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]  # [FPB, 1]
    no2 = d0 - (ox * nx + oy * ny + oz * nz)  # [FPB, T]
    u0 = ox * w1x + oy * w1y + oz * w1z + c1
    v0 = ox * w2x + oy * w2y + oz * w2z + c2

    inf = jnp.float32(np.inf)
    row = 0
    for g, glen in enumerate(zgroups):
        zg = o[:, 3 + g:4 + g]  # [FPB, 1]
        no2g = (no2 - zg * nz)[:, None, :].astype(cdt)  # [FPB, 1, T]
        u0g = (u0 + zg * w1z)[:, None, :].astype(cdt)
        v0g = (v0 + zg * w2z)[:, None, :].astype(cdt)
        nd = dd[:, row:row + glen, 0:T]
        w1d = dd[:, row:row + glen, T:2 * T]
        w2d = dd[:, row:row + glen, 2 * T:3 * T]
        # parallel rays / padding tris need no guards (t degenerates
        # to ±inf/NaN and every compare rejects)
        t = _recip(no2g, nd)
        u = u0g + t * w1d
        v = v0g + t * w2d
        hit = (t > 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        out_ref[out_rows, row:row + glen] = jnp.min(
            jnp.where(hit, t.astype(jnp.float32), inf), axis=2
        )
        row += glen


FAN_CULL_FPB = _env_int("MPENV_FANC_FPB", 16)  # fans per cell group
FAN_CULL_G = _env_int("MPENV_FANC_G", 4)  # cell groups per Pallas block


def _make_fan_kernel_culled(F: int, K: int, zgroups):
    """Cell-culled v8 fan kernel: each block sweeps FAN_CULL_G cell groups
    of FAN_CULL_FPB fans; group g reads its own [16, K] / [8, 3K] table
    slices (pre-gathered per group in XLA by block_cell)."""
    assert sum(zgroups) == F and len(zgroups) <= MAX_ZGROUPS
    assert all(g % 8 == 0 for g in zgroups)
    fpb, G = FAN_CULL_FPB, FAN_CULL_G

    def kernel(orig_ref, d2_ref, tri_ref, dirmat_ref, out_ref):
        # orig [G*fpb, 8]; d2 [4, G*fpb*F]; tri [G*16, K];
        # dirmat [G*8, 3K]; out [G*fpb, F_out]
        for g in range(G):
            _fan_v8_body(
                orig_ref[g * fpb:(g + 1) * fpb, :],
                d2_ref[:, g * fpb * F:(g + 1) * fpb * F],
                tri_ref[g * 16:(g + 1) * 16, :],
                dirmat_ref[g * 8:(g + 1) * 8, :],
                out_ref, slice(g * fpb, (g + 1) * fpb),
                F, K, fpb, zgroups,
            )

    return kernel


_FAN_CULL_CACHE = {}


def _get_fan_culled(F: int, K: int, zgroups):
    ck = (F, K, zgroups, FAN_CULL_FPB, FAN_CULL_G, _interp())
    if ck in _FAN_CULL_CACHE:
        return _FAN_CULL_CACHE[ck]

    fpb, G = FAN_CULL_FPB, FAN_CULL_G
    F_out = -(-F // 128) * 128
    kernel = _make_fan_kernel_culled(F, K, zgroups)

    def call(block_cell, origs, d2, rayt, dirm):
        S = origs.shape[0]
        rayt_b = rayt[block_cell].reshape(-1, K)  # [Bgrp*16, K]
        dirm_b = dirm[block_cell].reshape(-1, 3 * K)  # [Bgrp*8, 3K]
        return pl.pallas_call(
            kernel,
            grid=(S // (fpb * G),),
            in_specs=[
                pl.BlockSpec((G * fpb, 8), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, G * fpb * F), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G * 16, K), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G * 8, 3 * K), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((G * fpb, F_out), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S, F_out), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary" if _interp()
                                     else "parallel",)
            ),
            interpret=_interp(),
        )(origs, d2, rayt_b, dirm_b)

    @jax.custom_batching.custom_vmap
    def fan_culled_flat(origins, zg, dx, dy, dz, cells, rayt, dirm):
        """origins [N, 3]; zg [N, Gz]; dx/dy/dz [N, F]; cells [N] ->
        t [N, F]."""
        from .culling import agent_sorted_layout

        N = origins.shape[0]
        C = rayt.shape[0]
        Gz = zg.shape[1]
        layout = agent_sorted_layout(cells, C, fpb, group_mult=G)
        S = layout.S

        origs8 = jnp.concatenate(
            [origins, zg, jnp.zeros((N, 5 - Gz), jnp.float32)], axis=1
        )
        # dummy slots: origin far away + zero dirs -> nd = 0 -> all-miss
        origs_s = jnp.concatenate(
            [origs8, jnp.full((1, 8), 1e9, jnp.float32)], axis=0
        )[layout.src]

        def plane(x):
            padded = jnp.concatenate(
                [x, jnp.zeros((1, F), x.dtype)], axis=0
            )[layout.src]  # [S, F]
            return padded.reshape(S * F).astype(jnp.bfloat16)

        d2 = jnp.stack(
            [plane(dx), plane(dy), plane(dz),
             jnp.zeros((S * F,), jnp.bfloat16)],
            axis=0,
        )  # [4, S*F]
        out = call(layout.block_cell, origs_s, d2, rayt, dirm)
        # full-row gather, THEN slice: a fused gather+column-slice lowers
        # to a serial while-loop of [1, F] dynamic-slices (~10 ms/step);
        # the barrier keeps XLA from re-fusing them
        t_full = jax.lax.optimization_barrier(out[layout.slot])
        return t_full[:, :F]

    @fan_culled_flat.def_vmap
    def _vmap(axis_size, in_batched, origins, zg, dx, dy, dz, cells,
              rayt, dirm):
        assert not in_batched[6] and not in_batched[7]
        B = axis_size

        def bcast(x, batched):
            if batched:
                return x.reshape((-1,) + x.shape[2:])
            return jnp.broadcast_to(x[None], (B,) + x.shape).reshape(
                (-1,) + x.shape[1:]
            )

        args = [
            bcast(x, b)
            for x, b in zip((origins, zg, dx, dy, dz, cells),
                            in_batched[:6])
        ]
        out = fan_culled_flat(*args, rayt, dirm)
        return out.reshape((B, -1) + out.shape[1:]), True

    _FAN_CULL_CACHE[ck] = fan_culled_flat
    return fan_culled_flat


def ray_fans_culled_planar(origins, zg, dxyz, cells, tables, t_max=INF,
                           zgroups=None):
    """Cell-culled component-planar sensor fans: per-agent candidate
    tables (ops/culling.py CellTables) instead of the full soup.
    origins [..., 3]; zg [..., G]; dxyz = (dx, dy, dz) [..., F] planes;
    cells [...] per-fan PVS cell. Returns t [..., F] (inf on miss)."""
    dx, dy, dz = dxyz
    F = dx.shape[-1]
    fan_flat = _get_fan_culled(F, tables.K, tuple(zgroups))
    # v8 direction tables: rows 0-2 of the DIR_K-padded per-cell matrix
    dirm8 = tables.ray_dir_packed[:, :8, :]
    t = fan_flat(origins, zg, dx, dy, dz, cells, tables.ray_packed, dirm8)
    if t_max is not INF:
        t = jnp.where(t <= t_max, t, INF)
    return t


_FAN_PLANAR_CACHE = {}


def _get_fan_flat_planar(F: int, zgroups):
    """custom_vmap flat entry for the component-planar v8 kernel:
    (origins [N, 3], zg [N, G], dx/dy/dz [N, F], tri_consts [16, T],
    dirmat8 [8, 3T]) -> t [N, F]."""
    ck = (F, zgroups, _interp())
    if ck in _FAN_PLANAR_CACHE:
        return _FAN_PLANAR_CACHE[ck]

    FPB = FANS_PER_BLOCK
    F_out = -(-F // 128) * 128
    G = len(zgroups)

    def call(origs, d2, tri_consts, dirmat8):
        N = origs.shape[0]
        T = tri_consts.shape[1]
        RL = FPB * F
        kernel = _make_fan_kernel_v8(F, T, FPB, zgroups)
        return pl.pallas_call(
            kernel,
            grid=(N // FPB,),
            in_specs=[
                pl.BlockSpec(
                    (FPB, 8), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (4, RL), lambda i: (0, i), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (TRI_CONST_ROWS, T), lambda i: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (8, 3 * T), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (FPB, F_out), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((N, F_out), jnp.float32),
            interpret=_interp(),
        )(origs, d2, tri_consts, dirmat8)

    @jax.custom_batching.custom_vmap
    def fan_flat(origins, zg, dx, dy, dz, tri_consts, dirmat8):
        N = origins.shape[0]
        N_pad = -(-max(N, 1) // FPB) * FPB
        origs = jnp.concatenate(
            [origins, zg, jnp.zeros((N, 5 - G), jnp.float32)], axis=1
        )
        origs = jnp.pad(origs, ((0, N_pad - N), (0, 0)))
        # bf16 casts happen on the full-lane [N, F] planes (no skinny-tile
        # tax); the stack is a pure major-axis concat
        d2 = jnp.stack(
            [
                dx.reshape(N * F).astype(jnp.bfloat16),
                dy.reshape(N * F).astype(jnp.bfloat16),
                dz.reshape(N * F).astype(jnp.bfloat16),
                jnp.zeros((N * F,), jnp.bfloat16),
            ],
            axis=0,
        )  # [4, N*F] fan-major lanes
        d2 = jnp.pad(d2, ((0, 0), (0, (N_pad - N) * F)))
        out = call(origs, d2, tri_consts, dirmat8)
        return out[:N, :F]

    @fan_flat.def_vmap
    def _fan_vmap(axis_size, in_batched, origins, zg, dx, dy, dz,
                  tri_consts, dirmat8):
        assert not any(in_batched[5:])
        B = axis_size

        def bcast(x, batched):
            if batched:
                return x.reshape((-1,) + x.shape[2:])
            return jnp.broadcast_to(x[None], (B,) + x.shape).reshape(
                (-1,) + x.shape[1:]
            )

        args = [
            bcast(x, b)
            for x, b in zip((origins, zg, dx, dy, dz), in_batched[:5])
        ]
        out = fan_flat(*args, tri_consts, dirmat8)
        return out.reshape((B, -1) + out.shape[1:]), True

    _FAN_PLANAR_CACHE[ck] = fan_flat
    return fan_flat


def ray_fans_vs_tris_planar(origins, zg, dxyz, soup, t_max=INF,
                            zgroups=None):
    """Component-planar fan entry: origins [..., 3]; zg [..., G] per-group
    origin z offsets; dxyz = (dx, dy, dz) each [..., F]. Returns t [..., F]
    (inf on miss). Requires ``zgroups`` with all run lengths % 8 == 0
    (the v8 kernel hoists z terms per group)."""
    dx, dy, dz = dxyz
    F = dx.shape[-1]
    fan_flat = _get_fan_flat_planar(F, tuple(zgroups))
    t = fan_flat(origins, zg, dx, dy, dz, soup.packed, soup.dirT_packed)
    if t_max is not INF:
        t = jnp.where(t <= t_max, t, INF)
    return t


# ---------------------------------------------------------------------------
# v9 fan kernel: rays on LANES, candidate triangles on SUBLANES
# ---------------------------------------------------------------------------
#
# The v5/v8 dense fan kernels put triangles on the lane axis, which imposes a
# 128-triangle floor per sweep — per-cell candidate culling (ops/culling.py
# ray tables: K ~ 32-64 possibly-nearest triangles per cell on simple_map)
# can never pay in that layout. v9 transposes the problem: a block sweeps
# fpb sorted fans' rays on the LANE axis (fpb * F lanes, a multiple of 128)
# against its cell's K candidates on the SUBLANE axis in K/8 chunks, so K
# only needs 8-alignment and the pair count drops ~4-5x on small maps.
#
# Both halves of the intersection test become MXU matmuls against tiny
# per-cell matrices (built host-side, ops/culling.py pack_ray_tables):
#
#   dd = dir9 [3K, 8](bf16) @ (dx dy dz 0 ...)[8, R]   (n.d | w1.d | w2.d)
#   ao = org9 [3K, 8](f32)  @ (ox oy oz 1 ...)[8, R]   (d0-n.o | w1.o+c1 |
#                                                        w2.o+c2)
#
# Per-ray origin z offsets ride the origin stream (row 2 = oz + zoff), so
# the z-group machinery of v5/v8 disappears entirely: the epilogue is one
# uniform K/8-chunk loop of t = ao/dd fused compares, min-reduced over
# sublanes. Origin dots stay f32 (positions are ~2000 units; bf16 there
# would corrupt containment), direction dots keep v8's bf16 contract.

FAN_V9_FPB = _env_int("MPENV_FAN9_FPB", 16)


def _make_fan_kernel_v9(F: int, K: int, fpb: int):
    """Block: d2 [4, R] bf16 (rows dx dy dz 0); o4 [4, R] f32 (rows ox oy
    oz 1); dir9 [8, 3K] bf16; org9 [8, 3K] f32 (rows = xyz/const coeffs,
    LANE dim = candidates — an [3K, 8] layout physically pads the 8-minor
    dim to 128 lanes, a 16x blowup on the table gathers); out [1, 1, R]
    f32 nearest-hit t (inf miss). R = fpb * F lanes, ray-major within
    fan."""
    R = fpb * F
    assert R % 128 == 0 and K % 8 == 0

    def kernel(d2_ref, o4_ref, dir9_ref, org9_ref, out_ref):
        d2 = jnp.pad(d2_ref[:], ((0, 4), (0, 0)))  # [8, R]
        o4 = jnp.pad(o4_ref[:], ((0, 4), (0, 0)))
        dd = jax.lax.dot_general(
            dir9_ref[:], d2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [3K, R]
        ao = jax.lax.dot_general(
            org9_ref[:], o4, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [3K, R]

        inf = jnp.float32(np.inf)
        acc = jnp.full((8, R), inf, jnp.float32)
        for k in range(0, K, 8):
            nd = dd[k:k + 8]
            w1d = dd[K + k:K + k + 8]
            w2d = dd[2 * K + k:2 * K + k + 8]
            no2 = ao[k:k + 8]
            u0 = ao[K + k:K + k + 8]
            v0 = ao[2 * K + k:2 * K + k + 8]
            # padding tris are all-zero rows: t = 0 * inf = NaN and every
            # compare rejects; parallel rays degenerate the same way
            t = _recip(no2, nd)
            u = u0 + t * w1d
            v = v0 + t * w2d
            hit = (t > 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            acc = jnp.minimum(acc, jnp.where(hit, t, inf))
        # [1, 1, R] fan-major lanes; the (sublane, lane) split back to
        # [fpb, F] rows happens in XLA (Mosaic rejects the in-kernel
        # lane->sublane shape cast)
        out_ref[:] = jnp.min(acc, axis=0, keepdims=True)[None]

    return kernel


_FAN_V9_CACHE = {}


def _get_fan_v9(F: int, K: int):
    """custom_vmap flat entry for the v9 culled fan: (origins [N, 3],
    zoff [N, F] per-ray origin z offsets, dx/dy/dz [N, F], cells [N],
    dir9 [C, 3K, 8] bf16, org9 [C, 3K, 8] f32) -> t [N, F]."""
    ck = (F, K, FAN_V9_FPB, _interp())
    if ck in _FAN_V9_CACHE:
        return _FAN_V9_CACHE[ck]

    fpb = FAN_V9_FPB
    assert (fpb * F) % 128 == 0, (fpb, F)
    R = fpb * F
    kernel = _make_fan_kernel_v9(F, K, fpb)

    def call(block_cell, d2, o4, dir9, org9):
        S = d2.shape[1] // F
        dir9_b = dir9[block_cell]  # [B, 8, 3K] bf16
        org9_b = org9[block_cell]  # [B, 8, 3K] f32
        B = S // fpb
        dir9_b = dir9_b.reshape(B * 8, 3 * K)
        org9_b = org9_b.reshape(B * 8, 3 * K)
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((4, R), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, R), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 3 * K), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 3 * K), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, R), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 1, R), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary" if _interp()
                                     else "parallel",)
            ),
            interpret=_interp(),
        )(d2, o4, dir9_b, org9_b)

    @jax.custom_batching.custom_vmap
    def fan_v9_flat(origins, zoff, dx, dy, dz, cells, dir9, org9):
        from .culling import agent_sorted_layout

        N = origins.shape[0]
        C = dir9.shape[0]
        layout = agent_sorted_layout(cells, C, fpb)
        S = layout.S

        def plane(x, fill, dtype):
            padded = jnp.concatenate(
                [x, jnp.full((1, F), fill, x.dtype)], axis=0
            )[layout.src]  # [S, F]
            return padded.reshape(S * F).astype(dtype)

        # dummy slots: zero dirs -> nd = 0 -> NaN t -> all-miss
        d2 = jnp.stack(
            [plane(dx, 0.0, jnp.bfloat16), plane(dy, 0.0, jnp.bfloat16),
             plane(dz, 0.0, jnp.bfloat16),
             jnp.zeros((S * F,), jnp.bfloat16)],
            axis=0,
        )  # [4, S*F]
        ox = jnp.broadcast_to(origins[:, 0:1], (N, F))
        oy = jnp.broadcast_to(origins[:, 1:2], (N, F))
        oz = origins[:, 2:3] + zoff  # [N, F] per-ray origin z
        o4 = jnp.stack(
            [plane(ox, 0.0, jnp.float32), plane(oy, 0.0, jnp.float32),
             plane(oz, 0.0, jnp.float32),
             jnp.ones((S * F,), jnp.float32)],
            axis=0,
        )  # [4, S*F]
        out = call(layout.block_cell, d2, o4, dir9, org9)
        out = out.reshape(S, F)  # [B, fpb*F] -> slot rows (XLA relayout)
        # full-row gather kept un-fused (see fan_culled_flat note: a fused
        # gather+slice lowers to a serial dynamic-slice loop)
        return jax.lax.optimization_barrier(out[layout.slot])

    @fan_v9_flat.def_vmap
    def _vmap(axis_size, in_batched, origins, zoff, dx, dy, dz, cells,
              dir9, org9):
        assert not in_batched[6] and not in_batched[7]
        B = axis_size

        def bcast(x, batched):
            if batched:
                return x.reshape((-1,) + x.shape[2:])
            return jnp.broadcast_to(x[None], (B,) + x.shape).reshape(
                (-1,) + x.shape[1:]
            )

        args = [
            bcast(x, b)
            for x, b in zip((origins, zoff, dx, dy, dz, cells),
                            in_batched[:6])
        ]
        out = fan_v9_flat(*args, dir9, org9)
        return out.reshape((B, -1) + out.shape[1:]), True

    _FAN_V9_CACHE[ck] = fan_v9_flat
    return fan_v9_flat


def ray_fans_culled_v9(origins, zoff, dxyz, cells, rtables, t_max=INF):
    """Cell-culled v9 sensor fans over per-cell ray tables
    (ops/culling.py RayTables). origins [..., 3]; zoff [..., F] PER-RAY
    origin z offsets; dxyz = (dx, dy, dz) [..., F] component planes;
    cells [...] per-fan ray-table cell. Returns t [..., F] (inf miss)."""
    dx, dy, dz = dxyz
    F = dx.shape[-1]
    fan_flat = _get_fan_v9(F, rtables.K)
    t = fan_flat(origins, zoff, dx, dy, dz, cells,
                 rtables.dir9, rtables.org9)
    if t_max is not INF:
        t = jnp.where(t <= t_max, t, INF)
    return t


def _make_fan_kernel_v5(F: int, T: int, fpb: int, zgroups, engine="mxu"):
    """Grouped fan kernel, natural fan-major layout: the direction stream is
    exactly ``dirs.reshape(N*F, 4)`` (row = fan * F + ray) — no host-side
    relayout at all. In-kernel the [fpb*F, ...] arrays reshape (free,
    major-dim split) to [fpb, F, ...] and each z-group is one full
    [fpb, glen, T] VPU segment (glen is always a multiple of 8, so the
    sublane dim stays aligned). The v4 ray-major layout had the same
    full-tile epilogue but required a [N, F] -> block-transposed direction
    stream whose HBM relayout copy cost ~0.5 ms/step at 1024 worlds —
    more than the packing it saved."""
    assert sum(zgroups) == F and len(zgroups) <= MAX_ZGROUPS
    assert all(g % 8 == 0 for g in zgroups)

    def kernel(orig_ref, dirs_ref, tri_ref, dirmat_ref, out_ref):
        # orig_ref: [FPB, 8] VMEM f32 (x y z z_g0..z_g4);
        # dirs_ref: [FPB*F, 4] natural order — bf16 (mxu) / f32 (vpu);
        # tri_ref: [16, T] f32; dirmat_ref: [DIR_K, 3T] bf16;
        # out_ref: [FPB, F_out] f32
        tc = tri_ref[:]
        nx, ny, nz = tc[_NX:_NX + 1], tc[_NY:_NY + 1], tc[_NZ:_NZ + 1]
        d0 = tc[_D0:_D0 + 1]
        w1x, w1y, w1z = tc[_W1X:_W1X + 1], tc[_W1Y:_W1Y + 1], tc[_W1Z:_W1Z + 1]
        c1 = tc[_C1:_C1 + 1]
        w2x, w2y, w2z = tc[_W2X:_W2X + 1], tc[_W2Y:_W2Y + 1], tc[_W2Z:_W2Z + 1]
        c2 = tc[_C2:_C2 + 1]

        if engine == "mxu":
            # dirs arrive f32 and cast to bf16 HERE: a host-side bf16
            # direction stream bought 10 MB of HBM traffic but cost a ~1 ms
            # relayout copy (XLA reassociates the width-4 pad across the
            # cast, leaving a [.., 3] bf16 intermediate it must re-tile)
            db = jnp.pad(dirs_ref[:], ((0, 0), (0, DIR_K - 4))).astype(
                jnp.bfloat16
            )
            dd = jnp.dot(db, dirmat_ref[:], preferred_element_type=jnp.float32)
            dd = dd.reshape(fpb, F, 3 * T)
        else:
            dirs = dirs_ref[:].reshape(fpb, F, 4)
            dxc, dyc, dzc = dirs[..., 0:1], dirs[..., 1:2], dirs[..., 2:3]

        o = orig_ref[:]
        ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]  # [FPB, 1]
        no2 = d0 - (ox * nx + oy * ny + oz * nz)  # [FPB, T]
        u0 = ox * w1x + oy * w1y + oz * w1z + c1
        v0 = ox * w2x + oy * w2y + oz * w2z + c2

        inf = jnp.float32(np.inf)
        row = 0
        for g, glen in enumerate(zgroups):
            zg = o[:, 3 + g:4 + g]  # [FPB, 1]
            # z-dependent terms hoist per (fan, tri); [FPB, 1, T] broadcast
            # along the sublane (ray) dim of the group segment
            no2g = (no2 - zg * nz)[:, None, :]
            u0g = (u0 + zg * w1z)[:, None, :]
            v0g = (v0 + zg * w2z)[:, None, :]
            if engine == "mxu":
                nd = dd[:, row:row + glen, 0:T]
                w1d = dd[:, row:row + glen, T:2 * T]
                w2d = dd[:, row:row + glen, 2 * T:3 * T]
            else:
                dxg = dxc[:, row:row + glen]  # [FPB, glen, 1]
                dyg = dyc[:, row:row + glen]
                dzg = dzc[:, row:row + glen]
                nd = dxg * nx[None] + dyg * ny[None] + dzg * nz[None]
                w1d = dxg * w1x[None] + dyg * w1y[None] + dzg * w1z[None]
                w2d = dxg * w2x[None] + dyg * w2y[None] + dzg * w2z[None]
            # see v3 kernel notes: parallel rays / padding tris need no
            # guards (t degenerates to ±inf/NaN and every compare rejects)
            t = _recip(no2g, nd)
            u = u0g + t * w1d
            v = v0g + t * w2d
            hit = (t > 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            out_ref[:, row:row + glen] = jnp.min(
                jnp.where(hit, t, inf), axis=2
            )  # [FPB, glen]
            row += glen

    return kernel


def _make_fan_kernel_v4(F: int, T: int, fpb: int, zgroups, engine="mxu"):
    """Grouped fan kernel, ray-major layout: within a block the direction
    stream is ordered (ray, fan) — row = ray_idx * fpb + fan — so each
    z-group is ONE [glen * fpb, T] VPU segment with the origin-dependent
    terms computed vectorized over all fpb fans at once. The v3 layout
    (fan-major) unrolled a python loop over fans whose per-fan origin math
    ran on [1, T] tiles (1 of 8 sublanes busy) and fragmented the epilogue
    into fpb * len(zgroups) small segments; this one keeps the VPU on full
    tiles throughout. Origins ride VMEM (vector loads), not SMEM."""
    assert sum(zgroups) == F and len(zgroups) <= MAX_ZGROUPS

    def kernel(orig_ref, dirs_ref, tri_ref, dirmat_ref, out_ref):
        # orig_ref: [FPB, 8] VMEM f32 (x y z z_g0..z_g4);
        # dirs_ref: [F*FPB, 4] ray-major (dx dy dz 0) — bf16 (mxu) / f32
        # (vpu); tri_ref: [16, T] f32; dirmat_ref: [DIR_K, 3T] bf16;
        # out_ref: [FPB, F_out] f32
        tc = tri_ref[:]
        nx, ny, nz = tc[_NX:_NX + 1], tc[_NY:_NY + 1], tc[_NZ:_NZ + 1]
        d0 = tc[_D0:_D0 + 1]
        w1x, w1y, w1z = tc[_W1X:_W1X + 1], tc[_W1Y:_W1Y + 1], tc[_W1Z:_W1Z + 1]
        c1 = tc[_C1:_C1 + 1]
        w2x, w2y, w2z = tc[_W2X:_W2X + 1], tc[_W2Y:_W2Y + 1], tc[_W2Z:_W2Z + 1]
        c2 = tc[_C2:_C2 + 1]

        if engine == "mxu":
            db = jnp.pad(dirs_ref[:], ((0, 0), (0, DIR_K - 4)))
            dd = jnp.dot(db, dirmat_ref[:], preferred_element_type=jnp.float32)
        else:
            dirs = dirs_ref[:]
            dxc, dyc, dzc = dirs[:, 0:1], dirs[:, 1:2], dirs[:, 2:3]

        o = orig_ref[:]
        ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]  # [FPB, 1]
        no2 = d0 - (ox * nx + oy * ny + oz * nz)  # [FPB, T]
        u0 = ox * w1x + oy * w1y + oz * w1z + c1
        v0 = ox * w2x + oy * w2y + oz * w2z + c2

        inf = jnp.float32(np.inf)
        row = 0
        for g, glen in enumerate(zgroups):
            zg = o[:, 3 + g:4 + g]  # [FPB, 1]
            # z-dependent terms hoist per (fan, tri); [FPB, T] tiles
            no2g = no2 - zg * nz
            u0g = u0 + zg * w1z
            v0g = v0 + zg * w2z
            sl = slice(row * fpb, (row + glen) * fpb)
            if engine == "mxu":
                nd = dd[sl, 0:T].reshape(glen, fpb, T)
                w1d = dd[sl, T:2 * T].reshape(glen, fpb, T)
                w2d = dd[sl, 2 * T:3 * T].reshape(glen, fpb, T)
            else:
                dxg, dyg, dzg = dxc[sl], dyc[sl], dzc[sl]  # [glen*fpb, 1]
                nd = (dxg * nx + dyg * ny + dzg * nz).reshape(glen, fpb, T)
                w1d = (dxg * w1x + dyg * w1y + dzg * w1z).reshape(
                    glen, fpb, T)
                w2d = (dxg * w2x + dyg * w2y + dzg * w2z).reshape(
                    glen, fpb, T)
            # see v3 kernel notes: parallel rays / padding tris need no
            # guards (t degenerates to ±inf/NaN and every compare rejects)
            t = _recip(no2g[None], nd)
            u = u0g[None] + t * w1d
            v = v0g[None] + t * w2d
            hit = (t > 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            tmin = jnp.min(jnp.where(hit, t, inf), axis=2)  # [glen, FPB]
            out_ref[:, row:row + glen] = jnp.transpose(tmin, (1, 0))
            row += glen

    return kernel


_FAN_FLAT_CACHE = {}


def pack_fan_operands(origins, zoffs, dirs, N, F, zgroups,
                      dirs_dtype=jnp.bfloat16):
    """Shared operand packing for the fan kernels: returns (origs [N, 8]
    f32, dirs4 [N*F, 4]). Grouped mode packs per-group z offsets into the
    origin row (cols 3+) and casts dirs to ``dirs_dtype`` (bf16 when they
    only feed the bf16 MXU matmul; f32 for the fused-VPU dot engine);
    per-ray mode carries z in the f32 direction stream."""
    if zgroups is not None:
        G = len(zgroups)
        origs = jnp.concatenate(
            [origins, zoffs.reshape(N, G),
             jnp.zeros((N, 5 - G), jnp.float32)],
            axis=1,
        )
        dirs4 = jnp.concatenate(
            [
                dirs.reshape(N * F, 3),
                jnp.zeros((N * F, 1), jnp.float32),
            ],
            axis=1,
        ).astype(dirs_dtype)
    else:
        origs = jnp.concatenate(
            [origins, jnp.zeros((N, 5), jnp.float32)], axis=1
        )
        dirs4 = jnp.concatenate(
            [dirs.reshape(N * F, 3), zoffs.reshape(N * F, 1)],
            axis=1,
        )
    return origs, dirs4


def _get_fan_flat(F: int, zgroups=None):
    """custom_vmap flat entry: (origins [N, 3], zoffs, dirs [N, F, 3],
    tri_consts, dir_consts) -> t [N, F]; vmap flattens batch into the fan
    axis. zoffs is [N, F] per-ray z, or [N, G] per-group z when ``zgroups``
    (static run lengths summing to F) is given."""
    engine = fan_engine() if zgroups is not None else "mxu"
    ck = (F, zgroups, engine, _interp())
    if ck in _FAN_FLAT_CACHE:
        return _FAN_FLAT_CACHE[ck]

    FPB = FANS_PER_BLOCK

    F_out = -(-F // 128) * 128
    # the aligned-group v5 kernel casts to bf16 in-kernel (a host-side bf16
    # stream costs a relayout copy); v4 still wants bf16 from the host
    v5 = zgroups is not None and all(g % 8 == 0 for g in zgroups)
    dirs_dtype = (
        jnp.bfloat16 if (zgroups is not None and engine == "mxu" and not v5)
        else jnp.float32
    )

    def call(origs, dirs, tri_consts, dir_consts):
        N = origs.shape[0]
        T = tri_consts.shape[1]
        kernel = _make_fan_kernel(F, T, zgroups=zgroups)
        # grouped (v4) kernels vector-load origins -> VMEM; per-ray-z (v3)
        # reads them scalarly from SMEM
        orig_space = pltpu.VMEM if zgroups is not None else pltpu.SMEM
        out = pl.pallas_call(
            kernel,
            grid=(N // FPB,),
            in_specs=[
                pl.BlockSpec(
                    (FPB, 8), lambda i: (i, 0), memory_space=orig_space
                ),
                pl.BlockSpec(
                    (FPB * F, 4), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (TRI_CONST_ROWS, T), lambda i: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (DIR_K, 3 * T), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (FPB, F_out), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((N, F_out), jnp.float32),
            interpret=_interp(),
        )(origs, dirs, tri_consts, dir_consts)
        return out

    @jax.custom_batching.custom_vmap
    def fan_flat(origins, zoffs, dirs, tri_consts, dir_consts):
        N = origins.shape[0]
        N_pad = -(-max(N, 1) // FPB) * FPB
        # one fused concat per operand (strided .at[, col].set column writes
        # dominate kernel runtime otherwise)
        origs, dirs4 = pack_fan_operands(origins, zoffs, dirs, N, F, zgroups,
                                         dirs_dtype=dirs_dtype)
        origs = jnp.pad(origs, ((0, N_pad - N), (0, 0)))
        dirs4 = jnp.pad(dirs4, ((0, (N_pad - N) * F), (0, 0)))
        if zgroups is not None and any(g % 8 for g in zgroups):
            # v4 ray-major block layout: row = ray_idx * FPB + fan. The
            # aligned-group v5 kernel reads the natural order and needs no
            # relayout (this transpose costs a full HBM copy pass).
            dirs4 = (
                dirs4.reshape(N_pad // FPB, FPB, F, 4)
                .transpose(0, 2, 1, 3)
                .reshape(N_pad * F, 4)
            )
        out = call(origs, dirs4, tri_consts, dir_consts)
        return out[:N, :F]

    @fan_flat.def_vmap
    def _fan_vmap(axis_size, in_batched, origins, zoffs, dirs, tri_consts,
                  dir_consts):
        ob, zb, db, tb, dcb = in_batched
        assert not tb and not dcb
        B = axis_size

        def bcast(x, batched):
            if batched:
                return x.reshape((-1,) + x.shape[2:])
            return jnp.broadcast_to(x[None], (B,) + x.shape).reshape(
                (-1,) + x.shape[1:]
            )

        out = fan_flat(bcast(origins, ob), bcast(zoffs, zb), bcast(dirs, db),
                       tri_consts, dir_consts)
        return out.reshape((B, -1) + out.shape[1:]), True

    _FAN_FLAT_CACHE[ck] = fan_flat
    return fan_flat


def ray_fans_vs_tris_pallas(origins, zoffs, dirs, soup, t_max=INF,
                            zgroups=None):
    """Nearest-hit for bundles of rays sharing a base origin.
    origins: [..., 3] fan base; zoffs: [..., F] per-ray origin z offset
    ([..., G] per-group when ``zgroups`` is given); dirs: [..., F, 3] (any
    scale — t is in |d| units); returns t [..., F] (inf on miss)."""
    batch_shape = origins.shape[:-1]
    F = dirs.shape[-2]
    N = int(np.prod(batch_shape)) if batch_shape else 1
    fan_flat = _get_fan_flat(F, zgroups)
    t = fan_flat(
        origins.reshape(N, 3),
        zoffs.reshape(N, -1),
        dirs.reshape(N, F, 3),
        soup.packed,
        soup.dir_packed,
    ).reshape(batch_shape + (F,))
    return jnp.where(t <= t_max, t, INF)


# ---------------------------------------------------------------------------
# Sphere cast
# ---------------------------------------------------------------------------
#
# One fused kernel per launch: the per-(cast, tri) sweep (face + edge
# capsules + vertex spheres + start-overlap, Jolt-style semantics matching
# MeshBVH::sphereCastTriangle, reference src/mesh_bvh.inl:885+) AND the
# winner-only contact-normal reconstruction. Per-triangle derived constants
# (edge dots, inverse denominators, squared lengths) are precomputed on the
# host (raycast_cull.pack_sc2_consts, 32 rows), and the winner's geometry is
# selected in-VMEM with a lane-match reduction — the earlier XLA epilogue
# (winner gathers + closest-point outside the kernel) cost more than the
# sweep itself.

BLOCK_CASTS = 256


def _sc_sweep_lanes(ox, oy, oz, dx, dy, dz, tc, rr, with_normal):
    """The sphere-cast sweep with casts on SUBLANES ([BC, 1] columns) and
    triangles on LANES ([1, T] rows of the [40, T] constants). Returns
    (t_min [BC, 1], winner-lane idx [BC, 1] i32 or None)."""
    if True:  # keep the historical indentation of the sweep body
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

        inf = jnp.float32(np.inf)

        # shared origin/direction affine terms (barycentrics are affine in
        # the contact point: bv(x) = w1.x + c1, bw(x) = w2.x + c2)
        nd = nx * dx + ny * dy + nz * dz  # [BC, T]
        h = (nx * ox + ny * oy + nz * oz) - nv0
        u0 = w1[0] * ox + w1[1] * oy + w1[2] * oz + c1
        v0b = w2[0] * ox + w2[1] * oy + w2[2] * oz + c2
        w1d = w1[0] * dx + w1[1] * dy + w1[2] * dz
        w2d = w2[0] * dx + w2[1] * dy + w2[2] * dz
        rw1n = rr * w1n  # per-tri rows, hoisted off the pair loop
        rw2n = rr * w2n

        # face: ray vs plane offset by r toward the sphere + contact
        # barycentrics inside
        sign = jnp.where(h >= 0.0, jnp.float32(1.0), jnp.float32(-1.0))
        nd_ok = jnp.abs(nd) > 1e-9
        # exact divide here: an approx reciprocal (2^-12 rel err) was
        # measured to flip barycentric containment on near-tangent casts,
        # cascading to O(1) t errors when the min falls to a different
        # feature (parity suite caught 1.1u worst case) — unlike the fan
        # kernels, the sphere cast has acceptance cliffs downstream of t
        t_face = (sign * rr - h) / jnp.where(nd_ok, nd, jnp.float32(1.0))
        # contact = o + t d - sign r n
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

        def capsule(p0x, p0y, p0z, sx, sy, sz, len2, inv_l2):
            mx, my, mz = ox - p0x, oy - p0y, oz - p0z
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
            t_cyl = (-bb - sq) / safe_a  # exact: s_hit range check cliffs
            s_hit = ms + t_cyl * ds
            ok = (
                (jnp.abs(aa) > 1e-12) & (disc >= 0.0) & (t_cyl >= 0.0)
                & (s_hit >= 0.0) & (s_hit <= len2)
            )
            return jnp.where(ok, t_cyl, inf), start_in

        def sphere(cxx, cyy, czz):
            mx, my, mz = ox - cxx, oy - cyy, oz - czz
            bb = mx * dx + my * dy + mz * dz
            cc = mx * mx + my * my + mz * mz - rr * rr
            disc = bb * bb - cc
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            ts = -bb - sq
            ok = (disc >= 0.0) & (ts >= 0.0)
            return jnp.where(ok, ts, inf), cc <= 0.0

        t_edge, in0 = capsule(
            v0[0], v0[1], v0[2], e1[0], e1[1], e1[2], d00, inv_d00
        )
        overlap = overlap | in0
        t_e, in1 = capsule(
            v0[0], v0[1], v0[2], e2[0], e2[1], e2[2], d11, inv_d11
        )
        t_edge = jnp.minimum(t_edge, t_e)
        overlap = overlap | in1
        t_e, in2 = capsule(
            v1[0], v1[1], v1[2], e12[0], e12[1], e12[2], l12, inv_l12
        )
        t_edge = jnp.minimum(t_edge, t_e)
        overlap = overlap | in2
        for c in (v0, v1, v2):
            t_s, in_s = sphere(c[0], c[1], c[2])
            t_edge = jnp.minimum(t_edge, t_s)
            overlap = overlap | in_s

        t = jnp.minimum(t_face, t_edge)
        t = jnp.where(overlap, jnp.float32(0.0), t)
        t = jnp.where(valid, t, inf)

        t_min = jnp.min(t, axis=1, keepdims=True)  # [BC, 1]
        if not with_normal:
            return t_min, None

        # winner lane (first-lane tie-break = argmin); the contact normal
        # is reconstructed OUTSIDE the kernel from a one-hot matmul over the
        # constants table — [BC, 1]-column math in-kernel runs at 1/128
        # lane utilization and costs more than the whole sweep
        lane = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
        idx = jnp.min(
            jnp.where(t == t_min, lane, jnp.int32(2 ** 30)),
            axis=1, keepdims=True,
        )
        return t_min, idx


def _make_sc_kernel(r: float, T: int, with_normal: bool = True):
    rr = float(r)

    def kernel(rays_ref, tri_ref, out_ref):
        rays = rays_ref[:]
        t_min, idx = _sc_sweep_lanes(
            rays[:, 0:1], rays[:, 1:2], rays[:, 2:3],
            rays[:, 3:4], rays[:, 4:5], rays[:, 5:6],
            tri_ref[:], rr, with_normal,
        )
        out_ref[:, 0:1] = t_min
        if with_normal:
            out_ref[:, 1:2] = idx.astype(jnp.float32)
            out_ref[:, 2:8] = jnp.zeros((t_min.shape[0], 6), jnp.float32)
        else:
            out_ref[:, 1:8] = jnp.zeros((t_min.shape[0], 7), jnp.float32)

    return kernel


def _make_sc_kernel_planar_T(r: float, T: int, with_normal: bool = True):
    """Planar I/O ([8, BC] component rows in, [8, BC] out) around the
    lanes-oriented sweep: one in-kernel [8, BC] -> [BC, 8] transpose buys
    the tris-on-lanes orientation (A/B vs the sublane-oriented planar
    kernel via MPENV_SC_LAYOUT=rowsT)."""
    rr = float(r)

    def kernel(pln_ref, tri_ref, out_ref):
        rays = jnp.transpose(pln_ref[:], (1, 0))  # [BC, 8]
        t_min, idx = _sc_sweep_lanes(
            rays[:, 0:1], rays[:, 1:2], rays[:, 2:3],
            rays[:, 3:4], rays[:, 4:5], rays[:, 5:6],
            tri_ref[:], rr, with_normal,
        )
        out_ref[0:1, :] = jnp.transpose(t_min, (1, 0))
        if with_normal:
            out_ref[1:2, :] = jnp.transpose(
                idx.astype(jnp.float32), (1, 0)
            )
        else:
            out_ref[1:2, :] = jnp.zeros((1,) + t_min.shape[:1], jnp.float32)
        out_ref[2:8, :] = jnp.zeros((6,) + t_min.shape[:1], jnp.float32)

    return kernel


# one custom_vmap flat entry per static radius (r is baked into the kernel)
_SC_FLAT_CACHE = {}


def _get_sc_flat(r: float, T: int, with_normal: bool = True):
    ck = (r, T, with_normal, _interp())
    if ck in _SC_FLAT_CACHE:
        return _SC_FLAT_CACHE[ck]

    kernel = _make_sc_kernel(r, T, with_normal)

    def call(rays, sc_packed):
        R = rays.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(R // BLOCK_CASTS,),
            in_specs=[
                pl.BlockSpec(
                    (BLOCK_CASTS, 8), lambda i: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (SC2_ROWS, T), lambda i: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (BLOCK_CASTS, 8), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((R, 8), jnp.float32),
            interpret=_interp(),
        )(rays, sc_packed)

    @jax.custom_batching.custom_vmap
    def sc_flat(o, d, sc_packed):
        """o, d: [R, 3] -> (t [R], winner idx [R] as f32; -1-ish garbage on
        miss). vmap flattens the batch axis into the cast axis."""
        R = o.shape[0]
        R_pad = -(-max(R, 1) // BLOCK_CASTS) * BLOCK_CASTS
        rays = jnp.concatenate(
            [o, d, jnp.zeros((R, 2), jnp.float32)], axis=1
        )
        rays = jnp.pad(rays, ((0, R_pad - R), (0, 0)))
        out = call(rays, sc_packed)
        return out[:R, 0], out[:R, 1]

    @sc_flat.def_vmap
    def _sc_vmap(axis_size, in_batched, o, d, sc_packed):
        ob, db, pb = in_batched
        assert not pb
        B = axis_size

        def bcast(x, batched):
            if batched:
                return x.reshape((-1,) + x.shape[2:])
            return jnp.broadcast_to(x[None], (B,) + x.shape).reshape(
                (-1,) + x.shape[1:]
            )

        t, ix = sc_flat(bcast(o, ob), bcast(d, db), sc_packed)
        return (t.reshape(B, -1), ix.reshape(B, -1)), (True, True)

    _SC_FLAT_CACHE[ck] = sc_flat
    return sc_flat


def sphere_cast_vs_tris_pallas(o, d, r: float, soup, t_max=INF,
                               with_normal: bool = True):
    """Drop-in for ops.raycast.sphere_cast_vs_tris on TPU: fused Pallas
    nearest-hit sweep; the winner's contact normal is reconstructed outside
    via a one-hot matmul over the constants table (no gathers).
    ``with_normal=False`` skips all of that (zeros returned) for the many
    movement casts that only consume t. Returns (t [...], normal [..., 3])."""
    batch_shape = o.shape[:-1]
    R = int(np.prod(batch_shape)) if batch_shape else 1
    T = soup.sc_packed.shape[1]

    sc_flat = _get_sc_flat(float(r), T, with_normal)
    of = o.reshape(R, 3)
    df = d.reshape(R, 3)
    t, idx_f = sc_flat(of, df, soup.sc_packed)
    missed = ~jnp.isfinite(t) | (t > t_max)
    t_final = jnp.where(missed, INF, t)

    if not with_normal:
        z = jnp.zeros(batch_shape + (3,), jnp.float32)
        return t_final.reshape(batch_shape), z

    # winner data: one-hot [R, T] @ consts.T [T, 32] on the MXU
    idx = jnp.clip(idx_f.astype(jnp.int32), 0, T - 1)
    onehot = (idx[:, None] == jnp.arange(T)).astype(jnp.float32)
    wsel = onehot @ jnp.transpose(soup.sc_packed, (1, 0))  # [R, SC2_ROWS]
    v0 = wsel[:, 0:3]
    e1 = wsel[:, 3:6]
    e2 = wsel[:, 6:9]
    n = wsel[:, 9:12]

    from . import raycast as rc

    finite_t = jnp.where(jnp.isfinite(t), t, 0.0)
    hit_center = of + finite_t[:, None] * df
    closest = rc._closest_point_on_tri(hit_center, v0, e1, e2)
    depen = hit_center - closest
    dlen = jnp.linalg.norm(depen, axis=-1, keepdims=True)
    edge_n = jnp.where(
        dlen > 1e-12, depen / jnp.maximum(dlen, 1e-30),
        jnp.array([0.0, 0.0, 1.0]),
    )
    h = jnp.sum((of - v0) * n, axis=-1)
    sign = jnp.where(h >= 0.0, 1.0, -1.0)
    face_n = sign[:, None] * n
    is_face = jnp.abs(jnp.sum(edge_n * n, axis=-1)) > 0.999
    normal = jnp.where(is_face[:, None], face_n, edge_n)
    normal = jnp.where(missed[:, None], 0.0, normal)
    return (
        t_final.reshape(batch_shape),
        normal.reshape(batch_shape + (3,)),
    )


# ---------------------------------------------------------------------------
# Planar sphere cast (v2 layout: triangles on sublanes, casts on lanes)
# ---------------------------------------------------------------------------
#
# The row-major sphere-cast kernel above needs its operands packed as
# [R, 8] rows; XLA materializes that pack as a chain of stacks + layout
# copies (~0.7 ms/step at 1024 worlds, device-trace attributed). This
# variant takes the casts as COMPONENT ROWS ([8, R]: ox oy oz dx dy dz) —
# the producers' natural per-component math stacks straight into it — and
# flips the pair grid so per-cast values are [1, BC] row slices (free) and
# per-triangle constants are [TC, 1] column slices of the transposed
# constants table. Triangle chunks of 256 sublane rows keep the per-pair
# temporaries ~0.5 MB each regardless of map size.

SC_BC = _env_int("MPENV_SC_BC", 1024)  # casts per block (lanes); 2048
# overflows VMEM (per-pair temps are [256, BC] f32), 512 loses ~2%
SC_TRI_CHUNK = 256  # triangle rows per epilogue chunk (sublanes)


def _make_sc_kernel_planar(r: float, T: int, with_normal: bool = True,
                           culled: bool = False, seg: int = None):
    """cols-layout sweep: tris on sublanes, casts on lanes. ``culled``
    wraps it for scalar-prefetch dispatch: the kernel then takes
    (block_cell_ref, planes, tri_block [1, K, 40], out) with the
    per-block candidate table picked by the grid index map. ``seg``
    overrides the lanes-per-cell-segment width (default SC_CULL_SEG)."""
    rr = float(r)
    n_chunks = -(-T // SC_TRI_CHUNK)

    def body(p, tri_slice):
        # p: [8, BC] f32 values: ox oy oz dx dy dz pad pad
        ox, oy, oz = p[0:1], p[1:2], p[2:3]
        dx, dy, dz = p[3:4], p[4:5], p[5:6]
        inf = jnp.float32(np.inf)

        t_best = jnp.full(ox.shape, inf, jnp.float32)
        i_best = jnp.full(ox.shape, jnp.float32(2 ** 30))

        for ci in range(n_chunks):
            tc = tri_slice(
                ci * SC_TRI_CHUNK, min((ci + 1) * SC_TRI_CHUNK, T)
            )

            def col(k):
                return tc[:, k:k + 1]  # [TC, 1]

            v0x, v0y, v0z = col(0), col(1), col(2)
            e1x, e1y, e1z = col(3), col(4), col(5)
            e2x, e2y, e2z = col(6), col(7), col(8)
            nxx, nyy, nzz = col(9), col(10), col(11)
            valid = col(12) > 0.0
            d00, d11, l12 = col(13), col(14), col(15)
            v1x, v1y, v1z = col(16), col(17), col(18)
            e12x, e12y, e12z = col(22), col(23), col(24)
            inv_d00, inv_d11, inv_l12 = col(25), col(26), col(27)
            w1x, w1y, w1z = col(28), col(29), col(30)
            c1 = col(31)
            w2x, w2y, w2z = col(32), col(33), col(34)
            c2 = col(35)
            w1n, w2n = col(36), col(37)
            nv0 = col(38)

            # shared affine terms (same math as the row-major kernel; see
            # _make_sc_kernel for the semantics notes)
            nd = nxx * dx + nyy * dy + nzz * dz  # [TC, BC]
            h = (nxx * ox + nyy * oy + nzz * oz) - nv0
            u0 = w1x * ox + w1y * oy + w1z * oz + c1
            v0b = w2x * ox + w2y * oy + w2z * oz + c2
            w1d = w1x * dx + w1y * dy + w1z * dz
            w2d = w2x * dx + w2y * dy + w2z * dz
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

            pv = u0 - h * w1n
            pw = v0b - h * w2n
            overlap = (
                (jnp.abs(h) <= rr) & (pv >= 0.0) & (pw >= 0.0)
                & (pv + pw <= 1.0)
            )

            def capsule(p0x, p0y, p0z, sx, sy, sz, len2, inv_l2):
                mx, my, mz = ox - p0x, oy - p0y, oz - p0z
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

            def sphere(cxx, cyy, czz):
                mx, my, mz = ox - cxx, oy - cyy, oz - czz
                bb = mx * dx + my * dy + mz * dz
                cc = mx * mx + my * my + mz * mz - rr * rr
                disc = bb * bb - cc
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                ts = -bb - sq
                ok = (disc >= 0.0) & (ts >= 0.0)
                return jnp.where(ok, ts, inf), cc <= 0.0

            t_edge, in0 = capsule(v0x, v0y, v0z, e1x, e1y, e1z, d00, inv_d00)
            overlap = overlap | in0
            t_e, in1 = capsule(v0x, v0y, v0z, e2x, e2y, e2z, d11, inv_d11)
            t_edge = jnp.minimum(t_edge, t_e)
            overlap = overlap | in1
            t_e, in2 = capsule(v1x, v1y, v1z, e12x, e12y, e12z, l12, inv_l12)
            t_edge = jnp.minimum(t_edge, t_e)
            overlap = overlap | in2
            t_s, in_s = sphere(v0x, v0y, v0z)
            t_edge = jnp.minimum(t_edge, t_s)
            overlap = overlap | in_s
            t_s, in_s = sphere(v1x, v1y, v1z)
            t_edge = jnp.minimum(t_edge, t_s)
            overlap = overlap | in_s
            t_s, in_s = sphere(col(19), col(20), col(21))  # v2
            t_edge = jnp.minimum(t_edge, t_s)
            overlap = overlap | in_s

            t = jnp.minimum(t_face, t_edge)
            t = jnp.where(overlap, jnp.float32(0.0), t)
            t = jnp.where(valid, t, inf)

            t_min_c = jnp.min(t, axis=0, keepdims=True)  # [1, BC]
            if with_normal:
                if culled:
                    # winner id = GLOBAL tri row carried in table col 40
                    rid = tc[:, 40:41]
                    i_c = jnp.min(
                        jnp.where(t == t_min_c, rid, jnp.float32(2 ** 30)),
                        axis=0, keepdims=True,
                    )
                else:
                    row = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0) \
                        + ci * SC_TRI_CHUNK
                    i_c = jnp.min(
                        jnp.where(t == t_min_c, row, jnp.int32(2 ** 30)),
                        axis=0, keepdims=True,
                    ).astype(jnp.float32)
                # strict <: ties across chunks keep the earlier (lower-row)
                # winner, matching the single-pass first-lane tie-break
                take = t_min_c < t_best
                i_best = jnp.where(take, i_c, i_best)
            t_best = jnp.minimum(t_best, t_min_c)

        return t_best, i_best

    def write(out_ref, sl, t_best, i_best):
        out_ref[0:1, sl] = t_best
        out_ref[1:2, sl] = i_best
        out_ref[2:8, sl] = jnp.zeros(
            (6,) + t_best.shape[1:], jnp.float32
        )

    if culled:
        # one block spans SC_CULL_G cell-groups (in-kernel loop): the
        # per-block grid/DMA overhead (~5 us) dwarfed the 0.5 us of
        # per-group sweep compute at single-group blocks
        seg_w = SC_CULL_SEG if seg is None else int(seg)

        def kernel(pln_ref, tri_ref, out_ref):
            G = pln_ref.shape[1] // seg_w
            for g in range(G):
                sl = slice(g * seg_w, (g + 1) * seg_w)
                t_b, i_b = body(
                    pln_ref[:, sl],
                    lambda lo, hi, g=g: tri_ref[g * T + lo:g * T + hi, :],
                )
                write(out_ref, sl, t_b, i_b)
    else:
        def kernel(pln_ref, tri_ref, out_ref):
            t_b, i_b = body(
                pln_ref[:], lambda lo, hi: tri_ref[lo:hi, :]
            )
            write(out_ref, slice(None), t_b, i_b)

    return kernel


_SC_PLANAR_CACHE = {}


def sc_layout() -> str:
    """MPENV_SC_LAYOUT: 'rowsT' (default — planar I/O, one in-kernel block
    transpose into the tris-on-lanes sweep; measured ~2% faster end-to-end
    than 'cols') or 'cols' (tris on sublanes, casts on lanes)."""
    return os.environ.get("MPENV_SC_LAYOUT", "rowsT")


def _get_sc_planar(r: float, T: int, with_normal: bool = True):
    layout = sc_layout()
    ck = (r, T, with_normal, layout, _interp())
    if ck in _SC_PLANAR_CACHE:
        return _SC_PLANAR_CACHE[ck]

    if layout == "rowsT":
        kernel = _make_sc_kernel_planar_T(r, T, with_normal)
        tri_spec = pl.BlockSpec(
            (SC2_ROWS, T), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
    else:
        kernel = _make_sc_kernel_planar(r, T, with_normal)
        tri_spec = pl.BlockSpec(
            (T, SC2_ROWS), lambda i: (0, 0), memory_space=pltpu.VMEM
        )

    def call(planes, scT):
        R = planes.shape[1]
        return pl.pallas_call(
            kernel,
            grid=(R // SC_BC,),
            in_specs=[
                pl.BlockSpec(
                    (8, SC_BC), lambda i: (0, i), memory_space=pltpu.VMEM
                ),
                tri_spec,
            ],
            out_specs=pl.BlockSpec(
                (8, SC_BC), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((8, R), jnp.float32),
            interpret=_interp(),
        )(planes, scT)

    @jax.custom_batching.custom_vmap
    def sc_planar_flat(ox, oy, oz, dx, dy, dz, scT):
        """Comps [R] each -> (t [R], winner row idx [R] f32)."""
        R = ox.shape[0]
        R_pad = -(-max(R, 1) // SC_BC) * SC_BC
        z = jnp.zeros((R,), jnp.float32)
        planes = jnp.stack([ox, oy, oz, dx, dy, dz, z, z], axis=0)
        planes = jnp.pad(planes, ((0, 0), (0, R_pad - R)))
        out = call(planes, scT)
        return out[0, :R], out[1, :R]

    @sc_planar_flat.def_vmap
    def _sc_planar_vmap(axis_size, in_batched, ox, oy, oz, dx, dy, dz, scT):
        assert not in_batched[6]
        B = axis_size

        def bcast(x, batched):
            if batched:
                return x.reshape(-1)
            return jnp.broadcast_to(x[None], (B,) + x.shape).reshape(-1)

        args = [
            bcast(x, b)
            for x, b in zip((ox, oy, oz, dx, dy, dz), in_batched[:6])
        ]
        t, ix = sc_planar_flat(*args, scT)
        return (t.reshape(B, -1), ix.reshape(B, -1)), (True, True)

    _SC_PLANAR_CACHE[ck] = sc_planar_flat
    return sc_planar_flat


def sphere_cast_planar_pallas(o_comps, d_comps, r: float, soup, t_max=INF,
                              with_normal: bool = True):
    """Planar-operand sphere cast: o_comps/d_comps are (x, y, z) component
    arrays of identical shape [...]. Returns (t [...], winner tri row
    [...] i32; only meaningful where t is finite). Same sweep semantics as
    sphere_cast_vs_tris_pallas (MeshBVH::sphereCast, mesh_bvh.inl:885+)."""
    ox, oy, oz = o_comps
    dx, dy, dz = d_comps
    batch_shape = ox.shape
    R = int(np.prod(batch_shape)) if batch_shape else 1
    T = soup.sc_packedT.shape[0]
    sc_flat = _get_sc_planar(float(r), T, with_normal)
    table = soup.sc_packed if sc_layout() == "rowsT" else soup.sc_packedT
    t, ix = sc_flat(
        ox.reshape(R), oy.reshape(R), oz.reshape(R),
        dx.reshape(R), dy.reshape(R), dz.reshape(R), table,
    )
    t = jnp.where(t <= t_max, t, INF)
    return (
        t.reshape(batch_shape),
        jnp.clip(ix.astype(jnp.int32), 0, T - 1).reshape(batch_shape),
    )


def sc_normals_from_idx(o, d, t, idx, soup):
    """Contact normal for sphere-cast winners: o, d [..., 3]; t, idx [...].
    One-hot matmul over the constants table (no gathers) + Jolt-style
    face/edge normal selection — the same reconstruction the row-major
    entry performs, factored out so callers can apply it to just the casts
    that consume normals. Returns [..., 3] (zeros where t = inf)."""
    batch_shape = t.shape
    R = int(np.prod(batch_shape)) if batch_shape else 1
    T = soup.sc_packed.shape[1]
    of = o.reshape(R, 3)
    df = d.reshape(R, 3)
    tf = t.reshape(R)
    ix = jnp.clip(idx.reshape(R), 0, T - 1)

    onehot = (ix[:, None] == jnp.arange(T)).astype(jnp.float32)
    wsel = onehot @ jnp.transpose(soup.sc_packed, (1, 0))  # [R, SC2_ROWS]
    v0 = wsel[:, 0:3]
    e1 = wsel[:, 3:6]
    e2 = wsel[:, 6:9]
    n = wsel[:, 9:12]

    from . import raycast as rc

    missed = ~jnp.isfinite(tf)
    finite_t = jnp.where(missed, 0.0, tf)
    hit_center = of + finite_t[:, None] * df
    closest = rc._closest_point_on_tri(hit_center, v0, e1, e2)
    depen = hit_center - closest
    dlen = jnp.linalg.norm(depen, axis=-1, keepdims=True)
    edge_n = jnp.where(
        dlen > 1e-12, depen / jnp.maximum(dlen, 1e-30),
        jnp.array([0.0, 0.0, 1.0]),
    )
    h = jnp.sum((of - v0) * n, axis=-1)
    sign = jnp.where(h >= 0.0, 1.0, -1.0)
    face_n = sign[:, None] * n
    is_face = jnp.abs(jnp.sum(edge_n * n, axis=-1)) > 0.999
    normal = jnp.where(is_face[:, None], face_n, edge_n)
    normal = jnp.where(missed[:, None], 0.0, normal)
    return normal.reshape(batch_shape + (3,))


# ---------------------------------------------------------------------------
# Cell-culled planar sphere casts (movement path)
# ---------------------------------------------------------------------------
#
# Movement casts are xy-bounded (ops/culling.py short-table notes), so each
# agent's 7-cast group only needs its cell's short candidate set (K_s ~ 48
# vs 256 dense on simple_map). Agent groups are argsorted by cell with runs
# padded to SC_CULL_AB groups; each [8, SC_CULL_AB*8] block then reads ONE
# per-cell [K_s, 40] constants slice via scalar-prefetch. Sorting + the
# gathers cost ~0.1 ms at 12k agents — measured, not assumed (the older
# rank-matmul sorted path predates cheap XLA argsort/gather on TPU).

SC_CULL_AB = _env_int("MPENV_SC_AB", 16)  # agent groups per cell-run pad
SC_CULL_SEG = SC_CULL_AB * 8  # lanes per cell-group segment
SC_CULL_G = _env_int("MPENV_SC_G", 8)  # cell groups per Pallas block

_SC_CULL_CACHE = {}


def _get_sc_culled(r: float, K: int, with_normal: bool):
    ck = (r, K, with_normal, SC_CULL_AB, SC_CULL_G, _interp())
    if ck in _SC_CULL_CACHE:
        return _SC_CULL_CACHE[ck]

    kernel = _make_sc_kernel_planar(r, K, with_normal, culled=True)
    BCL = SC_CULL_SEG * SC_CULL_G  # lanes per block

    def call(block_cell, planes, table):
        # per-group tables pre-gathered in XLA (one cheap row gather) so
        # every index map is static; each block sweeps SC_CULL_G groups
        L = planes.shape[1]
        cols = table.shape[-1]  # 41: sc consts + global-id column
        tables_b = table.reshape(-1, K, cols)[block_cell].reshape(
            -1, cols
        )
        return pl.pallas_call(
            kernel,
            grid=(L // BCL,),
            in_specs=[
                pl.BlockSpec((8, BCL), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((SC_CULL_G * K, cols), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, BCL), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, L), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary" if _interp()
                                     else "parallel",)
            ),
            interpret=_interp(),
        )(planes, tables_b)

    @jax.custom_batching.custom_vmap
    def sc_culled_flat(oxa, oya, oza, dxa, dya, dza, cells, cand, table):
        """Agent-major comps [N, CPA] + per-agent cells [N] ->
        (t [N, CPA], local winner row [N, CPA] f32)."""
        from .culling import agent_sorted_layout

        N, CPA = oxa.shape
        C = table.shape[0] // K
        layout = agent_sorted_layout(cells, C, SC_CULL_AB,
                                     group_mult=SC_CULL_G)

        def prep(x, fill):
            x8 = jnp.pad(x, ((0, 0), (0, 8 - CPA)), constant_values=fill)
            dummy = jnp.full((1, 8), fill, jnp.float32)
            return jnp.concatenate([x8, dummy], axis=0)[layout.src]  # [S, 8]

        # dummy casts (pad lanes + padded agent slots) originate far from
        # every triangle: no overlap, no hit, all-inf
        ox_s = prep(oxa, 1e9)
        oy_s = prep(oya, 1e9)
        oz_s = prep(oza, 1e9)
        dx_s = prep(dxa, 0.0)
        dy_s = prep(dya, 0.0)
        dz_s = prep(dza, 0.0)
        S = layout.S
        planes = jnp.stack(
            [x.reshape(S * 8) for x in
             (ox_s, oy_s, oz_s, dx_s, dy_s, dz_s)]
            + [jnp.zeros((S * 8,), jnp.float32)] * 2,
            axis=0,
        )  # [8, S*8] lane = slot*8 + cast
        out = call(layout.block_cell, planes, table)
        t_n = out[0].reshape(S, 8)[layout.slot]  # [N, 8]
        i_n = out[1].reshape(S, 8)[layout.slot]
        return t_n[:, :CPA], i_n[:, :CPA]

    @sc_culled_flat.def_vmap
    def _vmap(axis_size, in_batched, oxa, oya, oza, dxa, dya, dza, cells,
              cand, table):
        assert not in_batched[7] and not in_batched[8]
        B = axis_size

        def bcast(x, batched):
            if batched:
                return x.reshape((-1,) + x.shape[2:])
            return jnp.broadcast_to(x[None], (B,) + x.shape).reshape(
                (-1,) + x.shape[1:]
            )

        args = [
            bcast(x, b)
            for x, b in zip((oxa, oya, oza, dxa, dya, dza, cells),
                            in_batched[:7])
        ]
        t, ix = sc_culled_flat(*args, cand, table)
        return (
            t.reshape((B, -1) + t.shape[1:]),
            ix.reshape((B, -1) + ix.shape[1:]),
        ), (True, True)

    _SC_CULL_CACHE[ck] = sc_culled_flat
    return sc_culled_flat


def sphere_cast_agent_culled(o_comps, d_comps, r: float, cells, short,
                             t_max=INF, with_normal: bool = True):
    """Cell-culled grouped sphere casts, planar operands: o_comps/d_comps
    (x, y, z) each [..., A, CPA] (agent-major, CPA <= 8 casts per agent);
    cells [..., A] short-table cell per agent. Returns (t [..., A, CPA],
    GLOBAL winner tri row [..., A, CPA] i32). Exact vs the dense sweep for
    xy-bounded movement casts (see ops/culling.py short-table notes)."""
    ox, oy, oz = o_comps
    dx, dy, dz = d_comps
    *batch, A, CPA = ox.shape
    sc_flat = _get_sc_culled(float(r), short.K, with_normal)
    t, i_glob = sc_flat(
        ox.reshape(-1, CPA), oy.reshape(-1, CPA), oz.reshape(-1, CPA),
        dx.reshape(-1, CPA), dy.reshape(-1, CPA), dz.reshape(-1, CPA),
        cells.reshape(-1), short.cand, short.table,
    )
    t = jnp.where(t <= t_max, t, INF)
    # the kernel's winner index is already the GLOBAL tri row (table col
    # 40); sc_normals_from_idx clips the miss sentinel into range
    idx_g = jnp.clip(i_glob.astype(jnp.int32), 0, 2 ** 24)
    shp = tuple(batch) + (A, CPA)
    return t.reshape(shp), idx_g.reshape(shp)


# ---------------------------------------------------------------------------
# Packed cell-culled planar sphere casts: apg same-cell agents share one
# 8-lane slot — the lane-economic dispatch for the 1-2-cast movement
# launches (L2 slide/ground-check, L3 ground snap, fall), which the
# one-agent-per-slot layout above runs at 6-7/8 dummy lanes.
# ---------------------------------------------------------------------------

SC_PACK_AB = _env_int("MPENV_SCP_AB", 8)  # units per cell-run pad
SC_PACK_G = _env_int("MPENV_SCP_G", 16)  # segments per Pallas block

_SC_PACK_CACHE = {}


def _get_sc_packed(r: float, K: int, apg: int, with_normal: bool):
    ab, gm = SC_PACK_AB, SC_PACK_G
    ck = (r, K, apg, with_normal, ab, gm, _interp())
    if ck in _SC_PACK_CACHE:
        return _SC_PACK_CACHE[ck]

    seg = ab * 8  # lanes per cell segment
    kernel = _make_sc_kernel_planar(r, K, with_normal, culled=True, seg=seg)
    BCL = seg * gm

    def call(block_cell, planes, table):
        L = planes.shape[1]
        cols = table.shape[-1]  # 41: sc consts + global-id column
        tables_b = table.reshape(-1, K, cols)[block_cell].reshape(-1, cols)
        return pl.pallas_call(
            kernel,
            grid=(L // BCL,),
            in_specs=[
                pl.BlockSpec((8, BCL), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gm * K, cols), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, BCL), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, L), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary" if _interp()
                                     else "parallel",)
            ),
            interpret=_interp(),
        )(planes, tables_b)

    lpa = 8 // apg  # lanes per agent within a unit

    @jax.custom_batching.custom_vmap
    def scp_flat(oxa, oya, oza, dxa, dya, dza, cells, table):
        """Agent-major comps [N, CPA] (CPA <= 8 // apg) + per-agent cells
        [N] -> (t [N, CPA], GLOBAL winner tri row [N, CPA] f32)."""
        from .culling import packed_sorted_layout

        N, CPA = oxa.shape
        C = table.shape[0] // K
        layout = packed_sorted_layout(cells, C, apg, ab, group_mult=gm)
        S_u = layout.S_units

        def prep(x, fill):
            xp = jnp.pad(
                x, ((0, 0), (0, lpa - CPA)), constant_values=fill
            )
            dummy = jnp.full((1, lpa), fill, jnp.float32)
            # [S_u * apg agent-slots, lpa] -> units of 8 lanes
            return jnp.concatenate([xp, dummy], axis=0)[layout.src].reshape(
                S_u, 8
            )

        # dummy casts (pad lanes + padded slots) originate far from every
        # triangle: no overlap, no hit, all-inf
        ox_s = prep(oxa, 1e9)
        oy_s = prep(oya, 1e9)
        oz_s = prep(oza, 1e9)
        dx_s = prep(dxa, 0.0)
        dy_s = prep(dya, 0.0)
        dz_s = prep(dza, 0.0)
        planes = jnp.stack(
            [x.reshape(S_u * 8) for x in
             (ox_s, oy_s, oz_s, dx_s, dy_s, dz_s)]
            + [jnp.zeros((S_u * 8,), jnp.float32)] * 2,
            axis=0,
        )  # [8, S_u*8] lane = unit*8 + agent_in_unit*lpa + cast
        out = call(layout.block_cell, planes, table)
        t_n = out[0].reshape(S_u * apg, lpa)[layout.slot]  # [N, lpa]
        i_n = out[1].reshape(S_u * apg, lpa)[layout.slot]
        return t_n[:, :CPA], i_n[:, :CPA]

    @scp_flat.def_vmap
    def _vmap(axis_size, in_batched, oxa, oya, oza, dxa, dya, dza, cells,
              table):
        assert not in_batched[7]
        B = axis_size

        def bcast(x, batched):
            if batched:
                return x.reshape((-1,) + x.shape[2:])
            return jnp.broadcast_to(x[None], (B,) + x.shape).reshape(
                (-1,) + x.shape[1:]
            )

        args = [
            bcast(x, b)
            for x, b in zip((oxa, oya, oza, dxa, dya, dza, cells),
                            in_batched[:7])
        ]
        t, ix = scp_flat(*args, table)
        return (
            t.reshape((B, -1) + t.shape[1:]),
            ix.reshape((B, -1) + ix.shape[1:]),
        ), (True, True)

    _SC_PACK_CACHE[ck] = scp_flat
    return scp_flat


def sphere_cast_packed(o_comps, d_comps, r: float, cells, short,
                       t_max=INF, with_normal: bool = False):
    """Cell-culled grouped sphere casts with apg agents packed per 8-lane
    slot: o_comps/d_comps (x, y, z) each [..., A, CPA] with CPA in {1, 2, 4}
    (apg = 8 // next_pow2(CPA)); cells [..., A] short-table cell per agent.
    Returns (t [..., A, CPA], GLOBAL winner tri row [..., A, CPA] i32).
    Built for the L2/L3/fall movement casts against the MOVE_MARGIN short
    tables (ops/culling.py): exact for xy-bounded down casts at any depth
    and for forward casts within move_dist + buf of the agent's cell —
    outside that range consumers are clamped/min-ed (sim/movement.py)."""
    ox, oy, oz = o_comps
    dx, dy, dz = d_comps
    *batch, A, CPA = ox.shape
    lpa = 1
    while lpa < CPA:
        lpa *= 2
    assert lpa <= 8
    apg = 8 // lpa
    sc_flat = _get_sc_packed(float(r), short.K, apg, with_normal)
    t, i_glob = sc_flat(
        ox.reshape(-1, CPA), oy.reshape(-1, CPA), oz.reshape(-1, CPA),
        dx.reshape(-1, CPA), dy.reshape(-1, CPA), dz.reshape(-1, CPA),
        cells.reshape(-1), short.table,
    )
    t = jnp.where(t <= t_max, t, INF)
    idx_g = jnp.clip(i_glob.astype(jnp.int32), 0, 2 ** 24)
    shp = tuple(batch) + (A, CPA)
    return t.reshape(shp), idx_g.reshape(shp)
