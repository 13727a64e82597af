"""Capsule fan kernel + packed sphere-cast constants.

  * fan_capsules  — per-world sensor rays vs the 12 agent capsules
                    (replaces the HBM-heavy XLA broadcast sweep); the
                    TPU half of the reference's traceRayAgainstWorld
                    agent-capsule loop (src/sim.cpp fireSystem).
  * pack_sc2_consts — the [40, T] host-precomputed per-triangle constants
                    table every sphere-cast kernel sweeps
                    (raycast_pallas planar/short-table kernels).

The legacy MPENV_CULL kernel family that used to live here (per-fan
candidate-block fan/cast kernels and the cell-sorted variants) was removed
in round 5 — superseded in every measured config by the auto-gated planar
culled fan (raycast_pallas.ray_fans_culled_planar) and the default-on
short tables (BASELINE.md round-3/4 notes).
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


# (round 5) The legacy MPENV_CULL kernels that lived here — per-fan
# candidate-block fan/cast kernels and the cell-sorted fan/cast family —
# were removed: the auto-gated planar culled fan
# (raycast_pallas.ray_fans_culled_planar) and the default-on short tables
# (MPENV_SC_CULL) superseded them in every measured config
# (BASELINE.md round-3/4 notes). What remains is the production capsule
# fan kernel + the packed sphere-cast constants shared by all cast
# kernels.

