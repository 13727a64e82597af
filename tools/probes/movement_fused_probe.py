"""[PROBE — demoted from madrona_mp_env_tpu/ops in round 5] Fused collide-and-slide + fall megakernel.

One Pallas launch per step runs the WHOLE movement contact pipeline for a
block of agents — L1 (slope + low/high forward + 4 unstick probes), the
slide/unstick selection logic, L2 (slide step + unstick ground check),
L3 (ground snap) and the fall system's gravity cast — with the triangle
constants table resident in VMEM and every inter-phase select on the VPU.

Why: the reference runs applyVelocitySystem + fallSystem as per-thread
sequential casts (src/sim.cpp:889-1028, 1041-1095). The previous TPU port
batched them into FOUR pallas launches (L1/L2/L3/fall) because each
phase's cast origins depend on the previous phase's results — but each
small launch costs ~0.2 ms in grid/staging overhead at 12k agents while
its actual sweep compute is ~30-60 us (scan-chained section timings,
BASELINE.md round-3 handoff: apply_velocity 2.86 ms + fall 0.80 ms of a
7.26 ms step). Inside ONE kernel the phases are just sequential VPU code:
the dependency chain costs nothing, the tri table is read once, and all
the [A, ...] glue fusions disappear.

Layout: agents on LANES (block of MV_BC lanes), triangles on SUBLANES in
MV_TRI_CHUNK row chunks of the [T, 40] sphere-cast constants table
(pack_sc2_consts layout, see raycast_cull). Per-cast sweeps produce
[1, BC] t rows; winner normals for the three casts that consume them are
reconstructed in-kernel via a row-mask reduction over the table (no
gathers) followed by the same Jolt-style face/edge selection as
sc_normals_from_idx.

Parity: tests/test_pallas_parity.py::TestMovementFused runs this kernel in
interpret mode against the dense jnp reference pipeline
(sim/movement.py apply_velocity_system + fall_system).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from madrona_mp_env_tpu import consts
from madrona_mp_env_tpu.ops.raycast_pallas import SC2_ROWS, _env_int, _interp

INF = jnp.inf

MV_BC = _env_int("MPENV_MV_BC", 1024)  # agents per block (lanes)
MV_TRI_CHUNK = 256  # triangle rows per sweep chunk (sublanes)

UNSTICK_RANGE = 64.0  # sim/movement.py UNSTICK_RANGE


def _make_move_kernel(r: float, T: int, tbl_cols: int = SC2_ROWS):
    """Kernel refs: rows [16, BC] f32 (xx xy xz vx vy top low prone alive
    pad...); tri [T, 40] f32 (pack_sc2_consts cols layout); out [8, BC]
    f32 (rows 0-2 final pos after fall, rows 3-5 pre-fall pos for the
    velocity commit)."""
    rr = float(r)
    buf = 0.05 * rr
    hb = buf * 0.5
    r2 = 2.0 * rr
    dt = float(consts.delta_t)
    fall_rate = float(consts.fall_rate)
    n_chunks = -(-T // MV_TRI_CHUNK)

    def kernel(rows_ref, tri_ref, out_ref):
        inf = jnp.float32(np.inf)

        def sweep(ox, oy, oz, dx, dy, dz, want_idx):
            """One sphere cast per agent lane vs the whole table. All
            operands [1, BC]; returns (t [1, BC], winner row f32 [1, BC]).
            Same per-pair math as _make_sc_kernel_planar (Jolt-style
            face + edge-capsule + vertex-sphere + start-overlap)."""
            t_best = jnp.full(ox.shape, inf, jnp.float32)
            i_best = jnp.full(ox.shape, jnp.float32(2 ** 30))
            for ci in range(n_chunks):
                lo = ci * MV_TRI_CHUNK
                hi = min((ci + 1) * MV_TRI_CHUNK, T)
                tc = tri_ref[lo:hi, :]

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

                nd = nxx * dx + nyy * dy + nzz * dz  # [TC, BC]
                h = (nxx * ox + nyy * oy + nzz * oz) - nv0
                u0 = w1x * ox + w1y * oy + w1z * oz + c1
                v0b = w2x * ox + w2y * oy + w2z * oz + c2
                w1d = w1x * dx + w1y * dy + w1z * dz
                w2d = w2x * dx + w2y * dy + w2z * dz
                rw1n = rr * w1n
                rw2n = rr * w2n

                sign = jnp.where(
                    h >= 0.0, jnp.float32(1.0), jnp.float32(-1.0)
                )
                nd_ok = jnp.abs(nd) > 1e-9
                t_face = (sign * rr - h) / jnp.where(
                    nd_ok, nd, jnp.float32(1.0)
                )
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
                    safe_a = jnp.where(
                        jnp.abs(aa) > 1e-12, aa, jnp.float32(1.0)
                    )
                    t_cyl = (-bb - sq) / safe_a
                    s_hit = ms + t_cyl * ds
                    ok = (
                        (jnp.abs(aa) > 1e-12) & (disc >= 0.0)
                        & (t_cyl >= 0.0) & (s_hit >= 0.0) & (s_hit <= len2)
                    )
                    return jnp.where(ok, t_cyl, inf), start_in

                def vsphere(cxx, cyy, czz):
                    mx, my, mz = ox - cxx, oy - cyy, oz - czz
                    bb = mx * dx + my * dy + mz * dz
                    cc = mx * mx + my * my + mz * mz - rr * rr
                    disc = bb * bb - cc
                    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                    ts = -bb - sq
                    ok = (disc >= 0.0) & (ts >= 0.0)
                    return jnp.where(ok, ts, inf), cc <= 0.0

                t_edge, in0 = capsule(
                    v0x, v0y, v0z, e1x, e1y, e1z, d00, inv_d00
                )
                overlap = overlap | in0
                t_e, in1 = capsule(
                    v0x, v0y, v0z, e2x, e2y, e2z, d11, inv_d11
                )
                t_edge = jnp.minimum(t_edge, t_e)
                overlap = overlap | in1
                t_e, in2 = capsule(
                    v1x, v1y, v1z, e12x, e12y, e12z, l12, inv_l12
                )
                t_edge = jnp.minimum(t_edge, t_e)
                overlap = overlap | in2
                t_s, in_s = vsphere(v0x, v0y, v0z)
                t_edge = jnp.minimum(t_edge, t_s)
                overlap = overlap | in_s
                t_s, in_s = vsphere(v1x, v1y, v1z)
                t_edge = jnp.minimum(t_edge, t_s)
                overlap = overlap | in_s
                t_s, in_s = vsphere(col(19), col(20), col(21))  # v2
                t_edge = jnp.minimum(t_edge, t_s)
                overlap = overlap | in_s

                t = jnp.minimum(t_face, t_edge)
                t = jnp.where(overlap, jnp.float32(0.0), t)
                t = jnp.where(valid, t, inf)

                t_min_c = jnp.min(t, axis=0, keepdims=True)  # [1, BC]
                if want_idx:
                    row = jax.lax.broadcasted_iota(
                        jnp.int32, t.shape, 0
                    ) + lo
                    i_c = jnp.min(
                        jnp.where(t == t_min_c, row, jnp.int32(2 ** 30)),
                        axis=0, keepdims=True,
                    ).astype(jnp.float32)
                    take = t_min_c < t_best
                    i_best = jnp.where(take, i_c, i_best)
                t_best = jnp.minimum(t_best, t_min_c)
            return t_best, i_best

        def winner_normal(ox, oy, oz, dx, dy, dz, t, idx):
            """In-kernel port of sc_normals_from_idx: winner constants by
            row-mask reduction (one lane-row matches idx), then Jolt-style
            face/edge normal selection. All [1, BC]; returns 3 rows."""
            sel = [jnp.zeros_like(t) for _ in range(12)]
            for ci in range(n_chunks):
                lo = ci * MV_TRI_CHUNK
                hi = min((ci + 1) * MV_TRI_CHUNK, T)
                tc = tri_ref[lo:hi, :]
                row = jax.lax.broadcasted_iota(
                    jnp.int32, (hi - lo, t.shape[1]), 0
                ).astype(jnp.float32) + jnp.float32(lo)
                mask = row == idx  # exactly one true row (or none on miss)
                for k in range(12):  # v0 e1 e2 n — table cols 0..11
                    sel[k] = sel[k] + jnp.sum(
                        jnp.where(mask, tc[:, k:k + 1], 0.0),
                        axis=0, keepdims=True,
                    )
            v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z, nx, ny, nz = sel

            missed = ~(t < inf)
            ft = jnp.where(missed, 0.0, t)
            px = ox + ft * dx
            py = oy + ft * dy
            pz = oz + ft * dz

            # closest point on tri (Ericson RTCD 5.1.5, raycast.py
            # _closest_point_on_tri) on component rows
            apx, apy, apz = px - v0x, py - v0y, pz - v0z
            d1 = e1x * apx + e1y * apy + e1z * apz
            d2 = e2x * apx + e2y * apy + e2z * apz
            bx, by, bz = v0x + e1x, v0y + e1y, v0z + e1z
            bpx, bpy, bpz = px - bx, py - by, pz - bz
            d3 = e1x * bpx + e1y * bpy + e1z * bpz
            d4 = e2x * bpx + e2y * bpy + e2z * bpz
            cx, cy, cz = v0x + e2x, v0y + e2y, v0z + e2z
            cpx, cpy, cpz = px - cx, py - cy, pz - cz
            d5 = e1x * cpx + e1y * cpy + e1z * cpz
            d6 = e2x * cpx + e2y * cpy + e2z * cpz

            vc = d1 * d4 - d3 * d2
            vb = d5 * d2 - d1 * d6
            va = d3 * d6 - d5 * d4
            denom_vb = d1 - d3
            denom_vc = d2 - d6
            denom_va = (d4 - d3) + (d5 - d6)

            in_a = (d1 <= 0.0) & (d2 <= 0.0)
            in_b = (d3 >= 0.0) & (d4 <= d3)
            in_c = (d6 >= 0.0) & (d5 <= d6)
            on_ab = (vc <= 0.0) & (d1 >= 0.0) & (d3 <= 0.0)
            on_ac = (vb <= 0.0) & (d2 >= 0.0) & (d6 <= 0.0)
            on_bc = (va <= 0.0) & (d4 - d3 >= 0.0) & (d5 - d6 >= 0.0)

            v_ab = d1 / jnp.where(
                jnp.abs(denom_vb) > 1e-20, denom_vb, 1.0
            )
            w_ac = d2 / jnp.where(
                jnp.abs(denom_vc) > 1e-20, denom_vc, 1.0
            )
            w_bc = (d4 - d3) / jnp.where(
                jnp.abs(denom_va) > 1e-20, denom_va, 1.0
            )
            denom_face = va + vb + vc
            inv_face = 1.0 / jnp.where(
                jnp.abs(denom_face) > 1e-20, denom_face, 1.0
            )
            v_f = vb * inv_face
            w_f = vc * inv_face

            def pick(comp_v0, comp_e1, comp_e2, comp_b, comp_c):
                res = comp_v0 + v_f * comp_e1 + w_f * comp_e2
                res = jnp.where(
                    on_bc, comp_b + w_bc * (comp_c - comp_b), res
                )
                res = jnp.where(on_ac, comp_v0 + w_ac * comp_e2, res)
                res = jnp.where(on_ab, comp_v0 + v_ab * comp_e1, res)
                res = jnp.where(in_c, comp_c, res)
                res = jnp.where(in_b, comp_b, res)
                res = jnp.where(in_a, comp_v0, res)
                return res

            clx = pick(v0x, e1x, e2x, bx, cx)
            cly = pick(v0y, e1y, e2y, by, cy)
            clz = pick(v0z, e1z, e2z, bz, cz)

            dpx, dpy, dpz = px - clx, py - cly, pz - clz
            dlen = jnp.sqrt(dpx * dpx + dpy * dpy + dpz * dpz)
            has = dlen > 1e-12
            inv = 1.0 / jnp.maximum(dlen, 1e-30)
            enx = jnp.where(has, dpx * inv, 0.0)
            eny = jnp.where(has, dpy * inv, 0.0)
            enz = jnp.where(has, dpz * inv, 1.0)

            hh = (ox - v0x) * nx + (oy - v0y) * ny + (oz - v0z) * nz
            sgn = jnp.where(hh >= 0.0, 1.0, -1.0)
            is_face = jnp.abs(enx * nx + eny * ny + enz * nz) > 0.999
            onx = jnp.where(is_face, sgn * nx, enx)
            ony = jnp.where(is_face, sgn * ny, eny)
            onz = jnp.where(is_face, sgn * nz, enz)
            onx = jnp.where(missed, 0.0, onx)
            ony = jnp.where(missed, 0.0, ony)
            onz = jnp.where(missed, 0.0, onz)
            return onx, ony, onz

        def sweep_stack(OX, OY, OZ, DX, DY, DZ, n, want_idx):
            """Run the sweep over n stacked casts (rows of the [8, BC]
            operand planes) via a fori_loop so the sweep body is traced
            ONCE per phase — the fully-unrolled form blew Mosaic's
            program size (compile never finished) and scoped VMEM."""
            iota8 = jax.lax.broadcasted_iota(jnp.int32, OX.shape, 0)
            T_A = jnp.full(OX.shape, inf, jnp.float32)
            I_A = jnp.full(OX.shape, jnp.float32(2 ** 30))

            def body(i, carry):
                T_A, I_A = carry
                sel = iota8 == i

                def pick(M):
                    return jnp.sum(
                        jnp.where(sel, M, 0.0), axis=0, keepdims=True
                    )

                t, idx = sweep(
                    pick(OX), pick(OY), pick(OZ),
                    pick(DX), pick(DY), pick(DZ), want_idx,
                )
                T_A = jnp.where(sel, t, T_A)
                if want_idx:
                    I_A = jnp.where(sel, idx, I_A)
                return T_A, I_A

            return jax.lax.fori_loop(0, n, body, (T_A, I_A))

        def normal_stack(OX, OY, OZ, DX, DY, DZ, T_A, I_A, n):
            iota8 = jax.lax.broadcasted_iota(jnp.int32, OX.shape, 0)
            NX = jnp.zeros(OX.shape, jnp.float32)
            NY = jnp.zeros(OX.shape, jnp.float32)
            NZ = jnp.zeros(OX.shape, jnp.float32)

            def body(i, carry):
                NX, NY, NZ = carry
                sel = iota8 == i

                def pick(M):
                    return jnp.sum(
                        jnp.where(sel, M, 0.0), axis=0, keepdims=True
                    )

                nx1, ny1, nz1 = winner_normal(
                    pick(OX), pick(OY), pick(OZ),
                    pick(DX), pick(DY), pick(DZ),
                    pick(T_A), pick(I_A),
                )
                return (
                    jnp.where(sel, nx1, NX),
                    jnp.where(sel, ny1, NY),
                    jnp.where(sel, nz1, NZ),
                )

            return jax.lax.fori_loop(0, n, body, (NX, NY, NZ))

        p = rows_ref[:]
        xx, xy, xz = p[0:1], p[1:2], p[2:3]
        vx, vy = p[3:4], p[4:5]
        top, low = p[5:6], p[6:7]
        is_prone = p[7:8] > 0.5
        alive = p[8:9] > 0.5

        zero = jnp.zeros_like(xx)
        one = jnp.ones_like(xx)

        v_len = jnp.sqrt(vx * vx + vy * vy)
        moving = v_len > 0.0
        inv_vl = 1.0 / jnp.maximum(v_len, 1e-30)
        vnx = jnp.where(moving, vx * inv_vl, 0.0)
        vny = jnp.where(moving, vy * inv_vl, 0.0)
        move_dist = v_len * dt

        # ---- L1: slope + low/high forward casts (always needed) ----
        # The 4 unstick probes and the slide cast are LAZY: their sweeps
        # run under lax.cond only when some lane in the block needs them
        # (block-uniform control flow — the structural win a megakernel
        # has over split launches, where every phase runs for everyone).
        pad5 = jnp.concatenate([zero] * 5, axis=0)
        OX1 = jnp.concatenate(
            [xx, xx + vnx * hb, xx + vnx * hb, pad5], axis=0
        )
        OY1 = jnp.concatenate(
            [xy, xy + vny * hb, xy + vny * hb, pad5], axis=0
        )
        OZ1 = jnp.concatenate(
            [xz + top, xz + low, xz + top, pad5], axis=0
        )
        DX1 = jnp.concatenate([zero, vnx, vnx, pad5], axis=0)
        DY1 = jnp.concatenate([zero, vny, vny, pad5], axis=0)
        DZ1 = jnp.concatenate([-one, zero, zero, pad5], axis=0)
        T1, I1 = sweep_stack(OX1, OY1, OZ1, DX1, DY1, DZ1, 3, True)
        NX1, NY1, NZ1 = normal_stack(
            OX1, OY1, OZ1, DX1, DY1, DZ1, T1, I1, 3
        )

        t_s = T1[0:1]
        t_low, t_high = T1[1:2], T1[2:3]
        nsx, nsy, nsz = NX1[0:1], NY1[0:1], NZ1[0:1]
        nlx, nly, nlz = NX1[1:2], NY1[1:2], NZ1[1:2]
        nhx, nhy, nhz = NX1[2:3], NY1[2:3], NZ1[2:3]

        slope_block = (
            (nsz > 0.0) & (nsz < 0.7) & (nsx * vnx + nsy * vny < 0.0)
        )

        t_high = jnp.where(is_prone, t_low, t_high)
        nhx = jnp.where(is_prone, nlx, nhx)
        nhy = jnp.where(is_prone, nly, nhy)
        nhz = jnp.where(is_prone, nlz, nhz)

        high_closer = t_high < t_low
        low_dist_raw = jnp.where(high_closer, t_high, t_low)
        nx_sel = jnp.where(high_closer, nhx, nlx)
        ny_sel = jnp.where(high_closer, nhy, nly)
        high_hit = high_closer

        stuck = (t_low == 0.0) | (t_high == 0.0)
        low_dist = jnp.maximum(0.0, low_dist_raw - buf)
        step_d = jnp.minimum(low_dist, move_dist)
        hpx = xx + vnx * step_d
        hpy = xy + vny * step_d

        # ---- L2: slide step (lazy — only when some lane is blocked) ----
        slide_needed = move_dist > low_dist

        def slide_branch(hpx, hpy):
            # slide dir = normalize(cross(up, normal)) flipped toward v
            sl_len = jnp.sqrt(nx_sel * nx_sel + ny_sel * ny_sel)
            inv_sl = jnp.where(
                sl_len > 1e-12, 1.0 / jnp.maximum(sl_len, 1e-30), 0.0
            )
            sdx = -ny_sel * inv_sl
            sdy = nx_sel * inv_sl
            flip = (sdx * vnx + sdy * vny) < 0.0
            sdx = jnp.where(flip, -sdx, sdx)
            sdy = jnp.where(flip, -sdy, sdy)
            h_sel = jnp.where(high_hit, top, low)
            t_slide, _ = sweep(
                xx + vnx * low_dist, xy + vny * low_dist, xz + h_sel,
                sdx, sdy, zero, False,
            )
            slide_dist = jnp.maximum(0.0, t_slide - buf)
            slide_dist = jnp.minimum(
                slide_dist, jnp.maximum(move_dist - low_dist, 0.0)
            )
            do_slide = slide_needed & (slide_dist > 0.0)
            return (
                jnp.where(do_slide, hpx + sdx * slide_dist, hpx),
                jnp.where(do_slide, hpy + sdy * slide_dist, hpy),
            )

        hpx, hpy = jax.lax.cond(
            jnp.any(slide_needed & moving),
            slide_branch, lambda a, b: (a, b), hpx, hpy,
        )

        # ---- L3: ground snap under the slid position ----
        gcx, gcy, gcz = hpx, hpy, xz + top
        t_ground, _ = sweep(gcx, gcy, gcz, zero, zero, -one, False)

        # ---- unstick resolution (lazy — stuck lanes are rare) ----
        # 4 probes + the unstick ground check run only when some lane
        # needs them; range-clamped, first-max tie-break as jnp.argmax
        # (sim/movement.py apply_velocity_system)
        need_unstick = (t_ground <= 0.0) | stuck

        def unstick_branch(hpx, hpy, gcx, gcy, t_ground):
            pad4 = jnp.concatenate([zero] * 4, axis=0)
            OXu = jnp.concatenate(
                [xx - r2 * vnx, xx + r2 * vny, xx + r2 * vnx,
                 xx - r2 * vny, pad4], axis=0,
            )
            OYu = jnp.concatenate(
                [xy - r2 * vny, xy - r2 * vnx, xy + r2 * vny,
                 xy + r2 * vnx, pad4], axis=0,
            )
            OZu = jnp.concatenate(
                [xz + low, xz + low, xz + low, xz + low, pad4], axis=0
            )
            DXu = jnp.concatenate([vnx, -vny, -vnx, vny, pad4], axis=0)
            DYu = jnp.concatenate([vny, vnx, -vny, -vnx, pad4], axis=0)
            DZu = jnp.concatenate([zero, zero, zero, zero, pad4], axis=0)
            Tu, _ = sweep_stack(OXu, OYu, OZu, DXu, DYu, DZu, 4, False)

            big = jnp.float32(3.0e38)
            u0v = jnp.where(Tu[0:1] > UNSTICK_RANGE, big, Tu[0:1])
            u1v = jnp.where(Tu[1:2] > UNSTICK_RANGE, big, Tu[1:2])
            u2v = jnp.where(Tu[2:3] > UNSTICK_RANGE, big, Tu[2:3])
            u3v = jnp.where(Tu[3:4] > UNSTICK_RANGE, big, Tu[3:4])
            furthest = jnp.maximum(
                jnp.maximum(u0v, u1v), jnp.maximum(u2v, u3v)
            )
            any_dir = furthest > 0.0
            un_step = jnp.minimum(furthest - 2.0 * rr, -buf)
            first0 = u0v >= furthest
            first1 = ~first0 & (u1v >= furthest)
            first2 = ~first0 & ~first1 & (u2v >= furthest)
            bdx = jnp.where(
                first0, vnx,
                jnp.where(first1, -vny, jnp.where(first2, -vnx, vny)),
            )
            bdy = jnp.where(
                first0, vny,
                jnp.where(first1, vnx, jnp.where(first2, -vny, -vnx)),
            )
            un_px = xx + bdx * un_step
            un_py = xy + bdy * un_step
            un_gcz = xz + top
            t_ground_un, _ = sweep(
                un_px, un_py, un_gcz, zero, zero, -one, False
            )

            take_un = need_unstick & any_dir
            return (
                jnp.where(take_un, un_px, hpx),
                jnp.where(take_un, un_py, hpy),
                jnp.where(take_un, un_px, gcx),
                jnp.where(take_un, un_py, gcy),
                jnp.where(take_un, t_ground_un, t_ground),
            )

        hpx, hpy, gcx, gcy, t_ground = jax.lax.cond(
            jnp.any(need_unstick),
            unstick_branch,
            lambda a, b, c, d, e: (a, b, c, d, e),
            hpx, hpy, gcx, gcy, t_ground,
        )
        no_ground = ~(t_ground < inf)

        fall_dist = jnp.minimum(t_ground, top) + rr
        npx, npy, npz = gcx, gcy, gcz - fall_dist

        tnx, tny, tnz = npx - xx, npy - xy, npz - xz
        to_new_d = jnp.sqrt(tnx * tnx + tny * tny + tnz * tnz)
        valid_move = to_new_d > 0.0
        no_move = (~moving) | slope_block | no_ground | (~valid_move)
        opx = jnp.where(no_move, xx, npx)
        opy = jnp.where(no_move, xy, npy)
        opz = jnp.where(no_move, xz, npz)

        # ---- fall system (sim/movement.py fall_system) ----
        t_g2, _ = sweep(opx, opy, opz + 2.0 * rr, zero, zero, -one, False)
        no_fall = (~(t_g2 < inf)) | (t_g2 < rr)
        fd2 = jnp.minimum(t_g2 - rr, fall_rate * dt)
        keep = no_fall | (~alive)
        fpz = jnp.where(keep, opz, opz - fd2)

        out_ref[0:1, :] = opx
        out_ref[1:2, :] = opy
        out_ref[2:3, :] = fpz
        out_ref[3:4, :] = opx
        out_ref[4:5, :] = opy
        out_ref[5:6, :] = opz
        out_ref[6:8, :] = jnp.zeros((2,) + opx.shape[1:], jnp.float32)

    return kernel


_MOVE_CULL_CACHE = {}

MV_CULL_BC = _env_int("MPENV_MV_CULL_BC", 128)  # agents per culled block


def _get_move_fused_culled(r: float, K: int, C: int):
    """Cell-culled fused movement: agents sorted by short-table cell
    (agent_sorted_layout), one cell per block of MV_CULL_BC lanes, every
    phase sweeps that cell's [K, 41] candidate slice (exact for the whole
    movement batch — ops/culling.py short-table notes). ~4.6x fewer
    ray-tri pairs than the dense fused kernel on simple_map (K=56 vs 256)
    at the cost of run padding in the sorted layout."""
    ck = (r, K, C, MV_CULL_BC, _interp())
    if ck in _MOVE_CULL_CACHE:
        return _MOVE_CULL_CACHE[ck]

    kernel = _make_move_kernel(r, K, tbl_cols=41)
    BC = MV_CULL_BC

    def call(rows, tbl):
        S = rows.shape[1]
        return pl.pallas_call(
            kernel,
            grid=(S // BC,),
            in_specs=[
                pl.BlockSpec(
                    (16, BC), lambda i: (0, i), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (K, 41), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (8, BC), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((8, S), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=_interp(),
        )(rows, tbl)

    @jax.custom_batching.custom_vmap
    def move_flat(xx, xy, xz, vx, vy, top, low, prone, alive, cells,
                  table):
        """Flat agents [N] + short-table cells [N] + flat [C*K, 41]
        constants -> (pos_after_fall [N, 3], pos_pre_fall [N, 3])."""
        from madrona_mp_env_tpu.ops.culling import agent_sorted_layout

        N = xx.shape[0]
        layout = agent_sorted_layout(cells, C, BC)

        def plane(v):
            return jnp.concatenate(
                [v, jnp.zeros((1,), jnp.float32)]
            )[layout.src]  # [S]; dummy slots read the zero pad row

        z = jnp.zeros_like(plane(xx))
        rows = jnp.stack(
            [plane(xx), plane(xy), plane(xz), plane(vx), plane(vy),
             plane(top), plane(low), plane(prone), plane(alive),
             z, z, z, z, z, z, z],
            axis=0,
        )  # [16, S]
        tbl = table.reshape(C, K, 41)[layout.block_cell].reshape(-1, 41)
        out = jax.lax.optimization_barrier(call(rows, tbl))
        pos_fall = jnp.stack(
            [out[0][layout.slot], out[1][layout.slot],
             out[2][layout.slot]], axis=-1,
        )
        pos_pre = jnp.stack(
            [out[3][layout.slot], out[4][layout.slot],
             out[5][layout.slot]], axis=-1,
        )
        return pos_fall, pos_pre

    @move_flat.def_vmap
    def _vmap(axis_size, in_batched, *args):
        assert not in_batched[10]  # table never batched
        B = axis_size

        def bc(x, batched):
            if batched:
                return x.reshape(-1)
            return jnp.broadcast_to(x[None], (B,) + x.shape).reshape(-1)

        flat = [bc(x, b) for x, b in zip(args[:10], in_batched[:10])]
        pf, pp = move_flat(*flat, args[10])
        return (
            pf.reshape(B, -1, 3), pp.reshape(B, -1, 3)
        ), (True, True)

    _MOVE_CULL_CACHE[ck] = move_flat
    return move_flat


_MOVE_CACHE = {}


def _get_move_fused(r: float, T: int):
    ck = (r, T, MV_BC, _interp())
    if ck in _MOVE_CACHE:
        return _MOVE_CACHE[ck]

    kernel = _make_move_kernel(r, T)
    BC = MV_BC

    def call(rows, table):
        N_pad = rows.shape[1]
        return pl.pallas_call(
            kernel,
            grid=(N_pad // BC,),
            in_specs=[
                pl.BlockSpec(
                    (16, BC), lambda i: (0, i), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (T, SC2_ROWS), lambda i: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (8, BC), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((8, N_pad), jnp.float32),
            # the 11 sequential sweeps' temporaries exceed the compiler's
            # default 16M scoped-vmem budget; v5e VMEM is much larger
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=_interp(),
        )(rows, table)

    @jax.custom_batching.custom_vmap
    def move_flat(xx, xy, xz, vx, vy, top, low, prone, alive, table):
        """Flat agents [N] each -> (pos_after_fall [N, 3],
        pos_pre_fall [N, 3])."""
        N = xx.shape[0]
        N_pad = -(-max(N, 1) // BC) * BC
        z = jnp.zeros((N,), jnp.float32)
        rows = jnp.stack(
            [xx, xy, xz, vx, vy, top, low, prone, alive,
             z, z, z, z, z, z, z],
            axis=0,
        )
        rows = jnp.pad(rows, ((0, 0), (0, N_pad - N)))
        out = call(rows, table)
        pos_fall = jnp.stack(
            [out[0, :N], out[1, :N], out[2, :N]], axis=-1
        )
        pos_pre = jnp.stack(
            [out[3, :N], out[4, :N], out[5, :N]], axis=-1
        )
        return pos_fall, pos_pre

    @move_flat.def_vmap
    def _vmap(axis_size, in_batched, *args):
        assert not in_batched[9]  # table never batched
        B = axis_size

        def bc(x, batched):
            if batched:
                return x.reshape(-1)
            return jnp.broadcast_to(x[None], (B,) + x.shape).reshape(-1)

        flat = [bc(x, b) for x, b in zip(args[:9], in_batched[:9])]
        pf, pp = move_flat(*flat, args[9])
        return (
            pf.reshape(B, -1, 3), pp.reshape(B, -1, 3)
        ), (True, True)

    _MOVE_CACHE[ck] = move_flat
    return move_flat


def use_move_fused(m) -> bool:
    """Dispatch gate for the fused movement megakernel (MPENV_MOVE_FUSED=1,
    opt-in). Measured on v5e at 1024 worlds (scan-chained): split pipeline
    3.11 ms/step, fused dense 4.11, fused culled 5.53 (kernel 3.0 +
    sort/unsort staging 1.8). The launch/glue savings are real but the
    sweep is instruction-issue-bound (~50 VPU ops/pair at 6-16 vregs per
    op -> ~11 Gpairs/s like every sphere-cast kernel here), so the fused
    kernel's extra pairs (dense: no L1 culling; culled: sorted-layout
    padding) outweigh them. Flip the default once the sweep epilogue is
    MXU-ized (see BASELINE.md round-3 handoff: every capsule quadratic
    coefficient decomposes into o-dot-triconst matmuls + per-cast
    scalars)."""
    from . import raycast as rc

    return (
        rc.use_pallas()
        and m.tris.sc_packedT is not None
        and os.environ.get("MPENV_MOVE_FUSED", "0") == "1"
    )


def apply_velocity_fall_fused(cfg, m, state):
    """Fused applyVelocitySystem + fallSystem (reference
    src/sim.cpp:889-1028 + 1041-1095) in one Pallas launch. Replaces the
    apply_velocity_system -> fall_system pair in the step graph; the
    velocity commit uses the PRE-fall position exactly like the split
    pipeline (fall never touches vel)."""
    from madrona_mp_env_tpu.sim.types import Pose

    r = consts.agent_radius
    x = state.pos
    v = state.vel
    cur = state.stand_cur
    top = jnp.where(
        cur == Pose.Crouch,
        consts.crouch_height - r,
        jnp.where(
            cur == Pose.Prone, consts.prone_height,
            consts.stand_height - r,
        ),
    )
    low = jnp.where(
        cur == Pose.Prone,
        consts.prone_height - r + 0.05 * r,
        consts.prone_height,
    )
    prone = (cur == Pose.Prone).astype(jnp.float32)
    alive = (state.alive > 0.0).astype(jnp.float32)

    use_cull = (
        m.short is not None
        and os.environ.get("MPENV_SC_CULL", "1") == "1"
    )
    if use_cull:
        from .culling import short_cell_index

        cells = short_cell_index(m.short, x)
        move = _get_move_fused_culled(
            float(r), m.short.K, m.short.nx * m.short.ny
        )
        pos_fall, pos_pre = move(
            x[:, 0], x[:, 1], x[:, 2], v[:, 0], v[:, 1],
            top, low, prone, alive, cells, m.short.table,
        )
    else:
        T = m.tris.sc_packedT.shape[0]
        move = _get_move_fused(float(r), T)
        pos_fall, pos_pre = move(
            x[:, 0], x[:, 1], x[:, 2], v[:, 0], v[:, 1],
            top, low, prone, alive, m.tris.sc_packedT,
        )
    to_new = pos_pre - x
    moved = jnp.any(to_new != 0.0, axis=-1)
    out_vel = jnp.where(
        moved[:, None], to_new / consts.delta_t, 0.0
    )
    return state.replace(pos=pos_fall, vel=out_vel)
