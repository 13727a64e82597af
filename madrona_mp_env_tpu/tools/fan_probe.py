"""Production-shape fan-kernel variant probes.

Isolates the cost structure of the sensor fan kernel at the sim's exact
shape (12288 fans x 104 rays x 256 tris at 1024 worlds): matmul-only,
epilogue-only, fused with approx-reciprocal vs exact divide, and chunked
variants. Drives kernel redesign decisions with on-chip numbers.

Usage: python -m madrona_mp_env_tpu.tools.fan_probe
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FPB = 32
F = 104
T = 256
N = 12288  # fans (1024 worlds x 12 agents)
ZGROUPS = (24, 16, 16, 16, 16, 16)[:5]  # 5 groups, 8-aligned, sum 88
ZGROUPS = (24, 20, 20, 20, 20)  # not 8-aligned; use real ones below
ZGROUPS = (24, 16, 16, 24, 24)  # sum=104, all %8==0


def _timeit(fn, *args, iters=20, warmup=3):
    """fn's FIRST arg is perturbed per call so no two executions are
    identical (the remote-execution tunnel appears to dedupe repeated
    identical dispatches, which faked sub-HBM-speed timings)."""
    first = args[0]
    deltas = [
        jnp.full_like(first, 1e-6 * (i + 1)) for i in range(iters + warmup)
    ]
    jax.block_until_ready(deltas)
    for i in range(warmup):
        out = fn(first + deltas[i], *args[1:])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = []
    for i in range(iters):
        outs.append(fn(first + deltas[warmup + i], *args[1:]))
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters


def make_args():
    rng = np.random.RandomState(0)
    origs = jnp.asarray(rng.rand(N, 8), jnp.float32)
    d2 = jnp.asarray(rng.rand(4, N * F) - 0.5, jnp.bfloat16)
    tri = jnp.asarray(rng.rand(16, T), jnp.float32)
    dirmat8 = jnp.asarray(rng.rand(8, 3 * T) - 0.5, jnp.bfloat16)
    return origs, d2, tri, dirmat8


def run_variant(kernel, name, iters=20, n=N, check=False):
    origs, d2, tri, dirmat8 = make_args()
    if n != N:
        reps = n // N
        origs = jnp.tile(origs, (reps, 1))
        d2 = jnp.tile(d2, (1, reps))
    RL = FPB * F
    F_out = 128
    call = pl.pallas_call(
        kernel,
        grid=(n // FPB,),
        in_specs=[
            pl.BlockSpec((FPB, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, RL), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, T), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 3 * T), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((FPB, F_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, F_out), jnp.float32),
    )
    f = jax.jit(lambda *a: call(*a))
    dt = _timeit(f, origs, d2, tri, dirmat8, iters=iters)
    pairs = n * F * T
    print(f"{name:36s} {dt * 1e3:7.3f} ms  {pairs / dt / 1e9:7.1f} Gpairs/s")
    if check:
        out = np.asarray(f(origs, d2, tri, dirmat8))[:, :F]
        # jnp reference of the same math
        dd = (jnp.pad(d2, ((0, 4), (0, 0))).astype(jnp.float32).T
              @ jnp.pad(dirmat8, ((0, 0), (0, 0))).astype(jnp.float32)
              ).reshape(n // FPB, FPB, F, 3 * T)
        tc = tri
        o = origs.reshape(n // FPB, FPB, 8)
        ox, oy, oz = o[..., 0:1], o[..., 1:2], o[..., 2:3]
        no2 = tc[3] - (ox * tc[0] + oy * tc[1] + oz * tc[2])
        u0 = ox * tc[4] + oy * tc[5] + oz * tc[6] + tc[7]
        v0 = ox * tc[8] + oy * tc[9] + oz * tc[10] + tc[11]
        refs = []
        row = 0
        for g, glen in enumerate(ZGROUPS):
            zg = o[..., 3 + g:4 + g]
            no2g = (no2 - zg * tc[2])[:, :, None, :]
            u0g = (u0 + zg * tc[6])[:, :, None, :]
            v0g = (v0 + zg * tc[10])[:, :, None, :]
            nd = dd[:, :, row:row + glen, 0:T]
            w1d = dd[:, :, row:row + glen, T:2 * T]
            w2d = dd[:, :, row:row + glen, 2 * T:3 * T]
            t = no2g / nd
            u = u0g + t * w1d
            v = v0g + t * w2d
            hit = (t > 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            refs.append(jnp.min(jnp.where(hit, t, jnp.inf), axis=3))
            row += glen
        ref = np.asarray(jnp.concatenate(refs, axis=2)).reshape(n, F)
        both = np.isfinite(ref) & np.isfinite(out)
        agree = (np.isfinite(ref) == np.isfinite(out)).mean()
        rel = (np.abs(out[both] - ref[both])
               / np.maximum(np.abs(ref[both]), 1e-6)).max() if both.any() \
            else float("nan")
        print(f"  check: hit-agree={agree:.4f} max_rel={rel:.2e} "
              f"hits={both.mean():.3f}")
    return dt


def _tri_rows(tc):
    return (tc[0:1], tc[1:2], tc[2:3], tc[3:4], tc[4:5], tc[5:6], tc[6:7],
            tc[7:8], tc[8:9], tc[9:10], tc[10:11], tc[11:12])


def make_v8(recip_mode="approx", do_matmul=True, do_epilogue=True):
    def kernel(orig_ref, d2_ref, tri_ref, dirmat_ref, out_ref):
        tc = tri_ref[:]
        (nx, ny, nz, d0, w1x, w1y, w1z, c1, w2x, w2y, w2z, c2) = _tri_rows(tc)

        if do_matmul:
            d2 = jnp.pad(d2_ref[:], ((0, 4), (0, 0)))
            dd = jax.lax.dot_general(
                d2, dirmat_ref[:], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(FPB, F, 3 * T)
        else:
            dd = jnp.full((FPB, F, 3 * T), 1.7, jnp.float32)

        if not do_epilogue:
            out_ref[:] = jnp.pad(
                jnp.min(dd[:, :, 0:T], axis=2), ((0, 0), (0, 128 - F))
            )
            return

        o = orig_ref[:]
        ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]
        no2 = d0 - (ox * nx + oy * ny + oz * nz)
        u0 = ox * w1x + oy * w1y + oz * w1z + c1
        v0 = ox * w2x + oy * w2y + oz * w2z + c2

        inf = jnp.float32(np.inf)
        row = 0
        for g, glen in enumerate(ZGROUPS):
            zg = o[:, 3 + g:4 + g]
            no2g = (no2 - zg * nz)[:, None, :]
            u0g = (u0 + zg * w1z)[:, None, :]
            v0g = (v0 + zg * w2z)[:, None, :]
            nd = dd[:, row:row + glen, 0:T]
            w1d = dd[:, row:row + glen, T:2 * T]
            w2d = dd[:, row:row + glen, 2 * T:3 * T]
            if recip_mode == "approx":
                t = no2g * pl.reciprocal(nd, approx=True)
            elif recip_mode == "exact":
                t = no2g * pl.reciprocal(nd, approx=False)
            else:
                t = no2g / nd
            u = u0g + t * w1d
            v = v0g + t * w2d
            hit = (t > 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            out_ref[:, row:row + glen] = jnp.min(
                jnp.where(hit, t, inf), axis=2
            )
            row += glen
        out_ref[:, F:128] = jnp.zeros((FPB, 128 - F), jnp.float32)

    return kernel


def make_v9_chunked(recip_mode="div", cr=8):
    """Matmul + epilogue fused per ray-chunk: chunk the block's rays into
    groups of `cr` fans... actually chunk over z-groups AND split the
    matmul per group so the dd intermediate is [FPB, glen, 3T] per chunk."""
    def kernel(orig_ref, d2_ref, tri_ref, dirmat_ref, out_ref):
        tc = tri_ref[:]
        (nx, ny, nz, d0, w1x, w1y, w1z, c1, w2x, w2y, w2z, c2) = _tri_rows(tc)

        o = orig_ref[:]
        ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]
        no2 = d0 - (ox * nx + oy * ny + oz * nz)
        u0 = ox * w1x + oy * w1y + oz * w1z + c1
        v0 = ox * w2x + oy * w2y + oz * w2z + c2

        d2 = jnp.pad(d2_ref[:], ((0, 4), (0, 0)))  # [8, FPB*F]
        d2r = d2.reshape(8, FPB, F)
        dm = dirmat_ref[:]

        inf = jnp.float32(np.inf)
        row = 0
        for g, glen in enumerate(ZGROUPS):
            # per-group matmul: [8, FPB*glen] ^T @ [8, 3T]
            d2g = d2r[:, :, row:row + glen].reshape(8, FPB * glen)
            dd = jax.lax.dot_general(
                d2g, dm, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(FPB, glen, 3 * T)
            zg = o[:, 3 + g:4 + g]
            no2g = (no2 - zg * nz)[:, None, :]
            u0g = (u0 + zg * w1z)[:, None, :]
            v0g = (v0 + zg * w2z)[:, None, :]
            nd = dd[:, :, 0:T]
            w1d = dd[:, :, T:2 * T]
            w2d = dd[:, :, 2 * T:3 * T]
            if recip_mode == "approx":
                t = no2g * pl.reciprocal(nd, approx=True)
            else:
                t = no2g / nd
            u = u0g + t * w1d
            v = v0g + t * w2d
            hit = (t > 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            out_ref[:, row:row + glen] = jnp.min(
                jnp.where(hit, t, inf), axis=2
            )
            row += glen
        out_ref[:, F:128] = jnp.zeros((FPB, 128 - F), jnp.float32)

    return kernel


def time_real_planar():
    """Time the production planar entry with operands already in their
    natural layouts (the step's actual call pattern)."""
    from madrona_mp_env_tpu.ops.raycast_pallas import (
        ray_fans_vs_tris_planar, pack_tri_consts, pack_dir_consts8,
    )
    from madrona_mp_env_tpu.ops.raycast import TriSoup

    rng = np.random.RandomState(0)
    tri_verts = rng.rand(250, 3, 3).astype(np.float32) * 100
    packed = jnp.asarray(pack_tri_consts(tri_verts, pad_to=T))
    soup = TriSoup(
        v0=None, e1=None, e2=None, normal=None, valid=None,
        packed=packed, sc_packed=None, dir_packed=None,
        dirT_packed=jnp.asarray(pack_dir_consts8(np.asarray(packed))),
    )
    origins = jnp.asarray(rng.rand(N, 3) * 1000, jnp.float32)
    zg = jnp.asarray(rng.rand(N, len(ZGROUPS)) * 40, jnp.float32)
    dx = jnp.asarray(rng.rand(N, F) - 0.5, jnp.float32)
    dy = jnp.asarray(rng.rand(N, F) - 0.5, jnp.float32)
    dz = jnp.asarray(rng.rand(N, F) - 0.5, jnp.float32)

    f = jax.jit(lambda o, z, a, b, c: ray_fans_vs_tris_planar(
        o, z, (a, b, c), soup, zgroups=ZGROUPS))
    dt = _timeit(f, origins, zg, dx, dy, dz)
    pairs = N * F * T
    print(f"{'REAL ray_fans_vs_tris_planar':36s} {dt * 1e3:7.3f} ms  "
          f"{pairs / dt / 1e9:7.1f} Gpairs/s")

    # sanity: rough agreement with the dense reference on a small slice
    from madrona_mp_env_tpu.ops import raycast as rc
    soup_d = rc.make_tri_soup(tri_verts, pad_to=T)
    o_s = origins[:4]
    dirs_s = jnp.stack([dx[:4], dy[:4], dz[:4]], axis=-1)  # [4, F, 3]
    reps = np.asarray(ZGROUPS)
    z_perray = jnp.repeat(zg[:4], jnp.asarray(reps), axis=-1,
                          total_repeat_length=F)
    o_full = o_s[:, None, :] + jnp.stack(
        [jnp.zeros_like(z_perray), jnp.zeros_like(z_perray), z_perray],
        axis=-1)
    ref = rc._ray_vs_tris_dense(o_full, dirs_s, soup_d)
    got = f(origins, zg, dx, dy, dz)[:4]
    both_hit = np.isfinite(np.asarray(ref)) & np.isfinite(np.asarray(got))
    if both_hit.any():
        rel = np.abs(np.asarray(got)[both_hit] - np.asarray(ref)[both_hit]) \
            / np.maximum(np.asarray(ref)[both_hit], 1e-3)
        print(f"  parity: hit-agree="
              f"{(np.isfinite(ref) == np.isfinite(got)).mean():.4f} "
              f"max_rel_err={rel.max():.2e}")


def main():
    print(f"backend={jax.default_backend()} N={N} F={F} T={T} FPB={FPB} "
          f"zgroups={ZGROUPS}")
    run_variant(make_v8("approx"), "v8 fused (recip approx) [current]")
    run_variant(make_v8("div"), "v8 fused (exact div)", check=True)
    run_variant(make_v8("div"), "v8 fused (exact div) 4xN", n=4 * N)
    run_variant(make_v8("exact"), "v8 fused (recip exact)")
    run_variant(make_v8("div", do_epilogue=False), "v8 matmul-only + min")
    run_variant(make_v8("div", do_matmul=False), "v8 epilogue-only (fake dd)")
    time_real_planar()


if __name__ == "__main__":
    main()
