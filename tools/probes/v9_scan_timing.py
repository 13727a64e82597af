"""Scan-chained kernel timing (the only trustworthy method through the
axon tunnel: python-loop timings are corrupted by execution caching /
async completion, see BASELINE.md round-3 handoff)."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
import madrona_mp_env_tpu as mp
from madrona_mp_env_tpu import consts
from madrona_mp_env_tpu.assets.map_data import load_map
from madrona_mp_env_tpu.ops import raycast as rc
from madrona_mp_env_tpu.ops.raycast_pallas import FAN_V9_FPB, _recip
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

cfg = mp.EnvConfig(task=mp.Task.Zone, team_size=6,
                   sim_flags=mp.SimFlags.StaggerStarts | mp.SimFlags.RandomFlipTeams)
m = load_map("/root/repo/data/simple_map", cfg)
rt = m.ray_cells
F, K, fpb = 104, rt.K, FAN_V9_FPB
R = fpb * F
rng = np.random.default_rng(0)
cells = np.sort(rng.integers(0, 256, 12288))
from madrona_mp_env_tpu.ops.culling import agent_sorted_layout
layout = agent_sorted_layout(jnp.asarray(cells, jnp.int32), rt.dir9.shape[0], fpb)
S = layout.S
B = S // fpb
print("S", S, "B", B, "K", K, flush=True)
bc = jax.device_put(layout.block_cell)
d2 = jnp.asarray(rng.normal(size=(4, S*F)), jnp.bfloat16)
o4 = jnp.asarray(rng.normal(size=(4, S*F)).astype(np.float32))
dir9_b = rt.dir9[bc].reshape(B*8, 3*K)
org9_b = rt.org9[bc].reshape(B*8, 3*K)
jax.block_until_ready((dir9_b, org9_b))

NSCAN = 50


def make_variant(which):
    def kernel(d2_ref, o4_ref, dir9_ref, org9_ref, out_ref):
        d2 = jnp.pad(d2_ref[:], ((0, 4), (0, 0)))
        o4 = jnp.pad(o4_ref[:], ((0, 4), (0, 0)))
        dd = jax.lax.dot_general(dir9_ref[:], d2, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ao = jax.lax.dot_general(org9_ref[:], o4, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        inf = jnp.float32(np.inf)
        if which == "chunked":
            acc = jnp.full((8, R), inf, jnp.float32)
            for k in range(0, K, 8):
                nd = dd[k:k+8]; w1d = dd[K+k:K+k+8]; w2d = dd[2*K+k:2*K+k+8]
                no2 = ao[k:k+8]; u0 = ao[K+k:K+k+8]; v0 = ao[2*K+k:2*K+k+8]
                t = _recip(no2, nd)
                u = u0 + t * w1d
                v = v0 + t * w2d
                hit = (t > 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                acc = jnp.minimum(acc, jnp.where(hit, t, inf))
            out_ref[:] = jnp.min(acc, axis=0, keepdims=True)[None]
        elif which == "full":
            nd = dd[0:K]; w1d = dd[K:2*K]; w2d = dd[2*K:3*K]
            no2 = ao[0:K]; u0 = ao[K:2*K]; v0 = ao[2*K:3*K]
            t = _recip(no2, nd)
            u = u0 + t * w1d
            v = v0 + t * w2d
            hit = (t > 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            out_ref[:] = jnp.min(jnp.where(hit, t, inf), axis=0,
                                 keepdims=True)[None]
    return kernel


def time_variant(which):
    kernel = make_variant(which)

    def call(d2i, o4i):
        return pl.pallas_call(
            kernel, grid=(B,),
            in_specs=[
                pl.BlockSpec((4, R), lambda i: (0, i)),
                pl.BlockSpec((4, R), lambda i: (0, i)),
                pl.BlockSpec((8, 3*K), lambda i: (i, 0)),
                pl.BlockSpec((8, 3*K), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, R), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, 1, R), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(d2i, o4i, dir9_b, org9_b)

    @jax.jit
    def loop(d2, o4):
        def body(c, _):
            out = call(d2 + c.astype(jnp.bfloat16), o4)
            # chain a scalar through the next iteration's input
            c2 = jnp.nan_to_num(out[0, 0, 0], posinf=0.0) * 1e-9
            return c2, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=NSCAN)
        return c

    c = loop(d2, o4); jax.block_until_ready(c)
    t0 = time.perf_counter()
    c = loop(d2, o4); jax.block_until_ready(c)
    dt = (time.perf_counter() - t0) / NSCAN
    pairs = S * F * K
    print(f"{which:8s}: {dt*1e3:.3f} ms/call  {dt/B*1e6:.2f} us/block  "
          f"{pairs/dt/1e9:.1f} Gpairs/s", flush=True)


time_variant("chunked")
time_variant("full")

# dense fan path, scan-chained, same fan workload (12288 fans x 104 rays)
N = 12288
ts = 6
zgroups = (ts*4,) + (consts.fwd_lidar_width,)*consts.fwd_lidar_height \
    + (consts.rear_lidar_width,)*consts.rear_lidar_height
G = len(zgroups)
key = jax.random.PRNGKey(0)
origins = jax.random.uniform(key, (N, 3), minval=-1500, maxval=1500).at[:, 2].set(10.0)
zgv = jax.random.uniform(jax.random.PRNGKey(1), (N, G), minval=20., maxval=60.)
d = jax.random.normal(jax.random.PRNGKey(2), (N, F, 3))
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]


@jax.jit
def dense_loop(o, zgv, dx, dy, dz):
    def body(c, _):
        t = rc.ray_fans_vs_tris(o + c, zgv, (dx, dy, dz), m.tris,
                                zgroups=zgroups)
        c2 = jnp.nan_to_num(t[0, 0], posinf=0.0) * 1e-9
        return c2, None
    c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=NSCAN)
    return c


c = dense_loop(origins, zgv, dx, dy, dz); jax.block_until_ready(c)
t0 = time.perf_counter()
c = dense_loop(origins, zgv, dx, dy, dz); jax.block_until_ready(c)
dt = (time.perf_counter() - t0) / NSCAN
T = m.tris.v0.shape[0]
print(f"dense e2e: {dt*1e3:.3f} ms/call  {N*F*T/dt/1e9:.1f} Gpairs/s "
      f"(T={T})", flush=True)

# v9 e2e (staging + sort + kernel + unsort), scan-chained
from madrona_mp_env_tpu.ops.culling import ray_cell_index
from madrona_mp_env_tpu.ops.raycast_pallas import ray_fans_culled_v9
reps = np.asarray(zgroups)


@jax.jit
def v9_loop(o, zgv, dx, dy, dz):
    def body(c, _):
        oo = o + c
        zoff = jnp.repeat(zgv, jnp.asarray(reps), axis=-1,
                          total_repeat_length=F)
        cl = ray_cell_index(rt, oo)
        t = ray_fans_culled_v9(oo, zoff, (dx, dy, dz), cl, rt)
        c2 = jnp.nan_to_num(t[0, 0], posinf=0.0) * 1e-9
        return c2, None
    c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=NSCAN)
    return c


c = v9_loop(origins, zgv, dx, dy, dz); jax.block_until_ready(c)
t0 = time.perf_counter()
c = v9_loop(origins, zgv, dx, dy, dz); jax.block_until_ready(c)
dt = (time.perf_counter() - t0) / NSCAN
print(f"v9 e2e   : {dt*1e3:.3f} ms/call", flush=True)
