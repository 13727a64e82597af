import sys; sys.path.insert(0, "/root/repo")
import os, time
import jax, jax.numpy as jnp, numpy as np
import madrona_mp_env_tpu as mp
from madrona_mp_env_tpu import consts
from madrona_mp_env_tpu.assets.map_data import load_map
from madrona_mp_env_tpu.ops import raycast as rc

cfg = mp.EnvConfig(task=mp.Task.Zone, team_size=6,
                   sim_flags=mp.SimFlags.StaggerStarts | mp.SimFlags.RandomFlipTeams)
m = load_map("/root/repo/data/simple_map", cfg)
print("ray tables K:", m.ray_cells.K)
W, A = 1024, 12
N = W * A
ts = 6
zgroups = (ts*4,) + (consts.fwd_lidar_width,)*consts.fwd_lidar_height + (consts.rear_lidar_width,)*consts.rear_lidar_height
F = sum(zgroups); G = len(zgroups)
key = jax.random.PRNGKey(0)
origins = jax.random.uniform(key, (N,3), minval=-1500, maxval=1500).at[:,2].set(10.0)
zg = jax.random.uniform(jax.random.PRNGKey(1), (N,G), minval=20., maxval=60.)
d = jax.random.normal(jax.random.PRNGKey(2), (N,F,3))
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
dx, dy, dz = d[...,0], d[...,1], d[...,2]

def timeit(fn, *a, iters=30):
    for _ in range(3): out = fn(*a)
    jax.block_until_ready(out)
    t0=time.perf_counter()
    for _ in range(iters): out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter()-t0)/iters

@jax.jit
def dense(o, z, dx, dy, dz):
    return rc.ray_fans_vs_tris(o, z, (dx,dy,dz), m.tris, zgroups=zgroups)

from madrona_mp_env_tpu.ops.culling import ray_cell_index
from madrona_mp_env_tpu.ops.raycast_pallas import ray_fans_culled_v9
reps = np.asarray(zgroups)
@jax.jit
def v9(o, z, dx, dy, dz):
    zoff = jnp.repeat(z, jnp.asarray(reps), axis=-1, total_repeat_length=F)
    cells = ray_cell_index(m.ray_cells, o)
    return ray_fans_culled_v9(o, zoff, (dx,dy,dz), cells, m.ray_cells)

td = timeit(dense, origins, zg, dx, dy, dz)
tv = timeit(v9, origins, zg, dx, dy, dz)
rays = N*F
print(f"dense fan: {td*1e3:.3f} ms  {rays/td/1e9:.3f} Grays/s")
print(f"v9 culled: {tv*1e3:.3f} ms  {rays/tv/1e9:.3f} Grays/s  speedup {td/tv:.2f}x")
a = np.asarray(dense(origins, zg, dx, dy, dz))
b = np.asarray(v9(origins, zg, dx, dy, dz))
both = np.isfinite(a)&np.isfinite(b)
agree = (np.isfinite(a)==np.isfinite(b)).mean()
rel = np.abs(a[both]-b[both])/np.maximum(a[both],1.0)
print(f"agree {agree:.6f}  max rel {rel.max():.2e}")
