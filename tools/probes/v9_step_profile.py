import sys; sys.path.insert(0, "/root/repo")
import os, time, tempfile, collections
import jax, jax.numpy as jnp, numpy as np
import madrona_mp_env_tpu as mp
from madrona_mp_env_tpu import consts
from madrona_mp_env_tpu.assets.map_data import load_map
from madrona_mp_env_tpu.ops import raycast as rc
from madrona_mp_env_tpu.tools.profile_step import aggregate_trace

cfg = mp.EnvConfig(task=mp.Task.Zone, team_size=6)
m = load_map("/root/repo/data/simple_map", cfg)
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

from madrona_mp_env_tpu.ops.culling import ray_cell_index
from madrona_mp_env_tpu.ops.raycast_pallas import ray_fans_culled_v9
reps = np.asarray(zgroups)
@jax.jit
def v9(o, z, dx, dy, dz):
    zoff = jnp.repeat(z, jnp.asarray(reps), axis=-1, total_repeat_length=F)
    cells = ray_cell_index(m.ray_cells, o)
    return ray_fans_culled_v9(o, zoff, (dx,dy,dz), cells, m.ray_cells)

out = v9(origins, zg, dx, dy, dz); jax.block_until_ready(out)
logdir = tempfile.mkdtemp()
with jax.profiler.trace(logdir):
    for _ in range(20):
        out = v9(origins, zg, dx, dy, dz)
    jax.block_until_ready(out)
rows, total_ps, intervals = aggregate_trace(logdir)
for name, ps in rows.most_common(18):
    print(f"{ps/1e9/20:9.4f} ms  {name[:110]}")
