"""MXU-decomposed sphere-cast sweep vs the production planar kernel.

Timing only (uncentered matrices — precision checked separately): does
moving the 6 affine dots + capsule/sphere quadratic coefficient dots
onto the MXU beat the ~220-op VPU epilogue?"""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
import madrona_mp_env_tpu as mp
from madrona_mp_env_tpu.assets.map_data import load_map
from madrona_mp_env_tpu.ops import raycast as rc
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

cfg = mp.EnvConfig(task=mp.Task.Zone, team_size=6)
m = load_map("/root/repo/data/simple_map", cfg)
soup = m.tris
T = soup.sc_packedT.shape[0]
rr = 15.0
N = 24576  # the L2-ish workload: 2 casts x 12288 agents
BC = 1024
rng = np.random.default_rng(0)
o = rng.uniform(-1500, 1500, (N, 3)).astype(np.float32)
o[:, 2] = rng.uniform(0, 80, N)
d = rng.normal(size=(N, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
ox, oy, oz = [jnp.asarray(o[:, i]) for i in range(3)]
dx, dy, dz = [jnp.asarray(d[:, i]) for i in range(3)]

# ---- build MXU matrices from the packed consts table [T, 41-ish] ----
tbl = np.asarray(soup.sc_packedT)  # [T, 40]
v0 = tbl[:, 0:3]; e1 = tbl[:, 3:6]; e2 = tbl[:, 6:9]; nrm = tbl[:, 9:12]
valid = tbl[:, 12]; d00 = tbl[:, 13]; d11 = tbl[:, 14]; l12 = tbl[:, 15]
v1 = tbl[:, 16:19]; v2 = tbl[:, 19:22]; e12 = tbl[:, 22:25]
inv = tbl[:, 25:28]; w1 = tbl[:, 28:31]; c1 = tbl[:, 31]
w2 = tbl[:, 32:35]; c2 = tbl[:, 35]; w1n = tbl[:, 36]; w2n = tbl[:, 37]
nv0 = tbl[:, 38]

G = 9
dirm = np.zeros((8, G * T), np.float32)
orgm = np.zeros((8, G * T), np.float32)
dgroups = [nrm, w1, w2, e1, e2, e12, v0, v1, v2]
for g, M in enumerate(dgroups):
    dirm[0:3, g * T:(g + 1) * T] = M.T
ogroups = [
    (nrm, -nv0), (w1, c1), (w2, c2),
    (e1, -(v0 * e1).sum(1)), (e2, -(v0 * e2).sum(1)),
    (e12, -(v1 * e12).sum(1)),
    (-2 * v0, (v0 * v0).sum(1)), (-2 * v1, (v1 * v1).sum(1)),
    (-2 * v2, (v2 * v2).sum(1)),
]
for g, (M, c) in enumerate(ogroups):
    orgm[0:3, g * T:(g + 1) * T] = M.T
    orgm[3, g * T:(g + 1) * T] = c
dirm = jnp.asarray(dirm)
orgm = jnp.asarray(orgm)
# epilogue consts [T, 16]: valid d00 d11 l12 inv0 inv1 inv2 w1n w2n
cons = np.zeros((T, 16), np.float32)
cons[:, 0] = valid; cons[:, 1] = d00; cons[:, 2] = d11; cons[:, 3] = l12
cons[:, 4:7] = inv; cons[:, 7] = w1n; cons[:, 8] = w2n
cons = jnp.asarray(cons)

INF = np.float32(np.inf)


def mxu_kernel(p_ref, dm_ref, om_ref, cn_ref, out_ref):
    p = p_ref[:]
    o4 = jnp.concatenate(
        [p[0:3], jnp.ones_like(p[0:1]), jnp.zeros_like(p[0:4])], axis=0
    )  # [8, BC] (ox oy oz 1 ...)
    d4 = jnp.concatenate([p[3:6], jnp.zeros_like(p[0:5])], axis=0)
    DD = jax.lax.dot_general(dm_ref[:], d4, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [9T, BC]
    AO = jax.lax.dot_general(om_ref[:], o4, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    od = p[0:1] * p[3:4] + p[1:2] * p[4:5] + p[2:3] * p[5:6]
    oo = p[0:1] ** 2 + p[1:2] ** 2 + p[2:3] ** 2

    cn = cn_ref[:]
    def cc_(k):
        return cn[:, k:k + 1]
    valid = cc_(0) > 0.0
    len2s = [cc_(1), cc_(2), cc_(3)]
    invs = [cc_(4), cc_(5), cc_(6)]
    w1n, w2n = cc_(7), cc_(8)

    def g(M, i):
        return M[i * T:(i + 1) * T]

    nd, w1d, w2d = g(DD, 0), g(DD, 1), g(DD, 2)
    h, u0, v0b = g(AO, 0), g(AO, 1), g(AO, 2)
    sign = jnp.where(h >= 0.0, jnp.float32(1.0), jnp.float32(-1.0))
    nd_ok = jnp.abs(nd) > 1e-9
    t_face = (sign * rr - h) / jnp.where(nd_ok, nd, jnp.float32(1.0))
    bv = u0 + t_face * w1d - sign * (rr * w1n)
    bw = v0b + t_face * w2d - sign * (rr * w2n)
    face_ok = (nd_ok & (t_face >= 0.0) & (bv >= 0.0) & (bw >= 0.0)
               & (bv + bw <= 1.0))
    t_face = jnp.where(face_ok, t_face, INF)
    pv = u0 - h * w1n
    pw = v0b - h * w2n
    overlap = ((jnp.abs(h) <= rr) & (pv >= 0.0) & (pw >= 0.0)
               & (pv + pw <= 1.0))

    t_edge = jnp.full(nd.shape, INF, jnp.float32)
    for i, p0g in zip(range(3), (6, 6, 7)):
        p0d = g(DD, p0g)
        sd = g(DD, 3 + i)
        ms = g(AO, 3 + i)
        qq = g(AO, p0g)
        md = od - p0d
        mm = oo + qq
        inv_l2 = invs[i]
        len2 = len2s[i]
        aa = 1.0 - sd * sd * inv_l2
        bb = md - ms * sd * inv_l2
        cc2 = mm - ms * ms * inv_l2 - rr * rr
        start_in = (cc2 <= 0.0) & (ms >= 0.0) & (ms <= len2)
        disc = bb * bb - aa * cc2
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        safe_a = jnp.where(jnp.abs(aa) > 1e-12, aa, jnp.float32(1.0))
        t_cyl = (-bb - sq) / safe_a
        s_hit = ms + t_cyl * sd
        ok = ((jnp.abs(aa) > 1e-12) & (disc >= 0.0) & (t_cyl >= 0.0)
              & (s_hit >= 0.0) & (s_hit <= len2))
        t_edge = jnp.minimum(t_edge, jnp.where(ok, t_cyl, INF))
        overlap = overlap | start_in
    for cgi in (6, 7, 8):
        cd = g(DD, cgi)
        qq = g(AO, cgi)
        bb = od - cd
        cc2 = oo + qq - rr * rr
        disc = bb * bb - cc2
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        ts = -bb - sq
        ok = (disc >= 0.0) & (ts >= 0.0)
        t_edge = jnp.minimum(t_edge, jnp.where(ok, ts, INF))
        overlap = overlap | (cc2 <= 0.0)

    t = jnp.minimum(t_face, t_edge)
    t = jnp.where(overlap, jnp.float32(0.0), t)
    t = jnp.where(valid, t, INF)
    out_ref[0:1, :] = jnp.min(t, axis=0, keepdims=True)
    out_ref[1:8, :] = jnp.zeros((7,) + t.shape[1:], jnp.float32)


def mxu_call(planes):
    R = planes.shape[1]
    return pl.pallas_call(
        mxu_kernel, grid=(R // BC,),
        in_specs=[
            pl.BlockSpec((8, BC), lambda i: (0, i)),
            pl.BlockSpec((8, G * T), lambda i: (0, 0)),
            pl.BlockSpec((8, G * T), lambda i: (0, 0)),
            pl.BlockSpec((T, 16), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((8, BC), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((8, R), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(planes, dirm, orgm, cons)


z = jnp.zeros((N,), jnp.float32)
planes = jnp.stack([ox, oy, oz, dx, dy, dz, z, z], axis=0)

NSCAN = 50


def timed(name, fn, *a):
    @jax.jit
    def loop(*a):
        def body(c, _):
            out = fn(a[0] + c, *a[1:])
            first = out[0] if isinstance(out, tuple) else out
            return jnp.nan_to_num(
                first.ravel()[0], posinf=0.0) * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=NSCAN)
        return c
    c = loop(*a); jax.block_until_ready(c)
    t0 = time.perf_counter(); c = loop(*a); jax.block_until_ready(c)
    dt = (time.perf_counter() - t0) / NSCAN
    print(f"{name:12s}: {dt*1e3:7.3f} ms  {N*T/dt/1e9:6.1f} Gpairs/s",
          flush=True)


from madrona_mp_env_tpu.ops.raycast_pallas import sphere_cast_planar_pallas

def prod(planes):
    t, _ = sphere_cast_planar_pallas(
        (planes[0], planes[1], planes[2]),
        (planes[3], planes[4], planes[5]), rr, soup, with_normal=False)
    return t

timed("mxu", mxu_call, planes)
timed("prod", prod, planes)

# spot parity (timing probe, but catch gross math errors)
t_m = mxu_call(planes)[0]
t_p = prod(planes)
a, b = np.asarray(t_m), np.asarray(t_p)
both_inf = np.isinf(a) & np.isinf(b)
close = both_inf | np.isclose(a, b, rtol=1e-3, atol=2e-2)
print("parity frac:", close.mean(), "max diff (finite both):",
      float(np.abs(np.where(both_inf, 0, a - b)).max()))
