"""VPU/MXU micro-probes: measure the op rates the raycast kernels are
built on, on the actual chip. Each probe is a single-block Pallas kernel
running a serially-dependent fori_loop chain on a VMEM-resident tile, so
the measurement is pure compute issue rate (no HBM traffic, no grid-level
elimination possible).

Usage: python -m madrona_mp_env_tpu.tools.vpu_probe
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOOP = 2048  # fori_loop trip count
ROWS, COLS = 256, 256  # working tile (f32)


def _timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def _run(body, ops_per_iter, n_in=2, rows=ROWS, cols=COLS, loop=LOOP):
    """body(acc, a, b) -> new acc; chained `loop` times."""

    def kernel(a_ref, b_ref, o_ref):
        a, b = a_ref[:], b_ref[:]

        def step(i, acc):
            return body(acc, a, b)

        o_ref[:] = jax.lax.fori_loop(0, loop, step, a)

    call = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec((rows, cols), memory_space=pltpu.VMEM)
            for _ in range(n_in)
        ],
        out_specs=pl.BlockSpec((rows, cols), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
    )
    args = [
        jnp.asarray(np.random.rand(rows, cols) + 0.5, jnp.float32)
        for _ in range(n_in)
    ]
    f = jax.jit(lambda *a: call(*a))
    dt = _timeit(f, *args)
    ops = ops_per_iter * rows * cols * loop
    return ops / dt / 1e9


def main():
    print(f"backend={jax.default_backend()} loop={LOOP} tile={ROWS}x{COLS}")

    r = _run(lambda acc, a, b: acc * b + a, 1)
    print(f"{'fma_full_tile':34s} {r:8.1f} Gops/s")

    r = _run(lambda acc, a, b: acc * b, 1)
    print(f"{'mul_full_tile':34s} {r:8.1f} Gops/s")

    r = _run(lambda acc, a, b: acc[:, 0:1] * b + acc, 1)
    print(f"{'fma_lane_bcast([R,1]xT)':34s} {r:8.1f} Gops/s")

    r = _run(lambda acc, a, b: acc[0:1, :] * b + acc, 1)
    print(f"{'fma_sublane_bcast([1,T]xR)':34s} {r:8.1f} Gops/s")

    r = _run(lambda acc, a, b: pl.reciprocal(acc + b, approx=True), 1)
    print(f"{'recip_approx+add (as 1 op)':34s} {r:8.1f} Gops/s")

    r = _run(lambda acc, a, b: b / (acc + b), 1)
    print(f"{'div_exact+add (as 1 op)':34s} {r:8.1f} Gops/s")

    r = _run(lambda acc, a, b: jnp.where(acc > b, acc, b) + a, 3)
    print(f"{'cmp_sel_add (3 ops)':34s} {r:8.1f} Gops/s")

    def epilogue(acc, a, b):
        t = acc * pl.reciprocal(b, approx=True)
        u = a + t * b
        v = b + t * a
        hit = (t > 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        return jnp.minimum(acc, jnp.where(hit, t, jnp.inf)) + a

    r = _run(epilogue, 1, loop=LOOP // 8)
    print(f"{'fan_epilogue (pairs/s)':34s} {r:8.1f} Gpairs/s")

    # MXU: serially-dependent matmul chain (acc feeds back through lhs col 0)
    for K, M, N in ((8, 2048, 768), (128, 2048, 768)):
        def mm_kernel(a_ref, b_ref, o_ref, K=K, M=M, N=N):
            a, b = a_ref[:], b_ref[:]

            def step(i, acc):
                d = jax.lax.dot_general(
                    a + acc[:, 0:1].astype(jnp.bfloat16) * 0.0, b,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                return d

            o_ref[:] = jax.lax.fori_loop(0, 64, step, jnp.zeros((M, N),
                                                                jnp.float32))

        call = pl.pallas_call(
            mm_kernel,
            in_specs=[
                pl.BlockSpec((M, K), memory_space=pltpu.VMEM),
                pl.BlockSpec((K, N), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((M, N), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        )
        a = jnp.asarray(np.random.rand(M, K), jnp.bfloat16)
        b = jnp.asarray(np.random.rand(K, N), jnp.bfloat16)
        f = jax.jit(lambda x, y: call(x, y))
        dt = _timeit(f, a, b)
        outs = 64 * M * N
        print(f"matmul_M{M}_K{K}_N{N:28d}"[:34] +
              f" {outs / dt / 1e9:8.1f} Gout/s  "
              f"{outs * K / dt / 1e12:6.2f} TMAC/s")


if __name__ == "__main__":
    main()
