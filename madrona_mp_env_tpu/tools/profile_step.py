"""Op-level time attribution for the hot env.step (and optionally the fused
train update) on the real chip.

Captures a jax.profiler trace of N steps, then aggregates XLA op durations
from the xplane proto into fusion-level buckets so optimization effort goes
where the time is (the TPU analogue of reading nsys/ncu output for the
reference's CUDA step). Usage:

    python -m madrona_mp_env_tpu.tools.profile_step [--worlds 1024] [--top 30]
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import tempfile
import time


def _fields(buf):
    """Generic protobuf wire-format field iterator: yields
    (field_number, wire_type, value) where value is an int (varint/fixed)
    or bytes (length-delimited)."""
    i, n = 0, len(buf)
    while i < n:
        key = 0
        shift = 0
        while True:
            b = buf[i]
            i += 1
            key |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        fnum, wt = key >> 3, key & 7
        if wt == 0:  # varint
            v = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                v |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            yield fnum, wt, v
        elif wt == 2:  # length-delimited
            ln = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                ln |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            yield fnum, wt, buf[i:i + ln]
            i += ln
        elif wt == 5:  # fixed32
            yield fnum, wt, int.from_bytes(buf[i:i + 4], "little")
            i += 4
        elif wt == 1:  # fixed64
            yield fnum, wt, int.from_bytes(buf[i:i + 8], "little")
            i += 8
        else:
            raise ValueError(f"wire type {wt}")


def aggregate_trace(logdir: str, top: int = 30):
    """Parse the xplane proto written under ``logdir`` (hand-rolled wire
    parser — the installed tensorboard profile plugin is ABI-broken) and
    return {op_name: duration_ps} for the TPU device planes' XLA-op lines."""
    paths = glob.glob(
        os.path.join(logdir, "**", "*.xplane.pb"), recursive=True
    )
    assert paths, f"no xplane.pb under {logdir}"
    with open(sorted(paths)[-1], "rb") as f:
        space = f.read()

    rows = collections.Counter()
    intervals = []  # (start_ps, dur_ps, is_copy, name)
    total_ps = 0
    for fnum, wt, plane_buf in _fields(space):
        if fnum != 1:  # XSpace.planes
            continue
        name = b""
        lines = []
        ev_names = {}
        for pf, pwt, pv in _fields(plane_buf):
            if pf == 2:
                name = pv
            elif pf == 3:
                lines.append(pv)
            elif pf == 4:  # map<int64, XEventMetadata>
                mid, meta = None, None
                for mf, mwt, mv in _fields(pv):
                    if mf == 1:
                        mid = mv
                    elif mf == 2:
                        meta = mv
                if mid is not None and meta is not None:
                    mname = b""
                    for ef, ewt, ev in _fields(meta):
                        if ef == 2:
                            mname = ev
                    ev_names[mid] = mname.decode("utf-8", "replace")
        pname = name.decode("utf-8", "replace")
        if "TPU" not in pname:
            continue
        for line_buf in lines:
            lname = b""
            events = []
            for lf, lwt, lv in _fields(line_buf):
                if lf == 2:
                    lname = lv
                elif lf == 4:
                    events.append(lv)
            if b"XLA Ops" not in lname:
                continue
            for ev_buf in events:
                mid, dur, off = 0, 0, 0
                for ef, ewt, ev in _fields(ev_buf):
                    if ef == 1:
                        mid = ev
                    elif ef == 2:
                        off = ev
                    elif ef == 3:
                        dur = ev
                name = ev_names.get(mid, str(mid))
                rows[name] += dur
                total_ps += dur
                base = name.split(" ")[0].split(".")[0]
                is_copy = base in (
                    "%copy-start", "%copy-done", "%slice-start",
                    "%slice-done", "%dynamic-update-slice-start",
                    "%dynamic-update-slice-done",
                )
                intervals.append((off, dur, is_copy, base))
    return rows, total_ps, intervals


def _coverage(intervals, pred):
    """Union length (ps) of intervals matching ``pred``."""
    sel = sorted(
        (s, s + d) for s, d, c, n in intervals if d > 0 and pred(c, n)
    )
    total = 0
    cur_s, cur_e = None, None
    for s, e in sel:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                total += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        total += cur_e - cur_s
    return total


def bucket(name: str) -> str:
    """Collapse fusion instance names into readable buckets."""
    base = name.split(".")[0]
    return base


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--worlds", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--team-size", type=int, default=6)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--f32", action="store_true",
                    help="profile the train update in f32 (default bf16)")
    ap.add_argument("--scene", type=str, default=None)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    import madrona_mp_env_tpu as mp
    from madrona_mp_env_tpu.sim.types import Actions

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    scene = args.scene or os.path.join(repo, "data", "simple_map")
    cfg = mp.EnvConfig(
        task=mp.Task.Zone,
        team_size=args.team_size,
        sim_flags=mp.SimFlags.StaggerStarts | mp.SimFlags.RandomFlipTeams,
    )

    if args.train:
        # fused train-update attribution (mirrors bench.py --train):
        # rollout env-step kernels vs GAE/minibatch/PPO-epoch compute
        from madrona_mp_env_tpu.train import (
            PPOConfig, TrainConfig, TrainingManager,
        )

        tcfg = TrainConfig(
            num_worlds=args.worlds,
            steps_per_update=40,
            num_bptt_chunks=4,
            num_train_policies=1,
            ppo=PPOConfig(num_epochs=2, num_minibatches=4),
            # match bench.py --train (bf16 is the headline config)
            compute_dtype=jnp.float32 if args.f32 else jnp.bfloat16,
            seed=5,
        )
        env = mp.Env(cfg, scene, num_worlds=args.worlds, seed=5)
        mgr = TrainingManager(cfg, tcfg, env)
        ts = mgr.init()
        ts, metrics = mgr.update_iter(ts)
        jax.block_until_ready(metrics["loss"])

        n_upd = max(args.steps // 10, 2)
        logdir = tempfile.mkdtemp(prefix="mpenv_trainprof_")
        with jax.profiler.trace(logdir):
            t0 = time.perf_counter()
            for _ in range(n_upd):
                ts, metrics = mgr.update_iter(ts)
            jax.block_until_ready(metrics["loss"])
            dt = time.perf_counter() - t0

        per_upd_ms = dt / n_upd * 1e3
        fps = args.worlds * tcfg.steps_per_update * n_upd / dt
        print(f"train.update: {per_upd_ms:.3f} ms/update "
              f"({fps:,.0f} env-steps/s, {tcfg.steps_per_update} "
              f"steps/update @ {args.worlds} worlds, "
              f"{tcfg.compute_dtype.__name__})")
        rows, total_ps, intervals = aggregate_trace(logdir, args.top)
        any_ms = _coverage(intervals, lambda c, b: True) / 1e9 / n_upd
        compute_ms = _coverage(intervals, lambda c, b: not c) / 1e9 / n_upd
        kern_ms = _coverage(
            intervals,
            lambda c, b: b.startswith("%vmap") or "custom-call" in b,
        ) / 1e9 / n_upd
        print(f"device busy: {any_ms:.3f} ms/update | compute-covered: "
              f"{compute_ms:.3f} | pallas-covered: {kern_ms:.3f} | "
              f"exposed copy/DMA-only: {any_ms - compute_ms:.3f}")
        print(f"\n{'top events (full names)':100s} {'ms/update':>9s}")
        for name, ps in rows.most_common(args.top):
            print(f"{name[:100]:100s} {ps / 1e9 / n_upd:9.4f}")
        _shape_table(rows, args.top, n_upd, per="ms/update")
        return
    env = mp.Env(cfg, scene, num_worlds=args.worlds, seed=5)
    state, obs = env.reset()
    W, A = args.worlds, cfg.num_agents
    sim_ctrl = env.default_sim_ctrl()
    no_reset = jnp.zeros((W,), jnp.int32)
    step_fn = env.step_fn()
    key = jax.random.PRNGKey(0)
    acts = Actions(
        move_amount=jax.random.randint(key, (W, A), 0, 3),
        move_angle=jax.random.randint(key, (W, A), 0, 8),
        fire=jax.random.randint(key, (W, A), 0, 2),
        stand=jnp.zeros((W, A), jnp.int32),
        aim_yaw=jax.random.randint(key, (W, A), 0, 13),
        aim_pitch=jax.random.randint(key, (W, A), 0, 7),
        aim_yaw_rate=jnp.zeros((W, A), jnp.float32),
        aim_pitch_rate=jnp.zeros((W, A), jnp.float32),
    )

    @jax.jit
    def step(state):
        state, out = step_fn(state, acts, sim_ctrl, no_reset)
        return state, out["reward"]

    state, rew = step(state)  # compile
    jax.block_until_ready(rew)

    logdir = tempfile.mkdtemp(prefix="mpenv_prof_")
    with jax.profiler.trace(logdir):
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, rew = step(state)
        jax.block_until_ready(rew)
        dt = time.perf_counter() - t0

    per_step_ms = dt / args.steps * 1e3
    print(f"env.step: {per_step_ms:.3f} ms/step "
          f"({args.worlds / dt * args.steps:,.0f} env-steps/s)")

    rows, total_ps, intervals = aggregate_trace(logdir, args.top)
    total_ms = total_ps / 1e9
    n = args.steps
    any_ms = _coverage(intervals, lambda c, b: True) / 1e9 / n
    compute_ms = _coverage(intervals, lambda c, b: not c) / 1e9 / n
    kern_ms = _coverage(
        intervals, lambda c, b: b.startswith("%vmap") or "custom-call" in b
    ) / 1e9 / n
    copy_only_ms = any_ms - compute_ms
    print(f"device busy: {any_ms:.3f} ms/step | compute-covered: "
          f"{compute_ms:.3f} | pallas-covered: {kern_ms:.3f} | "
          f"exposed copy/DMA-only: {copy_only_ms:.3f}")
    print(f"\n{'top events (full names)':100s} {'ms/step':>9s}")
    for name, ps in rows.most_common(args.top):
        ms = ps / 1e9 / n
        print(f"{name[:100]:100s} {ms:9.4f}")

    _shape_table(rows, args.top, n)


def _shape_table(rows, top, n, per="ms/step"):
    # aggregate NON-copy, NON-custom-call compute by output shape signature
    # — maps the XLA fusion swarm back to sim subsystems by tensor shape
    import re

    by_shape = collections.Counter()
    cnt = collections.Counter()
    for name, ps in rows.items():
        base = name.split(" ")[0].split(".")[0]
        if base in ("%copy-start", "%copy-done", "%slice-start",
                    "%slice-done") or "custom-call" in name:
            continue
        m = re.search(r"= \(?([a-z0-9]+\[[0-9,]*\])", name)
        sig = m.group(1) if m else "(unnamed)"
        by_shape[sig] += ps
        cnt[sig] += 1
    print(f"\n{'fusion compute by output shape':44s} {'count':>6s} "
          f"{per:>9s}")
    for sig, ps in by_shape.most_common(top):
        print(f"{sig:44s} {cnt[sig]:6d} {ps / 1e9 / n:9.4f}")


if __name__ == "__main__":
    main()
