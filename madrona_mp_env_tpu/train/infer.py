"""Evaluation / inference driver.

Equivalent of the reference's scripts/jax_infer.py + madrona_learn's
eval_load_ckpt / EvalConfig / eval_policies (SURVEY.md §3.2): load a
checkpoint (single-policy or crossplay over the PBT ensemble), roll the env
with the policies in eval mode, track crossplay ELO from finished matches,
and optionally write record logs, event logs, and a behavior-cloning
dataset dump (obs/actions/logits/rewards/rnn_states raw files,
jax_infer.py:119-240).

TPU-native: the rollout runs in jitted lax.scan chunks; host I/O (record/BC
files, zone-swap printing) happens between chunks instead of per-step
io_callbacks.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EnvConfig
from ..sim.env import Env
from ..sim.types import Actions
from .elo import elo_update_masked
from .normalizer import normalize_obs
from .policy import ActorCriticNet, clear_rnn_states, init_rnn_states
from .trainer import POLICY_OBS_KEYS, _static_assignment, TrainConfig


@dataclass(frozen=True)
class EvalConfig:
    """Mirror of madrona_learn's EvalConfig (jax_infer.py:257-268)."""

    num_worlds: int
    num_eval_steps: int = 200
    policy_dtype: Any = jnp.float32
    eval_competitive: bool = True
    use_deterministic_policy: bool = False
    reward_gamma: float = 0.998
    seed: int = 10
    chunk_steps: int = 10  # host flush granularity


def eval_load_ckpt(
    ckpt_path: str,
    single_policy: Optional[int] = None,
):
    """Load a training checkpoint for eval (madrona_learn.eval_load_ckpt,
    jax_infer.py:73-81). Returns (params [P, ...], normalizer, elo [P],
    num_policies). With single_policy=i, P=1 containing that policy."""
    import orbax.checkpoint as ocp

    from .normalizer import EMANormalizerState

    ckptr = ocp.PyTreeCheckpointer()
    path = os.path.abspath(ckpt_path)
    # restore as host numpy: sharding-free, so checkpoints written on one
    # platform (TPU trainer) load on any other (CPU eval box)
    meta = ckptr.metadata(path).item_metadata
    restore_args = jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta.tree
    )
    restored = ckptr.restore(path, restore_args=restore_args)
    params = restored["params"]
    # targetless restore yields plain dicts; rebuild the normalizer pytree
    n = restored["normalizer"]
    normalizer = EMANormalizerState(mu=n["mu"], var=n["var"], count=n["count"])
    elo = jnp.asarray(restored["elo"])

    if single_policy is not None:
        params = jax.tree_util.tree_map(
            lambda x: x[single_policy : single_policy + 1], params
        )
        elo = elo[single_policy : single_policy + 1]

    num_policies = jax.tree_util.tree_leaves(params)[0].shape[0]
    return params, normalizer, elo, num_policies


class EvalManager:
    """Forward-only rollout manager over a P-policy ensemble with crossplay
    matchmaking (the same static block routing as the trainer)."""

    def __init__(
        self,
        cfg: EnvConfig,
        ecfg: EvalConfig,
        env: Env,
        num_policies: int,
        vs_bot: bool = False,
    ):
        self.cfg = cfg
        self.ecfg = ecfg
        self.env = env
        self.P = num_policies
        # vs_bot: team 1 of every world is driven by the scripted A* bot
        # (policy_idx = aStarPolicyID); win-rate vs the bot is the reference's
        # de-facto e2e learning metric (sim.cpp planAStarAISystem opponents)
        self.vs_bot = vs_bot
        self.model = ActorCriticNet(dtype=ecfg.policy_dtype)

        self.W = ecfg.num_worlds
        self.A = cfg.num_agents
        self.B = self.W * self.A
        self.BP = self.B // self.P

        if vs_bot:
            # world w -> policy (w % P) for every agent, so each ensemble
            # member fields full teams against the scripted bot
            assert self.W % self.P == 0, "num_worlds must divide by P"
            assign = np.repeat(
                (np.arange(self.W) % self.P)[:, None], self.A, axis=1
            ).astype(np.int32)
            flat = assign.reshape(-1)
            perm = np.argsort(flat, kind="stable").astype(np.int32)
            inv_perm = np.argsort(perm, kind="stable").astype(np.int32)
        else:
            tcfg = TrainConfig(
                num_worlds=ecfg.num_worlds, num_train_policies=num_policies
            )
            assign, perm, inv_perm = _static_assignment(cfg, tcfg)
        self.assignment = jnp.asarray(assign)
        self.perm = jnp.asarray(perm)
        self.inv_perm = jnp.asarray(inv_perm)

        self._rollout_chunk = jax.jit(self._rollout_chunk_impl)

    def to_blocks(self, x):
        flat = x.reshape((self.B,) + x.shape[2:])
        return flat[self.perm].reshape((self.P, self.BP) + x.shape[2:])

    def from_blocks(self, x):
        flat = x.reshape((self.B,) + x.shape[2:])
        return flat[self.inv_perm].reshape((self.W, self.A) + x.shape[2:])

    def _apply(self, params, rnn, obs_blocks):
        def one(p, r, o):
            return self.model.apply({"params": p}, r, o, False)

        rnn_by_p = jnp.moveaxis(rnn, 2, 0)
        dists, values, new_rnn = jax.vmap(one)(params, rnn_by_p, obs_blocks)
        return dists, values, jnp.moveaxis(new_rnn, 0, 2)

    def init_state(self):
        from .. import consts

        sim_ctrl = jnp.array([1, 0, 0], jnp.int32)  # eval mode
        env_state, obs = self.env.reset(sim_ctrl=sim_ctrl)
        policy_idx = jnp.broadcast_to(self.assignment, (self.W, self.A))
        if self.vs_bot:
            teams = jnp.arange(self.A) // self.cfg.team_size
            policy_idx = jnp.where(
                teams[None, :] == 1, consts.a_star_policy_id, policy_idx
            )
        env_state = env_state.replace(policy_idx=policy_idx)
        rnn = init_rnn_states((self.P, self.BP))
        return env_state, obs, rnn

    def _policy_obs(self, obs):
        out = {k: obs[k] for k in POLICY_OBS_KEYS}
        # flatten lidar planes exactly like the trainer's rollout buffers
        # (TrainingManager._policy_obs) — the normalizer stats saved in a
        # checkpoint are keyed to the flat [h*w*c] feature axis
        for k in ("fwd_lidar", "rear_lidar"):
            v = out[k]
            out[k] = v.reshape(v.shape[:-3] + (-1,))
        return out

    def _rollout_chunk_impl(
        self, params, normalizer, env_state, obs, rnn, elo, key
    ):
        ecfg = self.ecfg
        sim_ctrl = jnp.array([1, 0, 0], jnp.int32)
        no_reset = jnp.zeros((self.W,), jnp.int32)
        env_step = self.env.step_fn()
        team_policies = self.assignment[:, :: self.cfg.team_size]  # [W, 2]

        def body(carry, step_key):
            env_state, obs, rnn, elo = carry
            obs_blocks = jax.tree_util.tree_map(
                self.to_blocks, self._policy_obs(obs)
            )
            norm_obs = normalize_obs(normalizer, obs_blocks, ecfg.policy_dtype)
            dists, values, rnn2 = self._apply(params, rnn, norm_obs)
            if ecfg.use_deterministic_policy:
                actions = dists.best()
                log_probs = None
            else:
                actions, log_probs = dists.sample(step_key)

            da = self.from_blocks(actions["discrete"])
            aa = self.from_blocks(actions["aim"])
            env_actions = Actions(
                move_amount=da[..., 0],
                move_angle=da[..., 1],
                fire=da[..., 2],
                stand=da[..., 3],
                aim_yaw=aa[..., 0],
                aim_pitch=aa[..., 1],
                aim_yaw_rate=jnp.zeros((self.W, self.A), jnp.float32),
                aim_pitch_rate=jnp.zeros((self.W, self.A), jnp.float32),
            )

            env_state, out = env_step(env_state, env_actions, sim_ctrl, no_reset)

            finished = out["episode_result"]["match_finished"]
            win = out["episode_result"]["win_result"]
            score_a = jnp.where(win == 0, 1.0, jnp.where(win == 1, 0.0, 0.5))
            if not self.vs_bot:
                # crossplay: team 1 is another ensemble policy -> update ELO
                elo = elo_update_masked(
                    elo, team_policies, score_a, finished & (win >= 0)
                )

            done_b = self.to_blocks(out["done"])
            rnn2 = clear_rnn_states(rnn2, done_b != 0)

            logits = jnp.concatenate(
                [
                    dists.discrete.packed_log_probs(),
                    dists.aim.packed_log_probs(),
                ],
                axis=-1,
            )

            step_out = {
                "actions": actions,
                "values": values,
                "rewards": self.to_blocks(out["reward"]),
                "dones": done_b,
                "logits": logits,
                "episode_result": out["episode_result"],
            }
            for k in ("step_log", "snapshot", "game_events"):
                if k in out:
                    step_out[k] = out[k]
            # obs fed to the policy this step (for BC dumps)
            step_out["obs"] = norm_obs
            step_out["rnn_states_pre"] = rnn

            return (env_state, out["obs"], rnn2, elo), step_out

        keys = jax.random.split(key, ecfg.chunk_steps)
        carry, outs = jax.lax.scan(body, (env_state, obs, rnn, elo), keys)
        return carry, outs

    def run(
        self,
        params,
        normalizer,
        elo,
        record_path: Optional[str] = None,
        event_log_dir: Optional[str] = None,
        bc_dump_dir: Optional[str] = None,
        iter_cb: Optional[Callable[[Dict[str, np.ndarray]], None]] = None,
        verbose: bool = True,
    ):
        """Eval rollout (eval_policies, jax_infer.py:272-273). Returns final
        per-policy ELO."""
        ecfg = self.ecfg
        env_state, obs, rnn = self.init_state()
        key = jax.random.PRNGKey(ecfg.seed)

        recorder = bc_files = event_writer = None
        if record_path is not None:
            from ..data.recorder import RecordLogWriter

            recorder = RecordLogWriter(record_path)
        if event_log_dir is not None:
            from ..data.recorder import EventLogWriter

            event_writer = EventLogWriter(event_log_dir)
        if bc_dump_dir is not None:
            os.makedirs(bc_dump_dir, exist_ok=True)
            bc_files = {}

        from .. import consts

        total_swaps = np.zeros((consts.max_zones,), np.int64)
        # vs-bot tallies: per-policy [wins, draws, losses]
        wdl = np.zeros((self.P, 3), np.int64)
        world_policy = np.asarray(self.assignment)[:, 0]  # [W]

        num_chunks = (ecfg.num_eval_steps + ecfg.chunk_steps - 1) // ecfg.chunk_steps
        for ci in range(num_chunks):
            key, sub = jax.random.split(key)
            (env_state, obs, rnn, elo), outs = self._rollout_chunk(
                params, normalizer, env_state, obs, rnn, elo, sub
            )
            outs = jax.device_get(outs)

            # zone-swap accounting at episode ends (jax_infer.py:192-218)
            finished = outs["episode_result"]["match_finished"]  # [T, W]
            zone_stats = outs["episode_result"]["zone_stats"]  # [T, W, Z, 5]
            swaps = np.where(
                finished[..., None, None], zone_stats, 0
            )[..., 0].sum(axis=(0, 1))
            total_swaps += swaps
            if verbose and swaps.sum() > 0:
                print("zone swaps:", total_swaps)

            if self.vs_bot:
                win = outs["episode_result"]["win_result"]  # [T, W]
                done = np.asarray(finished) & (np.asarray(win) >= 0)
                for outcome, col in ((0, 0), (2, 1), (1, 2)):
                    m = done & (np.asarray(win) == outcome)
                    np.add.at(wdl[:, col], world_policy[m.nonzero()[1]], 1)

            T = finished.shape[0]
            for t in range(T):
                if recorder is not None:
                    recorder.append(
                        jax.tree_util.tree_map(lambda x: x[t], outs["step_log"])
                    )
                if event_writer is not None:
                    event_writer.append(
                        jax.tree_util.tree_map(lambda x: x[t], outs["snapshot"]),
                        jax.tree_util.tree_map(
                            lambda x: x[t], outs["game_events"]
                        ),
                    )
                if bc_dump_dir is not None:
                    self._dump_bc(bc_files, bc_dump_dir, outs, t)

            if iter_cb is not None:
                iter_cb(outs)

        for f in (bc_files or {}).values():
            f.close()
        if recorder is not None:
            recorder.close()
        if event_writer is not None:
            event_writer.close()

        if self.vs_bot:
            self.vs_bot_wdl = wdl
            if verbose:
                for p in range(self.P):
                    w, d, l = wdl[p]
                    n = max(w + d + l, 1)
                    print(
                        f"policy {p} vs bot: {w}W/{d}D/{l}L "
                        f"win-rate {w / n:.1%} over {w + d + l} matches"
                    )

        return elo

    def _dump_bc(self, files, dump_dir, outs, t):
        """BC dataset dump (dump_for_bc_cb, jax_infer.py:175-191): one raw
        file per obs key + actions/action_logits/rewards/rnn_states, plus a
        'shapes' JSON (the metadata file filter_bc_train reads,
        filter_bc_train.py:92-96)."""

        def write(name, arr):
            if name not in files:
                files[name] = open(os.path.join(dump_dir, name), "wb")
            np.asarray(arr).tofile(files[name])

        if "__shapes__" not in files:
            import json

            meta = {
                "obs": {
                    k: list(np.asarray(v[t]).shape)
                    for k, v in outs["obs"].items()
                },
                "actions": list(
                    np.asarray(outs["actions"]["discrete"][t]).shape[:-1]
                )
                + [
                    outs["actions"]["discrete"][t].shape[-1]
                    + outs["actions"]["aim"][t].shape[-1]
                ],
                "action_logits": list(np.asarray(outs["logits"][t]).shape),
                "rewards": list(np.asarray(outs["rewards"][t]).shape),
                "rnn_states": list(
                    np.asarray(outs["rnn_states_pre"][t]).shape
                ),
            }
            with open(os.path.join(dump_dir, "shapes"), "w") as f:
                json.dump(meta, f)
            files["__shapes__"] = open(os.devnull, "wb")

        for k, v in outs["obs"].items():
            write(k, v[t])
        acts = np.concatenate(
            [outs["actions"]["discrete"][t], outs["actions"]["aim"][t]],
            axis=-1,
        )
        write("actions", acts)
        write("action_logits", outs["logits"][t])
        write("rewards", outs["rewards"][t])
        write("rnn_states", outs["rnn_states_pre"][t])


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--num-worlds", type=int, required=True)
    ap.add_argument("--num-steps", type=int, default=200)
    ap.add_argument("--single-policy", type=int, default=None)
    ap.add_argument("--crossplay", action="store_true")
    ap.add_argument("--vs-bot", action="store_true",
                    help="team 1 = scripted A* bot; report per-policy "
                         "win-rate (the de-facto e2e learning metric)")
    ap.add_argument("--game-mode", type=str, default="Zone")
    ap.add_argument("--scene", type=str, default=None)
    ap.add_argument("--ckpt-path", type=str, required=True)
    ap.add_argument("--record", type=str, default=None)
    ap.add_argument("--event-log", type=str, default=None)
    ap.add_argument("--bc-dump-dir", type=str, default=None)
    ap.add_argument("--team-size", type=int, default=6)
    ap.add_argument("--fp16", action="store_true")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ..config import SimFlags, Task
    from .elo import print_elos

    dtype = (
        jnp.float16
        if args.fp16
        else jnp.bfloat16 if args.bf16 else jnp.float32
    )

    params, normalizer, elo, num_policies = eval_load_ckpt(
        args.ckpt_path, single_policy=args.single_policy
    )
    print(num_policies)

    game_mode = getattr(Task, args.game_mode)
    sim_flags = SimFlags.SimEvalMode
    if game_mode == Task.ZoneCaptureDefend:
        sim_flags |= SimFlags.HardcodedSpawns

    cfg = EnvConfig(
        task=game_mode, sim_flags=sim_flags, team_size=args.team_size
    )
    scene = args.scene or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "data",
        "simple_map",
    )
    collect = args.record is not None or args.event_log is not None
    env = Env(
        cfg,
        scene,
        num_worlds=args.num_worlds,
        seed=10,
        collect_log=collect,
    )
    ecfg = EvalConfig(
        num_worlds=args.num_worlds,
        num_eval_steps=args.num_steps,
        policy_dtype=dtype,
    )
    mgr = EvalManager(cfg, ecfg, env, num_policies, vs_bot=args.vs_bot)

    print_elos(np.asarray(elo))
    elo = mgr.run(
        params,
        normalizer,
        elo,
        record_path=args.record,
        event_log_dir=args.event_log,
        bc_dump_dir=args.bc_dump_dir,
    )
    print_elos(np.asarray(elo))


if __name__ == "__main__":
    main()
