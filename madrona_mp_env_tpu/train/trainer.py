"""Fused actor-learner.

The TPU-native equivalent of madrona_learn's TrainingManager (SURVEY.md
§2.12): rollout (policy apply + env step in one lax.scan), GAE, and
recurrent PPO epochs all inside ONE jitted update — the reference's
per-step XLA<->CUDA custom-call boundary (SURVEY.md §3.1 "device boundary
#2") does not exist here.

PBT ensemble: E train policies with stacked params; actors are routed to
policies by a STATIC block permutation (world/team round-robin matchmaking,
cross-play between ensemble members like the reference's
cross_play_portion=1.0, jax_train.py:146-156). Static routing keeps the
whole update free of gathers on the policy axis.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from .. import consts
from ..config import EnvConfig
from ..sim.env import Env
from ..sim.types import Actions, WorldState
from .normalizer import (
    EMANormalizerState,
    init_normalizer,
    normalize_obs,
    update_normalizer,
)
from .policy import ActorCriticNet, clear_rnn_states, init_rnn_states
from .ppo import PPOConfig, compute_gae, ppo_loss

# observation keys fed to the policy (the rest of the env obs dict is
# train-time metadata)
POLICY_OBS_KEYS = (
    "self",
    "self_pos",
    "teammates",
    "teammate_positions",
    "opponents",
    "opponent_positions",
    "opponents_last_known",
    "opponent_last_known_positions",
    "opponent_masks",
    "fwd_lidar",
    "rear_lidar",
    "filters_state",
    "reward_coefs",
)


@dataclass(frozen=True)
class TrainConfig:
    """Mirror of the reference TrainConfig (jax_train.py:245-284)."""

    num_worlds: int = 512
    steps_per_update: int = 40
    num_bptt_chunks: int = 4
    lr: float = 1e-4
    gamma: float = 0.998
    gae_lambda: float = 0.95
    ppo: PPOConfig = field(default_factory=PPOConfig)
    num_train_policies: int = 1  # PBT ensemble size
    pbt: Optional["PBTConfig"] = None  # full PBT config (portions, past)
    lr_explore: Optional["ParamExplore"] = None  # per-policy lr exploration
    compute_dtype: Any = jnp.float32
    seed: int = 5
    metrics_buffer_size: int = 5

    @property
    def chunk_len(self) -> int:
        assert self.steps_per_update % self.num_bptt_chunks == 0
        return self.steps_per_update // self.num_bptt_chunks


@struct.dataclass
class TrainState:
    params: Any  # stacked [E, ...]
    opt_state: Any  # stacked [E, ...]
    normalizer: EMANormalizerState
    env_state: WorldState  # batched [W, ...]
    cur_obs: Dict[str, jax.Array]  # full obs [W, A, ...]
    rnn_states: jax.Array  # [2, 2, E, B_train/E, H]
    past_rnn_states: jax.Array  # [2, 2, P, B_past/P, H] (P may be 0)
    key: jax.Array
    update_idx: jax.Array
    elo: jax.Array  # [E + P] per-slot rating
    hyper_params: Dict[str, jax.Array]  # per-train-policy, e.g. {"lr": [E]}
    past_params: Any  # stacked [P, ...] frozen history (empty pytree if P=0)
    past_ptr: jax.Array  # next history slot to overwrite
    # dynamic matchmaking (resample_matchmaking; reference re-samples
    # world->policy assignments via the policy_assignments tensor,
    # mgr.cpp:2042-2050): runtime routing tables with STATIC shapes
    assignment: jax.Array  # [W, A] i32 policy slot per actor
    train_perm: jax.Array  # [E, BEt] i32 flat-actor indices per train block
    past_perm: jax.Array  # [P, BPp] i32
    pending_reset: jax.Array  # bool: force-reset all worlds on next rollout


def _static_assignment(cfg: EnvConfig, tcfg: TrainConfig):
    """actor -> policy assignment + block permutation (static numpy).

    (world w, team t) -> policy (2w + t) % E: every pair of ensemble
    members meets (cross-play), counts are exactly equal when E | 2W.
    """
    W, A, ts = tcfg.num_worlds, cfg.num_agents, cfg.team_size
    E = tcfg.num_train_policies
    assert (2 * W) % max(E, 1) == 0, "num_train_policies must divide 2*num_worlds"
    w = np.arange(W)[:, None]
    team = np.arange(A)[None, :] // ts
    assign = ((2 * w + team) % E).astype(np.int32)  # [W, A]
    flat = assign.reshape(-1)
    perm = np.argsort(flat, kind="stable").astype(np.int32)
    inv_perm = np.argsort(perm, kind="stable").astype(np.int32)
    return assign, perm, inv_perm


def _slot_permutations(assign: np.ndarray, E: int, P: int):
    """Split the flat actor axis into equal-size train blocks [E, BEt] and
    past blocks [P, BPp] from a slot-id table (slots [0,E) train,
    [E,E+P) past)."""
    flat = assign.reshape(-1)
    train_idx = []
    for e in range(E):
        (idx,) = np.nonzero(flat == e)
        train_idx.append(idx)
    sizes = {len(i) for i in train_idx}
    assert len(sizes) == 1, f"unequal train-slot actor counts: {sizes}"
    train_perm = np.stack(train_idx).astype(np.int32)  # [E, BEt]

    past_perm = np.zeros((P, 0), np.int32)
    if P > 0:
        past_idx = []
        for p in range(P):
            (idx,) = np.nonzero(flat == E + p)
            past_idx.append(idx)
        sizes = {len(i) for i in past_idx}
        assert len(sizes) == 1, f"unequal past-slot actor counts: {sizes}"
        past_perm = np.stack(past_idx).astype(np.int32)
    return train_perm, past_perm


class TrainingManager:
    """Holds the static pieces (env, model, optimizer, permutations) and
    exposes pure jitted update functions over TrainState."""

    def __init__(self, cfg: EnvConfig, tcfg: TrainConfig, env: Env):
        from .pbt import PBTConfig, make_matchmaking

        self.cfg = cfg
        self.tcfg = tcfg
        self.env = env
        self.model = ActorCriticNet(dtype=tcfg.compute_dtype)
        # per-policy lr is applied as a final per-policy scale so PBT can
        # explore it (ParamExplore on lr, jax_train.py:227-232)
        self.tx = optax.chain(
            optax.clip_by_global_norm(tcfg.ppo.max_grad_norm),
            optax.scale_by_adam(),
            optax.scale(-1.0),
        )

        self.W = tcfg.num_worlds
        self.A = cfg.num_agents
        self.B = self.W * self.A
        self.E = tcfg.num_train_policies

        self.pbt = tcfg.pbt or PBTConfig(
            num_train_policies=self.E,
            num_past_policies=0,
            cross_play_portion=1.0,
        )
        assert self.pbt.num_train_policies == self.E
        self.P = self.pbt.num_past_policies

        assign, _ = make_matchmaking(self.W, self.A, cfg.team_size, self.pbt)
        train_perm, past_perm = _slot_permutations(assign, self.E, self.P)
        self.assignment0 = jnp.asarray(assign)
        self.train_perm0 = jnp.asarray(train_perm)  # [E, BEt]
        self.past_perm0 = jnp.asarray(past_perm)  # [P, BPp]
        self.BE = train_perm.shape[1]
        self.BPp = past_perm.shape[1] if self.P > 0 else 0
        # P past slots with zero assigned actors (past_play_portion == 0)
        # means the history exists but never acts — skip the past apply
        # path entirely (zero-size blocks would break the policy net)
        self.has_past = self.P > 0 and self.BPp > 0
        # the multiset of per-team policy slots (exact per-slot counts) —
        # dynamic matchmaking permutes this list to re-pair teams while
        # keeping every block shape static
        self.team_slots_base = jnp.asarray(
            assign[:, :: cfg.team_size].reshape(-1)
        )  # [2W]

        # the update owns the TrainState lifetime: donating it halves peak
        # memory (no second TrainState residency across the update)
        self._update_fn = jax.jit(self._update_impl, donate_argnums=0)
        self._update_loop_fn = {}
        self._update_population_fn = jax.jit(self._update_population_impl)
        self._store_past_fn = jax.jit(self._store_past_impl)
        self._resample_fn = jax.jit(self._resample_matchmaking_impl)
        self._eval_elo_fn = {}

    # -------------------------------------------------- block reshaping
    def _identity_blocks(self) -> bool:
        """One train policy and no past ring: every actor belongs to block
        0 in index order whatever the matchmaking permutation does, so the
        block split is a pure reshape — skips a gather (to) and a
        zeros+scatter (from) per leaf per rollout step."""
        return self.E == 1 and not self.has_past

    def to_blocks(self, x, train_perm=None):
        """[W, A, ...] -> train blocks [E, BEt, ...]."""
        if self._identity_blocks():
            return x.reshape((1, self.B) + x.shape[2:])
        perm = self.train_perm0 if train_perm is None else train_perm
        flat = x.reshape((self.B,) + x.shape[2:])
        return flat[perm]

    def to_past_blocks(self, x, past_perm=None):
        perm = self.past_perm0 if past_perm is None else past_perm
        flat = x.reshape((self.B,) + x.shape[2:])
        return flat[perm]

    def from_blocks(self, train_b, past_b=None, train_perm=None,
                    past_perm=None):
        """Scatter train (+ past) blocks back to [W, A, ...]."""
        tail = train_b.shape[2:]
        if self._identity_blocks():
            return train_b.reshape((self.W, self.A) + tail)
        tperm = self.train_perm0 if train_perm is None else train_perm
        pperm = self.past_perm0 if past_perm is None else past_perm
        flat = jnp.zeros((self.B,) + tail, train_b.dtype)
        flat = flat.at[tperm].set(train_b)
        if past_b is not None and self.has_past:
            flat = flat.at[pperm].set(past_b)
        return flat.reshape((self.W, self.A) + tail)

    def _policy_obs(self, obs):
        out = {k: obs[k] for k in POLICY_OBS_KEYS}
        # store lidar FLAT in the rollout buffers: the policy flattens the
        # [h, w, c] planes anyway, and scan-stacked [..., h, w, 4] buffers
        # pad the 4-wide minor dim to 128 lanes on TPU (6.4x HBM blowup —
        # an 8192-world rollout would not fit otherwise)
        for k in ("fwd_lidar", "rear_lidar"):
            v = out[k]
            out[k] = v.reshape(v.shape[:-3] + (-1,))
        return out

    # ---------------------------------------------- packed rollout buffers
    # The rollout stores each step's (normalized) policy obs as ONE packed
    # [E, BE, F] array instead of 13 dict leaves: the whole T-step rollout
    # then lives in a single scan-stacked buffer that PPO minibatches gather
    # from directly — no per-leaf relayout pass and no second copy of the
    # rollout data (the round-4 unitize+concat pipeline held 2x the obs
    # data and OOMed at 4096 worlds; VERDICT r4 item 1).
    def _pack_obs(self, obs):
        """dict of [E, BE, *tail] -> ([E, BE, F], slots). slots is static."""
        parts = []
        slots = []
        start = 0
        for k in POLICY_OBS_KEYS:
            v = obs[k]
            tail = v.shape[2:]
            f = int(np.prod(tail)) if tail else 1
            parts.append(v.reshape(v.shape[:2] + (f,)))
            slots.append((k, start, start + f, tail))
            start += f
        return jnp.concatenate(parts, axis=-1), slots

    @staticmethod
    def _unpack_obs(packed, slots):
        """[..., F] -> dict of [..., *tail] column views (fused into
        consumers by XLA; no materialized copies)."""
        out = {}
        for k, s, e, tail in slots:
            v = packed[..., s:e]
            out[k] = v.reshape(v.shape[:-1] + tail)
        return out

    # -------------------------------------------------- init
    def init(self, seed: Optional[int] = None) -> TrainState:
        seed = self.tcfg.seed if seed is None else seed
        key = jax.random.PRNGKey(seed)
        k_param, k_state, k_hp = jax.random.split(key, 3)

        env_state, obs = self.env.reset(sim_ctrl=jnp.array([0, 1, 1], jnp.int32))
        pobs = self._policy_obs(obs)
        obs_blocks = jax.tree_util.tree_map(self.to_blocks, pobs)

        sample_obs = jax.tree_util.tree_map(lambda x: x[0, :2], obs_blocks)
        sample_rnn = init_rnn_states((2,))

        def init_one(k):
            return self.model.init(k, sample_rnn, sample_obs, False)["params"]

        params = jax.vmap(init_one)(jax.random.split(k_param, self.E))
        opt_state = jax.vmap(self.tx.init)(params)

        normalizer = init_normalizer(
            jax.tree_util.tree_map(lambda x: x[0], obs_blocks)
        )

        # policy_idx per world is the assignment table (>= 0, so no agent
        # routes to the scripted bot during training)
        # + 0: policy_idx must not alias ts.assignment (update donation
        # rejects duplicate buffers among the donated arguments)
        env_state = env_state.replace(
            policy_idx=jnp.broadcast_to(
                self.assignment0, (self.W, self.A)
            ) + 0
        )

        # per-policy hyperparams (explored by PBT)
        if self.tcfg.lr_explore is not None:
            lr0 = self.tcfg.lr_explore.init_values(k_hp, self.E)
        else:
            lr0 = jnp.full((self.E,), self.tcfg.lr, jnp.float32)

        # past-policy history starts as copies of the train policies
        if self.P > 0:
            src = jnp.arange(self.P) % self.E
            past_params = jax.tree_util.tree_map(lambda x: x[src], params)
        else:
            past_params = jax.tree_util.tree_map(lambda x: x[:0], params)

        return TrainState(
            params=params,
            opt_state=opt_state,
            normalizer=normalizer,
            env_state=env_state,
            cur_obs=pobs,
            rnn_states=init_rnn_states((self.E, self.BE)),
            past_rnn_states=init_rnn_states((self.P, self.BPp)),
            key=k_state,
            update_idx=jnp.zeros((), jnp.int32),
            elo=jnp.full((self.E + self.P,), 1000.0, jnp.float32),
            hyper_params={"lr": lr0},
            past_params=past_params,
            past_ptr=jnp.zeros((), jnp.int32),
            # + 0: own buffers — the update DONATES the whole TrainState,
            # which would otherwise delete the manager's shared constants
            assignment=self.assignment0 + 0,
            train_perm=self.train_perm0 + 0,
            past_perm=self.past_perm0 + 0,
            pending_reset=jnp.zeros((), bool),
        )

    # -------------------------------------------------- policy apply
    def _apply_blocks(self, params, rnn_states, obs_blocks):
        """vmap the policy over the ensemble axis.
        rnn_states: [2, 2, E, BE, H]; obs_blocks leaves: [E, BE, ...]."""

        def one(p, rnn, obs):
            return self.model.apply({"params": p}, rnn, obs, False)

        rnn_by_e = jnp.moveaxis(rnn_states, 2, 0)  # [E, 2, 2, BE, H]
        dists, values, new_rnn = jax.vmap(one)(params, rnn_by_e, obs_blocks)
        return dists, values, jnp.moveaxis(new_rnn, 0, 2)

    # -------------------------------------------------- rollout
    def _rollout(self, ts: TrainState):
        tcfg = self.tcfg
        sim_ctrl = jnp.array([0, 1, 1], jnp.int32)
        env_step = self.env.step_fn()
        has_past = self.has_past
        tperm, pperm = ts.train_perm, ts.past_perm

        def step_body(carry, xs):
            step_key, force_reset = xs
            env_state, obs, rnn, past_rnn, norm = carry
            k_train, k_past = jax.random.split(step_key)

            obs_blocks = jax.tree_util.tree_map(
                lambda x: self.to_blocks(x, tperm), obs
            )
            norm_obs = normalize_obs(norm, obs_blocks, tcfg.compute_dtype)
            dists, values, rnn2 = self._apply_blocks(ts.params, rnn, norm_obs)
            actions, log_probs = dists.sample(k_train)

            # past (frozen) policies act but never learn
            past_actions = None
            if has_past:
                past_obs = jax.tree_util.tree_map(
                    lambda x: self.to_past_blocks(x, pperm), obs
                )
                past_norm = normalize_obs(norm, past_obs, tcfg.compute_dtype)
                pdists, _pv, past_rnn2 = self._apply_blocks(
                    ts.past_params, past_rnn, past_norm
                )
                past_actions, _ = pdists.sample(k_past)
            else:
                past_rnn2 = past_rnn

            # blocks -> env action struct
            da = self.from_blocks(
                actions["discrete"],
                past_actions["discrete"] if has_past else None,
                tperm, pperm,
            )
            aa = self.from_blocks(
                actions["aim"], past_actions["aim"] if has_past else None,
                tperm, pperm,
            )
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

            env_state, out = env_step(
                env_state, env_actions, sim_ctrl, force_reset
            )

            reward_b = self.to_blocks(out["reward"], tperm)
            done_b = self.to_blocks(out["done"], tperm)
            rnn2 = clear_rnn_states(rnn2, done_b != 0)
            if has_past:
                past_rnn2 = clear_rnn_states(
                    past_rnn2, self.to_past_blocks(out["done"], pperm) != 0
                )

            next_obs = self._policy_obs(out["obs"])
            norm = update_normalizer(norm, obs_blocks)

            obs_pack, slots = self._pack_obs(norm_obs)
            self._obs_slots = slots  # static, identical every trace
            outputs = {
                "obs_pack": obs_pack,  # [E, BE, F] compute dtype
                "act_pack": jnp.concatenate(
                    [actions["discrete"], actions["aim"]], axis=-1
                ),  # [E, BE, 6] i32
                "log_probs": log_probs,
                "values": values,
                "rewards": reward_b,
                "dones": done_b,
                "win_result": out["episode_result"]["win_result"],
                "match_finished": out["episode_result"]["match_finished"],
            }
            return (env_state, next_obs, rnn2, past_rnn2, norm), outputs

        def chunk_body(carry, xs):
            # BPTT restart states are stored in the compute dtype: the loss
            # casts them there anyway, and f32 starts at 8192 worlds are
            # 3.2 GB of HBM for no numeric effect (bf16(f32(bf16 x)) == x)
            rnn_start = carry[2].astype(tcfg.compute_dtype)
            carry, outs = jax.lax.scan(step_body, carry, xs)
            return carry, (rnn_start, outs)

        key, sub = jax.random.split(ts.key)
        T = tcfg.num_bptt_chunks * tcfg.chunk_len
        step_keys = jax.random.split(sub, T).reshape(
            (tcfg.num_bptt_chunks, tcfg.chunk_len) + sub.shape
        )
        # dynamic-matchmaking rotation forces a full reset on the first step
        force_resets = jnp.zeros((T, self.W), jnp.int32)
        force_resets = force_resets.at[0].set(
            jnp.where(ts.pending_reset, 1, 0)
        )
        force_resets = force_resets.reshape(
            (tcfg.num_bptt_chunks, tcfg.chunk_len, self.W)
        )

        carry0 = (
            ts.env_state,
            ts.cur_obs,
            ts.rnn_states,
            ts.past_rnn_states,
            ts.normalizer,
        )
        carry, (rnn_starts, outs) = jax.lax.scan(
            chunk_body, carry0, (step_keys, force_resets)
        )
        env_state, final_obs, final_rnn, final_past_rnn, normalizer = carry

        # bootstrap value from the final observation
        final_blocks = jax.tree_util.tree_map(
            lambda x: self.to_blocks(x, tperm), final_obs
        )
        final_norm_obs = normalize_obs(
            normalizer, final_blocks, tcfg.compute_dtype
        )
        _, bootstrap_value, _ = self._apply_blocks(
            ts.params, final_rnn, final_norm_obs
        )

        ts = ts.replace(
            env_state=env_state,
            cur_obs=final_obs,
            rnn_states=final_rnn,
            past_rnn_states=final_past_rnn,
            normalizer=normalizer,
            key=key,
            pending_reset=jnp.zeros((), bool),
        )
        return ts, rnn_starts, outs, bootstrap_value

    # -------------------------------------------------- ppo update
    def _ppo_update(self, ts: TrainState, rnn_starts, outs, bootstrap_value):
        tcfg = self.tcfg
        pcfg = tcfg.ppo
        K, L, E, BE = (
            tcfg.num_bptt_chunks,
            tcfg.chunk_len,
            self.E,
            self.BE,
        )

        # GAE over full T = K*L (merge chunk/time axes)
        def t_merge(x):
            return x.reshape((K * L,) + x.shape[2:])

        values = t_merge(outs["values"])  # [T, E, BE]
        rewards = t_merge(outs["rewards"])
        dones = t_merge(outs["dones"])

        adv, ret = compute_gae(
            rewards.reshape(K * L, -1),
            values.reshape(K * L, -1),
            dones.reshape(K * L, -1),
            bootstrap_value.reshape(-1),
            tcfg.gamma,
            tcfg.gae_lambda,
        )
        adv = adv.reshape(K, L, E, BE)
        ret = ret.reshape(K, L, E, BE)

        # Minibatch units are (chunk k, actor b) length-L sequences. They
        # are gathered DIRECTLY from the time-major scan-stacked rollout
        # buffers — the round-4 unit-major relayout (moveaxis+swapaxes+
        # concat per leaf) held a second full copy of the rollout in HBM
        # (OOM at 4096 worlds) and cost a full extra HBM round trip. With
        # the obs packed into one [K, L, E, BE, F] buffer, each unit's
        # gather row is F wide (~2 KB), so the gather runs at HBM bandwidth
        # (the round-4 pathology was 40-BYTE rows: 17 narrow per-leaf
        # gathers lowering to serial row sweeps).
        obs_buf = outs["obs_pack"]  # [K, L, E, BE, F] compute dtype
        act_buf = outs["act_pack"]  # [K, L, E, BE, 6] i32
        # f32 per-step scalars packed once: values, dones, adv, ret,
        # log_probs (discrete, aim) -> [K, L, E, BE, 6]
        scal_buf = jnp.stack(
            [
                outs["values"],
                outs["dones"].astype(jnp.float32),
                adv,
                ret,
                outs["log_probs"]["discrete"],
                outs["log_probs"]["aim"],
            ],
            axis=-1,
        )
        rnn_buf = rnn_starts  # [K, 2, 2, E, BE, H] compute dtype

        obs_slots = self._obs_slots

        def gather_batch(idx):
            """idx [E, mb] of unit ids (k * BE + b) -> minibatch dict with
            TIME-MAJOR [E, L, mb, ...] leaves, gathered in 4 fused gathers
            (obs/actions/scalars/rnn) straight from the rollout buffers."""
            k = idx // BE  # [E, mb]
            b = idx % BE
            kk = k[:, None, :]  # [E, 1, mb]
            bb = b[:, None, :]
            ll = jnp.arange(L)[None, :, None]
            ee = jnp.arange(E)[:, None, None]
            obs_mb = obs_buf[kk, ll, ee, bb]  # [E, L, mb, F]
            act_mb = act_buf[kk, ll, ee, bb]  # [E, L, mb, 6]
            scal_mb = scal_buf[kk, ll, ee, bb]  # [E, L, mb, 6]
            # rnn_buf [K, 2, 2, E, BE, H]: advanced indices (k, e, b) are
            # non-adjacent so the indexed axes land in FRONT -> [E, mb,
            # 2, 2, H]
            rnn_mb = rnn_buf[k, :, :, jnp.arange(E)[:, None], b]
            return {
                "obs_pack": obs_mb,
                "act": act_mb,
                "scal": scal_mb,
                "rnn": rnn_mb,
            }

        num_units = K * BE
        assert num_units % pcfg.num_minibatches == 0
        mb = num_units // pcfg.num_minibatches

        def loss_fn(params, batch):
            # batch leaves arrive TIME-MAJOR [L, mb, ...] straight from
            # gather_batch (vmapped over the policy axis).
            # (NOTE: pre-casting the param tree to bf16 here was measured
            # SLOWER on v5e — +53 ms/update — the backward's per-param
            # convert-grads cost more than flax's per-layer promotes save.)
            rnn_start = jnp.moveaxis(batch["rnn"], 0, 2)  # [2, 2, mb, H]
            obs = self._unpack_obs(batch["obs_pack"], obs_slots)
            actions = {
                "discrete": batch["act"][..., :4],
                "aim": batch["act"][..., 4:6],
            }
            scal = batch["scal"]
            dones_mb = scal[..., 1]

            new_lp, ent, new_v = self.model.apply(
                {"params": params},
                rnn_start,
                dones_mb,
                obs,
                actions,
                method=ActorCriticNet.sequence,
            )
            return ppo_loss(
                new_lp,
                ent,
                new_v,
                {"discrete": scal[..., 4], "aim": scal[..., 5]},
                scal[..., 0],
                scal[..., 2],
                scal[..., 3],
                pcfg,
            )

        grad_fn = jax.grad(loss_fn, has_aux=True)

        def epoch_body(carry, epoch_key):
            params, opt_state = carry
            order = jax.vmap(
                lambda k: jax.random.permutation(k, num_units)
            )(jax.random.split(epoch_key, E))  # [E, num_units]

            def mb_body(carry, mb_idx):
                params, opt_state = carry
                idx = jax.lax.dynamic_slice_in_dim(
                    order, mb_idx * mb, mb, axis=1
                )  # [E, mb]
                batch = gather_batch(idx)

                def update_one(p, os, b, lr):
                    grads, metrics = grad_fn(p, b)
                    updates, os = self.tx.update(grads, os, p)
                    # per-policy learning rate (PBT-explorable)
                    updates = jax.tree_util.tree_map(
                        lambda u: u * lr, updates
                    )
                    p = optax.apply_updates(p, updates)
                    return p, os, metrics

                params, opt_state, metrics = jax.vmap(update_one)(
                    params, opt_state,
                    jax.tree_util.tree_map(lambda x: x, batch),
                    ts.hyper_params["lr"],
                )
                return (params, opt_state), metrics

            (params, opt_state), metrics = jax.lax.scan(
                mb_body, (params, opt_state), jnp.arange(pcfg.num_minibatches)
            )
            return (params, opt_state), metrics

        key, sub = jax.random.split(ts.key)
        (params, opt_state), metrics = jax.lax.scan(
            epoch_body,
            (ts.params, ts.opt_state),
            jax.random.split(sub, pcfg.num_epochs),
        )

        metrics = jax.tree_util.tree_map(
            lambda x: jnp.mean(x, axis=(0, 1)), metrics
        )  # [E]
        ts = ts.replace(params=params, opt_state=opt_state, key=key)
        return ts, metrics

    # -------------------------------------------------- full update
    def _update_impl(self, ts: TrainState):
        ts, rnn_starts, outs, bootstrap_value = self._rollout(ts)
        ts, metrics = self._ppo_update(ts, rnn_starts, outs, bootstrap_value)

        metrics = dict(metrics)
        metrics["reward_mean"] = jnp.mean(outs["rewards"])
        metrics["value_mean"] = jnp.mean(outs["values"])
        finished = outs["match_finished"]
        metrics["episodes_finished"] = jnp.sum(finished.astype(jnp.int32))

        # per-finished-match ELO bookkeeping between ensemble members
        # (eval_elo equivalent tracked online from training matches)
        from .elo import elo_update_masked

        team_policies = ts.assignment[:, :: self.cfg.team_size]  # [W, 2]
        n = finished.size
        pairs = jnp.broadcast_to(
            team_policies[None, None], finished.shape + (2,)
        ).reshape(n, 2)
        win = outs["win_result"].reshape(n)
        score_a = jnp.where(win == 0, 1.0, jnp.where(win == 1, 0.0, 0.5))
        elo = elo_update_masked(
            ts.elo, pairs, score_a, finished.reshape(n) & (win >= 0)
        )
        metrics["elo"] = elo

        ts = ts.replace(update_idx=ts.update_idx + 1, elo=elo)
        return ts, metrics

    def update_iter(self, ts: TrainState):
        return self._update_fn(ts)

    def update_loop(self, ts: TrainState, num_updates: int):
        """Run ``num_updates`` fused updates in ONE jitted scan, returning
        stacked per-update metrics (leaves [num_updates, ...]) — every
        update's row is captured for logging (the reference's buffered
        io_callback metrics, jax_train.py:343-361)."""
        if num_updates not in self._update_loop_fn:

            def loop(ts):
                def body(ts, _):
                    ts, metrics = self._update_impl(ts)
                    return ts, metrics

                return jax.lax.scan(body, ts, None, length=num_updates)

            self._update_loop_fn[num_updates] = jax.jit(
                loop, donate_argnums=0
            )
        return self._update_loop_fn[num_updates](ts)

    # ------------------------------------------- dynamic matchmaking
    def _resample_matchmaking_impl(self, ts: TrainState):
        """Re-pair teams for the next episodes: permute the per-team policy
        slot multiset (exact per-slot counts preserved, so every block shape
        stays static), rebuild the routing tables, clear recurrent state and
        force a full reset. The reference re-samples world->policy
        assignments through the policy_assignments tensor
        (mgr.cpp:2042-2050; portions in jax_train.py:146-216)."""
        key, sub = jax.random.split(ts.key)
        team_slots = self.team_slots_base[
            jax.random.permutation(sub, 2 * self.W)
        ]  # [2W]
        ts_size = self.cfg.team_size
        assignment = jnp.repeat(
            team_slots.reshape(self.W, 2), ts_size, axis=1
        )  # [W, A]
        flat = assignment.reshape(-1)
        order = jnp.argsort(flat, stable=True).astype(jnp.int32)
        train_perm = order[: self.E * self.BE].reshape(self.E, self.BE)
        past_perm = order[self.E * self.BE :].reshape(
            max(self.P, 1), -1
        )[: self.P, : self.BPp]
        if self.P == 0:
            past_perm = ts.past_perm

        env_state = ts.env_state.replace(policy_idx=assignment + 0)
        return ts.replace(
            env_state=env_state,
            assignment=assignment,
            train_perm=train_perm,
            past_perm=past_perm,
            rnn_states=init_rnn_states((self.E, self.BE)),
            past_rnn_states=init_rnn_states((self.P, self.BPp)),
            pending_reset=jnp.ones((), bool),
            key=key,
        )

    def resample_matchmaking(self, ts: TrainState) -> TrainState:
        return self._resample_fn(ts)

    # ------------------------------------------- deterministic eval ELO
    def _eval_elo_impl(self, ts: TrainState, num_steps: int):
        """ELO from DETERMINISTIC eval matches (argmax actions, eval-mode
        sim control), not exploration rollouts — the reference's eval_elo
        (jax_train.py:363-371). Fresh eval episodes on a scratch copy of
        the env state; training state is untouched except ts.elo."""
        sim_ctrl = jnp.array([1, 0, 0], jnp.int32)
        env_step = self.env.step_fn()
        has_past = self.has_past
        tperm, pperm = ts.train_perm, ts.past_perm

        def step_body(carry, force_reset):
            env_state, obs, rnn, past_rnn = carry
            obs_blocks = jax.tree_util.tree_map(
                lambda x: self.to_blocks(x, tperm), obs
            )
            norm_obs = normalize_obs(
                ts.normalizer, obs_blocks, self.tcfg.compute_dtype
            )
            dists, _v, rnn2 = self._apply_blocks(ts.params, rnn, norm_obs)
            actions = dists.best()

            past_actions = None
            if has_past:
                past_obs = jax.tree_util.tree_map(
                    lambda x: self.to_past_blocks(x, pperm), obs
                )
                past_norm = normalize_obs(
                    ts.normalizer, past_obs, self.tcfg.compute_dtype
                )
                pdists, _pv, past_rnn2 = self._apply_blocks(
                    ts.past_params, past_rnn, past_norm
                )
                past_actions = pdists.best()
            else:
                past_rnn2 = past_rnn

            da = self.from_blocks(
                actions["discrete"],
                past_actions["discrete"] if has_past else None,
                tperm, pperm,
            )
            aa = self.from_blocks(
                actions["aim"], past_actions["aim"] if has_past else None,
                tperm, pperm,
            )
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
            env_state, out = env_step(
                env_state, env_actions, sim_ctrl, force_reset
            )
            done_b = self.to_blocks(out["done"], tperm)
            rnn2 = clear_rnn_states(rnn2, done_b != 0)
            if has_past:
                past_rnn2 = clear_rnn_states(
                    past_rnn2, self.to_past_blocks(out["done"], pperm) != 0
                )
            return (
                (env_state, self._policy_obs(out["obs"]), rnn2, past_rnn2),
                (
                    out["episode_result"]["win_result"],
                    out["episode_result"]["match_finished"],
                ),
            )

        # fresh eval episodes (forced reset on step 0)
        force = jnp.zeros((num_steps, self.W), jnp.int32).at[0].set(1)
        carry0 = (
            ts.env_state,
            ts.cur_obs,
            init_rnn_states((self.E, self.BE)),
            init_rnn_states((self.P, self.BPp)),
        )
        _, (win, finished) = jax.lax.scan(step_body, carry0, force)

        from .elo import elo_update_masked

        team_policies = ts.assignment[:, :: self.cfg.team_size]  # [W, 2]
        n = finished.size
        pairs = jnp.broadcast_to(
            team_policies[None], finished.shape + (2,)
        ).reshape(n, 2)
        win_f = win.reshape(n)
        score_a = jnp.where(
            win_f == 0, 1.0, jnp.where(win_f == 1, 0.0, 0.5)
        )
        elo = elo_update_masked(
            jnp.full_like(ts.elo, 1000.0),
            pairs,
            score_a,
            finished.reshape(n) & (win_f >= 0),
        )
        # the eval episodes perturbed nothing persistent; episodes restart
        # on the next training rollout
        return ts.replace(elo=elo, pending_reset=jnp.ones((), bool)), elo

    def eval_elo(self, ts: TrainState, num_steps: int = 1000):
        if num_steps not in self._eval_elo_fn:
            self._eval_elo_fn[num_steps] = jax.jit(
                functools.partial(self._eval_elo_impl, num_steps=num_steps)
            )
        return self._eval_elo_fn[num_steps](ts)

    def aot_compile(self, ts: TrainState):
        """Ahead-of-time compile the fused update for a given state shape
        (madrona_learn.aot_compile, jax_train.py:385). Returns the compiled
        executable; calling it skips trace/compile on first use."""
        return self._update_fn.lower(ts).compile()

    # -------------------------------------------------- PBT population ops
    def _update_population_impl(self, ts: TrainState):
        """ELO-ranked truncation selection over the train ensemble
        (madrona_learn.update_population, jax_train.py:364-371)."""
        from .pbt import ParamExplore, update_population

        key, sub = jax.random.split(ts.key)
        explore = {
            "lr": self.tcfg.lr_explore
            or ParamExplore(
                base=self.tcfg.lr, min_scale=0.1, max_scale=10.0,
                log10_scale=True,
            )
        }
        train_elo = ts.elo[: self.E]
        params, opt_state, hyper_params, train_elo = update_population(
            sub,
            ts.params,
            ts.opt_state,
            ts.hyper_params,
            train_elo,
            explore,
            self.pbt.selection_fraction,
        )
        elo = ts.elo.at[: self.E].set(train_elo)
        return ts.replace(
            params=params,
            opt_state=opt_state,
            hyper_params=hyper_params,
            elo=elo,
            key=key,
        )

    def update_population(self, ts: TrainState) -> TrainState:
        return self._update_population_fn(ts)

    def _store_past_impl(self, ts: TrainState):
        """Snapshot the current best train policy into the past-policy
        history ring (policy_history_size, bindings.cpp:58)."""
        if self.P == 0:
            return ts
        best = jnp.argmax(ts.elo[: self.E])
        slot = ts.past_ptr % self.P
        past_params = jax.tree_util.tree_map(
            lambda hist, cur: hist.at[slot].set(cur[best]),
            ts.past_params,
            ts.params,
        )
        elo = ts.elo.at[self.E + slot].set(ts.elo[best])
        return ts.replace(
            past_params=past_params, past_ptr=ts.past_ptr + 1, elo=elo
        )

    def store_past_policy(self, ts: TrainState) -> TrainState:
        return self._store_past_fn(ts)

    # -------------------------------------------------- checkpointing
    def save_ckpt(self, ts: TrainState, path: str):
        import orbax.checkpoint as ocp
        import os

        ckpt = {
            "params": ts.params,
            "opt_state": ts.opt_state,
            "normalizer": ts.normalizer,
            "update_idx": ts.update_idx,
            "elo": ts.elo,
            "hyper_params": ts.hyper_params,
            "past_ptr": ts.past_ptr,
        }
        # orbax rejects zero-size arrays; empty history is omitted
        if self.P > 0:
            ckpt["past_params"] = ts.past_params
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(
            os.path.abspath(os.path.join(path, str(int(ts.update_idx)))),
            ckpt,
            force=True,
        )

    def restore_ckpt(self, ts: TrainState, path: str) -> TrainState:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        target = {
            "params": ts.params,
            "opt_state": ts.opt_state,
            "normalizer": ts.normalizer,
            "update_idx": ts.update_idx,
            "elo": ts.elo,
            "hyper_params": ts.hyper_params,
            "past_ptr": ts.past_ptr,
        }
        if self.P > 0:
            target["past_params"] = ts.past_params
        restored = ckptr.restore(path, item=target)
        return ts.replace(**restored)
