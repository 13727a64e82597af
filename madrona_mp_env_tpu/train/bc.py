"""Behavior-cloning fine-tune of a checkpoint on filtered BC data.

Equivalent of the reference's scripts/filter_bc_train.py: restore a training
checkpoint, run epochs of minibatched behavior cloning
(-mean log_prob of the stored actions, starting from the stored RNN states,
filter_bc_train.py:233-245) with an optional KL-to-old-logits term, then
save under a new run name so PPO training can continue from it.

Data layout: the raw dump written by EvalManager's --bc-dump-dir (one file
per obs key + actions/action_logits/rewards/rnn_states + a 'shapes' JSON) —
per step, arrays are [P(policies), B, ...]; samples are single steps with
their pre-step RNN state.

Usage:
    python -m madrona_mp_env_tpu.train.bc \\
        --ckpt-dir ckpts --in-run-name zone6v6 --out-run-name zone6v6-bc \\
        --start-update 5000 --bc-data-dir bc_data --num-epochs 100
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .distributions import (
    AIM_BUCKETS,
    DISCRETE_BUCKETS,
    ActorDistributions,
)
from .policy import ActorCriticNet


def load_bc_data(data_dir: str) -> Dict:
    """Load a BC dump directory (load_data, filter_bc_train.py:108-143).

    Two layouts, distinguished by the 'layout' key in the 'shapes' JSON:
    - step blocks (default, from EvalManager --bc-dump-dir): per-step arrays
      [P, B, ...]; (S, P, B) flattens to samples.
    - 'sequences' (from tools.build_trajectory_training_dataset): per-step
      arrays [team_size, ...]; (S, ts) flattens to samples, with per-sample
      rnn states already [2, 2, H].
    """
    with open(os.path.join(data_dir, "shapes")) as f:
        meta = json.load(f)
    sequences = meta.get("layout") == "sequences"
    lead = 1 if sequences else 2  # leading sample axes within one step

    def read(name, dtype, step_shape):
        arr = np.fromfile(os.path.join(data_dir, name), dtype=dtype)
        arr = arr.reshape(-1, *step_shape)
        return arr.reshape(-1, *step_shape[lead:])

    obs = {
        k: read(k, np.float32, shape) for k, shape in meta["obs"].items()
    }
    actions = read("actions", np.int32, meta["actions"])
    logits = read("action_logits", np.float32, meta["action_logits"])
    rewards = read("rewards", np.float32, meta["rewards"])

    rnn = np.fromfile(
        os.path.join(data_dir, "rnn_states"), dtype=np.float32
    ).reshape(-1, *meta["rnn_states"])
    if sequences:
        # [S, ts, 2, 2, H] -> [S*ts, 2, 2, H]
        rnn = rnn.reshape(-1, *rnn.shape[2:])
    else:
        # [S, 2, 2, P, B, H] -> move (P, B) up front -> [S*P*B, 2, 2, H]
        S, _, _, P, B, H = rnn.shape
        rnn = np.moveaxis(rnn, (3, 4), (1, 2)).reshape(-1, 2, 2, H)

    return {
        "obs": obs,
        "actions": actions,
        "action_logits": logits,
        "rewards": rewards,
        "rnn_states": rnn,
    }


def bc_update_fn(model: ActorCriticNet, tx, kl_coef: float = 0.0):
    """One jitted BC minibatch update over per-policy params (the vmapped
    equivalent of filter_bc_train.py:191-265)."""

    n_discrete = len(DISCRETE_BUCKETS)

    def loss_fn(params, batch):
        rnn = jnp.moveaxis(batch["rnn_states"], 0, 2)  # [2, 2, mb, H]
        dists, _value, _ = model.apply({"params": params}, rnn, batch["obs"], False)
        actions = {
            "discrete": batch["actions"][..., :n_discrete],
            "aim": batch["actions"][..., n_discrete:],
        }
        log_probs, _ent = dists.action_stats(actions)
        bc_loss = -(
            jnp.mean(log_probs["discrete"]) + jnp.mean(log_probs["aim"])
        )

        kl_loss = 0.0
        if kl_coef > 0.0:
            # KL(old || new) per head against the stored logits
            new_logits = jnp.concatenate(
                [
                    dists.discrete.packed_log_probs(),
                    dists.aim.packed_log_probs(),
                ],
                axis=-1,
            )
            off = 0
            for n in DISCRETE_BUCKETS + AIM_BUCKETS:
                old_lp = jax.nn.log_softmax(
                    batch["action_logits"][..., off : off + n], axis=-1
                )
                new_lp = new_logits[..., off : off + n]
                kl_loss += jnp.mean(
                    jnp.sum(jnp.exp(old_lp) * (old_lp - new_lp), axis=-1)
                )
                off += n
        return bc_loss + kl_coef * kl_loss, bc_loss

    grad_fn = jax.grad(loss_fn, has_aux=True)

    @jax.jit
    def update(params, opt_state, batch):
        def one(p, os, b):
            grads, bc_loss = grad_fn(p, b)
            updates, os = tx.update(grads, os, p)
            p = optax.apply_updates(p, updates)
            return p, os, bc_loss

        return jax.vmap(one)(params, opt_state, batch)

    return update


def run_bc(
    in_ckpt: str,
    out_ckpt_dir: str,
    bc_data_dir: str,
    kl_data_dir: str = None,
    lr: float = 0.01,
    num_epochs: int = 100,
    minibatch_size: int = 2048,
    kl_coef: float = 0.0,
    dtype=jnp.float32,
    seed: int = 7,
):
    from .infer import eval_load_ckpt

    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(os.path.abspath(in_ckpt))
    params = restored["params"]
    E = jax.tree_util.tree_leaves(params)[0].shape[0]

    data = load_bc_data(bc_data_dir)
    N = data["actions"].shape[0]
    assert N % E == 0, f"{N} samples not divisible by {E} policies"

    model = ActorCriticNet(dtype=dtype)
    tx = optax.adam(lr)
    opt_state = jax.vmap(tx.init)(params)
    update = bc_update_fn(model, tx, kl_coef)

    key = jax.random.PRNGKey(seed)
    per_e = N // E
    mb = min(minibatch_size, per_e)
    num_mb = per_e // mb

    def gather(x, idx):
        return x[idx]

    for epoch in range(num_epochs):
        key, sub = jax.random.split(key)
        # each policy trains on its own shard of the samples
        order = jax.random.permutation(sub, N).reshape(E, per_e)
        losses = []
        for mi in range(num_mb):
            idx = order[:, mi * mb : (mi + 1) * mb]  # [E, mb]
            batch = {
                "obs": {
                    k: jnp.asarray(v)[idx] for k, v in data["obs"].items()
                },
                "actions": jnp.asarray(data["actions"])[idx],
                "action_logits": jnp.asarray(data["action_logits"])[idx],
                "rnn_states": jnp.asarray(data["rnn_states"])[idx],
            }
            params, opt_state, bc_loss = update(params, opt_state, batch)
            losses.append(np.asarray(bc_loss))
        print(f"epoch {epoch}: bc_loss {np.mean(losses):.4f}")

    # save under the new run name, PPO-resumable
    out = dict(restored)
    out["params"] = params
    update_idx = int(np.asarray(restored["update_idx"]))
    os.makedirs(out_ckpt_dir, exist_ok=True)
    ckptr.save(
        os.path.abspath(os.path.join(out_ckpt_dir, str(update_idx))),
        out,
        force=True,
    )
    return params


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-dir", type=str, required=True)
    ap.add_argument("--in-run-name", type=str, required=True)
    ap.add_argument("--out-run-name", type=str, required=True)
    ap.add_argument("--start-update", type=int, required=True)
    ap.add_argument("--bc-data-dir", type=str, required=True)
    ap.add_argument("--kl-data-dir", type=str, default=None)
    ap.add_argument("--kl-coef", type=float, default=0.0)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--num-epochs", type=int, default=100)
    ap.add_argument("--minibatch-size", type=int, default=2048)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    run_bc(
        in_ckpt=os.path.join(
            args.ckpt_dir, args.in_run_name, str(args.start_update)
        ),
        out_ckpt_dir=os.path.join(args.ckpt_dir, args.out_run_name),
        bc_data_dir=args.bc_data_dir,
        kl_data_dir=args.kl_data_dir,
        lr=args.lr,
        num_epochs=args.num_epochs,
        minibatch_size=args.minibatch_size,
        kl_coef=args.kl_coef,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )


if __name__ == "__main__":
    main()
