"""Device mesh + sharding layout for the fused actor-learner.

The parallelism story (SURVEY.md §2.13): worlds are embarrassingly parallel
(no cross-world communication in the sim), so scale-out is pure data
parallelism — the world axis of the env state and the actor axis of
rollout/obs tensors shard across a 1-D 'data' mesh; policy params, optimizer
state and normalizer stats are replicated; gradient reduction happens inside
jit via XLA's collectives over ICI/DCN when the vmapped PPO update consumes
sharded minibatches.

The reference has no distributed backend at all (single GPU,
jax_train.py:125-129); this module is the TPU-native scale-out the
BASELINE.json north star asks for (>= 80% linear to 4 hosts).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_data_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), axis_names=("data",))


def world_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading world axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_env_state(mesh: Mesh, env_state):
    """Place a batched WorldState with its world axis sharded."""
    ws = world_sharding(mesh)
    return jax.device_put(env_state, ws)


def train_state_shardings(mesh: Mesh, ts):
    """Sharding pytree for trainer.TrainState: env/actor tensors data-
    sharded, model/optimizer state replicated."""
    ws = world_sharding(mesh)
    rep = replicated(mesh)

    def env_leaf(_):
        return ws

    # actor-axis tensors: rnn_states [2, 2, E, BE, H] shard axis 3
    rnn_sh = NamedSharding(mesh, P(None, None, None, "data"))

    n_dev = int(np.prod(mesh.devices.shape))
    past_rnn_sh = rnn_sh if (ts.past_rnn_states.shape[3] % n_dev == 0
                             and ts.past_rnn_states.shape[3] > 0) else rep

    return ts.replace(
        params=jax.tree_util.tree_map(lambda _: rep, ts.params),
        opt_state=jax.tree_util.tree_map(lambda _: rep, ts.opt_state),
        normalizer=jax.tree_util.tree_map(lambda _: rep, ts.normalizer),
        env_state=jax.tree_util.tree_map(env_leaf, ts.env_state),
        # cur_obs is [W, A, ...]: world axis sharded like the env state
        cur_obs=jax.tree_util.tree_map(lambda _: ws, ts.cur_obs),
        rnn_states=rnn_sh,
        past_rnn_states=past_rnn_sh,
        key=rep,
        update_idx=rep,
        elo=rep,
        hyper_params=jax.tree_util.tree_map(lambda _: rep, ts.hyper_params),
        past_params=jax.tree_util.tree_map(lambda _: rep, ts.past_params),
        past_ptr=rep,
        # dynamic matchmaking tables: assignment follows the world axis;
        # the block permutations index the GLOBAL flat actor axis, so they
        # replicate (block gathers cross shards via XLA collectives)
        assignment=ws,
        train_perm=rep,
        past_perm=rep,
        pending_reset=rep,
    )


def shard_train_state(mesh: Mesh, ts):
    return jax.device_put(ts, train_state_shardings(mesh, ts))
