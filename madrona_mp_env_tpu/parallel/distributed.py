"""Multi-process (multi-host) training setup.

The reference is single-GPU (scripts/jax_train.py:125-129 has no
distributed backend); this is the TPU-native scale-out path the BASELINE
north star asks for (>= 80% linear scaling to 4 hosts): one process per
host, worlds sharded over the global 1-D data mesh, gradient reduction via
XLA collectives over ICI/DCN inside the fused update.

Key multi-process constraint: a global array can only be built by
computation (jit with out_shardings) or from process-local shards —
`jax.device_put` of a host value onto a mesh spanning non-addressable
devices does not work. `global_init` therefore runs TrainingManager.init
INSIDE jit with the TrainState shardings as out_shardings: every process
traces the same deterministic program, XLA emits each shard on its owner.
"""

from __future__ import annotations

from typing import Optional

import jax

from .sharding import make_data_mesh, train_state_shardings


def init_distributed(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    local_device_ids=None,
) -> None:
    """jax.distributed.initialize wrapper (idempotent per process)."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def global_mesh(num_devices: Optional[int] = None):
    """1-D data mesh over ALL processes' devices (jax.devices() is global
    after jax.distributed.initialize)."""
    devices = jax.devices()
    if num_devices:
        devices = devices[:num_devices]
    return make_data_mesh(devices)


def global_init(mgr, mesh, seed: Optional[int] = None):
    """Build the sharded global TrainState by running TrainingManager.init
    inside jit with out_shardings (multi-process safe; single-process it is
    equivalent to init + shard_train_state)."""
    ts_shape = jax.eval_shape(lambda: mgr.init(seed))
    shardings = train_state_shardings(mesh, ts_shape)
    return jax.jit(lambda: mgr.init(seed), out_shardings=shardings)()
