"""madrona_mp_env_tpu — TPU-native batched multiplayer FPS environment + trainer.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
shacklettbp/madrona-mp-env (reference: /root/reference): thousands of
independent 6v6 zone-capture / TDM game worlds stepped as one jitted
function, fused with a PPO/PBT self-play learner.

Architecture (TPU-first, not a port):
  - World state is a struct-of-arrays pytree with a leading world axis,
    sharded over devices with jax.sharding; the reference's CUDA megakernel
    taskgraph (reference src/sim.cpp:5342) becomes a composition of pure
    functions inside one jit.
  - All raycasts (movement sphere-casts, hitscan, LOS, lidar) are batched
    tensor ops against a padded triangle soup (reference's MeshBVH,
    src/mesh_bvh.hpp, is replaced by brute-force + MXU-friendly kernels;
    maps are small enough that dense intersection beats divergent
    traversal on a vector machine).
  - RNG is jax.random with fold_in keying by (seed, episode, world, system),
    mirroring the reference's counter-based rand::split_i discipline
    (reference src/sim.cpp:743-749).
"""

from .config import EnvConfig, SimFlags, Task, RewardMode, WeaponStats
from .sim.env import Env

__version__ = "0.1.0"

__all__ = [
    "EnvConfig",
    "SimFlags",
    "Task",
    "RewardMode",
    "WeaponStats",
    "Env",
]
