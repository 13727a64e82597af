from .rng import Salt, episode_key, step_key, system_key

__all__ = ["Salt", "episode_key", "step_key", "system_key"]

def cfg_jax_mem(fraction: float) -> None:
    """Cap JAX's preallocated device-memory fraction
    (madrona_learn.cfg_jax_mem, reference scripts/jax_train.py:24). Must be
    called before the first JAX allocation."""
    import os

    os.environ["XLA_PYTHON_CLIENT_MEM_FRACTION"] = f"{fraction:.2f}"
