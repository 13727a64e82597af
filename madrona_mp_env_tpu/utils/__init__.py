from .rng import Salt, episode_key, step_key, system_key

__all__ = ["Salt", "episode_key", "step_key", "system_key"]
