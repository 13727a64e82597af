from .types import Actions, WorldState
from .env import Env

__all__ = ["Actions", "WorldState", "Env"]
