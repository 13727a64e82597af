from .formats import (
    load_collision_data,
    load_navmesh,
    load_spawns,
    load_zones,
)
from .map_data import MapData, load_map

__all__ = [
    "load_collision_data",
    "load_navmesh",
    "load_spawns",
    "load_zones",
    "MapData",
    "load_map",
]
