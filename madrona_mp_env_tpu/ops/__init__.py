from .geom import (
    aim_vectors,
    body_fwd_right,
    compute_aim,
    wrap_pi,
)
from .raycast import (
    TriSoup,
    make_tri_soup,
    ray_vs_tris,
    ray_vs_capsules,
    sphere_cast_vs_tris,
)

__all__ = [
    "aim_vectors",
    "body_fwd_right",
    "compute_aim",
    "wrap_pi",
    "TriSoup",
    "make_tri_soup",
    "ray_vs_tris",
    "ray_vs_capsules",
    "sphere_cast_vs_tris",
]
