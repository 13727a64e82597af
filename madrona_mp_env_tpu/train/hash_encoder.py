"""Multiresolution hash-grid positional encoder (instant-NGP style).

Equivalent of the reference's scripts/hash_encoder.py (a HashGridEncoder
module available to policies as a richer positional embedding than the
sinusoidal default). TPU-first implementation: all L levels are encoded
with one batched gather over a single parameter table — no per-level Python
loop in the hot path, static shapes throughout.

Reference: Müller et al., "Instant Neural Graphics Primitives with a
Multiresolution Hash Encoding" (SIGGRAPH 2022).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# spatial hash primes (one per input dimension; first is 1 as in the paper)
_PRIMES = jnp.array([1, 2654435761, 805459861], jnp.uint32)


class HashGridEncoder(nn.Module):
    """Encode positions in [0, 1]^dim to [..., L * F] features.

    L: num levels; T: table size per level (power of two); F: features per
    entry; N_min/N_max: coarsest/finest grid resolution.
    """

    dim: int = 3
    num_levels: int = 8  # L
    table_size: int = 2 ** 14  # T
    num_features: int = 2  # F
    min_resolution: int = 4  # N_min
    max_resolution: int = 256  # N_max

    @property
    def growth_factor(self) -> float:
        if self.num_levels == 1:
            return 1.0
        return math.exp(
            (math.log(self.max_resolution) - math.log(self.min_resolution))
            / (self.num_levels - 1)
        )

    def resolutions(self) -> jnp.ndarray:
        b = self.growth_factor
        return jnp.asarray(
            [
                int(math.floor(self.min_resolution * (b ** l)))
                for l in range(self.num_levels)
            ],
            jnp.uint32,
        )

    @nn.compact
    def __call__(self, pos: jax.Array) -> jax.Array:
        """pos: [..., dim] in [0, 1]. Returns [..., L * F]."""
        L, T, F, D = (
            self.num_levels,
            self.table_size,
            self.num_features,
            self.dim,
        )
        table = self.param(
            "hash_table",
            nn.initializers.uniform(scale=1e-4),
            (L, T, F),
            jnp.float32,
        )

        batch_shape = pos.shape[:-1]
        p = pos.reshape(-1, D).astype(jnp.float32)  # [B, D]
        res = self.resolutions()  # [L]

        # scaled coordinates per level: [B, L, D]
        scaled = p[:, None, :] * res[None, :, None].astype(jnp.float32)
        lo = jnp.floor(scaled)
        frac = scaled - lo
        lo = lo.astype(jnp.uint32)

        # 2^D corner offsets: [C, D]
        corners = jnp.stack(
            jnp.meshgrid(*([jnp.arange(2, dtype=jnp.uint32)] * D), indexing="ij"),
            axis=-1,
        ).reshape(-1, D)

        # corner integer coords [B, L, C, D]
        coords = lo[:, :, None, :] + corners[None, None, :, :]

        # spatial hash: xor of coord * prime, mod T (power of two)
        primes = _PRIMES[:D]
        h = coords * primes[None, None, None, :]
        idx = h[..., 0]
        for d in range(1, D):
            idx = idx ^ h[..., d]
        idx = (idx & jnp.uint32(T - 1)).astype(jnp.int32)  # [B, L, C]

        # gather per level: table [L, T, F], idx [B, L, C] -> [B, L, C, F]
        B = p.shape[0]
        C = corners.shape[0]
        idx_l = idx.transpose(1, 0, 2).reshape(L, B * C)
        vals = jax.vmap(lambda tbl, ix: tbl[ix])(table, idx_l)  # [L, B*C, F]
        vals = vals.reshape(L, B, C, F).transpose(1, 0, 2, 3)

        # D-linear interpolation weights: [B, L, C]
        w = jnp.ones((B, L, C), jnp.float32)
        for d in range(D):
            fd = frac[:, :, None, d]
            cd = corners[None, None, :, d].astype(jnp.float32)
            w = w * (cd * fd + (1.0 - cd) * (1.0 - fd))

        out = jnp.sum(vals * w[..., None], axis=2)  # [B, L, F]
        return out.reshape(*batch_shape, L * F)
