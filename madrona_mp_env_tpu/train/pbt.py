"""Population-based training: hyperparameter exploration, population
selection, and past-policy self-play history.

Equivalents of madrona_learn's PBTConfig / ParamExplore / update_population
(reference scripts/jax_train.py:146-232,364-371):

- ``ParamExplore``: per-policy hyperparameter ranges; initial values sampled
  across the population, perturbed multiplicatively on population updates
  (lr explored log-uniform x/÷10, jax_train.py:227-232).
- ``update_population``: ELO-ranked truncation selection — the bottom
  quartile copies params/optimizer/hyperparams from the top quartile with
  perturbed hyperparameters.
- Past-policy history: frozen snapshots of train policies that act (but
  never learn) in a configured portion of matches (``past_play_portion``,
  policy_history_size in bindings.cpp:58).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class ParamExplore:
    """Mirror of madrona_learn.ParamExplore (jax_train.py:158-213,227-232)."""

    base: float
    min_scale: float
    max_scale: float
    log10_scale: bool = False
    clip_perturb: bool = False
    # multiplicative perturbation range on population update
    perturb_lo: float = 0.8
    perturb_hi: float = 1.25

    @property
    def lo(self) -> float:
        return self.base * self.min_scale

    @property
    def hi(self) -> float:
        return self.base * self.max_scale

    def init_values(self, key: jax.Array, num_policies: int) -> jax.Array:
        """Spread initial values across the population (log-uniform when
        log10_scale)."""
        u = jax.random.uniform(key, (num_policies,))
        if self.log10_scale:
            lo, hi = np.log10(self.lo), np.log10(self.hi)
            return 10.0 ** (lo + u * (hi - lo))
        return self.lo + u * (self.hi - self.lo)

    def perturb(self, key: jax.Array, values: jax.Array) -> jax.Array:
        factor = jax.random.uniform(
            key, values.shape, minval=self.perturb_lo, maxval=self.perturb_hi
        )
        out = values * factor
        return jnp.clip(out, self.lo, self.hi)


@dataclass(frozen=True)
class PBTConfig:
    """Mirror of madrona_learn.PBTConfig (jax_train.py:146-156)."""

    num_train_policies: int = 1
    num_past_policies: int = 0
    self_play_portion: float = 0.0
    cross_play_portion: float = 1.0
    past_play_portion: float = 0.0
    # population update selection: bottom k replaced from top k
    selection_fraction: float = 0.25


def make_matchmaking(
    num_worlds: int,
    num_agents: int,
    team_size: int,
    pbt: PBTConfig,
) -> Tuple[np.ndarray, np.ndarray]:
    """Static world/team -> policy-slot routing.

    Slots [0, E) are train policies; [E, E+P) are frozen past policies.
    Worlds are partitioned by the play portions (self/cross/past,
    jax_train.py:151-156); within each partition assignment is round-robin
    so every slot gets a statically equal actor count where divisibility
    allows.

    Returns (assignment [W, A] int32 slot ids, num_worlds_per_kind [3]).
    """
    E = pbt.num_train_policies
    P = pbt.num_past_policies
    total = pbt.self_play_portion + pbt.cross_play_portion + pbt.past_play_portion
    assert abs(total - 1.0) < 1e-6, "play portions must sum to 1"
    if P == 0:
        assert pbt.past_play_portion == 0.0

    w_self = int(round(num_worlds * pbt.self_play_portion))
    w_past = int(round(num_worlds * pbt.past_play_portion))
    w_cross = num_worlds - w_self - w_past

    w = np.arange(num_worlds)[:, None]
    team = np.arange(num_agents)[None, :] // team_size
    assign = np.zeros((num_worlds, num_agents), np.int64)

    # self-play worlds: both teams the same train policy
    sl = slice(0, w_self)
    assign[sl] = w[sl] % E
    # cross-play worlds: (2w + t) % E — every ensemble pair meets
    cr = slice(w_self, w_self + w_cross)
    assign[cr] = (2 * w[cr] + team) % E
    # past-play worlds: team 0 trains, team 1 is a frozen past policy
    pa = slice(w_self + w_cross, num_worlds)
    if w_past > 0:
        assign[pa] = np.where(
            team == 0, w[pa] % E, E + (w[pa] % P)
        )

    return assign.astype(np.int32), np.array([w_self, w_cross, w_past])


def update_population(
    key: jax.Array,
    params,
    opt_state,
    hyper_params: dict,
    elo: jax.Array,
    explore: dict,
    selection_fraction: float = 0.25,
):
    """ELO-ranked truncation selection (madrona_learn.update_population,
    jax_train.py:364-371): bottom k copy from top k; copied hyperparams are
    perturbed. Pure function of stacked [E, ...] pytrees."""
    E = elo.shape[0]
    k = max(int(E * selection_fraction), 1) if E > 1 else 0
    if k == 0:
        return params, opt_state, hyper_params, elo

    order = jnp.argsort(-elo)  # best first
    top = order[:k]
    bottom = order[-k:]

    # src[i] = donor for policy i (identity except bottom slots)
    src = jnp.arange(E).at[bottom].set(top)

    def copy_from(x):
        return x[src]

    params = jax.tree_util.tree_map(copy_from, params)
    opt_state = jax.tree_util.tree_map(copy_from, opt_state)
    elo = elo[src]

    new_hp = {}
    keys = jax.random.split(key, max(len(hyper_params), 1))
    for (name, values), sub in zip(hyper_params.items(), keys):
        copied = values[src]
        perturbed = explore[name].perturb(sub, copied)
        # only replaced slots get perturbed values
        replaced = jnp.zeros((E,), bool).at[bottom].set(True)
        new_hp[name] = jnp.where(replaced, perturbed, values)
    return params, opt_state, new_hp, elo
