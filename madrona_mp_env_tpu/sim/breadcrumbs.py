"""Breadcrumb repulsion markers.

leaveBreadcrumbsSystem + accumulateBreadcrumbPenaltiesSystem (reference
src/sim.cpp:4845-4926). The reference makes/destroys BreadcrumbEntity
archetypes; here a fixed per-world pool with free slots (penalty <= 0 means
free). Each agent refreshes its last crumb when nearby, otherwise drops a
new one every 10 steps; crumbs decay by 0.025/step and penalize nearby
teammates (not the owner).
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import consts
from ..config import EnvConfig
from .types import WorldState


def breadcrumb_system(cfg: EnvConfig, state: WorldState):
    A = cfg.num_agents
    C = cfg.breadcrumb_pool_size
    teams = jnp.arange(A, dtype=jnp.int32) // cfg.team_size
    radius = consts.agent_radius * consts.breadcrumb_radius_scale

    pos = state.pos
    crumb_pos = state.crumb_pos
    crumb_penalty = state.crumb_penalty
    crumb_team = state.crumb_team
    crumb_owner = state.crumb_owner

    # --- leaveBreadcrumbsSystem ---
    last = state.crumb_last  # [A] slot idx or -1
    last_valid = (last >= 0) & (
        crumb_penalty[jnp.clip(last, 0, C - 1)] > 0.0
    ) & (crumb_owner[jnp.clip(last, 0, C - 1)] == jnp.arange(A))
    last_pos = crumb_pos[jnp.clip(last, 0, C - 1)]
    near_last = (
        jnp.linalg.norm(pos - last_pos, axis=-1) < radius
    ) & last_valid

    # refresh the last crumb's penalty
    refresh = jnp.zeros((C,), bool).at[jnp.clip(last, 0, C - 1)].max(near_last)
    crumb_penalty = jnp.where(refresh, consts.breadcrumb_penalty, crumb_penalty)

    steps_since = jnp.where(near_last, 0, state.crumb_steps_since + 1)
    want_new = (~near_last) & (steps_since > consts.breadcrumb_frequency)

    # allocate free slots for agents dropping new crumbs. Each agent owns a
    # fixed slot range [i*K, (i+1)*K) so allocation is conflict-free.
    K = cfg.breadcrumb_pool_per_agent
    slot_base = jnp.arange(A) * K
    own_slots = slot_base[:, None] + jnp.arange(K)[None, :]  # [A, K]
    own_free = crumb_penalty[own_slots] <= 0.0  # [A, K]
    has_free = jnp.any(own_free, axis=-1)
    free_slot = slot_base + jnp.argmax(own_free, axis=-1)
    # if no free slot, overwrite the agent's weakest crumb
    weakest = slot_base + jnp.argmin(crumb_penalty[own_slots], axis=-1)
    new_slot = jnp.where(has_free, free_slot, weakest)

    do_drop = want_new
    crumb_pos = crumb_pos.at[new_slot].set(
        jnp.where(do_drop[:, None], pos, crumb_pos[new_slot])
    )
    crumb_penalty = crumb_penalty.at[new_slot].set(
        jnp.where(do_drop, consts.breadcrumb_penalty, crumb_penalty[new_slot])
    )
    crumb_team = crumb_team.at[new_slot].set(
        jnp.where(do_drop, teams, crumb_team[new_slot])
    )
    crumb_owner = crumb_owner.at[new_slot].set(
        jnp.where(do_drop, jnp.arange(A), crumb_owner[new_slot])
    )
    crumb_last = jnp.where(do_drop, new_slot, last)
    steps_since = jnp.where(do_drop, 0, steps_since)

    # --- accumulateBreadcrumbPenaltiesSystem ---
    live = crumb_penalty > 0.0
    d = jnp.linalg.norm(
        pos[None, :, :] - crumb_pos[:, None, :], axis=-1
    )  # [C, A]
    same_team = crumb_team[:, None] == teams[None, :]
    not_owner = crumb_owner[:, None] != jnp.arange(A)[None, :]
    near = d <= radius
    affects = live[:, None] & same_team & not_owner & near
    total_penalty = jnp.sum(
        jnp.where(affects, crumb_penalty[:, None], 0.0), axis=0
    )

    crumb_penalty = jnp.where(
        live, crumb_penalty - consts.breadcrumb_decay, crumb_penalty
    )

    return state.replace(
        crumb_pos=crumb_pos,
        crumb_penalty=crumb_penalty,
        crumb_team=crumb_team,
        crumb_owner=crumb_owner,
        crumb_total_penalty=total_penalty,
        crumb_last=crumb_last,
        crumb_steps_since=steps_since,
    )
