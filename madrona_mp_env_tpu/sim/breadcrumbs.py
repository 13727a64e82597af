"""Breadcrumb repulsion markers.

leaveBreadcrumbsSystem + accumulateBreadcrumbPenaltiesSystem (reference
src/sim.cpp:4845-4926). The reference makes/destroys BreadcrumbEntity
archetypes; here a fixed per-world pool with free slots (penalty <= 0 means
free). Each agent refreshes its last crumb when nearby, otherwise drops a
new one every 10 steps; crumbs decay by 0.025/step and penalize nearby
teammates (not the owner).

All pool updates are one-hot masked selects over the [C] pool (each agent
owns a fixed slot range, so at most one agent writes a slot) — TPU scatters
and vmapped gathers on these tiny pools lower to code that costs more than
the whole system.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import consts
from ..config import EnvConfig
from .types import WorldState


def breadcrumb_system(cfg: EnvConfig, state: WorldState):
    A = cfg.num_agents
    C = cfg.breadcrumb_pool_size
    K = cfg.breadcrumb_pool_per_agent
    teams = jnp.arange(A, dtype=jnp.int32) // cfg.team_size
    radius = consts.agent_radius * consts.breadcrumb_radius_scale
    slots = jnp.arange(C)

    pos = state.pos
    # lazy reset clear (initWorld's eager pool clear moved here; the
    # selects fuse into the full pool rewrites this system already does)
    wr = state.was_reset
    crumb_pos = jnp.where(wr, 0.0, state.crumb_pos)
    crumb_penalty = jnp.where(wr, 0.0, state.crumb_penalty)
    crumb_team = jnp.where(wr, -1, state.crumb_team)
    crumb_owner = jnp.where(wr, -1, state.crumb_owner)

    # --- leaveBreadcrumbsSystem ---
    last = jnp.where(wr, -1, state.crumb_last)  # [A] slot idx or -1
    last_oh = (last[:, None] == slots) & (last >= 0)[:, None]  # [A, C]
    lastf = last_oh.astype(jnp.float32)
    last_pen = lastf @ crumb_penalty  # [A] gather via one-hot
    last_own = lastf @ crumb_owner.astype(jnp.float32)
    last_pos = lastf @ crumb_pos  # [A, 3]
    last_valid = (
        (last >= 0) & (last_pen > 0.0) & (last_own == jnp.arange(A))
    )
    near_last = (
        jnp.linalg.norm(pos - last_pos, axis=-1) < radius
    ) & last_valid

    # refresh the last crumb's penalty
    refresh = jnp.any(last_oh & near_last[:, None], axis=0)  # [C]
    crumb_penalty = jnp.where(refresh, consts.breadcrumb_penalty, crumb_penalty)

    steps_since_prev = jnp.where(wr, 0, state.crumb_steps_since)
    steps_since = jnp.where(near_last, 0, steps_since_prev + 1)
    want_new = (~near_last) & (steps_since > consts.breadcrumb_frequency)

    # allocate free slots for agents dropping new crumbs. Each agent owns a
    # fixed slot range [i*K, (i+1)*K) so allocation is conflict-free.
    slot_base = jnp.arange(A) * K
    own_slots_oh = (slots[None, :] >= slot_base[:, None]) & (
        slots[None, :] < (slot_base + K)[:, None]
    )  # [A, C]
    pen_row = jnp.broadcast_to(crumb_penalty[None, :], (A, C))
    own_free = own_slots_oh & (pen_row <= 0.0)
    has_free = jnp.any(own_free, axis=-1)
    first_free = jnp.argmax(own_free, axis=-1)  # global slot idx
    weakest = jnp.argmin(
        jnp.where(own_slots_oh, pen_row, jnp.inf), axis=-1
    )
    new_slot = jnp.where(has_free, first_free, weakest)  # [A]

    drop_oh = (new_slot[:, None] == slots) & want_new[:, None]  # [A, C]
    dropped = jnp.any(drop_oh, axis=0)  # [C] (at most one agent per slot)
    dof = drop_oh.astype(jnp.float32)
    drop_pos = dof.T @ pos  # [C, 3]
    drop_team = dof.T @ teams.astype(jnp.float32)
    drop_owner = dof.T @ jnp.arange(A, dtype=jnp.float32)

    crumb_pos = jnp.where(dropped[:, None], drop_pos, crumb_pos)
    crumb_penalty = jnp.where(dropped, consts.breadcrumb_penalty, crumb_penalty)
    crumb_team = jnp.where(dropped, drop_team.astype(jnp.int32), crumb_team)
    crumb_owner = jnp.where(dropped, drop_owner.astype(jnp.int32), crumb_owner)
    crumb_last = jnp.where(want_new, new_slot, last)
    steps_since = jnp.where(want_new, 0, steps_since)

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
