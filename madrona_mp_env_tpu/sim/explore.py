"""Explore-novelty grid and goal regions.

exploreVisitedSystem (reference src/sim.cpp:3508-3536): 81x81 visit grid per
agent, cells of 2*agentRadius, relative to the episode start position. Here
bit-packed as [A, 81, 3] u32 (the reference stores a u32 episode id per cell
to avoid clearing; we clear at reset for free inside the masked reset).

evaluateGoalRegionsSystem (sim.cpp:4023-4088): shaped team rewards for
approaching goal ZOBBs (ZoneCaptureDefend task).
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import consts
from ..config import EnvConfig
from ..assets.map_data import MapData
from ..ops import geom
from .types import WorldState


def explore_visited_system(cfg: EnvConfig, state: WorldState):
    delta = state.pos - state.start_pos
    cell_size = consts.agent_radius * 2.0
    x = ((delta[:, 0] + 0.5) / cell_size).astype(jnp.int32)
    y = ((delta[:, 1] + 0.5) / cell_size).astype(jnp.int32)
    cx = x + consts.explore_grid_max_x
    cy = y + consts.explore_grid_max_y

    in_grid = (
        (cx >= 0)
        & (cx < consts.explore_grid_width)
        & (cy >= 0)
        & (cy < consts.explore_grid_height)
    )
    cx = jnp.clip(cx, 0, consts.explore_grid_width - 1)
    cy = jnp.clip(cy, 0, consts.explore_grid_height - 1)

    word = cx >> 5
    bit = (cx & 31).astype(jnp.uint32)
    A = cfg.num_agents
    H = consts.explore_grid_height
    from .types import EXPLORE_WORDS

    # one-hot masked read/update on the flat [A, H*W] bit array: the
    # per-agent (cy, word) gather + scatter pair serializes on TPU
    # (~0.3 ms/step at 12k agents); the mask compare + OR is full-vector
    # lazy reset clear (fuses into the full-array OR rewrite below)
    flat = jnp.where(
        state.was_reset, jnp.uint32(0), state.explore_bits
    ).reshape(A, H * EXPLORE_WORDS)
    sel = cy * EXPLORE_WORDS + word  # [A]
    mask = sel[:, None] == jnp.arange(H * EXPLORE_WORDS)  # [A, H*W]
    cur_bits = jnp.sum(
        jnp.where(mask, flat, jnp.uint32(0)), axis=-1, dtype=jnp.uint32
    )
    already = ((cur_bits >> bit) & 1) == 1

    setbit = (jnp.uint32(1) << bit)[:, None]  # [A, 1]
    explore_bits = jnp.where(
        mask & in_grid[:, None], flat | setbit, flat
    ).reshape(A, H, EXPLORE_WORDS)

    far_enough = jnp.sum(delta * delta, axis=-1) > 2.0
    newly = in_grid & (~already) & far_enough
    new_cells = state.new_cells + newly.astype(jnp.int32)

    return state.replace(explore_bits=explore_bits, new_cells=new_cells)


def _dist_to_zobb(p, zmin, zmax, rot):
    """distToZOBB (sim.cpp:3998-4021). p [..., 3]; zobb broadcastable."""
    pf = geom.rotate_z(p, -rot)
    mnf = geom.rotate_z(zmin, -rot)
    mxf = geom.rotate_z(zmax, -rot)
    below = jnp.maximum(mnf - pf, 0.0)
    above = jnp.maximum(pf - mxf, 0.0)
    return jnp.sqrt(jnp.sum(below * below + above * above, axis=-1))


def goal_regions_system(cfg: EnvConfig, m: MapData, state: WorldState):
    """evaluateGoalRegionsSystem (sim.cpp:4023-4088)."""
    if m.num_goal_regions == 0:
        return state.replace(goal_team_rewards=jnp.zeros((2,)))

    A = cfg.num_agents
    teams = jnp.arange(A, dtype=jnp.int32) // cfg.team_size
    attacker = state.team_a

    # dist of every agent to every (region, sub) zobb: [G, S, A]
    G, S = m.goal_sub_min.shape[0], m.goal_sub_min.shape[1]
    d = _dist_to_zobb(
        state.pos[None, None, :, :],
        m.goal_sub_min[:, :, None, :],
        m.goal_sub_max[:, :, None, :],
        m.goal_sub_rot[:, :, None],
    )

    region_team = jnp.where(
        m.goal_attacker_team, attacker, attacker ^ 1
    )  # [G]
    on_team = teams[None, :] == region_team[:, None]  # [G, A]

    d_masked = jnp.where(on_team[:, None, :], d, jnp.inf)
    min_per_sub = jnp.min(d_masked, axis=-1)  # [G, S]
    sub_valid = jnp.arange(S)[None, :] < m.goal_num_sub[:, None]
    max_min = jnp.max(jnp.where(sub_valid, min_per_sub, -jnp.inf), axis=-1)  # [G]

    prev = state.goal_min_dist
    first_time = jnp.isinf(prev)
    diff = prev - max_min
    improved = (~first_time) & (diff > 0.0)
    new_min = jnp.where(first_time | improved, max_min, prev)

    reward_per_region = jnp.where(
        improved, diff * m.goal_reward_strength, 0.0
    )  # [G]
    team_rewards = jnp.zeros((2,)).at[jnp.clip(region_team, 0, 1)].add(
        reward_per_region
    )

    return state.replace(
        goal_min_dist=new_min, goal_team_rewards=team_rewards
    )


def filters_system(cfg: EnvConfig, state: WorldState, shot_victims,
                   step_override=None):
    """Hardcoded analytics filters (updateFiltersState, sim.cpp:128-291):
    filter 0: >=5 players of a team in region A; filter 1: >=1 in region B;
    filter 2: any player-shot event by the team. A team 'matches' when all 3
    are active within the match window (0 steps). ``step_override`` lets the
    fused-tail path run this system before the match-info step increment
    while keeping the reference's post-increment step stamp."""
    A = cfg.num_agents
    teams = jnp.arange(A, dtype=jnp.int32) // cfg.team_size
    step = state.cur_step if step_override is None else step_override

    regions = jnp.asarray(
        [
            [-1272.0, -866.0, -825.0, 696.0],
            [852.0, -851.0, 1280.0, 593.0],
        ]
    )
    min_counts = jnp.asarray([5, 1])

    x, y = state.pos[:, 0], state.pos[:, 1]
    inside = (
        (x[None, :] >= regions[:, 0:1])
        & (y[None, :] >= regions[:, 1:2])
        & (x[None, :] <= regions[:, 2:3])
        & (y[None, :] <= regions[:, 3:4])
    )  # [2, A]

    per_team_counts = jnp.stack(
        [
            jnp.sum(jnp.where(teams[None, :] == t, inside, False), axis=-1)
            for t in range(2)
        ],
        axis=0,
    )  # [teams=2, regions=2]
    region_match = per_team_counts >= min_counts[None, :]  # [2, 2]

    shot_by_team = jnp.stack(
        [
            jnp.any((shot_victims >= 0) & (teams == t))
            for t in range(2)
        ]
    )  # [2]

    matched = jnp.concatenate(
        [region_match, shot_by_team[:, None]], axis=-1
    )  # [2 teams, 3 filters]

    last = jnp.where(matched, step, state.filters_last_match)
    all_active = jnp.all(last == step, axis=-1)  # window = 0 steps
    last_all = jnp.where(all_active, step, state.filters_last_all_matched)

    return state.replace(
        filters_last_match=last, filters_last_all_matched=last_all
    )
