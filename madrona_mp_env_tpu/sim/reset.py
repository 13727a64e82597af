"""Episode reset / world init.

resetSystem + initWorld (reference src/sim.cpp:732-872) and
resetPersistentEntities (src/level_gen.cpp:330-582), including the
trajectory-curriculum snapshot restore (level_gen.cpp:498-581).

Inside jit, a reset is a masked select: the fully-reinitialized state is
computed unconditionally (cheap relative to raycasts) and chosen per world
by the reset predicate — SURVEY.md §7 hard part 3.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import consts
from ..config import EnvConfig, SimFlags, Task
from ..assets.map_data import MapData
from ..ops import geom
from ..utils import rng
from .spawn import spawn_agents
from .types import Pose, WorldCurriculum, WorldState, OTHER_OB_DIM


def init_world(
    cfg: EnvConfig,
    m: MapData,
    state: WorldState,
    init_key_data: jax.Array,
    sim_ctrl: jax.Array,
    triggered_reset,
) -> WorldState:
    """Build a fresh-episode state from the current one (initWorld +
    resetPersistentEntities)."""
    A = cfg.num_agents

    episode_idx = state.episode_idx
    ep_key_data = rng.episode_key(init_key_data, episode_idx, state.world_idx)
    base = rng.step_key(ep_key_data, jnp.int32(-1))
    k_flip, k_stagger, k_zone, k_spawn, k_curr, k_coef = jax.random.split(
        base, 6
    )

    randomize_sides = sim_ctrl[2] != 0
    flip = randomize_sides & (jax.random.uniform(k_flip, ()) < 0.5)
    team_a = jnp.where(flip, 1, 0).astype(jnp.int32)

    randomize_len = sim_ctrl[1] != 0
    stagger = triggered_reset & randomize_len
    cur_step = jnp.where(
        stagger,
        jax.random.randint(k_stagger, (), 0, cfg.episode_len - 1),
        0,
    ).astype(jnp.int32)

    if cfg.task in (Task.Zone, Task.ZoneCaptureDefend):
        zone_cur = jax.random.randint(k_zone, (), 0, m.num_zones).astype(
            jnp.int32
        )
        if cfg.task == Task.ZoneCaptureDefend:
            zone_cur = jnp.asarray(3, jnp.int32)
    else:
        zone_cur = jnp.zeros((), jnp.int32)

    # spawn-curriculum episode sample: tier from the CDF + pair index
    # (initWorld, sim.cpp:766-794)
    if cfg.enable_spawn_curriculum and m.has_spawn_curriculum:
        k_sc1, k_sc2, k_sc3 = jax.random.split(k_curr, 3)
        use_sc = (
            jax.random.uniform(k_sc1, ()) < cfg.use_curriculum_spawn_prob
        )
        probs = jnp.asarray(cfg.curriculum_tier_probs, jnp.float32)
        cdf = jnp.cumsum(probs)
        u = jax.random.uniform(k_sc2, ()) * cdf[-1]
        tier = jnp.searchsorted(cdf, u).astype(jnp.int32)
        tier = jnp.clip(tier, 0, 4)
        n_spawns = jnp.maximum(m.curr_spawn_counts[tier], 1)
        spawn_idx = (
            jax.random.randint(k_sc3, (), 0, 2 ** 30) % n_spawns
        ).astype(jnp.int32)
        sc_fields = dict(
            curr_spawn_active=use_sc,
            curr_spawn_tier=tier,
            curr_spawn_idx=spawn_idx,
        )
    else:
        sc_fields = dict(
            curr_spawn_active=jnp.zeros((), bool),
            curr_spawn_tier=jnp.zeros((), jnp.int32),
            curr_spawn_idx=jnp.zeros((), jnp.int32),
        )

    f = jnp.float32
    i = jnp.int32
    T = cfg.team_size

    state = state.replace(
        **sc_fields,
        team_a=team_a,
        cur_step=cur_step,
        is_finished=jnp.zeros((), bool),
        win_result=jnp.full((), -1, i),
        team_kills=jnp.zeros((2,), i),
        team_points=jnp.zeros((2,), i),
        zone_stats=jnp.zeros_like(state.zone_stats),
        zone_cur=zone_cur,
        zone_controlling=jnp.full((), -1, i),
        zone_contested=jnp.zeros((), bool),
        zone_captured=jnp.zeros((), bool),
        zone_earned_point=jnp.zeros((), bool),
        zone_steps_remaining=jnp.full((), consts.num_steps_per_zone, i),
        zone_steps_until_point=jnp.full((), consts.zone_point_interval, i),
        episode_key=ep_key_data,
        # agents -> far away + dead so spawn_agents respawns everyone
        pos=jnp.full((A, 3), 3.0e37, f),
        vel=jnp.zeros((A, 3), f),
        alive=jnp.zeros((A,), f),
        hp=jnp.zeros((A,), f),
        respawn_steps=jnp.zeros((A,), i),
        autoheal_steps=jnp.zeros((A,), i),
        landed_shot_on=jnp.full((A,), -1, i),
        successful_kill=jnp.zeros((A,), bool),
        was_shot_count=jnp.zeros((A,), i),
        was_killed=jnp.zeros((A,), bool),
        fired_shot_t=jnp.full((A,), -jnp.inf, f),
        has_died=jnp.zeros((A,), bool),
        reloaded_full_mag=jnp.zeros((A,), bool),
        in_zone=jnp.zeros((A,), bool),
        min_dist_to_zone=jnp.full((A,), jnp.inf, f),
        subzone_ctrl=jnp.full((8,), -1, i),
        subzone_contested=jnp.zeros((8,), bool),
        in_subzone=jnp.zeros((A,), bool),
        min_dist_subzone=jnp.full((A,), jnp.inf, f),
        damage_dealt=jnp.zeros_like(state.damage_dealt),
        aim_vel_yaw=jnp.zeros((A,), f),
        aim_vel_pitch=jnp.zeros((A,), f),
        # NOT cleared here (big buffers, lazily cleared by their owning
        # systems via `where(was_reset, init, x)` folded into the full
        # rewrite they already emit every step — see types.WorldState):
        #   last_known_obs / last_known_pos  (observations_system)
        #   ft_last_known                    (full_team_observations_system)
        #   crumb_*                          (breadcrumb_system)
        #   explore_bits                     (explore_visited_system)
        # prev_can_see / prev_teammate_vis / prev_fwd_depth / new_cells are
        # unconditionally overwritten before any reader sees them
        # post-reset (observe_tail runs after reset; explore before
        # rewards), so clearing them here was a dead write.
        spawn_a_used=jnp.full_like(state.spawn_a_used, 0xFFFFFFFF),
        spawn_b_used=jnp.full_like(state.spawn_b_used, 0xFFFFFFFF),
        spawn_respawn_used=jnp.full_like(state.spawn_respawn_used, 0xFFFFFFFF),
        reward_coefs=jnp.tile(
            jnp.asarray(cfg.reward_defaults.as_tuple(), f)[None, :], (A, 1)
        ),
        filters_last_match=jnp.full((2, 3), -(10 ** 6), i),
        filters_last_all_matched=jnp.full((2,), -(10 ** 6), i),
        goal_min_dist=jnp.full_like(state.goal_min_dist, jnp.inf),
        goal_team_rewards=jnp.zeros((2,), f),
    )

    state = spawn_agents(cfg, m, state, k_spawn, is_respawn=False)
    state = state.replace(start_pos=state.pos)

    # trajectory-curriculum restore (level_gen.cpp:498-581)
    if m.num_curriculum_snapshots > 0:
        state = _maybe_restore_snapshot(cfg, m, state, k_curr, sim_ctrl)

    return state


def _maybe_restore_snapshot(cfg, m, state, key, sim_ctrl):
    A = cfg.num_agents
    eval_mode = sim_ctrl[0] != 0
    k_p, k_idx = jax.random.split(key)
    do = (
        (jax.random.uniform(k_p, ()) < cfg.trajectory_curriculum_prob)
        & (~eval_mode)
    )
    idx = jax.random.randint(k_idx, (), 0, m.num_curriculum_snapshots)
    ms = m.curriculum_match_state[idx]  # [5] step, zone, controller, rem, until
    players = m.curriculum_players[idx]  # [12, 9]

    controller = ms[2]
    captured = controller != -1

    # team flip permutation of players (level_gen.cpp:527-539)
    half = A // 2
    perm = jnp.where(
        state.team_a == 0,
        jnp.arange(A),
        jnp.where(jnp.arange(A) < half, jnp.arange(A) + half, jnp.arange(A) - half),
    )
    p = players[jnp.argsort(perm)]  # players[i] applied to agents[perm[i]]

    pos = p[:, 0:3]
    yaw, pitch = geom.compute_aim(p[:, 3], p[:, 4])
    bullets = p[:, 5].astype(jnp.int32)
    reloading = p[:, 6].astype(jnp.int32)
    hp = p[:, 7]
    flags = p[:, 8].astype(jnp.int32)
    crouch = (flags & 4) != 0
    prone = (flags & 8) != 0
    pose = jnp.where(prone, Pose.Prone, jnp.where(crouch, Pose.Crouch, Pose.Stand))

    def w(new, old):
        if new.ndim > old.ndim or new.shape != old.shape:
            new = jnp.broadcast_to(new, old.shape)
        cond = jnp.broadcast_to(
            jnp.reshape(do, (1,) * old.ndim), old.shape
        )
        return jnp.where(cond, new, old)

    return state.replace(
        zone_cur=w(ms[1], state.zone_cur),
        zone_controlling=w(
            jnp.where(captured, controller, -1), state.zone_controlling
        ),
        zone_captured=w(captured, state.zone_captured),
        zone_steps_until_point=w(
            jnp.where(captured, ms[4], state.zone_steps_until_point),
            state.zone_steps_until_point,
        ),
        zone_steps_remaining=w(
            jnp.where(captured, ms[3], state.zone_steps_remaining),
            state.zone_steps_remaining,
        ),
        cur_step=w(ms[0], state.cur_step),
        pos=w(pos, state.pos),
        yaw=w(yaw, state.yaw),
        pitch=w(pitch, state.pitch),
        hp=w(hp, state.hp),
        mag_bullets=w(bullets, state.mag_bullets),
        mag_reloading=w(reloading, state.mag_reloading),
        stand_cur=w(pose, state.stand_cur),
        stand_tgt=w(pose, state.stand_tgt),
        stand_transition=w(jnp.zeros((A,), jnp.int32), state.stand_transition),
    )


def reset_system(
    cfg: EnvConfig,
    m: MapData,
    state: WorldState,
    init_key_data: jax.Array,
    sim_ctrl: jax.Array,
    force_reset,
) -> WorldState:
    """resetSystem (sim.cpp:835-872): auto-reset on match end, world
    curriculum schedule over the first 50 episodes."""
    should = force_reset != 0
    if cfg.auto_reset:
        should = should | state.is_finished

    episode_idx = state.episode_counter
    episode_counter = state.episode_counter + jnp.where(should, 1, 0).astype(
        jnp.uint32
    )

    world_curr = state.world_curriculum
    if cfg.has_flag(SimFlags.EnableCurriculum):
        ck = rng.system_key(
            rng.step_key(state.episode_key, state.cur_step), rng.Salt.CURRICULUM
        )
        u = jax.random.uniform(ck, ())
        frac = (episode_idx.astype(jnp.float32) + 1.0) / 50.0
        sched = jnp.where(
            episode_idx < 50,
            jnp.where(
                u < frac, WorldCurriculum.FullMatch, WorldCurriculum.LearnShooting
            ),
            WorldCurriculum.FullMatch,
        ).astype(jnp.int32)
        world_curr = jnp.where(should, sched, world_curr)

    pre = state.replace(
        episode_idx=jnp.where(should, episode_idx, state.episode_idx),
        episode_counter=episode_counter,
        world_curriculum=world_curr,
        # the owning systems of the lazily-cleared buffers key on this
        # next step (and observe_tail keys on it this step)
        was_reset=should,
    )

    fresh = init_world(
        cfg, m, pre, init_key_data, sim_ctrl, triggered_reset=force_reset != 0
    )

    return jax.tree_util.tree_map(
        lambda new, old: jnp.where(
            jnp.reshape(should, (1,) * old.ndim) if old.ndim else should,
            new,
            old,
        ),
        fresh,
        pre,
    )
