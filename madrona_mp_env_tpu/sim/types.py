"""Simulation state pytrees.

The reference's ECS schema (reference src/types.hpp) flattened into a
struct-of-arrays pytree per world. The env is written for ONE world (leading
dim = agents); the Env wrapper vmaps over the world axis and shards it.

Dynamic ECS entities (breadcrumbs, events, snapshots) become fixed-capacity
pools/ring buffers — SURVEY.md §7 hard part 4.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from .. import consts
from ..config import EnvConfig

# observation feature sizes (see observations.py for layouts)
SELF_OB_DIM = 43  # PlayerCommon(23) + Combat(4) + Zone(16)
OTHER_OB_DIM = 32  # PlayerCommon(23) + rel(5) + combat(4) / opp flags(4)

# explore grid bit-packing: 81 columns -> 3 x u32 words per row
EXPLORE_WORDS = (consts.explore_grid_width + 31) // 32


class Pose:
    Stand = 0
    Crouch = 1
    Prone = 2


class WorldCurriculum:
    LearnShooting = 0
    FullMatch = 1


@struct.dataclass
class Actions:
    """Per-agent actions (reference src/types.hpp:173-193).

    discrete: moveAmount [0,2], moveAngle [0,7], fire {0: none, 1: fire,
    2: reload}, stand {0,1,2}; aim buckets yaw [0,12], pitch [0,6];
    continuous aim rates (rad/s) are normally zero for policy agents and are
    written by the scripted bot (applyBotActionsSystem, sim.cpp:2057-2092).
    """

    move_amount: jax.Array  # [A] i32
    move_angle: jax.Array  # [A] i32
    fire: jax.Array  # [A] i32
    stand: jax.Array  # [A] i32
    aim_yaw: jax.Array  # [A] i32 bucket
    aim_pitch: jax.Array  # [A] i32 bucket
    aim_yaw_rate: jax.Array  # [A] f32 rad/s (continuous aim)
    aim_pitch_rate: jax.Array  # [A] f32

    @classmethod
    def zeros(cls, num_agents: int) -> "Actions":
        zi = jnp.zeros((num_agents,), jnp.int32)
        zf = jnp.zeros((num_agents,), jnp.float32)
        return cls(
            move_amount=zi,
            move_angle=zi,
            fire=zi,
            stand=zi,
            aim_yaw=jnp.full(
                (num_agents,), consts.discrete_aim_num_yaw_buckets // 2, jnp.int32
            ),
            aim_pitch=jnp.full(
                (num_agents,), consts.discrete_aim_num_pitch_buckets // 2, jnp.int32
            ),
            aim_yaw_rate=zf,
            aim_pitch_rate=zf,
        )


@struct.dataclass
class WorldState:
    """Full game state of one world. Leading dim A = num agents."""

    # --- kinematics ---
    pos: jax.Array  # [A, 3] f32
    vel: jax.Array  # [A, 3] f32
    yaw: jax.Array  # [A] f32
    pitch: jax.Array  # [A] f32
    stand_cur: jax.Array  # [A] i32 (Pose)
    stand_tgt: jax.Array  # [A] i32
    stand_transition: jax.Array  # [A] i32
    max_vel: jax.Array  # [A] f32 (IntermediateMoveState.maxVelocity)

    # --- combat ---
    hp: jax.Array  # [A] f32
    mag_bullets: jax.Array  # [A] i32
    mag_reloading: jax.Array  # [A] i32
    alive: jax.Array  # [A] f32 (0/1 mask, matches reference Alive)
    damage_dealt: jax.Array  # [A, max_team_size] f32, slot = attacker offset
    respawn_steps: jax.Array  # [A] i32
    autoheal_steps: jax.Array  # [A] i32
    landed_shot_on: jax.Array  # [A] i32 victim agent index, -1 = none
    successful_kill: jax.Array  # [A] bool
    was_shot_count: jax.Array  # [A] i32
    was_killed: jax.Array  # [A] bool
    fired_shot_t: jax.Array  # [A] f32 (-inf = didn't fire)
    in_zone: jax.Array  # [A] bool
    min_dist_to_zone: jax.Array  # [A] f32
    has_died: jax.Array  # [A] bool
    reloaded_full_mag: jax.Array  # [A] bool
    weapon_type: jax.Array  # [A] i32
    aim_vel_yaw: jax.Array  # [A] f32 (PvPDiscreteAimState, obs-only)
    aim_vel_pitch: jax.Array  # [A] f32

    # --- explore tracker (bit-packed 81x81 grid) ---
    start_pos: jax.Array  # [A, 3] f32
    explore_bits: jax.Array  # [A, grid_h, EXPLORE_WORDS] u32
    new_cells: jax.Array  # [A] i32

    # --- breadcrumbs (fixed pool) ---
    crumb_pos: jax.Array  # [C, 3] f32
    crumb_penalty: jax.Array  # [C] f32 (<= 0 means free slot)
    crumb_team: jax.Array  # [C] i32
    crumb_owner: jax.Array  # [C] i32 (agent idx, -1 free)
    crumb_total_penalty: jax.Array  # [A] f32
    crumb_last: jax.Array  # [A] i32 (slot idx of agent's last crumb, -1)
    crumb_steps_since: jax.Array  # [A] i32

    # --- persistent last-known opponent observations ---
    last_known_obs: jax.Array  # [A, max_team_size, OTHER_OB_DIM] f32
    last_known_pos: jax.Array  # [A, max_team_size, 3] f32 (normalized, -1000 = unknown)

    # --- previous-step sensor state consumed by the scripted bot ---
    prev_fwd_depth: jax.Array  # [A, fwd_h, fwd_w] f32
    prev_can_see: jax.Array  # [A, max_team_size] bool
    # prev-step self->teammate LOS (flankRewardSystem positioning terms,
    # reference src/sim.cpp:4233-4246; written only in Flank reward mode)
    prev_teammate_vis: jax.Array  # [A, max_team_size] bool (own-team slots)
    # set on the step this world reset. The big append/merge buffers
    # (explore_bits, crumbs, last-known obs) are NOT rewritten by the reset
    # select; their owning systems fold `where(was_reset, init, x)` into the
    # full rewrite they already do every step — so reset cost stays O(small
    # scalars) instead of O(whole state) per world (initWorld clears these
    # eagerly in the reference, src/sim.cpp:732-834)
    was_reset: jax.Array  # [] bool

    # --- full-team interface persistent last-known enemy obs ---
    # (FullTeamLastKnownEnemyObservations, types.hpp:1110-1112)
    ft_last_known: jax.Array  # [2, team_size, 14 + team_size] f32

    # --- match-level ---
    team_a: jax.Array  # i32: team index spawning at the "A" side
    cur_step: jax.Array  # i32
    is_finished: jax.Array  # bool
    win_result: jax.Array  # i32 (-1 in-progress, 0/1 team, 2 draw)
    team_kills: jax.Array  # [2] i32
    team_points: jax.Array  # [2] i32
    zone_stats: jax.Array  # [max_zones, 5] i32:
    #   (numSwaps, capturedStepsA, capturedStepsB, contestedSteps, activeSteps)

    # --- sub-zones (SimFlags.SubZones; sim/subzones.py) ---
    subzone_ctrl: jax.Array  # [8] i32 (-1 none)
    subzone_contested: jax.Array  # [8] bool
    in_subzone: jax.Array  # [A] bool
    min_dist_subzone: jax.Array  # [A] f32

    # --- zone state machine ---
    zone_cur: jax.Array  # i32
    zone_controlling: jax.Array  # i32 (-1 none)
    zone_contested: jax.Array  # bool
    zone_captured: jax.Array  # bool
    zone_earned_point: jax.Array  # bool
    zone_steps_remaining: jax.Array  # i32
    zone_steps_until_point: jax.Array  # i32

    # --- spawn usage recency (SpawnUsageCounter, types.hpp:95-100) ---
    spawn_a_used: jax.Array  # [max_spawns] u32 last-used step
    spawn_b_used: jax.Array  # [max_spawns] u32
    spawn_respawn_used: jax.Array  # [max_spawns] u32

    # --- episode bookkeeping / RNG ---
    world_idx: jax.Array  # i32, fixed per world
    episode_idx: jax.Array  # u32 (curEpisodeIdx)
    episode_counter: jax.Array  # u32 (worldEpisodeCounter)
    episode_key: jax.Array  # u32[2] raw key data of this episode's base key
    world_curriculum: jax.Array  # i32 (WorldCurriculum)
    # spawn-curriculum episode sample (MatchInfo.curCurriculumTier/SpawnIdx,
    # sampled in initWorld, sim.cpp:766-794)
    curr_spawn_active: jax.Array  # bool
    curr_spawn_tier: jax.Array  # i32
    curr_spawn_idx: jax.Array  # i32

    # --- per-agent training metadata ---
    policy_idx: jax.Array  # [A] i32
    reward_coefs: jax.Array  # [A, 9] f32
    reward: jax.Array  # [A] f32
    done: jax.Array  # [A] i32

    # --- analytics filters (sim.cpp:128-291) ---
    filters_last_match: jax.Array  # [2, 3] i32 last step each filter matched (-1)
    filters_last_all_matched: jax.Array  # [2] i32

    # --- goal regions ---
    goal_min_dist: jax.Array  # [G] f32
    goal_team_rewards: jax.Array  # [2] f32

    # --- team reward scratch ---
    team_rewards: jax.Array  # [2] f32


def init_world_state(cfg: EnvConfig, num_goal_regions: int) -> WorldState:
    """Zero-initialized state template (per world, before first reset)."""
    A = cfg.num_agents
    T = cfg.team_size
    C = cfg.breadcrumb_pool_size
    G = max(num_goal_regions, 1)

    f = jnp.float32
    i = jnp.int32

    return WorldState(
        pos=jnp.zeros((A, 3), f),
        vel=jnp.zeros((A, 3), f),
        yaw=jnp.zeros((A,), f),
        pitch=jnp.zeros((A,), f),
        stand_cur=jnp.zeros((A,), i),
        stand_tgt=jnp.zeros((A,), i),
        stand_transition=jnp.zeros((A,), i),
        max_vel=jnp.full((A,), consts.max_walk_velocity, f),
        hp=jnp.full((A,), 100.0, f),
        mag_bullets=jnp.zeros((A,), i),
        mag_reloading=jnp.zeros((A,), i),
        alive=jnp.zeros((A,), f),
        damage_dealt=jnp.zeros((A, T), f),
        respawn_steps=jnp.zeros((A,), i),
        autoheal_steps=jnp.zeros((A,), i),
        landed_shot_on=jnp.full((A,), -1, i),
        successful_kill=jnp.zeros((A,), bool),
        was_shot_count=jnp.zeros((A,), i),
        was_killed=jnp.zeros((A,), bool),
        fired_shot_t=jnp.full((A,), -jnp.inf, f),
        in_zone=jnp.zeros((A,), bool),
        min_dist_to_zone=jnp.full((A,), jnp.inf, f),
        has_died=jnp.zeros((A,), bool),
        reloaded_full_mag=jnp.zeros((A,), bool),
        weapon_type=jnp.zeros((A,), i),
        aim_vel_yaw=jnp.zeros((A,), f),
        aim_vel_pitch=jnp.zeros((A,), f),
        start_pos=jnp.zeros((A, 3), f),
        explore_bits=jnp.zeros(
            (A, consts.explore_grid_height, EXPLORE_WORDS), jnp.uint32
        ),
        new_cells=jnp.zeros((A,), i),
        crumb_pos=jnp.zeros((C, 3), f),
        crumb_penalty=jnp.zeros((C,), f),
        crumb_team=jnp.full((C,), -1, i),
        crumb_owner=jnp.full((C,), -1, i),
        crumb_total_penalty=jnp.zeros((A,), f),
        crumb_last=jnp.full((A,), -1, i),
        crumb_steps_since=jnp.zeros((A,), i),
        last_known_obs=jnp.zeros((A, T, OTHER_OB_DIM), f),
        last_known_pos=jnp.full((A, T, 3), -1000.0, f),
        prev_fwd_depth=jnp.zeros(
            (A, consts.fwd_lidar_height, consts.fwd_lidar_width), f
        ),
        prev_can_see=jnp.zeros((A, T), bool),
        prev_teammate_vis=jnp.zeros((A, T), bool),
        was_reset=jnp.zeros((), bool),
        ft_last_known=jnp.zeros((2, T, 14 + T), f),
        team_a=jnp.zeros((), i),
        cur_step=jnp.zeros((), i),
        is_finished=jnp.zeros((), bool),
        win_result=jnp.full((), -1, i),
        team_kills=jnp.zeros((2,), i),
        team_points=jnp.zeros((2,), i),
        zone_stats=jnp.zeros((consts.max_zones, 5), i),
        subzone_ctrl=jnp.full((8,), -1, i),
        subzone_contested=jnp.zeros((8,), bool),
        in_subzone=jnp.zeros((A,), bool),
        min_dist_subzone=jnp.full((A,), jnp.inf, f),
        zone_cur=jnp.zeros((), i),
        zone_controlling=jnp.full((), -1, i),
        zone_contested=jnp.zeros((), bool),
        zone_captured=jnp.zeros((), bool),
        zone_earned_point=jnp.zeros((), bool),
        zone_steps_remaining=jnp.full((), consts.num_steps_per_zone, i),
        zone_steps_until_point=jnp.full((), consts.zone_point_interval, i),
        spawn_a_used=jnp.full((consts.max_spawns,), 0xFFFFFFFF, jnp.uint32),
        spawn_b_used=jnp.full((consts.max_spawns,), 0xFFFFFFFF, jnp.uint32),
        spawn_respawn_used=jnp.full((consts.max_spawns,), 0xFFFFFFFF, jnp.uint32),
        world_idx=jnp.zeros((), i),
        episode_idx=jnp.zeros((), jnp.uint32),
        episode_counter=jnp.zeros((), jnp.uint32),
        episode_key=jnp.zeros((2,), jnp.uint32),
        world_curriculum=jnp.full((), WorldCurriculum.FullMatch, i),
        curr_spawn_active=jnp.zeros((), bool),
        curr_spawn_tier=jnp.zeros((), i),
        curr_spawn_idx=jnp.zeros((), i),
        policy_idx=jnp.zeros((A,), i),
        reward_coefs=jnp.tile(
            jnp.asarray(cfg.reward_defaults.as_tuple(), f)[None, :], (A, 1)
        ),
        reward=jnp.zeros((A,), f),
        done=jnp.zeros((A,), i),
        filters_last_match=jnp.full((2, 3), -(10 ** 6), i),
        filters_last_all_matched=jnp.full((2,), -(10 ** 6), i),
        goal_min_dist=jnp.full((G,), jnp.inf, f),
        goal_team_rewards=jnp.zeros((2,), f),
        team_rewards=jnp.zeros((2,), f),
    )
