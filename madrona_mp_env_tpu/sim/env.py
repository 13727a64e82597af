"""Batched environment wrapper.

The TPU-native replacement for SimManager + Manager (reference
src/bindings.cpp:38-108, src/mgr.cpp): a pure-JAX Env whose reset/step are
jitted functions over a [num_worlds, ...] state pytree. There is no custom
call boundary — the env step composes with the policy/learner inside one
jit (SURVEY.md §3.1 collapse of device boundary #2).

Multi-device: pass a jax.sharding.Sharding for the world axis; state and
outputs are sharded, and the step is worlds-parallel with no cross-world
communication (the reference's core design, SURVEY.md §2.13).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EnvConfig
from ..assets.map_data import MapData, load_map
from . import step as step_mod
from .types import Actions, WorldState, init_world_state


class Env:
    """Batched multiplayer FPS environment.

    Usage:
        env = Env(cfg, scene_dir, num_worlds=1024, seed=5)
        state, obs = env.reset()
        state, out = env.step(state, actions)
    """

    def __init__(
        self,
        cfg: EnvConfig,
        scene_dir: str,
        num_worlds: int,
        seed: int = 5,
        map_data: Optional[MapData] = None,
        sharding: Optional[jax.sharding.Sharding] = None,
        collect_log: bool = False,
        curriculum_path: Optional[str] = None,
    ):
        self.cfg = cfg
        self.num_worlds = num_worlds
        if map_data is None:
            curriculum_snapshots = None
            if curriculum_path is not None:
                from ..data.formats import load_curriculum_snapshots

                curriculum_snapshots = load_curriculum_snapshots(
                    curriculum_path
                )
            map_data = load_map(
                scene_dir, cfg, curriculum_snapshots=curriculum_snapshots
            )
        self.map_data = map_data
        self.init_key_data = jax.random.key_data(
            jax.random.PRNGKey(seed)
        ).astype(jnp.uint32)
        self.sharding = sharding
        self.collect_log = collect_log

        cfg_static = cfg
        m = self.map_data

        def _reset(state: WorldState, sim_ctrl: jax.Array):
            f = functools.partial(
                step_mod.init_and_observe, cfg_static, m
            )
            return jax.vmap(f, in_axes=(0, None, None))(
                state, self.init_key_data, sim_ctrl
            )

        def _step(
            state: WorldState,
            actions: Actions,
            sim_ctrl: jax.Array,
            force_reset: jax.Array,
        ):
            return step_mod.step_batched(
                cfg_static, m, state, actions, self.init_key_data,
                sim_ctrl, force_reset, collect_log=collect_log,
            )

        self._reset_fn = jax.jit(_reset)
        self._step_fn = jax.jit(_step)
        self._replay_fn = None

    # ------------------------------------------------------------------
    def init_state(self) -> WorldState:
        """Blank pre-reset state for all worlds."""
        template = init_world_state(self.cfg, self.map_data.num_goal_regions)
        state = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(
                x[None], (self.num_worlds,) + x.shape
            ).copy(),
            template,
        )
        state = state.replace(
            world_idx=jnp.arange(self.num_worlds, dtype=jnp.int32)
        )
        if self.sharding is not None:
            state = jax.device_put(state, self.sharding)
        return state

    def default_sim_ctrl(self, eval_mode: bool = False) -> jax.Array:
        """TrainControl tensor [evalMode, randomizeEpisodeLength,
        randomizeTeamSides] (reference mgr.cpp:1397-1413; set per-phase from
        JAX, jax_train.py:366-377)."""
        from ..config import SimFlags

        if eval_mode:
            return jnp.array([1, 0, 0], jnp.int32)
        return jnp.array(
            [
                1 if self.cfg.has_flag(SimFlags.SimEvalMode) else 0,
                1 if self.cfg.has_flag(SimFlags.StaggerStarts) else 0,
                1 if self.cfg.has_flag(SimFlags.RandomFlipTeams) else 0,
            ],
            jnp.int32,
        )

    def reset(
        self, sim_ctrl: Optional[jax.Array] = None
    ) -> Tuple[WorldState, Dict[str, jax.Array]]:
        state = self.init_state()
        if sim_ctrl is None:
            sim_ctrl = self.default_sim_ctrl()
        return self._reset_fn(state, sim_ctrl)

    def step(
        self,
        state: WorldState,
        actions: Actions,
        sim_ctrl: Optional[jax.Array] = None,
        force_reset: Optional[jax.Array] = None,
    ) -> Tuple[WorldState, Dict[str, Any]]:
        if sim_ctrl is None:
            sim_ctrl = self.default_sim_ctrl()
        if force_reset is None:
            force_reset = jnp.zeros((self.num_worlds,), jnp.int32)
        return self._step_fn(state, actions, sim_ctrl, force_reset)

    def replay_step(
        self,
        state: WorldState,
        step_log,
        sim_ctrl: Optional[jax.Array] = None,
        force_reset: Optional[jax.Array] = None,
    ):
        """Step all worlds from a recorded StepLog pytree (leaves
        [num_worlds, 12, ...]) instead of simulating — pvpReplaySystem
        (reference sim.cpp:4794-4843)."""
        from . import replay as replay_mod

        if self._replay_fn is None:
            cfg, m, ikd = self.cfg, self.map_data, self.init_key_data

            def _replay(state, log, sim_ctrl, force_reset):
                f = functools.partial(replay_mod.replay_step_world, cfg, m)
                return jax.vmap(f, in_axes=(0, 0, None, None, 0))(
                    state, log, ikd, sim_ctrl, force_reset
                )

            self._replay_fn = jax.jit(_replay)

        if sim_ctrl is None:
            sim_ctrl = self.default_sim_ctrl(eval_mode=True)
        if force_reset is None:
            force_reset = jnp.zeros((self.num_worlds,), jnp.int32)
        return self._replay_fn(state, step_log, sim_ctrl, force_reset)

    # pure functional accessors for fused training loops -----------------
    def step_fn(self):
        """The raw jittable step for embedding in a fused actor-learner."""
        cfg, m, ikd = self.cfg, self.map_data, self.init_key_data
        collect_log = self.collect_log

        def f(state, actions, sim_ctrl, force_reset):
            return step_mod.step_batched(
                cfg, m, state, actions, ikd, sim_ctrl, force_reset,
                collect_log=collect_log,
            )

        return f

    def zero_actions(self) -> Actions:
        acts = Actions.zeros(self.cfg.num_agents)
        return jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(
                x[None], (self.num_worlds,) + x.shape
            ).copy(),
            acts,
        )
