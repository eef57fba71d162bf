"""Functional environment base class.

The reference ``MiniGridEnv(gym.Env)`` (minigrid/minigrid_env.py:23) couples
state and behavior in one mutable object.  The TPU-native equivalent splits
them: an :class:`Env` instance holds only *static* configuration (the
constructor kwargs of the reference env, captured as Python scalars and hence
jit-static), while all episode state lives in the :class:`EnvState` pytree.

``reset`` and ``step`` are pure and explicitly keyed:

    obs, state            = env.reset(key, params)
    obs, state, r, t, tr, info = env.step(state, action, params)

Stochastic transitions consume ``state.rng`` (split-per-use), so a step is a
deterministic function of its inputs — the property the parity suite and the
auto-reset combinator rely on.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from minigrid_tpu.core.obs import gen_obs, gen_obs_batch
from minigrid_tpu.core.state import EnvParams, EnvState
from minigrid_tpu.core.step import NUM_ACTIONS, StepOutcome, base_step


class Env:
    """Base functional env.  Subclasses implement :meth:`generate` (the
    ``_gen_grid`` analogue, minigrid_env.py:235-237) and may override
    :meth:`post_step` for task rewards/termination (the pattern of every
    reference env that overrides ``step``, e.g. envs/fetch.py:162-176)."""

    name: str = "MiniGridEnv"
    num_actions: int = NUM_ACTIONS

    def __init__(
        self,
        grid_size: int | None = None,
        width: int | None = None,
        height: int | None = None,
        max_steps: int = 100,
        see_through_walls: bool = False,
        agent_view_size: int = 7,
        **kwargs: Any,
    ):
        if grid_size is not None:
            assert width is None and height is None
            width = height = grid_size
        assert width is not None and height is not None
        assert agent_view_size % 2 == 1 and agent_view_size >= 3
        self.width = width
        self.height = height
        self.max_steps = max_steps
        self.see_through_walls = see_through_walls
        self.agent_view_size = agent_view_size

    # -- configuration ------------------------------------------------------
    @property
    def default_params(self) -> EnvParams:
        return EnvParams(
            width=self.width,
            height=self.height,
            max_steps=self.max_steps,
            agent_view_size=self.agent_view_size,
            see_through_walls=self.see_through_walls,
        )

    # -- episode generation --------------------------------------------------
    def generate(self, key: jnp.ndarray, params: EnvParams) -> EnvState:
        raise NotImplementedError

    def reset(self, key: jnp.ndarray, params: EnvParams) -> tuple[dict, EnvState]:
        state = self.generate(key, params)
        return self.observation(state, params), state

    # -- transition -----------------------------------------------------------
    def step_state(
        self, state: EnvState, action: jnp.ndarray, params: EnvParams
    ) -> tuple[EnvState, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Transition without observation (lets batch layers fuse/select state
        before paying for the obs kernel once)."""
        state, reward, terminated, truncated, outcome = base_step(
            state, action, params
        )
        state, reward, terminated = self.post_step(
            state, action, reward, terminated, outcome, params
        )
        state = state.replace(terminated=terminated)
        return state, reward, terminated, truncated

    def step(
        self, state: EnvState, action: jnp.ndarray, params: EnvParams
    ) -> tuple[dict, EnvState, jnp.ndarray, jnp.ndarray, jnp.ndarray, dict]:
        state, reward, terminated, truncated = self.step_state(state, action, params)
        obs = self.observation(state, params)
        return obs, state, reward, terminated, truncated, {}

    def post_step(
        self,
        state: EnvState,
        action: jnp.ndarray,
        reward: jnp.ndarray,
        terminated: jnp.ndarray,
        outcome: StepOutcome,
        params: EnvParams,
    ) -> tuple[EnvState, jnp.ndarray, jnp.ndarray]:
        """Task-specific reward/termination hook; default: base semantics."""
        return state, reward, terminated

    # -- observation -----------------------------------------------------------
    def observation(self, state: EnvState, params: EnvParams) -> dict:
        return gen_obs(state, params)

    def observation_batch(self, states: EnvState, params: EnvParams) -> dict:
        """Observation over a leading env-batch axis.  Families that keep the
        stock symbolic obs get the fused batched kernel path
        (:func:`minigrid_tpu.core.obs.gen_obs_batch`, one Pallas gather on
        TPU); any subclass that overrides :meth:`observation` falls back to
        vmapping its own definition."""
        if type(self).observation is Env.observation:
            return gen_obs_batch(states, params)
        return jax.vmap(lambda s: self.observation(s, params))(states)

    def observation_batch_sharded(
        self, states: EnvState, params: EnvParams, mesh, axis_name: str = "env"
    ) -> dict:
        """Batched observation with the env batch sharded over ``mesh``.

        Stock-observation families route through
        :func:`minigrid_tpu.core.obs.gen_obs_batch_sharded` (``jax.shard_map``
        around the fused Pallas gather — the explicit partitioning GSPMD
        cannot infer for an opaque Mosaic call, so every chip runs the fast
        obs program on its local shard).  Observation-overriding families
        keep the vmapped pipeline, which GSPMD partitions natively."""
        if type(self).observation is Env.observation:
            from minigrid_tpu.core.obs import gen_obs_batch_sharded

            return gen_obs_batch_sharded(states, params, mesh, axis_name)
        return self.observation_batch(states, params)

    # -- reward helper (minigrid_env.py:239-244) -------------------------------
    def task_reward(self, state: EnvState, params: EnvParams) -> jnp.ndarray:
        max_steps = jnp.where(
            state.max_steps > 0, state.max_steps, params.max_steps
        ).astype(jnp.float32)
        return 1.0 - 0.9 * (state.step_count.astype(jnp.float32) / max_steps)

    # -- missions ---------------------------------------------------------------
    def mission_text(self, mission: Any) -> str:
        """Detokenize a packed mission code to the reference's string surface."""
        return ""

    def mission_codes(self):
        """Enumerate every mission code this env can emit, as an (M, 4) int
        array (the analogue of MissionSpace's template×placeholder product,
        reference mission.py:28-77).  Tokenizing wrappers precompute their
        per-mission encodings from this table.  Default: the single zero code
        (fixed-mission envs)."""
        import numpy as np

        return np.zeros((1, 4), dtype=np.int32)

    # -- rendering -----------------------------------------------------------
    def get_frame(self, state: EnvState, params: EnvParams,
                  highlight: bool = True, tile_size: int = 32,
                  agent_pov: bool = False) -> jnp.ndarray:
        """RGB frame of the whole grid or the agent POV
        (MiniGridEnv.get_frame, minigrid_env.py:717-740)."""
        from minigrid_tpu.ops.render import get_frame

        return get_frame(state, params, highlight=highlight,
                         tile_size=tile_size, agent_pov=agent_pov)

    # -- convenience -------------------------------------------------------------
    def split_rng(self, state: EnvState) -> tuple[EnvState, jnp.ndarray]:
        """Draw a subkey from the state's stream (for stochastic steps)."""
        rng, sub = jax.random.split(state.rng)
        return state.replace(rng=rng), sub
