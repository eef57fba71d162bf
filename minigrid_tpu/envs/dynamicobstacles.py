"""DynamicObstaclesEnv — moving ball obstacles, collision penalty.

TPU-native re-derivation of ``minigrid/envs/dynamicobstacles.py:13-167``.
Reference semantics preserved exactly:

* actions >= 3 are mapped to `left` (dynamicobstacles.py:138-139),
* the collision predicate is evaluated against the *pre-move* obstacle
  configuration (front cell non-empty and not goal — including walls!)
  BEFORE obstacles move (dynamicobstacles.py:142-143),
* each obstacle re-places uniformly among free cells of the 3×3 window around
  its position (its own cell is occupied during the draw, so it never stays
  put unless boxed in), sequentially so later obstacles see earlier moves
  (dynamicobstacles.py:146-156),
* walking forward into `not_clear` yields reward -1 and termination
  (dynamicobstacles.py:162-165).

Obstacle positions live in ``state.extra`` (int32[n, 2]); the per-obstacle
moves unroll statically (n is a small static constant).
"""

from __future__ import annotations

import jax
import numpy as np

import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid_ops as G
from minigrid_tpu.core.env import Env
from minigrid_tpu.core.state import EnvParams, EnvState, base_state, empty_grid
from minigrid_tpu.core.step import dir_to_vec

_BALL = np.asarray([C.OBJECT_TO_IDX["ball"], C.COLOR_TO_IDX["blue"], 0],
                    dtype=jnp.uint8)
_GOAL_T = C.OBJECT_TO_IDX["goal"]
_EMPTY_T = C.OBJECT_TO_IDX["empty"]


class DynamicObstaclesEnv(Env):
    name = "DynamicObstacles"

    def __init__(self, size: int = 8, agent_start_pos=(1, 1),
                 agent_start_dir: int = 0, n_obstacles: int = 4,
                 max_steps: int | None = None, **kwargs):
        self.agent_start_pos = agent_start_pos
        self.agent_start_dir = agent_start_dir
        # Reduce obstacles if there are too many (dynamicobstacles.py:84-88).
        if n_obstacles <= size / 2 + 1:
            self.n_obstacles = int(n_obstacles)
        else:
            self.n_obstacles = int(size / 2)
        if max_steps is None:
            max_steps = 4 * size**2
        super().__init__(grid_size=size, see_through_walls=True,
                         max_steps=max_steps, **kwargs)

    def generate(self, key: jnp.ndarray, params: EnvParams) -> EnvState:
        w, h = params.width, params.height
        keys = jax.random.split(key, self.n_obstacles + 3)

        grid = empty_grid(w, h)
        grid = G.wall_rect(grid, 0, 0, w, h)
        grid = G.put(grid, w - 2, h - 2, C.GOAL_TRIPLE)

        if self.agent_start_pos is not None:
            agent_pos = jnp.asarray(self.agent_start_pos, dtype=jnp.int32)
            agent_dir = jnp.asarray(self.agent_start_dir, dtype=jnp.int32)
        else:
            _, agent_pos, _ = G.place_obj(keys[0], grid, None)
            agent_dir = jax.random.randint(keys[1], (), 0, 4, dtype=jnp.int32)

        # Sequential obstacle placement (dynamicobstacles.py:129-132).
        positions = []
        for i in range(self.n_obstacles):
            grid, pos, _ = G.place_obj(keys[i + 2], grid, _BALL,
                                       agent_pos=agent_pos)
            positions.append(pos)
        extra = jnp.stack(positions) if positions else jnp.zeros((0, 2), jnp.int32)
        return base_state(grid, agent_pos, agent_dir, rng=keys[-1], extra=extra, has_boxes=False)

    def propose_move(self, i, key, grid, old, agent_pos, xs, ys):
        """One obstacle's proposed new cell: uniform over the empty cells of
        its 3x3 neighborhood (the reference's bounded place_obj retry,
        dynamicobstacles.py:146-156, as one masked draw).  Overridable — the
        lockstep parity test injects the reference's actual motion stream
        here to verify the transition semantics independently of the RNG."""
        window = (jnp.abs(xs - old[0]) <= 1) & (jnp.abs(ys - old[1]) <= 1)
        mask = G.is_empty(grid) & window
        mask &= ~((xs == agent_pos[0]) & (ys == agent_pos[1]))
        return G.sample_cell(jax.random.fold_in(key, i), mask)

    def step_state(self, state: EnvState, action, params: EnvParams):
        action = jnp.asarray(action, dtype=jnp.int32)
        action = jnp.where(action >= 3, 0, action)  # clamp to turn/move

        # Pre-move collision predicate (dynamicobstacles.py:142-143).
        fdx, fdy = dir_to_vec(state.agent_dir)
        fwd = state.agent_pos + jnp.stack([fdx, fdy])
        fx = jnp.clip(fwd[0], 0, params.width - 1)
        fy = jnp.clip(fwd[1], 0, params.height - 1)
        fwd_type = G.read_cell(state.grid, fx, fy)[0].astype(jnp.int32)
        not_clear = (fwd_type != _EMPTY_T) & (fwd_type != _GOAL_T)

        # Move obstacles sequentially (dynamicobstacles.py:146-156).
        state, key = self.split_rng(state)
        grid = state.grid
        positions = state.extra
        xs, ys = G.coords(params.width, params.height)
        new_positions = []
        for i in range(self.n_obstacles):
            old = positions[i]
            pos, ok = self.propose_move(i, key, grid, old, state.agent_pos,
                                        xs, ys)
            new_pos = jnp.where(ok, pos, old)
            grid = G.put_if(grid, old[0], old[1], C.EMPTY_TRIPLE, ok)
            grid = G.put(grid, new_pos[0], new_pos[1], _BALL)
            new_positions.append(new_pos)
        # stack instead of per-obstacle .at[i].set (each static-index
        # scatter costs its own kernel in the hot step)
        if new_positions:
            state = state.replace(grid=grid, extra=jnp.stack(new_positions))

        # Base transition on the post-move grid (dynamicobstacles.py:159).
        state, reward, terminated, truncated = super().step_state(
            state, action, params
        )

        # Collision override (dynamicobstacles.py:162-165).
        collided = (action == 2) & not_clear
        reward = jnp.where(collided, -1.0, reward)
        terminated = terminated | collided
        state = state.replace(terminated=terminated)
        return state, reward, terminated, truncated

    def mission_text(self, mission) -> str:
        return "get to the green goal square"
