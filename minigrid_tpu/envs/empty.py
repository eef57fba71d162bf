"""EmptyEnv — reach the goal in an empty room.

TPU-native re-derivation of ``minigrid/envs/empty.py:9-115``: walled border,
goal in the bottom-right corner, agent at a fixed corner (default) or at a
uniform-random free cell with random direction for the ``Random`` variants
(empty.py:108-112).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid_ops as G
from minigrid_tpu.core.env import Env
from minigrid_tpu.core.state import EnvParams, EnvState, base_state, empty_grid


class EmptyEnv(Env):
    name = "Empty"

    def __init__(
        self,
        size: int = 8,
        agent_start_pos: tuple[int, int] | None = (1, 1),
        agent_start_dir: int = 0,
        max_steps: int | None = None,
        **kwargs,
    ):
        self.agent_start_pos = agent_start_pos
        self.agent_start_dir = agent_start_dir
        if max_steps is None:
            max_steps = 4 * size**2  # empty.py:82
        super().__init__(
            grid_size=size,
            max_steps=max_steps,
            see_through_walls=True,  # empty.py:88
            **kwargs,
        )

    def generate(self, key: jnp.ndarray, params: EnvParams) -> EnvState:
        w, h = params.width, params.height
        grid = empty_grid(w, h)
        grid = G.wall_rect(grid, 0, 0, w, h)
        grid = G.put(grid, w - 2, h - 2, C.GOAL_TRIPLE)

        key, k_pos, k_dir, k_state = jax.random.split(key, 4)
        if self.agent_start_pos is not None:
            pos = jnp.asarray(self.agent_start_pos, dtype=jnp.int32)
            direction = jnp.asarray(self.agent_start_dir, dtype=jnp.int32)
        else:
            _, pos, _ = G.place_obj(k_pos, grid, None)
            direction = jax.random.randint(k_dir, (), 0, 4, dtype=jnp.int32)
        return base_state(grid, pos, direction, rng=k_state, has_boxes=False)

    def mission_text(self, mission) -> str:
        return "get to the green goal square"
