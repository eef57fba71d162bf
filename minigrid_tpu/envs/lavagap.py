"""LavaGapEnv — cross a lava strip through one gap.

TPU-native re-derivation of ``minigrid/envs/lavagap.py:11-136``: agent top-left
facing east, goal bottom-right, a vertical obstacle strip at a random column
with one random gap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid_ops as G
from minigrid_tpu.core.env import Env
from minigrid_tpu.core.state import EnvParams, EnvState, base_state, empty_grid


class LavaGapEnv(Env):
    name = "LavaGap"

    def __init__(self, size: int, obstacle_type: str = "lava",
                 max_steps: int | None = None, **kwargs):
        assert size >= 5
        self.obstacle_type = obstacle_type
        if max_steps is None:
            max_steps = 4 * size**2  # lavagap.py:81
        super().__init__(grid_size=size, see_through_walls=False,
                         max_steps=max_steps, **kwargs)

    def _obstacle_triple(self) -> jnp.ndarray:
        return jnp.asarray(
            C.LAVA_TRIPLE if self.obstacle_type == "lava" else C.WALL_TRIPLE
        )

    def generate(self, key: jnp.ndarray, params: EnvParams) -> EnvState:
        w, h = params.width, params.height
        k_gx, k_gy, k_state = jax.random.split(key, 3)

        grid = empty_grid(w, h)
        grid = G.wall_rect(grid, 0, 0, w, h)
        grid = G.put(grid, w - 2, h - 2, C.GOAL_TRIPLE)

        # Random strip column and gap row (lavagap.py:119-130).
        gap_x = jax.random.randint(k_gx, (), 2, w - 2, dtype=jnp.int32)
        gap_y = jax.random.randint(k_gy, (), 1, h - 1, dtype=jnp.int32)
        grid = G.vert_wall(grid, gap_x, 1, h - 2, self._obstacle_triple())
        grid = G.put(grid, gap_x, gap_y, C.EMPTY_TRIPLE)

        return base_state(
            grid, jnp.array([1, 1], jnp.int32), jnp.asarray(0, jnp.int32),
            rng=k_state, has_boxes=False,
        )

    def mission_text(self, mission) -> str:
        if self.obstacle_type == "lava":
            return "avoid the lava and get to the green goal square"
        return "find the opening and get to the green goal square"
