"""DistShiftEnv — two lava strips, variant row for distribution-shift studies.

TPU-native re-derivation of ``minigrid/envs/distshift.py:9-121``: goal at
(width-2, 1), lava strips along row 1 and row ``strip2_row`` spanning columns
3..width-4, agent at a fixed or random start.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid_ops as G
from minigrid_tpu.core.env import Env
from minigrid_tpu.core.state import EnvParams, EnvState, base_state, empty_grid


class DistShiftEnv(Env):
    name = "DistShift"

    def __init__(
        self,
        width: int = 9,
        height: int = 7,
        agent_start_pos=(1, 1),
        agent_start_dir: int = 0,
        strip2_row: int = 2,
        max_steps: int | None = None,
        **kwargs,
    ):
        self.agent_start_pos = agent_start_pos
        self.agent_start_dir = agent_start_dir
        self.strip2_row = strip2_row
        if max_steps is None:
            max_steps = 4 * width * height  # distshift.py:83
        super().__init__(width=width, height=height, see_through_walls=True,
                         max_steps=max_steps, **kwargs)

    def generate(self, key: jnp.ndarray, params: EnvParams) -> EnvState:
        w, h = params.width, params.height
        k_pos, k_dir, k_state = jax.random.split(key, 3)

        grid = empty_grid(w, h)
        grid = G.wall_rect(grid, 0, 0, w, h)
        grid = G.put(grid, w - 2, 1, C.GOAL_TRIPLE)

        # Lava strips (distshift.py:110-112): columns 3 .. 3+(w-6)-1.
        grid = G.horz_wall(grid, 3, 1, w - 6, C.LAVA_TRIPLE)
        grid = G.horz_wall(grid, 3, self.strip2_row, w - 6, C.LAVA_TRIPLE)

        if self.agent_start_pos is not None:
            pos = jnp.asarray(self.agent_start_pos, dtype=jnp.int32)
            direction = jnp.asarray(self.agent_start_dir, dtype=jnp.int32)
        else:
            _, pos, _ = G.place_obj(k_pos, grid, None)
            direction = jax.random.randint(k_dir, (), 0, 4, dtype=jnp.int32)
        return base_state(grid, pos, direction, rng=k_state, has_boxes=False)

    def mission_text(self, mission) -> str:
        return "get to the green goal square"
