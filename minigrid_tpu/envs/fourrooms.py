"""FourRoomsEnv — classic four-room maze with random gaps.

TPU-native re-derivation of ``minigrid/envs/fourrooms.py:9-128``: a 19×19 grid
split into four rooms by mid walls, one random opening per internal wall
segment, random agent and goal placement.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid_ops as G
from minigrid_tpu.core.env import Env
from minigrid_tpu.core.state import EnvParams, EnvState, base_state, empty_grid


class FourRoomsEnv(Env):
    name = "FourRooms"

    def __init__(self, agent_pos=None, goal_pos=None, max_steps: int = 100, **kwargs):
        self._agent_default_pos = agent_pos
        self._goal_default_pos = goal_pos
        super().__init__(grid_size=19, max_steps=max_steps, **kwargs)

    def generate(self, key: jnp.ndarray, params: EnvParams) -> EnvState:
        w, h = params.width, params.height
        room_w, room_h = w // 2, h // 2
        keys = jax.random.split(key, 8)

        grid = empty_grid(w, h)
        grid = G.wall_rect(grid, 0, 0, w, h)

        # Internal walls with one random opening per segment
        # (fourrooms.py:93-112): vertical wall at x=room_w in both room rows,
        # horizontal wall at y=room_h in both room columns.
        grid = G.vert_wall(grid, room_w, 0, room_h)
        grid = G.vert_wall(grid, room_w, room_h, h - room_h)
        grid = G.horz_wall(grid, 0, room_h, room_w)
        grid = G.horz_wall(grid, room_w, room_h, w - room_w)

        empty = jnp.asarray(C.EMPTY_TRIPLE)
        gap0 = jax.random.randint(keys[0], (), 1, room_h, dtype=jnp.int32)
        grid = G.put(grid, room_w, gap0, empty)
        gap1 = jax.random.randint(keys[1], (), room_h + 1, h - 1, dtype=jnp.int32)
        grid = G.put(grid, room_w, gap1, empty)
        gap2 = jax.random.randint(keys[2], (), 1, room_w, dtype=jnp.int32)
        grid = G.put(grid, gap2, room_h, empty)
        gap3 = jax.random.randint(keys[3], (), room_w + 1, w - 1, dtype=jnp.int32)
        grid = G.put(grid, gap3, room_h, empty)

        # Agent then goal (fourrooms.py:114-128).
        if self._agent_default_pos is not None:
            agent_pos = jnp.asarray(self._agent_default_pos, dtype=jnp.int32)
            grid = G.put(grid, agent_pos[0], agent_pos[1], empty)
            agent_dir = jax.random.randint(keys[4], (), 0, 4, dtype=jnp.int32)
        else:
            _, agent_pos, _ = G.place_obj(keys[4], grid, None)
            agent_dir = jax.random.randint(keys[5], (), 0, 4, dtype=jnp.int32)

        if self._goal_default_pos is not None:
            grid = G.put(
                grid,
                self._goal_default_pos[0],
                self._goal_default_pos[1],
                C.GOAL_TRIPLE,
            )
        else:
            grid, _, _ = G.place_obj(
                keys[6], grid, C.GOAL_TRIPLE, agent_pos=agent_pos
            )
        return base_state(grid, agent_pos, agent_dir, rng=keys[7], has_boxes=False)

    def mission_text(self, mission) -> str:
        return "reach the goal"
