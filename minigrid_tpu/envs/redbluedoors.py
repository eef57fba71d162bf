"""RedBlueDoorEnv — open the red door, then the blue door.

TPU-native re-derivation of ``minigrid/envs/redbluedoors.py:9-127``: a 2S×S
grid with an inner S×S room; red door in the left room wall, blue in the
right outer wall.  The ordering check compares door open-flags before and
after the transition (redbluedoors.py:105-127), so the env overrides
``step_state`` to capture the pre-step door states.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid_ops as G
from minigrid_tpu.core.env import Env
from minigrid_tpu.core.state import EnvParams, EnvState, base_state, empty_grid

_DOOR = C.OBJECT_TO_IDX["door"]
_OPEN = C.STATE_TO_IDX["open"]
_CLOSED = C.STATE_TO_IDX["closed"]


class RedBlueDoorEnv(Env):
    name = "RedBlueDoors"

    def __init__(self, size: int = 8, max_steps: int | None = None, **kwargs):
        self.size = size
        if max_steps is None:
            max_steps = 20 * size**2  # redbluedoors.py:67
        super().__init__(width=2 * size, height=size, max_steps=max_steps,
                         **kwargs)

    def generate(self, key: jnp.ndarray, params: EnvParams) -> EnvState:
        s = self.size
        keys = jax.random.split(key, 5)

        grid = empty_grid(2 * s, s)
        grid = G.wall_rect(grid, 0, 0, 2 * s, s)
        grid = G.wall_rect(grid, s // 2, 0, s, s)

        # Agent inside the inner room (redbluedoors.py:90).
        room = G.rect_mask(2 * s, s, (s // 2, 0), (s, s))
        _, agent_pos, _ = G.place_obj(keys[0], grid, None, reject_mask=~room)
        agent_dir = jax.random.randint(keys[1], (), 0, 4, dtype=jnp.int32)

        # Red door in the left inner wall, blue in the right (redbluedoors.py:93-100).
        red_y = jax.random.randint(keys[2], (), 1, s - 1, dtype=jnp.int32)
        blue_y = jax.random.randint(keys[3], (), 1, s - 1, dtype=jnp.int32)
        red_pos = jnp.stack([jnp.asarray(s // 2, jnp.int32), red_y])
        blue_pos = jnp.stack([jnp.asarray(s // 2 + s - 1, jnp.int32), blue_y])
        grid = G.put(grid, red_pos[0], red_pos[1],
                     jnp.array([_DOOR, C.COLOR_TO_IDX["red"], _CLOSED], jnp.uint8))
        grid = G.put(grid, blue_pos[0], blue_pos[1],
                     jnp.array([_DOOR, C.COLOR_TO_IDX["blue"], _CLOSED], jnp.uint8))

        extra = {"red_pos": red_pos, "blue_pos": blue_pos}
        return base_state(grid, agent_pos, agent_dir, rng=keys[4], extra=extra, has_boxes=False)

    def step_state(self, state: EnvState, action, params: EnvParams):
        red_pos, blue_pos = state.extra["red_pos"], state.extra["blue_pos"]
        red_before = G.read_cell(state.grid, red_pos[0], red_pos[1])[2] == _OPEN
        blue_before = G.read_cell(state.grid, blue_pos[0], blue_pos[1])[2] == _OPEN

        state, reward, terminated, truncated = super().step_state(
            state, action, params
        )

        red_after = G.read_cell(state.grid, red_pos[0], red_pos[1])[2] == _OPEN
        blue_after = G.read_cell(state.grid, blue_pos[0], blue_pos[1])[2] == _OPEN

        # Ordering FSM (redbluedoors.py:113-124).
        success = blue_after & red_before
        fail = (blue_after & ~red_before) | (~blue_after & red_after & blue_before)
        reward = jnp.where(success, self.task_reward(state, params),
                           jnp.where(fail, 0.0, reward))
        terminated = terminated | success | fail
        state = state.replace(terminated=terminated)
        return state, reward, terminated, truncated

    def mission_text(self, mission) -> str:
        return "open the red door then the blue door"
