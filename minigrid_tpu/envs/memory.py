"""MemoryEnv — T-maze: remember the start object, go to its match.

TPU-native re-derivation of ``minigrid/envs/memory.py:12-165``: a start room
holding a green key or ball, a hallway (optionally of random length), and two
candidate objects at the end; stepping onto the cell in front of the matching
object succeeds, the other fails.  `pickup` is aliased to `toggle`
(memory.py:154-155).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid_ops as G
from minigrid_tpu.core.env import Env
from minigrid_tpu.core.state import EnvParams, EnvState, base_state, empty_grid
from minigrid_tpu.core.step import PICKUP, TOGGLE

_KEY = C.OBJECT_TO_IDX["key"]
_BALL = C.OBJECT_TO_IDX["ball"]
_GREEN = C.COLOR_TO_IDX["green"]


class MemoryEnv(Env):
    name = "Memory"

    def __init__(self, size: int = 8, random_length: bool = False,
                 max_steps: int | None = None, **kwargs):
        assert size % 2 == 1, "memory.py:102 requires odd height"
        self.random_length = random_length
        if max_steps is None:
            max_steps = 5 * size**2  # memory.py:77
        super().__init__(grid_size=size, see_through_walls=False,
                         max_steps=max_steps, **kwargs)

    def generate(self, key: jnp.ndarray, params: EnvParams) -> EnvState:
        w, h = params.width, params.height
        keys = jax.random.split(key, 6)
        mid = h // 2
        upper = mid - 2  # upper_room_wall
        lower = mid + 2  # lower_room_wall

        if self.random_length:
            hallway_end = jax.random.randint(keys[0], (), 4, w - 2, jnp.int32)
        else:
            hallway_end = jnp.asarray(w - 3, jnp.int32)

        grid = empty_grid(w, h)
        grid = G.wall_rect(grid, 0, 0, w, h)
        # Start room walls (memory.py:112-117).
        grid = G.horz_wall(grid, 1, upper, 4)
        grid = G.horz_wall(grid, 1, lower, 4)
        grid = G.put(grid, 4, upper + 1, C.WALL_TRIPLE)
        grid = G.put(grid, 4, lower - 1, C.WALL_TRIPLE)
        # Horizontal hallway (memory.py:120-122).
        xs, ys = G.coords(w, h)
        hall = (xs >= 5) & (xs < hallway_end) & ((ys == upper + 1) | (ys == lower - 1))
        grid = G.set_where(grid, hall, C.WALL_TRIPLE)
        # Vertical hallway walls (memory.py:125-128).
        vwall = ((xs == hallway_end) & (ys != mid)) | (xs == hallway_end + 2)
        grid = G.set_where(grid, vwall, C.WALL_TRIPLE)

        # Agent in the hallway (memory.py:131-133), dynamic upper bound.
        ax = jax.random.randint(keys[1], (), 1, hallway_end + 1, jnp.int32)
        agent_pos = jnp.stack([ax, jnp.asarray(mid, jnp.int32)])
        agent_dir = jnp.asarray(0, jnp.int32)

        # Objects (memory.py:136-149): start object + two candidates.
        start_is_key = jax.random.randint(keys[2], (), 0, 2) == 0
        start_t = jnp.where(start_is_key, _KEY, _BALL).astype(jnp.uint8)
        grid = G.put(grid, 1, mid - 1,
                     jnp.stack([start_t, jnp.asarray(_GREEN, jnp.uint8),
                                jnp.asarray(0, jnp.uint8)]))
        top_is_ball = jax.random.randint(keys[3], (), 0, 2) == 0
        top_t = jnp.where(top_is_ball, _BALL, _KEY).astype(jnp.uint8)
        bot_t = jnp.where(top_is_ball, _KEY, _BALL).astype(jnp.uint8)
        grid = G.put(grid, hallway_end + 1, mid - 2,
                     jnp.stack([top_t, jnp.asarray(_GREEN, jnp.uint8),
                                jnp.asarray(0, jnp.uint8)]))
        grid = G.put(grid, hallway_end + 1, mid + 2,
                     jnp.stack([bot_t, jnp.asarray(_GREEN, jnp.uint8),
                                jnp.asarray(0, jnp.uint8)]))

        # Success/failure cells (memory.py:144-149): the cell one step toward
        # the hallway from the matching/other object.
        start_matches_top = start_t == top_t
        success_y = jnp.where(start_matches_top, mid - 1, mid + 1)
        failure_y = jnp.where(start_matches_top, mid + 1, mid - 1)
        extra = {
            "success_pos": jnp.stack([hallway_end + 1, success_y]),
            "failure_pos": jnp.stack([hallway_end + 1, failure_y]),
        }
        return base_state(grid, agent_pos, agent_dir, rng=keys[5], extra=extra, has_boxes=False)

    def step_state(self, state: EnvState, action, params: EnvParams):
        action = jnp.asarray(action, jnp.int32)
        action = jnp.where(action == PICKUP, TOGGLE, action)  # memory.py:154-155
        state, reward, terminated, truncated = super().step_state(
            state, action, params
        )
        at_success = jnp.all(state.agent_pos == state.extra["success_pos"])
        at_failure = jnp.all(state.agent_pos == state.extra["failure_pos"])
        reward = jnp.where(at_success, self.task_reward(state, params),
                           jnp.where(at_failure, 0.0, reward))
        terminated = terminated | at_success | at_failure
        state = state.replace(terminated=terminated)
        return state, reward, terminated, truncated

    def mission_text(self, mission) -> str:
        return "go to the matching object at the end of the hallway"
