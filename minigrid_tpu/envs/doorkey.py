"""DoorKeyEnv — locked yellow door in a random splitting wall.

TPU-native re-derivation of ``minigrid/envs/doorkey.py:9-100``: surrounding
walls, goal bottom-right, a vertical wall at a random column, agent placed on
the left side, a locked yellow door at a random row of the wall and a yellow
key on the left side.  All sampling is on-device ``jax.random``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid_ops as G
from minigrid_tpu.core.env import Env
from minigrid_tpu.core.state import EnvParams, EnvState, base_state, empty_grid

_DOOR = C.OBJECT_TO_IDX["door"]
_KEY = C.OBJECT_TO_IDX["key"]
_YELLOW = C.COLOR_TO_IDX["yellow"]
_LOCKED = C.STATE_TO_IDX["locked"]


class DoorKeyEnv(Env):
    name = "DoorKey"

    def __init__(self, size: int = 8, max_steps: int | None = None, **kwargs):
        if max_steps is None:
            max_steps = 10 * size**2  # doorkey.py:65
        super().__init__(grid_size=size, max_steps=max_steps, **kwargs)

    def generate(self, key: jnp.ndarray, params: EnvParams) -> EnvState:
        w, h = params.width, params.height
        k_split, k_agent, k_dir, k_door, k_key, k_state = jax.random.split(key, 6)

        grid = empty_grid(w, h)
        grid = G.wall_rect(grid, 0, 0, w, h)
        grid = G.put(grid, w - 2, h - 2, C.GOAL_TRIPLE)

        # Vertical splitting wall at random column (doorkey.py:86-87).
        split = jax.random.randint(k_split, (), 2, w - 2, dtype=jnp.int32)
        grid = G.vert_wall(grid, split, 0)

        # Agent and key both land on uniform distinct empty cells of the left
        # side (doorkey.py:91, 98) — one fused two-cell draw replaces the two
        # sequential place_obj passes (the distribution is identical: the key
        # draw excludes exactly the agent cell).
        left = G.is_empty(grid) & G.rect_mask(w, h, (0, 0), (split, h))
        agent_pos, key_pos, _ = G.sample_two_distinct(k_agent, left)
        agent_dir = jax.random.randint(k_dir, (), 0, 4, dtype=jnp.int32)

        # Locked yellow door in the wall (doorkey.py:94-95 — note the
        # reference samples the row from [1, width-2)).
        door_y = jax.random.randint(k_door, (), 1, w - 2, dtype=jnp.int32)
        grid = G.put(grid, split, door_y, jnp.array([_DOOR, _YELLOW, _LOCKED], jnp.uint8))
        grid = G.put(grid, key_pos[0], key_pos[1],
                     jnp.array([_KEY, _YELLOW, 0], jnp.uint8))
        return base_state(grid, agent_pos, agent_dir, rng=k_state)

    def mission_text(self, mission) -> str:
        return "use the key to open the door and then get to the goal"
