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
        """Closed-form generator — this runs *every step* for every env in the
        auto-reset lane, so it is built to touch the grid exactly twice.

        The free region left of the splitting wall is always the rectangle
        x∈[1, split), y∈[1, h-1) (the goal sits right of the wall since
        split ≥ 2 ≤ w-3 < w-2), so the reference's rejection-sampled
        ``place_obj`` draws (doorkey.py:91, 98) reduce to closed-form integer
        draws over that rectangle — no occupancy mask, no cumsum, no argmax.
        The border+goal base grid is a compile-time constant; the dynamic
        writes are one ``where`` (the wall column) and two scatters."""
        w, h = params.width, params.height
        k_split, k_cells, k_dir, k_door, k_state = jax.random.split(key, 5)

        # Static base: outer walls + goal bottom-right (doorkey.py:80-84).
        base = empty_grid(w, h)
        base = G.wall_rect(base, 0, 0, w, h)
        base = G.put(base, w - 2, h - 2, C.GOAL_TRIPLE)

        # Vertical splitting wall at random column (doorkey.py:86-87).
        split = jax.random.randint(k_split, (), 2, w - 2, dtype=jnp.int32)
        xs = jax.lax.broadcasted_iota(jnp.int32, (w, h), 0)
        ys = jax.lax.broadcasted_iota(jnp.int32, (w, h), 1)

        # Agent and key: two distinct uniform cells of the left interior
        # (doorkey.py:91, 98 — the key draw excludes exactly the agent cell).
        rows = h - 2
        n_free = (split - 1) * rows
        k1, k2 = jax.random.split(k_cells)
        r1 = jax.random.randint(k1, (), 0, n_free)
        r2 = jax.random.randint(k2, (), 0, n_free - 1)
        r2 = r2 + (r2 >= r1)
        agent_pos = jnp.stack([1 + r1 // rows, 1 + r1 % rows]).astype(jnp.int32)
        key_x, key_y = 1 + r2 // rows, 1 + r2 % rows
        agent_dir = jax.random.randint(k_dir, (), 0, 4, dtype=jnp.int32)

        # Locked yellow door in the wall (doorkey.py:94-95 — note the
        # reference samples the row from [1, width-2)).  All three dynamic
        # writes (wall column, door, key) are masked selects over the constant
        # base so the whole generator fuses into one elementwise kernel —
        # per-env one-cell scatters would each compile to a serialized kCustom
        # kernel (~86us at batch 4096 on v5e).
        door_y = jax.random.randint(k_door, (), 1, w - 2, dtype=jnp.int32)
        wall_mask = xs == split
        door_mask = wall_mask & (ys == door_y)
        key_mask = (xs == key_x) & (ys == key_y)
        grid = G.set_where(base, wall_mask, C.WALL_TRIPLE)
        grid = G.set_where(grid, door_mask,
                           jnp.array([_DOOR, _YELLOW, _LOCKED], jnp.uint8))
        grid = G.set_where(grid, key_mask,
                           jnp.array([_KEY, _YELLOW, 0], jnp.uint8))
        return base_state(grid, agent_pos, agent_dir, rng=k_state, has_boxes=False)

    def mission_text(self, mission) -> str:
        return "use the key to open the door and then get to the goal"
