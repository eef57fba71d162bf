"""LockedRoomEnv — six rooms off a hallway, one locked with the goal inside.

TPU-native re-derivation of ``minigrid/envs/lockedroom.py:24-174``: static
6-room geometry around a central hallway, a random locked room holding the
goal, six distinct door colors, the matching key in another random room, the
agent in the hallway.  Success is the base goal rule (no step override).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid_ops as G
from minigrid_tpu.core.env import Env
from minigrid_tpu.core.sampling import SORTED_COLOR_IDS
from minigrid_tpu.core.state import EnvParams, EnvState, base_state, empty_grid

_DOOR = C.OBJECT_TO_IDX["door"]
_KEY = C.OBJECT_TO_IDX["key"]


class LockedRoomEnv(Env):
    name = "LockedRoom"

    def __init__(self, size: int = 19, max_steps: int | None = None, **kwargs):
        self.size = size
        if max_steps is None:
            max_steps = 10 * size  # lockedroom.py:83
        super().__init__(grid_size=size, max_steps=max_steps, **kwargs)

    def _rooms(self):
        """Static (top, size, door_pos) for the six rooms
        (lockedroom.py:113-135), order: (left, right) per band."""
        w = h = self.size
        lw, rw = w // 2 - 2, w // 2 + 2
        rooms = []
        for n in range(3):
            j = n * (h // 3)
            room_w, room_h = lw + 1, h // 3 + 1
            rooms.append(((0, j), (room_w, room_h), (lw, j + 3)))
            rooms.append(((rw, j), (room_w, room_h), (rw, j + 3)))
        return rooms

    def generate(self, key: jnp.ndarray, params: EnvParams) -> EnvState:
        w = h = self.size
        lw, rw = w // 2 - 2, w // 2 + 2
        keys = jax.random.split(key, 10)

        grid = empty_grid(w, h)
        grid = G.wall_rect(grid, 0, 0, w, h)
        grid = G.vert_wall(grid, lw, 0)
        grid = G.vert_wall(grid, rw, 0)
        for n in range(3):
            j = n * (h // 3)
            grid = G.horz_wall(grid, 0, j, lw)
            grid = G.horz_wall(grid, rw, j, w - rw)

        rooms = self._rooms()
        tops = jnp.asarray([r[0] for r in rooms], jnp.int32)      # (6, 2)
        sizes = jnp.asarray([r[1] for r in rooms], jnp.int32)     # (6, 2)
        door_pos = jnp.asarray([r[2] for r in rooms], jnp.int32)  # (6, 2)

        # Locked room + goal inside (lockedroom.py:137-141; rand_pos samples
        # the interior without an emptiness check).
        locked = jax.random.randint(keys[0], (), 0, 6)
        gx = tops[locked, 0] + 1 + jax.random.randint(
            keys[1], (), 0, sizes[locked, 0] - 2)
        gy = tops[locked, 1] + 1 + jax.random.randint(
            keys[2], (), 0, sizes[locked, 1] - 2)
        grid = G.put(grid, gx, gy, C.GOAL_TRIPLE)

        # Six distinct door colors (lockedroom.py:143-152: draw-and-remove
        # from the sorted color set == permutation prefix).
        colors = jnp.asarray(SORTED_COLOR_IDS)[jax.random.permutation(keys[3], 10)[:6]]
        for r in range(6):
            state = jnp.where(locked == r, C.STATE_TO_IDX["locked"],
                              C.STATE_TO_IDX["closed"])
            door = jnp.stack([jnp.asarray(_DOOR, jnp.int32), colors[r],
                              state]).astype(jnp.uint8)
            grid = G.put(grid, door_pos[r, 0], door_pos[r, 1], door)

        # Key in a random other room (lockedroom.py:154-160).
        kr = jax.random.randint(keys[4], (), 0, 5)
        kr = kr + (kr >= locked)
        kx = tops[kr, 0] + 1 + jax.random.randint(keys[5], (), 0, sizes[kr, 0] - 2)
        ky = tops[kr, 1] + 1 + jax.random.randint(keys[6], (), 0, sizes[kr, 1] - 2)
        key_triple = jnp.stack([jnp.asarray(_KEY, jnp.int32), colors[locked],
                                jnp.zeros((), jnp.int32)]).astype(jnp.uint8)
        grid = G.put(grid, kx, ky, key_triple)

        # Agent in the hallway (lockedroom.py:163-165).
        hall = G.rect_mask(w, h, (lw, 0), (rw - lw, h))
        _, agent_pos, _ = G.place_obj(keys[7], grid, None, reject_mask=~hall)
        agent_dir = jax.random.randint(keys[8], (), 0, 4, dtype=jnp.int32)

        mission = jnp.stack([colors[locked], colors[kr],
                             jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32)])
        return base_state(grid, agent_pos, agent_dir, rng=keys[9],
                          mission=mission, has_boxes=False)

    def mission_text(self, mission) -> str:
        lc = C.IDX_TO_COLOR[int(mission[0])]
        kc = C.IDX_TO_COLOR[int(mission[1])]
        return (
            f"get the {lc} key from the {kc} room,"
            f" unlock the {lc} door and go to the goal"
        )

    def mission_codes(self):
        import numpy as np

        vals = list(C.COLOR_TO_IDX.values())
        return np.asarray(
            [(a, b, 0, 0) for a in vals for b in vals if a != b], dtype=np.int32
        )