"""PlaygroundEnv — 3×3 rooms, colored doors, 12 random objects, no reward.

TPU-native re-derivation of ``minigrid/envs/playground.py:10-91``.
"""

from __future__ import annotations

import jax
import numpy as np

import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid_ops as G
from minigrid_tpu.core.env import Env
from minigrid_tpu.core.sampling import rand_color, rand_type_color
from minigrid_tpu.core.state import EnvParams, EnvState, base_state, empty_grid

_DOOR = C.OBJECT_TO_IDX["door"]
_TYPE_IDS = np.asarray(
    [C.OBJECT_TO_IDX["key"], C.OBJECT_TO_IDX["ball"], C.OBJECT_TO_IDX["box"]],
    dtype=jnp.int32,
)


class PlaygroundEnv(Env):
    name = "Playground"

    def __init__(self, max_steps: int = 100, **kwargs):
        super().__init__(grid_size=19, max_steps=max_steps, **kwargs)

    def generate(self, key: jnp.ndarray, params: EnvParams) -> EnvState:
        w = h = params.width
        room_w, room_h = w // 3, h // 3
        keys = jax.random.split(key, 52)
        ki = iter(range(52))

        grid = empty_grid(w, h)
        grid = G.wall_rect(grid, 0, 0, w, h)

        # Internal walls with one colored (closed) door per segment
        # (playground.py:44-66).
        for j in range(3):
            for i in range(3):
                xl, yt = i * room_w, j * room_h
                xr, yb = xl + room_w, yt + room_h
                if i + 1 < 3:
                    grid = G.vert_wall(grid, xr, yt, room_h)
                    y = yt + 1 + jax.random.randint(keys[next(ki)], (), 0,
                                                    yb - yt - 2)
                    color = rand_color(keys[next(ki)])
                    door = jnp.stack([jnp.asarray(_DOOR, jnp.int32), color,
                                      jnp.asarray(1, jnp.int32)]).astype(jnp.uint8)
                    grid = G.put(grid, xr, y, door)
                if j + 1 < 3:
                    grid = G.horz_wall(grid, xl, yb, room_w)
                    x = xl + 1 + jax.random.randint(keys[next(ki)], (), 0,
                                                    xr - xl - 2)
                    color = rand_color(keys[next(ki)])
                    door = jnp.stack([jnp.asarray(_DOOR, jnp.int32), color,
                                      jnp.asarray(1, jnp.int32)]).astype(jnp.uint8)
                    grid = G.put(grid, x, yb, door)

        _, agent_pos, _ = G.place_obj(keys[next(ki)], grid, None)
        agent_dir = jax.random.randint(keys[next(ki)], (), 0, 4, dtype=jnp.int32)

        # 12 random objects (playground.py:71-88).
        for _ in range(12):
            tc = rand_type_color(keys[next(ki)], _TYPE_IDS)
            triple = jnp.concatenate([tc, jnp.zeros((1,), jnp.int32)]).astype(jnp.uint8)
            grid, _, _ = G.place_obj(keys[next(ki)], grid, triple,
                                     agent_pos=agent_pos)

        return base_state(grid, agent_pos, agent_dir, rng=keys[next(ki)])

    def mission_text(self, mission) -> str:
        return ""
