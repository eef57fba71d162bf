"""FetchEnv — pick up the named object; wrong pickup ends with 0 reward.

TPU-native re-derivation of ``minigrid/envs/fetch.py:10-176``: numObjs random
key/ball objects (duplicates allowed), one is the target; five mission syntax
templates; picking up anything terminates, reward only for the target.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid_ops as G
from minigrid_tpu.core.env import Env
from minigrid_tpu.core.sampling import rand_type_color
from minigrid_tpu.core.state import EnvParams, EnvState, base_state, empty_grid
from minigrid_tpu.core.step import StepOutcome

_SYNTAX = ["get a", "go get a", "fetch a", "go fetch a", "you must fetch a"]
_TYPE_IDS = np.asarray(
    [C.OBJECT_TO_IDX["key"], C.OBJECT_TO_IDX["ball"]], dtype=jnp.int32
)
_EMPTY_T = C.OBJECT_TO_IDX["empty"]


class FetchEnv(Env):
    name = "Fetch"

    def __init__(self, size: int = 8, numObjs: int = 3,
                 max_steps: int | None = None, **kwargs):
        self.numObjs = numObjs
        if max_steps is None:
            max_steps = 5 * size**2  # fetch.py:92
        super().__init__(grid_size=size, see_through_walls=True,
                         max_steps=max_steps, **kwargs)

    def generate(self, key: jnp.ndarray, params: EnvParams) -> EnvState:
        w, h = params.width, params.height
        keys = jax.random.split(key, 2 * self.numObjs + 4)

        grid = empty_grid(w, h)
        grid = G.wall_rect(grid, 0, 0, w, h)

        # numObjs random key/ball objects, duplicates allowed (fetch.py:118-136).
        objs = []
        for i in range(self.numObjs):
            tc = rand_type_color(keys[2 * i], _TYPE_IDS)
            triple = jnp.concatenate([tc, jnp.zeros((1,), jnp.int32)]).astype(jnp.uint8)
            grid, _, _ = G.place_obj(keys[2 * i + 1], grid, triple)
            objs.append(tc)
        objs = jnp.stack(objs)  # (numObjs, 2)

        # Agent, then target choice + mission syntax (fetch.py:139-159).
        _, agent_pos, _ = G.place_obj(keys[-4], grid, None)
        agent_dir = jax.random.randint(keys[-3], (), 0, 4, dtype=jnp.int32)
        tgt = objs[jax.random.randint(keys[-2], (), 0, self.numObjs)]
        syntax = jax.random.randint(
            jax.random.fold_in(keys[-2], 1), (), 0, 5, dtype=jnp.int32
        )
        mission = jnp.stack([syntax, tgt[1], tgt[0], jnp.zeros((), jnp.int32)])
        return base_state(grid, agent_pos, agent_dir, rng=keys[-1],
                          mission=mission, extra=tgt, has_boxes=False)

    def post_step(self, state, action, reward, terminated, outcome: StepOutcome,
                  params):
        # Any carry ends the episode; only the target pays (fetch.py:162-176).
        carrying = state.carrying[0].astype(jnp.int32) != _EMPTY_T
        match = carrying & (
            (state.carrying[0].astype(jnp.int32) == state.extra[0])
            & (state.carrying[1].astype(jnp.int32) == state.extra[1])
        )
        reward = jnp.where(carrying, jnp.where(match, self.task_reward(state, params), 0.0), reward)
        terminated = terminated | carrying
        return state, reward, terminated

    def mission_text(self, mission) -> str:
        syntax = _SYNTAX[int(mission[0])]
        color = C.IDX_TO_COLOR[int(mission[1])]
        obj = C.IDX_TO_OBJECT[int(mission[2])]
        return f"{syntax} {color} {obj}"

    def mission_codes(self):
        import numpy as np

        codes = [
            (s, c, t, 0)
            for s in range(len(_SYNTAX))
            for c in C.COLOR_TO_IDX.values()
            for t in (C.OBJECT_TO_IDX["key"], C.OBJECT_TO_IDX["ball"])
        ]
        return np.asarray(codes, dtype=np.int32)
