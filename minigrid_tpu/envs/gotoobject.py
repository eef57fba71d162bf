"""GoToObjectEnv — say `done` next to the named object.

TPU-native re-derivation of ``minigrid/envs/gotoobject.py:10-111``: numObjs
distinct (type, color) key/ball/box objects, one is the target; `done` within
the 8-neighborhood of the target pays; `toggle` terminates.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid_ops as G
from minigrid_tpu.core.env import Env
from minigrid_tpu.core.sampling import distinct_type_colors
from minigrid_tpu.core.state import EnvParams, EnvState, base_state, empty_grid
from minigrid_tpu.core.step import DONE, TOGGLE

_TYPE_IDS = np.asarray(
    [C.OBJECT_TO_IDX["key"], C.OBJECT_TO_IDX["ball"], C.OBJECT_TO_IDX["box"]],
    dtype=jnp.int32,
)


class GoToObjectEnv(Env):
    name = "GoToObject"

    def __init__(self, size: int = 6, numObjs: int = 2,
                 max_steps: int | None = None, **kwargs):
        self.numObjs = numObjs
        if max_steps is None:
            max_steps = 5 * size**2  # gotoobject.py:29
        super().__init__(grid_size=size, see_through_walls=True,
                         max_steps=max_steps, **kwargs)

    def generate(self, key: jnp.ndarray, params: EnvParams) -> EnvState:
        w, h = params.width, params.height
        keys = jax.random.split(key, self.numObjs + 5)

        grid = empty_grid(w, h)
        grid = G.wall_rect(grid, 0, 0, w, h)

        # Distinct (type, color) pairs (gotoobject.py:52-81).
        objs = distinct_type_colors(keys[0], self.numObjs, _TYPE_IDS)
        positions = []
        for i in range(self.numObjs):
            triple = jnp.concatenate(
                [objs[i], jnp.zeros((1,), jnp.int32)]
            ).astype(jnp.uint8)
            grid, pos, _ = G.place_obj(keys[i + 1], grid, triple)
            positions.append(pos)
        positions = jnp.stack(positions)

        _, agent_pos, _ = G.place_obj(keys[-4], grid, None)
        agent_dir = jax.random.randint(keys[-3], (), 0, 4, dtype=jnp.int32)

        tgt = jax.random.randint(keys[-2], (), 0, self.numObjs)
        # masked reduces, not dynamic gathers: a vmapped one-element gather
        # serializes (~86 us at batch 4096) and the fused auto-reset runs
        # this every step (see envs/gotodoor.py for the measurement)
        hot = (jnp.arange(self.numObjs) == tgt)
        tgt_obj = jnp.sum(jnp.where(hot[:, None], objs, 0), axis=0)
        tgt_pos = jnp.sum(jnp.where(hot[:, None], positions, 0), axis=0)
        mission = jnp.stack([tgt_obj[1], tgt_obj[0],
                             jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32)])
        return base_state(grid, agent_pos, agent_dir, rng=keys[-1],
                          mission=mission, extra=tgt_pos)

    def post_step(self, state, action, reward, terminated, outcome, params):
        # done within the 8-neighborhood pays; toggle terminates
        # (gotoobject.py:95-111).
        d = jnp.abs(state.agent_pos - state.extra)
        near = (d[0] <= 1) & (d[1] <= 1)
        is_done = action == DONE
        reward = jnp.where(is_done & near, self.task_reward(state, params), reward)
        terminated = terminated | is_done | (action == TOGGLE)
        return state, reward, terminated

    def mission_text(self, mission) -> str:
        return (
            f"go to the {C.IDX_TO_COLOR[int(mission[0])]} "
            f"{C.IDX_TO_OBJECT[int(mission[1])]}"
        )

    def mission_codes(self):
        import numpy as np

        types = [C.OBJECT_TO_IDX[t] for t in ("key", "ball", "box")]
        return np.asarray(
            [(c, t, 0, 0) for c in C.COLOR_TO_IDX.values() for t in types],
            dtype=np.int32,
        )
