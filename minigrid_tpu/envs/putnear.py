"""PutNearEnv — pick up object A and drop it next to object B.

TPU-native re-derivation of ``minigrid/envs/putnear.py:10-200``: numObjs
distinct (type, color) objects placed non-adjacently (reject_fn
putnear.py:118-124), a move object and a distinct target object; picking the
wrong object terminates; a drop attempt while carrying terminates, paying
only if the drop succeeded within the target's 8-neighborhood.
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
from minigrid_tpu.core.step import DROP, PICKUP, StepOutcome

_TYPE_IDS = np.asarray(
    [C.OBJECT_TO_IDX["key"], C.OBJECT_TO_IDX["ball"], C.OBJECT_TO_IDX["box"]],
    dtype=jnp.int32,
)
_EMPTY_T = C.OBJECT_TO_IDX["empty"]


class PutNearEnv(Env):
    name = "PutNear"

    def __init__(self, size: int = 6, numObjs: int = 2,
                 max_steps: int | None = None, **kwargs):
        self.numObjs = numObjs
        if max_steps is None:
            max_steps = 5 * size  # putnear.py:85
        super().__init__(grid_size=size, see_through_walls=True,
                         max_steps=max_steps, **kwargs)

    def generate(self, key: jnp.ndarray, params: EnvParams) -> EnvState:
        w, h = params.width, params.height
        keys = jax.random.split(key, self.numObjs + 6)

        grid = empty_grid(w, h)
        grid = G.wall_rect(grid, 0, 0, w, h)

        objs = distinct_type_colors(keys[0], self.numObjs, _TYPE_IDS)
        xs, ys = G.coords(w, h)
        near_mask = jnp.zeros((w, h), dtype=bool)
        positions = []
        for i in range(self.numObjs):
            triple = jnp.concatenate(
                [objs[i], jnp.zeros((1,), jnp.int32)]
            ).astype(jnp.uint8)
            grid, pos, _ = G.place_obj(keys[i + 1], grid, triple,
                                       reject_mask=near_mask)
            positions.append(pos)
            near_mask |= (jnp.abs(xs - pos[0]) <= 1) & (jnp.abs(ys - pos[1]) <= 1)
        positions = jnp.stack(positions)

        _, agent_pos, _ = G.place_obj(keys[-5], grid, None)
        agent_dir = jax.random.randint(keys[-4], (), 0, 4, dtype=jnp.int32)

        # Move object and a distinct target object (putnear.py:159-168).
        mv = jax.random.randint(keys[-3], (), 0, self.numObjs)
        tg = jax.random.randint(keys[-2], (), 0, self.numObjs - 1)
        tg = tg + (tg >= mv)
        mission = jnp.stack([objs[mv, 1], objs[mv, 0], objs[tg, 1], objs[tg, 0]])
        extra = {
            "move": objs[mv],  # (type, color)
            "target_pos": positions[tg],
        }
        return base_state(grid, agent_pos, agent_dir, rng=keys[-1],
                          mission=mission, extra=extra)

    def post_step(self, state, action, reward, terminated,
                  outcome: StepOutcome, params):
        move = state.extra["move"]
        tpos = state.extra["target_pos"]

        # Wrong pickup terminates (putnear.py:185-191).
        carrying = state.carrying[0].astype(jnp.int32) != _EMPTY_T
        wrong = carrying & (
            (state.carrying[0].astype(jnp.int32) != move[0])
            | (state.carrying[1].astype(jnp.int32) != move[1])
        )
        terminated = terminated | ((action == PICKUP) & wrong)

        # Drop attempt while carrying terminates; success near target pays
        # (putnear.py:193-198).
        was_carrying = outcome.prev_carrying[0].astype(jnp.int32) != _EMPTY_T
        drop_try = (action == DROP) & was_carrying
        d = jnp.abs(outcome.fwd_pos - tpos)
        success = outcome.dropped & (d[0] <= 1) & (d[1] <= 1)
        reward = jnp.where(drop_try & success, self.task_reward(state, params),
                           reward)
        terminated = terminated | drop_try
        return state, reward, terminated

    def mission_text(self, mission) -> str:
        return (
            f"put the {C.IDX_TO_COLOR[int(mission[0])]} "
            f"{C.IDX_TO_OBJECT[int(mission[1])]} near the "
            f"{C.IDX_TO_COLOR[int(mission[2])]} "
            f"{C.IDX_TO_OBJECT[int(mission[3])]}"
        )

    def mission_codes(self):
        import numpy as np

        types = [C.OBJECT_TO_IDX[t] for t in ("key", "ball", "box")]
        pairs = [(c, t) for c in C.COLOR_TO_IDX.values() for t in types]
        return np.asarray(
            [
                (mc, mt, tc, tt)
                for (mc, mt) in pairs
                for (tc, tt) in pairs
                if (mc, mt) != (tc, tt)
            ],
            dtype=np.int32,
        )
