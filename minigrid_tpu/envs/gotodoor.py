"""GoToDoorEnv — say `done` next to the named door.

TPU-native re-derivation of ``minigrid/envs/gotodoor.py:10-149``: a randomly
sized walled room with four distinctly-colored doors on its borders; `done`
adjacent to the target door pays, `toggle` always terminates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid_ops as G
from minigrid_tpu.core.env import Env
from minigrid_tpu.core.sampling import SORTED_COLOR_IDS
from minigrid_tpu.core.state import EnvParams, EnvState, base_state, empty_grid
from minigrid_tpu.core.step import DONE, TOGGLE

_DOOR = C.OBJECT_TO_IDX["door"]
_CLOSED = C.STATE_TO_IDX["closed"]


class GoToDoorEnv(Env):
    name = "GoToDoor"

    def __init__(self, size: int = 5, max_steps: int | None = None, **kwargs):
        assert size >= 5
        if max_steps is None:
            max_steps = 4 * size**2  # gotodoor.py:75
        super().__init__(grid_size=size, see_through_walls=True,
                         max_steps=max_steps, **kwargs)

    def generate(self, key: jnp.ndarray, params: EnvParams) -> EnvState:
        wmax, hmax = params.width, params.height
        keys = jax.random.split(key, 10)

        # Randomly vary room extent (gotodoor.py:95-97).
        w = jax.random.randint(keys[0], (), 5, wmax + 1, dtype=jnp.int32)
        h = jax.random.randint(keys[1], (), 5, hmax + 1, dtype=jnp.int32)

        grid = empty_grid(wmax, hmax)
        grid = G.wall_rect(grid, 0, 0, w, h)

        # Four doors on the room borders (gotodoor.py:100-105).
        dx0 = jax.random.randint(keys[2], (), 2, w - 2, dtype=jnp.int32)
        dx1 = jax.random.randint(keys[3], (), 2, w - 2, dtype=jnp.int32)
        dy2 = jax.random.randint(keys[4], (), 2, h - 2, dtype=jnp.int32)
        dy3 = jax.random.randint(keys[5], (), 2, h - 2, dtype=jnp.int32)
        door_pos = jnp.stack([
            jnp.stack([dx0, jnp.zeros((), jnp.int32)]),
            jnp.stack([dx1, h - 1]),
            jnp.stack([jnp.zeros((), jnp.int32), dy2]),
            jnp.stack([w - 1, dy3]),
        ])  # (4, 2)

        # Four distinct colors (gotodoor.py:108-113 rejection == permutation).
        # All small-array reads below are masked reduces, NOT dynamic
        # gathers: a vmapped one-element gather lowers to a serialized
        # kCustom kernel (~86 us each at batch 4096), and the fused
        # auto-reset runs this generator every step — the gathers were
        # ~90% of GoToDoor's fused step (measured 1226 us/step vs 78 us
        # for the transition alone).
        perm4 = jax.random.permutation(keys[6], 10)[:4]  # int32[4]
        sorted_ids = jnp.asarray(SORTED_COLOR_IDS)
        colors = jnp.sum(
            jnp.where(jnp.arange(10)[None, :] == perm4[:, None],
                      sorted_ids[None, :], 0), axis=1)  # [4], one-hot reduce
        for i in range(4):
            grid = G.put(
                grid, door_pos[i, 0], door_pos[i, 1],
                jnp.stack([jnp.asarray(_DOOR, jnp.int32), colors[i],
                           jnp.asarray(_CLOSED, jnp.int32)]).astype(jnp.uint8),
            )

        # Agent inside the (possibly smaller) room (gotodoor.py:121).
        room = G.rect_mask(wmax, hmax, (0, 0), (w, h))
        _, agent_pos, _ = G.place_obj(keys[7], grid, None,
                                      reject_mask=~room)
        agent_dir = jax.random.randint(keys[8], (), 0, 4, dtype=jnp.int32)

        tgt = jax.random.randint(jax.random.fold_in(keys[8], 1), (), 0, 4)
        tgt_hot = jnp.arange(4) == tgt
        mission = jnp.stack([G.take1(colors, tgt), jnp.zeros((), jnp.int32),
                             jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32)])
        tgt_pos = jnp.sum(jnp.where(tgt_hot[:, None], door_pos, 0), axis=0)
        return base_state(grid, agent_pos, agent_dir, rng=keys[9],
                          mission=mission, extra=tgt_pos, has_boxes=False)

    def post_step(self, state, action, reward, terminated, outcome, params):
        # toggle forbidden; done next to the target door pays
        # (gotodoor.py:136-149).
        ax, ay = state.agent_pos[0], state.agent_pos[1]
        tx, ty = state.extra[0], state.extra[1]
        adjacent = ((ax == tx) & (jnp.abs(ay - ty) == 1)) | (
            (ay == ty) & (jnp.abs(ax - tx) == 1)
        )
        is_done = action == DONE
        reward = jnp.where(is_done & adjacent, self.task_reward(state, params),
                           reward)
        terminated = terminated | is_done | (action == TOGGLE)
        return state, reward, terminated

    def mission_text(self, mission) -> str:
        return f"go to the {C.IDX_TO_COLOR[int(mission[0])]} door"

    def mission_codes(self):
        import numpy as np

        return np.asarray(
            [(c, 0, 0, 0) for c in C.COLOR_TO_IDX.values()], dtype=np.int32
        )
