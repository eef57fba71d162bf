"""UnlockPickupEnv — unlock the door, then pick up the box.

TPU-native re-derivation of ``minigrid/envs/unlockpickup.py:8-106``: a box in
the right room behind a locked door, key in the left room; picking up the box
(the only box in the level, so a triple match is an identity match) succeeds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core.roomgrid import RoomGridEnv
from minigrid_tpu.core.state import EnvParams, EnvState, base_state
from minigrid_tpu.core.step import PICKUP

_EMPTY_T = C.OBJECT_TO_IDX["empty"]


class UnlockPickupEnv(RoomGridEnv):
    name = "UnlockPickup"

    def __init__(self, max_steps: int | None = None, **kwargs):
        room_size = 6
        if max_steps is None:
            max_steps = 8 * room_size**2  # unlockpickup.py:68
        super().__init__(num_rows=1, num_cols=2, room_size=room_size,
                         max_steps=max_steps, **kwargs)

    def generate(self, key: jnp.ndarray, params: EnvParams) -> EnvState:
        keys = jax.random.split(key, 6)
        b = self.init_rooms(keys[0], params)
        b, obj, _ = self.add_object(b, keys[1], params, 1, 0, kind="box")
        b, door, _ = self.add_door(b, keys[2], 0, 0, 0, locked=True)
        b, _, _ = self.add_object(b, keys[3], params, 0, 0, kind="key",
                                  color=door[1].astype(jnp.int32))
        b = self.place_agent_in_room(b, keys[4], params, 0, 0)
        mission = jnp.stack([obj[1].astype(jnp.int32), obj[0].astype(jnp.int32),
                             jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32)])
        return base_state(b["grid"], b["agent_pos"], b["agent_dir"],
                          rng=keys[5], mission=mission,
                          extra=obj[:2].astype(jnp.int32))

    def post_step(self, state, action, reward, terminated, outcome, params):
        # Carrying the target after a pickup succeeds (unlockpickup.py:98-106).
        match = (
            (state.carrying[0].astype(jnp.int32) == state.extra[0])
            & (state.carrying[1].astype(jnp.int32) == state.extra[1])
        )
        success = (action == PICKUP) & match
        reward = jnp.where(success, self.task_reward(state, params), reward)
        return state, reward, terminated | success

    def mission_text(self, mission) -> str:
        return f"pick up the {C.IDX_TO_COLOR[int(mission[0])]} box"

    def mission_codes(self):
        import numpy as np

        box = C.OBJECT_TO_IDX["box"]
        return np.asarray(
            [(c, box, 0, 0) for c in C.COLOR_TO_IDX.values()], dtype=np.int32
        )