"""KeyCorridorEnv — object behind a locked door, key hidden elsewhere.

TPU-native re-derivation of ``minigrid/envs/keycorridor.py:8-137``: a 3-column
room grid whose middle column forms a corridor (walls removed), a locked door
on a random right-side room with the target object behind it, the matching
key in a random left-side room, and connect_all for full reachability.
Picking up the target (the only object of its kind/color pair of type
``obj_type`` in the level) succeeds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core.roomgrid import RoomGridEnv
from minigrid_tpu.core.state import EnvParams, EnvState, base_state
from minigrid_tpu.core.step import PICKUP


class KeyCorridorEnv(RoomGridEnv):
    name = "KeyCorridor"

    def __init__(self, num_rows: int = 3, obj_type: str = "ball",
                 room_size: int = 6, max_steps: int | None = None, **kwargs):
        self.obj_type = obj_type
        if max_steps is None:
            max_steps = 30 * room_size**2  # keycorridor.py:90
        super().__init__(room_size=room_size, num_rows=num_rows, num_cols=3,
                         max_steps=max_steps, **kwargs)

    def generate(self, key: jnp.ndarray, params: EnvParams) -> EnvState:
        keys = jax.random.split(key, 8)
        b = self.init_rooms(keys[0], params)

        # Middle column becomes a corridor (keycorridor.py:108-110).
        for j in range(1, self.num_rows):
            b = self.remove_wall(b, 1, j, 3)

        # Locked door + target object in a random right room
        # (keycorridor.py:114-116).
        room_idx = jax.random.randint(keys[1], (), 0, self.num_rows)
        b, door, _ = self.add_door(b, keys[2], 2, room_idx, 2, locked=True)
        b, obj, _ = self.add_object(b, keys[3], params, 2, room_idx,
                                    kind=self.obj_type)

        # Matching key in a random left room (keycorridor.py:119).
        key_row = jax.random.randint(keys[4], (), 0, self.num_rows)
        b, _, _ = self.add_object(b, keys[5], params, 0, key_row, kind="key",
                                  color=door[1].astype(jnp.int32))

        # Agent mid-corridor, then connect everything (keycorridor.py:122-125).
        b = self.place_agent_in_room(b, keys[6], params, 1, self.num_rows // 2)
        b = self.connect_all(b, jax.random.fold_in(keys[6], 1))

        mission = jnp.stack([obj[1].astype(jnp.int32), obj[0].astype(jnp.int32),
                             jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32)])
        return base_state(b["grid"], b["agent_pos"], b["agent_dir"],
                          rng=keys[7], mission=mission,
                          extra=obj[:2].astype(jnp.int32))

    def post_step(self, state, action, reward, terminated, outcome, params):
        # Carrying the target after pickup succeeds (keycorridor.py:129-137).
        match = (
            (state.carrying[0].astype(jnp.int32) == state.extra[0])
            & (state.carrying[1].astype(jnp.int32) == state.extra[1])
        )
        success = (action == PICKUP) & match
        reward = jnp.where(success, self.task_reward(state, params), reward)
        return state, reward, terminated | success

    def mission_text(self, mission) -> str:
        return (
            f"pick up the {C.IDX_TO_COLOR[int(mission[0])]} "
            f"{C.IDX_TO_OBJECT[int(mission[1])]}"
        )

    def mission_codes(self):
        import numpy as np

        t = C.OBJECT_TO_IDX[self.obj_type]
        return np.asarray(
            [(c, t, 0, 0) for c in C.COLOR_TO_IDX.values()], dtype=np.int32
        )