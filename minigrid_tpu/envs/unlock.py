"""UnlockEnv — open the locked door.

TPU-native re-derivation of ``minigrid/envs/unlock.py:7-97``: two rooms, a
locked door between them, a matching key in the left room; toggling the door
open succeeds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid_ops as G
from minigrid_tpu.core.roomgrid import RoomGridEnv
from minigrid_tpu.core.state import EnvParams, EnvState, base_state
from minigrid_tpu.core.step import TOGGLE


class UnlockEnv(RoomGridEnv):
    name = "Unlock"

    def __init__(self, max_steps: int | None = None, **kwargs):
        room_size = 6
        if max_steps is None:
            max_steps = 8 * room_size**2  # unlock.py:61
        super().__init__(num_rows=1, num_cols=2, room_size=room_size,
                         max_steps=max_steps, **kwargs)

    def generate(self, key: jnp.ndarray, params: EnvParams) -> EnvState:
        keys = jax.random.split(key, 5)
        b = self.init_rooms(keys[0], params)
        b, door, door_pos = self.add_door(b, keys[1], 0, 0, 0, locked=True)
        b, _, _ = self.add_object(b, keys[2], params, 0, 0, kind="key",
                                  color=door[1].astype(jnp.int32))
        b = self.place_agent_in_room(b, keys[3], params, 0, 0)
        return base_state(b["grid"], b["agent_pos"], b["agent_dir"],
                          rng=keys[4], extra=door_pos)

    def post_step(self, state, action, reward, terminated, outcome, params):
        # Toggle with the door now open succeeds (unlock.py:93-97).
        dp = state.extra
        is_open = G.read_cell(state.grid, dp[0], dp[1])[2] == C.STATE_TO_IDX["open"]
        success = (action == TOGGLE) & is_open
        reward = jnp.where(success, self.task_reward(state, params), reward)
        return state, reward, terminated | success

    def mission_text(self, mission) -> str:
        return "open the door"
