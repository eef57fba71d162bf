"""BlockedUnlockPickupEnv — a ball blocks the locked door.

TPU-native re-derivation of ``minigrid/envs/blockedunlockpickup.py:9-116``:
UnlockPickup plus a random-colored ball placed directly left of the door
(blockedunlockpickup.py:97-99).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid_ops as G
from minigrid_tpu.core.sampling import rand_color
from minigrid_tpu.core.state import EnvParams, EnvState, base_state
from minigrid_tpu.envs.unlockpickup import UnlockPickupEnv

_BALL = C.OBJECT_TO_IDX["ball"]


class BlockedUnlockPickupEnv(UnlockPickupEnv):
    name = "BlockedUnlockPickup"

    def __init__(self, max_steps: int | None = None, **kwargs):
        room_size = 6
        if max_steps is None:
            max_steps = 16 * room_size**2  # blockedunlockpickup.py:75
        super().__init__(max_steps=max_steps, **kwargs)

    def generate(self, key: jnp.ndarray, params: EnvParams) -> EnvState:
        keys = jax.random.split(key, 7)
        b = self.init_rooms(keys[0], params)
        b, obj, _ = self.add_object(b, keys[1], params, 1, 0, kind="box")
        b, door, door_pos = self.add_door(b, keys[2], 0, 0, 0, locked=True)
        # Ball blocking the door (blockedunlockpickup.py:97-99).
        ball_color = rand_color(keys[3])
        ball = jnp.stack([jnp.asarray(_BALL, jnp.int32), ball_color,
                          jnp.zeros((), jnp.int32)]).astype(jnp.uint8)
        b = dict(b)
        b["grid"] = G.put(b["grid"], door_pos[0] - 1, door_pos[1], ball)
        b, _, _ = self.add_object(b, keys[4], params, 0, 0, kind="key",
                                  color=door[1].astype(jnp.int32))
        b = self.place_agent_in_room(b, keys[5], params, 0, 0)
        mission = jnp.stack([obj[1].astype(jnp.int32), obj[0].astype(jnp.int32),
                             jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32)])
        return base_state(b["grid"], b["agent_pos"], b["agent_dir"],
                          rng=keys[6], mission=mission,
                          extra=obj[:2].astype(jnp.int32))

    def mission_text(self, mission) -> str:
        return (
            f"pick up the {C.IDX_TO_COLOR[int(mission[0])]} "
            f"{C.IDX_TO_OBJECT[int(mission[1])]}"
        )

    def mission_codes(self):
        import numpy as np

        return np.asarray(
            [(c, C.OBJECT_TO_IDX[t], 0, 0)
             for c in C.COLOR_TO_IDX.values() for t in ("box", "key")],
            dtype=np.int32,
        )