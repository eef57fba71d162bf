"""BabyAI Pickup level family (``minigrid/envs/babyai/pickup.py``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import grid_ops as G
from minigrid_tpu.babyai import verifier as V
from minigrid_tpu.babyai.level import BabyAILevel
from minigrid_tpu.babyai.levelgen import LevelGen


class Pickup(BabyAILevel):
    """Pick up an object, maybe in another room (pickup.py:12-23)."""

    name = "Pickup"

    def gen_level(self, key, params):
        keys = jax.random.split(key, 5)
        b = self.init_rooms(keys[0], params)
        b = self.place_agent_any(b, keys[1], params)
        b = self.connect_all(b, keys[2])
        b, objs, _ = self.add_distractors(b, keys[3], params,
                                          num_distractors=18, all_unique=False)
        valid = self.objs_reachable(b, params)
        pick = jax.random.randint(keys[4], (), 0, 18)
        instr = V.single_clause(V.K_PICKUP, V.desc(G.take1(objs[:, 0], pick),
                                  G.take1(objs[:, 1], pick)))
        return self.finish_level(b, instr, params, valid)


class UnblockPickup(BabyAILevel):
    """Pick up an object behind obstructions (pickup.py:26-43): levels where
    everything is reachable are rejected."""

    name = "UnblockPickup"

    def gen_level(self, key, params):
        keys = jax.random.split(key, 5)
        b = self.init_rooms(keys[0], params)
        b = self.place_agent_any(b, keys[1], params)
        b = self.connect_all(b, keys[2])
        b, objs, _ = self.add_distractors(b, keys[3], params,
                                          num_distractors=20, all_unique=False)
        valid = ~self.objs_reachable(b, params)  # pickup.py:39-40
        pick = jax.random.randint(keys[4], (), 0, 20)
        instr = V.single_clause(V.K_PICKUP, V.desc(G.take1(objs[:, 0], pick),
                                  G.take1(objs[:, 1], pick)))
        return self.finish_level(b, instr, params, valid)


class PickupLoc(LevelGen):
    """Pick up an object described possibly by location (pickup.py:46-67)."""

    name = "PickupLoc"

    def __init__(self, **kwargs):
        super().__init__(action_kinds=["pickup"], instr_kinds=["action"],
                         num_rows=1, num_cols=1, num_dists=8,
                         locked_room_prob=0, locations=True, unblocking=False,
                         **kwargs)


class PickupDist(BabyAILevel):
    """Pick up an object named by type, color or both (pickup.py:70-96)."""

    name = "PickupDist"

    def __init__(self, debug=False, **kwargs):
        self.debug = debug
        super().__init__(num_rows=1, num_cols=1, room_size=7, **kwargs)

    def gen_level(self, key, params):
        keys = jax.random.split(key, 5)
        b = self.init_rooms(keys[0], params)
        b, objs, _ = self.add_distractors(b, keys[1], params, 0, 0,
                                          num_distractors=5)
        b = self.place_agent_in_room(b, keys[2], params, 0, 0)
        pick = jax.random.randint(keys[3], (), 0, 5)
        t, c = objs[pick, 0], objs[pick, 1]
        select_by = jax.random.randint(keys[4], (), 0, 3)  # type/color/both
        t = jnp.where(select_by == 1, 0, t)  # color-only: type wildcard
        c = jnp.where(select_by == 0, 0, c)  # type-only: color wildcard
        instr = V.single_clause(V.K_PICKUP, V.desc(t, c), strict=self.debug)
        return self.finish_level(b, instr, params)


class PickupDistDebug(PickupDist):
    name = "PickupDistDebug"

    def __init__(self, **kwargs):
        super().__init__(debug=True, **kwargs)


class PickupAbove(BabyAILevel):
    """Pick up the object in the room above (pickup.py:99-120)."""

    name = "PickupAbove"

    def __init__(self, max_steps=None, **kwargs):
        room_size = 6
        if max_steps is None:
            max_steps = 8 * room_size**2
        super().__init__(room_size=room_size, max_steps=max_steps, **kwargs)

    def gen_level(self, key, params):
        keys = jax.random.split(key, 5)
        b = self.init_rooms(keys[0], params)
        b, obj, _ = self.add_object(b, keys[1], params, 1, 0)
        b, _, _ = self.add_door(b, keys[2], 1, 1, 3, locked=False)
        b = self.place_agent_in_room(b, keys[3], params, 1, 1)
        b = self.connect_all(b, keys[4])
        instr = V.single_clause(
            V.K_PICKUP, V.desc(obj[0].astype(jnp.int32), obj[1].astype(jnp.int32)))
        return self.finish_level(b, instr, params)
