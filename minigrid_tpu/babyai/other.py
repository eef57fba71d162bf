"""BabyAI misc level family (``minigrid/envs/babyai/other.py``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.babyai import verifier as V
from minigrid_tpu.babyai.level import BabyAILevel
from minigrid_tpu.core import constants as C

_DOOR = C.OBJECT_TO_IDX["door"]
_BALL = C.OBJECT_TO_IDX["ball"]


class ActionObjDoor(BabyAILevel):
    """Pick up / go to an object or go to / open a door (other.py:18-49)."""

    name = "ActionObjDoor"

    def __init__(self, **kwargs):
        super().__init__(room_size=7, **kwargs)

    def gen_level(self, key, params):
        keys = jax.random.split(key, 9)
        b = self.init_rooms(keys[0], params)
        b, objs, _ = self.add_distractors(b, keys[1], params, 1, 1,
                                          num_distractors=5)
        door_cands = []
        for n in range(4):
            b, door, _ = self.add_door(b, keys[2 + n], 1, 1, locked=False)
            door_cands.append(jnp.stack([jnp.asarray(_DOOR, jnp.int32),
                                         door[1].astype(jnp.int32)]))
        b = self.place_agent_in_room(b, keys[6], params, 1, 1)
        cands = jnp.concatenate([objs, jnp.stack(door_cands)], axis=0)  # (9,2)
        pick = jax.random.randint(keys[7], (), 0, 9)
        obj = jnp.sum(jnp.where((jnp.arange(9) == pick)[:, None], cands, 0),
                      axis=0)  # masked reduce
        is_door = obj[0] == _DOOR
        coin = jax.random.randint(keys[8], (), 0, 2) == 0
        kind = jnp.where(coin, V.K_GOTO,
                         jnp.where(is_door, V.K_OPEN, V.K_PICKUP))
        instr = V.single_clause(kind, V.desc(obj[0], obj[1]))
        return self.finish_level(b, instr, params)


class FindObjS5(BabyAILevel):
    """Pick up an object hidden in a random room (other.py:52-74)."""

    name = "FindObjS5"

    def __init__(self, room_size=5, max_steps=None, **kwargs):
        if max_steps is None:
            max_steps = 20 * room_size**2
        super().__init__(room_size=room_size, max_steps=max_steps, **kwargs)

    def gen_level(self, key, params):
        keys = jax.random.split(key, 5)
        b = self.init_rooms(keys[0], params)
        # note the reference swaps loop variables: i from rows, j from cols
        # (other.py:68-69) — identical distribution on the square default
        ri = jax.random.randint(keys[1], (), 0, self.num_rows)
        rj = jax.random.randint(jax.random.fold_in(keys[1], 1), (), 0,
                                self.num_cols)
        b, obj, _ = self.add_object(b, keys[2], params, ri, rj)
        b = self.place_agent_in_room(b, keys[3], params, 1, 1)
        b = self.connect_all(b, keys[4])
        instr = V.single_clause(V.K_PICKUP, V.desc(obj[0].astype(jnp.int32)))
        return self.finish_level(b, instr, params)


class KeyCorridor(BabyAILevel):
    """Ball behind a locked door, key hidden elsewhere (other.py:77-120) —
    the BabyAI variant with a type-only Pickup instruction."""

    name = "BabyAI-KeyCorridor"

    def __init__(self, num_rows=3, obj_type="ball", room_size=6,
                 max_steps=None, **kwargs):
        self.obj_type = obj_type
        if max_steps is None:
            max_steps = 30 * room_size**2
        super().__init__(room_size=room_size, num_rows=num_rows, num_cols=3,
                         max_steps=max_steps, **kwargs)

    def gen_level(self, key, params):
        keys = jax.random.split(key, 7)
        b = self.init_rooms(keys[0], params)
        for j in range(1, self.num_rows):
            b = self.remove_wall(b, 1, j, 3)
        room_idx = jax.random.randint(keys[1], (), 0, self.num_rows)
        b, door, _ = self.add_door(b, keys[2], 2, room_idx, 2, locked=True)
        b, obj, _ = self.add_object(b, keys[3], params, 2, room_idx,
                                    kind=self.obj_type)
        key_row = jax.random.randint(keys[4], (), 0, self.num_rows)
        b, _, _ = self.add_object(b, keys[5], params, 0, key_row, "key",
                                  door[1].astype(jnp.int32))
        b = self.place_agent_in_room(b, keys[6], params, 1, self.num_rows // 2)
        b = self.connect_all(b, jax.random.fold_in(keys[6], 1))
        instr = V.single_clause(V.K_PICKUP, V.desc(obj[0].astype(jnp.int32)))
        return self.finish_level(b, instr, params)


class OneRoomS8(BabyAILevel):
    """Pick up the ball in one room (other.py:123-135)."""

    name = "OneRoomS8"

    def __init__(self, room_size=8, **kwargs):
        super().__init__(room_size=room_size, num_rows=1, num_cols=1, **kwargs)

    def gen_level(self, key, params):
        keys = jax.random.split(key, 3)
        b = self.init_rooms(keys[0], params)
        b, obj, _ = self.add_object(b, keys[1], params, 0, 0, kind="ball")
        b = self.place_agent_in_room(b, keys[2], params, 0, 0)
        instr = V.single_clause(V.K_PICKUP, V.desc(_BALL))
        return self.finish_level(b, instr, params)


class MoveTwoAcross(BabyAILevel):
    """Two PutNext tasks across two rooms, sequenced (other.py:138-180)."""

    name = "MoveTwoAcross"

    def __init__(self, room_size: int, objs_per_room: int, max_steps=None,
                 **kwargs):
        assert objs_per_room <= 9
        self.objs_per_room = objs_per_room
        if max_steps is None:
            max_steps = 16 * room_size**2
        super().__init__(num_rows=1, num_cols=2, room_size=room_size,
                         max_steps=max_steps, **kwargs)

    def gen_level(self, key, params):
        n = self.objs_per_room
        keys = jax.random.split(key, 6)
        b = self.init_rooms(keys[0], params)
        b = self.place_agent_in_room(b, keys[1], params, 0, 0)
        b, objs_l, _ = self.add_distractors(b, keys[2], params, 0, 0,
                                            num_distractors=n)
        b, objs_r, _ = self.add_distractors(b, keys[3], params, 1, 0,
                                            num_distractors=n)
        b = self.remove_wall(b, 0, 0, 0)
        pl = jax.random.permutation(keys[4], n)
        pr = jax.random.permutation(keys[5], n)
        a, d = objs_l[pl[0]], objs_l[pl[1]]
        bb, c = objs_r[pr[0]], objs_r[pr[1]]
        instr = V.seq_instr(
            V.S_BEFORE,
            V.single_clause(V.K_PUTNEXT, V.desc(a[0], a[1]),
                            V.desc(bb[0], bb[1])),
            V.single_clause(V.K_PUTNEXT, V.desc(c[0], c[1]),
                            V.desc(d[0], d[1])),
        )
        valid = self.putnext_valid(b, instr, params, b["agent_pos"],
                                   b["agent_dir"])
        return self.finish_level(b, instr, params, valid)
