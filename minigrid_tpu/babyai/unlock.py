"""BabyAI Unlock level family (``minigrid/envs/babyai/unlock.py``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.babyai import verifier as V
from minigrid_tpu.babyai.level import BabyAILevel
from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid_ops as G
from minigrid_tpu.core.sampling import SORTED_COLOR_IDS, rand_color

_DOOR = C.OBJECT_TO_IDX["door"]
_BALL = C.OBJECT_TO_IDX["ball"]
_BOX = C.OBJECT_TO_IDX["box"]
_KEY = C.OBJECT_TO_IDX["key"]


class Unlock(BabyAILevel):
    """Open a locked door whose key sits in another room (unlock.py:13-64)."""

    name = "Unlock"

    def gen_level(self, key, params):
        rows, cols = self.num_rows, self.num_cols
        n_rooms = rows * cols
        keys = jax.random.split(key, 10 + n_rooms)
        b = self.init_rooms(keys[0], params)

        li = jax.random.randint(keys[1], (), 0, cols)
        lj = jax.random.randint(keys[2], (), 0, rows)
        b, door, _ = self.add_door(b, keys[3], li, lj, locked=True)
        lr = lj * cols + li
        logits = jnp.where(jnp.arange(n_rooms) == lr, -jnp.inf, 0.0)
        kr = jax.random.categorical(keys[4], logits)
        b, _, _ = self.add_object(b, keys[5], params, kr % cols, kr // cols,
                                  "key", door[1].astype(jnp.int32))

        # 50%: connect with door colors excluding the locked door's color
        # (unlock.py:36-42) — both variants computed, one selected per the
        # flip by running connect_all with the excluded palette or not.
        flip = jax.random.randint(keys[6], (), 0, 2) == 0
        # faithful approximation: sample colors from 9-color palette when
        # flip, else 10; implemented by exclusion inside connect_all
        b = self.connect_all(b, keys[7],
                             exclude_color=jnp.where(
                                 flip, door[1].astype(jnp.int32), -1))

        ki = 8
        for i in range(cols):
            for j in range(rows):
                not_locked = ~((li == i) & (lj == j))
                b, _, _ = self.add_distractors(b, keys[ki], params, i, j,
                                               num_distractors=3,
                                               all_unique=False,
                                               enabled=not_locked)
                ki += 1
        b = self.place_agent_any(b, keys[ki], params, exclude_room=(li, lj))
        valid = self.objs_reachable(b, params)
        instr = V.single_clause(V.K_OPEN, V.desc(_DOOR, door[1].astype(jnp.int32)))
        return self.finish_level(b, instr, params, valid)


class UnlockLocal(BabyAILevel):
    """Fetch the key, unlock the door in the current room (unlock.py:67-84)."""

    name = "UnlockLocal"

    def __init__(self, distractors=False, **kwargs):
        self.distractors = distractors
        super().__init__(**kwargs)

    def gen_level(self, key, params):
        keys = jax.random.split(key, 5)
        b = self.init_rooms(keys[0], params)
        b, door, _ = self.add_door(b, keys[1], 1, 1, locked=True)
        b, _, _ = self.add_object(b, keys[2], params, 1, 1, "key",
                                  door[1].astype(jnp.int32))
        if self.distractors:
            b, _, _ = self.add_distractors(b, keys[3], params, 1, 1,
                                           num_distractors=3)
        b = self.place_agent_in_room(b, keys[4], params, 1, 1)
        instr = V.single_clause(V.K_OPEN, V.desc(_DOOR))
        return self.finish_level(b, instr, params)


class KeyInBox(BabyAILevel):
    """Unlock the door; the key hides in a box (unlock.py:87-105)."""

    name = "KeyInBox"

    def gen_level(self, key, params):
        keys = jax.random.split(key, 5)
        b = self.init_rooms(keys[0], params)
        if "box_contains" not in b:
            from minigrid_tpu.core.state import empty_grid

            b["box_contains"] = empty_grid(params.width, params.height)
        b, door, _ = self.add_door(b, keys[1], 1, 1, locked=True)
        box = jnp.stack([jnp.asarray(_BOX, jnp.int32), rand_color(keys[2]),
                         jnp.zeros((), jnp.int32)]).astype(jnp.uint8)
        b, pos, ok = self.place_in_room(b, keys[3], params, 1, 1, box)
        key_triple = jnp.stack([jnp.asarray(_KEY, jnp.int32),
                                door[1].astype(jnp.int32),
                                jnp.zeros((), jnp.int32)]).astype(jnp.uint8)
        b = dict(b)
        b["box_contains"] = G.put_if(b["box_contains"], pos[0], pos[1],
                                     key_triple, ok)
        b = self.place_agent_in_room(b, keys[4], params, 1, 1)
        instr = V.single_clause(V.K_OPEN, V.desc(_DOOR))
        return self.finish_level(b, instr, params)


class UnlockPickup(BabyAILevel):
    """Unlock the door, then pick up the box (unlock.py:108-135)."""

    name = "BabyAI-UnlockPickup"

    def __init__(self, distractors=False, max_steps=None, **kwargs):
        self.distractors = distractors
        room_size = 6
        if max_steps is None:
            max_steps = 8 * room_size**2
        super().__init__(num_rows=1, num_cols=2, room_size=room_size,
                         max_steps=max_steps, **kwargs)

    def gen_level(self, key, params):
        keys = jax.random.split(key, 6)
        b = self.init_rooms(keys[0], params)
        b, obj, _ = self.add_object(b, keys[1], params, 1, 0, kind="box")
        b, door, _ = self.add_door(b, keys[2], 0, 0, 0, locked=True)
        b, _, _ = self.add_object(b, keys[3], params, 0, 0, "key",
                                  door[1].astype(jnp.int32))
        if self.distractors:
            b, _, _ = self.add_distractors(b, keys[4], params,
                                           num_distractors=4)
        b = self.place_agent_in_room(b, keys[5], params, 0, 0)
        instr = V.single_clause(
            V.K_PICKUP, V.desc(obj[0].astype(jnp.int32),
                               obj[1].astype(jnp.int32)))
        return self.finish_level(b, instr, params)


class BlockedUnlockPickup(BabyAILevel):
    """Ball blocks the locked door; pick up the box (unlock.py:138-166)."""

    name = "BabyAI-BlockedUnlockPickup"

    def __init__(self, max_steps=None, **kwargs):
        room_size = 6
        if max_steps is None:
            max_steps = 16 * room_size**2
        super().__init__(num_rows=1, num_cols=2, room_size=room_size,
                         max_steps=max_steps, **kwargs)

    def gen_level(self, key, params):
        keys = jax.random.split(key, 6)
        b = self.init_rooms(keys[0], params)
        b, obj, _ = self.add_object(b, keys[1], params, 1, 0, kind="box")
        b, door, door_pos = self.add_door(b, keys[2], 0, 0, 0, locked=True)
        ball = jnp.stack([jnp.asarray(_BALL, jnp.int32), rand_color(keys[3]),
                          jnp.zeros((), jnp.int32)]).astype(jnp.uint8)
        b = dict(b)
        b["grid"] = G.put(b["grid"], door_pos[0] - 1, door_pos[1], ball)
        b, _, _ = self.add_object(b, keys[4], params, 0, 0, "key",
                                  door[1].astype(jnp.int32))
        b = self.place_agent_in_room(b, keys[5], params, 0, 0)
        instr = V.single_clause(V.K_PICKUP, V.desc(_BOX))  # type-only desc
        return self.finish_level(b, instr, params)


class UnlockToUnlock(BabyAILevel):
    """Unlock door B to reach the key for door A (unlock.py:169-202)."""

    name = "UnlockToUnlock"

    def __init__(self, max_steps=None, **kwargs):
        room_size = 6
        if max_steps is None:
            max_steps = 30 * room_size**2
        super().__init__(num_rows=1, num_cols=3, room_size=room_size,
                         max_steps=max_steps, **kwargs)

    def gen_level(self, key, params):
        keys = jax.random.split(key, 8)
        b = self.init_rooms(keys[0], params)
        colors = G.take_vec(jnp.asarray(SORTED_COLOR_IDS),
                           jax.random.permutation(keys[1], 10)[:2])
        b, _, _ = self.add_door(b, keys[2], 0, 0, 0, color=colors[0],
                                locked=True)
        b, _, _ = self.add_object(b, keys[3], params, 2, 0, "key", colors[0])
        b, _, _ = self.add_door(b, keys[4], 1, 0, 0, color=colors[1],
                                locked=True)
        b, _, _ = self.add_object(b, keys[5], params, 1, 0, "key", colors[1])
        b, _, _ = self.add_object(b, keys[6], params, 0, 0, kind="ball")
        b = self.place_agent_in_room(b, keys[7], params, 1, 0)
        instr = V.single_clause(V.K_PICKUP, V.desc(_BALL))
        return self.finish_level(b, instr, params)
