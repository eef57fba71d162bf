"""BabyAI GoTo level family (``minigrid/envs/babyai/goto.py``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.babyai import verifier as V
from minigrid_tpu.babyai.level import BabyAILevel
from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid_ops as G
from minigrid_tpu.core.state import EnvParams

_BALL = C.OBJECT_TO_IDX["ball"]
_RED = C.COLOR_TO_IDX["red"]
_BLUE = C.COLOR_TO_IDX["blue"]
_GREY = C.COLOR_TO_IDX["grey"]


class GoToRedBallGrey(BabyAILevel):
    """Go to the red ball; grey distractors (goto.py:12-34)."""

    name = "GoToRedBallGrey"

    def __init__(self, room_size=8, num_dists=7, **kwargs):
        self.num_dists = num_dists
        super().__init__(num_rows=1, num_cols=1, room_size=room_size, **kwargs)

    def gen_level(self, key, params):
        keys = jax.random.split(key, 4)
        b = self.init_rooms(keys[0], params)
        b = self.place_agent_in_room(b, keys[1], params, 0, 0)
        b, obj, _ = self.add_object(b, keys[2], params, 0, 0, "ball", _RED)
        b, _, _ = self.add_distractors(b, keys[3], params, 0, 0,
                                       num_distractors=self.num_dists,
                                       all_unique=False, color_override=_GREY)
        valid = self.objs_reachable(b, params)
        instr = V.single_clause(V.K_GOTO, V.desc(_BALL, _RED))
        return self.finish_level(b, instr, params, valid)


class GoToRedBall(BabyAILevel):
    """Go to the red ball with distractors (goto.py:37-55)."""

    name = "GoToRedBall"

    def __init__(self, room_size=8, num_dists=7, **kwargs):
        self.num_dists = num_dists
        super().__init__(num_rows=1, num_cols=1, room_size=room_size, **kwargs)

    def gen_level(self, key, params):
        keys = jax.random.split(key, 4)
        b = self.init_rooms(keys[0], params)
        b = self.place_agent_in_room(b, keys[1], params, 0, 0)
        b, obj, _ = self.add_object(b, keys[2], params, 0, 0, "ball", _RED)
        b, _, _ = self.add_distractors(b, keys[3], params, 0, 0,
                                       num_distractors=self.num_dists,
                                       all_unique=False)
        valid = self.objs_reachable(b, params)
        instr = V.single_clause(V.K_GOTO, V.desc(_BALL, _RED))
        return self.finish_level(b, instr, params, valid)


class GoToRedBallNoDists(GoToRedBall):
    """goto.py:58-64."""

    name = "GoToRedBallNoDists"

    def __init__(self, **kwargs):
        super().__init__(room_size=8, num_dists=0, **kwargs)


class GoToObj(BabyAILevel):
    """Go to the single object in an empty room (goto.py:67-79)."""

    name = "GoToObj"

    def __init__(self, room_size=8, **kwargs):
        super().__init__(num_rows=1, num_cols=1, room_size=room_size, **kwargs)

    def gen_level(self, key, params):
        keys = jax.random.split(key, 3)
        b = self.init_rooms(keys[0], params)
        b = self.place_agent_in_room(b, keys[1], params, 0, 0)
        b, objs, _ = self.add_distractors(b, keys[2], params,
                                          num_distractors=1)
        instr = V.single_clause(V.K_GOTO, V.desc(objs[0, 0], objs[0, 1]))
        return self.finish_level(b, instr, params)


class GoToLocal(BabyAILevel):
    """Go to one of several objects, single room (goto.py:82-96)."""

    name = "GoToLocal"

    def __init__(self, room_size=8, num_dists=8, **kwargs):
        self.num_dists = num_dists
        super().__init__(num_rows=1, num_cols=1, room_size=room_size, **kwargs)

    def gen_level(self, key, params):
        keys = jax.random.split(key, 4)
        b = self.init_rooms(keys[0], params)
        b = self.place_agent_in_room(b, keys[1], params, 0, 0)
        b, objs, _ = self.add_distractors(b, keys[2], params,
                                          num_distractors=self.num_dists,
                                          all_unique=False)
        valid = self.objs_reachable(b, params)
        pick = jax.random.randint(keys[3], (), 0, self.num_dists)
        picked = jnp.sum(
            jnp.where((jnp.arange(objs.shape[0]) == pick)[:, None], objs, 0),
            axis=0)  # masked reduce, not a vmapped gather (serializes)
        instr = V.single_clause(V.K_GOTO, V.desc(picked[0], picked[1]))
        return self.finish_level(b, instr, params, valid)


class GoTo(BabyAILevel):
    """Go to an object, possibly in another room (goto.py:99-129)."""

    name = "GoTo"

    def __init__(self, room_size=8, num_rows=3, num_cols=3, num_dists=18,
                 doors_open=False, **kwargs):
        self.num_dists = num_dists
        self.doors_open = doors_open
        super().__init__(num_rows=num_rows, num_cols=num_cols,
                         room_size=room_size, **kwargs)

    def gen_level(self, key, params):
        keys = jax.random.split(key, 5)
        b = self.init_rooms(keys[0], params)
        b = self.place_agent_any(b, keys[1], params)
        b = self.connect_all(b, keys[2])
        b, objs, _ = self.add_distractors(b, keys[3], params,
                                          num_distractors=self.num_dists,
                                          all_unique=False)
        valid = self.objs_reachable(b, params)
        pick = jax.random.randint(keys[4], (), 0, self.num_dists)
        picked = jnp.sum(
            jnp.where((jnp.arange(objs.shape[0]) == pick)[:, None], objs, 0),
            axis=0)  # masked reduce, not a vmapped gather (serializes)
        instr = V.single_clause(V.K_GOTO, V.desc(picked[0], picked[1]))
        if self.doors_open:
            # open_all_doors (roomgrid_level.py:237-247)
            doors = (b["grid"] & 0xFF) == C.OBJECT_TO_IDX["door"]
            b = dict(b)
            # rewrite the packed state field (bits 16..23) to 'open'
            b["grid"] = jnp.where(
                doors,
                (b["grid"] & jnp.uint32(0x0000FFFF))
                | jnp.uint32(C.STATE_TO_IDX["open"] << 16),
                b["grid"],
            )
        return self.finish_level(b, instr, params, valid)


class GoToImpUnlock(BabyAILevel):
    """Go to an object that may sit in a locked room (goto.py:132-180)."""

    name = "GoToImpUnlock"

    def gen_level(self, key, params):
        n_keys = 9 + 2 * self.num_rows * self.num_cols
        keys = jax.random.split(key, n_keys)
        b = self.init_rooms(keys[0], params)

        # Locked door on a random room; key elsewhere (goto.py:140-153).
        li = jax.random.randint(keys[1], (), 0, self.num_cols)
        lj = jax.random.randint(keys[2], (), 0, self.num_rows)
        b, door, _ = self.add_door(b, keys[3], li, lj, locked=True)
        # key room != locked room: uniform over the rest
        n_rooms = self.num_rows * self.num_cols
        locked_r = lj * self.num_cols + li
        logits = jnp.where(jnp.arange(n_rooms) == locked_r, -jnp.inf, 0.0)
        kr = jax.random.categorical(keys[4], logits)
        b, _, _ = self.add_object(b, keys[5], params, kr % self.num_cols,
                                  kr // self.num_cols, "key",
                                  door[1].astype(jnp.int32))
        b = self.connect_all(b, keys[6])

        # 2 distractors in every unlocked room (goto.py:161-164).
        ki = 7
        for i in range(self.num_cols):
            for j in range(self.num_rows):
                not_locked = ~((li == i) & (lj == j))
                b, _, _ = self.add_distractors(
                    b, keys[ki], params, i, j, num_distractors=2,
                    all_unique=False, enabled=not_locked)
                ki += 1

        b = self.place_agent_any(b, keys[ki], params, exclude_room=(li, lj))
        valid = self.objs_reachable(b, params)

        # Target object inside the locked room (goto.py:179-180).
        b, objs, _ = self.add_distractors(b, keys[ki + 1], params, li, lj,
                                          num_distractors=1, all_unique=False)
        instr = V.single_clause(V.K_GOTO, V.desc(objs[0, 0], objs[0, 1]))
        return self.finish_level(b, instr, params, valid)


class GoToRedBlueBall(BabyAILevel):
    """Go to the single red or blue ball (goto.py:207-235)."""

    name = "GoToRedBlueBall"

    def __init__(self, room_size=8, num_dists=7, **kwargs):
        self.num_dists = num_dists
        super().__init__(num_rows=1, num_cols=1, room_size=room_size, **kwargs)

    def gen_level(self, key, params):
        keys = jax.random.split(key, 5)
        b = self.init_rooms(keys[0], params)
        b = self.place_agent_in_room(b, keys[1], params, 0, 0)
        b, dists, _ = self.add_distractors(b, keys[2], params, 0, 0,
                                           num_distractors=self.num_dists,
                                           all_unique=False)
        # Reject red/blue ball distractors (goto.py:224-227).
        bad = jnp.any((dists[:, 0] == _BALL)
                      & ((dists[:, 1] == _RED) | (dists[:, 1] == _BLUE))) \
            if self.num_dists else jnp.asarray(False)
        color = jnp.where(jax.random.randint(keys[3], (), 0, 2) == 0,
                          _RED, _BLUE)
        b, obj, _ = self.add_object(b, keys[4], params, 0, 0, "ball", color)
        valid = self.objs_reachable(b, params) & ~bad
        instr = V.single_clause(V.K_GOTO, V.desc(_BALL, color))
        return self.finish_level(b, instr, params, valid)


class GoToDoorBabyAI(BabyAILevel):
    """Go to a door of a given color (goto.py:238-256)."""

    name = "BabyAI-GoToDoor"

    def __init__(self, **kwargs):
        super().__init__(room_size=7, **kwargs)

    def gen_level(self, key, params):
        keys = jax.random.split(key, 7)
        b = self.init_rooms(keys[0], params)
        colors = []
        for n in range(4):
            b, door, _ = self.add_door(b, keys[1 + n], 1, 1)
            colors.append(door[1].astype(jnp.int32))
        b = self.place_agent_in_room(b, keys[5], params, 1, 1)
        pick = jax.random.randint(keys[6], (), 0, 4)
        color = jnp.sum(jnp.where(jnp.arange(4) == pick,
                                  jnp.stack(colors), 0))  # masked reduce
        instr = V.single_clause(V.K_GOTO, V.desc(C.OBJECT_TO_IDX["door"], color))
        return self.finish_level(b, instr, params)


class GoToObjDoor(BabyAILevel):
    """Go to an object or door in the current room (goto.py:259-279)."""

    name = "GoToObjDoor"

    def __init__(self, **kwargs):
        super().__init__(room_size=8, **kwargs)

    def gen_level(self, key, params):
        keys = jax.random.split(key, 8)
        b = self.init_rooms(keys[0], params)
        b = self.place_agent_in_room(b, keys[1], params, 1, 1)
        b, objs, _ = self.add_distractors(b, keys[2], params, 1, 1,
                                          num_distractors=8, all_unique=False)
        door_descs = []
        for n in range(4):
            b, door, _ = self.add_door(b, keys[3 + n], 1, 1)
            door_descs.append(
                jnp.stack([jnp.asarray(C.OBJECT_TO_IDX["door"], jnp.int32),
                           door[1].astype(jnp.int32)]))
        valid = self.objs_reachable(b, params)
        cands = jnp.concatenate([objs, jnp.stack(door_descs)], axis=0)  # (12,2)
        pick = jax.random.randint(keys[7], (), 0, 12)
        instr = V.single_clause(V.K_GOTO, V.desc(G.take1(cands[:, 0], pick),
                                  G.take1(cands[:, 1], pick)))
        return self.finish_level(b, instr, params, valid)
