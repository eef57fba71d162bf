"""BabyAI Open level family (``minigrid/envs/babyai/open.py``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.babyai import verifier as V
from minigrid_tpu.babyai.level import BabyAILevel
from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid_ops as G
from minigrid_tpu.core.sampling import SORTED_COLOR_IDS

_DOOR = C.OBJECT_TO_IDX["door"]


class Open(BabyAILevel):
    """Open a door, possibly in another room (open.py:18-39)."""

    name = "Open"

    def gen_level(self, key, params):
        keys = jax.random.split(key, 6)
        b = self.init_rooms(keys[0], params)
        b = self.place_agent_any(b, keys[1], params)
        b = self.connect_all(b, keys[2])
        b, _, _ = self.add_distractors(b, keys[3], params, num_distractors=18,
                                       all_unique=False)
        valid = self.objs_reachable(b, params)
        # pick a uniform random door from the grid (open.py:29-38)
        doors = (b["grid"] & 0xFF) == _DOOR
        pos, found = jax.random.categorical(keys[4], jnp.where(
            doors.reshape(-1), 0.0, -jnp.inf)), jnp.any(doors)
        h = params.height
        color = ((b["grid"][pos // h, pos % h] >> 8) & 0xFF).astype(jnp.int32)
        instr = V.single_clause(V.K_OPEN, V.desc(_DOOR, color))
        return self.finish_level(b, instr, params, valid & found)


class OpenRedDoor(BabyAILevel):
    """Open the red door in a 2-room corridor (open.py:42-56)."""

    name = "OpenRedDoor"

    def __init__(self, **kwargs):
        super().__init__(num_rows=1, num_cols=2, room_size=5, **kwargs)

    def gen_level(self, key, params):
        keys = jax.random.split(key, 3)
        b = self.init_rooms(keys[0], params)
        b, _, _ = self.add_door(b, keys[1], 0, 0, 0,
                                color=C.COLOR_TO_IDX["red"], locked=False)
        b = self.place_agent_in_room(b, keys[2], params, 0, 0)
        instr = V.single_clause(V.K_OPEN, V.desc(_DOOR, C.COLOR_TO_IDX["red"]))
        return self.finish_level(b, instr, params)


class OpenDoor(BabyAILevel):
    """Open the door named by color or location (open.py:59-90)."""

    name = "OpenDoor"

    def __init__(self, debug=False, select_by=None, **kwargs):
        self.select_by = select_by
        self.debug = debug
        super().__init__(**kwargs)

    def gen_level(self, key, params):
        keys = jax.random.split(key, 8)
        b = self.init_rooms(keys[0], params)
        colors = G.take_vec(jnp.asarray(SORTED_COLOR_IDS),
                           jax.random.permutation(keys[1], 10)[:4])
        for i in range(4):
            b, _, _ = self.add_door(b, keys[2 + i], 1, 1, door_idx=i,
                                    color=colors[i], locked=False)
        if self.select_by is None:
            by_color = jax.random.randint(keys[6], (), 0, 2) == 0
        else:
            by_color = jnp.asarray(self.select_by == "color")
        loc = 1 + jax.random.randint(jax.random.fold_in(keys[6], 1), (), 0, 4)
        d = jnp.stack([
            jnp.asarray(4, jnp.int32),  # door
            jnp.where(by_color, colors[0], 0),
            jnp.where(by_color, 0, loc),
        ])
        b = self.place_agent_in_room(b, keys[7], params, 1, 1)
        instr = V.single_clause(V.K_OPEN, d, strict=self.debug)
        return self.finish_level(b, instr, params)


class OpenDoorColor(OpenDoor):
    name = "OpenDoorColor"

    def __init__(self, **kwargs):
        super().__init__(select_by="color", **kwargs)


class OpenDoorLoc(OpenDoor):
    name = "OpenDoorLoc"

    def __init__(self, **kwargs):
        super().__init__(select_by="loc", **kwargs)


class OpenTwoDoors(BabyAILevel):
    """Open door X, then door Y, facing opposite walls (open.py:93-137)."""

    name = "OpenTwoDoors"

    def __init__(self, first_color=None, second_color=None, strict=False,
                 max_steps=None, **kwargs):
        self.first_color = first_color
        self.second_color = second_color
        self.strict = strict
        room_size = 6
        if max_steps is None:
            max_steps = 20 * room_size**2
        super().__init__(room_size=room_size, max_steps=max_steps, **kwargs)

    def gen_level(self, key, params):
        keys = jax.random.split(key, 5)
        b = self.init_rooms(keys[0], params)
        colors = G.take_vec(jnp.asarray(SORTED_COLOR_IDS),
                           jax.random.permutation(keys[1], 10)[:2])
        c1 = (jnp.asarray(C.COLOR_TO_IDX[self.first_color])
              if self.first_color else colors[0])
        c2 = (jnp.asarray(C.COLOR_TO_IDX[self.second_color])
              if self.second_color else colors[1])
        b, _, _ = self.add_door(b, keys[2], 1, 1, 2, color=c1, locked=False)
        b, _, _ = self.add_door(b, keys[3], 1, 1, 0, color=c2, locked=False)
        b = self.place_agent_in_room(b, keys[4], params, 1, 1)
        instr = V.seq_instr(
            V.S_BEFORE,
            V.single_clause(V.K_OPEN, V.desc(_DOOR, c1), strict=self.strict),
            V.single_clause(V.K_OPEN, V.desc(_DOOR, c2)),
        )
        return self.finish_level(b, instr, params)


class OpenDoorsOrder(BabyAILevel):
    """Open one or two doors in order (open.py:140-180)."""

    name = "OpenDoorsOrder"

    def __init__(self, num_doors: int, debug=False, max_steps=None, **kwargs):
        assert num_doors >= 2
        self.num_doors = num_doors
        self.debug = debug
        room_size = 6
        if max_steps is None:
            max_steps = 20 * room_size**2
        super().__init__(room_size=room_size, max_steps=max_steps, **kwargs)

    def gen_level(self, key, params):
        n = self.num_doors
        keys = jax.random.split(key, n + 5)
        b = self.init_rooms(keys[0], params)
        colors = G.take_vec(jnp.asarray(SORTED_COLOR_IDS),
                           jax.random.permutation(keys[1], 10)[:n])
        for i in range(n):
            b, _, _ = self.add_door(b, keys[2 + i], 1, 1, color=colors[i],
                                    locked=False)
        b = self.place_agent_in_room(b, keys[n + 2], params, 1, 1)
        # two distinct doors + mode (open.py:164-180)
        p = jax.random.permutation(keys[n + 3], n)
        c1, c2 = colors[p[0]], colors[p[1]]
        mode = jax.random.randint(keys[n + 4], (), 0, 3)
        o1 = V.single_clause(V.K_OPEN, V.desc(_DOOR, c1), strict=self.debug)
        o2 = V.single_clause(V.K_OPEN, V.desc(_DOOR, c2), strict=self.debug)
        seq = V.seq_instr(jnp.where(mode == 1, V.S_BEFORE, V.S_AFTER), o1, o2)
        # mode 0: single clause — zero out operand b
        instr = V.InstrCode(
            seq_kind=jnp.where(mode == 0, V.S_SINGLE, seq.seq_kind),
            a_and=seq.a_and,
            b_and=seq.b_and & (mode != 0),
            kinds=seq.kinds * jnp.asarray([1, 1, mode != 0, mode != 0]),
            d1=seq.d1 * jnp.asarray([1, 1, mode != 0, mode != 0])[:, None],
            d2=seq.d2,
            strict=seq.strict,
        )
        return self.finish_level(b, instr, params)
