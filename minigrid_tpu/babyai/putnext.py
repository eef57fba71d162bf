"""BabyAI PutNext level family (``minigrid/envs/babyai/putnext.py``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.babyai import verifier as V
from minigrid_tpu.babyai.level import BabyAILevel
from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid_ops as G
from minigrid_tpu.core.state import EnvParams


class PutNextLocal(BabyAILevel):
    """Put A next to B in one room (putnext.py:11-29)."""

    name = "PutNextLocal"

    def __init__(self, room_size=8, num_objs=8, **kwargs):
        self.num_objs = num_objs
        super().__init__(num_rows=1, num_cols=1, room_size=room_size, **kwargs)

    def gen_level(self, key, params):
        keys = jax.random.split(key, 4)
        b = self.init_rooms(keys[0], params)
        b = self.place_agent_in_room(b, keys[1], params, 0, 0)
        b, objs, _ = self.add_distractors(b, keys[2], params,
                                          num_distractors=self.num_objs,
                                          all_unique=True)
        valid = self.objs_reachable(b, params)
        p = jax.random.permutation(keys[3], self.num_objs)
        o1, o2 = objs[p[0]], objs[p[1]]
        instr = V.single_clause(V.K_PUTNEXT, V.desc(o1[0], o1[1]),
                                V.desc(o2[0], o2[1]))
        valid &= self.putnext_valid(b, instr, params, b["agent_pos"],
                                    b["agent_dir"])
        return self.finish_level(b, instr, params, valid)


class PutNext(BabyAILevel):
    """Move an object from one room next to one in the other
    (putnext.py:32-93)."""

    name = "PutNext"

    def __init__(self, room_size: int, objs_per_room: int,
                 start_carrying=False, max_steps=None, **kwargs):
        assert room_size >= 4 and objs_per_room <= 9
        self.objs_per_room = objs_per_room
        self.start_carrying = start_carrying
        if max_steps is None:
            max_steps = 8 * room_size**2
        super().__init__(num_rows=1, num_cols=2, room_size=room_size,
                         max_steps=max_steps, **kwargs)

    def gen_level(self, key, params):
        n = self.objs_per_room
        keys = jax.random.split(key, 7)
        b = self.init_rooms(keys[0], params)
        b = self.place_agent_in_room(b, keys[1], params, 0, 0)
        b, objs_l, pos_l = self.add_distractors(b, keys[2], params, 0, 0,
                                                num_distractors=n)
        b, objs_r, pos_r = self.add_distractors(b, keys[3], params, 1, 0,
                                                num_distractors=n)
        b = self.remove_wall(b, 0, 0, 0)
        ia = jax.random.randint(keys[4], (), 0, n)
        ib = jax.random.randint(keys[5], (), 0, n)
        flip = jax.random.randint(keys[6], (), 0, 2) == 0
        a = jnp.where(flip, objs_r[ib], objs_l[ia])
        a_pos = jnp.where(flip, pos_r[ib], pos_l[ia])
        c = jnp.where(flip, objs_l[ia], objs_r[ib])

        instr = V.single_clause(V.K_PUTNEXT, V.desc(a[0], a[1]),
                                V.desc(c[0], c[1]))
        valid = self.putnext_valid(b, instr, params, b["agent_pos"],
                                   b["agent_dir"])
        b = dict(b)
        b["carry_triple"] = jnp.concatenate(
            [a, jnp.zeros((1,), jnp.int32)]).astype(jnp.uint8)
        b["carry_pos"] = a_pos
        return self.finish_level(b, instr, params, valid)

    def post_generate(self, state, b, params: EnvParams):
        if not self.start_carrying:
            return state
        # PutNext.reset removes obj_a from the grid and puts it in hand
        # (putnext.py:84-93).  The verifier was initialised on the pre-removal
        # grid (reference order), so also move the tracked position into the
        # carry flag.
        pos = b["carry_pos"]
        grid = G.put(state.grid, pos[0], pos[1], C.EMPTY_TRIPLE)
        vs = state.extra["vs"]
        # one-hot bit clear on the packed planes (a one-cell scatter costs
        # its own kernel)
        n, w = vs.tracked1.shape
        slot0 = jnp.arange(n) == 0
        cell = V.onehot_packed(w, pos[0], pos[1])  # uint32[w]
        cell_mask = jnp.where(slot0[:, None], cell[None], jnp.uint32(0))
        # obj_a always matches desc_move (slot-0 desc1 plane); it matches
        # desc_fixed too when its (type, color) happens to satisfy desc2 —
        # the reference keeps that instance in desc_fixed.obj_set while
        # carried (verifier.py:104-131), so mirror the carry into carry2.
        match2 = jnp.any((vs.tracked2 & cell_mask) != 0, axis=1)
        vs = vs.replace(
            carry1=vs.carry1 | slot0,
            carry2=vs.carry2 | match2,
            tracked1=vs.tracked1 & ~cell_mask,
            tracked2=vs.tracked2 & ~cell_mask,
        )
        return state.replace(grid=grid, carrying=b["carry_triple"],
                             extra={**state.extra, "vs": vs})


class PutNextCarrying(PutNext):
    name = "PutNextCarrying"

    def __init__(self, room_size, objs_per_room, **kwargs):
        super().__init__(room_size, objs_per_room, start_carrying=True,
                         **kwargs)
