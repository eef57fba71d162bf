"""LevelGen — the full baby-language grammar sampler as a tensor program.

Re-derivation of ``minigrid/envs/babyai/core/levelgen.py:24-210``: optional
locked room, connect_all, distractors, agent placement outside the locked
room, and a random instruction drawn from the
{action, and, seq} × {goto, pickup, open, putnext} grammar with random object
descriptors.  ``rand_obj``'s try-until-a-match loop (levelgen.py:114-155)
becomes a fueled ``while_loop`` per descriptor; generation-level rejection
(reachability, PutNext validity) reports a validity flag consumed by the
BabyAILevel retry loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.babyai import verifier as V
from minigrid_tpu.babyai.level import BabyAILevel
from minigrid_tpu.core import constants as C
from minigrid_tpu.core.sampling import SORTED_COLOR_IDS
from minigrid_tpu.core.state import EnvParams

_DOOR = C.OBJECT_TO_IDX["door"]
_ACTION_IDS = {"goto": V.K_GOTO, "pickup": V.K_PICKUP, "open": V.K_OPEN,
               "putnext": V.K_PUTNEXT}


class LevelGen(BabyAILevel):
    name = "LevelGen"

    def __init__(self, room_size=8, num_rows=3, num_cols=3, num_dists=18,
                 locked_room_prob=0.5, locations=True, unblocking=True,
                 implicit_unlock=True,
                 action_kinds=("goto", "pickup", "open", "putnext"),
                 instr_kinds=("action", "and", "seq"), **kwargs):
        self.num_dists = num_dists
        self.locked_room_prob = locked_room_prob
        self.locations = locations
        self.unblocking = unblocking
        self.implicit_unlock = implicit_unlock
        self.action_kinds = list(action_kinds)
        self.instr_kinds = list(instr_kinds)
        super().__init__(room_size=room_size, num_rows=num_rows,
                         num_cols=num_cols, **kwargs)

    # ------------------------------------------------------------------ #

    def _rand_action_kind(self, key) -> jnp.ndarray:
        ids = jnp.asarray([_ACTION_IDS[a] for a in self.action_kinds])
        return ids[jax.random.randint(key, (), 0, len(self.action_kinds))]

    def _rand_objs(self, key_d1, key_d2, b, params, locked_rect, has_locked,
                   kinds) -> tuple[jnp.ndarray, jnp.ndarray]:
        """All 8 descriptor draws (4 d1 + 4 d2) of rand_obj
        (levelgen.py:114-155) as ONE vectorized fueled resample loop.

        Eight independent per-slot while_loops each inline a full
        desc-match graph — ~8x the trace/compile size of this single
        [8]-lane loop for the identical per-lane draw sequence: lane s
        consumes the deterministic split-chain of fold_in(key, s), and a
        finished lane's select keeps its accepted descriptor no matter how
        long the other lanes keep looping.

        The allowed type set depends on the clause kind: open -> door
        only; pickup / putnext-move -> not-door; goto / putnext-fixed ->
        any (levelgen.py:167-176)."""
        room_mask = self.agent_room_mask(b, params)
        n = kinds.shape[0]
        keys0 = jnp.stack(
            [jax.random.fold_in(key_d1, s) for s in range(n)]
            + [jax.random.fold_in(key_d2, s) for s in range(n)])
        kinds8 = jnp.concatenate([kinds, kinds])
        is_fixed8 = jnp.concatenate([jnp.zeros((n,), bool),
                                     jnp.ones((n,), bool)])

        def sample_desc(k, kind, is_fixed_slot):
            k1, k2, k3, k4 = jax.random.split(k, 4)
            # color: uniform over [None, *colors] (levelgen.py:127)
            ci = jax.random.randint(k1, (), 0, 11)
            color = jnp.where(
                ci == 0, 0,
                jnp.sum(jnp.where(jnp.arange(10) == ci - 1,
                                  jnp.asarray(SORTED_COLOR_IDS), 0)))
            # type set by kind
            u = jax.random.randint(k2, (), 0, 12)
            door_ok = (kind == V.K_OPEN)
            any_ok = (kind == V.K_GOTO) | ((kind == V.K_PUTNEXT) & is_fixed_slot)
            t_local = jnp.where(door_ok, 4,
                                jnp.where(any_ok, 1 + u % 4, 1 + u % 3))
            # loc: with prob 1/2 if enabled (levelgen.py:130-132)
            use_loc = self.locations & (jax.random.randint(k3, (), 0, 2) == 0)
            loc = jnp.where(use_loc, 1 + jax.random.randint(k4, (), 0, 4), 0)
            return jnp.stack([t_local, color, loc])

        sample_vec = jax.vmap(sample_desc)

        def ok_vec(descs):
            m = jax.vmap(V.desc_match_mask,
                         in_axes=(None, 0, None, None, None))(
                b["grid"], descs, b["agent_pos"], b["agent_dir"], room_mask)
            any_match = jnp.any(m, axis=(1, 2))
            if not self.implicit_unlock:
                # at least one match outside the locked room
                # (levelgen.py:143-151)
                outside = jnp.any(m & ~locked_rect[None], axis=(1, 2))
                any_match &= jnp.where(has_locked, outside, True)
            return any_match

        split0 = jax.vmap(jax.random.split)(keys0)
        keys, k0s = split0[:, 0], split0[:, 1]
        descs = sample_vec(k0s, kinds8, is_fixed8)

        def cond(carry):
            descs, ok, keys, nn = carry
            return jnp.any(~ok & (nn < 24))

        def body(carry):
            descs, ok, keys, nn = carry
            redo = ~ok & (nn < 24)
            sp = jax.vmap(jax.random.split)(keys)
            keys2, subs = sp[:, 0], sp[:, 1]
            cand = sample_vec(subs, kinds8, is_fixed8)
            descs = jnp.where(redo[:, None], cand, descs)
            return (descs, ok_vec(descs), keys2, nn + redo)

        descs, _, _, _ = jax.lax.while_loop(
            cond, body, (descs, ok_vec(descs), keys,
                         jnp.zeros((2 * n,), jnp.int32)))
        return descs[:n], descs[n:]

    # ------------------------------------------------------------------ #

    def gen_level(self, key, params):
        keys = jax.random.split(key, 16)
        b = self.init_rooms(keys[0], params)
        rows, cols = self.num_rows, self.num_cols

        # --- optional locked room (levelgen.py:58-61, 85-112).  Statically
        # elided when impossible: locked_room_prob == 0, or a single-room
        # grid (no internal walls — indexing the empty door table is a
        # trace-time error; caught by the conformance sweep on PickupLoc).
        use_locked = self.locked_room_prob > 0 and rows * cols > 1
        if use_locked:
            has_locked = jax.random.uniform(keys[1]) < self.locked_room_prob
            # (room, side) with an existing neighbor, uniform
            sides = []
            for r in range(rows * cols):
                i, j = r % cols, r // cols
                for s in range(4):
                    _, valid = self.wall_id_for(i, j, s)
                    sides.append(valid)
            logits = jnp.where(jnp.asarray(sides), 0.0, -jnp.inf)
            pick = jax.random.categorical(keys[2], logits)
            lr = pick // 4
            li, lj = lr % cols, lr // cols
            b, door, _ = self.add_door(b, keys[3], li, lj, pick % 4,
                                       locked=True, enabled=has_locked)
            # key in another room
            logits_k = jnp.where(jnp.arange(rows * cols) == lr, -jnp.inf, 0.0)
            kr = jax.random.categorical(keys[4], logits_k)
            b, _, _ = self.add_object(b, keys[5], params, kr % cols,
                                      kr // cols, "key",
                                      door[1].astype(jnp.int32),
                                      enabled=has_locked)
            locked_rect = self.room_rect_mask(params, li, lj) & has_locked
        else:
            has_locked = jnp.asarray(False)
            lr = jnp.asarray(0)
            li, lj = jnp.asarray(0), jnp.asarray(0)
            locked_rect = jnp.zeros((params.width, params.height), bool)

        # --- connect, distractors, agent (levelgen.py:62-73) -----------------
        b = self.connect_all(b, keys[6])
        b, _, _ = self.add_distractors(b, keys[7], params,
                                       num_distractors=self.num_dists,
                                       all_unique=False)
        exclude = (li, lj) if use_locked else None
        if exclude is not None:
            # only exclude when the locked room exists
            k_room, k_pos = jax.random.split(keys[8])
            n_rooms = rows * cols
            logits_a = jnp.where((jnp.arange(n_rooms) == lr) & has_locked,
                                 -jnp.inf, 0.0)
            room = jax.random.categorical(k_room, logits_a)
            b = self.place_agent_in_room(b, k_pos, params, room % cols,
                                         room // cols)
        else:
            b = self.place_agent_any(b, keys[8], params)

        valid = jnp.asarray(True)
        if not self.unblocking:
            valid &= self.objs_reachable(b, params)

        # --- instruction (levelgen.py:157-210) --------------------------------
        instr_kind = jax.random.randint(keys[9], (), 0, len(self.instr_kinds))
        # sample clause kinds + descs for up to 4 slots
        ck = [self._rand_action_kind(jax.random.fold_in(keys[10], s))
              for s in range(4)]
        d1, d2 = self._rand_objs(keys[11], keys[12], b, params, locked_rect,
                                 has_locked, jnp.stack(ck))

        # operand structure
        kind_names = self.instr_kinds
        is_action = jnp.asarray(kind_names.index("action")
                                if "action" in kind_names else -1) == instr_kind
        is_and = jnp.asarray(kind_names.index("and")
                             if "and" in kind_names else -1) == instr_kind
        is_seq = jnp.asarray(kind_names.index("seq")
                             if "seq" in kind_names else -1) == instr_kind
        # seq operands are action-or-and (levelgen.py:189-199)
        a_is_and = is_and | (is_seq & (jax.random.randint(keys[13], (), 0, 2) == 0))
        b_is_and = is_seq & (jax.random.randint(
            jax.random.fold_in(keys[13], 1), (), 0, 2) == 0)
        seq_code = jnp.where(
            is_action, V.S_SINGLE,
            jnp.where(is_and, V.S_AND,
                      jnp.where(jax.random.randint(keys[14], (), 0, 2) == 0,
                                V.S_BEFORE, V.S_AFTER)))
        # zero out unused slots
        use = jnp.stack([
            jnp.asarray(True),
            a_is_and & ~is_and,  # slot1 used when operand-a is an inner And
            is_and | is_seq,     # slot2 = operand b main clause
            b_is_and,
        ])
        # top-level And uses slots 0 and 2 (a_and False)
        kinds = jnp.stack(ck) * use
        instr = V.InstrCode(
            seq_kind=seq_code,
            a_and=a_is_and & ~is_and,
            b_and=b_is_and,
            kinds=kinds.astype(jnp.int32),
            d1=d1 * use[:, None],
            d2=d2 * use[:, None],
            strict=jnp.zeros((4,), bool),
        )

        # --- validation (roomgrid_level.py:145-198) ---------------------------
        valid &= self.putnext_valid(b, instr, params, b["agent_pos"],
                                    b["agent_dir"])
        if self.unblocking:
            # clauses must not name a key matching a locked door color
            g = b["grid"]
            types = (g & 0xFF).astype(jnp.int32)
            states = ((g >> 16) & 0xFF).astype(jnp.int32)
            locked_doors = (types == _DOOR) & (states == C.STATE_TO_IDX["locked"])
            colors = ((g >> 8) & 0xFF).astype(jnp.int32)
            locked_colors = jnp.any(
                locked_doors[..., None]
                & (colors[..., None] == jnp.arange(C.NUM_COLORS)),
                axis=(0, 1),
            )
            for s in range(4):
                for d in (instr.d1[s], instr.d2[s]):
                    is_key = d[0] == 3  # local key id
                    named = d[1] > 0
                    valid &= ~(use[s] & is_key & named & locked_colors[d[1]])

        return self.finish_level(b, instr, params, valid)
