"""MultiRoomEnv — a chain of connected rooms ending in a goal.

TPU-native re-derivation of ``minigrid/envs/multiroom.py:18-281``.  The
reference's recursive backtracking placement (``_placeRoom``,
multiroom.py:187-281) flattens to an iterative fueled chain builder:

* one *chain attempt* is a ``lax.while_loop`` placing rooms one at a time —
  each iteration samples an exit door from the previous room, a room size,
  and a top-left corner by the entry-wall rule (multiroom.py:192-212),
  accepts if in-bounds (with the reference's asymmetric bound checks,
  multiroom.py:215-218) and non-overlapping with all rooms except the
  predecessor (multiroom.py:221-232), and gives up after 8 failed tries at
  one depth (multiroom.py:245) — exactly the reference's retry budget;
* the outer retry ("keep the longest chain", multiroom.py:117-135) becomes a
  bounded best-of-A loop.

Rasterization (walls, chain doors with distinct-from-previous colors,
multiroom.py:141-177) runs as masked writes over the padded room arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid_ops as G
from minigrid_tpu.core.env import Env
from minigrid_tpu.core.sampling import SORTED_COLOR_IDS
from minigrid_tpu.core.state import EnvParams, EnvState, base_state, empty_grid

_DOOR = C.OBJECT_TO_IDX["door"]


class MultiRoomEnv(Env):
    expensive_generation = True  # recursive chain placement with retry loops
    # Episode ends desynchronize within the first rotation (goal
    # terminations scatter; staggered resets then scatter the truncations
    # too), so the batch-level cond fires its full-width chain generator
    # nearly every step.  Measured at B=4096 on v5e (PERF.md r4):
    # conditional 0.33M steps/s; pooled windows 64/32/16/8 (period=8,
    # unroll=4) → 6.1/9.0/11.4/12.2M.  The refill WORK rate (levels/step ×
    # ~15 µs chain-gen per level) is the binding cost, so smaller windows
    # are faster but refresh each pool slot more slowly (window C refreshes
    # a slot every 2B/C steps vs ~120-step episodes — stale-replay rate
    # rises accordingly).  1/128 (C=32 at B=4096) balances the two;
    # benchmark configs pass pool_refill explicitly.
    desynchronized_resets = True
    pool_refill_fraction = 1 / 128

    name = "MultiRoom"

    def __init__(self, minNumRooms: int, maxNumRooms: int, maxRoomSize: int = 10,
                 max_steps: int | None = None, num_attempts: int = 16, **kwargs):
        assert minNumRooms > 0 and maxNumRooms >= minNumRooms and maxRoomSize >= 4
        self.minNumRooms = minNumRooms
        self.maxNumRooms = maxNumRooms
        self.maxRoomSize = maxRoomSize
        self.num_attempts = num_attempts
        if max_steps is None:
            max_steps = maxNumRooms * 20  # multiroom.py:98
        super().__init__(grid_size=25, max_steps=max_steps, **kwargs)

    # ------------------------------------------------------------------ #

    def _chain_attempt(self, key: jnp.ndarray, num_rooms: jnp.ndarray,
                       width: int, height: int):
        """Build one room chain; returns (tops, sizes, entries, count).

        The reference's effective retry structure (recursion never pops a
        placed room and success propagates up immediately,
        multiroom.py:236-281) is a flat chain with up to 8
        (exit-door, size, top) tries per depth, ending early on exhaustion.
        All 8 tries of a depth are drawn AT ONCE and the first valid one
        committed — first-valid-of-8 ordered draws is exactly the
        sequential retry distribution, and the while_loop runs one
        iteration per ROOM instead of one per try (the serial iteration
        count is what a TPU pays for)."""
        n = self.maxNumRooms
        min_sz, max_sz = 4, self.maxRoomSize
        T = 8  # per-depth try budget (multiroom.py:245)
        t8 = jnp.arange(T)

        def cond(c):
            return (c["count"] < num_rooms) & ~c["dead"]

        def body(c):
            rng = c["rng"]
            rng, k_exit, k_epos, k_sx, k_sy, k_top = jax.random.split(rng, 6)
            first = c["count"] == 0

            # --- 8 exit-door draws from the previous room
            #     (multiroom.py:247-268), vectorized over the try axis.
            #     Masked reduce, not a dynamic row gather: a vmapped
            #     one-row gather serializes (~86 us/launch at B=4096) and
            #     this one sits inside the chain while_loop.
            prev_i = jnp.maximum(c["count"] - 1, 0)
            prev_hot = (jnp.arange(self.maxNumRooms) == prev_i)[:, None]
            prev_top = jnp.sum(jnp.where(prev_hot, c["tops"], 0), axis=0)
            prev_size = jnp.sum(jnp.where(prev_hot, c["sizes"], 0), axis=0)
            i3 = jax.random.randint(k_exit, (T,), 0, 3)
            exit_wall = i3 + (i3 >= c["entry_wall"])
            off_x = 1 + jax.random.randint(k_epos, (T,), 0, prev_size[0] - 2)
            off_y = 1 + jax.random.randint(jax.random.fold_in(k_epos, 1),
                                           (T,), 0, prev_size[1] - 2)
            exit_x = jnp.where(exit_wall == 0, prev_top[0] + prev_size[0] - 1,
                               jnp.where(exit_wall == 2, prev_top[0],
                                         prev_top[0] + off_x))
            exit_y = jnp.where(exit_wall == 1, prev_top[1] + prev_size[1] - 1,
                               jnp.where(exit_wall == 3, prev_top[1],
                                         prev_top[1] + off_y))
            entry_wall = (exit_wall + 2) % 4
            ex = jnp.where(first, c["epos"][0], exit_x)
            ey = jnp.where(first, c["epos"][1], exit_y)
            wall = jnp.where(first, 2, entry_wall)

            # --- room size + top by entry-wall rule (multiroom.py:187-212) --
            sx = jax.random.randint(k_sx, (T,), min_sz, max_sz + 1)
            sy = jax.random.randint(k_sy, (T,), min_sz, max_sz + 1)
            r1 = jax.random.randint(k_top, (T,), 0, 1 << 30)
            span = lambda lo, hi: lo + r1 % jnp.maximum(hi - lo, 1)  # noqa: E731
            # rand_int bounds are exclusive of epos (multiroom.py:196-212) —
            # the entry door must not land on a room corner.
            top_x = jnp.where(wall == 0, ex - sx + 1,
                              jnp.where(wall == 2, ex, span(ex - sx + 2, ex)))
            top_y = jnp.where(wall == 1, ey - sy + 1,
                              jnp.where(wall == 3, ey, span(ey - sy + 2, ey)))
            top_x = jnp.where(first, ex, top_x)
            top_y = jnp.where(first, ey, top_y)

            # --- validity (multiroom.py:215-232) ----------------------------
            in_bounds = ((top_x >= 0) & (top_y >= 0)
                         & (top_x + sx <= width) & (top_y + sy < height))
            slot = jnp.arange(n)
            prior = slot < (c["count"] - 1)  # exclude the predecessor
            ox, oy = c["tops"][:, 0], c["tops"][:, 1]
            osx, osy = c["sizes"][:, 0], c["sizes"][:, 1]
            # [T, n] overlap of each try against each prior room
            non_overlap = ((top_x[:, None] + sx[:, None] < ox[None])
                           | (ox[None] + osx[None] <= top_x[:, None])
                           | (top_y[:, None] + sy[:, None] < oy[None])
                           | (oy[None] + osy[None] <= top_y[:, None]))
            valid = in_bounds & ~jnp.any(prior[None] & ~non_overlap, axis=1)

            # --- first valid try commits (ordered = sequential retry) -------
            commit = jnp.any(valid)
            pick = jnp.argmax(valid)  # first True
            sel = lambda v: jnp.sum(jnp.where(t8 == pick, v, 0))  # noqa: E731
            idx = c["count"]
            row = (slot == idx) & commit
            tops = jnp.where(row[:, None],
                             jnp.stack([sel(top_x), sel(top_y)]), c["tops"])
            sizes = jnp.where(row[:, None],
                              jnp.stack([sel(sx), sel(sy)]), c["sizes"])
            entries = jnp.where(row[:, None],
                                jnp.stack([sel(ex), sel(ey)]), c["entries"])
            return {
                "tops": tops,
                "sizes": sizes,
                "entries": entries,
                "count": c["count"] + commit.astype(jnp.int32),
                "entry_wall": jnp.where(commit, sel(wall), c["entry_wall"]),
                "dead": ~commit,
                "epos": c["epos"],
                "rng": rng,
            }

        key, k_entry = jax.random.split(key)
        entry = jax.random.randint(k_entry, (2,), 0, width - 2)
        init = {
            "tops": jnp.zeros((n, 2), jnp.int32),
            "sizes": jnp.zeros((n, 2), jnp.int32),
            "entries": jnp.zeros((n, 2), jnp.int32),
            "count": jnp.asarray(0, jnp.int32),
            "entry_wall": jnp.asarray(2, jnp.int32),
            "dead": jnp.asarray(False),
            "epos": entry,
            "rng": key,
        }
        out = jax.lax.while_loop(cond, body, init)
        return out["tops"], out["sizes"], out["entries"], out["count"]

    def generate(self, key: jnp.ndarray, params: EnvParams) -> EnvState:
        w, h = params.width, params.height
        n = self.maxNumRooms
        keys = jax.random.split(key, self.num_attempts + 6)

        num_rooms = jax.random.randint(
            keys[0], (), self.minNumRooms, self.maxNumRooms + 1)

        # Best-of-A chain attempts (multiroom.py:117-135 keeps the longest),
        # vmapped: the A attempts are independent, so they run in lockstep
        # inside ONE while_loop (serial iterations = the longest attempt's
        # room count) instead of A sequential while_loops.
        A = self.num_attempts
        cands = jax.vmap(
            lambda k: self._chain_attempt(k, num_rooms, w, h)
        )(jax.random.split(keys[1], A))
        best_idx = jnp.argmax(cands[3])  # first attempt reaching the max
        onehot = jnp.arange(A) == best_idx
        pick = lambda v: jnp.sum(  # noqa: E731
            jnp.where(onehot.reshape((A,) + (1,) * (v.ndim - 1)), v, 0),
            axis=0).astype(v.dtype)
        tops, sizes, entries, count = (pick(cands[0]), pick(cands[1]),
                                       pick(cands[2]), pick(cands[3]))

        # --- rasterize rooms (multiroom.py:141-161) ---------------------------
        grid = empty_grid(w, h)
        xs, ys = G.coords(w, h)
        for r in range(n):
            active = r < count
            inside = ((xs >= tops[r, 0]) & (xs < tops[r, 0] + sizes[r, 0])
                      & (ys >= tops[r, 1]) & (ys < tops[r, 1] + sizes[r, 1]))
            border = inside & ((xs == tops[r, 0])
                               | (xs == tops[r, 0] + sizes[r, 0] - 1)
                               | (ys == tops[r, 1])
                               | (ys == tops[r, 1] + sizes[r, 1] - 1))
            grid = G.set_where(grid, border & active, C.WALL_TRIPLE)

        # --- chain doors, distinct from the previous color
        #     (multiroom.py:163-177) ----------------------------------------
        prev_color_rank = jnp.asarray(-1, jnp.int32)
        for r in range(1, n):
            kc = jax.random.fold_in(keys[-5], r)
            # uniform over colors != previous (first door: all 10)
            i9 = jax.random.randint(kc, (), 0, 9)
            i10 = jax.random.randint(jax.random.fold_in(kc, 1), (), 0, 10)
            rank = jnp.where(prev_color_rank < 0, i10,
                             i9 + (i9 >= prev_color_rank))
            active = r < count
            color = jnp.sum(jnp.where(jnp.arange(10) == rank,
                                      jnp.asarray(SORTED_COLOR_IDS), 0))
            door = jnp.stack([jnp.asarray(_DOOR, jnp.int32),
                              color,
                              jnp.asarray(C.STATE_TO_IDX["closed"], jnp.int32)
                              ]).astype(jnp.uint8)
            pos = entries[r]
            grid = G.put_if(grid, pos[0], pos[1], door, active)
            prev_color_rank = jnp.where(active, rank, prev_color_rank)

        # --- agent in the first room, goal in the last (multiroom.py:180-183) -
        _, agent_pos, _ = G.place_obj(keys[-4], grid, None,
                                      top=(tops[0, 0], tops[0, 1]),
                                      size=(sizes[0, 0], sizes[0, 1]))
        agent_dir = jax.random.randint(keys[-3], (), 0, 4, dtype=jnp.int32)
        last_hot = (jnp.arange(n) == count - 1)[:, None]
        last_top = jnp.sum(jnp.where(last_hot, tops, 0), axis=0)
        last_size = jnp.sum(jnp.where(last_hot, sizes, 0), axis=0)
        grid, _, _ = G.place_obj(keys[-2], grid, C.GOAL_TRIPLE,
                                 agent_pos=agent_pos,
                                 top=(last_top[0], last_top[1]),
                                 size=(last_size[0], last_size[1]))
        return base_state(grid, agent_pos, agent_dir, rng=keys[-1], has_boxes=False)

    def mission_text(self, mission) -> str:
        return "traverse the rooms to get to the goal"
