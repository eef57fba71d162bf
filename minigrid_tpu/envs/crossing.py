"""CrossingEnv — lava/wall rivers with one guaranteed zigzag path.

TPU-native re-derivation of ``minigrid/envs/crossing.py:87-184``.  The
reference samples N rivers from the candidate set (odd grid lines), fills
them with obstacles, then walks room-by-room carving one opening per river
along a shuffled h/v path.  Here the same construction runs as a fixed-shape
tensor program:

* river selection = one ``jax.random.permutation`` over the 2K candidates,
* obstacle fill   = per-line boolean masks OR-ed into the grid,
* the room walk   = a statically-unrolled loop of N masked select steps over
  padded "limits" arrays (compaction via cumsum scatter), with dynamic-bound
  ``randint`` draws for the opening coordinates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid_ops as G
from minigrid_tpu.core.env import Env
from minigrid_tpu.core.state import EnvParams, EnvState, base_state, empty_grid


class CrossingEnv(Env):
    name = "Crossing"

    def __init__(self, size: int = 9, num_crossings: int = 1,
                 obstacle_type: str = "lava", max_steps: int | None = None,
                 **kwargs):
        assert size % 2 == 1  # crossing.py:123
        self.num_crossings = num_crossings
        self.obstacle_type = obstacle_type
        if max_steps is None:
            max_steps = 4 * size**2  # crossing.py:104
        super().__init__(grid_size=size, see_through_walls=False,
                         max_steps=max_steps, **kwargs)

    def generate(self, key: jnp.ndarray, params: EnvParams) -> EnvState:
        s = params.width  # square, odd
        n = self.num_crossings
        cand = list(range(2, s - 2, 2))  # candidate river lines (crossing.py:142)
        k = len(cand)
        assert n <= 2 * k, "more crossings than candidate lines"
        cand_arr = jnp.asarray(cand, dtype=jnp.int32)  # (k,)

        k_riv, k_path, k_open, k_state = jax.random.split(key, 4)

        grid = empty_grid(s, s)
        grid = G.wall_rect(grid, 0, 0, s, s)
        grid = G.put(grid, s - 2, s - 2, C.GOAL_TRIPLE)

        obstacle = jnp.asarray(
            C.LAVA_TRIPLE if self.obstacle_type == "lava" else C.WALL_TRIPLE
        )

        # --- select N rivers among 2K candidates (crossing.py:142-147) -------
        # ids [0, k) are vertical lines (x = cand), [k, 2k) horizontal (y = cand).
        # All small-array scatters/gathers below are compare-select math —
        # each vmapped .at[].set / 1-element gather is a serialized kCustom
        # kernel (~20-40us at batch 4096), and this generator runs every
        # step in the auto-reset lane.
        perm = jax.random.permutation(k_riv, 2 * k)
        sel = perm[:n]  # (n,) selected candidate ids
        slot = jnp.arange(k)
        v_mask = jnp.any((slot[None, :] == sel[:, None]) & (sel < k)[:, None],
                         axis=0)
        h_mask = jnp.any((slot[None, :] == (sel - k)[:, None])
                         & (sel >= k)[:, None], axis=0)

        # --- obstacle fill (crossing.py:148-153) ------------------------------
        xs, ys = G.coords(s, s)
        # column x carries a vertical river iff x==cand[j] & v_mask[j]
        v_river = jnp.any((xs[..., None] == cand_arr) & v_mask, axis=-1)
        h_river = jnp.any((ys[..., None] == cand_arr) & h_mask, axis=-1)
        interior = (xs >= 1) & (xs <= s - 2) & (ys >= 1) & (ys <= s - 2)
        grid = G.set_where(grid, (v_river | h_river) & interior, obstacle)

        # --- limits arrays (crossing.py:160-161), compacted and padded --------
        # limits_v = [0, sorted selected vertical lines ..., s-1, pad...]
        def limits(mask):
            count = jnp.cumsum(mask.astype(jnp.int32))
            total = count[-1]
            # lim[i] = the i-th selected line (1-indexed) — one-hot matmul
            # instead of a dynamic scatter
            ii = jnp.arange(k + 2)[:, None]  # (k+2, 1)
            onehot = (mask & (count[None, :] == ii))  # (k+2, k)
            lim = jnp.sum(onehot * cand_arr[None, :], axis=1)
            lim = jnp.where(jnp.arange(k + 2) == total + 1, s - 1, lim)
            return lim, total

        limits_v, nv = limits(v_mask)  # vertical river x's
        limits_h, nh = limits(h_mask)  # horizontal river y's

        # --- path directions (crossing.py:156-157): nv 'h'-moves, nh 'v'-moves,
        # shuffled.  dir_h[t] True => cross the next vertical river.
        order = jax.random.permutation(k_path, n)
        dir_h = order < nv  # exactly nv of the n slots are 'h'

        # --- carve openings room by room (crossing.py:162-178) ----------------
        open_keys = jax.random.split(k_open, max(n, 1))
        room_i = jnp.asarray(0, jnp.int32)
        room_j = jnp.asarray(0, jnp.int32)
        empty = jnp.asarray(C.EMPTY_TRIPLE)
        for t in range(n):
            is_h = dir_h[t]
            lv0 = G.take1(limits_v, room_i)
            lv1 = G.take1(limits_v, room_i + 1)
            lh0 = G.take1(limits_h, room_j)
            lh1 = G.take1(limits_h, room_j + 1)
            # crossing a vertical river: x = that river, y random in room span
            xh = lv1
            yh = jax.random.randint(open_keys[t], (), lh0 + 1, lh1)
            # crossing a horizontal river: y = that river, x random in room span
            yv = lh1
            xv = jax.random.randint(
                jax.random.fold_in(open_keys[t], 1), (), lv0 + 1, lv1
            )
            ox = jnp.where(is_h, xh, xv)
            oy = jnp.where(is_h, yh, yv)
            grid = G.put(grid, ox, oy, empty)
            room_i = room_i + is_h.astype(jnp.int32)
            room_j = room_j + (~is_h).astype(jnp.int32)

        return base_state(
            grid, jnp.array([1, 1], jnp.int32), jnp.asarray(0, jnp.int32),
            rng=k_state, has_boxes=False,
        )

    def mission_text(self, mission) -> str:
        if self.obstacle_type == "lava":
            return "avoid the lava and get to the green goal square"
        return "find the opening and get to the green goal square"
