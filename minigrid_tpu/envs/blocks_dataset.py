"""BlocksDataset — scripted blocks-world stacking language dataset.

TPU-native re-derivation of ``minigrid/envs/blocks_dataset.py:35-304``: five
colored blocks start in columns 1..5 of the bottom row; each scripted step
picks a random block and moves it (together with everything stacked on it) to
the top of a different random column (blocks_dataset.py:195-236).  ``step``
ignores the passed action.  The episode ends after a sampled number of
actions (weighted by permutation counts, blocks_dataset.py:131-136), with the
tallest-tower outcome phrase reconstructable host-side.

State: block positions as an (n_blocks, 2) array; the stack-segment move is a
vectorized update over it (blocks above the picked block share its column at
lower y) plus a masked grid rewrite.
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid_ops as G
from minigrid_tpu.core.env import Env
from minigrid_tpu.core.state import EnvParams, EnvState, base_state, empty_grid

INT_TO_WORD = {0: "zero", 1: "one", 2: "two", 3: "three", 4: "four",
               5: "five", 6: "six", 7: "seven", 8: "eight", 9: "nine",
               10: "ten"}
ALL_COLORS = ["red", "green", "blue", "yellow", "purple"]
_BLOCK = C.OBJECT_TO_IDX["block"]


class BlocksDataset(Env):
    name = "BlocksDataset"
    num_actions = 1  # scripted; the passed action is ignored

    def __init__(self, max_actions: int = 2, max_blocks: int = 5, **kwargs):
        self.max_actions = max_actions
        self.max_blocks = max_blocks
        self._color_ids = np.asarray([C.COLOR_TO_IDX[c] for c in ALL_COLORS],
                                     np.int32)
        # action-count distribution ∝ permutations(max_blocks, i)
        # (blocks_dataset.py:131-136)
        p = np.asarray(
            [math.factorial(max_blocks) // math.factorial(max_blocks - i)
             for i in range(1, max_actions + 1)], np.float64)
        self._num_actions_p = jnp.asarray(p / p.sum())
        size = max_blocks + 2
        super().__init__(grid_size=size, see_through_walls=True,
                         max_steps=max_actions * 10, **kwargs)

    def generate(self, key: jnp.ndarray, params: EnvParams) -> EnvState:
        w = h = params.width
        keys = jax.random.split(key, 4)
        grid = empty_grid(w, h)
        grid = G.wall_rect(grid, 0, 0, w, h)

        # blocks: random color order in columns 1..max_blocks, bottom row
        # (blocks_dataset.py:119-125)
        order = jax.random.permutation(keys[0], self.max_blocks)
        colors = jnp.asarray(self._color_ids)[order]
        pos = jnp.stack([jnp.arange(1, self.max_blocks + 1, dtype=jnp.int32),
                         jnp.full((self.max_blocks,), h - 2, jnp.int32)],
                        axis=1)
        for i in range(self.max_blocks):
            grid = G.put(grid, pos[i, 0], pos[i, 1],
                         jnp.stack([jnp.asarray(_BLOCK, jnp.uint8),
                                    colors[i].astype(jnp.uint8),
                                    jnp.asarray(0, jnp.uint8)]))

        n_actions = 1 + jax.random.categorical(
            keys[1], jnp.log(self._num_actions_p))
        extra = {
            "colors": colors,           # block i's color id
            "pos": pos,                 # block i's (x, y)
            "n_actions": n_actions,
            "curr": jnp.asarray(0, jnp.int32),
            # per-step trace: (block_idx, end_col) for phrase reconstruction
            "trace": jnp.full((self.max_actions, 2), -1, jnp.int32),
        }
        # mission = block color order (init phrase)
        mission = jnp.concatenate([colors, jnp.zeros((3,), jnp.int32)])
        return base_state(grid, jnp.asarray([1, 1], jnp.int32),
                          jnp.asarray(0, jnp.int32), rng=keys[2], extra=extra, has_boxes=False)

    def step_state(self, state: EnvState, action, params: EnvParams):
        """One scripted stack move (blocks_dataset.py:194-252)."""
        n = self.max_blocks
        h = params.height
        state, key = self.split_rng(state)
        k_block, k_col = jax.random.split(key)
        pos = state.extra["pos"]
        colors = state.extra["colors"]

        # random block + random other column (blocks_dataset.py:195-216)
        bi = jax.random.randint(k_block, (), 0, n)
        sx, sy = pos[bi, 0], pos[bi, 1]
        rc = jax.random.randint(k_col, (), 0, n - 1)
        end_col = 1 + rc + (rc + 1 >= sx)  # uniform over columns != sx

        # end row: lowest non-block cell of end_col (blocks_dataset.py:216-223)
        col_heights = jnp.sum(
            (pos[:, 0] == end_col).astype(jnp.int32))  # blocks in end col
        end_row = (h - 2) - col_heights

        # segment = blocks in column sx at y <= sy (stacked on/above bi)
        moved = (pos[:, 0] == sx) & (pos[:, 1] <= sy)
        offset = sy - pos[:, 1]  # height above the picked block
        new_pos = jnp.stack([
            jnp.where(moved, end_col, pos[:, 0]),
            jnp.where(moved, end_row - offset, pos[:, 1]),
        ], axis=1)

        # grid rewrite: clear moved cells, write new cells
        grid = state.grid
        for i in range(n):
            grid = G.put_if(grid, pos[i, 0], pos[i, 1], C.EMPTY_TRIPLE,
                            moved[i])
        for i in range(n):
            cell = jnp.stack([jnp.asarray(_BLOCK, jnp.uint8),
                              colors[i].astype(jnp.uint8),
                              jnp.asarray(0, jnp.uint8)])
            grid = G.put_if(grid, new_pos[i, 0], new_pos[i, 1], cell, moved[i])

        curr = state.extra["curr"]
        t_row = jnp.arange(self.max_actions) == jnp.clip(
            curr, 0, self.max_actions - 1)
        trace = jnp.where(t_row[:, None], jnp.stack([bi, end_col]),
                          state.extra["trace"])
        curr = curr + 1
        terminated = curr >= state.extra["n_actions"]
        step_count = state.step_count + 1
        state = state.replace(
            grid=grid, step_count=step_count, terminated=terminated,
            extra={**state.extra, "pos": new_pos, "curr": curr,
                   "trace": trace},
        )
        return state, jnp.asarray(0.0), terminated, jnp.asarray(False)

    # ------------------------------------------------------------------ #
    # host-side phrase reconstruction (blocks_dataset.py:143-146, 235-244,
    # 279-297)
    # ------------------------------------------------------------------ #

    def init_phrase(self, state: EnvState) -> str:
        names = [C.IDX_TO_COLOR[int(c)] for c in np.asarray(
            state.extra["colors"])]
        return (" ".join(f"a {c}," for c in names[:-1])
                + f" and a {names[-1]} block start in columns one through"
                " five respectively.").capitalize()

    def action_phrases(self, state: EnvState) -> list[str]:
        colors = np.asarray(state.extra["colors"])
        out = []
        for i, (bi, col) in enumerate(np.asarray(state.extra["trace"])):
            if bi < 0:
                break
            c1 = C.IDX_TO_COLOR[int(colors[bi])]
            verb = (f"picks up the {c1} block and places it in column "
                    f"{INT_TO_WORD[int(col)]}")
            out.append(f" The robot {verb}." if i == 0
                       else f" Then the robot {verb}.")
        return out

    def outcome_phrase(self, state: EnvState) -> str:
        """Tallest-tower query (blocks_dataset.py:279-297)."""
        pos = np.asarray(state.extra["pos"])
        colors = np.asarray(state.extra["colors"])
        h = int(state.grid.shape[1])
        heights = np.zeros(self.max_blocks + 2, int)
        for x, y in pos:
            heights[x] += 1
        tallest = int(np.argmax(heights[1:self.max_blocks + 1])) + 1
        stack = sorted(
            [(y, c) for (x, y), c in zip(pos, colors) if x == tallest])
        names = [C.IDX_TO_COLOR[int(c)] for _, c in stack]
        block_s = "block" if len(names) == 1 else "blocks"
        out = (f" The tallest stack is in column {INT_TO_WORD[tallest]} and"
               f" is {INT_TO_WORD[len(names)]} {block_s} tall. It consists"
               " of the ")
        if len(names) == 1:
            return out + f"{names[0]} block."
        return out + f"{', '.join(names[:-1])}, and {names[-1]} blocks."

    def mission_text(self, mission) -> str:
        return ""
