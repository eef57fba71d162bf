"""Contrastive dataset envs — compositional (color, type) splits.

TPU-native re-derivations of ``minigrid/envs/contrastive_dataset.py:15-104``
and ``minigrid/envs/contrastive_trajectory_dataset.py:17-117``.  The (color ×
non-base-type) composition space is shuffled once at construction and split
into train/val/test; the reference cycles compositions sequentially
(``curr_comp_idx``), which is host iteration state — here episodes sample
uniformly from the active split (set via :meth:`set_split`), with
:meth:`next_composition` providing the sequential host-side cursor for
dataset dumps.

The trajectory variant's broken 4-tuple ``step`` return
(contrastive_trajectory_dataset.py:117, SURVEY §2.7 do-not-replicate) is NOT
reproduced — it returns the standard 5-tuple with the reference's
done-folding semantics.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid_ops as G
from minigrid_tpu.core.env import Env
from minigrid_tpu.core.state import EnvParams, EnvState, base_state, empty_grid
from minigrid_tpu.core.step import DONE, TOGGLE, StepOutcome

_EMPTY_T = C.OBJECT_TO_IDX["empty"]


def _compositions(seed: int) -> np.ndarray:
    """(M, 2) shuffled (color_id, type_id) table over COLOR_NAMES ×
    NON_BASE_OBJ_NAMES (contrastive_dataset.py:27-29; the reference shuffles
    with the process-global RNG — here a fixed seed keeps it reproducible)."""
    combos = [
        (C.COLOR_TO_IDX[c], C.OBJECT_TO_IDX[t])
        for c in C.COLOR_NAMES
        for t in C.NON_BASE_OBJ_NAMES
    ]
    rng = np.random.default_rng(seed)
    combos = np.asarray(combos, np.int32)
    rng.shuffle(combos)
    return combos


class ContrastiveDataset(Env):
    """One object per episode; `done` near it pays (contrastive_dataset.py)."""

    name = "ContrastiveDataset"
    mission_prefix = "A"

    def __init__(self, size: int = 7, numObjs: int = 1,
                 splits=(0.7, 0.1, 0.2), split_seed: int = 0,
                 max_steps: int | None = None, **kwargs):
        self.numObjs = numObjs
        combos = _compositions(split_seed)
        n = len(combos)
        a, b = int(splits[0] * n), int(sum(splits[:2]) * n)
        self.splits = {"train": combos[:a], "val": combos[a:b],
                       "test": combos[b:]}
        self.curr_split = "train"
        self.curr_comp_idx = 0
        if max_steps is None:
            max_steps = 5 * size**2
        super().__init__(grid_size=size, see_through_walls=True,
                         max_steps=max_steps, **kwargs)

    def set_split(self, split: str) -> None:
        self.curr_split = split
        self.curr_comp_idx = 0

    def next_composition(self) -> np.ndarray:
        """Sequential composition cursor (contrastive_dataset.py:71-73)."""
        table = self.splits[self.curr_split]
        comp = table[self.curr_comp_idx]
        self.curr_comp_idx = (self.curr_comp_idx + 1) % len(table)
        return comp

    def generate(self, key: jnp.ndarray, params: EnvParams) -> EnvState:
        w, h = params.width, params.height
        keys = jax.random.split(key, 6)
        grid = empty_grid(w, h)
        grid = G.wall_rect(grid, 0, 0, w, h)

        table = jnp.asarray(self.splits[self.curr_split])
        comp = table[jax.random.randint(keys[0], (), 0, table.shape[0])]
        triple = jnp.stack([comp[1], comp[0],
                            jnp.zeros((), jnp.int32)]).astype(jnp.uint8)
        grid, pos, _ = G.place_obj(keys[1], grid, triple)
        _, agent_pos, _ = G.place_obj(keys[2], grid, None)
        agent_dir = jax.random.randint(keys[3], (), 0, 4, dtype=jnp.int32)
        mission = jnp.stack([comp[0], comp[1], jnp.zeros((), jnp.int32),
                             jnp.zeros((), jnp.int32)])
        return base_state(grid, agent_pos, agent_dir, rng=keys[4],
                          mission=mission,
                          extra={"target": comp, "target_pos": pos}, has_boxes=False)

    def post_step(self, state, action, reward, terminated, outcome, params):
        # done near the target pays; toggle terminates
        # (contrastive_dataset.py:89-104).
        d = jnp.abs(state.agent_pos - state.extra["target_pos"])
        near = (d[0] <= 1) & (d[1] <= 1)
        is_done = action == DONE
        reward = jnp.where(is_done & near, self.task_reward(state, params),
                           reward)
        terminated = terminated | is_done | (action == TOGGLE)
        return state, reward, terminated

    def mission_text(self, mission) -> str:
        return (f"{self.mission_prefix} {C.IDX_TO_COLOR[int(mission[0])]} "
                f"{C.IDX_TO_OBJECT[int(mission[1])]}")

    def mission_codes(self):
        combos = np.concatenate([self.splits[s] for s in
                                 ("train", "val", "test")])
        return np.concatenate(
            [combos, np.zeros((len(combos), 2), np.int32)], axis=1)


class ContrastiveTrajectoryDataset(ContrastiveDataset):
    """Target + same-split distractors; pickup pays ±1
    (contrastive_trajectory_dataset.py:17-117)."""

    name = "ContrastiveTrajectoryDataset"
    mission_prefix = "Pickup"

    def __init__(self, size: int = 8, numObjs: int = 2, **kwargs):
        super().__init__(size=size, numObjs=numObjs, **kwargs)

    def generate(self, key: jnp.ndarray, params: EnvParams) -> EnvState:
        w, h = params.width, params.height
        keys = jax.random.split(key, 6 + 2 * self.numObjs)
        grid = empty_grid(w, h)
        grid = G.wall_rect(grid, 0, 0, w, h)

        table = jnp.asarray(self.splits[self.curr_split])
        n = table.shape[0]
        ti = jax.random.randint(keys[0], (), 0, n)
        comp = table[ti]
        triple = jnp.stack([comp[1], comp[0],
                            jnp.zeros((), jnp.int32)]).astype(jnp.uint8)
        grid, pos, _ = G.place_obj(keys[1], grid, triple)
        _, agent_pos, _ = G.place_obj(keys[2], grid, None)
        agent_dir = jax.random.randint(keys[3], (), 0, 4, dtype=jnp.int32)

        # Distractors drawn from the split, excluding the cursor position
        # (contrastive_trajectory_dataset.py:86-92).
        for k in range(self.numObjs - 1):
            rd = jax.random.randint(keys[4 + 2 * k], (), 0, n - 1)
            di = rd + (rd >= ti)
            d = table[di]
            d_triple = jnp.stack([d[1], d[0],
                                  jnp.zeros((), jnp.int32)]).astype(jnp.uint8)
            grid, _, _ = G.place_obj(keys[5 + 2 * k], grid, d_triple,
                                     agent_pos=agent_pos)

        mission = jnp.stack([comp[0], comp[1], jnp.zeros((), jnp.int32),
                             jnp.zeros((), jnp.int32)])
        return base_state(grid, agent_pos, agent_dir, rng=keys[-1],
                          mission=mission,
                          extra={"target": comp, "target_pos": pos}, has_boxes=False)

    def post_step(self, state, action, reward, terminated,
                  outcome: StepOutcome, params):
        carrying = state.carrying[0].astype(jnp.int32) != _EMPTY_T
        match = carrying & (
            (state.carrying[0].astype(jnp.int32) == state.extra["target"][1])
            & (state.carrying[1].astype(jnp.int32) == state.extra["target"][0])
        )
        reward = jnp.where(carrying, jnp.where(match, 1.0, -1.0), reward)
        terminated = terminated | carrying
        return state, reward, terminated
