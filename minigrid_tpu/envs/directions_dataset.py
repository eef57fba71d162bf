"""DirectionsDataset — scripted rotation-instruction language dataset.

TPU-native re-derivation of ``minigrid/envs/directions_dataset.py:79-277``:
compass glyphs at the grid edges, agent in the middle, and a per-episode verb
sequence that the env executes itself — ``step`` *ignores* the passed action
(directions_dataset.py:249-274) and performs the next verb's rotation with
its own 4-action space (left/right/turn_around/stay).

The sequence space (13 high-level verbs, lengths 1..max_actions) is
enumerated and split host-side (train/val/test/icl + length-extrapolation
splits, directions_dataset.py:92-115); episodes sample uniformly from the
active split, with :meth:`next_sequence` as the sequential dataset cursor.
"""

from __future__ import annotations

import itertools

import numpy as np

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid_ops as G
from minigrid_tpu.core.env import Env
from minigrid_tpu.core.state import EnvParams, EnvState, base_state, empty_grid

# DDActions (directions_dataset.py:22-27)
DD_LEFT, DD_RIGHT, DD_TURN_AROUND, DD_STAY = range(4)

# High-level verb table (directions_dataset.py:50-72): verb -> action.
HL_ACTION_VERBS = {
    "does nothing": DD_STAY,
    "turns left": DD_LEFT,
    "turns right": DD_RIGHT,
    "goes straight": DD_STAY,
    "turns around": DD_TURN_AROUND,
    "turns 90 degrees clockwise": DD_RIGHT,
    "turns 180 degrees clockwise": DD_TURN_AROUND,
    "turns 270 degrees clockwise": DD_LEFT,
    "turns 360 degrees clockwise": DD_STAY,
    "turns 90 degrees counterclockwise": DD_LEFT,
    "turns 180 degrees counterclockwise": DD_TURN_AROUND,
    "turns 270 degrees counterclockwise": DD_RIGHT,
    "turns 360 degrees counterclockwise": DD_STAY,
}
VERB_NAMES = list(HL_ACTION_VERBS.keys())
VERB_ACTIONS = np.asarray([HL_ACTION_VERBS[v] for v in VERB_NAMES], np.int32)
# direction deltas per DD action: left -1, right +1, around +2, stay 0
DD_DELTA = np.asarray([3, 1, 2, 0], np.int32)

DIRECTIONS_IDX_TO_STR = ["east", "south", "west", "north"]


class DirectionsDataset(Env):
    name = "DirectionsDataset"
    # Missions come from a template grammar (negation/verb-sequence
    # composition), not an enumerable placeholder product -> accept-all
    # mission space in the gym adapter.
    grammar_missions = True
    num_actions = 4

    def __init__(self, size: int = 3, max_actions: int = 2,
                 split_seed: int = 0,
                 train_size: int = 262144, val_size: int = 10000,
                 test_size: int = 1000, icl_examples: int = 10,
                 lengthN_sizes: int = 2000, **kwargs):
        self.max_actions = max_actions

        # Enumerate + shuffle + split the sequence space
        # (directions_dataset.py:92-115); sequences pad to max length with -1.
        rng = np.random.default_rng(split_seed)
        base = []
        for i in range(1, max_actions + 1):
            base += [list(s) for s in
                     itertools.product(range(len(VERB_NAMES)), repeat=i)]
        rng.shuffle(base)

        def pad(seqs, width):
            out = np.full((len(seqs), width), -1, np.int32)
            for r, s in enumerate(seqs):
                out[r, :len(s)] = s
            return out

        self.splits = {
            "train": pad(base[:train_size], max_actions),
            "val": pad(base[train_size:train_size + val_size], max_actions),
            "test": pad(base[train_size + val_size:
                             train_size + val_size + test_size], max_actions),
            "icl_examples": pad(
                base[train_size + val_size + test_size:
                     train_size + val_size + test_size + icl_examples],
                max_actions),
        }
        # length-extrapolation splits (directions_dataset.py:105-115)
        for i in range(1, max_actions + 1):
            seqs = rng.integers(0, len(VERB_NAMES), size=(lengthN_sizes, i))
            self.splits[f"length+{i}"] = pad(list(seqs), max_actions)
        self.set_split("train")

        super().__init__(grid_size=size, see_through_walls=True,
                         max_steps=max_actions * 10, agent_view_size=size,
                         **kwargs)

    def set_split(self, split: str) -> None:
        self.curr_split = split
        self.curr_idx = 0

    def next_sequence(self) -> np.ndarray:
        table = self.splits[self.curr_split]
        seq = table[self.curr_idx]
        self.curr_idx = (self.curr_idx + 1) % len(table)
        return seq

    def generate(self, key: jnp.ndarray, params: EnvParams) -> EnvState:
        w = h = params.width
        keys = jax.random.split(key, 4)
        grid = empty_grid(w, h)
        grid = G.wall_rect(grid, 0, 0, w, h)

        # Compass glyphs (directions_dataset.py:188-192 — note the reference's
        # swapped height/width indexing, harmless on the square grid).
        red = C.COLOR_TO_IDX["red"]
        for name, (x, y) in [("west", (0, w // 2)), ("south", (h // 2, w - 1)),
                             ("east", (h - 1, w // 2)), ("north", (h // 2, 0))]:
            grid = G.put(grid, x, y,
                         jnp.asarray([C.OBJECT_TO_IDX[name], red, 0], jnp.uint8))

        table = jnp.asarray(self.splits[self.curr_split])
        seq = table[jax.random.randint(keys[0], (), 0, table.shape[0])]
        n_verbs = jnp.sum(seq >= 0)
        agent_pos = jnp.asarray([(w - 1) // 2, (h - 1) // 2], jnp.int32)
        agent_dir = jax.random.randint(keys[1], (), 0, 4, dtype=jnp.int32)

        # mission = [start_dir, verb ids ... padded -1]
        mission = jnp.concatenate([agent_dir[None], seq]).astype(jnp.int32)
        extra = {"seq": seq, "n_verbs": n_verbs,
                 "verb_step": jnp.asarray(0, jnp.int32),
                 "start_dir": agent_dir}
        return base_state(grid, agent_pos, agent_dir, rng=keys[2],
                          mission=mission, extra=extra, has_boxes=False)

    def step_state(self, state: EnvState, action, params: EnvParams):
        """Scripted transition: the passed action is ignored
        (directions_dataset.py:249-274)."""
        verb = state.extra["seq"][jnp.clip(state.extra["verb_step"], 0,
                                           self.max_actions - 1)]
        dd = jnp.asarray(VERB_ACTIONS)[jnp.maximum(verb, 0)]
        delta = jnp.asarray(DD_DELTA)[dd]
        new_dir = (state.agent_dir + delta) % 4
        verb_step = state.extra["verb_step"] + 1
        terminated = verb_step >= state.extra["n_verbs"]
        step_count = state.step_count + 1
        truncated = step_count >= params.max_steps
        state = state.replace(
            agent_dir=new_dir, step_count=step_count, terminated=terminated,
            truncated=truncated,
            extra={**state.extra, "verb_step": verb_step},
        )
        return state, jnp.asarray(0.0), terminated, truncated

    def mission_text(self, mission) -> str:
        m = np.asarray(mission)
        init = f"The robot is facing {DIRECTIONS_IDX_TO_STR[int(m[0])]}."
        out = init
        for i, v in enumerate(m[1:]):
            if v < 0:
                break
            verb = VERB_NAMES[int(v)]
            out += (f" The robot {verb}." if i == 0
                    else f" Then the robot {verb}.")
        return out

    def outcome_text(self, state: EnvState) -> str:
        """The final-direction phrase (directions_dataset.py:262-270)."""
        return (" The robot is now facing "
                f"{DIRECTIONS_IDX_TO_STR[int(state.agent_dir)]}.")
