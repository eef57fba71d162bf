"""NegatedEnv — negation-language pickup task with train/eval splits.

TPU-native re-derivation of ``minigrid/envs/negated_goals.py:9-234``: a target
object and one distractor (different type AND color), a mission from ten
templates with optional negation — negated missions describe the *distractor*
("The target is not ...").  Type/color spaces are split into train/eval
halves (negated_goals.py:95-128).  Pickup pays +1 for the target, -1
otherwise; the reference forces truncated=False (negated_goals.py:229), which
is reproduced.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid_ops as G
from minigrid_tpu.core.env import Env
from minigrid_tpu.core.state import EnvParams, EnvState, base_state, empty_grid
from minigrid_tpu.core.step import StepOutcome

_THINGS = ["key", "box", "ball", "tree", "cup", "tool", "building", "crate",
           "chair", "flower"]
_SHAPES = ["square", "circle", "oval", "line", "rectangle", "diamond", "ring",
           "cross", "star", "arrow"]
_COLORS = ["red", "green", "blue", "purple", "yellow", "grey", "white",
           "cyan", "brown", "orange"]

BASE_TEMPLATES = [
    "The target is <not><the><desc>.",
    "The <desc><obj> is <not>the target.",
    "The object to pick up is <not><the><desc>.",
    "The object that is <not><the><desc> must be picked up.",
    "Pick up the object that is <not><the><desc>.",
    "Get the object that is <not><the><desc>.",
    "<not><the><desc>.",
    "Navigate to the object that is <not><desc>",
    "Find the object that is <not><desc>",
    "The object that is <not><desc> is the goal",
]

_EMPTY_T = C.OBJECT_TO_IDX["empty"]


class NegatedEnv(Env):
    name = "NegatedEnv"
    # Missions come from a template grammar (negation/verb-sequence
    # composition), not an enumerable placeholder product -> accept-all
    # mission space in the gym adapter.
    grammar_missions = True

    def __init__(self, size: int = 6, agent_start_pos=(1, 1),
                 agent_start_dir: int = 0, num_distractors: int = 1,
                 mode: str = "TRAIN", mission_type: str = "EITHER",
                 training_type: str = "all", use_color: bool = True, **kwargs):
        assert mode in ("TRAIN", "EVAL")
        assert mission_type in ("DIRECT", "NEGATED", "EITHER")
        self.mode = mode
        self.mission_type = mission_type
        self.training_type = training_type
        self.use_color = use_color

        # Split tables (negated_goals.py:95-128) as device id arrays.
        half = len(_SHAPES) // 2
        if training_type == "1set":
            set1 = _SHAPES[:half]
            set2 = _SHAPES[half:]
            distra = _SHAPES
        elif training_type == "all":
            set1 = _SHAPES[:half] + _THINGS[:half]
            set2 = _SHAPES[half:] + _THINGS[half:]
            distra = _SHAPES + _THINGS
        else:
            raise NotImplementedError(
                "training_type '2set' uses tuple-valued splits; use '1set' or 'all'"
            )
        dir_t, neg_t = (set1, set2) if mode == "TRAIN" else (set2, set1)
        self._dir_types = np.asarray([C.OBJECT_TO_IDX[t] for t in dir_t], np.int32)
        self._neg_types = np.asarray([C.OBJECT_TO_IDX[t] for t in neg_t], np.int32)
        self._distra_types = np.asarray([C.OBJECT_TO_IDX[t] for t in distra],
                                        np.int32)
        chalf = len(_COLORS) // 2
        c1 = [C.COLOR_TO_IDX[c] for c in _COLORS[:chalf]]
        c2 = [C.COLOR_TO_IDX[c] for c in _COLORS[chalf:]]
        self._dir_colors = np.asarray(c1 if mode == "TRAIN" else c2, np.int32)
        self._neg_colors = np.asarray(c2 if mode == "TRAIN" else c1, np.int32)
        self._all_colors = np.asarray([C.COLOR_TO_IDX[c] for c in _COLORS],
                                      np.int32)

        super().__init__(grid_size=size, max_steps=size * size + 5,
                         see_through_walls=True, **kwargs)

    def generate(self, key: jnp.ndarray, params: EnvParams) -> EnvState:
        w, h = params.width, params.height
        keys = jax.random.split(key, 12)
        grid = empty_grid(w, h)
        grid = G.wall_rect(grid, 0, 0, w, h)

        _, agent_pos, _ = G.place_obj(keys[0], grid, None)
        agent_dir = jax.random.randint(keys[1], (), 0, 4, dtype=jnp.int32)

        if self.mission_type == "EITHER":
            negated = jax.random.randint(keys[2], (), 0, 2) == 0
        else:
            negated = jnp.asarray(self.mission_type == "NEGATED")

        # Target type/color from the split (negated_goals.py:159-163).
        tgt_types = jnp.where(negated,
                              jnp.asarray(self._neg_types),
                              jnp.asarray(self._dir_types))
        tgt_colors = jnp.where(negated,
                               jnp.asarray(self._neg_colors),
                               jnp.asarray(self._dir_colors))
        t_type = tgt_types[jax.random.randint(keys[3], (), 0,
                                              len(self._dir_types))]
        t_color = tgt_colors[jax.random.randint(keys[4], (), 0,
                                                len(self._dir_colors))]
        triple = jnp.stack([t_type, t_color,
                            jnp.zeros((), jnp.int32)]).astype(jnp.uint8)
        grid, t_pos, _ = G.place_obj(keys[5], grid, triple,
                                     agent_pos=agent_pos)

        # Distractor with different type AND color (negated_goals.py:165-173).
        distra = jnp.asarray(self._distra_types)
        t_rank = jnp.argmax(distra == t_type)
        rd = jax.random.randint(keys[6], (), 0, len(self._distra_types) - 1)
        d_type = distra[rd + (rd >= t_rank)]
        all_c = jnp.asarray(self._all_colors)
        c_rank = jnp.argmax(all_c == t_color)
        rc = jax.random.randint(keys[7], (), 0, len(self._all_colors) - 1)
        d_color = all_c[rc + (rc >= c_rank)]
        d_triple = jnp.stack([d_type, d_color,
                              jnp.zeros((), jnp.int32)]).astype(jnp.uint8)
        grid, _, _ = G.place_obj(keys[8], grid, d_triple, agent_pos=agent_pos)

        # Mission: template + negated + use_color coin + desc (the desc is the
        # distractor's when negated, negated_goals.py:133-143).
        template = jax.random.randint(keys[9], (), 0, len(BASE_TEMPLATES))
        use_color = jax.random.randint(keys[10], (), 0, 2) == 0
        desc_color = jnp.where(negated, d_color, t_color)
        desc_type = jnp.where(negated, d_type, t_type)
        mission = jnp.stack([template, negated.astype(jnp.int32),
                             use_color.astype(jnp.int32),
                             jnp.where(use_color, desc_color, desc_type)])
        extra = {"target": jnp.stack([t_type, t_color]),
                 "target_cell": t_pos}
        return base_state(grid, agent_pos, agent_dir, rng=keys[11],
                          mission=mission, extra=extra)

    def post_step(self, state, action, reward, terminated,
                  outcome: StepOutcome, params):
        carrying = state.carrying[0].astype(jnp.int32) != _EMPTY_T
        match = carrying & (
            (state.carrying[0].astype(jnp.int32) == state.extra["target"][0])
            & (state.carrying[1].astype(jnp.int32) == state.extra["target"][1])
        )
        reward = jnp.where(carrying, jnp.where(match, 1.0, -1.0), reward)
        terminated = terminated | carrying
        # Reference forces truncated=False (negated_goals.py:229).
        state = state.replace(truncated=jnp.zeros_like(state.truncated))
        return state, reward, terminated

    def mission_text(self, mission) -> str:
        m = np.asarray(mission)
        template = BASE_TEMPLATES[int(m[0])]
        negated, use_color, desc = bool(m[1]), bool(m[2]), int(m[3])
        out = template.replace("<not>", "not " if negated else "")
        if use_color:
            out = out.replace("<desc>", C.IDX_TO_COLOR[desc])
            out = out.replace("<obj>", " object")
            out = out.replace("<the>", "")
        else:
            out = out.replace("<the>", "the ")
            out = out.replace("<desc>", C.IDX_TO_OBJECT[desc])
            out = out.replace("<obj>", "")
        return out


class NegatedSimple(NegatedEnv):
    name = "NegatedSimple"

    def __init__(self, **kwargs):
        super().__init__(size=8, **kwargs)
