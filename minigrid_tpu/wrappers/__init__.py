"""Observation/reward wrappers as pure transforms.

The reference's 15 wrapper classes (minigrid/wrappers.py:16-569) mutate a
gym.Wrapper chain.  Here each wrapper is itself a functional Env: observation
wrappers rewrite the obs pytree (jit/vmap-transparent), stateful wrappers
(exploration bonuses) extend the state pytree with their count tables, and
string-emitting wrappers (DictObservationSpace / FlatObs) precompute their
encodings over the env's enumerated mission-code table so the hot path stays
a pure integer gather.

All wrappers compose with :class:`minigrid_tpu.parallel.vector.VectorEnv`.
"""

from __future__ import annotations

import numpy as np
from flax import struct

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core.env import Env
from minigrid_tpu.core.obs import encode_view, gen_obs_grid
from minigrid_tpu.core.state import EnvParams, EnvState


class Wrapper(Env):
    """Base: delegates everything to the wrapped env."""

    def __init__(self, env: Env):
        self.env = env

    def __getattr__(self, name):
        return getattr(self.env, name)

    @property
    def default_params(self) -> EnvParams:
        return self.env.default_params

    def generate(self, key, params):
        return self.env.generate(key, params)

    def reset(self, key, params):
        state = self.generate(key, params)
        return self.observation(state, params), state

    def step_state(self, state, action, params):
        return self.env.step_state(state, action, params)

    def step(self, state, action, params):
        state, reward, terminated, truncated = self.step_state(state, action, params)
        return (self.observation(state, params), state, reward, terminated,
                truncated, {})

    def observation(self, state, params):
        return self.env.observation(state, params)


class ObservationWrapper(Wrapper):
    """Rewrites observations; override :meth:`transform`."""

    def observation(self, state, params):
        return self.transform(self.env.observation(state, params), state, params)

    def transform(self, obs, state, params):
        raise NotImplementedError


# ---------------------------------------------------------------------------
# Seeding
# ---------------------------------------------------------------------------


class ReseedWrapper(Wrapper):
    """Cycle a fixed seed list on reset (wrappers.py:16-34).  The cycle index
    is host-side state, exactly like the reference's attribute — use for
    evaluation loops, not inside jitted auto-reset."""

    def __init__(self, env: Env, seeds=(0,), seed_idx: int = 0):
        super().__init__(env)
        self.seeds = list(seeds)
        self.seed_idx = seed_idx

    def reset(self, key=None, params=None):
        params = params if params is not None else self.default_params
        seed = self.seeds[self.seed_idx]
        self.seed_idx = (self.seed_idx + 1) % len(self.seeds)
        return self.env.reset(jax.random.PRNGKey(seed), params)


# ---------------------------------------------------------------------------
# Exploration bonuses — counts live in an extended state pytree
# ---------------------------------------------------------------------------


@struct.dataclass
class BonusState:
    inner: EnvState
    counts: jnp.ndarray

    # Pass-through so VectorEnv's rng-based auto-reset works unchanged.
    @property
    def rng(self):
        return self.inner.rng

    @property
    def step_count(self):
        return self.inner.step_count


class _BonusWrapper(Wrapper):
    """Shared machinery: reward += 1/sqrt(N(key)) with N a count table."""

    def _count_shape(self, params) -> tuple:
        raise NotImplementedError

    def _index(self, state: EnvState, action) -> tuple:
        raise NotImplementedError

    def generate(self, key, params):
        inner = self.env.generate(key, params)
        counts = jnp.zeros(self._count_shape(params), dtype=jnp.int32)
        return BonusState(inner=inner, counts=counts)

    def step_state(self, state: BonusState, action, params):
        inner, reward, terminated, truncated = self.env.step_state(
            state.inner, action, params
        )
        idx = self._index(inner, action)
        # masked-select update: a dynamic-index gather/scatter on the count
        # table would lower to serialized kCustom kernels under vmap
        shape = state.counts.shape
        hit = jnp.ones(shape, bool)
        for d, i in enumerate(idx):
            ar = jnp.arange(shape[d]).reshape(
                tuple(-1 if k == d else 1 for k in range(len(shape))))
            hit &= ar == i
        counts = state.counts + hit.astype(state.counts.dtype)
        new_count = jnp.sum(jnp.where(hit, counts, 0))
        bonus = 1.0 / jnp.sqrt(new_count.astype(jnp.float32))
        return (BonusState(inner=inner, counts=counts), reward + bonus,
                terminated, truncated)

    def observation(self, state: BonusState, params):
        return self.env.observation(state.inner, params)


class ActionBonus(_BonusWrapper):
    """1/sqrt(N(pos, dir, action)) exploration bonus (wrappers.py:37-69).
    Counts are per-episode under vectorized auto-reset (the reference's dict
    persists across resets of its single env)."""

    def _count_shape(self, params):
        from minigrid_tpu.core.step import NUM_ACTIONS

        return (params.width, params.height, 4, NUM_ACTIONS)

    def _index(self, state: EnvState, action):
        return (state.agent_pos[0], state.agent_pos[1], state.agent_dir,
                jnp.asarray(action, jnp.int32))


class StateBonus(_BonusWrapper):
    """1/sqrt(N(pos)) exploration bonus (wrappers.py:72-105)."""

    def _count_shape(self, params):
        return (params.width, params.height)

    def _index(self, state: EnvState, action):
        return (state.agent_pos[0], state.agent_pos[1])


# ---------------------------------------------------------------------------
# Pure observation transforms
# ---------------------------------------------------------------------------


class ImgObsWrapper(ObservationWrapper):
    """Image-only obs (wrappers.py:108-118)."""

    def transform(self, obs, state, params):
        return obs["image"]


class OneHotPartialObsWrapper(ObservationWrapper):
    """Per-cell one-hot of (type, color, state) -> (V, V, 47)
    (wrappers.py:121-158)."""

    NUM_BITS = C.NUM_OBJECT_TYPES + 10 + 3  # 34 + 10 + 3 = 47 (wrappers.py:135)

    def transform(self, obs, state, params):
        img = obs["image"].astype(jnp.int32)
        t = jax.nn.one_hot(img[..., 0], C.NUM_OBJECT_TYPES, dtype=jnp.uint8)
        c = jax.nn.one_hot(img[..., 1], 10, dtype=jnp.uint8)
        s = jax.nn.one_hot(img[..., 2], 3, dtype=jnp.uint8)
        return {**obs, "image": jnp.concatenate([t, c, s], axis=-1)}


class FullyObsWrapper(ObservationWrapper):
    """Full-grid encode with the agent cell stamped (agent, red, dir)
    (wrappers.py:219-255)."""

    def transform(self, obs, state, params):
        from minigrid_tpu.core import grid_ops as G

        agent = jnp.stack(
            [jnp.asarray(C.OBJECT_TO_IDX["agent"], jnp.uint8),
             jnp.asarray(C.COLOR_TO_IDX["red"], jnp.uint8),
             state.agent_dir.astype(jnp.uint8)]
        )
        full = G.put(state.grid, state.agent_pos[0], state.agent_pos[1], agent)
        return {**obs, "image": G.unpack_cells(full)}


class SymbolicObsWrapper(ObservationWrapper):
    """(x, y, type) triples over the full grid, -1 for empty cells, agent cell
    stamped with the agent id (wrappers.py:538-569)."""

    def transform(self, obs, state, params):
        w, h = params.width, params.height
        xs = jax.lax.broadcasted_iota(jnp.int32, (w, h), 0)
        ys = jax.lax.broadcasted_iota(jnp.int32, (w, h), 1)
        t = (state.grid & 0xFF).astype(jnp.int32)
        t = jnp.where(t == C.OBJECT_TO_IDX["empty"], -1, t)
        t = jnp.where((xs == state.agent_pos[0]) & (ys == state.agent_pos[1]),
                      C.OBJECT_TO_IDX["agent"], t)
        return {**obs, "image": jnp.stack([xs, ys, t], axis=-1)}


class RGBImgObsWrapper(ObservationWrapper):
    """Fully observable RGB pixel obs (wrappers.py:161-186): the whole grid
    rendered with the agent's view highlighted, via the atlas gather."""

    def __init__(self, env: Env, tile_size: int = 8):
        super().__init__(env)
        self.tile_size = tile_size
        from minigrid_tpu.ops.render import get_atlas

        self._atlas = get_atlas(tile_size)

    def transform(self, obs, state, params):
        from minigrid_tpu.ops.render import full_render

        return {**obs, "image": full_render(state, params, self._atlas,
                                            highlight=True)}


class RGBImgPartialObsWrapper(ObservationWrapper):
    """Partially observable RGB pixel obs (wrappers.py:189-216): the agent's
    POV rendered at tile_size pixels per cell.

    ``channels_first=True`` (batched path only) serves uint8[B, 3, H, W]
    instead of the reference's [B, H, W, 3]: the HWC layout's (H, 3) minor
    dims pad ~42x onto TPU vector tiles and dominate the render cost at
    fleet batch sizes (see ops/render.py::pov_render_batch)."""

    def __init__(self, env: Env, tile_size: int = 8,
                 channels_first: bool = False):
        super().__init__(env)
        self.tile_size = tile_size
        self.channels_first = channels_first
        from minigrid_tpu.ops.render import get_atlas

        self._atlas = get_atlas(tile_size)

    def transform(self, obs, state, params):
        from minigrid_tpu.ops.render import pov_render

        return {**obs, "image": pov_render(state, params, self._atlas)}

    def observation_batch(self, states, params):
        """One flat atlas gather for the whole batch — vmapping the per-env
        render serializes into B gather programs (~100x slower at B=4096;
        see ops/render.py::pov_render_batch)."""
        from minigrid_tpu.ops.render import pov_render_batch

        base = self.env.observation_batch(states, params)
        return {**base, "image": pov_render_batch(
            states, params, self._atlas,
            channels_first=self.channels_first)}


class ViewSizeWrapper(Wrapper):
    """Re-run the obs kernel at a custom view size (wrappers.py:469-501)."""

    def __init__(self, env: Env, agent_view_size: int = 7):
        super().__init__(env)
        assert agent_view_size % 2 == 1 and agent_view_size >= 3
        self.agent_view_size = agent_view_size

    def observation(self, state, params):
        obs = self.env.observation(state, params)
        view_params = params.replace(agent_view_size=self.agent_view_size)
        cells, vis = gen_obs_grid(state, view_params)
        return {**obs, "image": encode_view(cells, vis)}


class DirectionObsWrapper(ObservationWrapper):
    """Slope (or angle) toward the first goal cell (wrappers.py:504-535; the
    reference's row/column index arithmetic bug at :524-526 is fixed — SURVEY
    §2.7 marks it do-not-replicate)."""

    def __init__(self, env: Env, type: str = "slope"):
        super().__init__(env)
        self.type = type

    def transform(self, obs, state, params):
        is_goal = (state.grid & 0xFF) == C.OBJECT_TO_IDX["goal"]
        flat = jnp.argmax(is_goal.reshape(-1))  # first goal, x-major
        gx, gy = flat // params.height, flat % params.height
        slope = (gy - state.agent_pos[1]) / (gx - state.agent_pos[0])
        direction = jnp.arctan(slope) if self.type == "angle" else slope
        return {**obs, "goal_direction": direction}


# ---------------------------------------------------------------------------
# Mission tokenizing wrappers — precomputed over the mission-code table
# ---------------------------------------------------------------------------


def _mission_lookup(codes: np.ndarray, mission: jnp.ndarray) -> jnp.ndarray:
    """Index of `mission` in the enumerated (M, 4) code table."""
    table = jnp.asarray(codes)
    return jnp.argmax(jnp.all(table == mission[None, :], axis=1))


class DictObservationSpaceWrapper(ObservationWrapper):
    """Mission -> padded word-index array with the built-in MiniGrid vocab
    (wrappers.py:286-403).  Word arrays are precomputed per mission code."""

    def __init__(self, env: Env, max_words_in_mission: int = 50, word_dict=None):
        super().__init__(env)
        self.max_words_in_mission = max_words_in_mission
        self.word_dict = word_dict or self.get_minigrid_words()
        codes = env.mission_codes()
        rows = []
        for code in codes:
            try:
                idx = self.string_to_indices(env.mission_text(code))
            except ValueError:
                # The built-in vocab covers 6 colors (wrappers.py:326) while
                # the fork's palette has 10; out-of-vocab missions (which the
                # reference would raise on lazily) map to the all-zero row.
                idx = []
            assert len(idx) < max_words_in_mission
            rows.append(idx + [0] * (max_words_in_mission - len(idx)))
        self._codes = codes
        self._tokens = jnp.asarray(np.asarray(rows, dtype=np.int32))

    @staticmethod
    def get_minigrid_words():
        """The reference vocabulary (wrappers.py:324-382)."""
        colors = ["red", "green", "blue", "yellow", "purple", "grey"]
        objects = ["unseen", "empty", "wall", "floor", "box", "key", "ball",
                   "door", "goal", "agent", "lava"]
        verbs = ["pick", "avoid", "get", "find", "put", "use", "open", "go",
                 "fetch", "reach", "unlock", "traverse"]
        extra_words = ["up", "the", "a", "at", ",", "square", "and", "then",
                       "to", "of", "rooms", "near", "opening", "must", "you",
                       "matching", "end", "hallway", "object", "from", "room"]
        all_words = colors + objects + verbs + extra_words
        assert len(all_words) == len(set(all_words))
        return {word: i for i, word in enumerate(all_words)}

    def string_to_indices(self, string: str, offset: int = 1) -> list[int]:
        indices = []
        string = string.replace(",", " , ")
        for word in string.split():
            if word in self.word_dict:
                indices.append(self.word_dict[word] + offset)
            else:
                raise ValueError(f"Unknown word: {word}")
        return indices

    def transform(self, obs, state, params):
        row = _mission_lookup(self._codes, state.mission)
        return {**obs, "mission": self._tokens[row]}


class FlatObsWrapper(ObservationWrapper):
    """Flatten image ⊕ one-hot char-encoded mission (wrappers.py:406-466).
    Char arrays are precomputed per mission code (the reference caches the
    last-seen string; here the entire space is a table gather)."""

    def __init__(self, env: Env, maxStrLen: int = 96):
        super().__init__(env)
        self.maxStrLen = maxStrLen
        self.numCharCodes = 28
        codes = env.mission_codes()
        arrs = []
        for code in codes:
            arrs.append(self._encode_str(env.mission_text(code)))
        self._codes = codes
        self._strs = jnp.asarray(np.stack(arrs))  # (M, L*28)

    def _encode_str(self, mission: str) -> np.ndarray:
        assert len(mission) <= self.maxStrLen, "mission string too long"
        mission = mission.lower()
        out = np.zeros((self.maxStrLen, self.numCharCodes), dtype=np.float32)
        for idx, ch in enumerate(mission):
            if "a" <= ch <= "z":
                ch_no = ord(ch) - ord("a")
            elif ch == " ":
                ch_no = 26
            elif ch == ",":
                ch_no = 27
            else:
                raise ValueError(f"Character {ch} is not available in mission string.")
            out[idx, ch_no] = 1
        return out.flatten()

    def transform(self, obs, state, params):
        row = _mission_lookup(self._codes, state.mission)
        img = obs["image"].astype(jnp.float32).reshape(-1)
        return jnp.concatenate([img, self._strs[row]])


def _goal_cell(state: EnvState, params: EnvParams) -> jnp.ndarray:
    """(x, y) of the first goal cell, or (-1, -1) when no goal exists — the
    `target_cell` the fork's wrappers assume the env exposes."""
    w, h = params.width, params.height
    is_goal = (state.grid & 0xFF) == C.OBJECT_TO_IDX["goal"]
    flat = is_goal.reshape(-1)
    idx = jnp.argmax(flat)
    found = jnp.any(flat)
    pos = jnp.stack([idx // h, idx % h]).astype(jnp.int32)
    return jnp.where(found, pos, jnp.full((2,), -1, jnp.int32))


class EasyModeWrapper(ObservationWrapper):
    """Agent pose + goal coordinates, no grid image (wrappers.py:258-271).

    The reference version reads ``obs['target_cell']``, a key its own base
    ``gen_obs`` no longer emits (minigrid_env.py:645-649) — i.e. it is broken
    upstream.  Here the target is recovered directly from the state tensor
    (the goal cell), which is what the key contained when the fork's dataset
    envs populated it."""

    def transform(self, obs, state, params):
        target = _goal_cell(state, params)
        dir_one_hot = jax.nn.one_hot(state.agent_dir, 4, dtype=jnp.float32)
        robot = jnp.concatenate(
            [state.agent_pos.astype(jnp.float32), dir_one_hot]
        )
        return {
            "mission": obs["mission"],
            "visual_obs": target,
            "robot_obs": robot,
            "target_cell": target,
        }


class NoLanguageWrapper(ObservationWrapper):
    """Full-grid encoding plus the target as coordinates so no language is
    needed (wrappers.py:273-282; same upstream ``target_cell`` breakage as
    EasyModeWrapper, same recovery here)."""

    def transform(self, obs, state, params):
        from minigrid_tpu.core import grid_ops as G

        agent = jnp.stack(
            [jnp.asarray(C.OBJECT_TO_IDX["agent"], jnp.uint8),
             jnp.asarray(C.COLOR_TO_IDX["red"], jnp.uint8),
             state.agent_dir.astype(jnp.uint8)]
        )
        full = G.unpack_cells(
            G.put(state.grid, state.agent_pos[0], state.agent_pos[1], agent))
        target = _goal_cell(state, params)
        dir_one_hot = jax.nn.one_hot(state.agent_dir, 4, dtype=jnp.float32)
        robot = jnp.concatenate(
            [target.astype(jnp.float32),
             state.agent_pos.astype(jnp.float32),
             dir_one_hot]
        )
        return {
            **obs,
            "image": full,
            "robot_obs": robot,
            "target_cell": target,
        }


__all__ = [
    "Wrapper",
    "ObservationWrapper",
    "ReseedWrapper",
    "ActionBonus",
    "StateBonus",
    "BonusState",
    "ImgObsWrapper",
    "OneHotPartialObsWrapper",
    "RGBImgObsWrapper",
    "RGBImgPartialObsWrapper",
    "FullyObsWrapper",
    "SymbolicObsWrapper",
    "ViewSizeWrapper",
    "DirectionObsWrapper",
    "DictObservationSpaceWrapper",
    "FlatObsWrapper",
    "EasyModeWrapper",
    "NoLanguageWrapper",
]
