"""Wrapper suite tests — mirrors the reference pillars (tests/test_wrappers.py):
reseed equivalence, closed-form exploration bonuses, mission-token round-trip,
plus generic wrap-reset-step sweeps and VectorEnv composition."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import minigrid_tpu
from minigrid_tpu.core import constants as C
from minigrid_tpu.parallel.vector import VectorEnv
from minigrid_tpu.wrappers import (
    ActionBonus,
    DictObservationSpaceWrapper,
    DirectionObsWrapper,
    FlatObsWrapper,
    FullyObsWrapper,
    ImgObsWrapper,
    OneHotPartialObsWrapper,
    ReseedWrapper,
    StateBonus,
    SymbolicObsWrapper,
    ViewSizeWrapper,
)


def make(eid="MiniGrid-Empty-8x8-v0", **kw):
    return minigrid_tpu.make(eid, **kw)


def test_reseed_equivalence():
    """ReseedWrapper repeats the seed cycle exactly (ref test_wrappers.py:30-76)."""
    env = ReseedWrapper(make("MiniGrid-DoorKey-8x8-v0"), seeds=[11, 22])
    p = env.default_params
    grids = [np.asarray(env.reset(params=p)[1].grid) for _ in range(4)]
    np.testing.assert_array_equal(grids[0], grids[2])
    np.testing.assert_array_equal(grids[1], grids[3])
    assert not np.array_equal(grids[0], grids[1])


@pytest.mark.parametrize("cls", [ActionBonus, StateBonus])
def test_bonus_closed_form(cls):
    """reward + 1/sqrt(N) exactly (ref test_wrappers.py:79-127)."""
    env = cls(make("MiniGrid-Empty-8x8-v0"))
    p = env.default_params
    _, state = env.reset(jax.random.PRNGKey(0), p)
    # repeat the same (s, a): stay in place via action `done`
    rewards = []
    for _ in range(3):
        _, state, r, _, _, _ = env.step(state, jnp.int32(6), p)
        rewards.append(float(r))
    expected = [1.0, 1 / np.sqrt(2), 1 / np.sqrt(3)]
    np.testing.assert_allclose(rewards, expected, rtol=1e-6)


def test_action_bonus_distinguishes_actions():
    env = ActionBonus(make("MiniGrid-Empty-8x8-v0"))
    p = env.default_params
    _, state = env.reset(jax.random.PRNGKey(0), p)
    _, state, r1, _, _, _ = env.step(state, jnp.int32(6), p)  # done @ (s)
    _, state, r2, _, _, _ = env.step(state, jnp.int32(7), p)  # stay @ same s
    assert float(r1) == 1.0 and float(r2) == 1.0  # distinct (s, a) pairs


def test_img_obs():
    env = ImgObsWrapper(make())
    p = env.default_params
    obs, _ = env.reset(jax.random.PRNGKey(0), p)
    assert obs.shape == (7, 7, 3)


def test_one_hot():
    base = make()
    env = OneHotPartialObsWrapper(base)
    p = env.default_params
    obs, state = env.reset(jax.random.PRNGKey(0), p)
    raw = base.observation(state, p)["image"]
    oh = np.asarray(obs["image"])
    assert oh.shape == (7, 7, 47)
    i, j = 3, 6
    t, c, s = np.asarray(raw)[i, j]
    assert oh[i, j, t] == 1 and oh[i, j, 34 + c] == 1 and oh[i, j, 44 + s] == 1
    assert oh.sum() == 7 * 7 * 3


def test_fully_obs_agent_stamp():
    env = FullyObsWrapper(make("MiniGrid-Empty-5x5-v0"))
    p = env.default_params
    obs, state = env.reset(jax.random.PRNGKey(0), p)
    img = np.asarray(obs["image"])
    assert img.shape == (5, 5, 3)
    ax, ay = np.asarray(state.agent_pos)
    assert img[ax, ay, 0] == C.OBJECT_TO_IDX["agent"]
    assert img[ax, ay, 2] == int(state.agent_dir)


def test_symbolic_obs():
    env = SymbolicObsWrapper(make("MiniGrid-Empty-5x5-v0"))
    p = env.default_params
    obs, state = env.reset(jax.random.PRNGKey(0), p)
    img = np.asarray(obs["image"])
    assert img[2, 3, 0] == 2 and img[2, 3, 1] == 3  # coordinates channel
    assert img[0, 0, 2] == C.OBJECT_TO_IDX["wall"]
    ax, ay = np.asarray(state.agent_pos)
    assert img[ax, ay, 2] == C.OBJECT_TO_IDX["agent"]


def test_view_size():
    env = ViewSizeWrapper(make(), agent_view_size=5)
    p = env.default_params
    obs, _ = env.reset(jax.random.PRNGKey(0), p)
    assert obs["image"].shape == (5, 5, 3)


def test_direction_obs():
    env = DirectionObsWrapper(make("MiniGrid-Empty-5x5-v0"))
    p = env.default_params
    obs, state = env.reset(jax.random.PRNGKey(0), p)
    # agent (1,1), goal (3,3): slope = (3-1)/(3-1) = 1
    assert float(obs["goal_direction"]) == 1.0


def test_dict_obs_round_trip():
    """Token arrays decode back to the mission words (ref test_wrappers.py:130-144)."""
    base = make("MiniGrid-Fetch-8x8-N3-v0")
    env = DictObservationSpaceWrapper(base)
    p = env.default_params
    obs, state = env.reset(jax.random.PRNGKey(2), p)
    tokens = np.asarray(obs["mission"])
    words = {v: k for k, v in env.word_dict.items()}
    decoded = " ".join(words[t - 1] for t in tokens if t > 0)
    text = base.mission_text(np.asarray(state.mission))
    color = C.IDX_TO_COLOR[int(state.mission[1])]
    if color in ("red", "green", "blue", "yellow", "purple", "grey"):
        assert decoded == text
    else:
        assert decoded == ""  # out-of-vocab color -> zero row (fork quirk)


def test_flat_obs():
    env = FlatObsWrapper(make("MiniGrid-Fetch-8x8-N3-v0"))
    p = env.default_params
    obs, state = env.reset(jax.random.PRNGKey(0), p)
    assert obs.shape == (7 * 7 * 3 + 96 * 28,)
    # the char block one-hot encodes exactly len(mission) characters
    text = env.env.mission_text(np.asarray(state.mission))
    assert float(obs[7 * 7 * 3:].sum()) == len(text)


@pytest.mark.parametrize("wrap", [
    lambda e: ImgObsWrapper(e),
    lambda e: OneHotPartialObsWrapper(e),
    lambda e: FullyObsWrapper(e),
    lambda e: StateBonus(e),
    lambda e: ActionBonus(e),
])
def test_wrappers_compose_with_vector_env(wrap):
    env = wrap(make("MiniGrid-DoorKey-5x5-v0"))
    venv = VectorEnv(env, num_envs=4)
    obs, state = venv.reset(jax.random.PRNGKey(0))
    acts = jnp.zeros((4,), dtype=jnp.int32)
    for _ in range(3):
        obs, state, r, te, tr, _ = venv.step(state, acts)
    assert r.shape == (4,)


def test_easy_mode_wrapper():
    """EasyMode exposes goal coords + robot pose (ref wrappers.py:258-271,
    with the upstream target_cell breakage repaired from state)."""
    from minigrid_tpu.wrappers import EasyModeWrapper

    env = EasyModeWrapper(make("MiniGrid-Empty-8x8-v0"))
    p = env.default_params
    obs, state = env.reset(jax.random.PRNGKey(0), p)
    assert set(obs) == {"mission", "visual_obs", "robot_obs", "target_cell"}
    # Empty-8x8 goal is fixed bottom-right (reference envs/empty.py:103).
    np.testing.assert_array_equal(np.asarray(obs["target_cell"]), [6, 6])
    robot = np.asarray(obs["robot_obs"])
    assert robot.shape == (6,)
    np.testing.assert_array_equal(robot[:2], np.asarray(state.agent_pos))
    assert robot[2:].sum() == 1.0 and robot[2 + int(state.agent_dir)] == 1.0


def test_no_language_wrapper():
    """NoLanguage = FullyObs + target coords (ref wrappers.py:273-282)."""
    from minigrid_tpu.wrappers import NoLanguageWrapper

    env = NoLanguageWrapper(make("MiniGrid-Empty-8x8-v0"))
    p = env.default_params
    obs, state = env.reset(jax.random.PRNGKey(0), p)
    assert obs["image"].shape == (8, 8, 3)
    ax, ay = int(state.agent_pos[0]), int(state.agent_pos[1])
    assert int(obs["image"][ax, ay, 0]) == C.OBJECT_TO_IDX["agent"]
    np.testing.assert_array_equal(np.asarray(obs["target_cell"]), [6, 6])
    robot = np.asarray(obs["robot_obs"])
    np.testing.assert_array_equal(robot[:2], [6, 6])
    np.testing.assert_array_equal(robot[2:4], np.asarray(state.agent_pos))


def test_easy_mode_vector_compose():
    from minigrid_tpu.wrappers import EasyModeWrapper

    env = EasyModeWrapper(make("MiniGrid-Empty-8x8-v0"))
    venv = VectorEnv(env, 4)
    obs, state = venv.reset(jax.random.PRNGKey(0))
    assert obs["target_cell"].shape == (4, 2)
    obs, state, r, te, tr, _ = venv.step(state, jnp.zeros(4, jnp.int32))
    assert obs["robot_obs"].shape == (4, 6)
