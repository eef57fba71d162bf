"""Gymnasium adapter conformance — the reference's user-facing protocol
(reset/step 5-tuple, render, pickle, registry) over the tensor engine."""

from __future__ import annotations

import pickle

import numpy as np
import pytest

import minigrid_tpu.gym_compat as gc


def test_gym_env_reset_step_protocol():
    env = gc.GymEnv("MiniGrid-Empty-5x5-v0")
    obs, info = env.reset(seed=0)
    assert set(obs) == {"image", "direction", "mission"}
    assert obs["image"].shape == (7, 7, 3) and obs["image"].dtype == np.uint8
    assert isinstance(obs["mission"], str)
    assert env.observation_space["image"].contains(obs["image"])
    obs, reward, term, trunc, info = env.step(2)
    assert isinstance(reward, float) and isinstance(term, bool)
    assert isinstance(trunc, bool) and isinstance(info, dict)


def test_gym_env_seed_determinism():
    env1 = gc.GymEnv("MiniGrid-DoorKey-5x5-v0")
    env2 = gc.GymEnv("MiniGrid-DoorKey-5x5-v0")
    o1, _ = env1.reset(seed=42)
    o2, _ = env2.reset(seed=42)
    np.testing.assert_array_equal(o1["image"], o2["image"])
    for a in [0, 2, 1, 2, 5, 3, 2]:
        s1 = env1.step(a)
        s2 = env2.step(a)
        np.testing.assert_array_equal(s1[0]["image"], s2[0]["image"])
        assert s1[1:] == s2[1:]


def test_gym_env_truncates_at_max_steps():
    env = gc.GymEnv("MiniGrid-Empty-5x5-v0")
    env.reset(seed=1)
    for t in range(env.max_steps):
        obs, r, term, trunc, _ = env.step(6)  # done action: no-op
    assert trunc and not term


def test_gym_env_render_rgb():
    env = gc.GymEnv("MiniGrid-Empty-5x5-v0", render_mode="rgb_array")
    env.reset(seed=0)
    frame = env.render()
    assert frame.shape == (160, 160, 3) and frame.dtype == np.uint8


def test_gym_env_pickle_roundtrip():
    env = gc.GymEnv("MiniGrid-Empty-5x5-v0")
    env.reset(seed=3)
    env.step(2)
    clone = pickle.loads(pickle.dumps(env))
    o1 = env.step(2)
    o2 = clone.step(2)
    np.testing.assert_array_equal(o1[0]["image"], o2[0]["image"])
    assert o1[1:] == o2[1:]
    assert env.hash() == clone.hash()


def test_gym_registry_make():
    gym = pytest.importorskip("gymnasium")
    n = gc.register_gym_envs()
    assert n > 150 or n == 0  # 0 when another test already registered
    env = gym.make("MiniGrid-FourRooms-v0")
    obs, _ = env.reset(seed=0)
    assert obs["image"].shape == (7, 7, 3)
    obs, r, term, trunc, _ = env.step(env.action_space.sample())
    env.close()
