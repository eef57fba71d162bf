"""Gymnasium ``check_env`` conformance over EVERY registered id.

The reference runs gymnasium's env checker per registered spec
(/root/reference/tests/test_envs.py:26-38) — though its fork-disabled
registry means that suite could never actually run there.  Here the sweep
runs for real: all ids (MiniGrid + BabyAI + fork dataset envs) through
``check_env`` plus a reset/step/pickle/hash pass.

Render conformance is deliberately excluded (``skip_render_check=True``):
the frame pipeline is covered pixel-exactly against the reference in
tests/test_render.py, and compiling the full-grid render program for ~171
ids would multiply suite wall-clock for no new signal.
"""

from __future__ import annotations

import pickle
import warnings

import numpy as np
import pytest

import gymnasium as gym
from gymnasium.utils.env_checker import check_env

import minigrid_tpu.gym_compat as gc
from minigrid_tpu.registry import registered_ids

gc.register_gym_envs()

ALL_IDS = sorted(registered_ids())

# Warnings the checker may emit that are acceptable by design (the
# reference keeps its own allowlist, tests/test_envs.py:16-23).  Currently
# empty: the adapter surfaces int64 direction scalars and in-space strings.
CHECK_ENV_ALLOWED_WARNINGS: list[str] = []


_SWEEP_COUNT = [0]


@pytest.fixture(autouse=True)
def _bound_compile_cache():
    """Every env id compiles its own reset/step programs; 171 of them in one
    process exhaust memory (the sweep died to the OOM killer without this).
    Drop the jit caches and env singletons every few ids."""
    yield
    _SWEEP_COUNT[0] += 1
    if _SWEEP_COUNT[0] % 10 == 0:
        import jax

        from minigrid_tpu import registry

        gc._JIT_CACHE.clear()
        registry._INSTANCES.clear()
        jax.clear_caches()


def test_sweep_covers_all_registered_ids():
    """171 = 168 reference ids + 3 fork dataset ids (VERDICT r1 §L8)."""
    assert len(ALL_IDS) == 171


@pytest.mark.parametrize("env_id", ALL_IDS)
def test_check_env_conformance(env_id):
    env = gym.make(env_id, disable_env_checker=True).unwrapped
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        check_env(env, skip_render_check=True)
    unexpected = [
        str(w.message)
        for w in caught
        if not any(a in str(w.message) for a in CHECK_ENV_ALLOWED_WARNINGS)
    ]
    assert not unexpected, f"check_env warnings for {env_id}: {unexpected}"

    # reset/step/pickle/hash (reference pickle test, test_envs.py:168-183).
    obs, _ = env.reset(seed=7)
    assert env.observation_space.contains(obs)
    rng = np.random.default_rng(7)
    for _ in range(5):
        a = int(rng.integers(env.action_space.n))
        obs, reward, term, trunc, _ = env.step(a)
        assert env.observation_space.contains(obs)
        # |r| <= 1 across the whole zoo (Negated rewards ±1,
        # DynamicObstacles collision -1, shaped success in (0, 1]).
        assert abs(float(reward)) <= 1.0
        if term or trunc:
            obs, _ = env.reset()
    clone = pickle.loads(pickle.dumps(env))
    assert clone.hash() == env.hash(), "pickle round-trip changed env state"
    assert clone.observation_space == env.observation_space
