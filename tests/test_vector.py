"""Vectorized batch + auto-reset + device-mesh sharding tests."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

import minigrid_tpu
from minigrid_tpu.parallel.vector import VectorEnv, rollout


def test_vector_reset_step_shapes():
    env = minigrid_tpu.make("MiniGrid-DoorKey-8x8-v0")
    venv = VectorEnv(env, num_envs=16, final_obs=True)
    obs, state = venv.reset(jax.random.PRNGKey(0))
    assert obs["image"].shape == (16, 7, 7, 3)
    actions = jnp.zeros((16,), dtype=jnp.int32)
    obs, state, reward, term, trunc, info = venv.step(state, actions)
    assert reward.shape == (16,)
    assert info["final_obs"]["image"].shape == (16, 7, 7, 3)


def test_vector_envs_decorrelated():
    """Different envs in the batch get different episodes."""
    env = minigrid_tpu.make("MiniGrid-DoorKey-8x8-v0")
    venv = VectorEnv(env, num_envs=8)
    _, state = venv.reset(jax.random.PRNGKey(0))
    grids = np.asarray(state.grid)
    assert not all(
        np.array_equal(grids[0], grids[i]) for i in range(1, 8)
    ), "all envs generated identical levels"


def test_autoreset():
    """Envs that terminate are regenerated with step_count 0."""
    env = minigrid_tpu.make("MiniGrid-Empty-5x5-v0", max_steps=5)
    venv = VectorEnv(env, num_envs=4)
    obs, state = venv.reset(jax.random.PRNGKey(0))
    stay = jnp.full((4,), 7, dtype=jnp.int32)
    for t in range(5):
        obs, state, reward, term, trunc, info = venv.step(state, stay)
    assert bool(jnp.all(trunc))
    assert bool(jnp.all(state.step_count == 0))  # fresh episodes


def test_rollout_deterministic():
    env = minigrid_tpu.make("MiniGrid-DoorKey-5x5-v0")
    params = env.default_params
    s1, t1 = rollout(env, params, jax.random.PRNGKey(3), num_envs=8, num_steps=50)
    s2, t2 = rollout(env, params, jax.random.PRNGKey(3), num_envs=8, num_steps=50)
    np.testing.assert_array_equal(np.asarray(t1["reward"]), np.asarray(t2["reward"]))
    np.testing.assert_array_equal(np.asarray(s1.grid), np.asarray(s2.grid))


def test_rollout_runs_under_jit():
    env = minigrid_tpu.make("MiniGrid-Empty-8x8-v0")
    params = env.default_params
    state, traj = rollout(env, params, jax.random.PRNGKey(0), num_envs=32,
                          num_steps=64)
    assert traj["reward"].shape == (64, 32)
    # No episode ended (64 < max_steps and random policy), so step counts
    # advanced in lockstep.
    assert bool(jnp.all(state.step_count == 64) | jnp.any(traj["terminated"]))
