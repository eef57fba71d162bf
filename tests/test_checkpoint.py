"""Checkpoint/resume + profiler harness tests (SURVEY.md §5 subsystems)."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

import minigrid_tpu
from minigrid_tpu.parallel.vector import VectorEnv
from minigrid_tpu.utils.checkpoint import load, save, state_hash


def test_env_state_checkpoint_roundtrip(tmp_path):
    env = minigrid_tpu.make("MiniGrid-DoorKey-5x5-v0")
    venv = VectorEnv(env, 4)
    obs, state = venv.reset(jax.random.PRNGKey(0))
    obs, state, *_ = venv.step(state, jnp.zeros(4, jnp.int32))

    path = str(tmp_path / "state.msgpack")
    save(path, state)
    # Template: a fresh, different state with the same structure.
    _, template = venv.reset(jax.random.PRNGKey(1))
    restored = venv.step(load(path, template), jnp.ones(4, jnp.int32))
    resumed = venv.step(state, jnp.ones(4, jnp.int32))
    for a, b in zip(jax.tree_util.tree_leaves(restored[1]),
                    jax.tree_util.tree_leaves(resumed[1])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_state_hash_detects_change():
    env = minigrid_tpu.make("MiniGrid-Empty-5x5-v0")
    p = env.default_params
    _, s1 = env.reset(jax.random.PRNGKey(0), p)
    _, s2 = env.reset(jax.random.PRNGKey(0), p)
    assert state_hash(s1) == state_hash(s2)
    _, s3, *_ = env.step(s1, jnp.int32(2), p)
    assert state_hash(s3) != state_hash(s1)


def test_ppo_runner_checkpoint_roundtrip(tmp_path):
    from minigrid_tpu.rl import PPO, PPOConfig

    env = minigrid_tpu.make("MiniGrid-Empty-5x5-v0")
    cfg = PPOConfig(num_envs=4, num_steps=8, num_updates=1,
                    num_minibatches=2, update_epochs=1)
    tr = PPO(env, env.default_params, cfg)
    runner = tr.init(jax.random.PRNGKey(0))
    runner, _ = tr.update(runner)

    path = str(tmp_path / "runner.msgpack")
    save(path, runner)
    template = tr.init(jax.random.PRNGKey(7))
    restored = load(path, template)
    a, _ = tr.update(restored)
    b, _ = tr.update(runner)
    for x, y in zip(jax.tree_util.tree_leaves(a[0].params),
                    jax.tree_util.tree_leaves(b[0].params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_profile_harness_runs():
    from minigrid_tpu.tools.profile import profile_rollout

    res = profile_rollout("MiniGrid-Empty-5x5-v0", num_envs=4, num_steps=8)
    assert res["steps_per_sec"] > 0
