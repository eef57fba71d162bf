"""RL layer tests: GAE correctness, PPO end-to-end, sharded train step.

The reference has no learner to test; the model here is the reference's test
style (closed-form expected values, tests/test_wrappers.py:79-127) applied to
the new components.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import minigrid_tpu
from minigrid_tpu.rl import PPO, ActorCritic, PPOConfig, compute_gae
from minigrid_tpu.rl.ppo import train_step_fn


def reference_gae(rewards, values, dones, last_value, gamma, lam):
    """Straightforward reverse-loop GAE in numpy."""
    T, B = rewards.shape
    adv = np.zeros((T, B), np.float32)
    gae = np.zeros(B, np.float32)
    next_value = last_value
    for t in reversed(range(T)):
        nonterminal = 1.0 - dones[t].astype(np.float32)
        delta = rewards[t] + gamma * next_value * nonterminal - values[t]
        gae = delta + gamma * lam * nonterminal * gae
        adv[t] = gae
        next_value = values[t]
    return adv, adv + values


def test_gae_matches_reference_loop():
    rng = np.random.default_rng(0)
    T, B = 17, 5
    rewards = rng.normal(size=(T, B)).astype(np.float32)
    values = rng.normal(size=(T, B)).astype(np.float32)
    dones = rng.random((T, B)) < 0.15
    last_value = rng.normal(size=B).astype(np.float32)

    adv, tgt = compute_gae(
        jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(dones),
        jnp.asarray(last_value), 0.99, 0.95,
    )
    exp_adv, exp_tgt = reference_gae(
        rewards, values, dones, last_value, 0.99, 0.95
    )
    np.testing.assert_allclose(np.asarray(adv), exp_adv, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tgt), exp_tgt, rtol=1e-5, atol=1e-5)


def test_actor_critic_shapes():
    env = minigrid_tpu.make("MiniGrid-Empty-5x5-v0")
    params_env = env.default_params
    obs, _ = jax.vmap(
        lambda k: env.reset(k, params_env)
    )(jax.random.split(jax.random.PRNGKey(0), 4))
    net = ActorCritic(num_actions=env.num_actions)
    variables = net.init(jax.random.PRNGKey(1), obs)
    logits, value = net.apply(variables, obs)
    assert logits.shape == (4, env.num_actions)
    assert value.shape == (4,)
    assert logits.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_ppo_update_runs_and_learns_signal():
    env = minigrid_tpu.make("MiniGrid-Empty-5x5-v0")
    cfg = PPOConfig(num_envs=8, num_steps=16, num_updates=2,
                    num_minibatches=2, update_epochs=2)
    trainer = PPO(env, env.default_params, cfg)
    runner = trainer.init(jax.random.PRNGKey(0))
    params_before = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(), runner[0].params
    )
    runner, metrics = trainer.update(runner)
    # Params actually moved and every metric is finite.
    moved = jax.tree_util.tree_reduce(
        lambda acc, pair: acc or pair,
        jax.tree_util.tree_map(
            lambda a, b: bool(np.any(np.asarray(a) != b)),
            runner[0].params, params_before,
        ),
        False,
    )
    assert moved
    for k, v in metrics.items():
        assert bool(jnp.all(jnp.isfinite(v))), k
    # step counter advanced epochs*minibatches times
    assert int(runner[0].step) == cfg.update_epochs * cfg.num_minibatches


def test_ppo_pooled_refill_period():
    """PPO on a pooled-strategy env with periodic bulk refill: the update
    runs, params move, metrics stay finite."""
    env = minigrid_tpu.make("BabyAI-GoToRedBallGrey-v0")
    cfg = PPOConfig(num_envs=8, num_steps=16, num_updates=1,
                    num_minibatches=2, update_epochs=1, refill_period=4)
    trainer = PPO(env, env.default_params, cfg)
    # force pooled (auto-selection needs num_envs >= 64)
    from minigrid_tpu.parallel.vector import VectorEnv
    trainer.venv = VectorEnv(env, cfg.num_envs, env.default_params,
                             final_obs=cfg.bootstrap_truncated,
                             reset_strategy="pooled", pool_refill=2)
    runner = trainer.init(jax.random.PRNGKey(0))
    params_before = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(), runner[0].params
    )
    runner, metrics = trainer.update(runner)
    moved = jax.tree_util.tree_reduce(
        lambda acc, pair: acc or pair,
        jax.tree_util.tree_map(
            lambda a, b: bool(np.any(np.asarray(a) != b)),
            runner[0].params, params_before,
        ),
        False,
    )
    assert moved
    for k, v in metrics.items():
        assert bool(jnp.all(jnp.isfinite(v))), k
    # the pool ring advanced in bulk: num_steps/K outer refills of K windows
    assert int(runner[1].tick) == cfg.num_steps


def test_ppo_stats_accumulate_episodes():
    env = minigrid_tpu.make("MiniGrid-Empty-5x5-v0")
    cfg = PPOConfig(num_envs=8, num_steps=64, num_updates=1,
                    num_minibatches=2, update_epochs=1)
    trainer = PPO(env, env.default_params, cfg)
    runner = trainer.init(jax.random.PRNGKey(0))
    runner, metrics = trainer.update(runner)
    # Empty-5x5 truncates at max_steps; with 8 envs * 64 steps some episodes
    # must have finished.
    assert int(metrics["episodes"]) > 0
    assert float(metrics["mean_length"]) > 0


@pytest.mark.parametrize("axes", [("dp",), ("dp", "tp")])
def test_ppo_sharded_train_step(axes):
    """Full train step jits and executes over a multi-device mesh (dp, and
    dp×tp with tensor-sharded params)."""
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices()[:8])
    if len(axes) == 1:
        mesh = Mesh(devices, axes)
    else:
        mesh = Mesh(devices.reshape(4, 2), axes)
    env = minigrid_tpu.make("MiniGrid-Empty-5x5-v0")
    cfg = PPOConfig(num_envs=8, num_steps=8, num_updates=1,
                    num_minibatches=2, update_epochs=1)
    fn, runner = train_step_fn(env, env.default_params, cfg, mesh=mesh)
    runner, metrics = jax.jit(fn)(runner)
    jax.block_until_ready(metrics)
    for k, v in metrics.items():
        assert bool(jnp.all(jnp.isfinite(v))), k


def test_ppo_sharded_pooled_refill():
    """Pooled strategy + periodic bulk refill under a dp mesh: PooledState
    (env batch B, level-pool axis 2B) shards over dp; the refill's
    dynamic_update_slice windows cross shard boundaries; the update
    executes and the ring advances in bulk."""
    from jax.sharding import Mesh

    from minigrid_tpu.parallel.vector import VectorEnv

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("dp",))
    env = minigrid_tpu.make("BabyAI-GoToRedBallGrey-v0")
    cfg = PPOConfig(num_envs=8, num_steps=8, num_updates=1,
                    num_minibatches=2, update_epochs=1, refill_period=4)
    trainer = PPO(env, env.default_params, cfg, mesh=mesh)
    trainer.venv = VectorEnv(env, cfg.num_envs, env.default_params,
                             final_obs=cfg.bootstrap_truncated,
                             reset_strategy="pooled", pool_refill=2)
    runner = trainer.init(jax.random.PRNGKey(0))
    runner, metrics = trainer.update(runner)
    for k, v in metrics.items():
        assert bool(jnp.all(jnp.isfinite(v))), k
    assert int(runner[1].tick) == cfg.num_steps


def test_bc_train_on_oracle_demos():
    """BC over oracle demos: loss decreases, accuracy rises well above the
    1/8 random baseline (the fork's dataset->learning pipeline end-to-end)."""
    from minigrid_tpu.rl.bc import BCConfig, bc_train, pack_bc_dataset
    from minigrid_tpu.tools.generate_demos import collect

    demos = collect("ContrastiveTrajectoryDataset-v0", 20, seed=0)
    assert len(demos) >= 10
    ds = pack_bc_dataset(demos)
    env = minigrid_tpu.make("ContrastiveTrajectoryDataset-v0")
    params, m = bc_train(env, ds, BCConfig(batch_size=32, num_steps=60),
                         jax.random.PRNGKey(0))
    assert float(m["loss"][-1]) < float(m["loss"][0])
    assert float(m["accuracy"][-10:].mean()) > 0.4


def test_recurrent_ppo_update():
    """LSTM actor-critic PPO: update runs, params move, metrics finite,
    carry resets on done (memory tasks need recurrence, envs/memory.py)."""
    from minigrid_tpu.rl.rnn import RecurrentActorCritic, RecurrentPPO

    env = minigrid_tpu.make("MiniGrid-MemoryS7-v0")
    cfg = PPOConfig(num_envs=8, num_steps=16, num_updates=1,
                    num_minibatches=2, update_epochs=2)
    tr = RecurrentPPO(env, env.default_params, cfg)
    runner = tr.init(jax.random.PRNGKey(0))
    before = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(),
                                    runner[0].params)
    runner, m = tr.update(runner)
    moved = any(
        bool(np.any(np.asarray(a) != b))
        for a, b in zip(jax.tree_util.tree_leaves(runner[0].params),
                        jax.tree_util.tree_leaves(before)))
    assert moved
    for k, v in m.items():
        assert bool(jnp.all(jnp.isfinite(v))), k

    # done=True clears the carry: outputs for a cleared carry equal the
    # fresh-carry outputs
    net = RecurrentActorCritic(num_actions=env.num_actions)
    p = env.default_params
    obs, _ = jax.vmap(lambda k: env.reset(k, p))(
        jax.random.split(jax.random.PRNGKey(1), 2))
    carry0 = net.initialize_carry(2)
    params = net.init(jax.random.PRNGKey(2), carry0, obs,
                      jnp.zeros((2,), bool))
    dirty = jax.tree_util.tree_map(lambda c: c + 1.0, carry0)
    _, (l1, v1) = net.apply(params, dirty, obs, jnp.ones((2,), bool))
    _, (l2, v2) = net.apply(params, carry0, obs, jnp.zeros((2,), bool))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5)
