"""Recurrent PPO (LSTM actor-critic) for memory tasks.

MemoryEnv (reference envs/memory.py:12-165) and the fork's
trajectory-dataset settings are partially observable across steps — a
feed-forward policy cannot carry the start-of-corridor cue to the decision
point.  This module adds the recurrent learner: an LSTM over the shared
:class:`~minigrid_tpu.rl.networks.ObsEncoder`, with hidden state reset on
episode boundaries, and a PPO update that re-runs the network over
time-major sequences per minibatch (minibatches partition the *env* axis so
hidden-state chains stay intact).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training.train_state import TrainState

from minigrid_tpu.core.env import Env
from minigrid_tpu.core.state import EnvParams
from minigrid_tpu.parallel.vector import VectorEnv
from minigrid_tpu.rl.networks import NUM_ACTIONS, ObsEncoder
from minigrid_tpu.rl.ppo import EpisodeStats, PPOConfig, compute_gae


class RecurrentActorCritic(nn.Module):
    """ObsEncoder -> LSTM -> policy/value heads, with done-gated carry."""

    num_actions: int = NUM_ACTIONS
    hidden: int = 256
    embed_dim: int = 16
    conv_features: Sequence[int] = (128, 128)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, carry, obs: dict, done: jnp.ndarray):
        """One time step over a [B, ...] batch.

        ``done`` marks envs whose episode ended BEFORE this obs (auto-reset
        already swapped in the new episode) — their memory is cleared.
        Returns (carry', (logits float32[B, A], value float32[B])).
        """
        x = ObsEncoder(
            embed_dim=self.embed_dim,
            conv_features=tuple(self.conv_features),
            out_features=self.hidden,
            dtype=self.dtype,
        )(obs)
        carry = jax.tree_util.tree_map(
            lambda c: jnp.where(done[:, None], jnp.zeros_like(c), c), carry
        )
        cell = nn.OptimizedLSTMCell(self.hidden, dtype=self.dtype)
        carry, y = cell(carry, x)
        y = y.astype(jnp.float32)
        logits = nn.Dense(
            self.num_actions, dtype=jnp.float32,
            kernel_init=nn.initializers.orthogonal(0.01),
        )(y)
        value = nn.Dense(
            1, dtype=jnp.float32,
            kernel_init=nn.initializers.orthogonal(1.0),
        )(y).squeeze(-1)
        return carry, (logits, value)

    def initialize_carry(self, batch: int):
        shape = (batch, self.hidden)
        return (jnp.zeros(shape, self.dtype), jnp.zeros(shape, self.dtype))


class RecurrentPPO:
    """PPO with an LSTM policy.  API mirrors :class:`minigrid_tpu.rl.PPO`;
    the runner additionally carries (lstm_carry, prev_done)."""

    def __init__(self, env: Env, env_params: EnvParams | None = None,
                 config: PPOConfig | None = None,
                 network: RecurrentActorCritic | None = None):
        self.env = env
        self.env_params = env_params or env.default_params
        self.config = config or PPOConfig()
        assert self.config.num_envs % self.config.num_minibatches == 0, (
            "recurrent minibatches partition the env axis")
        self.network = network or RecurrentActorCritic(
            num_actions=env.num_actions)
        self.venv = VectorEnv(env, self.config.num_envs, self.env_params)
        self._update = jax.jit(self._update_impl)

    def init(self, key: jnp.ndarray):
        cfg = self.config
        key, k_net, k_env = jax.random.split(key, 3)
        obs, env_state = self.venv.reset(k_env)
        carry = self.network.initialize_carry(cfg.num_envs)
        sample_obs = jax.tree_util.tree_map(lambda x: x[:1], obs)
        sample_carry = self.network.initialize_carry(1)
        params = self.network.init(k_net, sample_carry, sample_obs,
                                   jnp.zeros((1,), bool))
        if cfg.anneal_lr:
            total = cfg.num_updates * cfg.update_epochs * cfg.num_minibatches
            lr = optax.linear_schedule(cfg.lr, 0.0, total)
        else:
            lr = cfg.lr
        tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm),
                         optax.adam(lr, eps=1e-5))
        train_state = TrainState.create(apply_fn=self.network.apply,
                                        params=params, tx=tx)
        stats = EpisodeStats.zeros(cfg.num_envs)
        prev_done = jnp.zeros((cfg.num_envs,), bool)
        return (train_state, env_state, obs, carry, prev_done, key, stats)

    # -- one fused update ------------------------------------------------------
    def _update_impl(self, runner):
        cfg = self.config
        (train_state, env_state, obs, carry, prev_done, key, stats) = runner
        initial_carry = carry  # hidden state at rollout start, per env

        def env_step(c, _):
            train_state, env_state, obs, carry, prev_done, key, stats = c
            key, k_act = jax.random.split(key)
            new_carry, (logits, value) = train_state.apply_fn(
                train_state.params, carry, obs, prev_done)
            action = jax.random.categorical(k_act, logits)
            log_prob = jnp.take_along_axis(
                jax.nn.log_softmax(logits), action[:, None], axis=-1
            ).squeeze(-1)
            new_obs, new_env_state, reward, term, trunc, _ = self.venv._step(
                env_state, action)
            done = term | trunc
            stats = stats.update(reward, done)
            transition = {
                "obs": obs, "action": action, "log_prob": log_prob,
                "value": value, "reward": reward, "done": done,
                "prev_done": prev_done,
            }
            return (train_state, new_env_state, new_obs, new_carry, done,
                    key, stats), transition

        (train_state, env_state, obs, carry, prev_done, key, stats), traj = (
            jax.lax.scan(
                env_step,
                (train_state, env_state, obs, carry, prev_done, key, stats),
                None, length=cfg.num_steps))

        _, (_, last_value) = train_state.apply_fn(
            train_state.params, carry, obs, prev_done)
        # NOTE: truncated steps are treated as terminal here (zero bootstrap).
        # The exact fix used by the feed-forward PPO (bootstrap from
        # V(final pre-reset obs)) would need the post-observation recurrent
        # carry for the finished episode, which the fused rollout does not
        # keep; the bias is small for the gammas used with these tasks.
        advantages, targets = compute_gae(
            traj["reward"], traj["value"], traj["done"], last_value,
            cfg.gamma, cfg.gae_lambda)
        batch = {**traj, "advantage": advantages, "target": targets}

        env_mb = cfg.num_envs // cfg.num_minibatches

        def loss_fn(params, mb, mb_carry):
            def net_step(carry, xs):
                obs_t, pd_t = xs
                carry, (logits, value) = self.network.apply(
                    params, carry, obs_t, pd_t)
                return carry, (logits, value)

            _, (logits, values) = jax.lax.scan(
                net_step, mb_carry, (mb["obs"], mb["prev_done"]))
            log_probs = jax.nn.log_softmax(logits)  # [T, mb, A]
            logp = jnp.take_along_axis(
                log_probs, mb["action"][..., None], axis=-1).squeeze(-1)
            ratio = jnp.exp(logp - mb["log_prob"])
            adv = mb["advantage"]
            adv = (adv - adv.mean()) / (adv.std() + 1e-8)
            pg1 = ratio * adv
            pg2 = jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * adv
            policy_loss = -jnp.minimum(pg1, pg2).mean()
            v_clip = mb["value"] + jnp.clip(values - mb["value"],
                                            -cfg.clip_eps, cfg.clip_eps)
            value_loss = 0.5 * jnp.maximum(
                jnp.square(values - mb["target"]),
                jnp.square(v_clip - mb["target"])).mean()
            entropy = -(jnp.exp(log_probs) * log_probs).sum(-1).mean()
            loss = (policy_loss + cfg.vf_coef * value_loss
                    - cfg.ent_coef * entropy)
            return loss, {"loss": loss, "policy_loss": policy_loss,
                          "value_loss": value_loss, "entropy": entropy}

        def epoch(c, _):
            train_state, key = c
            key, k_perm = jax.random.split(key)
            perm = jax.random.permutation(k_perm, cfg.num_envs)

            def minibatch(train_state, idx):
                take_env = lambda x: jnp.take(x, idx, axis=1)  # noqa: E731
                mb = jax.tree_util.tree_map(take_env, batch)
                mb_carry = jax.tree_util.tree_map(
                    lambda c: jnp.take(c, idx, axis=0), initial_carry)
                grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
                (loss, metrics), grads = grad_fn(train_state.params, mb,
                                                 mb_carry)
                return train_state.apply_gradients(grads=grads), metrics

            idxs = perm.reshape(cfg.num_minibatches, env_mb)
            train_state, metrics = jax.lax.scan(minibatch, train_state, idxs)
            return (train_state, key), metrics

        (train_state, key), metrics = jax.lax.scan(
            epoch, (train_state, key), None, length=cfg.update_epochs)
        metrics = jax.tree_util.tree_map(jnp.mean, metrics)
        safe = jnp.maximum(stats.episode_count, 1)
        metrics.update(
            episodes=stats.episode_count,
            mean_return=stats.return_sum / safe,
            mean_length=stats.length_sum / safe,
            success_rate=stats.success_count / safe,
        )
        stats = stats.replace(
            episode_count=jnp.zeros((), jnp.int32),
            return_sum=jnp.zeros((), jnp.float32),
            length_sum=jnp.zeros((), jnp.float32),
            success_count=jnp.zeros((), jnp.int32),
        )
        return (train_state, env_state, obs, carry, prev_done, key,
                stats), metrics

    def update(self, runner):
        return self._update(runner)

    def train(self, runner, num_updates: int | None = None):
        n = num_updates if num_updates is not None else self.config.num_updates
        all_metrics = []
        for _ in range(n):
            runner, metrics = self._update(runner)
            all_metrics.append(metrics)
        return runner, jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *all_metrics)
