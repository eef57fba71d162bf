"""PPO actor-learner, fully on-device.

The reference has no trainer (SURVEY.md §5: no checkpoints, no metrics, no
model).  This module supplies the learner the BASELINE targets assume: PPO
with GAE over the vectorized env, where **one jitted program** performs
rollout (lax.scan over the env step), advantage estimation (reverse scan),
and minibatched clipped-objective SGD (scan over epochs × minibatches).
Nothing but final metrics crosses to the host.

Scale-out is by sharding, not processes: the env batch axis is annotated onto
the mesh's ``dp`` axis, parameters are replicated (or tensor-sharded over
``tp`` — see :func:`tp_param_sharding`), and XLA inserts the gradient psum
over ICI.  The same program runs single-chip, on a v4-8, or on a CPU
``--xla_force_host_platform_device_count`` mesh in the tests.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training.train_state import TrainState
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from minigrid_tpu.core.env import Env
from minigrid_tpu.core.state import EnvParams
from minigrid_tpu.parallel.vector import VectorEnv
from minigrid_tpu.rl.networks import ActorCritic


@struct.dataclass
class PPOConfig:
    """Hyperparameters; all jit-static."""

    num_envs: int = struct.field(pytree_node=False, default=256)
    num_steps: int = struct.field(pytree_node=False, default=128)
    num_updates: int = struct.field(pytree_node=False, default=64)
    update_epochs: int = struct.field(pytree_node=False, default=4)
    num_minibatches: int = struct.field(pytree_node=False, default=8)
    lr: float = struct.field(pytree_node=False, default=2.5e-4)
    anneal_lr: bool = struct.field(pytree_node=False, default=True)
    gamma: float = struct.field(pytree_node=False, default=0.99)
    gae_lambda: float = struct.field(pytree_node=False, default=0.95)
    clip_eps: float = struct.field(pytree_node=False, default=0.2)
    ent_coef: float = struct.field(pytree_node=False, default=0.01)
    vf_coef: float = struct.field(pytree_node=False, default=0.5)
    max_grad_norm: float = struct.field(pytree_node=False, default=0.5)
    # Bootstrap truncated-but-not-terminated steps from V(final pre-reset
    # obs) rather than zero.  Costs one extra network apply per rollout step.
    bootstrap_truncated: bool = struct.field(pytree_node=False, default=True)
    # Pooled-strategy envs only: run the level-pool refill once every K
    # rollout steps at K-windows width instead of every step — the refill
    # graph's TPU cost is its kernel-launch count, not its width
    # (parallel/vector.py::rollout has the same knob).  Ignored unless the
    # env resolves to the pooled reset strategy.  Must divide num_steps,
    # and refill_period*pool_refill must divide the 2*num_envs pool ring
    # (or exceed it — then each refill rewrites the whole ring).
    #
    # Refill semantics under the pooled strategy follow the VectorEnv the
    # learner is given: best-effort by default (stale replays at the
    # pool-miss rate; pass strict_refill=True to VectorEnv for always-fresh
    # levels — see PERF.md round-3 #3/#5).  The published learner results
    # (PERF.md "Learner": Empty-8x8, DoorKey-5x5, MemoryS7) all resolve to
    # the FUSED strategy, so no stale replay was involved in them at all.
    refill_period: int = struct.field(pytree_node=False, default=1)


@struct.dataclass
class EpisodeStats:
    """Per-env running episode accounting, reduced on device.

    The reference logs nothing (print statements only, SURVEY.md §5); here
    returns/lengths/success counts are device arrays folded into the training
    scan and reduced once per update.
    """

    running_return: jnp.ndarray  # float32[B]
    running_length: jnp.ndarray  # int32[B]
    episode_count: jnp.ndarray  # int32 []
    return_sum: jnp.ndarray  # float32 []
    length_sum: jnp.ndarray  # float32 []
    success_count: jnp.ndarray  # int32 [] — episodes ending with reward > 0

    @staticmethod
    def zeros(num_envs: int) -> "EpisodeStats":
        return EpisodeStats(
            running_return=jnp.zeros(num_envs, jnp.float32),
            running_length=jnp.zeros(num_envs, jnp.int32),
            episode_count=jnp.zeros((), jnp.int32),
            return_sum=jnp.zeros((), jnp.float32),
            length_sum=jnp.zeros((), jnp.float32),
            success_count=jnp.zeros((), jnp.int32),
        )

    def update(self, reward: jnp.ndarray, done: jnp.ndarray) -> "EpisodeStats":
        ret = self.running_return + reward
        length = self.running_length + 1
        return EpisodeStats(
            running_return=jnp.where(done, 0.0, ret),
            running_length=jnp.where(done, 0, length),
            episode_count=self.episode_count + jnp.sum(done),
            return_sum=self.return_sum + jnp.sum(jnp.where(done, ret, 0.0)),
            length_sum=self.length_sum
            + jnp.sum(jnp.where(done, length, 0).astype(jnp.float32)),
            success_count=self.success_count
            + jnp.sum(done & (reward > 0.0)),
        )


def compute_gae(
    rewards: jnp.ndarray,  # float32[T, B]
    values: jnp.ndarray,  # float32[T, B]
    dones: jnp.ndarray,  # bool[T, B] — episode ended AT this step
    last_value: jnp.ndarray,  # float32[B]
    gamma: float,
    lam: float,
    truncated: jnp.ndarray | None = None,  # bool[T, B] — truncated, NOT terminated
    trunc_values: jnp.ndarray | None = None,  # float32[T, B] — V(final pre-reset obs)
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Generalized advantage estimation as a reverse lax.scan.

    Returns (advantages[T, B], targets[T, B]) with targets = adv + values.

    When ``truncated``/``trunc_values`` are given, a step that hit the time
    limit without truly terminating bootstraps from the value of the final
    (pre-auto-reset) observation instead of zero — time-limit truncation is
    not a true terminal, and zeroing the bootstrap biases value targets low
    near the step cap.  Without them, every done is treated as terminal
    (the common, slightly biased approximation).
    """
    if truncated is None:
        truncated = jnp.zeros_like(dones)
        trunc_values = jnp.zeros_like(values)

    def body(carry, xs):
        gae, next_value = carry
        reward, value, done, trunc, tval = xs
        nonterminal = 1.0 - done.astype(jnp.float32)
        # Episode boundary always cuts the GAE recursion, but the one-step
        # bootstrap survives a pure truncation via V(final_obs).
        next_v = jnp.where(trunc, tval, next_value * nonterminal)
        delta = reward + gamma * next_v - value
        gae = delta + gamma * lam * nonterminal * gae
        return (gae, value), gae

    (_, _), advantages = jax.lax.scan(
        body,
        (jnp.zeros_like(last_value), last_value),
        (rewards, values, dones, truncated, trunc_values),
        reverse=True,
    )
    return advantages, advantages + values


def ppo_loss(
    params: Any,
    apply_fn: Any,
    batch: dict,
    clip_eps: float,
    ent_coef: float,
    vf_coef: float,
) -> tuple[jnp.ndarray, dict]:
    """Clipped PPO objective on one minibatch of flattened transitions."""
    logits, value = apply_fn(params, batch["obs"])
    log_probs = jax.nn.log_softmax(logits)
    logp = jnp.take_along_axis(
        log_probs, batch["action"][:, None], axis=-1
    ).squeeze(-1)

    ratio = jnp.exp(logp - batch["log_prob"])
    adv = batch["advantage"]
    adv = (adv - adv.mean()) / (adv.std() + 1e-8)
    pg1 = ratio * adv
    pg2 = jnp.clip(ratio, 1.0 - clip_eps, 1.0 + clip_eps) * adv
    policy_loss = -jnp.minimum(pg1, pg2).mean()

    v_clipped = batch["value"] + jnp.clip(
        value - batch["value"], -clip_eps, clip_eps
    )
    vf1 = jnp.square(value - batch["target"])
    vf2 = jnp.square(v_clipped - batch["target"])
    value_loss = 0.5 * jnp.maximum(vf1, vf2).mean()

    entropy = -(jnp.exp(log_probs) * log_probs).sum(-1).mean()

    loss = policy_loss + vf_coef * value_loss - ent_coef * entropy
    metrics = {
        "loss": loss,
        "policy_loss": policy_loss,
        "value_loss": value_loss,
        "entropy": entropy,
        "approx_kl": ((ratio - 1.0) - jnp.log(ratio)).mean(),
    }
    return loss, metrics


def tp_param_sharding(params: Any, mesh: Mesh, axis: str = "tp") -> Any:
    """Tensor-parallel NamedShardings for an ActorCritic param tree.

    Shards every kernel's output-feature dimension (and embedding tables'
    feature dim) over ``axis``; biases and scalars replicate.  XLA turns the
    annotated matmuls into per-shard contractions with the matching
    collectives on ICI — the hand-written NCCL layer a torch build would
    need simply does not exist here.
    """

    size = mesh.shape[axis]

    def spec(x: jnp.ndarray) -> P:
        # Small heads (e.g. the value head's (H, 1) kernel) replicate.
        if x.ndim >= 2 and x.shape[-1] % size == 0:
            return P(*([None] * (x.ndim - 1) + [axis]))
        return P()

    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, spec(x)), params
    )


class PPO:
    """PPO trainer bound to one env family.

    Usage::

        trainer = PPO(env, env.default_params, PPOConfig(...))
        state = trainer.init(jax.random.PRNGKey(0))
        state, metrics = trainer.train(state)          # num_updates updates
        # or one fused update at a time:
        state, metrics = trainer.update(state)

    With ``mesh``: env batch sharded over the ``dp`` axis, params replicated
    (or tp-sharded when the mesh has a ``tp`` axis), gradient reduction
    compiled by XLA.
    """

    def __init__(
        self,
        env: Env,
        env_params: EnvParams | None = None,
        config: PPOConfig | None = None,
        mesh: Mesh | None = None,
        network: ActorCritic | None = None,
    ):
        self.env = env
        self.env_params = env_params or env.default_params
        self.config = config or PPOConfig()
        self.mesh = mesh
        self.network = network or ActorCritic(num_actions=env.num_actions)
        self.venv = VectorEnv(
            env,
            self.config.num_envs,
            self.env_params,
            final_obs=self.config.bootstrap_truncated,
            # With a mesh the obs routes through jax.shard_map over 'dp'
            # (Env.observation_batch_sharded): GSPMD cannot partition an
            # opaque Mosaic kernel, but shard_map hands each device its
            # local batch shard, so every chip runs the fused obs program.
            mesh=mesh,
            mesh_axis="dp",
        )

        if mesh is not None:
            assert "dp" in mesh.axis_names, "mesh must have a 'dp' axis"
            self._batch_shard = NamedSharding(mesh, P("dp"))
            self._replicated = NamedSharding(mesh, P())
            self._dp = mesh.shape["dp"]
        else:
            self._batch_shard = None
            self._replicated = None
            self._dp = 1

        self._update = jax.jit(self._update_impl)

    def _batch_shard_tree(self, tree):
        """dp-shard leaves with a dp-divisible leading axis (env batch B,
        level-pool axis P of PooledState); replicate scalars/counters."""

        def spec(x):
            if (getattr(x, "ndim", 0) >= 1 and x.shape[0] >= self._dp
                    and x.shape[0] % self._dp == 0):
                return self._batch_shard
            return self._replicated

        return jax.tree_util.tree_map(spec, tree)

    # -- setup ---------------------------------------------------------------
    def init(self, key: jnp.ndarray):
        """(train_state, env_state, obs, key, stats) runner tuple."""
        cfg = self.config
        key, k_net, k_env = jax.random.split(key, 3)
        obs, env_state = self.venv.reset(k_env)
        sample_obs = jax.tree_util.tree_map(lambda x: x[:1], obs)
        params = self.network.init(k_net, sample_obs)

        if cfg.anneal_lr:
            total_minibatch_updates = (
                cfg.num_updates * cfg.update_epochs * cfg.num_minibatches
            )
            lr = optax.linear_schedule(cfg.lr, 0.0, total_minibatch_updates)
        else:
            lr = cfg.lr
        tx = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.adam(lr, eps=1e-5),
        )
        train_state = TrainState.create(
            apply_fn=self.network.apply, params=params, tx=tx
        )

        if self.mesh is not None:
            if "tp" in self.mesh.axis_names:
                shardings = tp_param_sharding(train_state.params, self.mesh)
                train_state = train_state.replace(
                    params=jax.device_put(train_state.params, shardings)
                )
            else:
                train_state = jax.device_put(train_state, self._replicated)
            obs = jax.device_put(obs, self._batch_shard)
            env_state = jax.device_put(
                env_state, self._batch_shard_tree(env_state)
            )
        stats = EpisodeStats.zeros(cfg.num_envs)
        return (train_state, env_state, obs, key, stats)

    # -- one fused update -----------------------------------------------------
    def _update_impl(self, runner):
        cfg = self.config
        train_state, env_state, obs, key, stats = runner

        def constrain_batch(tree):
            if self._batch_shard is None:
                return tree
            return jax.lax.with_sharding_constraint(
                tree, self._batch_shard_tree(tree)
            )

        # ---- rollout: T steps under one scan --------------------------------
        def make_env_step(step_fn):
            def env_step(carry, _):
                train_state, env_state, obs, key, stats = carry
                key, k_act = jax.random.split(key)
                logits, value = train_state.apply_fn(train_state.params, obs)
                action = jax.random.categorical(k_act, logits)
                log_prob = jnp.take_along_axis(
                    jax.nn.log_softmax(logits), action[:, None], axis=-1
                ).squeeze(-1)
                new_obs, new_env_state, reward, term, trunc, info = step_fn(
                    env_state, action
                )
                new_env_state = constrain_batch(new_env_state)
                new_obs = constrain_batch(new_obs)
                done = term | trunc
                stats = stats.update(reward, done)
                transition = {
                    "obs": obs,
                    "action": action,
                    "log_prob": log_prob,
                    "value": value,
                    "reward": reward,
                    "done": done,
                }
                if cfg.bootstrap_truncated:
                    # V(final pre-reset obs) for the time-limit bootstrap; a
                    # terminated step keeps the zero bootstrap (term dominates
                    # if both flags fire on the same step).
                    _, final_value = train_state.apply_fn(
                        train_state.params, info["final_obs"]
                    )
                    transition["truncated"] = trunc & ~term
                    transition["trunc_value"] = final_value
                return (train_state, new_env_state, new_obs, key,
                        stats), transition
            return env_step

        K = (cfg.refill_period
             if (self.venv.reset_strategy == "pooled" and self.venv.auto_reset)
             else 1)
        if K > 1:
            # scan-of-scans: K consume-only steps, then ONE K-window bulk
            # refill — same level throughput, 1/K the refill launches.
            assert cfg.num_steps % K == 0, (cfg.num_steps, K)
            _ring = 2 * cfg.num_envs
            _n = min(K * self.venv.pool_refill, _ring)
            assert _ring % _n == 0, (
                f"refill_period*pool_refill = {K * self.venv.pool_refill} "
                f"must divide the pool ring size {_ring} (or exceed it); "
                f"pool_refill={self.venv.pool_refill}"
            )

            def outer(carry, _):
                carry, traj = jax.lax.scan(
                    make_env_step(self.venv._step_nofill), carry, None,
                    length=K,
                )
                train_state, env_state, obs, key, stats = carry
                env_state = constrain_batch(self.venv._refill(env_state, K))
                return (train_state, env_state, obs, key, stats), traj

            (train_state, env_state, obs, key, stats), traj = jax.lax.scan(
                outer,
                (train_state, env_state, obs, key, stats),
                None,
                length=cfg.num_steps // K,
            )
            traj = jax.tree_util.tree_map(
                lambda x: x.reshape((cfg.num_steps,) + x.shape[2:]), traj
            )
        else:
            (train_state, env_state, obs, key, stats), traj = jax.lax.scan(
                make_env_step(self.venv._step),
                (train_state, env_state, obs, key, stats),
                None,
                length=cfg.num_steps,
            )

        _, last_value = train_state.apply_fn(train_state.params, obs)
        advantages, targets = compute_gae(
            traj["reward"],
            traj["value"],
            traj["done"],
            last_value,
            cfg.gamma,
            cfg.gae_lambda,
            truncated=traj.get("truncated"),
            trunc_values=traj.get("trunc_value"),
        )

        # ---- flatten [T, B] -> [T*B] and run epochs × minibatches -----------
        batch = {
            "obs": traj["obs"],
            "action": traj["action"],
            "log_prob": traj["log_prob"],
            "value": traj["value"],
            "advantage": advantages,
            "target": targets,
        }
        total = cfg.num_steps * cfg.num_envs
        batch = jax.tree_util.tree_map(
            lambda x: x.reshape((total,) + x.shape[2:]), batch
        )
        mb_size = total // cfg.num_minibatches

        def epoch(carry, _):
            train_state, key = carry
            key, k_perm = jax.random.split(key)
            perm = jax.random.permutation(k_perm, total)
            shuffled = jax.tree_util.tree_map(lambda x: x[perm], batch)
            minibatches = jax.tree_util.tree_map(
                lambda x: x.reshape(
                    (cfg.num_minibatches, mb_size) + x.shape[1:]
                ),
                shuffled,
            )

            def minibatch(train_state, mb):
                grad_fn = jax.value_and_grad(ppo_loss, has_aux=True)
                (loss, metrics), grads = grad_fn(
                    train_state.params,
                    train_state.apply_fn,
                    mb,
                    cfg.clip_eps,
                    cfg.ent_coef,
                    cfg.vf_coef,
                )
                train_state = train_state.apply_gradients(grads=grads)
                return train_state, metrics

            train_state, metrics = jax.lax.scan(
                minibatch, train_state, minibatches
            )
            return (train_state, key), metrics

        (train_state, key), metrics = jax.lax.scan(
            epoch, (train_state, key), None, length=cfg.update_epochs
        )
        metrics = jax.tree_util.tree_map(jnp.mean, metrics)
        safe_count = jnp.maximum(stats.episode_count, 1)
        metrics.update(
            episodes=stats.episode_count,
            mean_return=stats.return_sum / safe_count,
            mean_length=stats.length_sum / safe_count,
            success_rate=stats.success_count / safe_count,
        )
        # Episode aggregates reset each update; per-env running tallies carry.
        stats = stats.replace(
            episode_count=jnp.zeros((), jnp.int32),
            return_sum=jnp.zeros((), jnp.float32),
            length_sum=jnp.zeros((), jnp.float32),
            success_count=jnp.zeros((), jnp.int32),
        )
        return (train_state, env_state, obs, key, stats), metrics

    def update(self, runner):
        """One PPO update (rollout + optimize), one jitted program."""
        return self._update(runner)

    def train(self, runner, num_updates: int | None = None):
        """Run ``num_updates`` updates; returns (runner, stacked metrics)."""
        n = num_updates if num_updates is not None else self.config.num_updates
        all_metrics = []
        for _ in range(n):
            runner, metrics = self._update(runner)
            all_metrics.append(metrics)
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *all_metrics
        )
        return runner, stacked


def train_step_fn(env: Env, env_params: EnvParams, config: PPOConfig,
                  mesh: Mesh | None = None):
    """(fn, runner) — the full PPO update as a standalone jittable function,
    for compile checks and the multichip dry-run."""
    trainer = PPO(env, env_params, config, mesh=mesh)
    runner = trainer.init(jax.random.PRNGKey(0))
    return trainer._update_impl, runner
