"""Behavior cloning on oracle demonstrations.

Closes the loop the fork exists for: its dataset envs + BFS oracle produce
demonstration corpora (reference generate_demos.py:13-183 saves torch
tensors for external training code); here the learner is in-framework — a
jitted cross-entropy trainer over the same ActorCritic network used by PPO.

    demos = collect("ContrastiveTrajectoryDataset-v0", 512)
    ds = pack_bc_dataset(demos)
    params, metrics = bc_train(env, ds, BCConfig(), jax.random.PRNGKey(0))
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from minigrid_tpu.core.env import Env
from minigrid_tpu.rl.networks import ActorCritic


@struct.dataclass
class BCConfig:
    batch_size: int = struct.field(pytree_node=False, default=256)
    num_steps: int = struct.field(pytree_node=False, default=500)
    lr: float = struct.field(pytree_node=False, default=1e-3)


def pack_bc_dataset(demos) -> dict:
    """Flatten oracle demos (mission, obs dicts, actions, ...) into one
    (obs, action) pair array set — the supervised dataset."""
    images, directions, missions, actions = [], [], [], []
    for _, obss, acts, *_ in demos:
        for o, a in zip(obss, acts):
            images.append(np.asarray(o["image"]))
            directions.append(np.asarray(o["direction"]))
            missions.append(np.asarray(o["mission"]))
            actions.append(a)
    return {
        "obs": {
            "image": jnp.asarray(np.stack(images)),
            "direction": jnp.asarray(np.stack(directions)),
            "mission": jnp.asarray(np.stack(missions)),
        },
        "action": jnp.asarray(np.asarray(actions, np.int32)),
    }


def bc_train(env: Env, dataset: dict, config: BCConfig | None = None,
             key: jnp.ndarray | None = None,
             network: ActorCritic | None = None):
    """Train a policy to imitate the dataset; returns (params, metrics).

    The whole optimization (minibatch sampling included) runs as one
    lax.scan under jit; metrics are per-step loss/accuracy arrays."""
    config = config or BCConfig()
    key = key if key is not None else jax.random.PRNGKey(0)
    net = network or ActorCritic(num_actions=env.num_actions)

    n = int(dataset["action"].shape[0])
    assert n > 0, "empty demo dataset"
    k_init, k_train = jax.random.split(key)
    sample = jax.tree_util.tree_map(lambda x: x[:1], dataset["obs"])
    params = net.init(k_init, sample)
    tx = optax.adam(config.lr)
    opt_state = tx.init(params)

    def loss_fn(params, obs, action):
        logits, _ = net.apply(params, obs)
        logp = jax.nn.log_softmax(logits)
        ce = -jnp.take_along_axis(logp, action[:, None], axis=-1).mean()
        acc = (jnp.argmax(logits, -1) == action).mean()
        return ce, acc

    @jax.jit
    def train(params, opt_state, key):
        def step(carry, k):
            params, opt_state = carry
            idx = jax.random.randint(k, (config.batch_size,), 0, n)
            obs = jax.tree_util.tree_map(lambda x: x[idx], dataset["obs"])
            action = dataset["action"][idx]
            (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, obs, action)
            updates, opt_state = tx.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), {"loss": loss, "accuracy": acc}

        keys = jax.random.split(key, config.num_steps)
        (params, opt_state), metrics = jax.lax.scan(
            step, (params, opt_state), keys)
        return params, metrics

    params, metrics = train(params, opt_state, k_train)
    return params, metrics


def evaluate_policy(env: Env, params, key: jnp.ndarray, num_episodes: int = 32,
                    network: ActorCritic | None = None,
                    max_steps: int | None = None) -> dict:
    """Greedy rollouts; returns success rate and mean return (host floats)."""
    net = network or ActorCritic(num_actions=env.num_actions)
    env_params = env.default_params
    limit = max_steps or env_params.max_steps

    successes, returns = 0, 0.0
    step = jax.jit(lambda s, a: env.step(s, a, env_params))
    apply = jax.jit(lambda p, o: net.apply(p, o))
    for e in range(num_episodes):
        key, k = jax.random.split(key)
        obs, state = env.reset(k, env_params)
        total = 0.0
        for t in range(limit):
            batched = jax.tree_util.tree_map(lambda x: x[None], obs)
            logits, _ = apply(params, batched)
            action = jnp.argmax(logits[0])
            obs, state, r, te, tr, _ = step(state, action)
            total += float(r)
            if bool(te) or bool(tr):
                break
        returns += total
        successes += total > 0
    return {"success_rate": successes / num_episodes,
            "mean_return": returns / num_episodes}
