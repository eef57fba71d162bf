"""Device-mesh sharding of env batches.

The reference is a single-process library with no distribution story
(SURVEY.md §2.6).  Here scale-out is first-class: the env batch axis shards
over a ``jax.sharding.Mesh``, level generation is fully on-device (each env
derives its episode from its own folded PRNG key), so there is *zero*
cross-device traffic in the env loop — collectives appear only where the user
aggregates (episode statistics, learner gradients).

Within a slice the collectives compile onto ICI; across slices onto DCN.  On
CPU the same code paths run against a
``--xla_force_host_platform_device_count`` virtual mesh, which is how the
tests and the multichip dry-run validate the sharded program without a pod.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from minigrid_tpu.core.env import Env
from minigrid_tpu.core.state import EnvParams, EnvState


def env_mesh(devices=None, axis_name: str = "env") -> Mesh:
    """1-D mesh over all (or given) devices; env batch shards along it."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "env") -> NamedSharding:
    """Sharding for [B, ...] pytrees: batch split across the mesh axis."""
    return NamedSharding(mesh, P(axis_name))


def batch_shard_tree(tree: Any, mesh: Mesh, axis_name: str = "env") -> Any:
    """Sharding tree for an env-batch pytree: leaves whose leading axis
    divides over the mesh (the env batch B, and the level-pool axis P of
    :class:`minigrid_tpu.parallel.vector.PooledState`) shard along it;
    scalars (ring head/avail counters, PRNG keys) replicate."""
    n = int(np.prod([mesh.shape[a] for a in (axis_name,)]))
    shard = NamedSharding(mesh, P(axis_name))
    rep = NamedSharding(mesh, P())

    def spec(x):
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] >= n and x.shape[0] % n == 0:
            return shard
        return rep

    return jax.tree_util.tree_map(spec, tree)


class ShardedVectorEnv:
    """A VectorEnv whose batch axis is sharded over a device mesh.

    Built on ``jit`` + sharding annotations (the XLA-native SPMD path — the
    compiler partitions the per-env program and, because envs are
    independent, inserts no collectives at all).  `num_envs` must divide by
    the mesh size.
    """

    def __init__(
        self,
        env: Env,
        num_envs: int,
        mesh: Mesh | None = None,
        params: EnvParams | None = None,
        auto_reset: bool = True,
        axis_name: str = "env",
    ):
        from minigrid_tpu.parallel.vector import VectorEnv

        self.mesh = mesh if mesh is not None else env_mesh(axis_name=axis_name)
        n_dev = self.mesh.devices.size
        assert num_envs % n_dev == 0, (
            f"num_envs={num_envs} must be divisible by mesh size {n_dev}"
        )
        self.num_envs = num_envs
        self.params = params if params is not None else env.default_params
        # mesh=...: the observation routes through jax.shard_map over the
        # batch axis (GSPMD cannot partition an opaque Mosaic kernel, but
        # shard_map hands each device its local B/n shard explicitly), so
        # every chip runs the fused Pallas obs program.
        self._inner = VectorEnv(env, num_envs, self.params,
                                auto_reset=auto_reset,
                                mesh=self.mesh, mesh_axis=axis_name)
        shard = batch_sharding(self.mesh, axis_name)

        def _shard_tree(tree: Any) -> Any:
            return jax.lax.with_sharding_constraint(
                tree, batch_shard_tree(tree, self.mesh, axis_name)
            )

        def _reset(key):
            obs, state = self._inner._reset(key)
            return _shard_tree(obs), _shard_tree(state)

        def _step(state, action):
            out = self._inner._step(state, action)
            return jax.tree_util.tree_map(lambda x: x, out)

        self._reset_fn = jax.jit(_reset)
        self._step_fn = jax.jit(
            _step,
            in_shardings=(
                None,  # state: propagate from operands
                shard,
            ),
        )

    def reset(self, key: jnp.ndarray):
        return self._reset_fn(key)

    def step(self, state: EnvState, action: jnp.ndarray):
        return self._step_fn(state, action)


def sharded_rollout(
    env: Env,
    params: EnvParams,
    key: jnp.ndarray,
    num_envs: int,
    num_steps: int,
    mesh: Mesh | None = None,
    axis_name: str = "env",
):
    """B×T random-policy rollout with the batch sharded over the mesh.

    One jitted program: reset -> scan(T steps) -> per-env return sums, with the
    final stats gathered via jnp.sum (XLA inserts the cross-device reduction).
    Returns (steps_executed, mean_reward) as host scalars.
    """
    from minigrid_tpu.parallel.vector import VectorEnv

    mesh = mesh if mesh is not None else env_mesh(axis_name=axis_name)
    shard = batch_sharding(mesh, axis_name)
    # shard_map obs: every device runs the fused Pallas kernel on its shard
    venv = VectorEnv(env, num_envs, params, mesh=mesh, mesh_axis=axis_name)

    @jax.jit
    def run(key):
        key, k_reset = jax.random.split(key)
        obs, state = venv._reset(k_reset)
        state = jax.lax.with_sharding_constraint(
            state, batch_shard_tree(state, mesh, axis_name)
        )

        def body(carry, k):
            state, r_sum, d_sum, c_sum = carry
            action = jax.random.randint(k, (num_envs,), 0, env.num_actions,
                                        dtype=jnp.int32)
            new_obs, new_state, reward, term, trunc, _ = venv._step(state, action)
            # Checksum the obs so the measured program really generates one
            # per step (a merely-carried obs is deleted by XLA's while-loop
            # simplifier — see PERF.md timing protocol).  Running scalar sums
            # in the carry instead of stacked [T, B] traces: the trace buffer
            # would add HBM writes that measure the buffer, not the engine.
            chk = jax.tree_util.tree_reduce(
                lambda acc, leaf: acc + leaf.astype(jnp.float32).sum(),
                new_obs, jnp.float32(0))
            return (new_state, r_sum + reward.sum(),
                    d_sum + (term | trunc).sum(), c_sum + chk), None

        keys = jax.random.split(key, num_steps)
        (state, rewards, dones, _chk), _ = jax.lax.scan(
            body, (state, jnp.float32(0), jnp.int32(0), jnp.float32(0)), keys
        )
        # _chk stays in the returned tuple so the obs program is live.
        return rewards, dones, _chk

    total_reward, total_dones, _ = run(key)
    return num_envs * num_steps, float(total_reward), int(total_dones)
