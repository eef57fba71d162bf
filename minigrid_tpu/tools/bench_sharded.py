"""Weak-scaling benchmark over a device mesh (BASELINE.json config[4]).

The env loop is embarrassingly parallel — each env derives its episode
from its own folded PRNG key, so the sharded program contains no
collectives until the final stats reduction — and the scaling claim
("near-linear to N devices/hosts") should be *measured*, not asserted.
This tool runs the same per-device workload on growing mesh prefixes and
reports aggregate env-steps/s plus parallel efficiency vs the 1-device
run:

    python -m minigrid_tpu.tools.bench_sharded MiniGrid-DoorKey-8x8-v0 \
        --envs-per-device 4096 --num-steps 1024 --devices 1,2,4,8

On a real pod slice the mesh axes ride ICI; on this machine the same
code path is exercised against the virtual CPU farm
(``XLA_FLAGS=--xla_force_host_platform_device_count=8``) or the single
TPU chip.  Timing protocol per PERF.md: one jitted scan, first call
discarded as compile, synced by host fetch.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def measure(env_id: str, n_devices: int, envs_per_device: int,
            num_steps: int, seed: int = 0) -> float:
    """Aggregate env-steps/s on the first ``n_devices`` devices.

    The jitted program is built ONCE and timed on its second call —
    ``sharded_rollout`` itself jits a fresh closure per invocation, which
    would time a retrace+recompile instead of the steady state."""
    import jax
    import jax.numpy as jnp

    import minigrid_tpu
    from minigrid_tpu.parallel.sharding import (batch_shard_tree, env_mesh)
    from minigrid_tpu.parallel.vector import VectorEnv

    devices = jax.devices()[:n_devices]
    mesh = env_mesh(devices)
    env = minigrid_tpu.make(env_id)
    num_envs = n_devices * envs_per_device
    # obs_impl='vmap': the batch is GSPMD-sharded over the mesh, which
    # cannot partition an opaque Mosaic kernel.
    venv = VectorEnv(env, num_envs, env.default_params, obs_impl="vmap")

    @jax.jit
    def run(key):
        key, k_reset = jax.random.split(key)
        obs, state = venv._reset(k_reset)
        state = jax.lax.with_sharding_constraint(
            state, batch_shard_tree(state, mesh))

        def body(state, k):
            action = jax.random.randint(k, (num_envs,), 0, env.num_actions,
                                        dtype=jnp.int32)
            new_obs, new_state, reward, term, trunc, _ = venv._step(
                state, action)
            # Checksum the obs (PERF.md protocol): a merely-carried obs is
            # dead to XLA's while-loop simplifier, which then deletes the
            # whole per-step observation program from the timed rollout.
            chk = jax.tree_util.tree_reduce(
                lambda acc, leaf: acc + leaf.astype(jnp.float32).sum(),
                new_obs, jnp.float32(0))
            return new_state, reward.sum() + chk

        keys = jax.random.split(key, num_steps)
        _, rewards = jax.lax.scan(body, state, keys)
        return rewards.sum()

    float(run(jax.random.PRNGKey(seed)))  # compile + first call
    t0 = time.perf_counter()
    # Host-fetch sync: block_until_ready returns early on the tunneled
    # axon backend (PERF.md timing protocol).
    float(run(jax.random.PRNGKey(seed + 1)))
    return num_envs * num_steps / (time.perf_counter() - t0)


def sweep(env_id: str, device_counts, envs_per_device: int, num_steps: int,
          verbose: bool = True) -> list[dict]:
    import jax

    avail = len(jax.devices())
    rows = []
    base = None
    for n in device_counts:
        if n > avail:
            if verbose:
                print(f"  n={n}: skipped (only {avail} devices)", flush=True)
            continue
        sps = measure(env_id, n, envs_per_device, num_steps)
        base = base if base is not None else sps / n
        eff = sps / (n * base)
        rows.append({"n_devices": n, "steps_per_sec": sps, "efficiency": eff})
        if verbose:
            print(f"  n={n}: {sps / 1e6:9.2f}M steps/s  "
                  f"(weak-scaling efficiency {eff:5.1%})", flush=True)
    return rows


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("env_id", nargs="?", default="MiniGrid-DoorKey-8x8-v0")
    p.add_argument("--envs-per-device", type=int, default=4096)
    p.add_argument("--num-steps", type=int, default=1024)
    p.add_argument("--devices", default="1,2,4,8",
                   help="comma-separated mesh sizes to sweep")
    args = p.parse_args(argv)
    counts = [int(x) for x in args.devices.split(",")]
    print(f"{args.env_id}: {args.envs_per_device} envs/device x "
          f"{args.num_steps} steps")
    sweep(args.env_id, counts, args.envs_per_device, args.num_steps)


if __name__ == "__main__":
    main()
