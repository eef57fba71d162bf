"""Worker for the real 2-process PPO test (BASELINE config[4]).

Launched by tests/test_sharding.py as two subprocesses forming one
jax.distributed run (4 virtual CPU devices each, global mesh dp=8).  Each
process executes the SAME jitted PPO update over the global pod mesh —
N hosts feeding one dp-sharded learner — and prints its update metrics;
the parent asserts the two processes computed identical numbers (one SPMD
program, one gradient psum) and that they match the single-process run of
the same config.
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    proc_id = int(sys.argv[1])
    port = sys.argv[2]

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    from minigrid_tpu.parallel.multihost import initialize, pod_mesh

    assert initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2,
        process_id=proc_id,
    )
    assert jax.process_count() == 2
    assert jax.device_count() == 8

    import minigrid_tpu
    from minigrid_tpu.rl import PPOConfig
    from minigrid_tpu.rl.ppo import train_step_fn

    mesh = pod_mesh(tp=1)
    assert mesh.shape == {"dp": 8, "tp": 1}

    env = minigrid_tpu.make("MiniGrid-Empty-5x5-v0")
    cfg = PPOConfig(num_envs=8, num_steps=8, num_updates=1,
                    num_minibatches=2, update_epochs=1)
    fn, runner = train_step_fn(env, env.default_params, cfg, mesh=mesh)

    # The env state really is a non-fully-addressable global array: each
    # process holds only its dp shard of the batch.
    env_state = runner[1]
    grid = jax.tree_util.tree_leaves(env_state)[0]
    assert not grid.is_fully_addressable

    runner, metrics = jax.jit(fn)(runner)
    loss = float(metrics["loss"])
    ent = float(metrics["entropy"])
    ret = float(metrics["mean_return"])
    episodes = int(metrics["episodes"])
    print(f"PPO-METRICS {proc_id} {loss:.10f} {ent:.10f} {ret:.10f} "
          f"{episodes}", flush=True)
    print(f"PPO-OK {proc_id}", flush=True)


if __name__ == "__main__":
    main()
