"""Switching from gym-minigrid to minigrid-tpu, three ways.

Run:  python examples/migrate_from_reference.py

1. **Gymnasium drop-in** — the same `gym.make` + reset/step loop the
   reference README shows, backed by the tensor engine.
2. **Keep your seeds** — `exact_seed=True` makes `reset(seed=s)`
   bit-identical to the reference's episode for that seed (the host
   generator replays the reference's np_random call order).
3. **Go wide** — the same family as a 4096-env lockstep batch stepping
   entirely on device, which is the point of the rewrite.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def main() -> None:
    import gymnasium as gym

    import minigrid_tpu
    from minigrid_tpu.gym_compat import register_gym_envs
    from minigrid_tpu.parallel.vector import VectorEnv

    # -- 1. drop-in Gymnasium usage -------------------------------------
    register_gym_envs()  # the reference fork's own registration raises
    env = gym.make("MiniGrid-DoorKey-8x8-v0")
    obs, _ = env.reset(seed=0)
    print("gym obs keys:", sorted(obs), "| mission:", obs["mission"])
    obs, r, term, trunc, _ = env.step(env.action_space.sample())
    env.close()

    # -- 2. reference-identical seeds ------------------------------------
    from minigrid_tpu.gym_compat import GymEnv

    env = GymEnv("MiniGrid-DoorKey-8x8-v0", exact_seed=True)
    obs, _ = env.reset(seed=42)
    # this observation is bit-identical to
    #   minigrid.envs.DoorKeyEnv(size=8).reset(seed=42)
    print("exact-seed obs image checksum:", int(obs["image"].sum()))

    # -- 3. the TPU-native path ------------------------------------------
    fenv = minigrid_tpu.make("MiniGrid-DoorKey-8x8-v0")
    venv = VectorEnv(fenv, num_envs=4096)
    obs, state = venv.reset(jax.random.PRNGKey(0))

    @jax.jit
    def rollout(state, key):
        def body(st, kk):
            a = jax.random.randint(kk, (4096,), 0, fenv.num_actions,
                                   dtype=jnp.int32)
            _, st, r, te, tr, _ = venv._step(st, a)
            return st, r.sum()

        keys = jax.random.split(key, 256)
        return jax.lax.scan(body, state, keys)

    state, rewards = rollout(state, jax.random.PRNGKey(1))
    print("4096 envs x 256 steps on device; total reward:",
          float(np.asarray(rewards.sum())))


if __name__ == "__main__":
    main()
