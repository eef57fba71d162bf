"""Ablate the obs pipeline: which stage costs the 2.3 ms/step?"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import minigrid_tpu
from minigrid_tpu.core import obs as obs_mod
from minigrid_tpu.parallel.vector import VectorEnv

env_id = sys.argv[1] if len(sys.argv) > 1 else "MiniGrid-DoorKey-8x8-v0"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
T = int(sys.argv[3]) if len(sys.argv) > 3 else 256

env = minigrid_tpu.make(env_id)
params = env.default_params
venv = VectorEnv(env, B, params)
V = params.agent_view_size


def f32sum(x):
    return x.astype(jnp.float32).sum()


def mk(mode):
    vmap_gather = jax.vmap(obs_mod.gather_view, in_axes=(0, 0, 0, None))
    vmap_vis = jax.vmap(obs_mod.process_vis, in_axes=(0, None))
    vmap_obsgrid = jax.vmap(obs_mod.gen_obs_grid, in_axes=(0, None))

    @jax.jit
    def run(key):
        key, kr = jax.random.split(key)
        _, state = venv._reset(kr)

        def body(st, k):
            a = jax.random.randint(k, (B,), 0, env.num_actions,
                                   dtype=jnp.int32)
            o, st2, r, te, tr, _ = venv._step(st, a)
            if mode == "dead":
                chk = jnp.float32(0)
            elif mode == "gridsum":
                chk = f32sum(st2.grid)
            elif mode == "gather":
                cells = vmap_gather(st2.grid, st2.agent_pos, st2.agent_dir, V)
                chk = f32sum(cells)
            elif mode == "gather_vis":
                cells = vmap_gather(st2.grid, st2.agent_pos, st2.agent_dir, V)
                chk = f32sum(cells) + f32sum(vmap_vis(cells, V))
            elif mode == "full":
                chk = f32sum(o["image"])
            else:
                raise ValueError(mode)
            return st2, r.sum() + chk

        st, ys = jax.lax.scan(body, state, jax.random.split(key, T))
        return ys.sum()

    return run


for mode in ["dead", "gridsum", "gather", "gather_vis", "full"]:
    run = mk(mode)
    np.asarray(run(jax.random.PRNGKey(0)))
    t0 = time.perf_counter()
    np.asarray(run(jax.random.PRNGKey(1)))
    dt = time.perf_counter() - t0
    print(f"{mode:10s}: {B*T/dt:12,.0f} steps/s   {dt*1e6/T:8.1f} us/step",
          flush=True)
