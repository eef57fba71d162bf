"""Profile the obs-LIVE step program (checksummed obs, like timed_rollout)."""
import sys
import time

import jax
import jax.numpy as jnp

import minigrid_tpu
from minigrid_tpu.parallel.vector import VectorEnv
from minigrid_tpu.tools.profile import top_kernels

env_id = sys.argv[1] if len(sys.argv) > 1 else "MiniGrid-DoorKey-8x8-v0"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
T = int(sys.argv[3]) if len(sys.argv) > 3 else 256
trace_dir = "/tmp/minigrid_trace_obs"

env = minigrid_tpu.make(env_id)
venv = VectorEnv(env, B, env.default_params)


@jax.jit
def run(key):
    key, kr = jax.random.split(key)
    obs, state = venv._reset(kr)

    def body(st, k):
        a = jax.random.randint(k, (B,), 0, env.num_actions, dtype=jnp.int32)
        o, st2, r, te, tr, _ = venv._step(st, a)
        chk = jax.tree_util.tree_reduce(
            lambda acc, leaf: acc + leaf.astype(jnp.float32).sum(),
            o, jnp.float32(0))
        return st2, r.sum() + chk

    st, ys = jax.lax.scan(body, state, jax.random.split(key, T))
    return ys.sum()


def sync(x):
    import numpy as np
    np.asarray(x)


sync(run(jax.random.PRNGKey(0)))
t0 = time.perf_counter()
sync(run(jax.random.PRNGKey(1)))
dt = time.perf_counter() - t0
print(f"obs-live steps/s: {B*T/dt:,.0f}  ({dt*1e6/T:.0f} us/step)")

with jax.profiler.trace(trace_dir):
    sync(run(jax.random.PRNGKey(2)))

for name, us, count in top_kernels(trace_dir, 25):
    print(f"{us/T:10.2f} us/step  x{count:5d}  {name}")
