"""Profiling harness — the tracing subsystem the reference lacks.

The reference's only observability is a wall-clock micro-benchmark
(minigrid/benchmark.py:12-48).  This tool captures a ``jax.profiler`` device
trace of the vectorized rollout and prints a per-kernel cost table, which is
how the fusion-count bottlenecks in the step program were found (see
core/step.py — batched one-cell scatters each cost ~86us at batch 4096
before being rewritten as masked selects).

Usage:
    python -m minigrid_tpu.tools.profile --env MiniGrid-DoorKey-8x8-v0 \
        --num-envs 4096 --num-steps 128 [--trace-dir /tmp/minigrid_trace]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import time


def profile_rollout(env_id: str, num_envs: int, num_steps: int,
                    trace_dir: str | None = None,
                    reset_strategy: str | None = None,
                    pool_refill: int | None = None,
                    refill_period: int = 1) -> dict:
    """Profile the SAME program shape the battery times: pass the battery
    row's strategy/refill/period to see where its step actually goes."""
    import jax
    import jax.numpy as jnp

    import minigrid_tpu
    from minigrid_tpu.parallel.vector import VectorEnv

    env = minigrid_tpu.make(env_id)
    venv = VectorEnv(env, num_envs, env.default_params,
                     reset_strategy=reset_strategy, pool_refill=pool_refill)

    @jax.jit
    def run(key):
        key, kr = jax.random.split(key)
        obs, state = venv._reset(kr)

        def make_body(step_fn):
            def body(state, k):
                a = jax.random.randint(k, (num_envs,), 0, env.num_actions,
                                       dtype=jnp.int32)
                no, ns, r, te, tr, _ = step_fn(state, a)
                # Checksum the obs so the profile includes the observation
                # program — a merely-carried obs is dead to XLA's while-loop
                # simplifier and would vanish from the trace (bench.py gate).
                chk = jax.tree_util.tree_reduce(
                    lambda acc, leaf: acc + leaf.astype(jnp.float32).sum(),
                    no, jnp.float32(0))
                return ns, (r.sum() + chk, (te | tr).sum())
            return body

        if refill_period > 1:
            K = refill_period

            def outer(state, ks):
                state, ys = jax.lax.scan(make_body(venv._step_nofill),
                                         state, ks)
                return venv._refill(state, K), ys

            keys = jax.random.split(key, num_steps).reshape(
                num_steps // K, K, -1)
            state, (rs, ds) = jax.lax.scan(outer, state, keys)
        else:
            keys = jax.random.split(key, num_steps)
            state, (rs, ds) = jax.lax.scan(make_body(venv._step), state, keys)
        return rs.sum(), ds.sum()

    out = run(jax.random.PRNGKey(0))
    jax.tree_util.tree_map(lambda v: float(jnp.asarray(v).ravel()[0].astype(jnp.float32)), jax.tree_util.tree_leaves(out)[:1])

    t0 = time.perf_counter()
    out = run(jax.random.PRNGKey(1))
    jax.tree_util.tree_map(lambda v: float(jnp.asarray(v).ravel()[0].astype(jnp.float32)), jax.tree_util.tree_leaves(out)[:1])
    wall = time.perf_counter() - t0

    result = {
        "env": env_id,
        "num_envs": num_envs,
        "num_steps": num_steps,
        "wall_s": wall,
        "steps_per_sec": num_envs * num_steps / wall,
    }
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            out = run(jax.random.PRNGKey(2))
            jax.tree_util.tree_map(lambda v: float(jnp.asarray(v).ravel()[0].astype(jnp.float32)), jax.tree_util.tree_leaves(out)[:1])
        result["kernels"] = top_kernels(trace_dir)
    return result


def top_kernels(trace_dir: str, k: int = 15) -> list[tuple[str, float, int]]:
    """Parse the newest perfetto trace under trace_dir: (name, total_ms, calls)."""
    paths = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        return []
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    dur: collections.Counter = collections.Counter()
    cnt: collections.Counter = collections.Counter()
    for e in data.get("traceEvents", []):
        name = e.get("name", "")
        # '$'-prefixed events are host-side python frames, not device kernels.
        if e.get("ph") == "X" and not name.startswith("$"):
            dur[name] += e.get("dur", 0)
            cnt[name] += 1
    return [(n, d / 1e3, cnt[n]) for n, d in dur.most_common(k)]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="MiniGrid-DoorKey-8x8-v0")
    p.add_argument("--num-envs", type=int, default=4096)
    p.add_argument("--num-steps", type=int, default=128)
    p.add_argument("--trace-dir", default=None)
    p.add_argument("--strategy", default=None)
    p.add_argument("--refill", type=int, default=None)
    p.add_argument("--period", type=int, default=1)
    args = p.parse_args()
    res = profile_rollout(args.env, args.num_envs, args.num_steps,
                          args.trace_dir, reset_strategy=args.strategy,
                          pool_refill=args.refill,
                          refill_period=args.period)
    print(f"{res['env']}: {res['steps_per_sec']:,.0f} env-steps/s "
          f"({res['num_envs']} envs x {res['num_steps']} steps, "
          f"{res['wall_s']*1e3:.1f} ms)")
    for name, ms, calls in res.get("kernels", []):
        print(f"  {ms:8.2f} ms  x{calls:5d}  {name[:70]}")


if __name__ == "__main__":
    main()
