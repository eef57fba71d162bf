"""Perf micro-benchmark (re-derivation of minigrid/benchmark.py:12-63).

Reports the reference's three metrics — reset latency, full-render FPS, and
RGB-partial-obs step FPS — plus the vectorized metrics the reference has no
analogue for (batched env-steps/s with auto-reset).
"""

from __future__ import annotations

import argparse
import time


def _sync(x):
    """Hard device sync by host fetch — jax.block_until_ready returns
    before queued work completes on the tunneled axon TPU backend."""
    import numpy as _np

    import jax as _jax

    leaf = _jax.tree_util.tree_leaves(x)[0]
    _np.asarray(leaf).ravel()[:1]


import jax
import jax.numpy as jnp


def timed_rollout(venv, num_steps: int, refill_period: int = 1,
                  seed: int = 0, unroll: int = 1,
                  with_stats: bool = False):
    """(env-steps/s, compile+first-call seconds): one jitted lax.scan
    rollout with random actions (PERF.md timing protocol — long scan to
    amortize the ~40 ms tunnel dispatch, synced by host fetch).
    ``refill_period=K`` uses the pooled bulk-refill scan-of-scans;
    ``unroll=U`` unrolls U step bodies per scan iteration so XLA can fuse
    across steps (the program is launch-bound, PERF.md).

    ``with_stats=True`` returns a third element, a dict with the pooled
    strategy's served-level accounting from the TIMED run: ``resets`` (auto
    resets served), ``fresh_frac`` (fraction served a never-used level vs a
    best-effort stale replay; 1.0 for strict/fused/conditional where every
    served level is fresh by construction, None when no reset occurred)."""
    env, num_envs = venv.env, venv.num_envs
    K = refill_period
    assert num_steps % K == 0, (num_steps, K)
    if K > 1:
        assert venv.reset_strategy == "pooled", (
            "refill_period requires the pooled reset strategy")
    pooled = venv.reset_strategy == "pooled" and venv.auto_reset

    @jax.jit
    def run(key):
        key, k = jax.random.split(key)
        obs, st = venv._reset(k)

        def body(step_fn):
            def b(st, kk):
                a = jax.random.randint(kk, (num_envs,), 0, env.num_actions,
                                       dtype=jnp.int32)
                o, st2, r, te, tr, _ = step_fn(st, a)
                # Fold an obs checksum into the y: the protocol is "obs
                # generated every step", and a discarded obs would let XLA
                # dead-code-eliminate the whole observation gather
                # (measured ~15% flattering on DoorKey-8x8).
                chk = jax.tree_util.tree_reduce(
                    lambda acc, leaf: acc + leaf.astype(jnp.float32).sum(),
                    o, jnp.float32(0))
                return st2, r.sum() + chk
            return b

        if K > 1:
            def outer(st, ks):
                st, rs = jax.lax.scan(body(venv._step_nofill), st, ks,
                                      unroll=unroll)
                return venv._refill(st, K), rs.sum()

            keys = jax.random.split(key, num_steps).reshape(
                num_steps // K, K, -1)
            st, rs = jax.lax.scan(outer, st, keys)
        else:
            st, rs = jax.lax.scan(body(venv._step), st,
                                  jax.random.split(key, num_steps),
                                  unroll=unroll)
        if pooled:
            return rs.sum(), st.n_fresh, st.n_stale
        return rs.sum(), jnp.int32(0), jnp.int32(0)

    t0 = time.perf_counter()
    _sync(run(jax.random.PRNGKey(seed)))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = run(jax.random.PRNGKey(seed + 1))
    _sync(out)
    dt = time.perf_counter() - t0
    sps = num_envs * num_steps / dt
    if not with_stats:
        return sps, compile_s
    n_fresh, n_stale = int(out[1]), int(out[2])
    resets = n_fresh + n_stale
    if pooled:
        fresh_frac = (n_fresh / resets) if resets else None
    else:
        # non-pooled strategies regenerate on every reset — always fresh
        fresh_frac = 1.0
    return sps, compile_s, {"resets": resets, "fresh_frac": fresh_frac}


def benchmark(env_id: str = "MiniGrid-LavaGapS7-v0", num_resets: int = 200,
              num_frames: int = 5000, tile_size: int = 32,
              num_envs: int = 4096, vector_steps: int = 256,
              reset_strategy: str | None = None,
              pool_refill: int | None = None,
              refill_period: int = 1,
              unroll: int = 1) -> dict:
    import minigrid_tpu
    from minigrid_tpu.ops.render import get_atlas, get_frame, pov_render
    from minigrid_tpu.parallel.vector import VectorEnv

    env = minigrid_tpu.make(env_id)
    params = env.default_params
    reset = jax.jit(lambda k: env.reset(k, params))
    step = jax.jit(lambda s, a: env.step(s, a, params))
    atlas = get_atlas(tile_size)
    frame = jax.jit(lambda s: get_frame(s, params, tile_size=tile_size))
    pov = jax.jit(lambda s: pov_render(s, params, atlas))

    # --- reset latency (benchmark.py:15-21) --------------------------------
    obs, state = reset(jax.random.PRNGKey(0))
    _sync(state.grid)
    t0 = time.perf_counter()
    for i in range(num_resets):
        obs, state = reset(jax.random.PRNGKey(i))
    _sync(state.grid)
    reset_ms = (time.perf_counter() - t0) * 1000 / num_resets

    # --- full-render FPS (benchmark.py:23-28) ------------------------------
    img = frame(state)
    _sync(img)
    t0 = time.perf_counter()
    for _ in range(num_frames):
        img = frame(state)
    _sync(img)
    render_fps = num_frames / (time.perf_counter() - t0)

    # --- RGB-partial-obs step FPS (benchmark.py:30-42) ----------------------
    img = pov(state)
    _sync(img)
    t0 = time.perf_counter()
    for i in range(num_frames):
        obs, state, r, te, tr, _ = step(state, jnp.int32(i % 3))
        img = pov(state)
    _sync(img)
    rgb_step_fps = num_frames / (time.perf_counter() - t0)

    # --- vectorized env-steps/s (no reference analogue) ----------------------
    venv = VectorEnv(env, num_envs, params, reset_strategy=reset_strategy,
                     pool_refill=pool_refill)
    vec_sps, _ = timed_rollout(venv, vector_steps, refill_period,
                               unroll=unroll)

    return {
        "reset_ms": reset_ms,
        "render_fps": render_fps,
        "rgb_partial_step_fps": rgb_step_fps,
        "vector_env_steps_per_sec": vec_sps,
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--env-name", default="MiniGrid-LavaGapS7-v0")
    parser.add_argument("--num-resets", type=int, default=200)
    parser.add_argument("--num-frames", type=int, default=5000)
    parser.add_argument("--tile-size", type=int, default=32)
    parser.add_argument("--num-envs", type=int, default=4096)
    parser.add_argument("--reset-strategy", default=None,
                        choices=[None, "fused", "conditional", "pooled"])
    parser.add_argument("--pool-refill", type=int, default=None)
    parser.add_argument("--refill-period", type=int, default=1)
    parser.add_argument("--unroll", type=int, default=1)
    args = parser.parse_args()
    out = benchmark(args.env_name, args.num_resets, args.num_frames,
                    args.tile_size, args.num_envs,
                    reset_strategy=args.reset_strategy,
                    pool_refill=args.pool_refill,
                    refill_period=args.refill_period,
                    unroll=args.unroll)
    print(f"reset time (ms)      : {out['reset_ms']:.1f}")
    print(f"full render FPS      : {out['render_fps']:.0f}")
    print(f"RGB partial step FPS : {out['rgb_partial_step_fps']:.0f}")
    print(f"vector env-steps/s   : {out['vector_env_steps_per_sec']:.0f}")


if __name__ == "__main__":
    main()
