"""Vectorized env batch with auto-reset — the core product.

The reference has no parallelism of any kind (one env object, stepped
synchronously; its benchmark steps a single env, minigrid/benchmark.py:36-42).
Here an env *batch* is the unit of execution: ``reset``/``step`` vmap over a
leading batch axis of EnvState pytrees, with an auto-reset lane fused into the
step (finished episodes are regenerated on-device from each env's own PRNG
stream — no host round-trip, no divergence).

Layout note: batch size B is the leading axis of every state leaf; under
``jit`` the whole transition (step + conditional regenerate + obs) compiles to
one fused program, and the batch axis shards cleanly over a device mesh (see
:mod:`minigrid_tpu.parallel.sharding`).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from minigrid_tpu.core.env import Env
from minigrid_tpu.core.state import EnvParams, EnvState


def tree_select(pred: jnp.ndarray, a: Any, b: Any) -> Any:
    """Per-env pytree select: pred is bool[B], leaves have leading dim B."""

    def sel(x, y):
        p = pred.reshape(pred.shape + (1,) * (x.ndim - 1))
        return jnp.where(p, x, y)

    return jax.tree_util.tree_map(sel, a, b)


@struct.dataclass
class PooledState:
    """Batch state for the 'pooled' reset strategy: the live env batch plus
    a rotating double-buffer of pre-generated, never-used levels.

    Slot layout is gather-free by construction (a [B]-indexed leading-axis
    gather lowers to a serialized row-copy kernel on TPU — measured
    ~100+ us at B=4096, dwarfing the whole step): slots ``b`` and ``b + B``
    both serve env ``b``, so consumption is two static slices and a
    per-env select (fuses into the step), and refill writes C fresh levels
    per step to a rotating *contiguous* window via dynamic_update_slice.
    Every level is an iid draw from the same generator the per-env reset
    path uses, so auto-reset from the pool is distributionally identical to
    generating at reset time — while the expensive, control-flow-heavy
    generation graph runs C ≈ B/16 wide instead of B wide every step.
    """

    envs: EnvState  # leading dim B
    pool: EnvState  # leading dim 2B — slots [0,B) primary, [B,2B) secondary
    fresh: jnp.ndarray  # bool[2B] — slot holds an unconsumed level
    tick: jnp.ndarray  # int32 — refill window rotation counter
    key: jnp.ndarray  # refill PRNG stream
    # Served-distribution accounting (on-device, folded into the consume):
    # how many auto-resets were served a FRESH (never-used) level vs a STALE
    # replay of the slot's previous valid level (best-effort mode's both-
    # slots-spent fallback).  fresh/(fresh+stale) is the freshness fraction
    # every battery row reports — a throughput number earned by replaying
    # levels is a different metric from one earned on fresh iid draws.
    n_fresh: jnp.ndarray  # int32[]
    n_stale: jnp.ndarray  # int32[]


class VectorEnv:
    """B lockstep instances of one env family.

    API (all pure, all jit/shard-friendly):
        obs, state = venv.reset(key)                 # key: single PRNGKey
        obs, state, reward, terminated, truncated, info = venv.step(state, actions)

    ``step`` auto-resets: when an episode ends, the returned obs/state belong
    to the *new* episode while reward/terminated/truncated report the step
    that ended the old one.  The final observation of the finished episode is
    provided in ``info['final_obs']`` (gymnasium VectorEnv convention).
    """

    def __init__(self, env: Env, num_envs: int, params: EnvParams | None = None,
                 auto_reset: bool = True, final_obs: bool = False,
                 conditional_reset: bool | None = None,
                 reset_strategy: str | None = None,
                 pool_refill: int | None = None,
                 strict_refill: bool = False,
                 obs_impl: str = "auto",
                 mesh=None, mesh_axis: str = "env"):
        self.env = env
        self.num_envs = num_envs
        self.params = params if params is not None else env.default_params
        self.auto_reset = auto_reset
        self.final_obs = final_obs
        # obs_impl: 'auto' routes stock observations through the fused
        # batched kernel on TPU (Env.observation_batch); 'vmap' forces the
        # per-env path.  GSPMD callers (ShardedVectorEnv, PPO-with-mesh)
        # pass `mesh` (+ `mesh_axis`) instead: XLA cannot partition an
        # opaque Mosaic kernel over a with_sharding_constraint batch, so the
        # observation routes through jax.shard_map over the batch axis
        # (Env.observation_batch_sharded) — each device runs the fused
        # kernel on its local B/n shard.
        assert obs_impl in ("auto", "vmap")
        self.obs_impl = obs_impl
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        if mesh is not None:
            assert num_envs % mesh.shape[mesh_axis] == 0, (
                f"num_envs={num_envs} must divide over mesh axis "
                f"{mesh_axis}={mesh.shape[mesh_axis]}"
            )
        # Reset strategies:
        #   'fused'       regenerate every env every step and select — fastest
        #                 when generation is about as cheap as the step (a
        #                 scalar lax.cond stalls the TPU pipeline more than
        #                 regeneration costs).
        #   'conditional' wrap regeneration in a batch-level cond on
        #                 any(done) — wins when episode ends are rare or
        #                 synchronized (e.g. truncation-only families).
        #   'pooled'      consume pre-generated levels from a ring buffer and
        #                 refill C per step — wins when generation is
        #                 expensive AND episode ends are desynchronized
        #                 (BabyAI/RoomGrid under a solving policy), where
        #                 'conditional' degenerates to full-batch
        #                 regeneration every step.
        # Envs declare expensive generation via the `expensive_generation`
        # class attr; callers can override via reset_strategy.
        if reset_strategy is None:
            if conditional_reset is not None:  # legacy override
                reset_strategy = "conditional" if conditional_reset else "fused"
            elif getattr(env, "desynchronized_resets", False) and num_envs >= 64:
                # frequent, scattered episode ends (BabyAI verifier
                # success/failure fires any step): conditional degenerates
                # to full-batch regeneration every step
                reset_strategy = "pooled"
            elif getattr(env, "expensive_generation", False):
                # rare or truncation-synchronized ends (RoomGrid task envs,
                # MultiRoom under max_steps): the batch-level cond runs the
                # generator a few steps out of hundreds
                reset_strategy = "conditional"
            else:
                reset_strategy = "fused"
        assert reset_strategy in ("fused", "conditional", "pooled")
        self.reset_strategy = reset_strategy
        self.conditional_reset = reset_strategy == "conditional"
        # Pool sizing: two slots per env cover a fully synchronized
        # truncation burst with a spare, and a refill window of B/16 per
        # step revisits every slot within 32 steps — an env only falls
        # through to the regeneration fallback when it finishes three
        # episodes inside one rotation.  pool_size is fixed at 2B by the
        # slot layout; pool_refill must divide 2B.
        self.pool_size = 2 * num_envs
        if pool_refill is None:
            frac = getattr(env, "pool_refill_fraction", 1 / 16)
            target = min(2 * num_envs, max(16, int(num_envs * frac)))
            # largest divisor of the ring size not exceeding the target
            pool_refill = max(
                c for c in range(1, target + 1) if (2 * num_envs) % c == 0
            )
        if reset_strategy == "pooled":
            assert (2 * num_envs) % pool_refill == 0, (
                f"pool_refill={pool_refill} must divide 2*num_envs={2*num_envs}"
            )
        self.pool_refill = pool_refill
        # Best-effort mode (default for pooled): every pool slot holds a
        # valid level AT ALL TIMES (the initial fill is validated; refill
        # either writes a validated level or keeps the previous one), so
        #   * consume never needs a regeneration fallback — an env that
        #     misses both fresh slots replays its primary slot's previous
        #     valid level (a "stale replay"), deleting the per-step
        #     lax.cond and its B-wide generation branch from the compiled
        #     step (scalar conds stall the TPU pipeline even when untaken);
        #   * refill runs ONE unvalidated gen body per slot when the env
        #     exposes `generate_attempt`, keeping the old level on an
        #     invalid draw.
        # Served levels stay exactly valid-conditioned; only independence
        # across episodes weakens (stale replays repeat an earlier valid
        # draw).  `strict_refill=True` restores always-fresh levels: the
        # retry-loop refill plus the cond regeneration fallback.
        self.best_effort = not strict_refill and reset_strategy == "pooled"
        self.best_effort_refill = (
            self.best_effort and hasattr(env, "generate_attempt")
        )

        params_ = self.params
        pooled = reset_strategy == "pooled" and auto_reset
        # Chunked generation for the wide one-shot paths (initial reset, pool
        # fill, underflow fallback): lax.map with a bounded batch_size keeps
        # the compiled generator graph and its live memory at chunk width
        # instead of B — the difference between BabyAI BossLevel compiling at
        # B=4096 and faulting the chip.
        # Only expensive generators need chunking (their graphs are what
        # blows up compile size / live memory); a cheap generator driven
        # through the pooled strategy should keep full-width vmap — a
        # lax.map chunk loop would serialize its launches for no benefit.
        expensive = getattr(env, "expensive_generation", False)
        gen_chunk = min(128, num_envs) if expensive else num_envs

        def _gen_many(keys):
            if keys.shape[0] <= gen_chunk:
                return jax.vmap(lambda k: env.generate(k, params_))(keys)
            return jax.lax.map(
                lambda k: env.generate(k, params_), keys,
                batch_size=gen_chunk,
            )

        def _gen_many_attempt(keys):
            """(states, valid) from ONE unvalidated attempt per key."""
            att = lambda k: env.generate_attempt(k, params_)  # noqa: E731
            if keys.shape[0] <= gen_chunk:
                return jax.vmap(att)(keys)
            return jax.lax.map(att, keys, batch_size=gen_chunk)

        obs_vmap = obs_impl == "vmap"

        def _obs(states):
            if obs_vmap:
                return jax.vmap(lambda s: env.observation(s, params_))(states)
            if mesh is not None:
                return env.observation_batch_sharded(
                    states, params_, mesh, mesh_axis)
            return env.observation_batch(states, params_)

        def _reset(key: jnp.ndarray):
            if not pooled:
                keys = jax.random.split(key, num_envs)
                envs = _gen_many(keys)
                obs = _obs(envs)
                return obs, envs
            key, k_gen, k_refill = jax.random.split(key, 3)
            # one generator call site covers envs AND the initial pool fill
            # (each extra call site is another compiled copy of the whole
            # generation graph)
            both = _gen_many(
                jax.random.split(k_gen, num_envs + self.pool_size)
            )
            envs = jax.tree_util.tree_map(lambda x: x[:num_envs], both)
            pool = jax.tree_util.tree_map(lambda x: x[num_envs:], both)
            obs = _obs(envs)
            return obs, PooledState(
                envs=envs,
                pool=pool,
                fresh=jnp.ones((self.pool_size,), bool),
                tick=jnp.asarray(0, jnp.int32),
                key=k_refill,
                n_fresh=jnp.asarray(0, jnp.int32),
                n_stale=jnp.asarray(0, jnp.int32),
            )

        def _regen_masked(ns, mask):
            """Per-env regeneration for `mask` envs (each env's own stream)."""
            keys = jax.vmap(lambda r: jax.random.split(r)[0])(ns.rng)
            return tree_select(mask, _gen_many(keys), ns)

        def _finish(next_state, new_state, reward, terminated, truncated):
            info: dict = {}
            new_obs = _obs(new_state)
            if final_obs:
                info["final_obs"] = _obs(next_state)
            return new_obs, reward, terminated, truncated, info

        def _step(state, action: jnp.ndarray):
            envs = state.envs if pooled else state
            next_state, reward, terminated, truncated = jax.vmap(
                lambda s, a: env.step_state(s, a, params_)
            )(envs, action)
            if not auto_reset:
                obs = _obs(next_state)
                return obs, next_state, reward, terminated, truncated, {}
            done = terminated | truncated

            if not pooled:
                if self.conditional_reset:
                    new_state = jax.lax.cond(
                        jnp.any(done),
                        lambda ns: _regen_masked(ns, done),
                        lambda ns: ns,
                        next_state,
                    )
                else:
                    new_state = _regen_masked(next_state, done)
                obs, reward, terminated, truncated, info = _finish(
                    next_state, new_state, reward, terminated, truncated)
                return obs, new_state, reward, terminated, truncated, info

            # ---- pooled auto-reset (gather/scatter-free) --------------------
            new_envs, flags, d_fresh, d_stale = _consume(
                state.pool, state.fresh, next_state, done)
            pool, fresh, tick, key = _refill_windows(
                state.pool, flags, state.tick, state.key, 1)
            new_state = PooledState(envs=new_envs, pool=pool, fresh=fresh,
                                    tick=tick, key=key,
                                    n_fresh=state.n_fresh + d_fresh,
                                    n_stale=state.n_stale + d_stale)
            obs, reward, terminated, truncated, info = _finish(
                next_state, new_envs, reward, terminated, truncated)
            return obs, new_state, reward, terminated, truncated, info

        def _consume(pool, flags, next_state, done):
            """Pooled consume: done envs take a level from their slot pair.

            Env b prefers its primary slot b, else secondary b+B.  Returns
            (new_envs, updated freshness flags, n fresh consumes this step,
            n stale-replay consumes this step)."""
            B = num_envs
            lo = jax.tree_util.tree_map(lambda p: p[:B], pool)
            hi = jax.tree_util.tree_map(lambda p: p[B:], pool)
            f_lo, f_hi = flags[:B], flags[B:]
            use_lo = done & f_lo
            use_hi = done & ~f_lo & f_hi
            flags_next = jnp.concatenate([f_lo & ~use_lo, f_hi & ~use_hi])
            d_fresh = jnp.sum(use_lo | use_hi, dtype=jnp.int32)
            if self.best_effort:
                # Stale replay: both slots unfresh -> take the primary
                # slot's previous valid level.  Every slot always holds a
                # valid level in best-effort mode, so no regeneration
                # fallback exists in the program at all — no per-step
                # lax.cond (a scalar cond stalls the pipeline even when
                # untaken) and no B-wide generation branch to compile.
                d_stale = jnp.sum(done & ~(use_lo | use_hi), dtype=jnp.int32)
                fresh_states = tree_select(use_hi, hi, lo)
                return (tree_select(done, fresh_states, next_state),
                        flags_next, d_fresh, d_stale)

            covered = use_lo | use_hi
            fresh_states = tree_select(use_lo, lo, hi)
            new_envs = tree_select(covered, fresh_states, next_state)

            # strict mode's rare fallback (an env missed both slots):
            # per-env chunked regeneration under a batch cond.
            # (Measured dead end: a compacted argsort+gather+scatter
            # fallback is F-wide instead of B-wide, but its mere
            # presence in the cond branch drags the whole program from
            # 7.2M to 0.9M steps/s — the scatter forces layouts on the
            # env state that tax every step.)
            uncovered = done & ~covered
            new_envs = jax.lax.cond(
                jnp.any(uncovered),
                lambda ns: _regen_masked(ns, uncovered),
                lambda ns: ns,
                new_envs,
            )
            # strict mode regenerates misses, so every served level is fresh
            return (new_envs, flags_next,
                    d_fresh + jnp.sum(uncovered, dtype=jnp.int32),
                    jnp.asarray(0, jnp.int32))

        def _refill_windows(pool, flags, tick, key, windows: int):
            """Write `windows` contiguous refill windows (windows*C levels)
            to the rotating ring position and mark them fresh.

            Best-effort mode (default when the env exposes
            `generate_attempt`): ONE unvalidated gen body per slot; an
            invalid draw (~11% for BabyAI reachability) keeps the slot's
            PREVIOUS level and still marks the slot fresh — the served
            episode replays an earlier valid draw, so the per-episode level
            distribution is exactly the valid-conditioned one; only
            independence across episodes weakens at the reject rate.  Under
            vmap the full retry loop costs max-attempts-across-the-window
            gen bodies (~4 at 512-wide refill), the single biggest slice of
            the BabyAI step.  (Measured dead end: first-valid-of-2
            candidates with un-fresh invalid slots — the ~2.6% pool misses
            make the B-wide fallback cond fire often enough to give back
            more than they save: 6.4M vs 7.2M steps/s on GoToRedBall at
            B=4096.  Keeping the old level instead of un-freshening the
            slot is what makes the loop-free refill win.)"""
            B, C = num_envs, self.pool_refill
            n = windows * C
            if n >= 2 * B:
                n = 2 * B  # full-ring rewrite
            assert (2 * B) % n == 0, (
                f"windows*pool_refill={n} must divide the ring size {2*B}"
            )
            key, k = jax.random.split(key)
            # Quantize the ring position to this call's block size: a raw
            # (tick*C) % 2B offset can sit mid-ring when step() (1-window
            # refills) is mixed with bulk refill(K), and an off+n past the
            # ring end would CLAMP in dynamic_update_slice (silently never
            # refreshing the head slots).  Block-aligned offsets always fit,
            # and consistent-K usage is unchanged.
            off = ((tick * C) % (2 * B)) // n * n if n < 2 * B else 0
            if self.best_effort_refill:
                cand, ok = _gen_many_attempt(jax.random.split(k, n))
                old = jax.tree_util.tree_map(
                    lambda p: jax.lax.dynamic_slice_in_dim(p, off, n, axis=0),
                    pool)
                cand = tree_select(ok, cand, old)
            else:
                cand = _gen_many(jax.random.split(k, n))

            def write(p, c):
                return jax.lax.dynamic_update_slice_in_dim(p, c, off, axis=0)

            pool = jax.tree_util.tree_map(write, pool, cand)
            flags = jax.lax.dynamic_update_slice_in_dim(
                flags, jnp.ones((n,), bool), off, axis=0
            )
            return pool, flags, tick + windows, key

        def _step_nofill(state, action):
            """Pooled step WITHOUT the refill: consume-only.

            The refill graph's cost on TPU is its kernel-launch count, not
            its width (per-fusion launch ~30-100us regardless of tensor
            size), so running it every step at C-wide costs K times more
            launches than running it every K steps at K*C-wide.  Drive K
            no-fill steps then one `refill(state, windows=K)` — the
            rotation maths are identical on average, misses fall back to
            stale replays.  See `rollout(refill_period=...)`."""
            envs = state.envs
            next_state, reward, terminated, truncated = jax.vmap(
                lambda s, a: env.step_state(s, a, params_)
            )(envs, action)
            done = terminated | truncated
            new_envs, flags, d_fresh, d_stale = _consume(
                state.pool, state.fresh, next_state, done)
            new_state = state.replace(envs=new_envs, fresh=flags,
                                      n_fresh=state.n_fresh + d_fresh,
                                      n_stale=state.n_stale + d_stale)
            obs, reward, terminated, truncated, info = _finish(
                next_state, new_envs, reward, terminated, truncated)
            return obs, new_state, reward, terminated, truncated, info

        def _refill(state, windows: int):
            pool, fresh, tick, key = _refill_windows(
                state.pool, state.fresh, state.tick, state.key, windows)
            return state.replace(pool=pool, fresh=fresh, tick=tick, key=key)

        self._reset = jax.jit(_reset)
        self._step = jax.jit(_step)
        if pooled:
            self._step_nofill = jax.jit(_step_nofill)
            self._refill = jax.jit(_refill, static_argnums=1)

    def reset(self, key: jnp.ndarray):
        return self._reset(key)

    def step(self, state: EnvState, action: jnp.ndarray):
        return self._step(state, action)

    def step_nofill(self, state: "PooledState", action: jnp.ndarray):
        """Pooled step without the pool refill (consume-only).

        Pair with :meth:`refill` every K steps to amortize the refill
        graph's kernel launches (see ``rollout(refill_period=K)``).  Only
        available for the pooled reset strategy with auto_reset."""
        return self._step_nofill(state, action)

    def refill(self, state: "PooledState", windows: int = 1):
        """Write ``windows`` refill windows (``windows * pool_refill``
        fresh levels) to the pool ring in one contiguous block."""
        return self._refill(state, windows)


def rollout(
    env: Env,
    params: EnvParams,
    key: jnp.ndarray,
    num_envs: int,
    num_steps: int,
    policy=None,
    refill_period: int = 1,
    unroll: int = 1,
    **venv_kwargs,
):
    """lax.scan rollout harness: B envs × T steps entirely on device.

    ``policy(key, obs) -> action[B]`` defaults to uniform-random actions.
    Returns (final_state, trajectory dict of stacked [T, B, ...] arrays).

    ``refill_period=K`` (pooled strategy only) restructures the scan as
    T/K outer iterations of [K consume-only steps + ONE K-window refill]:
    the refill graph's TPU cost is its kernel-launch count, not its width,
    so batching K windows into one launch set cuts the per-step refill
    overhead by K.  Misses during the K-step gap fall back to stale
    replays (best-effort mode), so auto-reset semantics are unchanged.

    ``unroll=U`` unrolls the step scan U bodies per iteration: the step
    program is launch-bound (per-fusion cost is flat in tensor size on
    this platform — PERF.md), and XLA can fuse elementwise chains across
    consecutive unrolled steps, cutting launches per env-step.
    """
    if policy is None:
        def policy(k, obs):
            return jax.random.randint(
                k, (num_envs,), 0, env.num_actions, dtype=jnp.int32
            )

    venv = VectorEnv(env, num_envs, params, **venv_kwargs)
    key, k_reset = jax.random.split(key)
    obs, state = venv.reset(k_reset)

    def make_body(step_fn):
        def body(carry, k):
            obs, state = carry
            action = policy(k, obs)
            new_obs, new_state, reward, terminated, truncated, _ = step_fn(
                state, action
            )
            out = {
                "action": action,
                "reward": reward,
                "terminated": terminated,
                "truncated": truncated,
            }
            return (new_obs, new_state), out
        return body

    if refill_period > 1:
        assert venv.reset_strategy == "pooled" and venv.auto_reset, (
            "refill_period requires the pooled reset strategy"
        )
        K = refill_period
        assert num_steps % K == 0, (num_steps, K)
        n = min(K * venv.pool_refill, 2 * num_envs)
        assert (2 * num_envs) % n == 0, (
            f"refill_period*pool_refill = {K * venv.pool_refill} must "
            f"divide the pool ring size {2 * num_envs} (or exceed it); "
            f"pool_refill={venv.pool_refill}"
        )

        def outer(carry, ks):
            (obs, state), traj = jax.lax.scan(
                make_body(venv._step_nofill), carry, ks, unroll=unroll
            )
            state = venv._refill(state, K)
            return (obs, state), traj

        keys = jax.random.split(key, num_steps).reshape(
            num_steps // K, K, -1)
        (obs, state), traj = jax.lax.scan(outer, (obs, state), keys)
        traj = jax.tree_util.tree_map(
            lambda x: x.reshape((num_steps,) + x.shape[2:]), traj)
        return state, traj

    keys = jax.random.split(key, num_steps)
    (obs, state), traj = jax.lax.scan(
        make_body(venv._step), (obs, state), keys, unroll=unroll)
    return state, traj
