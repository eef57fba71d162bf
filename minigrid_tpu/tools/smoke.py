"""Fast correctness smoke gate (< 1 min) run before any benchmark is recorded.

Benchmarks are only meaningful for a correct program; round 3 recorded a
headline number against an obs kernel with a direction-3 rotation bug that the
full parity suite would have caught but the bench did not.  This gate makes
that failure mode mechanically impossible: ``bench.py`` and CI run it first
and refuse to emit a number if it fails.

Checks (a strict subset of the full suite, chosen for speed × blast radius):

1. obs-impl agreement: ``gather_view_onehot`` vs ``gather_view_gather`` over
   all 4 directions × every agent pose (incl. out-of-bounds edges) — the
   exact check that would have caught the round-3 dir==3 regression.
2. Reference lockstep for Empty-5x5 and DoorKey-8x8 (one seed each, 150
   random actions): bitwise obs/reward/terminated/truncated parity vs the
   reference object engine (minigrid_env.py:524-651), skipped with a notice
   if the reference checkout is not importable.

Run: ``python -m minigrid_tpu.tools.smoke`` (exit 0 = pass).
"""

from __future__ import annotations

import os
import sys


def _check_gather_impls() -> None:
    import numpy as np

    import jax
    import jax.numpy as jnp

    from minigrid_tpu.core.obs import (
        gather_view_gather,
        gather_view_matmul,
        gather_view_onehot,
        gather_view_onehot2d,
    )

    from minigrid_tpu.core.grid_ops import pack_np

    rng = np.random.default_rng(0)
    w, h, v = 9, 6, 7
    grid = jnp.asarray(pack_np(
        np.stack(
            [
                rng.integers(0, 34, (w, h)),
                rng.integers(0, 10, (w, h)),
                rng.integers(0, 3, (w, h)),
            ],
            axis=-1,
        ).astype(np.uint8)
    ))
    poses = jnp.asarray(
        [[x, y] for x in range(w) for y in range(h)], dtype=jnp.int32
    )
    def batched(fn):
        return jax.jit(
            jax.vmap(jax.vmap(fn, (None, 0, None, None)), (None, 0, 0, None)),
            static_argnums=3,
        )

    dirs = jnp.arange(4, dtype=jnp.int32)
    poses_b = jnp.broadcast_to(poses[None], (4, poses.shape[0], 2))
    ref = np.asarray(batched(gather_view_gather)(grid, poses_b, dirs, v))
    for name, fn in [("onehot", gather_view_onehot),
                     ("onehot2d", gather_view_onehot2d),
                     ("matmul", gather_view_matmul)]:
        out = np.asarray(batched(fn)(grid, poses_b, dirs, v))
        for d in range(4):
            if not np.array_equal(out[d], ref[d]):
                raise AssertionError(
                    f"gather_view_{name} disagrees with gather_view_gather "
                    f"at agent_dir={d} — obs kernel is WRONG, refusing to "
                    f"bench"
                )

    # The batched Pallas gather (the TPU hot path), run through the Pallas
    # interpreter so this gate stays CPU-fast: exact kernel program, every
    # direction x pose (flattened to one lane-tileable batch).
    from minigrid_tpu.ops import obs_pallas

    combos = [(x, y, d) for x in range(w) for y in range(h) for d in range(4)]
    combos += combos[: (-len(combos)) % 128]
    pos_b = jnp.asarray([(x, y) for x, y, _ in combos], jnp.int32)
    dir_b = jnp.asarray([d for _, _, d in combos], jnp.int32)
    grids = jnp.broadcast_to(grid[None], (len(combos),) + grid.shape)
    ref_b = np.asarray(
        jax.jit(jax.vmap(lambda p, d: gather_view_gather(grid, p, d, v)))(
            pos_b, dir_b
        )
    )
    saved = obs_pallas.INTERPRET
    obs_pallas.INTERPRET = True
    try:
        out_b = np.asarray(
            obs_pallas.gather_view_pallas_packed(grids, pos_b, dir_b, v)
        )
    finally:
        obs_pallas.INTERPRET = saved
    # both sides are packed uint32 windows
    if not np.array_equal(out_b, ref_b):
        raise AssertionError(
            "gather_view_pallas disagrees with gather_view_gather — the "
            "batched obs kernel is WRONG, refusing to bench"
        )


def _lockstep_vs_reference() -> bool:
    """Returns True if the lockstep ran (reference importable), else False."""
    ref_path = "/root/reference"
    if os.path.isdir(ref_path) and ref_path not in sys.path:
        sys.path.append(ref_path)
    try:
        from minigrid.envs.doorkey import DoorKeyEnv as RefDoorKey
        from minigrid.envs.empty import EmptyEnv as RefEmpty
    except Exception:
        return False

    import numpy as np

    import jax
    import jax.numpy as jnp

    from minigrid_tpu.envs.doorkey import DoorKeyEnv
    from minigrid_tpu.envs.empty import EmptyEnv
    from minigrid_tpu.utils.convert import from_reference

    for ref_env, env in [
        (RefEmpty(size=5), EmptyEnv(size=5)),
        (RefDoorKey(size=8), DoorKeyEnv(size=8)),
    ]:
        params = env.default_params
        obs_ref, _ = ref_env.reset(seed=0)
        state = from_reference(ref_env)
        obs = env.observation(state, params)
        assert np.array_equal(obs_ref["image"], np.asarray(obs["image"]))
        step = jax.jit(lambda s, a, _env=env, _p=params: _env.step(s, a, _p))
        rng = np.random.default_rng(0)
        for t in range(150):
            a = int(rng.integers(0, 8))
            o_r, r_r, term_r, trunc_r, _ = ref_env.step(a)
            o, state, r, term, trunc, _ = step(state, jnp.int32(a))
            ok = (
                np.array_equal(o_r["image"], np.asarray(o["image"]))
                and o_r["direction"] == int(o["direction"])
                and abs(r_r - float(r)) < 1e-6
                and term_r == bool(term)
                and trunc_r == bool(trunc)
            )
            if not ok:
                raise AssertionError(
                    f"lockstep parity broken: {type(env).__name__} t={t} "
                    f"action={a} — refusing to bench a wrong program"
                )
            if term_r or trunc_r:
                break
    return True


def device_kernel_gate(
    env_id: str = "MiniGrid-DoorKey-8x8-v0", num_envs: int = 4096
) -> bool:
    """Compiled Mosaic kernel vs vmap pipeline ON THE EXECUTING BACKEND.

    The interpreter checks above validate the kernel PROGRAM, not its
    Mosaic LOWERING: a layout/roll/dtype bug in the compiled kernel would
    produce wrong obs on hardware with every CPU gate green — exactly the
    benching-a-wrong-program failure mode the smoke gate exists to prevent.
    This runs one full batch through BOTH the fused Pallas path and the
    vmapped per-env pipeline, compiled on the backend about to be timed,
    and raises on any mismatch.  Returns False (skipped) when the fused
    path doesn't apply on this backend/batch; callers must refuse to
    record a 'pallas' benchmark in that case or on failure.

    Call this from the PROCESS THAT BENCHES (bench.py / tools/battery.py),
    not a CPU subprocess — the point is the real device lowering."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    import minigrid_tpu
    from minigrid_tpu.core.obs import gen_obs, gen_obs_batch
    from minigrid_tpu.ops import obs_pallas

    env = minigrid_tpu.make(env_id)
    params = env.default_params
    if not obs_pallas.pallas_obs_available(num_envs, params):
        return False
    keys = jax.random.split(jax.random.PRNGKey(20260820), num_envs)
    states = jax.jit(jax.vmap(lambda k: env.generate(k, params)))(keys)
    # scatter the agents so all directions/poses (incl. edges) occur
    step = jax.jit(
        jax.vmap(lambda s, a: env.step_state(s, a, params)[0])
    )
    for t in range(6):
        acts = jax.random.randint(
            jax.random.PRNGKey(t), (num_envs,), 0, env.num_actions, jnp.int32
        )
        states = step(states, acts)
    got = jax.jit(lambda s: gen_obs_batch(s, params))(states)
    ref = jax.jit(jax.vmap(lambda s: gen_obs(s, params)))(states)
    for k in ("image", "direction", "mission"):
        if not np.array_equal(np.asarray(got[k]), np.asarray(ref[k])):
            bad = int(
                (np.asarray(got[k]) != np.asarray(ref[k])).sum()
            )
            raise AssertionError(
                f"COMPILED Pallas obs kernel disagrees with the vmap "
                f"pipeline on this device ({k}: {bad} mismatching "
                f"elements) — Mosaic lowering is WRONG, refusing to bench"
            )
    return True


def run_smoke() -> None:
    # Pin to the local CPU backend: the container's sitecustomize forces a
    # remote TPU platform whose per-call tunnel latency makes a 150-step
    # lockstep take minutes; parity of integer kernels is backend-independent
    # and the point of this gate is to be fast.  (The JAX_PLATFORMS env var
    # is overridden by the sitecustomize, so set the config directly.)
    import jax

    jax.config.update("jax_platforms", "cpu")
    _check_gather_impls()
    ran = _lockstep_vs_reference()
    if not ran:
        print("smoke: reference not importable — lockstep skipped", file=sys.stderr)
    print("SMOKE OK")


if __name__ == "__main__":
    run_smoke()
