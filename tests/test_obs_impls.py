"""Parity of the batched Pallas observation path with the per-env pipeline.

The fused kernel (ops/obs_pallas.py) runs through the Pallas INTERPRETER
here (CPU CI has no TPU), so the exact kernel program — stage-1 one-hot,
barrel shift, extraction, oob stamp — is what gets checked, not a Python
re-derivation.  Reference behavior: minigrid_env.py:594-651, grid.py:110-143.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import minigrid_tpu
from minigrid_tpu.core.obs import gather_view_gather, gen_obs, gen_obs_batch
from minigrid_tpu.ops import obs_pallas
from minigrid_tpu.parallel.vector import VectorEnv


@pytest.fixture
def pallas_interpret(monkeypatch):
    """Force the Pallas path (interpreted) regardless of backend."""
    monkeypatch.setattr(obs_pallas, "INTERPRET", True)
    monkeypatch.setattr(obs_pallas, "OBS_IMPL", "pallas")


def _random_grid(rng, w, h):
    from minigrid_tpu.core.grid_ops import pack_np

    return jnp.asarray(pack_np(
        np.stack(
            [
                rng.integers(0, 34, (w, h)),
                rng.integers(0, 11, (w, h)),
                rng.integers(0, 3, (w, h)),
            ],
            axis=-1,
        ).astype(np.uint8)
    ))


@pytest.mark.parametrize("w,h,v", [(8, 8, 7), (9, 6, 7), (9, 5, 7), (6, 9, 5)])
def test_gather_view_pallas_all_dirs_all_poses(pallas_interpret, w, h, v):
    """Kernel == reference gather for every direction x agent position
    (including borders, where the window reads out of bounds, and the
    V > H wrap case w=9,h=5)."""
    rng = np.random.default_rng(3)
    grid = _random_grid(rng, w, h)
    combos = [(x, y, d) for x in range(w) for y in range(h) for d in range(4)]
    # pad the batch to a 128 multiple by repeating the first combo
    pad = (-len(combos)) % 128
    combos = combos + combos[:pad] if pad <= len(combos) else combos + [
        combos[0]
    ] * pad
    pos = jnp.asarray([(x, y) for x, y, _ in combos], dtype=jnp.int32)
    dirs = jnp.asarray([d for _, _, d in combos], dtype=jnp.int32)
    grids = jnp.broadcast_to(grid[None], (len(combos),) + grid.shape)
    ref = jax.vmap(lambda p, d: gather_view_gather(grid, p, d, v))(pos, dirs)
    got = obs_pallas.gather_view_pallas_packed(grids, pos, dirs, v)
    assert np.array_equal(np.asarray(ref), np.asarray(got))  # both packed u32


@pytest.mark.parametrize(
    "env_id", ["MiniGrid-DoorKey-8x8-v0", "MiniGrid-Empty-8x8-v0"]
)
def test_gen_obs_batch_matches_vmap(pallas_interpret, env_id):
    """Full batched obs dict (gather + vis + overlay + encode) is bitwise
    the vmapped per-env pipeline on real env states, including a state
    with a carried object (the agent-cell overlay)."""
    env = minigrid_tpu.make(env_id)
    params = env.default_params
    keys = jax.random.split(jax.random.PRNGKey(0), 128)
    states = jax.vmap(lambda k: env.generate(k, params))(keys)
    # scatter the agents: random walk a few steps
    for t in range(4):
        acts = jax.random.randint(
            jax.random.PRNGKey(t), (128,), 0, env.num_actions, jnp.int32
        )
        states, *_ = jax.vmap(
            lambda s, a: env.step_state(s, a, params)
        )(states, acts)
    ref = jax.vmap(lambda s: gen_obs(s, params))(states)
    got = gen_obs_batch(states, params)
    for k in ("image", "direction", "mission"):
        assert np.array_equal(np.asarray(ref[k]), np.asarray(got[k])), k


def test_vector_env_pallas_path_end_to_end(pallas_interpret):
    """VectorEnv step obs through the forced Pallas path equals the vmap
    path for the same seed/action stream."""
    env = minigrid_tpu.make("MiniGrid-DoorKey-5x5-v0")
    venv = VectorEnv(env, 128)
    obs_p, state = jax.jit(venv._reset)(jax.random.PRNGKey(0))
    acts = jax.random.randint(
        jax.random.PRNGKey(1), (128,), 0, env.num_actions, jnp.int32
    )
    out_p = jax.jit(venv._step)(state, acts)

    # same computation, vmap obs path
    import minigrid_tpu.ops.obs_pallas as op

    orig = op.OBS_IMPL
    op.OBS_IMPL = "vmap"
    try:
        obs_v, state_v = jax.jit(venv._reset)(jax.random.PRNGKey(0))
        out_v = jax.jit(venv._step)(state_v, acts)
    finally:
        op.OBS_IMPL = orig
    assert np.array_equal(
        np.asarray(obs_p["image"]), np.asarray(obs_v["image"])
    )
    assert np.array_equal(
        np.asarray(out_p[0]["image"]), np.asarray(out_v[0]["image"])
    )
    assert np.array_equal(np.asarray(out_p[2]), np.asarray(out_v[2]))


def test_pallas_unavailable_batches_fall_back(pallas_interpret):
    """Non-lane-tileable batches (B % 128 != 0) silently use the vmap
    path — same results, no error."""
    env = minigrid_tpu.make("MiniGrid-Empty-5x5-v0")
    params = env.default_params
    keys = jax.random.split(jax.random.PRNGKey(2), 37)
    states = jax.vmap(lambda k: env.generate(k, params))(keys)
    ref = jax.vmap(lambda s: gen_obs(s, params))(states)
    got = gen_obs_batch(states, params)
    assert np.array_equal(np.asarray(ref["image"]), np.asarray(got["image"]))


def test_observation_batch_respects_overrides(pallas_interpret):
    """A family that overrides observation() must NOT be routed through the
    stock kernel path."""
    env = minigrid_tpu.make("MiniGrid-Empty-5x5-v0")

    class Custom(type(env)):
        def observation(self, state, params):
            o = gen_obs(state, params)
            return {**o, "extra": state.step_count}

    custom = object.__new__(Custom)
    custom.__dict__.update(env.__dict__)
    params = env.default_params
    keys = jax.random.split(jax.random.PRNGKey(4), 128)
    states = jax.vmap(lambda k: env.generate(k, params))(keys)
    got = custom.observation_batch(states, params)
    assert "extra" in got
    ref = jax.vmap(lambda s: custom.observation(s, params))(states)
    assert np.array_equal(np.asarray(ref["image"]), np.asarray(got["image"]))
