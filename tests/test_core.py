"""Standalone engine invariants (no reference needed).

Mirrors the reference's behavioral-invariant pillar (tests/test_envs.py:
determinism, max_steps truncation exactness, reward range) plus kernels the
reference exercises implicitly (occlusion, door FSM, box contents plane).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import minigrid_tpu
from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid_ops as G
from minigrid_tpu.core.obs import gen_obs, process_vis
from minigrid_tpu.core.state import base_state, empty_grid
from minigrid_tpu.core.step import Actions


def make_env(id="MiniGrid-Empty-5x5-v0", **kw):
    env = minigrid_tpu.make(id, **kw)
    return env, env.default_params


def test_registry_make():
    assert "MiniGrid-DoorKey-8x8-v0" in minigrid_tpu.registered_ids()
    env, params = make_env("MiniGrid-DoorKey-8x8-v0")
    assert params.max_steps == 10 * 64


def test_same_seed_same_episode():
    """Seeded determinism (reference tests/test_envs.py:47-102)."""
    env, params = make_env("MiniGrid-DoorKey-8x8-v0")
    key = jax.random.PRNGKey(7)
    obs1, s1 = env.reset(key, params)
    obs2, s2 = env.reset(key, params)
    np.testing.assert_array_equal(np.asarray(s1.grid), np.asarray(s2.grid))
    np.testing.assert_array_equal(np.asarray(obs1["image"]), np.asarray(obs2["image"]))
    for a in [2, 1, 2, 2, 0, 2, 5, 3]:
        o1, s1, r1, t1, tr1, _ = env.step(s1, jnp.int32(a), params)
        o2, s2, r2, t2, tr2, _ = env.step(s2, jnp.int32(a), params)
        np.testing.assert_array_equal(np.asarray(o1["image"]), np.asarray(o2["image"]))
        assert float(r1) == float(r2)


def test_truncation_exactness():
    """Exactly max_steps stay/done actions -> truncated (test_envs.py:145-165)."""
    env, params = make_env("MiniGrid-Empty-5x5-v0")
    _, state = env.reset(jax.random.PRNGKey(0), params)
    for t in range(params.max_steps):
        _, state, _, term, trunc, _ = env.step(state, jnp.int32(Actions.stay), params)
        assert not bool(term)
        assert bool(trunc) == (t == params.max_steps - 1)


def test_reward_range():
    env, params = make_env("MiniGrid-Empty-5x5-v0")
    _, state = env.reset(jax.random.PRNGKey(0), params)
    key = jax.random.PRNGKey(1)
    for _ in range(50):
        key, k = jax.random.split(key)
        a = jax.random.randint(k, (), 0, 8)
        _, state, r, term, trunc, _ = env.step(state, a, params)
        assert 0.0 <= float(r) <= 1.0
        if bool(term) or bool(trunc):
            break


def test_process_vis_open_room():
    """In an open room every view cell behind the agent row is visible."""
    v = 7
    cells = G.pack_cells(jnp.broadcast_to(jnp.asarray(C.EMPTY_TRIPLE),
                                           (v, v, 3)))
    mask = process_vis(cells, v)
    assert bool(jnp.all(mask))


def test_process_vis_wall_blocks():
    """A full wall row in front of the agent hides everything beyond it."""
    v = 7
    cells = G.pack_cells(jnp.broadcast_to(jnp.asarray(C.EMPTY_TRIPLE),
                                           (v, v, 3)))
    cells = cells.at[:, 3].set(G.pack_cells(jnp.asarray(C.WALL_TRIPLE)))
    mask = np.asarray(process_vis(cells, v))
    assert mask[:, 3].any()  # the wall itself is visible
    assert not mask[:, :3].any()  # nothing beyond it


def test_door_key_fsm():
    """Locked door: toggle without key fails, with matching key opens."""
    env, params = make_env("MiniGrid-DoorKey-5x5-v0")
    grid = empty_grid(5, 5)
    grid = G.wall_rect(grid, 0, 0, 5, 5)
    door = jnp.array([C.OBJECT_TO_IDX["door"], C.COLOR_TO_IDX["yellow"],
                      C.STATE_TO_IDX["locked"]], jnp.uint8)
    key_t = jnp.array([C.OBJECT_TO_IDX["key"], C.COLOR_TO_IDX["yellow"], 0], jnp.uint8)
    grid = G.put(grid, 2, 1, door)
    grid = G.put(grid, 2, 3, key_t)
    # agent at (2,2) facing north -> door in front
    state = base_state(grid, jnp.array([2, 2]), jnp.asarray(3), jax.random.PRNGKey(0))

    _, s2, _, _, _, _ = env.step(state, jnp.int32(Actions.toggle), params)
    assert int(s2.grid[2, 1] >> 16) == C.STATE_TO_IDX["locked"]  # still locked

    # turn around, pick up key, turn back, toggle
    s = state
    for a in [Actions.right, Actions.right, Actions.pickup, Actions.right,
              Actions.right, Actions.toggle]:
        _, s, _, _, _, _ = env.step(s, jnp.int32(a), params)
    assert int(s.carrying[0]) == C.OBJECT_TO_IDX["key"]
    assert int(s.grid[2, 1] >> 16) == C.STATE_TO_IDX["open"]


def test_box_reveal_and_carry():
    """Box toggle reveals contents; picked-up box carries its contents."""
    env, params = make_env("MiniGrid-Empty-5x5-v0")
    grid = empty_grid(5, 5)
    grid = G.wall_rect(grid, 0, 0, 5, 5)
    box = jnp.array([C.OBJECT_TO_IDX["box"], C.COLOR_TO_IDX["blue"], 0], jnp.uint8)
    key_t = jnp.array([C.OBJECT_TO_IDX["key"], C.COLOR_TO_IDX["red"], 0], jnp.uint8)
    grid = G.put(grid, 2, 1, box)
    state = base_state(grid, jnp.array([2, 2]), jnp.asarray(3), jax.random.PRNGKey(0))
    state = state.replace(
        box_contains=state.box_contains.at[2, 1].set(G.pack_cells(key_t)))

    # Toggle: box replaced by its key.
    _, s, _, _, _, _ = env.step(state, jnp.int32(Actions.toggle), params)
    assert int(s.grid[2, 1] & 0xFF) == C.OBJECT_TO_IDX["key"]
    assert int((s.grid[2, 1] >> 8) & 0xFF) == C.COLOR_TO_IDX["red"]

    # Pickup box, move, drop: contents follow.
    _, s, _, _, _, _ = env.step(state, jnp.int32(Actions.pickup), params)
    assert int(s.carrying[0]) == C.OBJECT_TO_IDX["box"]
    assert int(s.carrying_contains[0]) == C.OBJECT_TO_IDX["key"]
    for a in [Actions.right, Actions.right, Actions.drop]:
        _, s, _, _, _, _ = env.step(s, jnp.int32(a), params)
    assert int(s.grid[2, 3] & 0xFF) == C.OBJECT_TO_IDX["box"]
    assert int(s.box_contains[2, 3] & 0xFF) == C.OBJECT_TO_IDX["key"]
    # Toggle the dropped box: the key reappears.
    _, s, _, _, _, _ = env.step(s, jnp.int32(Actions.toggle), params)
    assert int(s.grid[2, 3] & 0xFF) == C.OBJECT_TO_IDX["key"]


def test_obs_carrying_overlay():
    env, params = make_env("MiniGrid-Empty-5x5-v0")
    grid = empty_grid(5, 5)
    grid = G.wall_rect(grid, 0, 0, 5, 5)
    ball = jnp.array([C.OBJECT_TO_IDX["ball"], C.COLOR_TO_IDX["purple"], 0], jnp.uint8)
    grid = G.put(grid, 2, 1, ball)
    state = base_state(grid, jnp.array([2, 2]), jnp.asarray(3), jax.random.PRNGKey(0))
    _, s, _, _, _, _ = env.step(state, jnp.int32(Actions.pickup), params)
    obs = gen_obs(s, params)
    v = params.agent_view_size
    agent_cell = np.asarray(obs["image"])[v // 2, v - 1]
    assert agent_cell[0] == C.OBJECT_TO_IDX["ball"]
    assert agent_cell[1] == C.COLOR_TO_IDX["purple"]


def test_gather_impls_agree_all_dirs_all_poses():
    """Every gather_view impl (onehot / matmul / gather) agrees for every
    direction and every agent position (including edges where the window
    reads out of bounds) on a random non-square grid — the regression test
    for the dir==3 rotation bug (rotate_left^4 is the identity,
    grid.py:110-122)."""
    from minigrid_tpu.core.obs import (
        gather_view_gather,
        gather_view_matmul,
        gather_view_onehot,
        gather_view_onehot2d,
    )

    rng = np.random.default_rng(0)
    w, h, v = 9, 6, 7
    grid = jnp.asarray(G.pack_np(
        np.stack(
            [
                rng.integers(0, 34, (w, h)),
                rng.integers(0, 10, (w, h)),
                rng.integers(0, 3, (w, h)),
            ],
            axis=-1,
        ).astype(np.uint8)
    ))

    def batched(fn):
        return jax.jit(
            jax.vmap(jax.vmap(fn, (None, 0, None, None)), (None, 0, 0, None)),
            static_argnums=3,
        )

    poses = jnp.asarray(
        [[x, y] for x in range(w) for y in range(h)], dtype=jnp.int32
    )  # (P, 2) — every cell, incl. borders (window reads OOB there)
    dirs = jnp.arange(4, dtype=jnp.int32)
    poses_b = jnp.broadcast_to(poses[None], (4, poses.shape[0], 2))
    ref = np.asarray(batched(gather_view_gather)(grid, poses_b, dirs, v))
    for name, fn in [("onehot", gather_view_onehot),
                     ("onehot2d", gather_view_onehot2d),
                     ("matmul", gather_view_matmul)]:
        out = np.asarray(batched(fn)(grid, poses_b, dirs, v))
        for d in range(4):
            np.testing.assert_array_equal(
                out[d], ref[d], err_msg=f"impl={name} dir={d}"
            )
