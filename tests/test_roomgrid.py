"""Structural invariants for the RoomGrid layer and its env families."""

from __future__ import annotations

from collections import deque

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import minigrid_tpu
from minigrid_tpu.core.grid_ops import unpack_np
from minigrid_tpu.core import constants as C

T = C.OBJECT_TO_IDX


def solvable(grid: np.ndarray, box_contains: np.ndarray, start,
             target_mask=None) -> bool:
    """BFS with key/door logic (coarse): repeatedly expand through cells that
    are passable given the set of key colors acquired so far (keys may be
    inside boxes; boxes/balls are removable obstructions)."""
    w, h, _ = grid.shape
    keys_held = set()
    for _ in range(12):  # enough relaxation rounds for nested unlocks
        seen = np.zeros((w, h), dtype=bool)
        q = deque([tuple(start)])
        seen[start[0], start[1]] = True
        found_new_key = False
        reached = []
        while q:
            x, y = q.popleft()
            reached.append((x, y))
            t, c, s = grid[x, y]
            for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                nx, ny = x + dx, y + dy
                if not (0 <= nx < w and 0 <= ny < h) or seen[nx, ny]:
                    continue
                tt, cc, ss = grid[nx, ny]
                passable = tt in (T["empty"], T["goal"], T["floor"], T["key"],
                                  T["ball"], T["box"])
                if tt == T["door"]:
                    passable = ss == 0 or (ss == 1) or (ss == 2 and cc in keys_held)
                if passable:
                    seen[nx, ny] = True
                    q.append((nx, ny))
        for (x, y) in reached:
            if grid[x, y, 0] == T["key"] and grid[x, y, 1] not in keys_held:
                keys_held.add(grid[x, y, 1])
                found_new_key = True
            if grid[x, y, 0] == T["box"] and box_contains[x, y, 0] == T["key"]:
                if box_contains[x, y, 1] not in keys_held:
                    keys_held.add(box_contains[x, y, 1])
                    found_new_key = True
        if target_mask is None:
            tmask = (grid[..., 0] == T["goal"]) | (grid[..., 0] == T["ball"])
        else:
            tmask = target_mask
        targets = np.argwhere(tmask)
        if len(targets) and any(seen[t[0], t[1]] or any(
            seen[t[0] + dx, t[1] + dy] for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1))
            if 0 <= t[0] + dx < w and 0 <= t[1] + dy < h
        ) for t in targets):
            return True
        if not found_new_key:
            return False
    return False


@pytest.mark.parametrize("eid,n_seeds", [
    ("MiniGrid-KeyCorridorS3R3-v0", 10),
    ("MiniGrid-KeyCorridorS6R3-v0", 5),
    ("MiniGrid-ObstructedMaze-1Dlhb-v0", 10),
    ("MiniGrid-ObstructedMaze-Full-v0", 3),
    ("MiniGrid-MultiRoom-N6-v0", 5),
    ("MiniGrid-LockedRoom-v0", 5),
])
def test_roomgrid_envs_solvable(eid, n_seeds):
    env = minigrid_tpu.make(eid)
    params = env.default_params
    reset = jax.jit(lambda k: env.reset(k, params)[1])
    for seed in range(n_seeds):
        state = reset(jax.random.PRNGKey(seed))
        g = unpack_np(np.asarray(state.grid))
        if "ObstructedMaze" in eid:
            tmask = (g[..., 0] == T["ball"]) & (g[..., 1] == C.COLOR_TO_IDX["blue"])
        else:
            tmask = None
        bc = (unpack_np(np.asarray(state.box_contains))
              if state.box_contains is not None else None)
        assert solvable(
            g, bc, np.asarray(state.agent_pos),
            target_mask=tmask,
        ), f"{eid} seed {seed} unsolvable"


def test_keycorridor_structure():
    env = minigrid_tpu.make("MiniGrid-KeyCorridorS6R3-v0")
    params = env.default_params
    for seed in range(5):
        _, state = env.reset(jax.random.PRNGKey(seed), params)
        g = unpack_np(np.asarray(state.grid))
        # exactly one locked door, with a matching-color key somewhere
        locked = np.argwhere((g[..., 0] == T["door"]) & (g[..., 2] == 2))
        assert len(locked) == 1
        lc = g[locked[0][0], locked[0][1], 1]
        keys_ = np.argwhere((g[..., 0] == T["key"]) & (g[..., 1] == lc))
        assert len(keys_) == 1
        # target ball behind the locked door on the right column
        balls = np.argwhere(g[..., 0] == T["ball"])
        assert len(balls) == 1 and balls[0][0] > 10


def test_obstructedmaze_full_structure():
    env = minigrid_tpu.make("MiniGrid-ObstructedMaze-Full-v0")
    params = env.default_params
    _, state = env.reset(jax.random.PRNGKey(0), params)
    g = unpack_np(np.asarray(state.grid))
    bc = unpack_np(np.asarray(state.box_contains))
    locked = ((g[..., 0] == T["door"]) & (g[..., 2] == 2)).sum()
    boxes_with_keys = ((g[..., 0] == T["box"]) & (bc[..., 0] == T["key"])).sum()
    blue_balls = ((g[..., 0] == T["ball"])
                  & (g[..., 1] == C.COLOR_TO_IDX["blue"])).sum()
    brown_balls = ((g[..., 0] == T["ball"])
                   & (g[..., 1] == C.COLOR_TO_IDX["brown"])).sum()
    assert locked == 8 and boxes_with_keys == 8
    assert blue_balls == 1 and brown_balls == 8


def test_unlock_solvable_scripted():
    """Scripted solve of Unlock: BFS-navigate to the key, pick it up,
    BFS-navigate to the locked door, toggle — the episode must terminate
    with the shaped success reward (unlock.py:89-97 wiring end-to-end)."""
    from tests.test_babyai import nav_actions, drive, PICKUP, TOGGLE

    env = minigrid_tpu.make("MiniGrid-Unlock-v0")
    params = env.default_params
    step = jax.jit(lambda s, a: env.step(s, a, params))
    for seed in range(3):
        _, state = env.reset(jax.random.PRNGKey(seed), params)
        g = unpack_np(np.asarray(state.grid))
        key_pos = np.argwhere(g[..., 0] == T["key"])[0]
        door_pos = np.argwhere(g[..., 0] == T["door"])[0]

        acts = nav_actions(g, np.asarray(state.agent_pos),
                           int(state.agent_dir), key_pos)
        assert acts is not None, f"seed {seed}: key unreachable"
        state, r, te, tr = drive(env, state, params, acts + [PICKUP])
        assert not te and not tr
        assert int(state.carrying[0]) == T["key"]

        g2 = unpack_np(np.asarray(state.grid))
        acts2 = nav_actions(g2, np.asarray(state.agent_pos),
                            int(state.agent_dir), door_pos)
        assert acts2 is not None, f"seed {seed}: door unreachable"
        state, r, te, tr = drive(env, state, params, acts2 + [TOGGLE])
        assert te and not tr, f"seed {seed}: toggle did not terminate"
        steps_used = len(acts) + len(acts2) + 2
        expected = 1.0 - 0.9 * steps_used / params.max_steps
        assert abs(r - expected) < 1e-5, (seed, r, expected)


def test_multiroom_room_count():
    env = minigrid_tpu.make("MiniGrid-MultiRoom-N2-S4-v0")
    params = env.default_params
    for seed in range(5):
        _, state = env.reset(jax.random.PRNGKey(seed), params)
        g = unpack_np(np.asarray(state.grid))
        assert (g[..., 0] == T["door"]).sum() == 1  # N2 -> one connecting door
        assert (g[..., 0] == T["goal"]).sum() == 1
