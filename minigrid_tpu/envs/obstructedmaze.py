"""ObstructedMaze — locked doors, keys hidden in boxes, balls blocking doors.

TPU-native re-derivation of ``minigrid/envs/obstructedmaze.py:9-264``.
Fixed palette roles (obstructedmaze.py:109-115): target ball blue
(COLOR_NAMES[0]), blocking balls brown, key boxes cyan; door colors are a
random permutation of all ten colors.  Hidden keys live in the
``box_contains`` side plane (the tensor form of ``Box.contains``,
world_object.py:423-443).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid_ops as G
from minigrid_tpu.core.roomgrid import RoomGridEnv
from minigrid_tpu.core.sampling import SORTED_COLOR_IDS
from minigrid_tpu.core.state import EnvParams, EnvState, base_state, empty_grid
from minigrid_tpu.core.step import PICKUP

_BALL = C.OBJECT_TO_IDX["ball"]
_KEY = C.OBJECT_TO_IDX["key"]
_BOX = C.OBJECT_TO_IDX["box"]
_BLUE = C.COLOR_TO_IDX[C.COLOR_NAMES[0]]    # ball to find
_BROWN = C.COLOR_TO_IDX[C.COLOR_NAMES[1]]   # blocking balls
_CYAN = C.COLOR_TO_IDX[C.COLOR_NAMES[2]]    # key boxes


class ObstructedMazeEnv(RoomGridEnv):
    name = "ObstructedMaze"

    def __init__(self, num_rows, num_cols, num_rooms_visited,
                 max_steps: int | None = None, **kwargs):
        room_size = 6
        if max_steps is None:
            max_steps = 4 * num_rooms_visited * room_size**2  # obstructedmaze.py:85
        super().__init__(room_size=room_size, num_rows=num_rows,
                         num_cols=num_cols, max_steps=max_steps, **kwargs)

    # -- the overridden add_door (obstructedmaze.py:129-160) -------------------
    def add_door_om(self, b, key, params, i, j, door_idx, color,
                    locked: bool, key_in_box: bool, blocked: bool):
        """Door + optional blocking ball + optional (boxed) key."""
        k_door, k_key = jax.random.split(key)
        b, door, door_pos = self.add_door(b, k_door, i, j, door_idx,
                                          color=color, locked=locked)
        if blocked:
            vec = C.DIR_TO_VEC[door_idx]
            ball = jnp.array([_BALL, _BROWN, 0], jnp.uint8)
            b = dict(b)
            b["grid"] = G.put(b["grid"], door_pos[0] - int(vec[0]),
                              door_pos[1] - int(vec[1]), ball)
        if locked:
            key_triple = jnp.stack([
                jnp.asarray(_KEY, jnp.int32), jnp.asarray(color, jnp.int32),
                jnp.zeros((), jnp.int32)
            ]).astype(jnp.uint8)
            if key_in_box:
                box = jnp.array([_BOX, _CYAN, 0], jnp.uint8)
                b, pos, ok = self.place_in_room(b, k_key, params, i, j, box)
                b = dict(b)
                b["box_contains"] = G.put_if(b["box_contains"], pos[0], pos[1],
                                             key_triple, ok)
            else:
                b, _, _ = self.place_in_room(b, k_key, params, i, j, key_triple)
        return b, door, door_pos

    def init_rooms(self, key, params):
        k_init, k_perm = jax.random.split(key)
        b = super().init_rooms(k_init, params)
        b["box_contains"] = empty_grid(params.width, params.height)
        # door color palette = random permutation of all colors
        # (obstructedmaze.py:109 — _rand_subset of the full color list)
        b["door_colors"] = G.take_vec(jnp.asarray(SORTED_COLOR_IDS),
                                      jax.random.permutation(k_perm, 10))
        return b

    def finish(self, b, rng, target) -> EnvState:
        mission = jnp.stack([jnp.asarray(_BLUE, jnp.int32),
                             jnp.asarray(_BALL, jnp.int32),
                             jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32)])
        return base_state(b["grid"], b["agent_pos"], b["agent_dir"], rng=rng,
                          mission=mission, box_contains=b["box_contains"],
                          extra=target)

    def post_step(self, state, action, reward, terminated, outcome, params):
        # Picking up the blue ball succeeds (obstructedmaze.py:119-127; the
        # target is the only blue ball, so the triple match is identity).
        match = (
            (state.carrying[0].astype(jnp.int32) == state.extra[0])
            & (state.carrying[1].astype(jnp.int32) == state.extra[1])
        )
        success = (action == PICKUP) & match
        reward = jnp.where(success, self.task_reward(state, params), reward)
        return state, reward, terminated | success

    def mission_text(self, mission) -> str:
        return f"pick up the {C.IDX_TO_COLOR[int(mission[0])]} ball"

    def mission_codes(self):
        import numpy as np

        return np.asarray([(_BLUE, _BALL, 0, 0)], dtype=np.int32)


class ObstructedMaze_1Dlhb(ObstructedMazeEnv):
    """2×1 maze, one locked door (obstructedmaze.py:163-189)."""

    def __init__(self, key_in_box: bool = True, blocked: bool = True, **kwargs):
        self.key_in_box = key_in_box
        self.blocked = blocked
        super().__init__(num_rows=1, num_cols=2, num_rooms_visited=2, **kwargs)

    def generate(self, key: jnp.ndarray, params: EnvParams) -> EnvState:
        keys = jax.random.split(key, 5)
        b = self.init_rooms(keys[0], params)
        b, _, _ = self.add_door_om(b, keys[1], params, 0, 0, 0,
                                   color=b["door_colors"][0], locked=True,
                                   key_in_box=self.key_in_box,
                                   blocked=self.blocked)
        target = jnp.asarray([_BALL, _BLUE], jnp.int32)
        b, _, _ = self.add_object(b, keys[2], params, 1, 0, kind="ball",
                                  color=_BLUE)
        b = self.place_agent_in_room(b, keys[3], params, 0, 0)
        return self.finish(b, keys[4], target)


class ObstructedMaze_Full(ObstructedMazeEnv):
    """3×3 maze with per-quarter locked side doors (obstructedmaze.py:192-249)."""

    def __init__(self, agent_room=(1, 1), key_in_box: bool = True,
                 blocked: bool = True, num_quarters: int = 4,
                 num_rooms_visited: int = 25, **kwargs):
        self.agent_room = agent_room
        self.key_in_box = key_in_box
        self.blocked = blocked
        self.num_quarters = num_quarters
        super().__init__(num_rows=3, num_cols=3,
                         num_rooms_visited=num_rooms_visited, **kwargs)

    def generate(self, key: jnp.ndarray, params: EnvParams) -> EnvState:
        keys = jax.random.split(key, 4 + 3 * self.num_quarters)
        b = self.init_rooms(keys[0], params)

        side_rooms = [(2, 1), (1, 2), (0, 1), (1, 0)][: self.num_quarters]
        for i, side_room in enumerate(side_rooms):
            # Unlocked door middle -> side room (obstructedmaze.py:228-230).
            b, _, _ = self.add_door(b, keys[1 + 3 * i], 1, 1, i,
                                    color=b["door_colors"][i], locked=False)
            # Locked doors on both sides of the side room
            # (obstructedmaze.py:232-241).
            for n, k in enumerate((-1, 1)):
                # door side is (i+k)%4; color index is (i+k)%10 — the
                # reference indexes the 10-color palette with the raw i+k
                # (obstructedmaze.py:236-238).
                b, _, _ = self.add_door_om(
                    b, keys[2 + 3 * i + n], params, side_room[0], side_room[1],
                    (i + k) % 4, color=b["door_colors"][(i + k) % 10],
                    locked=True, key_in_box=self.key_in_box,
                    blocked=self.blocked,
                )

        corners = [(2, 0), (2, 2), (0, 2), (0, 0)][: self.num_quarters]
        pick = jax.random.randint(keys[-3], (), 0, len(corners))
        corners_arr = jnp.asarray(corners, jnp.int32)
        ball_room = jnp.sum(jnp.where(
            (jnp.arange(len(corners)) == pick)[:, None], corners_arr, 0),
            axis=0)  # masked reduce, not a vmapped one-element gather
        target = jnp.asarray([_BALL, _BLUE], jnp.int32)
        b, _, _ = self.add_object(b, keys[-2], params, ball_room[0],
                                  ball_room[1], kind="ball", color=_BLUE)
        b = self.place_agent_in_room(b, jax.random.fold_in(keys[-2], 7), params,
                                     self.agent_room[0], self.agent_room[1])
        return self.finish(b, keys[-1], target)


class ObstructedMaze_2Dl(ObstructedMaze_Full):
    def __init__(self, **kwargs):
        super().__init__((2, 1), False, False, 1, 4, **kwargs)


class ObstructedMaze_2Dlh(ObstructedMaze_Full):
    def __init__(self, **kwargs):
        super().__init__((2, 1), True, False, 1, 4, **kwargs)


class ObstructedMaze_2Dlhb(ObstructedMaze_Full):
    def __init__(self, **kwargs):
        super().__init__((2, 1), True, True, 1, 4, **kwargs)
