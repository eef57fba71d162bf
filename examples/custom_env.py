"""Writing your own environment — the `_gen_grid` tutorial, TPU-native.

The reference teaches extension by subclassing ``MiniGridEnv`` and writing
``_gen_grid`` plus an optional ``step`` override (every env in
minigrid/envs/ follows that recipe, e.g. envs/fetch.py).  Here the same
two hooks exist in pure-functional form:

* ``generate(key, params) -> EnvState``  — the ``_gen_grid`` analogue: a
  jax.random program that builds the level tensor.  Runs under jit/vmap,
  so use the masked-select grid ops (`core.grid_ops`), not Python loops.
* ``post_step(state, action, reward, terminated, outcome, params)`` — the
  ``step``-override analogue: task reward/termination, applied after the
  base transition (movement/pickup/toggle/lava/goal semantics come free).

This example builds **LavaCourier**, a task that is NOT in the reference:
a vertical lava curtain with one random gap splits the room; the purple
ball spawns on the far side; picking it up ends the episode with the
standard time-discounted reward.  Everything composes unchanged:
vectorized auto-reset rollouts, wrappers, rendering, and PPO.

Run:  python examples/custom_env.py
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import minigrid_tpu
from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid_ops as G
from minigrid_tpu.core.env import Env
from minigrid_tpu.core.state import (EnvParams, EnvState, base_state,
                                     empty_grid)
from minigrid_tpu.core.step import StepOutcome

BALL_T = C.OBJECT_TO_IDX["ball"]
PURPLE = C.COLOR_TO_IDX["purple"]
BALL_TRIPLE = np.array([BALL_T, PURPLE, 0], dtype=np.uint8)


class LavaCourierEnv(Env):
    """Cross the lava gap, pick up the purple ball."""

    name = "LavaCourier"

    def __init__(self, size: int = 9, max_steps: int | None = None, **kw):
        super().__init__(
            grid_size=size,
            max_steps=max_steps if max_steps is not None else 4 * size**2,
            see_through_walls=True,
            **kw,
        )

    def generate(self, key: jnp.ndarray, params: EnvParams) -> EnvState:
        w, h = params.width, params.height
        k_gap, k_ball, k_agent, k_dir, k_rng = jax.random.split(key, 5)

        grid = G.wall_rect(empty_grid(w, h), 0, 0, w, h)

        # Lava curtain down the middle with one uniform-random gap.  A
        # traced index is fine: vert_wall/put are masked one-hot writes,
        # so the whole generator stays a fused tensor program.
        mid = w // 2
        gap_y = jax.random.randint(k_gap, (), 1, h - 1, dtype=jnp.int32)
        grid = G.vert_wall(grid, mid, 1, h - 2, C.LAVA_TRIPLE)
        grid = G.put(grid, mid, gap_y, C.EMPTY_TRIPLE)

        # Ball on the far side, agent on the near side: (top, size) windows
        # restrict the uniform draw exactly like the reference's place_obj
        # rectangles (minigrid_env.py:312-371).
        grid, ball_pos, _ = G.place_obj(
            k_ball, grid, BALL_TRIPLE, top=(mid + 1, 1),
            size=(w - mid - 2, h - 2))
        _, agent_pos, _ = G.place_obj(
            k_agent, grid, None, top=(1, 1), size=(mid - 1, h - 2))
        agent_dir = jax.random.randint(k_dir, (), 0, 4, dtype=jnp.int32)
        return base_state(grid, agent_pos, agent_dir, rng=k_rng,
                          has_boxes=False)

    def post_step(self, state: EnvState, action, reward, terminated,
                  outcome: StepOutcome, params: EnvParams):
        # Same shape as the reference task overrides (e.g. fetch.py:162-176):
        # inspect the post-transition state, adjust reward/termination.
        got_ball = state.carrying[0].astype(jnp.int32) == BALL_T
        reward = jnp.where(got_ball, self.task_reward(state, params), reward)
        return state, reward, terminated | got_ball

    def mission_text(self, mission) -> str:
        return "cross the lava and pick up the purple ball"


# Registering makes the id work everywhere an id works: make / make_vec /
# the Gymnasium adapter / tools (benchmark, autotune, gen_docs, oracle).
minigrid_tpu.register("MiniGrid-LavaCourier-9x9-v0", LavaCourierEnv, size=9)


def main() -> None:
    from minigrid_tpu.parallel.vector import rollout

    env = minigrid_tpu.make("MiniGrid-LavaCourier-9x9-v0")
    state, traj = rollout(env, env.default_params, jax.random.PRNGKey(0),
                          num_envs=256, num_steps=324)
    r = np.asarray(traj["reward"])
    term = np.asarray(traj["terminated"])
    print(f"256 envs x 324 random steps: {term.sum()} terminations "
          f"(ball pickups or lava), mean terminal reward "
          f"{r[term].mean():.3f}")

    # The standard Gymnasium surface works too:
    from minigrid_tpu.gym_compat import GymEnv

    genv = GymEnv(env)
    obs, _ = genv.reset(seed=0)
    print("gym obs keys:", sorted(obs), "| mission:", obs["mission"])


if __name__ == "__main__":
    main()
