"""Keyboard play (re-derivation of minigrid/manual_control.py:12-121)."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from minigrid_tpu.core.env import Env
from minigrid_tpu.core.step import Actions
from minigrid_tpu.utils.window import Window

KEY_TO_ACTION = {
    "left": Actions.left,
    "right": Actions.right,
    "up": Actions.forward,
    " ": Actions.toggle,
    "pageup": Actions.pickup,
    "pagedown": Actions.drop,
    "enter": Actions.done,
}


class ManualControl:
    def __init__(self, env: Env, params=None, seed: int | None = None,
                 tile_size: int = 32, window: Window | None = None):
        self.env = env
        self.params = params if params is not None else env.default_params
        self.seed = seed
        self.tile_size = tile_size
        self.window = window or Window("minigrid-tpu")
        self.window.reg_key_handler(self.key_handler)
        self.state = None
        self._step = jax.jit(lambda s, a: env.step(s, a, self.params))

    def start(self):
        self.reset()
        self.window.show(block=True)

    def redraw(self):
        img = np.asarray(self.env.get_frame(self.state, self.params,
                                            tile_size=self.tile_size))
        self.window.show_img(img)

    def reset(self):
        import random

        seed = self.seed if self.seed is not None else random.randrange(2**31)
        obs, self.state = self.env.reset(jax.random.PRNGKey(seed), self.params)
        self.window.set_caption(
            self.env.mission_text(np.asarray(self.state.mission)))
        self.redraw()

    def step(self, action: int):
        obs, self.state, reward, term, trunc, _ = self._step(
            self.state, jnp.int32(action))
        print(f"step={int(self.state.step_count)}, reward={float(reward):.2f}")
        if bool(term) or bool(trunc):
            print("terminated!" if bool(term) else "truncated!")
            self.reset()
        else:
            self.redraw()

    def key_handler(self, event):
        key = event.key
        if key == "escape":
            self.window.close()
            return
        if key == "backspace":
            self.reset()
            return
        if key in KEY_TO_ACTION:
            self.step(int(KEY_TO_ACTION[key]))


def main():
    import argparse

    import minigrid_tpu

    parser = argparse.ArgumentParser()
    parser.add_argument("--env", default="MiniGrid-MultiRoom-N6-v0")
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--tile-size", type=int, default=32)
    args = parser.parse_args()

    env = minigrid_tpu.make(args.env)
    ManualControl(env, seed=args.seed, tile_size=args.tile_size).start()


if __name__ == "__main__":
    main()
