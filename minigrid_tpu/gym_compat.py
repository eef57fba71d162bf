"""Gymnasium interop: the reference's user-facing API over the tensor engine.

The reference is consumed through ``gym.make(id)`` + the mutable
``gym.Env`` protocol (minigrid/minigrid_env.py:23), but its fork disables
registration with an immediate raise (minigrid/__init__.py:11).  This module
restores that surface: :class:`GymEnv` adapts any functional
:class:`minigrid_tpu.core.env.Env` to the Gymnasium API (reset/step/render/
pickle, numpy observations, mission *strings*), and :func:`register_gym_envs`
installs all ~170 ids into the Gymnasium registry so existing reference code
runs unchanged::

    import gymnasium as gym
    import minigrid_tpu.gym_compat as gc
    gc.register_gym_envs()
    env = gym.make("MiniGrid-DoorKey-8x8-v0")
    obs, info = env.reset(seed=0)
    obs, r, term, trunc, info = env.step(env.action_space.sample())

The adapter is a host-side convenience for interactive use, evaluation and
conformance testing — large-scale training should use the functional
``VectorEnv`` path directly.
"""

from __future__ import annotations

import weakref
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

import gymnasium as gym
from gymnasium import spaces

from minigrid_tpu.core import constants as C
from minigrid_tpu.core.env import Env
from minigrid_tpu.core.mission import BabyAIMissionSpace, MissionSpace
from minigrid_tpu.registry import make as make_functional
from minigrid_tpu.registry import registered_ids


class GymEnv(gym.Env):
    """Stateful Gymnasium adapter over a pure functional env.

    Holds the current :class:`EnvState` pytree as the single mutable field;
    ``reset``/``step`` call the jitted pure kernels and return numpy
    observations with the mission detokenized to the reference's string
    surface (minigrid_env.py:645-651 obs dict)."""

    metadata = {"render_modes": ["rgb_array", "human"], "render_fps": 10}

    def __init__(self, env: Env | str, render_mode: str | None = None,
                 exact_seed: bool = False, **kwargs: Any):
        self.fenv = make_functional(env, **kwargs) if isinstance(env, str) else env
        self.params = self.fenv.default_params
        self.render_mode = render_mode
        # exact_seed: reset(seed=s) replays the reference's np_random call
        # order host-side (utils/exact.reset_exact), so the episode is
        # bit-identical to ref_env.reset(seed=s) — reference users switching
        # over keep their seeds.  Off by default: the on-device jax.random
        # generator is the production path.
        self.exact_seed = exact_seed
        self._state = None
        self._key = jax.random.PRNGKey(0)
        self._window = None

        self._jit_reset, self._jit_step = _jitted_kernels(self.fenv, self.params)

        self._build_spaces()
        self.reward_range = (0.0, 1.0)

    def _build_spaces(self) -> None:
        v = self.params.agent_view_size
        # Grammar-mission envs (BabyAI) declare an accept-all space, exactly
        # like the reference's BabyAIMissionSpace (roomgrid_level.py:26-42);
        # template envs enumerate their mission strings from mission_codes()
        # (the template×placeholder product the reference declares with
        # ordered_placeholders, mission.py:28-77).
        if getattr(self.fenv, "grammar_missions", False):
            mission_space = BabyAIMissionSpace(
                mission_func=_FixedMission(self.fenv)
            )
        else:
            mission_space = _EnumMissionSpace(self.fenv)
        self.observation_space = spaces.Dict(
            {
                "image": spaces.Box(0, 255, (v, v, 3), dtype=np.uint8),
                "direction": spaces.Discrete(4),
                "mission": mission_space,
            }
        )
        self.action_space = spaces.Discrete(self.fenv.num_actions)

    # -- gym protocol ---------------------------------------------------------
    def reset(self, *, seed: int | None = None, options: dict | None = None):
        super().reset(seed=seed)
        if self.exact_seed and seed is not None:
            from minigrid_tpu.utils.exact import reset_exact

            obs, self._state = reset_exact(self.fenv, seed, self.params)
            self._key = jax.random.PRNGKey(seed)
            if self.render_mode == "human":
                self.render()
            return self._host_obs(obs), {}
        if seed is not None:
            self._key = jax.random.PRNGKey(seed)
        self._key, k = jax.random.split(self._key)
        obs, self._state = self._jit_reset(k)
        if self.render_mode == "human":
            self.render()
        return self._host_obs(obs), {}

    def step(self, action):
        obs, self._state, reward, term, trunc, info = self._jit_step(
            self._state, jnp.int32(int(action))
        )
        if self.render_mode == "human":
            self.render()
        return (
            self._host_obs(obs),
            float(reward),
            bool(term),
            bool(trunc),
            dict(info),
        )

    def render(self):
        frame = np.asarray(
            self.fenv.get_frame(self._state, self.params, highlight=True)
        )
        if self.render_mode == "human":
            from minigrid_tpu.utils.window import Window

            if self._window is None:
                self._window = Window(getattr(self.fenv, "name", "minigrid-tpu"))
                self._window.show(block=False)
            self._window.show_img(frame)
            return None
        return frame

    def close(self):
        if self._window is not None:
            self._window.close()
            self._window = None

    # -- helpers ---------------------------------------------------------------
    def _host_obs(self, obs: dict) -> dict:
        # 0-d leaves (direction) surface as np.int64 — what Discrete spaces
        # contain; arrays stay ndarray.
        out = {
            k: (np.int64(v) if np.ndim(v) == 0 else np.asarray(v))
            for k, v in obs.items()
            if k != "mission"
        }
        out["mission"] = self.fenv.mission_text(np.asarray(obs["mission"]))
        return out

    @property
    def unwrapped(self):
        return self

    # convenience passthroughs reference users rely on
    @property
    def agent_pos(self):
        return tuple(np.asarray(self._state.agent_pos))

    @property
    def agent_dir(self):
        return int(self._state.agent_dir)

    @property
    def carrying(self):
        return np.asarray(self._state.carrying)

    @property
    def max_steps(self):
        return self.params.max_steps

    def hash(self, size: int = 16) -> str:
        """State digest (MiniGridEnv.hash, minigrid_env.py:166-176)."""
        from minigrid_tpu.utils.checkpoint import state_hash

        return state_hash(self._state, size)

    # -- view geometry (MiniGridEnv, minigrid_env.py:396-522) -----------------
    @property
    def dir_vec(self):
        return np.asarray(C.DIR_TO_VEC[self.agent_dir])

    @property
    def right_vec(self):
        dx, dy = self.dir_vec
        return np.array((-dy, dx))

    @property
    def front_pos(self):
        return np.asarray(self.agent_pos) + self.dir_vec

    @property
    def steps_remaining(self):
        return self.max_steps - int(self._state.step_count)

    @property
    def grid(self) -> np.ndarray:
        """Full-grid encode, (W, H, 3) uint8 — the reference's
        ``grid.encode()`` surface (the engine stores the packed uint32
        form; this unpacks at the host boundary)."""
        from minigrid_tpu.core.grid_ops import unpack_np

        return unpack_np(np.asarray(self._state.grid))

    def get_view_coords(self, i, j):
        """World (i, j) -> agent-view coordinates (minigrid_env.py:425-450);
        results may fall outside [0, view_size)."""
        ax, ay = self.agent_pos
        dx, dy = self.dir_vec
        rx, ry = self.right_vec
        sz = self.params.agent_view_size
        hs = sz // 2
        tx = ax + (dx * (sz - 1)) - (rx * hs)
        ty = ay + (dy * (sz - 1)) - (ry * hs)
        lx, ly = i - tx, j - ty
        return rx * lx + ry * ly, -(dx * lx + dy * ly)

    def relative_coords(self, x, y):
        """(vx, vy) if inside the view else None (minigrid_env.py:484-495)."""
        vx, vy = self.get_view_coords(x, y)
        v = self.params.agent_view_size
        if vx < 0 or vy < 0 or vx >= v or vy >= v:
            return None
        return int(vx), int(vy)

    def in_view(self, x, y) -> bool:
        return self.relative_coords(x, y) is not None

    def agent_sees(self, x, y) -> bool:
        """Non-empty world cell (x, y) visible in the current obs
        (minigrid_env.py:505-522)."""
        coords = self.relative_coords(x, y)
        if coords is None:
            return False
        vx, vy = coords
        from minigrid_tpu.core.obs import gen_obs

        obs = gen_obs(self._state, self.params)
        obs_type = int(np.asarray(obs["image"])[vx, vy, 0])
        world_type = int(np.asarray(self._state.grid)[x, y] & 0xFF)
        # reference: decoded obs cell is not None (i.e. a real object) and
        # its type equals the world cell's
        hidden = (C.OBJECT_TO_IDX["unseen"], C.OBJECT_TO_IDX["empty"])
        return obs_type == world_type and obs_type not in hidden

    def __str__(self) -> str:
        """2-chars-per-cell ASCII map (MiniGridEnv.__str__,
        minigrid_env.py:182-233)."""
        obj_str = {"wall": "W", "floor": "F", "door": "D", "key": "K",
                   "ball": "A", "box": "B", "goal": "G", "lava": "V"}
        idx_to_obj = {v: k for k, v in C.OBJECT_TO_IDX.items()}
        idx_to_color = {v: k for k, v in C.COLOR_TO_IDX.items()}
        dir_str = {0: ">", 1: "V", 2: "<", 3: "^"}
        from minigrid_tpu.core.grid_ops import unpack_np

        g = unpack_np(np.asarray(self._state.grid))
        w, h = g.shape[:2]
        ax, ay = self.agent_pos
        rows = []
        for j in range(h):
            row = ""
            for i in range(w):
                if (i, j) == (ax, ay):
                    row += 2 * dir_str[self.agent_dir]
                    continue
                t, c, s = (int(v) for v in g[i, j])
                name = idx_to_obj.get(t, "?")
                if name == "empty":
                    row += "  "
                    continue
                color0 = idx_to_color.get(c, "?")[:1].upper()
                if name == "door":
                    row += ("__" if s == C.STATE_TO_IDX["open"]
                            else ("L" if s == C.STATE_TO_IDX["locked"]
                                  else "D") + color0)
                    continue
                row += obj_str.get(name, name[:1].upper()) + color0
            rows.append(row)
        return "\n".join(rows)

    # pickling: jitted callables and spaces are rebuilt on load
    def __getstate__(self):
        d = self.__dict__.copy()
        d["_state"] = jax.device_get(self._state)
        for k in ("_jit_reset", "_jit_step", "_window",
                  "observation_space", "action_space"):
            d.pop(k, None)
        return d

    def __setstate__(self, d):
        self.__dict__.update(d)
        self._window = None
        self._jit_reset, self._jit_step = _jitted_kernels(self.fenv, self.params)
        self._build_spaces()


_JIT_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _jitted_kernels(fenv: Env, params):
    """Jitted (reset, step) pair, cached per functional env instance so every
    adapter over the same (singleton, see registry.make) env shares one
    compile.  Kept outside the instance so envs stay picklable."""
    cache = _JIT_CACHE.get(fenv)
    if cache is not None:
        try:
            if cache[0] is params or bool(cache[0] == params):
                return cache[1], cache[2]
        except Exception:
            pass
    jit_reset = jax.jit(lambda k: fenv.reset(k, params))
    jit_step = jax.jit(lambda s, a: fenv.step(s, a, params))
    try:
        _JIT_CACHE[fenv] = (params, jit_reset, jit_step)
    except TypeError:
        pass  # unweakrefable env type: skip caching
    return jit_reset, jit_step


class _EnumMissionSpace(MissionSpace):
    """Mission space enumerated from ``Env.mission_codes``.

    ``contains`` accepts exactly the strings the env can emit and ``sample``
    draws uniformly over them — behaviourally equivalent to the reference's
    template×placeholder MissionSpace declaration for the same env."""

    def __init__(self, fenv: Env):
        self._strings = list(
            dict.fromkeys(
                fenv.mission_text(np.asarray(c)) for c in fenv.mission_codes()
            )
        )
        super().__init__(mission_func=_ConstMission(self._strings[0]))

    def sample(self) -> str:
        return self._strings[int(self.np_random.integers(len(self._strings)))]

    def contains(self, x) -> bool:
        return isinstance(x, str) and x in self._strings


class _ConstMission:
    """Picklable zero-arg mission function returning a fixed string."""

    def __init__(self, s: str):
        self.s = s

    @property
    def __code__(self):
        return (lambda: None).__code__

    def __call__(self) -> str:
        return self.s


class _FixedMission:
    """Picklable zero-arg mission sampler for the space declaration (the
    mission *distribution* is env-internal; the space's sample() surfaces a
    representative string, matching how reference envs declare MissionSpace
    from static templates, e.g. envs/doorkey.py:55-60)."""

    def __init__(self, fenv: Env):
        self.fenv = fenv

    # MissionSpace asserts co_argcount == 0 for template-free spaces; a
    # __call__ method has argcount 1 (self), so expose a zero-arg closure.
    @property
    def __code__(self):
        return (lambda: None).__code__

    def __call__(self) -> str:
        return self.fenv.mission_text(np.asarray(self.fenv.mission_codes()[0]))


_REGISTERED = False


def register_gym_envs(force: bool = False) -> int:
    """Register every minigrid-tpu id with Gymnasium (the working analogue of
    the reference's disabled ``register_minigrid_envs``, __init__.py:16-1094).
    Returns the number of ids registered."""
    global _REGISTERED
    if _REGISTERED and not force:
        return 0
    count = 0
    for env_id in registered_ids():
        if env_id in gym.registry and not force:
            continue
        gym.register(
            id=env_id,
            entry_point=_make_entry(env_id),
            disable_env_checker=True,
        )
        count += 1
    _REGISTERED = True
    return count


class _Entry:
    """Picklable entry point for one registered id (env.spec must survive
    pickling of made envs — reference test_envs.py:168-183)."""

    def __init__(self, env_id: str):
        self.env_id = env_id

    def __call__(self, render_mode: str | None = None, **kwargs: Any) -> GymEnv:
        return GymEnv(self.env_id, render_mode=render_mode, **kwargs)


def _make_entry(env_id: str) -> _Entry:
    return _Entry(env_id)
