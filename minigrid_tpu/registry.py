"""Environment registry.

The reference registers ~170 env ids with frozen kwargs — its de-facto config
database of named difficulty presets (minigrid/__init__.py:16-1094) — but the
fork *disables* registration with an immediate ``raise`` (minigrid/__init__.py:11),
leaving ``gym.make`` broken.  This registry restores a working id -> (env
class, preset kwargs) table with the same id strings, returning functional
:class:`Env` instances.

    env = minigrid_tpu.make("MiniGrid-DoorKey-8x8-v0")
    obs, state = env.reset(key, env.default_params)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Type

from minigrid_tpu.core.env import Env


@dataclass
class EnvSpec:
    id: str
    cls: Type[Env]
    kwargs: dict[str, Any] = field(default_factory=dict)


_REGISTRY: dict[str, EnvSpec] = {}


def register(id: str, cls: Type[Env], **kwargs: Any) -> None:
    _REGISTRY[id] = EnvSpec(id=id, cls=cls, kwargs=dict(kwargs))


_INSTANCES: dict[str, Env] = {}


def make(id: str, **overrides: Any) -> Env:
    """Instantiate a registered env preset (the gym.make analogue).

    Envs are stateless pure-function bundles, so the no-override path
    returns a cached singleton per id — repeat ``make`` calls (and the jit
    caches keyed on the instance's bound methods) are shared.

    Singleton contract: do NOT mutate attributes of an instance returned
    without overrides — every other holder of the id (including jitted
    kernels cached on the instance in ``gym_compat``) sees the mutation.
    Code that needs a mutable instance (e.g. the scripted ``propose_move``
    override pattern) must construct the env class directly or pass an
    override (any kwarg, even its default value) to bypass the cache."""
    if id not in _REGISTRY:
        raise KeyError(
            f"Unknown env id {id!r}. Known ids: {sorted(_REGISTRY)[:10]}... "
            f"({len(_REGISTRY)} total)"
        )
    if not overrides and id in _INSTANCES:
        return _INSTANCES[id]
    spec = _REGISTRY[id]
    kwargs = dict(spec.kwargs)
    kwargs.update(overrides)
    env = spec.cls(**kwargs)
    if not overrides:
        _INSTANCES[id] = env
    return env


def make_vec(id: str, num_envs: int, *, params=None, auto_reset: bool = True,
             final_obs: bool = False, reset_strategy: str | None = None,
             pool_refill: int | None = None, strict_refill: bool = False,
             **overrides: Any):
    """Vectorized ``make`` (the ``gymnasium.make_vec`` analogue): a
    ``VectorEnv`` of ``num_envs`` lockstep instances of the preset.

    Env-constructor overrides pass through ``**overrides``; the remaining
    keywords are the VectorEnv execution knobs (see
    :mod:`minigrid_tpu.parallel.vector`, and
    :mod:`minigrid_tpu.tools.autotune` for picking them empirically)."""
    from minigrid_tpu.parallel.vector import VectorEnv

    env = make(id, **overrides)
    return VectorEnv(env, num_envs, params, auto_reset=auto_reset,
                     final_obs=final_obs, reset_strategy=reset_strategy,
                     pool_refill=pool_refill, strict_refill=strict_refill)


def registered_ids() -> list[str]:
    return sorted(_REGISTRY)


def spec(id: str) -> EnvSpec:
    return _REGISTRY[id]
