"""minigrid_tpu — a TPU-native MiniGrid engine.

A from-scratch JAX/XLA re-design of the capabilities of StephAO/gym-minigrid:
the object-oriented Grid/WorldObj model becomes a dense int-coded grid tensor
with a pure functional step, vmapped over thousands of env instances and
sharded over device meshes.
"""

from __future__ import annotations

from minigrid_tpu.core.env import Env
from minigrid_tpu.core.state import EnvParams, EnvState
from minigrid_tpu.core.step import NUM_ACTIONS, Actions  # noqa: F401
from minigrid_tpu.parallel.vector import VectorEnv, rollout
from minigrid_tpu.registry import make, make_vec, register, registered_ids

import minigrid_tpu.envs  # noqa: F401  (populates the registry)
import minigrid_tpu.babyai  # noqa: F401  (BabyAI ids)

__version__ = "0.1.0"

__all__ = [
    "Env",
    "EnvParams",
    "EnvState",
    "VectorEnv",
    "rollout",
    "make",
    "make_vec",
    "register",
    "registered_ids",
    "NUM_ACTIONS",
]
