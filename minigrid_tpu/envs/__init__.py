"""Environment zoo + id registrations.

Mirrors the reference preset table (minigrid/__init__.py:16-1094) for every
implemented family; ids match the upstream strings so reference users can
switch by changing only the import.
"""

from __future__ import annotations

from minigrid_tpu.envs.doorkey import DoorKeyEnv
from minigrid_tpu.envs.empty import EmptyEnv
from minigrid_tpu.registry import register

# --- Empty (minigrid/__init__.py:141-186) ----------------------------------
register("MiniGrid-Empty-5x5-v0", EmptyEnv, size=5)
register("MiniGrid-Empty-Random-5x5-v0", EmptyEnv, size=5, agent_start_pos=None)
register("MiniGrid-Empty-6x6-v0", EmptyEnv, size=6)
register("MiniGrid-Empty-Random-6x6-v0", EmptyEnv, size=6, agent_start_pos=None)
register("MiniGrid-Empty-8x8-v0", EmptyEnv, size=8)
register("MiniGrid-Empty-16x16-v0", EmptyEnv, size=16)

# --- DoorKey (minigrid/__init__.py:99-119) ----------------------------------
register("MiniGrid-DoorKey-5x5-v0", DoorKeyEnv, size=5)
register("MiniGrid-DoorKey-6x6-v0", DoorKeyEnv, size=6)
register("MiniGrid-DoorKey-8x8-v0", DoorKeyEnv, size=8)
register("MiniGrid-DoorKey-16x16-v0", DoorKeyEnv, size=16)

__all__ = ["EmptyEnv", "DoorKeyEnv"]
